package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic-table loading helpers (see /root/repo/TESTDATA.md).
  *
  * All operator queries run over the driver-generated parquet tables at
  * `sfDir`. Parquet scans are the canonical source: self-describing schema,
  * column pruning and predicate pushdown reach the file footer
  * (reference parquet scan: spark_jobs/playback_pipeline_curated.py:190).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame   = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame     = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame   = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame     = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame     = table(spark, d, "region")
  /** events.ts has shipped in two parquet flavors: legacy TIMESTAMP(NANOS)
    * — which Spark's reader rejects outright ([PARQUET_TYPE_ILLEGAL]) unless
    * read as a raw nanos long under the legacy conf — and standard
    * TIMESTAMP(MICROS). Normalize both to a microsecond TimestampType
    * column. The nanos branch uses integral `div` so no double round-trip
    * ever touches the 1.7e18 nanos values (> 2^53); DuckDB's
    * `CAST(ts AS TIMESTAMP)` truncates ns→µs the same way, so oracles stay
    * aligned on either flavor.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => // TIMESTAMP_NTZ flavor; session TZ is UTC, so the cast is exact
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
