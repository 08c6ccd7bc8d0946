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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as a raw nanos long
    * (legacy conf) and convert to a microsecond TimestampType column —
    * integral `div` so no double round-trip ever touches the 1.7e18 nanos
    * values (> 2^53). DuckDB's `CAST(ts AS TIMESTAMP)` truncates ns→µs the
    * same way, so oracles stay aligned.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
