package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (excluded from queries): A/B the span-dedup gram
  * representation in ONE JVM — raw gram STRINGS vs 8-byte hexHash longs
  * through the q_dup_ngrams plan shape (posexplode → shared-gram agg →
  * join → per-doc rollup). The round-15 change shipped the hash; this
  * probe pins whether it wins at local[N] too (single-JVM shuffles are
  * memory copies — byte savings can invert here, round-9 lesson). */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 5
    def grams: org.apache.spark.sql.Column = expr(
      s"CASE WHEN size(split(text, ' ')) >= $k THEN " +
        s"transform(sequence(1, size(split(text, ' ')) - ${k - 1}), " +
        s"i -> array_join(slice(split(text, ' '), i, $k), ' ')) " +
        s"ELSE slice(split(text, ' '), 1, 0) END")
    def pos(hash: Boolean): DataFrame = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), posexplode(grams))
      if (hash) base.select(col("doc_id"),
        (col("pos") + 1).cast("long").as("pos"),
        graft.functions.Hashing.hexHash(col("col")).as("gram"))
      else base.select(col("doc_id"),
        (col("pos") + 1).cast("long").as("pos"), col("col").as("gram"))
    }
    def dupNgrams(hash: Boolean): DataFrame = {
      val p = pos(hash)
      val shared = p.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") > 1).select(col("gram"), lit(1L).as("dup"))
      p.join(shared, Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_ngrams"),
          sum(when(col("dup").isNotNull, 1L).otherwise(0L)).as("n_dup_pos"),
          countDistinct(when(col("dup").isNotNull, col("gram")))
            .as("n_dup_distinct"))
    }
    def time(tag: String, f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("warm", dupNgrams(hash = true))
    time("hash", dupNgrams(hash = true))
    time("string", dupNgrams(hash = false))
    time("hash2", dupNgrams(hash = true))
    time("string2", dupNgrams(hash = false))
    spark.stop()
  }
}
