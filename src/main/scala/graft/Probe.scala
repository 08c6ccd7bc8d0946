package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage probe: time sub-plans of a query to find where the cost
  * is before optimizing (round-2 lesson: the slow stage is rarely the one
  * you'd guess — measure first). Not part of the library surface.
  *
  * Round-5 target: q_ssjoin_prefix — stage split (shingle+df+arrays vs
  * prefix candidate join vs verify joins), and checkpoint on/off. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${ts.min}%8.3f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // stage 1 only: hashed shingle rows (the pinned frame)
    time("ssjoin:shingle_rows") {
      operators.Dedup.shingleHashRows(
        operators.Dedup.docsWithInjectedDups(spark, d))
    }
    // full operator as shipped (localCheckpoint pin)
    time("ssjoin:full") { operators.Dedup.ssjoinPrefix(spark, d) }
    time("ssjoin:full#2") { operators.Dedup.ssjoinPrefix(spark, d) }
    spark.stop()
  }
}
