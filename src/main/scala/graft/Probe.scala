package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage probe: time sub-plans of a query to find where the cost
  * is before optimizing (round-2 lesson: the slow stage is rarely the one
  * you'd guess — measure first). Not part of the library surface.
  *
  * Round-4 target: q_copurchase pair generation — distinct+self-join vs
  * collect_set+HOF pair expansion. Variants A/B'd in ONE JVM. */
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

    time("copurchase:self_join") { ops.AnalyticOps.coOccurrence(spark, d) }
    time("copurchase:hof_pairs") {
      Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("parts"))
        .select(explode(flatten(expr(
          """transform(parts, (x, i) ->
            |  transform(slice(parts, i + 2, size(parts)), y -> struct(x AS a, y AS b)))"""
            .stripMargin))).as("p"))
        .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(50)
    }
    time("copurchase:self_join#2") { ops.AnalyticOps.coOccurrence(spark, d) }
    spark.stop()
  }
}
