package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage probe: time sub-plans of a query to find where the cost
  * is before optimizing (round-2 lesson: the slow stage is rarely the one
  * you'd guess — measure first). Not part of the library surface. */
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
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${ts.min}%8.3f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    graft.plans.JsonBag.register(spark)
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)

    time("flatten:agg_only") {
      li.groupBy(col("l_orderkey"))
        .agg(expr("json_bag(l_linenumber, CAST(l_partkey AS STRING), CAST(l_suppkey AS STRING))")
          .as("bagged_items"), count(lit(1)).as("n_items"))
    }
    time("flatten:agg_join") {
      val bagged = li.groupBy(col("l_orderkey"))
        .agg(expr("json_bag(l_linenumber, CAST(l_partkey AS STRING), CAST(l_suppkey AS STRING))")
          .as("bagged_items"), count(lit(1)).as("n_items"))
      o.join(bagged, o("o_orderkey") === bagged("l_orderkey"), "left")
        .select(o("o_orderkey"), o("o_custkey"), o("o_orderstatus"),
          o("o_totalprice"), o("o_orderdate"), bagged("bagged_items"), bagged("n_items"))
        .dropDuplicates("o_orderkey")
    }
    time("flatten:full") { graft.ops.CoreOps.playbackFlatten(spark, d) }

    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
    time("flatten:agg_only(hifall)") {
      li.groupBy(col("l_orderkey"))
        .agg(expr("json_bag(l_linenumber, CAST(l_partkey AS STRING), CAST(l_suppkey AS STRING))")
          .as("bagged_items"), count(lit(1)).as("n_items"))
    }
    time("flatten:full(hifall)") { graft.ops.CoreOps.playbackFlatten(spark, d) }
    spark.stop()
  }
}
