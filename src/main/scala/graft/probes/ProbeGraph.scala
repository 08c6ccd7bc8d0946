package graft.probes

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 phase decomposition for the graph-loop family (guide §1.1):
  * how much of q_pagerank/q_bfs/q_sssp/q_kcore is the shared
  * pairs-build+pin, the deg/aux pins, and the superstep loop itself.
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()
    import graft.Tables._

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe-graph] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val pairs = t("pairs build+pin") {
        orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
          .join(lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("c"),
            (col("l_suppkey") * 2 + 1).as("s"))
          .distinct()
          .localCheckpoint()
      }
      println(s"[probe-graph]   pairs rows=${pairs.count()}")
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
      val deg = t("deg build+pin") {
        edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
      }
      t("pagerank 3-iter fold job") {
        val edgesD = edges.join(broadcast(deg), Seq("src"))
        val init = deg.select(col("src").as("node"),
          lit(graft.ops.GraphOps.PrScale).as("rank"))
        val fin = (1 to graft.ops.GraphOps.PrIters).foldLeft(init) { (ranks, _) =>
          edgesD.join(broadcast(ranks), edgesD("src") === ranks("node"))
            .select(col("dst"), expr("rank div deg").as("contrib"))
            .groupBy(col("dst"))
            .agg(sum(col("contrib")).as("in_sum"))
            .select(col("dst").as("node"),
              (lit(150000L) + expr("(85 * in_sum) div 100")).as("rank"))
        }
        fin.select(col("node"), (col("node") % 2).as("is_supplier"), col("rank"))
          .orderBy("node").queryExecution.toRdd.count()
      }
      // su self-join family base (triangles/kcore/degree_dist)
      val su = t("su distinct build") {
        val x = lineitem(spark, d)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s")).distinct()
        x.localCheckpoint()
      }
      t("pair-weights self-join+agg") {
        su.as("a").join(su.as("b"),
            col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
          .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
          .agg(count(lit(1)).as("w")).queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
