package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 optimization probes — one JVM, alternating reps, so VM drift
  * hits both arms equally (the ProbeR20 discipline).
  *
  * probe 1: hexHash native (HexHash60Expr) vs the conv(substring(md5))
  *          chain, 20M short strings, pure map+sum (no shuffle).
  * probe 2: the affected bench queries, min-of-5 per arm in ONE JVM via
  *          SPARK_GRAFT_ONLY-style direct calls.
  */
object ProbeR21 {
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

    def timeMin(reps: Int)(f: => DataFrame): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min

    val strings = spark.range(0, 20000000L, 1, 32)
      .select(concat(lit("k#"), col("id")).as("s"))
    // pmod keeps the 20M-row sum inside a long under ANSI mode
    def hashSum(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      strings.select(sum(pmod(h(col("s")), lit(1000000L))).as("x"))

    // warm both shapes, then alternate min-of-5
    hashSum(graft.functions.Hashing.hexHash).queryExecution.toRdd.count()
    hashSum(graft.functions.Hashing.hexHashChain).queryExecution.toRdd.count()
    val (nat, cha) = (1 to 5).map { _ =>
      val n = timeMin(1)(hashSum(graft.functions.Hashing.hexHash))
      val c = timeMin(1)(hashSum(graft.functions.Hashing.hexHashChain))
      (n, c)
    }.unzip
    println(f"[probe] hexhash 20M: native=${nat.min}%.3f s chain=${cha.min}%.3f s " +
      f"(ratio ${cha.min / nat.min}%.2f; runs native=${nat.map(t => f"$t%.2f").mkString(",")} " +
      f"chain=${cha.map(t => f"$t%.2f").mkString(",")})")

    // affected declared queries, min-of-3 in this same JVM
    val qs = Seq("q_neg_sample", "q_bootstrap", "q_checksum_diff",
      "q_tfidf_pairs", "q_winnow", "q_dup_ngrams")
    val all = graft.SparkEntry.queries
    qs.foreach { q =>
      val t = timeMin(3)(all(q)(spark, d))
      println(f"[probe] $q%-18s ${t}%.3f s (min of 3, one JVM)")
    }

    // probe 3: AQE byte-based partition coalescing (parallelismFirst=false,
    // guide §2.2 "fewer, larger reduce partitions") on the iterative graph
    // loops — tiny node-sized frontiers currently fan every shuffle into 32
    // reducer tasks. Alternating arms, min-of-3 each, one JVM.
    val graphQs = Seq("q_pagerank", "q_bfs", "q_sssp", "q_kcore",
      "q_triangles", "q_dup_clusters", "q_copurchase", "q_degree_dist")
    val key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    graphQs.foreach { q =>
      val tDefault = timeMin(3)(all(q)(spark, d))
      spark.conf.set(key, "false")
      val tBytes = try timeMin(3)(all(q)(spark, d))
      finally spark.conf.unset(key)
      println(f"[probe] aqe:$q%-16s default=$tDefault%.3f s bytes=$tBytes%.3f s " +
        f"(ratio ${tBytes / tDefault}%.2f)")
    }
    spark.stop()
  }
}
