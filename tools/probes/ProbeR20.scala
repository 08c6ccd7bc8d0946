package graft

import org.apache.spark.sql.SparkSession

/** Round-20 probe (verdict item 3): q_audit_part_tail was the ONE raw
  * mover between the two same-code r19 captures — 0.74 s
  * (BENCH_r19_full) vs 1.86 s (BENCH_full_last), raw 2.51×, with no
  * code change behind it. Same adjudication shape as ProbeR18/R19: one
  * JVM, one session, 8 repetitions of the identical query. A real
  * shift shows a tight band at the slower level; variance (JIT /
  * codegen cache / the streaming tail's micro-batch scheduling jitter)
  * shows a wide band whose floor sits at the fast level. The query
  * drives a PARTITIONED streaming tail through real checkpoints, so a
  * second block after running its noisy bench NEIGHBORS (the other
  * audit-tail queries share the catalog + sequencer paths) separates
  * steady-state cost from cross-query state effects. */
object ProbeR20 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries("q_audit_part_tail")
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def block(tag: String): Unit = {
      val times = (1 to 8).map(_ => once())
      println(f"[probe-r20] $tag runs: " +
        times.map(t => f"$t%.2f").mkString(", "))
      println(f"[probe-r20] $tag min=${times.min}%.2f median=" +
        f"${times.sorted.apply(times.size / 2)}%.2f max=${times.max}%.2f")
    }
    once() // untimed: codegen + JIT + first checkpoint dirs
    block("q_audit_part_tail/alone")
    // its bench neighbors (shared catalog/sequencer/stream-lock paths)
    Seq("q_audit_stream_part", "q_audit_part_travel").foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
    }
    block("q_audit_part_tail/after-neighbors")
    spark.stop()
  }
}
