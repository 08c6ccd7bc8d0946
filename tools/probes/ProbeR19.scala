package graft

import org.apache.spark.sql.SparkSession

/** Round-19 probe (verdict item 4): q_dedup_quality read 0.70 s in the
  * r17 capture and 1.12 s / 1.27 s in BOTH r18 captures with no change
  * to the query or any plan behind it (the r18 Dedup.scala diff only
  * ADDS the eval functions) — the one consistent cross-capture mover.
  * Same adjudication shape as ProbeR18: one JVM, one session, 8
  * repetitions of the identical query. A real shift shows a tight band
  * at the slower level; JIT/codegen-cache variance shows a wide band
  * whose floor sits at the fast level. The verdict's plausible suspect
  * (codegen cache pressure from the 5 added r18 queries) is also
  * testable here: rep 1 vs the floor separates compile cost from
  * steady-state cost, and a second block run AFTER compiling the two
  * new eval queries in the same JVM shows whether their presence moves
  * q_dedup_quality's steady state at all. */
object ProbeR19 {
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
    val fn = SparkEntry.queries("q_dedup_quality")
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def block(tag: String): Unit = {
      val times = (1 to 8).map(_ => once())
      println(f"[probe-r19] $tag runs: " +
        times.map(t => f"$t%.2f").mkString(", "))
      println(f"[probe-r19] $tag min=${times.min}%.2f median=" +
        f"${times.sorted.apply(times.size / 2)}%.2f max=${times.max}%.2f")
    }
    once() // untimed: codegen + JIT
    block("q_dedup_quality/alone")
    // now compile+run the two r18-added eval queries once each (the
    // suspect neighbors), then re-measure in the SAME JVM
    Seq("q_dedup_eval", "q_ann_recall").foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
    }
    block("q_dedup_quality/after-evals")
    spark.stop()
  }
}
