package graft

import org.apache.spark.sql.SparkSession

/** Round-18 probe (verdict item 5): q_img_dedup read 2.38 s in the r16
  * idle capture and 2.88 s in r17 with no plan change in the diffs —
  * decide between ImageIO/JIT variance and a real shift (e.g. the
  * localCheckpoint pin no longer covering both self-join sides). One
  * JVM, one session, N repetitions of the identical query: a real shift
  * shows a tight band at the slower level; codec/JIT variance shows a
  * wide band whose floor sits at the fast level. */
object ProbeR18 {
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
    val fn = SparkEntry.queries("q_img_dedup")
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // untimed: codegen + ImageIO class-init + JIT
    val times = (1 to 8).map(_ => once())
    println(f"[probe-r18] q_img_dedup runs: " +
      times.map(t => f"$t%.2f").mkString(", "))
    println(f"[probe-r18] min=${times.min}%.2f median=" +
      f"${times.sorted.apply(times.size / 2)}%.2f max=${times.max}%.2f")
    spark.stop()
  }
}
