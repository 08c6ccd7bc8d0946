package graft.probes

import org.apache.spark.sql.SparkSession

/** One-JVM A/B/C of the streaming drives' stateful shuffle width
  * ([[graft.streaming.EventStream.streamParts]]) — guide §1 (measure
  * first) + §5 (per-store commit cost). Every stateful operator opens one
  * state store PER shuffle partition PER micro-batch and pays a commit
  * (delta write + fsync) on each, so a drive whose keyspace fits one
  * store wants the narrowest width; the A/B alternates widths within one
  * JVM so JIT/VM drift hits all arms equally. Reports min-of-reps per
  * (query, width).
  *
  * SPARK_GRAFT_ONLY=q_a,q_b SPARK_GRAFT_WIDTHS=8,2,1
  *   sbt "runMain graft.probes.ProbeStreamWidth"
  */
object ProbeStreamWidth {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val widths = sys.env.getOrElse("SPARK_GRAFT_WIDTHS", "8,2,1")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()
    val all = graft.streaming.EventStream.queries
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { q =>
      all.get(q) match {
        case None => println(s"[probesw] $q UNKNOWN")
        case Some(fn) =>
          def once(w: Int): Double = {
            graft.streaming.EventStream.streamPartsOverride = w
            val t0 = System.nanoTime()
            fn(spark, d).queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }
          widths.foreach(once) // untimed warm-ups, all shapes
          val mins = widths.map { w =>
            val ts = (1 to reps).map(_ => once(w))
            (w, ts.min, ts)
          }
          graft.streaming.EventStream.streamPartsOverride = -1
          println(s"[probesw] $q " + mins.map { case (w, m, ts) =>
            f"w=$w min=$m%.3f (${ts.map(t => f"$t%.2f").mkString(",")})"
          }.mkString("  "))
      }
    }
    spark.stop()
  }
}
