package graft.probes

import org.apache.spark.sql.SparkSession

/** Per-batch progress decomposition of the heaviest streaming drive
  * (q_stream_join_agg): where do its ~4.4 warm seconds go — staging,
  * stream-stream join addBatch, or trailing no-data batches? Attaches a
  * QueryListener-free approach: re-runs the drive with the drive's own
  * code path but captures q.recentProgress via a listener. */
object ProbeStream2 {
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
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          val p = e.progress
          println(s"[probe-s2] batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs} " +
            s"state=${p.stateOperators.map(s =>
              s"(rows=${s.numRowsTotal},commit=${s.commitTimeMs}ms)").mkString}")
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
      })
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val t0 = System.nanoTime()
      graft.streaming.EventStream.queries("q_stream_join_agg")(spark, d)
        .queryExecution.toRdd.count()
      println(f"[probe-s2] total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
