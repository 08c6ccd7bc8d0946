package graft.probes

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Round-21 phase decomposition for the streaming drives (guide §1.1):
  * where does a ~2 s q_stream_* query actually spend its wall-clock —
  * the batch-side staging writes, the stream's fixed start/stop machinery,
  * or the per-micro-batch state-store work? Prints phase timings and the
  * per-batch progress durations Spark itself reports.
  */
object ProbeStream {
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

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe-stream] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm the events read path once
    graft.streaming.EventStream.rawEvents(spark, d).count()

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      // phase 1: staging write (the stageOne primitive)
      val root = java.nio.file.Files.createTempDirectory("probe_stream")
      t("stageOne(rawEvents)") {
        graft.streaming.EventStream.stageOne(
          graft.streaming.EventStream.rawEvents(spark, d),
          root.resolve("stage0"), root.resolve("in.parquet"))
      }
      // phase 2: minimal stream — one tiny file through a stateless
      // passthrough to a memory sink (pure machinery cost)
      val tiny = java.nio.file.Files.createTempDirectory("probe_tiny")
      spark.range(10).select(col("id")).coalesce(1)
        .write.mode("overwrite").parquet(tiny.resolve("in").toString)
      t("minimal stateless 1-batch stream") {
        val q = spark.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType))))
          .parquet(tiny.resolve("in").toString)
          .writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName(s"probe_min_$rep").start()
        q.processAllAvailable(); q.stop()
      }
      // phase 3: one stateful batch over the staged full events file
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      t("stateful dedup stream over staged file") {
        val q = spark.readStream
          .schema(graft.streaming.EventStream.rawSchema)
          .parquet(root.toString)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          .withWatermark("ts", "1 day")
          .dropDuplicates("event_id", "ts")
          .writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName(s"probe_dedup_$rep").start()
        q.processAllAvailable()
        q.recentProgress.foreach { p =>
          val dm = p.durationMs
          println(s"[probe-stream]   batch ${p.batchId}: rows=${p.numInputRows} " +
            s"durations=$dm stateOps=${p.stateOperators.length}")
        }
        q.stop()
      }
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.stop()
  }
}
