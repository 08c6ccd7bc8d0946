package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String): Unit =
    Seq(
      EventStream.Event(1L, Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "click", 1.0),
      EventStream.Event(2L, Timestamp.valueOf("2024-01-01 00:02:00"), 1L, "click", 2.0),
      EventStream.Event(3L, Timestamp.valueOf("2024-01-01 00:06:30"), 2L, "view", 5.0),
      EventStream.Event(4L, Timestamp.valueOf("2024-01-01 00:07:00"), 2L, "click", 3.0))
      .toDF().write.mode("append").parquet(dir)

  test("windowed counts aggregate a parquet-fed stream by 5-minute windows") {
    val dir = Files.createTempDirectory("graft_stream").toString
    writeBatch(dir)
    val agg = EventStream.windowedCounts(EventStream.readEventStream(spark, dir))
    EventStream.runToMemory(agg, "win_out", OutputMode.Update)
    val rows = spark.sql(
      "SELECT window.start, event_type, n_events, sum_value FROM win_out ORDER BY 1, 2")
      .collect()
    assert(rows.length === 3)
    // window [00:00, 00:05): two clicks; [00:05, 00:10): one click, one view
    assert(rows.map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ===
      Seq(("click", 2L, 3.0), ("click", 1L, 3.0), ("view", 1L, 5.0)))
  }

  test("watermark drops events later than the threshold across micro-batches") {
    val dir = Files.createTempDirectory("graft_stream_wm").toString
    // batch 1: event time reaches 01:00 → watermark advances to 00:50
    Seq(EventStream.Event(1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "click", 1.0))
      .toDF().write.mode("append").parquet(dir)
    val agg = EventStream.windowedCounts(EventStream.readEventStream(spark, dir))
    spark.catalog.dropTempView("wm_out")
    val q = agg.writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .format("memory").queryName("wm_out").start()
    try {
      q.processAllAvailable()
      // batch 2: one event far below the watermark (00:00 < 00:50 → DROPPED)
      // and one fresh event (01:01 → aggregated)
      Seq(
        EventStream.Event(2L, Timestamp.valueOf("2024-01-01 00:00:30"), 1L, "late", 7.0),
        EventStream.Event(3L, Timestamp.valueOf("2024-01-01 01:01:00"), 1L, "click", 2.0))
        .toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val types = spark.sql("SELECT DISTINCT event_type FROM wm_out")
      .collect().map(_.getString(0)).toSet
    assert(types.contains("click"))
    assert(!types.contains("late"), "an event below the watermark must be dropped")
  }

  test("progress metrics prove the watermark bounds state and counts drops") {
    val dir = Files.createTempDirectory("graft_stream_metrics").toString
    def land(events: Seq[EventStream.Event]): Unit =
      events.toDF().write.mode("append").parquet(dir)
    // batch 1: 50 keyed windows far in the past + one frontier event that
    // drags the watermark past all of them
    land((1 to 50).map(i => EventStream.Event(i.toLong,
      Timestamp.valueOf(f"2024-01-01 00:${i % 50}%02d:00"), i.toLong, "old", 1.0)) :+
      EventStream.Event(99L, Timestamp.valueOf("2024-01-02 00:00:00"), 99L, "new", 1.0))
    val agg = EventStream.windowedCounts(EventStream.readEventStream(spark, dir))
    spark.catalog.dropTempView("wm_metrics")
    val q = agg.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("wm_metrics").start()
    try {
      q.processAllAvailable()
      // batch 2: a late row (below watermark → dropped AND counted) plus a
      // fresh frontier row; the old windows must have been EVICTED from the
      // state store, not retained forever
      land(Seq(
        EventStream.Event(100L, Timestamp.valueOf("2024-01-01 00:10:30"), 1L, "late", 1.0),
        EventStream.Event(101L, Timestamp.valueOf("2024-01-02 00:05:00"), 7L, "new", 1.0)))
      q.processAllAvailable()
      val progresses = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(progresses.nonEmpty)
      val stateRows = progresses.map(_.stateOperators.head.numRowsTotal)
      // state never holds the 50 evictable windows once the watermark passed:
      // after the cleanup batch the store is down to the frontier windows
      assert(stateRows.last <= 3,
        s"state must be watermark-bounded, got ${stateRows.toSeq}")
      val dropped = progresses
        .map(_.stateOperators.head.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, "the late row must be counted as dropped")
    } finally q.stop()
  }

  test("stateful sessionization folds per-user state across a batch") {
    val dir = Files.createTempDirectory("graft_stream2").toString
    writeBatch(dir)
    // NoTimeout in the synchronous test: ProcessingTimeTimeout keeps
    // scheduling timeout-evaluation batches, which processAllAvailable
    // never drains
    val sessions = EventStream.sessionize(
      EventStream.readEventStream(spark, dir).as[EventStream.Event],
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    EventStream.runToMemory(sessions.toDF(), "sess_out", OutputMode.Update)
    val rows = spark.sql(
      "SELECT user_id, n_events, total_value, closed FROM sess_out ORDER BY user_id")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
      === Seq((1L, 2L, 3.0, false), (2L, 2L, 8.0, false)))
  }

  test("late-data query degrades gracefully on a short-span corpus (empty late stratum)") {
    // events spanning < 8 days: the "old odds" stratum is empty, so the
    // staging loop must skip the missing partition dir and the result is
    // simply the full aggregation (nothing can be late)
    import org.apache.spark.sql.functions._
    val dayNs = 86400L * 1000000000L
    val baseNs = 1704067200L * 1000000000L // 2024-01-01 UTC in nanos
    val rows = (0 until 300).map { i =>
      (i.toLong, baseNs + (i % 3) * dayNs + i * 1000000000L,
        (i % 7).toLong, if (i % 2 == 0) "click" else "view", 1.5, "{}")
    }
    val dir = Files.createTempDirectory("graft_short_span")
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventStream.streamingLateData(spark, dir.toString).collect()
    // full agg: 3 days x 2 types, every row counted (none dropped)
    assert(out.map(_.getAs[Long]("n_events")).sum === 300L)
    assert(out.length === 6)
  }

  test("streaming session windows reproduce the batch session_window answer") {
    val d = "/root/testdata/sf0.001"
    val streamed = EventStream.streamingSessionWindow(spark, d).collect()
    val batch = graft.ops.AnalyticOps.sessionWindowAgg(spark, d).collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    assert(streamed.nonEmpty)
  }

  test("chained re-windowing loses nothing vs the single-grain daily stream") {
    // hourly→daily cascade (two stateful aggs, window_time chaining) must
    // equal the direct one-agg daily stream: every hourly window flushed
    // through, every daily window flushed out, sums exact through both
    // grains
    val d = "/root/testdata/sf0.001"
    val cascade = EventStream.streamingRewindow(spark, d).collect()
    val direct = EventStream.streamingDailyAgg(spark, d).collect()
    assert(cascade.nonEmpty)
    assert(cascade.length === direct.length)
    cascade.zip(direct).foreach { case (c, dd) => assert(c === dd) }
  }
}
