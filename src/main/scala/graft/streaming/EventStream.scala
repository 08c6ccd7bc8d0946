package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table shape.
  *
  * The reference has NO streaming (README.md:25 lists it as future work) —
  * this module is the engine's forward-looking stream path, built the
  * Spark-native way: `readStream` → event-time watermark → windowed
  * aggregation, plus stateful sessionization via mapGroupsWithState. The
  * batch queries in [[graft.ops.ScalarOps]] (dailyAgg) are the same logical
  * aggregations; this is their incremental form.
  *
  * Scale: watermark bounds state; window aggs are partial+final over the
  * shuffle by (window, key); session state is per-user and evicted on
  * timeout — the standard unbounded-stream-safe design.
  */
object EventStream {

  /** Explicit schema — streaming sources require one (no inference). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 5-minute windows per event type with a 10-minute watermark:
    * late data beyond the watermark is dropped, state is bounded. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionUpdate(user_id: Long, n_events: Long,
      total_value: Double, closed: Boolean)
  final case class SessionState(n_events: Long, total_value: Double)

  /** Per-user session accumulation with processing-time timeout: each batch
    * folds new events into per-user state; on timeout the session closes and
    * emits its final rollup. The `KeyValueGroupedDataset.mapGroupsWithState`
    * path — custom state the built-in window aggs can't express. */
  def sessionize(events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](timeout) {
        (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(userId, s.n_events, s.total_value, closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
            val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
              case ((cn, cv), e) => (cn + 1, cv + e.value)
            }
            state.update(SessionState(n, v))
            if (useTimeout) state.setTimeoutDuration("30 seconds")
            SessionUpdate(userId, n, v, closed = false)
          }
      }
  }

  /** Drive a stream synchronously into an in-memory table (test/demo
    * harness): returns the query name to SELECT from. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
