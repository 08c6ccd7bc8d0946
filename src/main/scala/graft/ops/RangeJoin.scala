package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Interval (range) join — the second temporal operator Spark lacks a
  * native strategy for (see [[AsOfJoin]] for the first). A naive
  * `a.ts BETWEEN b.start AND b.end` join plans as BroadcastNestedLoop —
  * O(n·m) and a guaranteed blowup at scale.
  *
  * Scale-correct composition: explode each interval into the coarse time
  * BUCKETS it overlaps, equi-join point rows on (key, bucket) — a plain
  * hash join — then apply the exact BETWEEN as a post-filter. Work is
  * O(points + intervals·buckets_per_interval + true_matches); bucket width
  * trades replication factor against join selectivity exactly like any
  * spatial grid index.
  */
object RangeJoin {

  val BucketSeconds = 1800L // 30-min grid, matches the interval length

  /** Events of each user within [signup_ts, signup_ts + 30 min] of that
    * user's signups (sessions-after-signup attribution). */
  def eventsInSignupWindow(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val intervals = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
    // explode intervals over the bucket grid they overlap
    val ib = intervals.select(col("user_id"), col("signup_id"),
        col("start_ts"), col("end_ts"),
        explode(sequence(
          (unix_seconds(col("start_ts")) / BucketSeconds).cast("long"),
          (unix_seconds(col("end_ts")) / BucketSeconds).cast("long")))
          .as("bucket"))
    val pts = ev.where(col("event_type") =!= "signup")
      .withColumn("bucket",
        (unix_seconds(col("ts")) / BucketSeconds).cast("long"))
    pts.join(ib, Seq("user_id", "bucket"))
      .where(col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select(col("event_id"), col("user_id"), col("signup_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"),
        (unix_micros(col("ts")) - unix_micros(col("start_ts")))
          .as("micros_into_window"))
      .orderBy("event_id", "signup_id")
  }

  val eventsInSignupWindowSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events
      |), intervals AS (
      |  SELECT user_id, event_id AS signup_id, ts AS start_ts,
      |         ts + INTERVAL 30 MINUTE AS end_ts
      |  FROM ev WHERE event_type = 'signup'
      |)
      |SELECT e.event_id, e.user_id, i.signup_id, e.ts, e.event_type,
      |       date_diff('microsecond', i.start_ts, e.ts) AS micros_into_window
      |FROM (SELECT * FROM ev WHERE event_type <> 'signup') e
      |JOIN intervals i
      |  ON e.user_id = i.user_id
      | AND e.ts >= i.start_ts AND e.ts <= i.end_ts
      |ORDER BY event_id, signup_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> ((s, d) => eventsInSignupWindow(s, d)))

  def oracles: Map[String, String] = Map(
    "q_range_join" -> eventsInSignupWindowSql)
}
