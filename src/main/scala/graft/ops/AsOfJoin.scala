package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** As-of join — an operator Spark lacks natively (guide preference (a):
  * compose existing ops when semantics allow, before reaching for a custom
  * SparkStrategy).
  *
  * Semantics: for each left row, attach the right row with the greatest
  * timestamp ≤ the left timestamp within the same key (ties include
  * equality). The naive formulation is a range join (O(n·m) per key, a
  * BroadcastNestedLoop blowup at scale); this composition is the
  * scale-correct shape:
  *
  *   union the tagged sides → ONE shuffle by key → window-sort by
  *   (ts, side) → `last(_, ignoreNulls)` carries the most recent right row
  *   forward → filter back to left rows.
  *
  * Wall-clock is one Exchange + one in-partition sort regardless of how
  * many right rows precede each left row. The oracle uses DuckDB's native
  * ASOF JOIN — two independent implementations of the semantics.
  */
object AsOfJoin {

  /** Generic composition: `left` as-of `right` on `key`/`ts`. `right` must
    * be unique per (key, ts) — pre-aggregate if not. Carries all payload
    * columns of both sides given by the selections.
    *
    * NULL-key caveat: the window partition groups null keys together, so a
    * null-key left row WOULD carry a null-key right row — unlike SQL or
    * DuckDB ASOF (and unlike [[NativeAsOf.asOfNative]]), where null never
    * matches. Pre-filter null keys when SQL semantics are required; every
    * oracle-checked caller in this repo joins on non-null keys. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val l = left.withColumn("__side", lit(0))
    val r = right.withColumn("__side", lit(1))
    // align columns: build the union frame with the full column set
    val allCols = (l.columns ++ r.columns).distinct
    val lFull = allCols.foldLeft(l)((acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null)))
    val rFull = allCols.foldLeft(r)((acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null)))
    val u = lFull.select(allCols.map(col): _*)
      .unionByName(rFull.select(allCols.map(col): _*))
    // right rows sort BEFORE left rows at equal ts (desc on __side), so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightPayload = r.columns.filterNot(c => c == key || c == "__side")
    // carry the ENTIRE right row as one struct through a single
    // last(ignoreNulls): per-column carries would back-fill a NULL payload
    // column from an OLDER right row, stitching values of different rows
    val carried = u.withColumn("__asof_row",
      last(when(col("__side") === 1, struct(rightPayload.map(col): _*)),
        ignoreNulls = true).over(w))
    rightPayload.foldLeft(carried) { (acc, c) =>
      acc.withColumn(s"__asof_$c", col("__asof_row").getField(c))
    }.drop("__asof_row").where(col("__side") === 0)
  }

  private def eventSignupAsOf(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // one signup per (user, ts): deterministic max event_id wins
    val signups = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("signup_ts_k"))
      .agg(max(col("event_id")).as("signup_id"))
      .select(col("user_id"), col("signup_ts_k").as("ts"), col("signup_id"))
    asOf(ev.where(col("event_type") =!= "signup"), signups, "user_id", "ts")
  }

  private def projectAsOf(joined: DataFrame): DataFrame =
    joined.select(
        col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"),
        col("__asof_signup_id").as("signup_id"),
        // null-safe: no prior signup ⇒ null micros (left variant)
        (unix_micros(col("ts")) - unix_micros(col("__asof_ts")))
          .as("micros_since_signup"))
      .orderBy("event_id")

  /** Each event joined to that user's most recent signup at-or-before it
    * (inner semantics: events before any signup drop out). */
  def eventToLastSignup(spark: SparkSession, d: String): DataFrame =
    projectAsOf(eventSignupAsOf(spark, d).where(col("__asof_signup_id").isNotNull))

  /** LEFT as-of: every event survives; events with no prior signup carry
    * null signup columns — same single-shuffle composition, the filter is
    * simply dropped (the union-window carry is left-total by construction). */
  def eventToLastSignupLeft(spark: SparkSession, d: String): DataFrame =
    projectAsOf(eventSignupAsOf(spark, d))

  val eventToLastSignupSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events
      |), signups AS (
      |  SELECT user_id, ts, max(event_id) AS signup_id
      |  FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts
      |)
      |SELECT e.event_id, e.user_id, e.ts, e.event_type, s.signup_id,
      |       date_diff('microsecond', s.ts, e.ts) AS micros_since_signup
      |FROM (SELECT * FROM ev WHERE event_type <> 'signup') e
      |ASOF JOIN signups s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY event_id""".stripMargin

  val eventToLastSignupLeftSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events
      |), signups AS (
      |  SELECT user_id, ts, max(event_id) AS signup_id
      |  FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts
      |)
      |SELECT e.event_id, e.user_id, e.ts, e.event_type, s.signup_id,
      |       date_diff('microsecond', s.ts, e.ts) AS micros_since_signup
      |FROM (SELECT * FROM ev WHERE event_type <> 'signup') e
      |ASOF LEFT JOIN signups s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY event_id""".stripMargin

  /** FORWARD as-of: attach the right row with the SMALLEST ts ≥ the left
    * ts within the key ("time until next signup") — the same one-shuffle
    * union-window composition as [[asOf]], run in reverse sort order: the
    * window iterates ts DESCENDING, so `last(ignoreNulls)` carries the
    * NEAREST SUBSEQUENT right row back onto each left row. Equal-ts right
    * rows still sort before left rows (__side desc), keeping the boundary
    * inclusive, mirroring the backward variant. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val l = left.withColumn("__side", lit(0))
    val r = right.withColumn("__side", lit(1))
    val allCols = (l.columns ++ r.columns).distinct
    val lFull = allCols.foldLeft(l)((acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null)))
    val rFull = allCols.foldLeft(r)((acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null)))
    val u = lFull.select(allCols.map(col): _*)
      .unionByName(rFull.select(allCols.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightPayload = r.columns.filterNot(c => c == key || c == "__side")
    val carried = u.withColumn("__asof_row",
      last(when(col("__side") === 1, struct(rightPayload.map(col): _*)),
        ignoreNulls = true).over(w))
    rightPayload.foldLeft(carried) { (acc, c) =>
      acc.withColumn(s"__asof_$c", col("__asof_row").getField(c))
    }.drop("__asof_row").where(col("__side") === 0)
  }

  /** Each event joined to that user's EARLIEST signup at-or-after it
    * (inner semantics: events after the last signup drop out). */
  def eventToNextSignup(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val signups = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("signup_ts_k"))
      .agg(max(col("event_id")).as("signup_id"))
      .select(col("user_id"), col("signup_ts_k").as("ts"), col("signup_id"))
    asOfForward(ev.where(col("event_type") =!= "signup"), signups, "user_id", "ts")
      .where(col("__asof_signup_id").isNotNull)
      .select(
        col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"),
        col("__asof_signup_id").as("signup_id"),
        (unix_micros(col("__asof_ts")) - unix_micros(col("ts")))
          .as("micros_until_signup"))
      .orderBy("event_id")
  }

  val eventToNextSignupSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events
      |), signups AS (
      |  SELECT user_id, ts, max(event_id) AS signup_id
      |  FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts
      |)
      |SELECT e.event_id, e.user_id, e.ts, e.event_type, s.signup_id,
      |       date_diff('microsecond', e.ts, s.ts) AS micros_until_signup
      |FROM (SELECT * FROM ev WHERE event_type <> 'signup') e
      |ASOF JOIN signups s
      |  ON e.user_id = s.user_id AND e.ts <= s.ts
      |ORDER BY event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join"      -> ((s, d) => eventToLastSignup(s, d)),
    "q_asof_join_left" -> ((s, d) => eventToLastSignupLeft(s, d)),
    "q_asof_forward"   -> ((s, d) => eventToNextSignup(s, d)))

  def oracles: Map[String, String] = Map(
    "q_asof_join"      -> eventToLastSignupSql,
    "q_asof_join_left" -> eventToLastSignupLeftSql,
    "q_asof_forward"   -> eventToNextSignupSql)
}
