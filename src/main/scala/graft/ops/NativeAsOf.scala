package graft.ops

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** DataFrame API over the native as-of join operator
  * ([[graft.plans.AsOfJoinExec]]) — the whole-operator custom-plan route,
  * sitting beside the composition route ([[AsOfJoin.asOf]]). Both are
  * oracle-checked against DuckDB's native `ASOF JOIN`, and
  * AsOfNativeSpec additionally proves the two implementations agree
  * row-for-row on every variant.
  */
object NativeAsOf {

  /** Ensure the planner knows the strategy even on a session built without
    * `spark.sql.extensions=graft.plans.GraftExtensions` — the
    * `experimental.extraStrategies` hook is the public per-session
    * registration point, and appending idempotently keeps this safe to
    * call per query. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** `left` as-of `right` on `key`/`ts` (backward, boundary inclusive).
    * Right payload columns are exposed as `asof_<name>`; the right side is
    * re-aliased with fresh expression ids so self-derived inputs (the
    * normal case: a table as-of joined to an aggregate of itself) never
    * collide. */
  def asOfNative(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftOuter: Boolean): DataFrame =
    asOfNativeKeys(left, right, Seq(key), ts, leftOuter)

  /** Composite-key form: the join key is a struct of `keys` — the operator
    * clusters and merges on struct hash/ordering, so any number of equality
    * keys costs the same one shuffle per side. Caveat of struct semantics:
    * a NULL key FIELD equals another NULL field (struct ordering compares
    * them equal), unlike a bare SQL equi-join key — filter null key fields
    * upstream when SQL semantics are required (a bare single NULL key is
    * still never matched: the struct itself is non-null). */
  def asOfNativeKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, leftOuter: Boolean): DataFrame = {
    require(keys.nonEmpty, "asOfNativeKeys needs at least one key column")
    val spark = left.sparkSession
    ensureStrategy(spark)
    // prefix right columns at the DataFrame level: output names stay unique
    val renamed = right.select(right.columns.map(c => col(c).as(s"asof_$c")).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right (the analyzer dedups attribute ids for
    // built-in joins; a custom node must do it itself)
    val rAnalyzed = renamed.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' in ${out.map(_.name)}"))
    val rOut = rAliases.map(_.toAttribute)
    def keyExpr(out: Seq[Attribute], names: Seq[String])
        : org.apache.spark.sql.catalyst.expressions.Expression =
      if (names.size == 1) attr(out, names.head)
      else org.apache.spark.sql.catalyst.expressions.CreateStruct(
        names.map(attr(out, _)))
    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      keyExpr(lPlan.output, keys), keyExpr(rOut, keys.map(k => s"asof_$k")),
      attr(lPlan.output, ts), attr(rOut, s"asof_$ts"),
      leftOuter)
    keys.foldLeft(GraftSqlShim.ofRows(spark, plan))((df, k) => df.drop(s"asof_$k"))
  }

  /** FORWARD native as-of (earliest right row at-or-after): mechanically
    * the backward operator on NEGATED event time — greatest −t′ ≤ −t ⟺
    * smallest t′ ≥ t, boundary stays inclusive. The negation columns are
    * plan-time projections; cost is identical to the backward form. */
  def asOfNativeForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, leftOuter: Boolean): DataFrame = {
    val l2 = left.withColumn("__negts", -unix_micros(col(ts)))
    val r2 = right.withColumn("__negts", -unix_micros(col(ts)))
    asOfNative(l2, r2, key, "__negts", leftOuter)
      .drop("__negts").drop("asof___negts")
  }

  // same query shape as q_asof_join / q_asof_join_left (AsOfJoin.scala):
  // every non-signup event joined to that user's most recent signup at or
  // before it — so the SAME DuckDB ASOF oracle checks the native operator
  private def eventSignupNative(spark: SparkSession, d: String, leftOuter: Boolean): DataFrame = {
    val ev = events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val signups = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("signup_ts_k"))
      .agg(max(col("event_id")).as("signup_id"))
      .select(col("user_id"), col("signup_ts_k").as("ts"), col("signup_id"))
    asOfNative(ev.where(col("event_type") =!= "signup"), signups, "user_id", "ts", leftOuter)
      .select(
        col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"),
        col("asof_signup_id").as("signup_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts")))
          .as("micros_since_signup"))
      .orderBy("event_id")
  }

  def eventToLastSignupNative(spark: SparkSession, d: String): DataFrame =
    eventSignupNative(spark, d, leftOuter = false)

  def eventToLastSignupNativeLeft(spark: SparkSession, d: String): DataFrame =
    eventSignupNative(spark, d, leftOuter = true)

  /** [[AsOfJoin.eventToNextSignup]] on the native operator (forward form) —
    * shares the DuckDB `ASOF JOIN ... <=` oracle. */
  def eventToNextSignupNative(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val signups = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("signup_ts_k"))
      .agg(max(col("event_id")).as("signup_id"))
      .select(col("user_id"), col("signup_ts_k").as("ts"), col("signup_id"))
    asOfNativeForward(ev.where(col("event_type") =!= "signup"), signups,
        "user_id", "ts", leftOuter = false)
      .select(
        col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("event_type"),
        col("asof_signup_id").as("signup_id"),
        (unix_micros(col("asof_ts")) - unix_micros(col("ts")))
          .as("micros_until_signup"))
      .orderBy("event_id")
  }

  /** Staleness bound for [[eventToLastSignupFresh]]: 3 days in µs. */
  val ToleranceMicros: Long = 3L * 24 * 3600 * 1000000L

  /** Tolerance / staleness-bounded as-of — the FEATURE-STORE join
    * contract: a feature row older than the staleness bound is treated as
    * missing, not served. Composition: native as-of (left) + a mask on the
    * matched age; the mask must null BOTH payload columns together (a row
    * whose feature is stale has no signup_id AND no age — partial masking
    * would stitch a phantom row). Same cost as the plain native as-of: the
    * mask is map-only. */
  def eventToLastSignupFresh(spark: SparkSession, d: String): DataFrame = {
    val base = eventSignupNative(spark, d, leftOuter = true)
    val fresh = col("micros_since_signup") <= ToleranceMicros
    base.select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"),
      when(fresh, col("signup_id")).as("signup_id"),
      when(fresh, col("micros_since_signup")).as("micros_since_signup"))
  }

  val eventToLastSignupFreshSql: String =
    s"""WITH ev AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events
      |), signups AS (
      |  SELECT user_id, ts, max(event_id) AS signup_id
      |  FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts
      |)
      |SELECT e.event_id, e.user_id, e.ts, e.event_type,
      |       CASE WHEN date_diff('microsecond', s.ts, e.ts) <= $ToleranceMicros
      |            THEN s.signup_id END AS signup_id,
      |       CASE WHEN date_diff('microsecond', s.ts, e.ts) <= $ToleranceMicros
      |            THEN date_diff('microsecond', s.ts, e.ts) END AS micros_since_signup
      |FROM (SELECT * FROM ev WHERE event_type <> 'signup') e
      |ASOF LEFT JOIN signups s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_native"      -> ((s, d) => eventToLastSignupNative(s, d)),
    "q_asof_native_left" -> ((s, d) => eventToLastSignupNativeLeft(s, d)),
    "q_asof_native_fwd"  -> ((s, d) => eventToNextSignupNative(s, d)),
    "q_asof_fresh"       -> ((s, d) => eventToLastSignupFresh(s, d)),
    "q_sql_asof"         -> ((s, d) => sqlAsOf(s, d)))

  /** The SQL `ASOF JOIN` syntax surface ([[graft.plans.AsOfSqlParser]]):
    * the SAME spelling DuckDB executes natively as the oracle, planned
    * here onto the native sorted-merge exec through the parser extension
    * + resolution rule. Needs an extensions session (Verify/Bench set
    * `spark.sql.extensions`; AsOfSqlSpec drives `.withExtensions`). */
  def sqlAsOf(spark: SparkSession, d: String): DataFrame = {
    events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .createOrReplaceTempView("graft_events_asof")
    spark.sql(
      """WITH signups AS (
        |  SELECT user_id, ts, max(event_id) AS signup_id
        |  FROM graft_events_asof WHERE event_type = 'signup'
        |  GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, CAST(e.ts AS timestamp_ntz) AS ts,
        |       e.event_type, s.signup_id,
        |       unix_micros(e.ts) - unix_micros(s.ts) AS micros_since_signup
        |FROM (SELECT * FROM graft_events_asof WHERE event_type <> 'signup') e
        |ASOF JOIN signups s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY event_id""".stripMargin)
  }

  def oracles: Map[String, String] = Map(
    "q_asof_native"      -> AsOfJoin.eventToLastSignupSql,
    "q_asof_native_left" -> AsOfJoin.eventToLastSignupLeftSql,
    "q_asof_native_fwd"  -> AsOfJoin.eventToNextSignupSql,
    "q_asof_fresh"       -> eventToLastSignupFreshSql,
    "q_sql_asof"         -> AsOfJoin.eventToLastSignupSql)
}
