package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Money

/** Analytic aggregation extensions beyond the reference surface: ROLLUP
  * grouping sets, pivot (long→wide), exact percentiles, and a full outer
  * join — the aggregate shapes a warehouse user of the reference's BigQuery
  * backend would reach for next.
  *
  * Scale notes: rollup/pivot are partial+final hash aggregations on
  * low-cardinality keys (the pivot's value list is a fixed literal set, so
  * the wide row is bounded); exact percentile shuffles each group's values —
  * fine for bounded groups, and the Scaladoc points to approx_percentile
  * (t-digest sketch, mergeable map-side) as the 100 TB drop-in.
  */
object AnalyticOps {

  // --- ROLLUP grouping sets -------------------------------------------------
  // Subtotal + grand-total rows in one pass: Spark plans Expand + hash agg
  // (each input row fans out once per grouping set — no extra scan per
  // level). grouping_id disambiguates NULL-as-subtotal from NULL data.
  def rollupAgg(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        Money.moneySum(col("l_extendedprice")).as("sum_price"))
      // Null ordering is explicit on BOTH engines: Spark defaults to NULLS
      // FIRST ascending, DuckDB to NULLS LAST — implicit defaults would
      // order subtotal rows differently if a grouping key held NULL data.
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val rollupAggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS n_rows,
      |       sum(l_quantity) AS sum_qty,
      |       ${Money.moneySumSql("l_extendedprice")} AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // --- CUBE grouping sets ---------------------------------------------------
  // All 2² grouping combinations in one Expand+agg pass (rollup's superset:
  // adds the per-linestatus-only subtotals).
  def cubeAgg(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        Money.moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("gid"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val cubeAggSql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |       count(*) AS n_rows,
      |       ${Money.moneySumSql("o_totalprice")} AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // --- lag/lead window offsets ----------------------------------------------
  // Prior/next order per customer + exact spend delta: offset functions over
  // the same one-shuffle window as the ranking queries. The delta subtracts
  // in integer cents (exact) and converts once at the boundary.
  def windowLag(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        Money.centsToDollars(
          Money.cents(col("o_totalprice")) -
            lag(Money.cents(col("o_totalprice")), 1).over(w))
          .as("delta_vs_prev"))
  }

  val windowLagSql: String = {
    val w = "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"
    s"""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |       lag(o_totalprice, 1) $w AS prev_price,
      |       lead(o_totalprice, 1) $w AS next_price,
      |       ${Money.centsToDollarsSql(
           s"${Money.centsSql("o_totalprice")} - lag(${Money.centsSql("o_totalprice")}, 1) $w")}
      |         AS delta_vs_prev
      |FROM orders""".stripMargin
  }

  // --- explicit GROUPING SETS -----------------------------------------------
  // Arbitrary grouping-set lists beyond rollup/cube's fixed lattices — here
  // the two single-key marginals plus the grand total, skipping the leaf
  // level entirely (a rollup would be forced to compute it). Same Expand +
  // partial/final hash-agg physics: each input row fans out once per set,
  // so cost is sets × scan, never sets × shuffle.
  def groupingSetsAgg(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        Money.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val groupingSetsAggSql: String =
    s"""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS n_rows,
      |       sum(l_quantity) AS sum_qty,
      |       ${Money.moneySumSql("l_extendedprice")} AS sum_price,
      |       l_returnflag, l_linestatus
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // --- date-spine gap fill --------------------------------------------------
  // The training-pipeline "complete panel" shape: every (event_type, day)
  // cell present even when no events landed, zero-filled. The spine is
  // derived, not hand-written: global min/max dates (one tiny agg) →
  // `sequence` + explode → cross join with the distinct type set. Both spine
  // inputs are bounded (days × types), so the cross join and the final left
  // join broadcast — the only real shuffle at any scale is the daily
  // aggregation over the fact table itself.
  def dateSpine(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(count(lit(1)).as("n_events"),
        Money.moneySum(col("value")).as("sum_value"))
    val spine = ev.agg(min(to_date(col("ts"))).as("mn"), max(to_date(col("ts"))).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("dt"))
      .crossJoin(ev.select(col("event_type")).distinct())
    spine.join(daily, Seq("event_type", "dt"), "left")
      .select(col("event_type"), col("dt"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("event_type", "dt")
  }

  val dateSpineSql: String =
    s"""WITH b AS (
      |  SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events
      |), spine AS (
      |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS dt FROM b
      |), types AS (
      |  SELECT DISTINCT event_type FROM events
      |), daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS dt,
      |         count(*) AS n_events,
      |         ${Money.moneySumSql("value")} AS sum_value
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT t.event_type, s.dt,
      |       COALESCE(d.n_events, 0) AS n_events,
      |       COALESCE(d.sum_value, 0.0) AS sum_value
      |FROM spine s
      |CROSS JOIN types t
      |LEFT JOIN daily d ON d.event_type = t.event_type AND d.dt = s.dt
      |ORDER BY t.event_type, s.dt""".stripMargin

  // --- statistical aggregates (variance family) -----------------------------
  // stddev/variance/correlation/covariance per group — single-pass
  // central-moment aggregations (partial+final mergeable, no value
  // materialization). Both engines use numerically stable merge formulas
  // but combine partials in different orders, so raw doubles differ in
  // the last ulps; outputs quantize to a 1e-4 grid (≥10 orders of
  // magnitude coarser than the wiggle) and no raw double crosses the
  // engine boundary.
  def statsAgg(spark: SparkSession, d: String): DataFrame = {
    def q4(c: org.apache.spark.sql.Column, name: String) =
      floor(c * lit(10000.0)).as(name)
    lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        q4(stddev_samp(col("l_quantity")), "sd_qty_q"),
        q4(var_samp(col("l_quantity")), "var_qty_q"),
        q4(corr(col("l_quantity"), col("l_extendedprice")), "corr_q"),
        q4(covar_samp(col("l_quantity"), col("l_discount")), "cov_q"))
      .orderBy("l_returnflag")
  }

  val statsAggSql: String =
    """SELECT l_returnflag,
      |       count(*) AS n_rows,
      |       CAST(floor(stddev_samp(l_quantity) * 10000.0) AS BIGINT) AS sd_qty_q,
      |       CAST(floor(var_samp(l_quantity) * 10000.0) AS BIGINT) AS var_qty_q,
      |       CAST(floor(corr(l_quantity, l_extendedprice) * 10000.0) AS BIGINT) AS corr_q,
      |       CAST(floor(covar_samp(l_quantity, l_discount) * 10000.0) AS BIGINT) AS cov_q
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- equal-frequency binning (quantile discretization) --------------------
  // ntile(8) over order totals with a total order (price, orderkey — ties
  // can't straddle a boundary differently per engine), then per-bin count,
  // range, and exact money sum: the feature-discretization op. The ntile is
  // the two-pass exact form ([[graft.operators.ScaleTools.globalNtile]]):
  // range partition on the sort key, broadcast per-partition counts as
  // offsets, integer-reconstruct the bucket — bit-identical to the window
  // ntile with NO single-partition stage, so the scan never single-threads
  // at 100 TB.
  def quantileBins(spark: SparkSession, d: String): DataFrame = {
    graft.operators.ScaleTools.globalNtile(
      orders(spark, d).select(col("o_orderkey"), col("o_totalprice")),
      Seq(col("o_totalprice"), col("o_orderkey")), 8, "bin")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        Money.moneySum(col("o_totalprice")).as("sum_value"))
      .orderBy("bin")
  }

  val quantileBinsSql: String =
    s"""WITH b AS (
      |  SELECT o_totalprice,
      |         CAST(ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
      |           AS bin
      |  FROM orders
      |)
      |SELECT bin, count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi,
      |       ${Money.moneySumSql("o_totalprice")} AS sum_value
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  // --- Welch's t (experiment/segment comparison) ----------------------------
  // Per-segment two-sample Welch t-statistic of order totals vs ALL OTHER
  // segments, rebuilt from exact per-group sums: one hash-agg pass collects
  // (n, Σcents, Σcents²) per segment — cents² summed as DECIMAL(38,0)
  // (a long accumulator would overflow past ~4k rows/group at 5e7
  // cents/row; DuckDB's HUGEINT sum is the same exact form) — then the
  // grand totals broadcast back onto the pinned 5-row rollup and the
  // complement group falls out by subtraction (no unpartitioned window —
  // WindowLintSpec holds the whole surface to zero of those).
  // All doubles appear AFTER the exact sums, in ONE expression tree both
  // engines evaluate in the same order (exact ints → deterministic
  // doubles; / and sqrt are IEEE-determined), floor-quantized at the
  // boundary. Scale: the shuffle is the groupBy on c_mktsegment (5 keys,
  // map-side partials do the work); the pin is segment-cardinality.
  def welchT(spark: SparkSession, d: String): DataFrame = {
    val cents = Money.cents(col("o_totalprice"))
    val per = orders(spark, d)
      .join(customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(cents).as("s"),
        sum((cents * cents).cast("decimal(38,0)")).as("q"))
      // pinned so the totals pass below reads the 5-row rollup, not a
      // second fact scan (exchange reuse doesn't fire across branches)
      .localCheckpoint()
    val tot = per.crossJoin(broadcast(per.agg(
      sum(col("n")).as("nn"), sum(col("s")).as("ss"), sum(col("q")).as("qq"))))
    val n1 = col("n").cast("double")
    val s1 = col("s").cast("double")
    val q1 = col("q").cast("double")
    val n2 = (col("nn") - col("n")).cast("double")
    val s2 = (col("ss") - col("s")).cast("double")
    val q2 = (col("qq") - col("q")).cast("double")
    val m1 = s1 / n1
    val m2 = s2 / n2
    val v1 = (q1 - s1 * s1 / n1) / (n1 - lit(1.0))
    val v2 = (q2 - s2 * s2 / n2) / (n2 - lit(1.0))
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / sqrt(se2)
    val dfW = (se2 * se2) /
      ((v1 / n1) * (v1 / n1) / (n1 - lit(1.0)) +
        (v2 / n2) * (v2 / n2) / (n2 - lit(1.0)))
    tot.select(col("c_mktsegment"), col("n"),
        floor(m1 * lit(100.0)).cast("long").as("mean_cents_q"),
        floor(t * lit(1000000.0)).cast("long").as("t_welch_q"),
        floor(dfW * lit(1000.0)).cast("long").as("df_welch_q"))
      .orderBy("c_mktsegment")
  }

  val welchTSql: String = {
    val c = Money.centsSql("o_totalprice")
    // identical expression tree as the Column form, inlined via macros
    val n1 = "CAST(n AS DOUBLE)"; val s1 = "CAST(s AS DOUBLE)"
    val q1 = "CAST(q AS DOUBLE)"
    val n2 = "CAST(nn - n AS DOUBLE)"; val s2 = "CAST(ss - s AS DOUBLE)"
    val q2 = "CAST(qq - q AS DOUBLE)"
    val m1 = s"($s1 / $n1)"; val m2 = s"($s2 / $n2)"
    val v1 = s"(($q1 - $s1 * $s1 / $n1) / ($n1 - 1.0))"
    val v2 = s"(($q2 - $s2 * $s2 / $n2) / ($n2 - 1.0))"
    val se2 = s"($v1 / $n1 + $v2 / $n2)"
    val t = s"(($m1 - $m2) / sqrt($se2))"
    val dfW = s"(($se2 * $se2) / (($v1 / $n1) * ($v1 / $n1) / ($n1 - 1.0)" +
      s" + ($v2 / $n2) * ($v2 / $n2) / ($n2 - 1.0)))"
    s"""WITH per AS (
      |  SELECT c_mktsegment, count(*) AS n,
      |         CAST(sum($c) AS BIGINT) AS s,
      |         sum(CAST($c * $c AS HUGEINT)) AS q
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1
      |), tot AS (
      |  SELECT *, sum(n) OVER () AS nn, sum(s) OVER () AS ss,
      |         sum(q) OVER () AS qq
      |  FROM per
      |)
      |SELECT c_mktsegment, n,
      |       CAST(floor($m1 * 100.0) AS BIGINT) AS mean_cents_q,
      |       CAST(floor($t * 1000000.0) AS BIGINT) AS t_welch_q,
      |       CAST(floor($dfW * 1000.0) AS BIGINT) AS df_welch_q
      |FROM tot
      |ORDER BY c_mktsegment""".stripMargin
  }

  // --- forward fill (last observation carried forward) ----------------------
  // The time-series imputation twin of q_date_spine: build the complete
  // (cohort, day) panel, then carry each cohort's last observed value
  // across the gaps with last_value(..., ignoreNulls) over a running
  // frame. One window shuffle keyed by cohort; the spine join is broadcast
  // (bounded days × cohorts). The sparse base (signup events with
  // value > 9) makes real gaps, so the fill is genuinely exercised.
  def forwardFill(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(spark, d)
    val daily = ev
      .where(col("event_type") === "signup" && col("value") > 9)
      .groupBy((col("user_id") % 10).as("cohort"), to_date(col("ts")).as("dt"))
      .agg(Money.moneySum(col("value")).as("raw_sum"))
    val spine = ev.agg(min(to_date(col("ts"))).as("mn"), max(to_date(col("ts"))).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("dt"))
      .crossJoin(spark.range(0, 10).select(col("id").as("cohort")))
    val w = Window.partitionBy(col("cohort")).orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("cohort", "dt"), "left")
      .select(col("cohort"), col("dt"), col("raw_sum"),
        coalesce(last(col("raw_sum"), ignoreNulls = true).over(w), lit(0.0))
          .as("filled"))
      .orderBy("cohort", "dt")
  }

  val forwardFillSql: String =
    s"""WITH b AS (
      |  SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events
      |), spine AS (
      |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS dt FROM b
      |), cohorts AS (
      |  SELECT i AS cohort FROM range(0, 10) t(i)
      |), daily AS (
      |  SELECT user_id % 10 AS cohort, CAST(ts AS DATE) AS dt,
      |         ${Money.moneySumSql("value")} AS raw_sum
      |  FROM events
      |  WHERE event_type = 'signup' AND value > 9
      |  GROUP BY 1, 2
      |)
      |SELECT c.cohort, s.dt, d.raw_sum,
      |       COALESCE(last_value(d.raw_sum IGNORE NULLS) OVER (
      |         PARTITION BY c.cohort ORDER BY s.dt
      |         ROWS UNBOUNDED PRECEDING), 0.0) AS filled
      |FROM spine s
      |CROSS JOIN cohorts c
      |LEFT JOIN daily d ON d.cohort = c.cohort AND d.dt = s.dt
      |ORDER BY c.cohort, s.dt""".stripMargin

  // --- unpivot (wide → long) ------------------------------------------------
  // The melt inverse of q_pivot: the wide daily table back to (dt,
  // event_type, n) rows via the native unpivot operator (an Expand node —
  // one output row per value column per input row, no shuffle, no join).
  // The oracle uses explicit UNION ALL: the semantics unpivot must match.
  // Spark's unpivot DROPS null-valued rows; the coalesce below makes the
  // no-null invariant local instead of inherited from pivotDaily's
  // zero-fill (the oracle's UNION ALL keeps every (dt, event_type) cell).
  def unpivotDaily(spark: SparkSession, d: String): DataFrame =
    pivotDaily(spark, d)
      .unpivot(
        Array(col("dt")),
        EventTypes.map(t => coalesce(col(s"n_$t"), lit(0L)).as(s"n_$t")).toArray,
        "event_type", "n")
      .withColumn("event_type", regexp_replace(col("event_type"), "^n_", ""))
      .orderBy("dt", "event_type")

  // lazy: EventTypes/pivotDailySql are declared later in the object, and a
  // strict val here would read them as null during class init
  lazy val unpivotDailySql: String = {
    val arms = EventTypes.map(t =>
      s"SELECT dt, '$t' AS event_type, n_$t AS n FROM wide").mkString("\n      |  UNION ALL\n      |  ")
    s"""WITH wide AS (${pivotDailySql.replace("\n", "\n      |")})
      |SELECT * FROM (
      |  $arms
      |)
      |ORDER BY dt, event_type""".stripMargin
  }

  // --- native session windows -----------------------------------------------
  // Spark's session_window() in a BATCH aggregation — the declarative twin
  // of the gaps-and-islands sessionizer (q_sessionize_batch): Catalyst
  // plans a dedicated SessionWindow aggregation (sort within partition +
  // merge-on-overlap), no window functions involved. Semantics differ at
  // the boundary: a session window is [first, last+gap), so an event at
  // EXACTLY gap distance starts a new session (>= in the oracle, where the
  // lag-based sessionizer uses >). window.end = last event + gap.
  def sessionWindowAgg(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        Money.moneySum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("sw.start").cast("timestamp_ntz").as("session_start"),
        col("sw.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val sessionWindowAggSql: String =
    s"""WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
      |), marked AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= ${30 * 60 * 1000000L}
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), numbered AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked
      |)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       count(*) AS n_events,
      |       ${Money.moneySumSql("value")} AS sum_value
      |FROM numbered
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // --- sliding (hopping) time windows ---------------------------------------
  // window(ts, 7 days, 1 day): every event lands in SEVEN overlapping
  // windows — Spark plans one Expand (7 rows per event) + hash agg, the
  // rolling-metrics primitive with no self-join and no spine table. Window
  // starts are epoch-aligned on the 1-day slide, so they sit on UTC
  // midnights — the oracle regenerates each event's 7 membership rows
  // directly.
  def slidingWindowAgg(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        Money.moneySum(col("value")).as("sum_value"))
      .select(to_date(col("w.start")).as("window_start"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start")

  val slidingWindowAggSql: String =
    s"""WITH member AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) - CAST(i AS INTEGER) AS window_start, value
      |  FROM events, range(0, 7) r(i)
      |)
      |SELECT window_start, count(*) AS n_events,
      |       ${Money.moneySumSql("value")} AS sum_value
      |FROM member
      |GROUP BY window_start
      |ORDER BY window_start""".stripMargin

  // --- rolling 7-day active users (WAU) -------------------------------------
  // COUNT DISTINCT over a sliding window: the Expand fans each event into
  // its 7 windows, the (window, user) dedup collapses map-side per
  // partition before the wire, and the final count is a plain hash agg.
  // No self-join, no spine, and the distinct shuffles (window, user) id
  // pairs only — the standard scale-out WAU/rolling-DAU shape.
  def rollingActiveUsers(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(window(col("ts"), "7 days", "1 day").as("w"), col("user_id"))
      .distinct()
      .groupBy(to_date(col("w.start")).as("window_start"))
      .agg(count(lit(1)).as("wau"))
      .orderBy("window_start")

  val rollingActiveUsersSql: String =
    """WITH member AS (
      |  SELECT DISTINCT
      |         CAST(CAST(ts AS TIMESTAMP) AS DATE) - CAST(i AS INTEGER) AS window_start,
      |         user_id
      |  FROM events, range(0, 7) r(i)
      |)
      |SELECT window_start, count(*) AS wau
      |FROM member
      |GROUP BY window_start
      |ORDER BY window_start""".stripMargin

  // --- RANGE value-window frame (rolling 1-hour sum) ------------------------
  // A VALUE-based frame — RANGE BETWEEN 3600s PRECEDING AND CURRENT ROW over
  // event time — vs q_window_frames' ROWS frames: the frame holds whatever
  // falls in the time interval, not a fixed row count, and peers with equal
  // timestamps all enter the frame together (both engines' RANGE
  // semantics, so ties are deterministic without a unique sort key). Time
  // is integer epoch-µs and the sums are integer cents: exact. One
  // user_id exchange; the final event_id sort is presentation-only.
  def rangeFrame(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    events(spark, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), Money.cents(col("value")).as("cents"))
      .withColumn("roll_cents", sum(col("cents")).over(w))
      .orderBy("event_id")
  }

  val rangeFrameSql: String =
    s"""WITH e AS (
      |  SELECT event_id, user_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |         ${Money.centsSql("value")} AS cents
      |  FROM events
      |)
      |SELECT event_id, user_id, us, cents,
      |       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY us
      |             RANGE BETWEEN ${3600L * 1000000L} PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS roll_cents
      |FROM e ORDER BY event_id""".stripMargin

  // --- skyline / Pareto frontier --------------------------------------------
  // Customers not dominated on (acctbal, order count): q dominates p iff
  // q ≥ p on both axes and > on at least one. The engine runs the
  // O(n log n) sweep — collapse ties to per-x best-y, then one descending-x
  // window pass where prev_max = best y over STRICTLY higher x; p survives
  // iff it is its x-group's best AND beats every higher-x point. The
  // oracle is the O(n²) NOT EXISTS restatement of the dominance definition
  // itself — the pair (fast plan, definitional oracle) is the point: at
  // scale only the sweep survives, and the sweep is one fact shuffle plus
  // two x-cardinality window/join passes.
  def skyline(spark: SparkSession, d: String): DataFrame = {
    val pts = customer(spark, d).as("c")
      .join(orders(spark, d).as("o"), col("o.o_custkey") === col("c.c_custkey"), "left")
      .groupBy(col("c.c_custkey").as("c_custkey"), col("c.c_acctbal").as("c_acctbal"))
      .agg(count(col("o.o_orderkey")).as("n_orders"))
    val grp = pts.groupBy(col("c_acctbal")).agg(max(col("n_orders")).as("best_y"))
    // strict prefix max over descending x: the two-pass exact form — range
    // partition on x desc, local strict-prefix window PARTITIONED by the
    // range-partition id, broadcast earlier-partition maxima. Same output as
    // the unpartitioned sweep window, no single-partition stage.
    val ranked = graft.operators.ScaleTools.globalPrefixMax(
      grp, Seq(col("c_acctbal").desc), col("best_y"), "prev_max")
    pts.join(ranked, Seq("c_acctbal"))
      .where(col("n_orders") === col("best_y") &&
        (col("prev_max").isNull || col("prev_max") < col("n_orders")))
      .select(col("c_custkey"), col("c_acctbal"), col("n_orders"))
      .orderBy("c_custkey")
  }

  val skylineSql: String =
    """WITH pts AS (
      |  SELECT c.c_custkey, c.c_acctbal,
      |         CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
      |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_custkey, c.c_acctbal
      |)
      |SELECT p.c_custkey, p.c_acctbal, p.n_orders
      |FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.c_acctbal >= p.c_acctbal AND q.n_orders >= p.n_orders
      |    AND (q.c_acctbal > p.c_acctbal OR q.n_orders > p.n_orders))
      |ORDER BY p.c_custkey""".stripMargin

  // --- windowed argmax (top event type per sliding window) ------------------
  // The "what dominated each rolling week" retention signal: per 7-day/1-day
  // hopping window, the single top event_type by count plus its exact
  // integer ppm share of the window. One Expand fans events into their 7
  // windows, one hash agg counts (window, type), and BOTH window functions
  // (row_number for the argmax, sum for the total) share ONE partition-by-
  // window Exchange+sort. Ties break on event_type, so the argmax is
  // unique; the share is integer-floor ppm — zero float tolerance.
  def windowArgmax(spark: SparkSession, d: String): DataFrame = {
    val cnt = events(spark, d)
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val byW = org.apache.spark.sql.expressions.Window.partitionBy(col("w"))
    cnt
      .withColumn("rn", row_number().over(byW.orderBy(col("n").desc, col("event_type").asc)))
      .withColumn("total_n", sum(col("n")).over(byW))
      .where(col("rn") === 1)
      .select(to_date(col("w.start")).as("window_start"),
        col("event_type").as("top_type"), col("n").as("top_n"), col("total_n"),
        expr("(n * 1000000) div total_n").as("top_share_ppm"))
      .orderBy("window_start")
  }

  val windowArgmaxSql: String =
    """WITH member AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) - CAST(i AS INTEGER) AS window_start,
      |         event_type
      |  FROM events, range(0, 7) r(i)
      |), cnt AS (
      |  SELECT window_start, event_type, count(*) AS n
      |  FROM member GROUP BY window_start, event_type
      |), ranked AS (
      |  SELECT window_start, event_type, n,
      |         row_number() OVER (PARTITION BY window_start ORDER BY n DESC, event_type) AS rn,
      |         CAST(sum(n) OVER (PARTITION BY window_start) AS BIGINT) AS total_n
      |  FROM cnt
      |)
      |SELECT window_start, event_type AS top_type, n AS top_n, total_n,
      |       (n * 1000000) // total_n AS top_share_ppm
      |FROM ranked WHERE rn = 1
      |ORDER BY window_start""".stripMargin

  // --- percent-of-total shares ----------------------------------------------
  // Each event type's share of its day's events — the ratio_to_report
  // window shape, in EXACT integer arithmetic: share = (n·1e6) div total,
  // so the 25-row output needs no float tolerance at all. One agg shuffle
  // + one day-partitioned window over the tiny aggregate.
  def dailyShare(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events(spark, d)
      .groupBy(to_date(col("ts")).as("dt"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share_ppm",
        expr("(n * 1000000) div sum(n) over (partition by dt)"))
      .orderBy("dt", "event_type")
  }

  val dailyShareSql: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS dt, event_type,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT dt, event_type, n,
      |       (n * 1000000) // CAST(sum(n) OVER (PARTITION BY dt) AS BIGINT)
      |         AS share_ppm
      |FROM daily
      |ORDER BY dt, event_type""".stripMargin

  // --- market-basket co-occurrence ------------------------------------------
  // Top co-purchased part pairs: distinct parts per order self-joined on
  // the ORDER key with a < b (each unordered pair once), counted globally.
  // The join fans out only within an order — pairs per order are bounded
  // by (parts/order choose 2), so the shuffle is O(rows·pairs-per-order),
  // never O(n²). Top-k by (count, pair) with a full tiebreak so limit is
  // deterministic; plans as TakeOrderedAndProject.
  val CoOccurTopK = 50

  def coOccurrence(spark: SparkSession, d: String): DataFrame = {
    val parts = lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    parts.select(col("ok"), col("pk").as("part_a"))
      .join(parts.select(col("ok"), col("pk").as("part_b")), Seq("ok"))
      .where(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(CoOccurTopK)
  }

  val coOccurrenceSql: String =
    s"""WITH parts AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |)
      |SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_orders
      |FROM parts a JOIN parts b ON a.ok = b.ok AND a.pk < b.pk
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, part_a, part_b
      |LIMIT $CoOccurTopK""".stripMargin

  // --- batch sessionization (gaps-and-islands) ------------------------------
  // The batch twin of the streaming sessionizer: a new session starts after
  // a >30-minute silence. Two window passes over ONE shuffle (same
  // partition-by key and ordering → single Exchange + Sort in the plan):
  // lag() marks session starts, a running sum numbers them, then a hash agg
  // rolls sessions up. The ordering tiebreaks on event_id so ties in ts
  // can't make the numbering nondeterministic. This is the standard
  // scale-out sessionization: all work is per-user-partitioned, no
  // driver-side state, skew bounded by the busiest single user.
  val SessionGapUs: Long = 30L * 60L * 1000000L

  def sessionizeBatch(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).cast("timestamp_ntz").as("session_start"),
        max(col("ts")).cast("timestamp_ntz").as("session_end"),
        Money.moneySum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeBatchSql: String =
    s"""WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
      |), marked AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $SessionGapUs
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked
      |)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS n_events,
      |       min(ts) AS session_start,
      |       max(ts) AS session_end,
      |       ${Money.moneySumSql("value")} AS sum_value
      |FROM numbered
      |GROUP BY 1, 2
      |ORDER BY user_id, session_id""".stripMargin

  // --- rank-family window functions -------------------------------------------
  // rank / dense_rank / percent_rank / cume_dist over one shuffle; the window
  // ORDER BY is price alone (no unique tiebreak) so tie semantics — equal
  // values share a rank, percent_rank = (rank−1)/(n−1), cume_dist = peers'
  // cumulative fraction — are actually exercised and must agree across
  // engines. The final output sort adds the unique key for determinism.
  def windowRank(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc)
    orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"))
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  val windowRankSql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |       CAST(rank() OVER w AS BIGINT) AS rnk,
      |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |       percent_rank() OVER w AS prnk,
      |       cume_dist() OVER w AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
      |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin

  // --- pivot (long → wide) --------------------------------------------------
  // Explicit value list (no discovery pass over the data, deterministic
  // column set at any scale); absent combinations coalesce to 0 so the wide
  // table is total.
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotDaily(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(to_date(col("ts")).as("dt"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("dt") +: EventTypes.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("dt")

  val pivotDailySql: String = {
    val cols = EventTypes.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n      |       ")
    s"""SELECT CAST(ts AS DATE) AS dt,
      |       $cols
      |FROM events
      |GROUP BY 1
      |ORDER BY dt""".stripMargin
  }

  // --- exact percentiles ----------------------------------------------------
  // Exact interpolated quantiles (Spark `percentile` ≡ DuckDB quantile_cont:
  // lower + frac·(upper−lower) at rank (n−1)·q — exact doubles on the
  // integral quantity domain, so both engines agree bit-for-bit). At 100 TB
  // swap in approx_percentile: a mergeable sketch that keeps the
  // aggregation partial+final instead of materializing each group's values.
  def quantiles(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("l_quantity")).as("q_min"),
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        max(col("l_quantity")).as("q_max"))
      .orderBy("l_returnflag")

  val quantilesSql: String =
    """SELECT l_returnflag,
      |       min(l_quantity) AS q_min,
      |       quantile_cont(l_quantity, 0.25) AS p25,
      |       quantile_cont(l_quantity, 0.5) AS p50,
      |       quantile_cont(l_quantity, 0.75) AS p75,
      |       max(l_quantity) AS q_max
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- deterministic mode ----------------------------------------------------
  // mode(col, deterministic=true): Spark 4's tie rule (lowest value among
  // the most frequent) made explicit — an UNDETERMINISTIC mode could never
  // hash-match across engines or even across partitionings. The oracle
  // restates the definition (min value at max frequency), not DuckDB's
  // mode() builtin, whose tie behavior is unspecified.
  def modeAgg(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(mode(col("l_quantity"), deterministic = true).as("mode_qty"))
      .orderBy("l_returnflag")

  val modeAggSql: String =
    """WITH c AS (
      |  SELECT l_returnflag AS rf, l_quantity AS q, count(*) AS n
      |  FROM lineitem GROUP BY 1, 2
      |), m AS (
      |  SELECT rf, max(n) AS mx FROM c GROUP BY rf
      |)
      |SELECT c.rf AS l_returnflag, min(c.q) AS mode_qty
      |FROM c JOIN m ON c.rf = m.rf AND c.n = m.mx
      |GROUP BY c.rf
      |ORDER BY l_returnflag""".stripMargin

  // --- discrete percentiles (ANSI percentile_disc WITHIN GROUP) -------------
  // The no-interpolation twin of q_quantiles: percentile_disc returns an
  // ACTUAL data value (ANSI: the least value whose cumulative distribution
  // ≥ p). Engines disagree on discrete-quantile conventions, so the oracle
  // restates the ANSI definition itself via cume_dist — definition-exact,
  // not a trust-the-builtin comparison. cume_dist is an exact rational
  // (tie-rank / n) divided once; the p comparisons are identical doubles
  // both sides.
  def quantilesDisc(spark: SparkSession, d: String): DataFrame = {
    events(spark, d).createOrReplaceTempView("graft_events")
    spark.sql(
      """SELECT event_type,
        |       percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
        |       percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
        |       percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS p75
        |FROM graft_events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
  }

  val quantilesDiscSql: String =
    """WITH cd AS (
      |  SELECT event_type, value,
      |         cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
      |  FROM events
      |)
      |SELECT event_type,
      |       min(CASE WHEN cd >= 0.25 THEN value END) AS p25,
      |       min(CASE WHEN cd >= 0.5  THEN value END) AS p50,
      |       min(CASE WHEN cd >= 0.75 THEN value END) AS p75
      |FROM cd
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- fixed-width histogram ------------------------------------------------
  // Value distribution in one hash agg: bucket = floor(x/width) — the same
  // double division and floor on both engines, exact per row. Bounded
  // output (price range / width buckets) at any input scale.
  val HistWidth = 25000.0

  def histogram(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .groupBy(floor(col("o_totalprice") / lit(HistWidth)).as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        Money.moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("bucket")

  val histogramSql: String =
    s"""SELECT CAST(floor(o_totalprice / $HistWidth) AS BIGINT) AS bucket,
      |       count(*) AS n_orders,
      |       ${Money.moneySumSql("o_totalprice")} AS sum_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // --- full outer join ------------------------------------------------------
  // Both sides contribute unmatched rows (high-balance customers without
  // finished orders; finished-order customers below the balance cut) — the
  // join key coalesces across sides. Same hash-join physics as J1/J2.
  def fullJoin(spark: SparkSession, d: String): DataFrame = {
    val rich = customer(spark, d)
      .where(col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_acctbal"))
    val finished = orders(spark, d)
      .where(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(Money.moneySum(col("o_totalprice")).as("f_spend"))
    rich.join(finished, Seq("c_custkey"), "full_outer")
      .orderBy("c_custkey")
  }

  val fullJoinSql: String =
    s"""SELECT c_custkey, c_acctbal, f_spend
      |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) r
      |FULL OUTER JOIN (
      |  SELECT o_custkey AS c_custkey,
      |         ${Money.moneySumSql("o_totalprice")} AS f_spend
      |  FROM orders WHERE o_orderstatus = 'F'
      |  GROUP BY o_custkey) f
      |USING (c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --- row_number()=1 dedup (the rewrite-rule target shape) ----------------
  // "Latest event per user" written exactly as the ubiquitous windowed
  // dedup idiom. Under the engine's extensions session
  // ([[graft.plans.RowNumberDedupRule]]) this plans as a partial+final
  // ObjectHashAggregate over [[graft.plans.MinRowBy]] — no sort, no Window
  // operator, map-side combine before the exchange (plan-audited in
  // RowNumberDedupSpec); on a plain session it falls back to the window
  // plan with the same answer. Total order (ts desc, event_id desc) makes
  // the pick deterministic and oracle-checkable.
  def dedupRewrite(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts").cast("timestamp_ntz").as("last_ts"))
      .orderBy("user_id")
  }

  val dedupRewriteSql: String =
    """SELECT user_id, event_id AS last_event_id,
      |       event_type AS last_event_type, CAST(ts AS TIMESTAMP) AS last_ts
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** Per-customer top-3 orders by price through the [[graft.plans.TopKRows]]
    * bounded-heap aggregate (the engine's hash top-k-per-group — k rows per
    * partition cross the shuffle, no per-group sort; see TopKRows scaladoc
    * for the 10⁸-row-group argument vs the window form). Ord is
    * (−price, orderkey): ascending heap order ≡ price DESC with key
    * tie-break — a total order, so the oracle's row_number() is
    * deterministic too. posexplode turns the rank-ordered array back into
    * (rank, row) lines. */
  def topkAgg(spark: SparkSession, d: String): DataFrame = {
    val value = struct(col("o_orderkey"), col("o_totalprice"))
    val ord = struct(-col("o_totalprice"), col("o_orderkey"))
    val shim = org.apache.spark.sql.GraftSqlShim
    val top = shim.column(
      graft.plans.TopKRows(
        shim.expression(value), shim.expression(ord), 3).toAggregateExpression())
    orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(top.as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rk"),
        col("col.o_orderkey").as("o_orderkey"),
        col("col.o_totalprice").as("o_totalprice"))
      .orderBy("o_custkey", "rk")
  }

  val topkAggSql: String =
    """SELECT o_custkey, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  // --- KMV distinct sketches ------------------------------------------------
  /** Per-group distinct-count estimation via the [[graft.plans.KmvSketch]]
    * k-minimum-values sketch (k = 64) over the cross-engine hash, beside
    * the exact `COUNT(DISTINCT)` it replaces at scale. The exact side is
    * the expensive plan (every distinct (flag, partkey) pair crosses the
    * shuffle); the sketch side ships ≤ 64 longs per partition per group —
    * at 100 TB that is the difference between a distinct-value shuffle
    * and a constant-size one. Hashes are truncated to 45 bits (`>> 15`)
    * so the estimator's (k−1)·M numerator (63·2^45 ≈ 2.2e15) stays in
    * exact long arithmetic in BOTH engines; estimates are therefore
    * bit-reproducible, unlike approx_count_distinct's engine-internal
    * HLL. n < k means the sketch saw every distinct hash: exact count. */
  def kmvDistinct(spark: SparkSession, d: String): DataFrame = {
    val shim = org.apache.spark.sql.GraftSqlShim
    import graft.functions.Hashing
    val h45 = shiftright(Hashing.hexHash(col("l_partkey").cast("string")), 15)
    val kmv = shim.column(graft.plans.KmvSketch(
      shim.expression(h45), 64).toAggregateExpression())
    val sketch = lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(kmv.as("s"))
      .withColumn("ndv_est", expr(
        "CASE WHEN size(s) < 64 THEN CAST(size(s) AS BIGINT) " +
          "ELSE 2216615441596416L div greatest(element_at(s, 64), 1L) END"))
      .drop("s")
    val exact = lineitem(spark, d)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("ndv_exact"))
    sketch.join(exact, Seq("l_returnflag")).orderBy("l_returnflag")
  }

  val kmvDistinctSql: String = {
    val hv = "(" + graft.functions.Hashing.hexHashSql(
      "CAST(l_partkey AS VARCHAR)") + " // 32768)"
    s"""WITH h AS (SELECT l_returnflag, $hv AS hv, l_partkey FROM lineitem),
      |dh AS (SELECT DISTINCT l_returnflag, hv FROM h),
      |r AS (SELECT l_returnflag, hv,
      |        row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
      |      FROM dh),
      |s AS (SELECT l_returnflag, count(*) AS n, max(hv) AS hk
      |      FROM r WHERE rn <= 64 GROUP BY l_returnflag),
      |e AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS ndv_exact
      |      FROM h GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |       CAST(CASE WHEN s.n < 64 THEN s.n
      |            ELSE 2216615441596416 // greatest(s.hk, 1) END AS BIGINT)
      |         AS ndv_est,
      |       CAST(e.ndv_exact AS BIGINT) AS ndv_exact
      |FROM s JOIN e USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin
  }

  /** KMV sketch SET ALGEBRA: union and intersection distinct-count
    * estimates for two corpora (returnflag A vs R part sets) composed
    * from their per-corpus sketches — neither corpus is re-read. Merging
    * the two k-min arrays and re-taking the k smallest IS the sketch of
    * the union (KMV's closure property); the fraction of those merged
    * k-mins present in BOTH input sketches estimates Jaccard, and
    * intersection = Jaccard × union. Exact answers computed beside for
    * the error exhibit. All arithmetic exact-integer; the array algebra
    * runs once over two 64-element arrays (interpreted HOFs are fine at
    * that cardinality — invariant: never per-row hot paths). */
  def kmvSetOps(spark: SparkSession, d: String): DataFrame = {
    val shim = org.apache.spark.sql.GraftSqlShim
    import graft.functions.Hashing
    val h45 = shiftright(Hashing.hexHash(col("l_partkey").cast("string")), 15)
    val base = lineitem(spark, d).where(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("flag"), col("l_partkey"), h45.as("hv"))
    val sketches = base.groupBy(col("flag"))
      .agg(shim.column(graft.plans.KmvSketch(
        shim.expression(col("hv")), 64).toAggregateExpression()).as("s"))
      .agg(
        first(when(col("flag") === "A", col("s")), ignoreNulls = true).as("sa"),
        first(when(col("flag") === "R", col("s")), ignoreNulls = true).as("sb"))
      .withColumn("m", expr("slice(array_sort(array_distinct(concat(sa, sb))), 1, 64)"))
      .withColumn("union_est", expr(
        "CASE WHEN size(m) < 64 THEN CAST(size(m) AS BIGINT) " +
          "ELSE 2216615441596416L div greatest(element_at(m, 64), 1L) END"))
      .withColumn("inter_est", expr(
        "(CAST(size(filter(m, v -> array_contains(sa, v) AND array_contains(sb, v))) AS BIGINT)" +
          " * union_est) div 64"))
      .select(col("union_est"), col("inter_est"))
    val exactUnion = base.select(col("l_partkey")).distinct()
      .agg(count(lit(1)).as("union_exact"))
    val exactInter = base.where(col("flag") === "A").select(col("l_partkey")).distinct()
      .join(base.where(col("flag") === "R").select(col("l_partkey")).distinct(),
        Seq("l_partkey"), "left_semi")
      .agg(count(lit(1)).as("inter_exact"))
    sketches.crossJoin(exactUnion).crossJoin(exactInter)
  }

  val kmvSetOpsSql: String = {
    val hv = "(" + graft.functions.Hashing.hexHashSql(
      "CAST(l_partkey AS VARCHAR)") + " // 32768)"
    s"""WITH h AS (SELECT l_returnflag AS flag, $hv AS hv, l_partkey
      |           FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      |sa AS (SELECT hv FROM (SELECT DISTINCT hv FROM h WHERE flag = 'A')
      |       ORDER BY hv LIMIT 64),
      |sb AS (SELECT hv FROM (SELECT DISTINCT hv FROM h WHERE flag = 'R')
      |       ORDER BY hv LIMIT 64),
      |sm AS (SELECT hv FROM (SELECT DISTINCT hv FROM
      |         (SELECT hv FROM sa UNION ALL SELECT hv FROM sb))
      |       ORDER BY hv LIMIT 64),
      |st AS (SELECT count(*) AS n, max(hv) AS hk FROM sm),
      |mt AS (SELECT count(*) AS c FROM sm
      |       WHERE hv IN (SELECT hv FROM sa) AND hv IN (SELECT hv FROM sb)),
      |ue AS (SELECT CASE WHEN n < 64 THEN n
      |              ELSE 2216615441596416 // greatest(hk, 1) END AS u FROM st),
      |ex AS (SELECT count(DISTINCT l_partkey) AS union_exact FROM h),
      |ei AS (SELECT count(*) AS inter_exact FROM
      |         (SELECT DISTINCT l_partkey FROM h WHERE flag = 'A') x
      |       WHERE l_partkey IN (SELECT l_partkey FROM h WHERE flag = 'R'))
      |SELECT CAST(ue.u AS BIGINT) AS union_est,
      |       CAST((mt.c * ue.u) // 64 AS BIGINT) AS inter_est,
      |       CAST(ex.union_exact AS BIGINT) AS union_exact,
      |       CAST(ei.inter_exact AS BIGINT) AS inter_exact
      |FROM ue, mt, ex, ei""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmv_distinct" -> (kmvDistinct _),
    "q_kmv_setops" -> (kmvSetOps _),
    "q_dedup_rewrite" -> (dedupRewrite _),
    "q_rollup"     -> (rollupAgg _),
    "q_cube"       -> (cubeAgg _),
    "q_grouping_sets" -> (groupingSetsAgg _),
    "q_date_spine" -> (dateSpine _),
    "q_sessionize_batch" -> (sessionizeBatch _),
    "q_copurchase" -> (coOccurrence _),
    "q_session_window" -> (sessionWindowAgg _),
    "q_sliding_window" -> (slidingWindowAgg _),
    "q_wau" -> (rollingActiveUsers _),
    "q_window_argmax" -> (windowArgmax _),
    "q_skyline" -> (skyline _),
    "q_range_frame" -> (rangeFrame _),
    "q_daily_share" -> (dailyShare _),
    "q_forward_fill" -> (forwardFill _),
    "q_stats_agg"  -> (statsAgg _),
    "q_welch"      -> (welchT _),
    "q_quantile_bins" -> (quantileBins _),
    "q_unpivot"    -> (unpivotDaily _),
    "q_pivot"      -> (pivotDaily _),
    "q_quantiles"  -> (quantiles _),
    "q_quantiles_disc" -> (quantilesDisc _),
    "q_mode"       -> (modeAgg _),
    "q_join_full"  -> (fullJoin _),
    "q_window_lag" -> (windowLag _),
    "q_window_rank" -> (windowRank _),
    "q_histogram"  -> (histogram _),
    "q_topk_agg"   -> (topkAgg _))

  def oracles: Map[String, String] = Map(
    "q_kmv_distinct" -> kmvDistinctSql,
    "q_kmv_setops" -> kmvSetOpsSql,
    "q_dedup_rewrite" -> dedupRewriteSql,
    "q_rollup"     -> rollupAggSql,
    "q_cube"       -> cubeAggSql,
    "q_grouping_sets" -> groupingSetsAggSql,
    "q_date_spine" -> dateSpineSql,
    "q_sessionize_batch" -> sessionizeBatchSql,
    "q_copurchase" -> coOccurrenceSql,
    "q_session_window" -> sessionWindowAggSql,
    "q_sliding_window" -> slidingWindowAggSql,
    "q_wau" -> rollingActiveUsersSql,
    "q_window_argmax" -> windowArgmaxSql,
    "q_skyline" -> skylineSql,
    "q_range_frame" -> rangeFrameSql,
    "q_daily_share" -> dailyShareSql,
    "q_forward_fill" -> forwardFillSql,
    "q_stats_agg"  -> statsAggSql,
    "q_welch"      -> welchTSql,
    "q_quantile_bins" -> quantileBinsSql,
    "q_unpivot"    -> unpivotDailySql,
    "q_pivot"      -> pivotDailySql,
    "q_quantiles"  -> quantilesSql,
    "q_quantiles_disc" -> quantilesDiscSql,
    "q_mode"       -> modeAggSql,
    "q_join_full"  -> fullJoinSql,
    "q_window_lag" -> windowLagSql,
    "q_window_rank" -> windowRankSql,
    "q_histogram"  -> histogramSql,
    "q_topk_agg"   -> topkAggSql)
}
