package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Behavioral / time-series analytics over the event log: funnel
  * conversion, EWMA smoothing, and z-score outlier flagging — the product
  * analytics a playback-history warehouse (the reference's domain) feeds.
  *
  * Scale notes: the funnel is a chain of per-user hash aggregations whose
  * tiny per-stage results broadcast back onto the fact scan — the event
  * table shuffles once per stage on user_id and nothing else moves. EWMA
  * is one window pass (one Exchange on user_id; the 8 lags share the sort).
  * Outlier stats are a 5-row aggregate broadcast onto a second scan — the
  * classic two-pass z-score, no fact shuffle at all.
  *
  * Cross-engine determinism: all values enter as exact integer cents; EWMA
  * weights are dyadic rationals (2^-k, exact in binary fp) so numerator /
  * denominator sums are EXACT doubles and the single division is
  * correctly-rounded-identical on both engines. The z-score pipeline
  * (sum, sumsq as exact longs → one identical double expression tree) is
  * bit-reproducible the same way; outputs quantize to a 0.01 grid.
  */
object TimeSeriesOps {

  // --- funnel conversion (view → click → purchase) --------------------------
  // Stage n's entry time is the user's first qualifying event STRICTLY
  // after their stage n-1 entry — the order-sensitive funnel, not the
  // order-blind "did all three ever happen". Each stage is a groupBy(user)
  // min + a broadcast join of the previous stage's (user, ts) result onto
  // the next filtered scan; conversion counts are one tiny agg per stage.
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  def funnel(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d).select(col("user_id"), col("event_type"), col("ts"))
    // stage 1: first 'view' per user
    val first = e.where(col("event_type") === FunnelStages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("entered"))
    val stages = FunnelStages.tail.scanLeft(first) { (prev, stage) =>
      e.where(col("event_type") === stage)
        .join(broadcast(prev.select(col("user_id"), col("entered").as("prev_ts"))),
          Seq("user_id"))
        .where(col("ts") > col("prev_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("entered"))
    }
    stages.zip(FunnelStages).zipWithIndex
      .map { case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("stage_idx"), lit(stage).as("stage"), col("n_users"))
      }
      .reduce(_.unionByName(_))
      .orderBy("stage_idx")
  }

  val funnelSql: String = {
    val ctes = FunnelStages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        s"""s1 AS (
           |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS entered
           |  FROM events WHERE event_type = '$stage' GROUP BY 1
           |)"""
      else
        s"""s${i + 1} AS (
           |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS entered
           |  FROM events e JOIN s$i p ON e.user_id = p.user_id
           |  WHERE e.event_type = '$stage' AND CAST(e.ts AS TIMESTAMP) > p.entered
           |  GROUP BY 1
           |)"""
    }.mkString(",\n")
    val arms = FunnelStages.zipWithIndex.map { case (stage, i) =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS stage_idx, '$stage' AS stage, " +
        s"count(*) AS n_users FROM s${i + 1}"
    }.mkString("\nUNION ALL\n")
    s"WITH $ctes\n$arms\nORDER BY stage_idx".stripMargin
  }

  // --- EWMA smoothing (dyadic weights, window-exact) ------------------------
  // Per-user exponentially-weighted moving average over the last 8
  // observations, alpha = 1/2: weight 2^-k on the k-th most recent value,
  // normalized over the weights actually present (so early rows average
  // over fewer terms instead of decaying toward 0). The 8 lag() calls share
  // one window sort — one Exchange on user_id total.
  val EwmaDepth = 8

  private def dyadic(k: Int): BigDecimal = BigDecimal(1) / BigDecimal(2).pow(k)

  def ewma(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val base = events(spark, d).select(col("user_id"), col("event_id"), col("ts"),
      round(col("value") * 100).cast("long").as("v_cents"))
    val num = (1 until EwmaDepth).foldLeft(col("v_cents").cast("double")) { (acc, k) =>
      acc + coalesce(lag(col("v_cents"), k).over(w).cast("double") *
        lit(dyadic(k).toDouble), lit(0.0))
    }
    val den = (1 until EwmaDepth).foldLeft(lit(1.0)) { (acc, k) =>
      acc + when(lag(col("v_cents"), k).over(w).isNotNull,
        lit(dyadic(k).toDouble)).otherwise(lit(0.0))
    }
    base
      .withColumn("ewma_cents", num / den)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp_ntz").as("ts"), col("v_cents"), col("ewma_cents"))
      .orderBy("user_id", "ts", "event_id")
  }

  val ewmaSql: String = {
    val num = (1 until EwmaDepth).map(k =>
      s"coalesce(CAST(lag(v_cents, $k) OVER w AS DOUBLE) * ${dyadic(k)}, 0.0)")
      .mkString("CAST(v_cents AS DOUBLE) + ", " + ", "")
    val den = (1 until EwmaDepth).map(k =>
      s"CASE WHEN lag(v_cents, $k) OVER w IS NOT NULL THEN ${dyadic(k)} ELSE 0.0 END")
      .mkString("1.0 + ", " + ", "")
    s"""WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(round(value * 100) AS BIGINT) AS v_cents
      |  FROM events
      |)
      |SELECT user_id, event_id, ts, v_cents,
      |       ($num) / ($den) AS ewma_cents
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, ts, event_id""".stripMargin
  }

  // --- z-score outlier flagging ---------------------------------------------
  // Two-pass anomaly detection: per-event-type mean/stddev from ONE tiny
  // aggregate (exact long sum/sumsq over cents), broadcast back onto a
  // second scan; flag |z| ≥ 2.5. The identical double expression tree on
  // both engines makes z bit-reproducible; output is 0.01-quantized.
  // At 100 TB the long sumsq would overflow (~2^63 at ~4e9 rows of 1e5
  // cents) — the drop-in is double sums (Spark's own Welford-style central
  // moments, see q_stats_agg); exact longs here keep the oracle airtight.
  val OutlierZx100 = 250L

  def outliers(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d).select(col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("v_cents"))
    val stats = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("v_cents")).as("sum_c"),
      sum(col("v_cents") * col("v_cents")).as("sumsq_c"))
    val nD = col("n").cast("double")
    val sumD = col("sum_c").cast("double")
    val mean = sumD / nD
    val variance = (col("sumsq_c").cast("double") - sumD * sumD / nD) / (nD - lit(1.0))
    e.join(broadcast(stats), Seq("event_type"))
      .withColumn("z_q",
        floor((col("v_cents").cast("double") - mean) / sqrt(variance) * 100).cast("long"))
      .where(abs(col("z_q")) >= OutlierZx100)
      .select(col("event_id"), col("event_type"), col("v_cents"), col("z_q"))
      .orderBy("event_id")
  }

  val outliersSql: String =
    s"""WITH e AS (
      |  SELECT event_id, event_type,
      |         CAST(round(value * 100) AS BIGINT) AS v_cents
      |  FROM events
      |), stats AS (
      |  SELECT event_type, count(*) AS n,
      |         CAST(sum(v_cents) AS BIGINT) AS sum_c,
      |         CAST(sum(v_cents * v_cents) AS BIGINT) AS sumsq_c
      |  FROM e GROUP BY 1
      |)
      |SELECT e.event_id, e.event_type, e.v_cents,
      |       CAST(floor((CAST(e.v_cents AS DOUBLE)
      |              - CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))
      |            / sqrt((CAST(sumsq_c AS DOUBLE)
      |                - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE)
      |                  / CAST(n AS DOUBLE))
      |              / (CAST(n AS DOUBLE) - 1.0))
      |            * 100) AS BIGINT) AS z_q
      |FROM e JOIN stats USING (event_type)
      |WHERE abs(CAST(floor((CAST(e.v_cents AS DOUBLE)
      |              - CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))
      |            / sqrt((CAST(sumsq_c AS DOUBLE)
      |                - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE)
      |                  / CAST(n AS DOUBLE))
      |              / (CAST(n AS DOUBLE) - 1.0))
      |            * 100) AS BIGINT)) >= $OutlierZx100
      |ORDER BY event_id""".stripMargin

  // --- winsorization (percentile clipping) ----------------------------------
  // Robust-statistics preprocessing: clip each value into its event-type's
  // [p05, p95] band. Two passes: exact percentiles per type (5 rows,
  // broadcast back), then a map-only clamp + exact aggregation. The
  // interpolated bounds are doubles but DETERMINISTIC ones (same sorted
  // neighbors, same lerp both engines — the q_quantiles parity); clipped
  // values floor to longs before the order-free sum so no fp sum ever
  // crosses the engine boundary. At 100 TB the exact percentile swaps for
  // approx_percentile (mergeable t-digest) and everything else is shape-
  // identical.
  def winsorize(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d).select(col("event_type"),
      round(col("value") * 100).cast("long").as("v"))
    val bounds = e.groupBy(col("event_type")).agg(
      percentile(col("v"), lit(0.05)).as("lo"),
      percentile(col("v"), lit(0.95)).as("hi"))
    e.join(broadcast(bounds), Seq("event_type"))
      .withColumn("clipped",
        least(greatest(col("v").cast("double"), col("lo")), col("hi")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        floor(min(col("lo"))).cast("long").as("lo_q"),
        floor(min(col("hi"))).cast("long").as("hi_q"),
        sum(col("v")).as("sum_raw"),
        sum(floor(col("clipped")).cast("long")).as("sum_clip_q"))
      .orderBy("event_type")
  }

  val winsorizeSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
      |), b AS (
      |  SELECT event_type, quantile_cont(v, 0.05) AS lo, quantile_cont(v, 0.95) AS hi
      |  FROM e GROUP BY 1
      |)
      |SELECT e.event_type, count(*) AS n,
      |       CAST(floor(min(b.lo)) AS BIGINT) AS lo_q,
      |       CAST(floor(min(b.hi)) AS BIGINT) AS hi_q,
      |       CAST(sum(e.v) AS BIGINT) AS sum_raw,
      |       CAST(sum(CAST(floor(least(greatest(CAST(e.v AS DOUBLE), b.lo), b.hi))
      |                     AS BIGINT)) AS BIGINT) AS sum_clip_q
      |FROM e JOIN b USING (event_type)
      |GROUP BY e.event_type
      |ORDER BY event_type""".stripMargin

  // --- cohort retention matrix ----------------------------------------------
  // The (signup-week × weeks-since) active-user grid: each user's cohort is
  // the Monday week of their FIRST event; activity in week w counts them in
  // cell (cohort, (w − cohort)/7). One agg for the tiny cohort frame
  // (broadcast back), one distinct + count for the matrix — the fact table
  // shuffles only on its own aggregation keys. Monday-start date_trunc
  // agrees between engines (q_datetime_funcs proved the convention).
  def cohortRetention(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d).select(col("user_id"), col("ts"))
    val cohorts = e.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_ts"))
    e.join(broadcast(cohorts), Seq("user_id"))
      .select(col("user_id"),
        to_date(col("cohort_ts")).as("cohort_week"),
        // both dates are Mondays ⇒ the difference is an exact multiple of 7
        // (so the double division is exact and the long cast loses nothing)
        (datediff(to_date(date_trunc("week", col("ts"))), to_date(col("cohort_ts")))
          / 7).cast("long").as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  val cohortRetentionSql: String =
    """WITH cohorts AS (
      |  SELECT user_id,
      |         CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE) AS cohort_week
      |  FROM events GROUP BY 1
      |), cells AS (
      |  SELECT DISTINCT e.user_id, c.cohort_week,
      |         CAST((CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)
      |               - c.cohort_week) AS BIGINT) // 7 AS week_offset
      |  FROM events e JOIN cohorts c ON e.user_id = c.user_id
      |)
      |SELECT cohort_week, week_offset, count(*) AS n_active
      |FROM cells
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin

  // --- Markov transition matrix ---------------------------------------------
  // Per-user consecutive event-type pairs (lead over one user_id window
  // sort) → global (from, to) counts + a 1e-6-quantized row-normalized
  // probability (exact integer inputs, one correctly-rounded division).
  // The sequence-mining primitive: 25 output rows regardless of scale.
  def transitionMatrix(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("p_q",
        floor(col("n").cast("double") / sum(col("n")).over(wFrom).cast("double")
          * 1000000).cast("long"))
      .orderBy("from_type", "to_type")
  }

  val transitionMatrixSql: String =
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
      |  FROM events
      |), counts AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, n,
      |       CAST(floor(CAST(n AS DOUBLE)
      |         / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
      |         * 1000000) AS BIGINT) AS p_q
      |FROM counts
      |ORDER BY from_type, to_type""".stripMargin

  // --- RFM customer segmentation --------------------------------------------

  /** Recency / frequency / monetary quintile segmentation — the classic
    * CRM scoring grid, one row per ordering customer. Recency is days
    * from the customer's last order to the corpus max date (a one-row
    * scalar aggregate broadcast-cross-joined onto the per-customer
    * rollup — no window-over-everything for the global max). Each score
    * is an ntile(5) with a full deterministic ordering (metric, then
    * custkey), so tile assignment is position-based-identical in both
    * engines.
    *
    * Scale: the fact table shuffles ONCE (groupBy custkey); everything
    * after is customer-cardinality. The three global ntiles are the
    * two-pass exact form ([[graft.operators.ScaleTools.globalNtile]]:
    * range partition per ordering, broadcast per-partition counts,
    * integer-reconstruct the tile) — ntile is the same exact computation
    * under range partitioning, so the exact-equal-bucket property holds
    * with no single-partition window at any customer count. Monetary is
    * the exact integer-cents sum recombined only at the boundary
    * ([[graft.functions.Money]]).
    */
  def rfm(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Money
    val per = orders(spark, d).groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("frequency"),
        Money.moneySum(col("o_totalprice")).as("monetary"))
    val ref = per.agg(max(col("last_day")).as("ref_day"))
    val scored = per.crossJoin(broadcast(ref))
      .select(col("o_custkey"),
        datediff(col("ref_day"), col("last_day")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
    // FUSED three-metric ntile (round 22, guide §2.4 — one exchange where
    // three ran): the R/F/M orderings differ, but each metric has EXACTLY
    // one row per customer, so exploding a metric dimension (mid 0/1/2,
    // sort key normalized to "ascending double") and range-partitioning
    // ONCE on (mid, skey, custkey) makes the three global sorts contiguous
    // rank blocks of one pass: per-metric rank = global rank − mid·n.
    // Descending metrics negate (order-isomorphic for finite doubles);
    // recency_days/frequency are small integers, exact in double. The
    // previous form ran globalNtile three times = three range exchanges +
    // three sampling/stats passes + three checkpoints over the same
    // customer-grain frame. Tile arithmetic below is globalNtile's own
    // (first n%5 buckets get ⌈n/5⌉), so assignments are bit-identical.
    val tagged = scored.select(col("o_custkey"), col("recency_days"),
        col("frequency"), col("monetary"),
        explode(array(
          struct(lit(0L).as("mid"), col("recency_days").cast("double").as("skey")),
          struct(lit(1L).as("mid"), (-col("frequency")).cast("double").as("skey")),
          struct(lit(2L).as("mid"), (-col("monetary")).as("skey")))).as("t"))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("t.mid").as("mid"), col("t.skey").as("skey"))
    import graft.operators.ScaleTools.globalRankAndCount
    val (ranked, n3) = globalRankAndCount(tagged,
      Seq(col("mid").asc, col("skey").asc, col("o_custkey").asc), "__graft_rank")
    val n = n3 / 3
    val small = n / 5
    val rem = n % 5
    val big = small + 1
    val cut = rem * big
    val r = col("__graft_rank") - col("mid") * lit(n)
    val bin =
      if (small == 0) r // n <= 5: each row its own bucket
      else when(r <= cut, floor((r - 1) / lit(big)) + 1)
        .otherwise(lit(rem) + floor((r - lit(cut) - 1) / lit(small)) + 1)
    ranked.withColumn("__bin", bin.cast("long"))
      .groupBy(col("o_custkey"))
      .agg(max(col("recency_days")).as("recency_days"), // 3 equal copies/cust
        max(col("frequency")).as("frequency"),
        max(col("monetary")).as("monetary"),
        max(when(col("mid") === 0, col("__bin"))).as("r_score"),
        max(when(col("mid") === 1, col("__bin"))).as("f_score"),
        max(when(col("mid") === 2, col("__bin"))).as("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy("o_custkey")
  }

  val rfmSql: String = {
    import graft.functions.Money
    s"""WITH per AS (
      |  SELECT o_custkey,
      |         CAST(max(o_orderdate) AS DATE) AS last_day,
      |         count(*) AS frequency,
      |         ${Money.moneySumSql("o_totalprice")} AS monetary
      |  FROM orders GROUP BY o_custkey
      |), scored AS (
      |  SELECT o_custkey,
      |         CAST(datediff('day', last_day, (SELECT max(last_day) FROM per)) AS BIGINT)
      |           AS recency_days,
      |         frequency, monetary
      |  FROM per
      |)
      |SELECT o_custkey, recency_days, frequency, monetary,
      |       CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r_score,
      |       CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_score,
      |       CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_score,
      |       CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS VARCHAR)
      |         || CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS VARCHAR)
      |         || CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS VARCHAR)
      |         AS segment
      |FROM scored
      |ORDER BY o_custkey""".stripMargin
  }

  // --- robust center/spread: median + MAD -----------------------------------

  /** Median and median-absolute-deviation per group — the robust
    * complement to [[outliers]]' mean/stddev z-scores (one wild value
    * moves a mean arbitrarily; it moves a median by at most one rank).
    * Classic two-pass shape: per-group exact medians (group-cardinality
    * result) broadcast back onto a second scan, then a second percentile
    * over the absolute deviations. Exactness: l_quantity is integral and
    * interpolation falls on dyadic midpoints, so both engines' exact
    * percentile (Spark `percentile` ≡ DuckDB quantile_cont) and the
    * |x − med| doubles are bit-identical — no quantization needed. At
    * 100 TB swap both passes to approx_percentile (mergeable sketch,
    * partial+final) and drop the exact-match property. */
  def madStats(spark: SparkSession, d: String): DataFrame = {
    val li = lineitem(spark, d).select(col("l_returnflag"), col("l_quantity"))
    val med = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("med"),
        count(lit(1)).as("n"))
    li.join(broadcast(med), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("n"), col("med"))
      .agg(percentile(abs(col("l_quantity") - col("med")), lit(0.5)).as("mad"))
      .select(col("l_returnflag"), col("n"), col("med"), col("mad"))
      .orderBy("l_returnflag")
  }

  val madStatsSql: String =
    """WITH med AS (
      |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med,
      |         count(*) AS n
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l.l_returnflag, m.n, m.med,
      |       quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad
      |FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
      |GROUP BY l.l_returnflag, m.n, m.med
      |ORDER BY l.l_returnflag""".stripMargin

  // --- supervised feature/label extraction ----------------------------------
  // The training-example builder for a next-event model: per event, the
  // LABEL is the user's next event type (lead), the FEATURES are exact
  // running counts of each prior event type — all five feature columns and
  // the label ride ONE window partitioning (user_id ordered by the full
  // tie-broken key), so the whole dataset costs a single Exchange at any
  // scale. Rows without a next event (each user's last) are the serving
  // frontier, excluded from the training set — and excluded from the
  // oracle by the same lead-IS-NOT-NULL rule. Integer counts only: no
  // float ever, bit-exact across engines.
  def featureLabel(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val hist = w.rowsBetween(Window.unboundedPreceding, -1)
    def cnt(t: String) =
      sum(when(col("event_type") === t, 1L).otherwise(0L)).over(hist)
        .as(s"n_$t")
    events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        cnt("view"), cnt("click"), cnt("purchase"), cnt("signup"),
        lead(col("event_type"), 1).over(w).as("label"))
      .where(col("label").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("n_view"), lit(0L)).as("n_view"),
        coalesce(col("n_click"), lit(0L)).as("n_click"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("n_signup"), lit(0L)).as("n_signup"),
        col("label"))
      .orderBy("event_id")
  }

  val featureLabelSql: String = {
    def cnt(t: String) =
      s"""COALESCE(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)
         |  OVER (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)""".stripMargin
    s"""SELECT event_id, user_id, event_type,
      |       CAST(${cnt("view")} AS BIGINT) AS n_view,
      |       CAST(${cnt("click")} AS BIGINT) AS n_click,
      |       CAST(${cnt("purchase")} AS BIGINT) AS n_purchase,
      |       CAST(${cnt("signup")} AS BIGINT) AS n_signup,
      |       label
      |FROM (SELECT *, lead(event_type) OVER (PARTITION BY user_id
      |                 ORDER BY ts, event_id) AS label
      |      FROM events) t
      |WHERE label IS NOT NULL
      |ORDER BY event_id""".stripMargin
  }

  // --- rolling z-score anomaly flags -----------------------------------------
  // The STREAMING-shaped twin of q_outliers: each daily total scored
  // against its OWN trailing 7-observation window (mean/std from exact
  // long sums inside the ROWS frame — one window pass, one Exchange by
  // event_type), not a global broadcast. z is null until the window holds
  // ≥ 2 points or while variance is 0 (both engines agree via the same
  // CASE guard); output on the 0.01 grid like every z in this repo. The
  // frame is over OBSERVED days (no dense spine): at 100 TB you score the
  // series you have, and a gap-filled variant is q_forward_fill composed
  // upstream.
  def rollingZ(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v_cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("dt"))
      .rowsBetween(-6, Window.currentRow)
    val n = count(lit(1)).over(w).cast("double")
    val s = sum(col("v_cents")).over(w).cast("double")
    val sq = sum(col("v_cents") * col("v_cents")).over(w).cast("double")
    val variance = (sq - s * s / n) / (n - lit(1.0))
    daily
      .withColumn("win_n", count(lit(1)).over(w).cast("long"))
      .withColumn("z_q",
        when(col("win_n") >= 2 && variance > 0,
          floor((col("v_cents").cast("double") - s / n) / sqrt(variance) * 100)
            .cast("long")))
      .select(col("event_type"), col("dt"), col("v_cents"), col("win_n"), col("z_q"))
      .orderBy("event_type", "dt")
  }

  val rollingZSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS dt,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
      |  FROM events GROUP BY 1, 2
      |), win AS (
      |  SELECT event_type, dt, v_cents,
      |         count(*) OVER w AS win_n,
      |         CAST(sum(v_cents) OVER w AS DOUBLE) AS s,
      |         CAST(sum(v_cents * v_cents) OVER w AS DOUBLE) AS sq,
      |         CAST(count(*) OVER w AS DOUBLE) AS n
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY dt
      |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_type, dt, v_cents, CAST(win_n AS BIGINT) AS win_n,
      |       CASE WHEN win_n >= 2 AND (sq - s * s / n) / (n - 1.0) > 0
      |            THEN CAST(floor((CAST(v_cents AS DOUBLE) - s / n)
      |                   / sqrt((sq - s * s / n) / (n - 1.0)) * 100) AS BIGINT)
      |       END AS z_q
      |FROM win
      |ORDER BY event_type, dt""".stripMargin

  // --- top event-type paths (sequence 3-gram mining) ------------------------
  // The n-gram view of the journey data q_transitions models pairwise:
  // corpus-wide counts of consecutive (e1 → e2 → e3) event-type triples
  // per user timeline, top-20. One window pass (two leads share the
  // (user, ts) sort), one hash agg over a type³-bounded key space, and a
  // TakeOrderedAndProject top-k — nothing after the window exchange is
  // wider than |event types|³. Ordering is total: (ts, event_id) within
  // user, then (count desc, path) for the cut.
  val PathTopK = 20

  def eventPaths(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(PathTopK)
  }

  val eventPathsSql: String =
    s"""WITH seq AS (
      |  SELECT event_type AS e1,
      |         lead(event_type, 1) OVER w AS e2,
      |         lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT e1, e2, e3, count(*) AS n
      |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY e1, e2, e3
      |ORDER BY n DESC, e1, e2, e3
      |LIMIT $PathTopK""".stripMargin

  // --- rolling exact median (robust trailing smoother) ----------------------
  // The robust twin of q_rolling_z: each daily total's trailing-7 MEDIAN —
  // outlier-immune where the mean/std smoother is not. Spark has no
  // median-over-window; the composition is collect_list over the ROWS
  // frame + array_sort + middle pick, which is exactly right at this
  // shape: the frame is 7 elements, so the per-row sort is O(7 log 7) and
  // the whole thing stays in the ONE window Exchange the daily agg feeds.
  // Even-count frames interpolate (a+b)/2.0 — cents are < 2^52 so the
  // double is exact and matches DuckDB's interpolating median() bit for
  // bit. NOT the pattern for wide frames (collect_list materializes the
  // frame per row); for large-window medians use the two-pass
  // median-of-medians in q_mad.
  def rollingMedian(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v_cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("dt"))
      .rowsBetween(-6, Window.currentRow)
    val arr = col("arr")
    val n = size(arr)
    daily
      .withColumn("arr", array_sort(collect_list(col("v_cents")).over(w)))
      .select(col("event_type"), col("dt"), col("v_cents"),
        when(n % 2 === 1, element_at(arr, ((n + 1) / 2).cast("int")).cast("double"))
          .otherwise((element_at(arr, (n / 2).cast("int"))
            + element_at(arr, (n / 2).cast("int") + 1)) / 2.0)
          .as("med"))
      .orderBy("event_type", "dt")
  }

  val rollingMedianSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS dt,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, dt, v_cents,
      |       median(v_cents) OVER (PARTITION BY event_type ORDER BY dt
      |                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |         AS med
      |FROM daily ORDER BY event_type, dt""".stripMargin

  // --- Gini concentration (inequality of customer spend per nation) ---------
  // The classic sorted-rank formula G = (2·Σ i·x_i − (n+1)·Σ x_i)/(n·Σ x_i)
  // over per-customer lifetime spend, grouped by nation. Every input to the
  // final expression is an EXACT long (cents, ranks, rank-weighted sums —
  // all < 2^53 per nation at any plausible per-group cardinality), and the
  // ppm output is one identical double expression on both engines, so the
  // floor is bit-reproducible. Σ i·x_i is invariant under tie order (equal
  // x across a rank run contributes the same regardless of permutation),
  // but the rank window still totally orders on (x, custkey) so the
  // intermediate frame itself is deterministic.
  // Scale: one shuffle to agg orders by customer, one hash join to pick up
  // the nation, one window partitioned by nation (25 groups — at a larger
  // key space this stays the per-group sort it is), one final 25-row agg.
  def gini(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Money
    val spend = orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(sum(Money.cents(col("o_totalprice"))).as("x"))
      .join(customer(spark, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("x"), col("o_custkey"))
    val nD = col("n").cast("double")
    val s1D = col("s1").cast("double")
    val totD = col("total_cents").cast("double")
    spend
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total_cents"),
        sum(col("i") * col("x")).as("s1"))
      .select(col("nationkey"), col("n"), col("total_cents"),
        floor((lit(2.0) * s1D - (nD + lit(1.0)) * totD) * lit(1000000.0)
          / (nD * totD)).cast("long").as("gini_ppm"))
      .orderBy("nationkey")
  }

  val giniSql: String = {
    import graft.functions.Money
    s"""WITH spend AS (
      |  SELECT o_custkey, CAST(sum(${Money.centsSql("o_totalprice")}) AS BIGINT) AS x
      |  FROM orders GROUP BY 1
      |), ranked AS (
      |  SELECT c.c_nationkey, s.x,
      |         CAST(row_number() OVER (PARTITION BY c.c_nationkey
      |                                 ORDER BY s.x, s.o_custkey) AS BIGINT) AS i
      |  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
      |), agg AS (
      |  SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS total_cents,
      |         CAST(sum(i * x) AS BIGINT) AS s1
      |  FROM ranked GROUP BY 1
      |)
      |SELECT nationkey, n, total_cents,
      |       CAST(floor((2.0 * CAST(s1 AS DOUBLE)
      |                   - (CAST(n AS DOUBLE) + 1.0) * CAST(total_cents AS DOUBLE))
      |                  * 1000000.0
      |                  / (CAST(n AS DOUBLE) * CAST(total_cents AS DOUBLE)))
      |            AS BIGINT) AS gini_ppm
      |FROM agg ORDER BY nationkey""".stripMargin
  }

  // --- lag-k autocorrelation (ACF of the daily revenue series) --------------
  // Calendar-lag ACF: pairs (day t, day t−k) matched on the day INDEX, not
  // the row offset, so series gaps pair identically on both engines. The
  // Pearson r per lag is rebuilt from exact long sums (n, Σx, Σy, Σxy,
  // Σx², Σy² — all within 2^63 at any scale where a daily cents total fits
  // a long) through ONE identical double expression — built-in corr() is
  // deliberately avoided because its streaming co-moment update order is
  // engine-internal. Output on the 1e-6 grid.
  // Scale: the fact table shuffles once for the daily agg; the series is
  // bounded by CALENDAR DAYS × lags, so the self-join fan-out is broadcast
  // and O(days·maxLag) regardless of data volume. The daily frame is
  // localCheckpoint-pinned before fanning into both join sides (exchange
  // reuse does not fire across self-join branches).
  val AcfMaxLag = 7

  def acf(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .groupBy(to_date(col("ts")).as("dt"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .select(datediff(col("dt"), lit("1970-01-01").cast("date")).cast("long").as("idx"),
        col("v"))
      .localCheckpoint()
    val lags = spark.range(1, AcfMaxLag + 1).select(col("id").as("k"))
    val pairs = daily.crossJoin(broadcast(lags))
      .join(broadcast(daily.select(col("idx").as("idx2"), col("v").as("y"))),
        col("idx2") === col("idx") - col("k"))
      .select(col("k"), col("v").as("x"), col("y"))
    val nD = col("n_pairs").cast("double")
    def dbl(c: String) = col(c).cast("double")
    val denx = nD * dbl("sxx") - dbl("sx") * dbl("sx")
    val deny = nD * dbl("syy") - dbl("sy") * dbl("sy")
    pairs.groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      .select(col("k"), col("n_pairs"),
        when(denx > 0 && deny > 0,
          floor((nD * dbl("sxy") - dbl("sx") * dbl("sy"))
            / (sqrt(denx) * sqrt(deny)) * lit(1000000.0)).cast("long"))
          .as("acf_q"))
      .orderBy("k")
  }

  val acfSql: String =
    s"""WITH daily AS (
      |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS idx,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1
      |), ks AS (SELECT CAST(i AS BIGINT) AS k FROM range(1, ${AcfMaxLag + 1}) t(i)),
      |pairs AS (
      |  SELECT ks.k, a.v AS x, b.v AS y
      |  FROM daily a CROSS JOIN ks JOIN daily b ON b.idx = a.idx - ks.k
      |), s AS (
      |  SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |         CAST(sum(x * y) AS DOUBLE) AS sxy,
      |         CAST(sum(x * x) AS DOUBLE) AS sxx,
      |         CAST(sum(y * y) AS DOUBLE) AS syy
      |  FROM pairs GROUP BY k
      |)
      |SELECT k, n_pairs,
      |       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |            THEN CAST(floor((n * sxy - sx * sy)
      |                   / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
      |                   * 1000000.0) AS BIGINT)
      |       END AS acf_q
      |FROM s ORDER BY k""".stripMargin

  // ---- grouped OLS trend (closed-form simple regression) -------------------

  /** Per-event-type linear trend of daily value totals: closed-form simple
    * OLS — slope/intercept rebuilt from the five exact integer sums
    * (n, Σx, Σy, Σxy, Σx²) with x the CALENDAR epoch-day index (gap-stable,
    * same convention as [[acf]]) and y exact daily cents. Two hash aggs
    * (events→days, days→type) and nothing wider than type-cardinality ever
    * shuffles; the doubles appear only in the final closed-form expression,
    * evaluated in one identical order both engines, floor-quantized.
    * Degenerate groups (a single day: zero variance in x) yield NULL.
    */
  def olsTrend(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("dt"), lit("1970-01-01").cast("date")).cast("long").as("x"),
        col("y"))
    def dbl(c: String) = col(c).cast("double")
    val nD = col("n_days").cast("double")
    val den = nD * dbl("sxx") - dbl("sx") * dbl("sx")
    val slope = (nD * dbl("sxy") - dbl("sx") * dbl("sy")) / den
    val icept = (dbl("sy") - slope * dbl("sx")) / nD
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"),
        when(den > 0, floor(slope * lit(1000000.0)).cast("long")).as("slope_q"),
        when(den > 0, floor(icept * lit(100.0)).cast("long")).as("icept_q"))
      .orderBy("event_type")
  }

  val olsTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, CAST(ts AS DATE)
      |), s AS (
      |  SELECT event_type, count(*) AS n_days,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |         CAST(sum(x * y) AS DOUBLE) AS sxy,
      |         CAST(sum(x * x) AS DOUBLE) AS sxx
      |  FROM daily GROUP BY event_type
      |)
      |SELECT event_type, n_days,
      |       CASE WHEN n * sxx - sx * sx > 0
      |            THEN CAST(floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
      |                   * 1000000.0) AS BIGINT) END AS slope_q,
      |       CASE WHEN n * sxx - sx * sx > 0
      |            THEN CAST(floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
      |                   * sx) / n * 100.0) AS BIGINT) END AS icept_q
      |FROM s ORDER BY event_type""".stripMargin

  // ---- CUSUM drift detection -----------------------------------------------

  /** Two-sided CUSUM change detection on daily event counts per type.
    * The textbook recursion S⁺_t = max(0, S⁺_{t-1} + (x_t − μ)) is not
    * window-expressible directly, but its closed form is: with cum_t the
    * prefix sum of deviations, S⁺_t = cum_t − min(0, min_{j≤t} cum_j) and
    * S⁻_t = max(0, max_{j≤t} cum_j) − cum_t — two running extrema over ONE
    * sorted pass. Deviations are kept exact by scaling through the day
    * count: y_t = D·x_t − total (so μ = total/D never becomes a float);
    * the drift flag compares 2·S > D·total… reduced to S > total/2 in
    * cross-multiplied integers. One hash agg to days, one window exchange
    * on event_type — nothing wider than (type, day) ever shuffles, and the
    * three window functions share a single sort. */
  def cusum(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("d"))
    val y = daily.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"), col("total"),
        (col("d") * col("n") - col("total")).as("yv"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val c = y.select(col("event_type"), col("day"), col("n"), col("total"),
      sum(col("yv")).over(w).as("cum"))
    val s = c.select(col("event_type"), col("day"), col("n"), col("total"),
      min(col("cum")).over(w).as("runmin"),
      max(col("cum")).over(w).as("runmax"), col("cum"))
    s.select(col("event_type"), col("day"),
        col("n").cast("long").as("n"),
        (col("cum") - least(lit(0L), col("runmin"))).as("s_pos"),
        (greatest(lit(0L), col("runmax")) - col("cum")).as("s_neg"),
        when((col("cum") - least(lit(0L), col("runmin"))) * 2 > col("total") ||
          (greatest(lit(0L), col("runmax")) - col("cum")) * 2 > col("total"),
          1L).otherwise(0L).as("drift"))
      .orderBy("event_type", "day")
  }

  val cusumSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |), tot AS (
      |  SELECT event_type, sum(n) AS total, count(*) AS d FROM daily GROUP BY 1
      |), y AS (
      |  SELECT daily.event_type, day, n, total, d * n - total AS yv
      |  FROM daily JOIN tot ON daily.event_type = tot.event_type
      |), c AS (
      |  SELECT event_type, day, n, total,
      |         sum(yv) OVER (PARTITION BY event_type ORDER BY day
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS cum
      |  FROM y
      |), s AS (
      |  SELECT event_type, day, n, total, cum,
      |         min(cum) OVER (PARTITION BY event_type ORDER BY day
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS runmin,
      |         max(cum) OVER (PARTITION BY event_type ORDER BY day
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS runmax
      |  FROM c
      |)
      |SELECT event_type, day, CAST(n AS BIGINT) AS n,
      |       CAST(cum - least(0, runmin) AS BIGINT) AS s_pos,
      |       CAST(greatest(0, runmax) - cum AS BIGINT) AS s_neg,
      |       CAST(CASE WHEN (cum - least(0, runmin)) * 2 > total
      |                   OR (greatest(0, runmax) - cum) * 2 > total
      |                 THEN 1 ELSE 0 END AS BIGINT) AS drift
      |FROM s ORDER BY event_type, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cusum" -> (cusum _),
    "q_ols" -> (olsTrend _),
    "q_event_paths" -> (eventPaths _),
    "q_rolling_median" -> (rollingMedian _),
    "q_gini" -> (gini _),
    "q_acf" -> (acf _),
    "q_rolling_z" -> (rollingZ _),
    "q_feature_label" -> (featureLabel _),
    "q_mad" -> (madStats _),
    "q_rfm" -> (rfm _),
    "q_funnel" -> (funnel _),
    "q_ewma" -> (ewma _),
    "q_outliers" -> (outliers _),
    "q_cohort" -> (cohortRetention _),
    "q_transitions" -> (transitionMatrix _),
    "q_winsorize" -> (winsorize _))

  val oracles: Map[String, String] = Map(
    "q_cusum" -> cusumSql,
    "q_ols" -> olsTrendSql,
    "q_event_paths" -> eventPathsSql,
    "q_rolling_median" -> rollingMedianSql,
    "q_gini" -> giniSql,
    "q_acf" -> acfSql,
    "q_rolling_z" -> rollingZSql,
    "q_feature_label" -> featureLabelSql,
    "q_mad" -> madStatsSql,
    "q_rfm" -> rfmSql,
    "q_funnel" -> funnelSql,
    "q_ewma" -> ewmaSql,
    "q_outliers" -> outliersSql,
    "q_cohort" -> cohortRetentionSql,
    "q_transitions" -> transitionMatrixSql,
    "q_winsorize" -> winsorizeSql)
}
