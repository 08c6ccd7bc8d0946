package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the behavioral/time-series operators at
  * sf0.001 (exact values are DuckDB-oracle-checked at sf0.01). */
class TimeSeriesOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("funnel stage counts are monotone non-increasing and stage 1 is exact") {
    val rows = TimeSeriesOps.funnel(spark, d).collect()
      .sortBy(_.getAs[Long]("stage_idx"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      TimeSeriesOps.FunnelStages)
    val counts = rows.map(_.getAs[Long]("n_users"))
    counts.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "later stages cannot gain users")
      case _ =>
    }
    val viewers = graft.Tables.events(spark, d)
      .where(col("event_type") === TimeSeriesOps.FunnelStages.head)
      .select("user_id").distinct().count()
    assert(counts.head === viewers)
  }

  test("ewma equals the value on a user's first event and stays within the value range") {
    val rows = TimeSeriesOps.ewma(spark, d).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[java.time.LocalDateTime]("ts").toString, r.getAs[Long]("event_id")))
      assert(sorted.head.getAs[Double]("ewma_cents") ===
        sorted.head.getAs[Long]("v_cents").toDouble)
      // a convex combination of the trailing values can't leave their range
      sorted.zipWithIndex.foreach { case (r, i) =>
        val window = sorted.slice(math.max(0, i - 7), i + 1)
          .map(_.getAs[Long]("v_cents").toDouble)
        val e = r.getAs[Double]("ewma_cents")
        assert(e >= window.min - 1e-9 && e <= window.max + 1e-9)
      }
    }
  }

  test("cohort week 0 holds the full cohort; later offsets never exceed it") {
    val rows = TimeSeriesOps.cohortRetention(spark, d).collect()
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_week"))
    byCohort.foreach { case (_, rs) =>
      val base = rs.find(_.getAs[Long]("week_offset") == 0L)
      assert(base.isDefined, "every user is active in their own first week")
      rs.foreach { r =>
        assert(r.getAs[Long]("week_offset") >= 0L)
        assert(r.getAs[Long]("n_active") <= base.get.getAs[Long]("n_active"))
      }
    }
    // cohort sizes partition the user base
    val users = graft.Tables.events(spark, d).select("user_id").distinct().count()
    assert(byCohort.values.map(
      _.find(_.getAs[Long]("week_offset") == 0L).get.getAs[Long]("n_active")).sum === users)
  }

  test("transition rows per source sum to that source's outgoing pairs; p_q sums to ~1e6") {
    val rows = TimeSeriesOps.transitionMatrix(spark, d).collect()
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val pSum = rs.map(_.getAs[Long]("p_q")).sum
      // each floor loses < 1e0 of the 1e6 grid per destination
      assert(pSum > 1000000L - rs.length && pSum <= 1000000L)
    }
  }

  test("every flagged outlier is at least 2.5 sample stddevs from its type mean") {
    val events = graft.Tables.events(spark, d)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("v_cents")).collect()
    val stats = events.groupBy(_.getAs[String]("event_type")).map { case (t, rs) =>
      val vs = rs.map(_.getAs[Long]("v_cents").toDouble)
      val n = vs.length.toDouble
      val mean = vs.sum / n
      val variance = (vs.map(v => v * v).sum - vs.sum * vs.sum / n) / (n - 1)
      t -> ((mean, math.sqrt(variance)))
    }
    val flagged = TimeSeriesOps.outliers(spark, d).collect()
    assert(flagged.nonEmpty)
    assert(flagged.length < events.length / 10, "outliers must be rare")
    flagged.foreach { r =>
      val (mean, std) = stats(r.getAs[String]("event_type"))
      val z = (r.getAs[Long]("v_cents").toDouble - mean) / std
      assert(math.floor(z * 100) === r.getAs[Long]("z_q").toDouble)
      assert(math.abs(z) >= 2.49)
    }
  }

  test("rfm scores are quintiles (sizes within 1) and the segment concatenates them") {
    val rows = TimeSeriesOps.rfm(spark, d).collect()
    assert(rows.nonEmpty)
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val sizes = rows.groupBy(_.getAs[Long](c)).view.mapValues(_.length).toMap
      assert(sizes.keySet === Set(1L, 2L, 3L, 4L, 5L), s"$c tiles: ${sizes.keySet}")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$c quintiles must be balanced: $sizes")
    }
    rows.foreach { r =>
      assert(r.getAs[String]("segment") ===
        s"${r.getAs[Long]("r_score")}${r.getAs[Long]("f_score")}${r.getAs[Long]("m_score")}")
      assert(r.getAs[Long]("recency_days") >= 0L)
      assert(r.getAs[Long]("frequency") >= 1L)
    }
    // better recency (fewer days) never gets a worse tile than a strictly
    // later customer in the deterministic (metric, custkey) ordering
    val byR = rows.sortBy(r => (r.getAs[Long]("recency_days"), r.getAs[Long]("o_custkey")))
    assert(byR.map(_.getAs[Long]("r_score")).sliding(2).forall {
      case Array(a, b) => a <= b; case _ => true
    })
  }

  test("mad is the exact median absolute deviation of the collected values") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_returnflag", "l_quantity").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    def medianOf(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val r = (s.length - 1) * 0.5
      val lo = s(r.toInt); val hi = s(math.ceil(r).toInt)
      lo + (r - r.toInt) * (hi - lo)
    }
    val out = TimeSeriesOps.madStats(spark, d).collect()
    assert(out.length === li.size)
    out.foreach { r =>
      val vs = li(r.getAs[String]("l_returnflag")).map(_.getAs[Double]("l_quantity")).toSeq
      val med = medianOf(vs)
      assert(r.getAs[Long]("n") === vs.length.toLong)
      assert(r.getAs[Double]("med") === med)
      assert(r.getAs[Double]("mad") === medianOf(vs.map(v => math.abs(v - med))))
    }
  }

  test("gini is in [0, 1e6) ppm and matches an in-Scala restatement per nation") {
    val out = TimeSeriesOps.gini(spark, d).collect()
    assert(out.nonEmpty)
    val spend = spark.read.parquet(s"$d/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .join(spark.read.parquet(s"$d/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select("c_nationkey", "x").collect()
      .groupBy(_.getAs[Int]("c_nationkey"))
    out.foreach { r =>
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0L && g < 1000000L)
      val xs = spend(r.getAs[Int]("nationkey")).map(_.getAs[Long]("x")).sorted
      val n = xs.length.toLong
      val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val expected = math.floor(
        (2.0 * s1 - (n + 1.0) * xs.sum) * 1000000.0 / (n.toDouble * xs.sum)).toLong
      assert(r.getAs[Long]("n") === n)
      assert(g === expected)
    }
  }

  test("ols trend matches a least-squares fit recomputed from the daily series") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("dt"), lit("1970-01-01").cast("date")).cast("long").as("x"),
        col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = TimeSeriesOps.olsTrend(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("slope_q"))).toMap
    for ((t, rows) <- daily.groupBy(_._1)) {
      val xs = rows.map(_._2.toDouble); val ys = rows.map(_._3.toDouble)
      val n = xs.length.toDouble
      val slope = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
        xs.sum * ys.sum) / (n * xs.map(a => a * a).sum - xs.sum * xs.sum)
      val (gn, gs) = got(t)
      assert(gn === rows.length.toLong)
      // same closed form over order-insensitive exact sums → ±1 on the grid
      assert(math.abs(gs - math.floor(slope * 1e6).toLong) <= 1L, s"$t: $gs vs $slope")
    }
  }

  test("acf lag rows pair only existing day indexes and lag-k pair count shrinks with k") {
    val out = TimeSeriesOps.acf(spark, d).collect().sortBy(_.getAs[Long]("k"))
    assert(out.map(_.getAs[Long]("k")).toSeq === (1L to TimeSeriesOps.AcfMaxLag))
    val days = graft.Tables.events(spark, d)
      .select(to_date(col("ts")).as("dt")).distinct().collect()
      .map(_.getAs[java.sql.Date]("dt").toLocalDate.toEpochDay).toSet
    out.foreach { r =>
      val k = r.getAs[Long]("k")
      val expectedPairs = days.count(t => days.contains(t - k)).toLong
      assert(r.getAs[Long]("n_pairs") === expectedPairs)
      val a = r.getAs[Long]("acf_q")
      assert(a >= -1000000L && a <= 1000000L)
    }
  }
}
