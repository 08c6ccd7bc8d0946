package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the analytic-aggregation extensions at sf0.001
  * (exact values are DuckDB-oracle-checked at sf0.01; these assert the
  * properties that must hold at any scale). */
class AnalyticOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("rollup emits leaf, subtotal, and grand-total levels that reconcile") {
    val rows = AnalyticOps.rollupAgg(spark, d).collect()
    val leaves = rows.filter(_.getAs[Long]("gid") == 0L)
    val subtotals = rows.filter(_.getAs[Long]("gid") == 1L)
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length === 1)
    assert(leaves.map(_.getAs[Long]("n_rows")).sum ===
      grand.head.getAs[Long]("n_rows"))
    assert(subtotals.map(_.getAs[Long]("n_rows")).sum ===
      grand.head.getAs[Long]("n_rows"))
    // money reconciles exactly (integer-unit sums → each level is an exact
    // 2-decimal value; summing their decimal representations is lossless)
    assert(leaves.map(r => BigDecimal(r.getAs[Double]("sum_price").toString)).sum ===
      BigDecimal(grand.head.getAs[Double]("sum_price").toString))
  }

  test("pivot row totals equal the unpivoted daily counts") {
    val wide = AnalyticOps.pivotDaily(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("dt") ->
        AnalyticOps.EventTypes.map(t => r.getAs[Long](s"n_$t")).sum).toMap
    val long = graft.Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("dt")).count().collect()
      .map(r => r.getAs[java.sql.Date]("dt") -> r.getAs[Long]("count")).toMap
    assert(wide === long)
  }

  test("co-purchase pairs are ordered, deduplicated, and bounded by the top-k") {
    val rows = AnalyticOps.coOccurrence(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= AnalyticOps.CoOccurTopK)
    rows.foreach(r => assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b")))
    val counts = rows.map(_.getAs[Long]("n_orders"))
    assert(counts.toSeq === counts.sortBy(-_).toSeq, "descending by support")
    val keys = rows.map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")))
    assert(keys.distinct.length === keys.length)
  }

  test("quantile bins are balanced, contiguous, and partition the table") {
    val rows = AnalyticOps.quantileBins(spark, d).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSeq === (1L to 8L))
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1L, "ntile balance")
    assert(sizes.sum === graft.Tables.orders(spark, d).count())
    // ranges are non-overlapping and ordered: each bin's hi <= next bin's lo
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
    case _ => ()
    }
  }

  test("welch t matches a driver-side recompute from raw rows") {
    val got = AnalyticOps.welchT(spark, d).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n"), r.getAs[Long]("mean_cents_q"),
          r.getAs[Long]("t_welch_q"))).toMap
    val raw = graft.Tables.orders(spark, d)
      .join(graft.Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice")).collect()
      .map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
    val bySeg = raw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet === bySeg.keySet)
    for ((seg, cents) <- bySeg) {
      val other = raw.filter(_._1 != seg).map(_._2)
      def stats(xs: Array[Long]) = {
        val n = xs.length.toDouble
        val s = xs.sum.toDouble
        val q = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
        (n, s / n, (q - s * s / n) / (n - 1.0))
      }
      val (n1, m1, v1) = stats(cents)
      val (n2, m2, v2) = stats(other)
      val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
      val (gn, gmean, gt) = got(seg)
      assert(gn === cents.length.toLong)
      assert(gmean === math.floor(m1 * 100.0).toLong)
      // same formula, associative-order-insensitive inputs → tight bound
      assert(math.abs(gt - math.floor(t * 1e6).toLong) <= 1L, s"$seg: $gt vs $t")
    }
  }

  test("quantiles are ordered within each group and bounded by min/max") {
    AnalyticOps.quantiles(spark, d).collect().foreach { r =>
      val vals = Seq(r.getAs[Double]("q_min"), r.getAs[Double]("p25"),
        r.getAs[Double]("p50"), r.getAs[Double]("p75"), r.getAs[Double]("q_max"))
      assert(vals === vals.sorted)
    }
  }

  test("approx_percentile (t-digest sketch) tracks the exact quantiles") {
    // the 100 TB drop-in for q_quantiles' exact percentile: a mergeable
    // sketch (partial+final) instead of per-group value materialization.
    // Sketches differ per engine → spec-checked against exact, not oracled.
    import org.apache.spark.sql.functions.{expr => sqlExpr}
    val rows = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("exact_p50"),
        sqlExpr("approx_percentile(l_quantity, 0.5, 1000)").as("approx_p50"))
      .collect()
    rows.foreach { r =>
      val exact = r.getAs[Double]("exact_p50")
      val approx = r.getAs[Double]("approx_p50")
      assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
    }
  }

  test("full outer join keeps unmatched rows from both sides") {
    val rows = AnalyticOps.fullJoin(spark, d).collect()
    val leftOnly = rows.count(r => !r.isNullAt(1) && r.isNullAt(2))
    val rightOnly = rows.count(r => r.isNullAt(1) && !r.isNullAt(2))
    val both = rows.count(r => !r.isNullAt(1) && !r.isNullAt(2))
    assert(leftOnly > 0); assert(rightOnly > 0); assert(both > 0)
    assert(rows.forall(!_.isNullAt(0))) // key coalesces, never null
  }

  test("ivf assigns injected duplicate vectors to the query's cell and finds them") {
    import graft.operators.Similarity
    val cells = Similarity.ivfCells(spark, d).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells.values.toSet.size > 1, "centroids should split the corpus")
    val topk = Similarity.ivfTopK(spark, d).collect()
    assert(topk.nonEmpty)
    // every hit really is in the query's cell
    val qCell = cells(0L)
    topk.foreach(r => assert(cells(r.getLong(0)) === qCell))
  }

  test("skyline equals the brute-force dominance definition") {
    import org.apache.spark.sql.functions._
    val c = spark.read.parquet(s"$d/customer.parquet")
    val o = spark.read.parquet(s"$d/orders.parquet")
    val pts = c.as("c").join(o.as("o"), col("o.o_custkey") === col("c.c_custkey"), "left")
      .groupBy(col("c.c_custkey"), col("c.c_acctbal"))
      .agg(count(col("o.o_orderkey")).as("n")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dominated(p: (Long, Double, Long)) = pts.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    val expected = pts.filterNot(dominated).map(_._1).toSet
    val got = AnalyticOps.skyline(spark, d).collect()
      .map(_.getAs[Long]("c_custkey")).toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < pts.length, "frontier must be a proper subset")
  }

  test("windowed argmax picks the true per-window maximum with lexicographic ties") {
    val cnts = graft.Tables.events(spark, d)
      .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "7 days", "1 day"),
        org.apache.spark.sql.functions.col("event_type"))
      .count().collect()
      .map(r => (r.getStruct(0).getTimestamp(0), r.getString(1), r.getLong(2)))
    val best = cnts.groupBy(_._1).view.mapValues(es =>
      es.minBy(e => (-e._3, e._2))).toMap
    val got = AnalyticOps.windowArgmax(spark, d).collect()
    assert(got.length === best.size)
    got.foreach { r =>
      val matching = best.find(_._2._1.toLocalDateTime.toLocalDate ===
        r.getAs[java.sql.Date]("window_start").toLocalDate).get._2
      assert(r.getAs[String]("top_type") === matching._2)
      assert(r.getAs[Long]("top_n") === matching._3)
      assert(r.getAs[Long]("top_share_ppm") ===
        matching._3 * 1000000L / r.getAs[Long]("total_n"))
    }
  }

  test("observe() metrics report exact counts piggybacked on the action") {
    // the operational audit surface: data-quality counters collected on the
    // SAME pass as the real work (zero extra scans, aggregated on the
    // executors like any partial agg) — vs a separate .count()/.agg() job,
    // which at 100 TB doubles the read. Exact-cents metric keeps it
    // deterministic.
    import org.apache.spark.sql.functions._
    val obs = new org.apache.spark.sql.Observation("graft_obs")
    val ev = graft.Tables.events(spark, d)
    val cents = graft.functions.Money.cents(col("value"))
    val n = ev.observe(obs, count(lit(1)).as("n_rows"),
        sum(cents).as("total_cents"), sum(when(col("value") < 0, 1L)
          .otherwise(0L)).as("n_negative"))
      .count()
    val m = obs.get
    assert(m("n_rows") === n)
    val ref = ev.agg(sum(cents), sum(when(col("value") < 0, 1L).otherwise(0L)))
      .head
    assert(m("total_cents") === ref.getLong(0))
    assert(m("n_negative") === ref.getLong(1))
  }
}
