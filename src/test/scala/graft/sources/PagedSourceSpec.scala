package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}

import graft.SparkSpec

/** PagedSource (DSv2): page-grained partition planning, id-range page
  * pruning, column pruning, and answer-invariance of best-effort pruning. */
class PagedSourceSpec extends SparkSpec {

  private def read(pages: Int = 4, pageSize: Int = 100) =
    spark.read.format(classOf[PagedSource].getName)
      .option("pages", pages.toString).option("pageSize", pageSize.toString)
      .load()

  test("one input partition per page; full scan yields pages x pageSize rows") {
    val df = read()
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 400L)
    // ids are the dense global index, exactly once each
    assert(df.agg(countDistinct(col("id"))).head.getLong(0) === 400L)
    assert(df.agg(min(col("id")), max(col("id"))).head ===
      org.apache.spark.sql.Row(0L, 399L))
  }

  test("id-range filters prune whole pages at planning") {
    // [150, 250) overlaps pages 1 and 2 only
    val pruned = read().where(col("id") >= 150L && col("id") < 250L)
    assert(pruned.rdd.getNumPartitions === 2)
    assert(pruned.count() === 100L)
    // kept pages are still row-filtered (residual re-evaluation): exact edges
    assert(pruned.agg(min(col("id")), max(col("id"))).head ===
      org.apache.spark.sql.Row(150L, 249L))
    // builder-level: the same bounds plan 2 of 4 partitions
    val b = new PagedScanBuilder(4, 100)
    b.pushFilters(Array(GreaterThanOrEqual("id", 150L), LessThan("id", 250L)))
    assert(b.pushedFilters().length === 2)
    val scan = b.build().asInstanceOf[PagedScan]
    assert(scan.planInputPartitions().length === 2)
    // disjoint range degrades to an empty scan, not an error
    val none = read().where(col("id") >= 1000L)
    assert(none.count() === 0L)
  }

  test("non-id filters are not claimed; pruning never changes answers") {
    val b = new PagedScanBuilder(4, 100)
    val residual = b.pushFilters(Array(GreaterThanOrEqual("track_id", 10L)))
    assert(b.pushedFilters().isEmpty)
    assert(residual.length === 1) // everything re-evaluated by Spark
    val viaFilter = read().where(col("id") >= 150L && col("id") < 250L)
      .agg(sum(col("duration_ms"))).head.getLong(0)
    val viaSlice = read().where(col("id").between(150L, 249L))
      .agg(sum(col("duration_ms"))).head.getLong(0)
    assert(viaFilter === viaSlice)
  }

  test("column pruning narrows the read schema (title never generated)") {
    val df = read().select(col("id"), col("duration_ms"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PagedScan"), plan)
    assert(!plan.contains("title"), plan)
    assert(df.count() === 400L)
  }

  test("micro-batch stream consumes pages in offset steps and totals the table") {
    val stream = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "4").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load()
      .groupBy().agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
    val q = stream.writeStream
      .outputMode("complete").format("memory").queryName("paged_stream_spec")
      .start()
    try {
      q.processAllAvailable()
      // one page per trigger -> at least 4 data micro-batches ran
      assert(q.recentProgress.count(_.numInputRows > 0L) === 4,
        q.recentProgress.map(_.numInputRows).mkString(","))
      val row = spark.table("paged_stream_spec").head
      assert(row.getLong(0) === 400L)
      assert(row.getLong(1) === (0L until 400L).sum)
    } finally q.stop()
  }

  test("latestOffset is monotone w.r.t. a restored checkpoint offset") {
    // fresh instance simulating a restart: admission control derives the
    // end from the engine-supplied start, so a restored offset of 20
    // resumes at 27 (never back at 7 as a reset mutable counter would)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val s = new PagedMicroBatchStream(40, 10, 7, Array("id"))
    val next = s.latestOffset(PagedOffset(20), ReadLimit.allAvailable())
      .asInstanceOf[PagedOffset].page
    assert(next === 27, s"latestOffset must resume above the committed 20, got $next")
    // and never exceeds the page count
    assert(s.latestOffset(PagedOffset(38), ReadLimit.allAvailable())
      .asInstanceOf[PagedOffset].page === 40)
    assert(s.latestOffset(PagedOffset(40), ReadLimit.allAvailable())
      .asInstanceOf[PagedOffset].page === 40)
  }

  test("checkpointed restart resumes at the committed page — no replay") {
    // run 1 consumes pages [0,2); run 2 restarts from the SAME checkpoint
    // with more pages available and must emit ONLY pages [2,4)
    val out = java.nio.file.Files.createTempDirectory("graft_paged_restart_out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_paged_restart_ckpt")
    def run(pages: Int): Unit = {
      val q = spark.readStream.format(classOf[PagedSource].getName)
        .option("pages", pages.toString).option("pageSize", "100")
        .option("pagesPerTrigger", "1")
        .load()
        .select(col("id"))
        .writeStream.format(classOf[JsonAuditSink].getName)
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run(2)
    run(4)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val back = spark.read.schema(schema).json(s"$out/*.jsonl")
    assert(back.count() === 400L, "every page exactly once across both runs")
    assert(back.agg(countDistinct(col("id"))).head.getLong(0) === 400L,
      "a replayed page would surface as duplicate ids")
  }

  test("grouped aggregation pushes into the source as per-page partials") {
    val df = read().where(col("id") >= 150L && col("id") < 250L)
      .groupBy(col("track_id"))
      .agg(count(lit(1)).as("n"), sum(col("duration_ms")).as("total"),
        min(col("duration_ms")).as("mn"), max(col("duration_ms")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    // the scan's output is the pushed partial schema, not raw rows
    assert(plan.contains("agg_0_count_star") || plan.contains("agg_0_count"),
      plan.take(2000))
    assert(plan.contains("agg_1_sum") && plan.contains("agg_2_min") &&
      plan.contains("agg_3_max"), plan.take(2000))
    // answers equal the row-level compute (partials merge across the page
    // boundary inside [150, 250))
    val rows = read().where(col("id") >= 150L && col("id") < 250L).collect()
      .map(r => (r.getAs[Long]("track_id"), r.getAs[Long]("duration_ms")))
    val expect = rows.groupBy(_._1).view.mapValues { vs =>
      val ds = vs.map(_._2)
      (ds.length.toLong, ds.sum, ds.min, ds.max)
    }.toMap
    val got = df.collect().map(r => r.getAs[Long]("track_id") ->
      (r.getAs[Long]("n"), r.getAs[Long]("total"),
        r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toMap
    assert(got === expect)
  }

  test("pushed aggregation over an empty id slice yields an empty result") {
    val df = read().where(col("id") >= 5000L)
      .groupBy(col("track_id")).agg(count(lit(1)).as("n"))
    assert(df.collect().isEmpty)
  }

  test("ungrouped and distinct aggregations are NOT claimed (stay row-level)") {
    // ungrouped: the empty-input identity row is Spark's job, so the
    // builder refuses and the scan stays a raw row scan
    val ungrouped = read().groupBy().agg(sum(col("duration_ms")).as("s"))
    val p1 = ungrouped.queryExecution.executedPlan.toString
    assert(!p1.contains("agg_0_"), p1.take(2000))
    val distinct = read().groupBy(col("track_id"))
      .agg(countDistinct(col("duration_ms")).as("nd"))
    val p2 = distinct.queryExecution.executedPlan.toString
    assert(!p2.contains("agg_0_"), p2.take(2000))
  }

  test("top-n and limit push a per-partition row cap; answers stay exact") {
    // ORDER BY id LIMIT k: every partition emits at most k rows (its first
    // k, since ids ascend in-page); the merged answer is the global top-k
    val top = read().orderBy(col("id")).limit(30)
    val perPart = top.queryExecution.toRdd
      .mapPartitions(it => Iterator(it.length)).collect()
    assert(perPart.forall(_ <= 30), perPart.mkString(","))
    assert(top.collect().map(_.getAs[Long]("id")).toSeq === (0L until 30L))
    // bare LIMIT also caps partitions (Spark reapplies the global limit)
    val lim = read().limit(25)
    assert(lim.count() === 25L)
    // a DESC order is not claimed: full pages, Spark sorts
    val desc = read().orderBy(col("id").desc).limit(10)
    assert(desc.collect().map(_.getAs[Long]("id")).toSeq ===
      (399L to 390L by -1L))
  }

  test("row formula matches the engine hash helpers deterministically") {
    val rows = read(1, 50).collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Long]("track_id"),
        r.getAs[Long]("duration_ms"), r.getAs[String]("title"))).sortBy(_._1)
    rows.foreach { case (id, tid, dur, title) =>
      assert(tid === PagedSource.trackId(id))
      assert(dur === PagedSource.durationMs(id))
      assert(title === s"trk_$tid")
    }
  }

  test("runtime In/EqualTo filters map ids to pages; unknown predicates prune nothing") {
    val scan = new PagedScanBuilder(4, 100).build().asInstanceOf[PagedScan]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array(5L, 250L))))
    assert(scan.planInputPartitions().map(
      _.asInstanceOf[PagePartition].page).toSet === Set(0, 2))
    val eq = new PagedScanBuilder(4, 100).build().asInstanceOf[PagedScan]
    eq.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("id", 399L)))
    assert(eq.planInputPartitions().map(
      _.asInstanceOf[PagePartition].page).toSeq === Seq(3))
    // best-effort: a predicate the source can't map must not prune
    val noop = new PagedScanBuilder(4, 100).build().asInstanceOf[PagedScan]
    noop.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.StringStartsWith("title", "t")))
    assert(noop.planInputPartitions().length === 4)
    // a partially-understood In set must not prune either
    val mixed = new PagedScanBuilder(4, 100).build().asInstanceOf[PagedScan]
    mixed.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array(5L, "x"))))
    assert(mixed.planInputPartitions().length === 4)
  }

  test("native V2 runtime predicates prune pages without the v1 bridge") {
    import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    def lit(v: Long): Expression = Expressions.literal(Long.box(v))
    val idRef = Expressions.column("id")
    val in = new PagedScanBuilder(4, 100).build().asInstanceOf[PagedScan]
    in.filter(Array(new Predicate("IN", Array[Expression](idRef, lit(5L), lit(250L)))))
    assert(in.planInputPartitions().map(
      _.asInstanceOf[PagePartition].page).toSet === Set(0, 2))
    assert(in.runtimeFilterApi === Some("v2-native"))
    val eq = new PagedScanBuilder(4, 100).build().asInstanceOf[PagedScan]
    eq.filter(Array(new Predicate("=", Array[Expression](lit(399L), idRef))))
    assert(eq.planInputPartitions().map(
      _.asInstanceOf[PagePartition].page).toSeq === Seq(3))
    assert(eq.runtimeFilterApi === Some("v2-native"))
    // a shape the native parser skips must not prune (and must not crash)
    val noop = new PagedScanBuilder(4, 100).build().asInstanceOf[PagedScan]
    noop.filter(Array(new Predicate("IS_NULL", Array[Expression](idRef))))
    assert(noop.planInputPartitions().length === 4)
    assert(noop.runtimeFilterApi === None)
  }

  test("a selective broadcast join plants a runtime filter in the scan (DPP at execution)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = read(40, 100) // ids 0..3999 over 40 pages
      val dim = spark.range(0, 3).toDF("k")
        .select((col("k") * 1000L).as("id")) // ids 0,1000,2000 → 3 pages
        .where(col("id") >= 0L) // the selective predicate that licenses DPP
      val joined = fact.join(dim, "id")
      val expected = Seq(0L, 1000L, 2000L).map(PagedSource.durationMs).sum
      assert(joined.agg(sum(col("duration_ms"))).head.getLong(0) === expected)
      val scans = joined.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty)
      assert(scans.exists(_.runtimeFilters.nonEmpty),
        "expected a dynamicpruning runtime filter on the paged scan")
      // AND it arrived through the NATIVE V2 Predicate overload — Spark
      // plants runtime filters via SupportsRuntimeV2Filtering.filter.
      // The filter fires when THIS plan executes (agg above planned its
      // own copy), so drive this exact plan before inspecting the marker.
      assert(joined.collect().length === 3)
      assert(scans.flatMap(_.scan match {
        case p: PagedScan => p.runtimeFilterApi
        case _            => None
      }).contains("v2-native"),
        "expected the v2-native predicate path to have pruned")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("columnar read path plans ColumnarToRow and matches the row path exactly") {
    def df(columnar: Boolean) =
      spark.read.format(classOf[PagedSource].getName)
        .option("pages", "4").option("pageSize", "100")
        .option("columnar", columnar.toString)
        .load()
    val colDf = df(columnar = true)
    val plan = colDf.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    // row-identical across the whole schema, including strings
    val a = colDf.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue)
    val b = df(columnar = false).collect().map(_.toSeq)
      .sortBy(_.head.asInstanceOf[Long].longValue)
    assert(a.toSeq === b.toSeq)
    // pushdown still composes: id slice + projection through the batch reader
    val sliced = df(columnar = true)
      .where(col("id") >= 150L && col("id") < 250L)
      .select(col("id"), col("duration_ms"))
    assert(sliced.rdd.getNumPartitions === 2)
    assert(sliced.count() === 100L)
    assert(sliced.agg(sum(col("duration_ms"))).head.getLong(0) ===
      (150L until 250L).map(PagedSource.durationMs).sum)
  }

  test("columnar reader composes with runtime filtering in one join") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = spark.read.format(classOf[PagedSource].getName)
        .option("pages", "40").option("pageSize", "100")
        .option("columnar", "true").load()
      val dim = spark.range(0, 2).toDF("k")
        .select((col("k") * 1500L + 10L).as("id"))
        .where(col("id") >= 0L)
      val joined = fact.join(dim, "id")
      val expected = Seq(10L, 1510L).map(PagedSource.durationMs).sum
      assert(joined.agg(sum(col("duration_ms"))).head.getLong(0) === expected)
      val plan = joined.queryExecution.executedPlan
      assert(plan.toString.contains("ColumnarToRow"), plan.toString.take(1500))
      val scans = plan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.exists(_.runtimeFilters.nonEmpty),
        "DPP must still plant a runtime filter on the columnar scan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("estimateStatistics tracks the pruned range and flips the join strategy") {
    val b = new PagedScanBuilder(40, 100)
    b.pushFilters(Array(GreaterThanOrEqual("id", 150L), LessThan("id", 250L)))
    val stats = b.build().asInstanceOf[PagedScan].estimateStatistics()
    assert(stats.numRows.getAsLong === 100L)
    val full = new PagedScanBuilder(40, 100).build().asInstanceOf[PagedScan]
    assert(full.estimateStatistics().numRows.getAsLong === 4000L)
    // CBO-visible size: a narrow pushed slice broadcasts against a big scan;
    // the same join with the unfiltered scan stays shuffle-based
    val big = read(4000, 100) // 400k rows × 44 B ≈ 17 MB > the 10 MB bar
    val slice = read(4000, 100).where(col("id") >= 0L && col("id") < 1000L)
    val bcPlan = big.join(slice, "id").queryExecution.executedPlan.toString
    assert(bcPlan.contains("BroadcastHashJoin"))
    val smPlan = big.join(read(4000, 100), "id")
      .queryExecution.executedPlan.toString
    assert(!smPlan.contains("BroadcastHashJoin"))
  }
}
