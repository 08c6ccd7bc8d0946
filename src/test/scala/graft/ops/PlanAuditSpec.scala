package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Physical-plan audits: the properties that make these queries survive a
  * 100× scale-up, asserted against the actual executed plan so a regression
  * (lost pushdown, broadcast demoted to SMJ, an accidental extra shuffle)
  * fails CI rather than silently degrading at scale. */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countExchanges(df: DataFrame): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(plan(df)).length

  test("isin predicate reaches the parquet scan (PushedFilters)") {
    assert(plan(RelationalOps.filterIsin(spark, d))
      .contains("PushedFilters: [In(o_orderpriority"))
  }

  test("column pruning: scalar-math scan reads only the projected columns") {
    val p = plan(ScalarOps.scalarMath(spark, d))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"))
  }

  test("dimension join plans BroadcastHashJoin, never SortMergeJoin") {
    val p = plan(RelationalOps.joinBroadcastAgg(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-k plans TakeOrderedAndProject (no global sort materialization)") {
    assert(plan(RelationalOps.topkOrders(spark, d)).contains("TakeOrderedAndProject"))
  }

  test("map-only operators have ZERO shuffle exchanges") {
    // fingerprint (custom expression), frame sampling, json extraction,
    // pii scrub: all must run at scan speed
    assert(countExchanges(graft.operators.TextAnalysis.fingerprint(spark, d)) === 0)
    assert(countExchanges(graft.operators.Multimodal.frameSample(spark, d)) === 0)
    assert(countExchanges(ScalarOps.jsonExtract(spark, d)) === 0)
    assert(countExchanges(graft.operators.TextAnalysis.piiScrub(spark, d)) === 0)
  }

  test("filter funnel is one map + one reason-cardinality aggregate " +
    "(single shuffle, partial agg on the map side)") {
    val df = graft.operators.TextAnalysis.filterFunnel(spark, d)
    val p = plan(df)
    // one exchange for the 5-key groupBy, one for the tiny orderBy —
    // never a row-sized shuffle (the signals are computed map-side)
    assert(countExchanges(df) <= 2, p)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("domain cap shuffles once on the domain key (window + agg reuse " +
    "the same partitioning)") {
    val df = graft.operators.Sampling.domainCap(spark, d)
    // source-hash exchange for the window; the groupBy(source) after it
    // must REUSE that partitioning, leaving only the final tiny sort
    assert(countExchanges(df) <= 2, plan(df))
  }

  test("flatten reuses the join's partitioning for dedup (bounded exchanges)") {
    // lineitem→agg exchange, orders→join exchange, final range sort: the
    // keyed dropDuplicates must NOT add a fourth full-row exchange
    assert(countExchanges(CoreOps.playbackFlatten(spark, d)) <= 3)
  }

  test("hive-partitioned lake write prunes partitions on read") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.Tables.events(spark, d)
      .withColumn("dt", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("dt").parquet(s"$dir/events_by_day")
    val pruned = spark.read.parquet(s"$dir/events_by_day")
      .where(col("dt") === lit(java.sql.Date.valueOf("2024-01-02")))
    val p = plan(pruned)
    // the date predicate must resolve at the FILE INDEX (PartitionFilters),
    // not as a post-scan row filter — at 100 TB this is the difference
    // between listing one day's directory and scanning the lake
    assert(p.contains("PartitionFilters:") && p.contains("dt#"),
      s"expected partition filters in:\n$p")
    assert(pruned.count() > 0)
    val filters = p.linesIterator.find(_.contains("PartitionFilters:")).get
    assert(filters.contains("2024-01-02"))
  }

  test("array/map/posexplode suites run with ZERO shuffle exchanges") {
    assert(countExchanges(ScalarOps.arrayFuncs(spark, d).limit(1)) <= 1) // orderBy adds range
    assert(countExchanges(ScalarOps.mapFuncs(spark, d).limit(1)) <= 1)
    assert(countExchanges(ScalarOps.posExplode(spark, d).limit(1)) <= 1)
  }

  test("dimension cross join plans BroadcastNestedLoopJoin (bounded product)") {
    val p = plan(RelationalOps.crossJoinDims(spark, d))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("batch sessionization shares ONE exchange across both window passes") {
    // lag + running sum use the same (partition, ordering) spec — a second
    // Exchange would mean the specs diverged; agg reuses the partitioning,
    // the final orderBy adds the range exchange
    assert(countExchanges(AnalyticOps.sessionizeBatch(spark, d)) <= 2)
  }

  test("date spine joins broadcast (fact table shuffles only for its own agg)") {
    val p = plan(AnalyticOps.dateSpine(spark, d))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("char entropy runs at scan speed (zero exchanges, codegen'd)") {
    val df = graft.operators.TextAnalysis.entropySignal(spark, d)
    assert(countExchanges(df) === 0)
    // codegen'd stages are starred in the simple plan string
    assert(plan(df).contains("*(1)"), plan(df))
  }

  test("bm25 broadcasts the one-row corpus stats (no fact-side shuffle for the join)") {
    val p = plan(graft.operators.TextAnalysis.bm25(spark, d))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("sql frontend composes with DataFrame agg into one optimized plan (filters pushed)") {
    val p = plan(RelationalOps.sqlQ3(spark, d))
    // the SQL-text filters must reach the parquet scans as pushed filters —
    // proof the two entry surfaces share one Catalyst pipeline
    val pushed = p.linesIterator.filter(_.contains("PushedFilters: [")).toSeq
    assert(pushed.exists(_.contains("c_mktsegment")), p.take(4000))
    assert(pushed.exists(_.contains("o_orderdate")), p.take(4000))
    assert(pushed.exists(_.contains("l_shipdate")), p.take(4000))
    // top-10 by revenue plans as partial top-k, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q1 aggregation is a two-phase hash agg with no decimal in the hot path") {
    val p = plan(CoreOps.q1Agg(spark, d))
    assert(p.contains("HashAggregate"))
    // the split-long accumulators sum as bigint; decimal appears only in
    // the final output projection, never inside partial_sum
    assert(!p.contains("partial_sum(cast(l_extendedprice"))
  }

  test("scd2 shares ONE user_id exchange across change-mark, numbering, agg, and lead") {
    // four logical passes (lag, running sum, groupBy, lead) over the same
    // user_id partitioning — the final orderBy's range exchange is the only
    // other data movement allowed
    assert(countExchanges(LakeOps.scd2Build(spark, d)) <= 2)
  }

  test("interval merge shares ONE user_id exchange across both windows and the agg") {
    assert(countExchanges(LakeOps.intervalMerge(spark, d)) <= 2)
  }

  test("zorder keys compute with zero exchanges before the layout sort") {
    // pure bit arithmetic at scan speed; the single range exchange IS the
    // z-order clustering write — nothing else may move data
    assert(countExchanges(LakeOps.zorderKeys(spark, d)) === 1)
  }

  test("funnel joins broadcast the per-stage user sets (fact never re-shuffles for a join)") {
    val p = plan(TimeSeriesOps.funnel(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("outlier stats broadcast back onto the scan (no fact-side join shuffle)") {
    val p = plan(TimeSeriesOps.outliers(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("ewma's eight lags share ONE window sort (single user_id exchange + output sort)") {
    val p = plan(TimeSeriesOps.ewma(spark, d))
    assert("\\bWindow\\b".r.findAllIn(p).length === 1,
      "all lag() calls must fold into one Window operator")
    assert(countExchanges(TimeSeriesOps.ewma(spark, d)) <= 2)
  }

  test("kmeans broadcasts the centroid grid every round (fact joins never SMJ)") {
    val p = plan(graft.operators.Similarity.kmeansAssign(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("sliding windows plan ONE Expand + hash agg (no self-join, no spine)") {
    val df = AnalyticOps.slidingWindowAgg(spark, d)
    val p = plan(df)
    assert(p.contains("Expand"), "hopping windows must fan out via Expand")
    assert(!p.contains("Join"))
    assert(countExchanges(df) <= 2) // agg exchange + output sort
  }

  test("session windows aggregate in-partition (one user_id exchange + output sort)") {
    val df = AnalyticOps.sessionWindowAgg(spark, d)
    assert(countExchanges(df) <= 2)
    assert(!plan(df).contains("Join"))
  }

  test("SQL BROADCAST hint resolves to BroadcastHashJoin") {
    val p = plan(RelationalOps.sqlHint(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q17 correlated subquery decorrelates to a join (no per-row subquery)") {
    val p = plan(RelationalOps.sqlQ17(spark, d))
    // the scalar subquery must be rewritten into a per-part aggregate
    // joined back — any surviving subquery node means per-row re-execution
    assert(!p.contains("Subquery"))
    assert(p.contains("HashAggregate"))
    assert("Join".r.findAllIn(p).nonEmpty)
  }

  test("pagerank supersteps broadcast the node-sized rank frame against pinned edges") {
    val p = plan(GraphOps.pageRank(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // per iteration: one dst aggregation exchange; plus the final sort —
    // the pinned edge list must not re-shuffle inside the loop
    assert(countExchanges(GraphOps.pageRank(spark, d)) <= GraphOps.PrIters + 2)
  }

  test("q4 correlated EXISTS decorrelates to a left-semi join (no per-row subquery)") {
    val p = plan(RelationalOps.sqlQ4(spark, d))
    assert(!p.contains("Subquery"), p)
    assert(p.contains("LeftSemi"), s"expected a semi join:\n$p")
  }

  test("q10 pushes the returnflag filter to the scan and plans partial top-k") {
    val p = plan(RelationalOps.sqlQ10(spark, d))
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q20 nested IN + scalar HAVING plans as semi join over two aggregate passes") {
    val p = plan(RelationalOps.sqlQ20(spark, d))
    assert(p.contains("LeftSemi"), s"expected a semi join:\n$p")
    // the HAVING threshold must be an independent one-row subquery result,
    // reused as a literal/broadcast — never a per-group re-aggregation;
    // executed-plan Subquery nodes here are the LOOP-FREE scalar form
    assert(!p.contains("InSubquery"), p)
  }

  test("windowed argmax shares ONE window exchange for row_number and total") {
    // Expand → count agg (1 exchange on the grouping) → BOTH window
    // functions over partition-by-window (1 exchange) → final sort (range)
    assert(countExchanges(AnalyticOps.windowArgmax(spark, d)) <= 3)
  }

  test("skyline sweep is x-cardinality after one fact shuffle (no n² join)") {
    val p = plan(AnalyticOps.skyline(spark, d))
    // the dominance test must be the window sweep, not a theta self-join
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("triangles enumerate over the pinned bounded-degree edge frame") {
    val p = plan(GraphOps.triangles(spark, d))
    // the mutual-kNN edge frame is localCheckpoint-pinned: the triangle
    // path join must read the pinned scan, not recompute the window pass
    // (3 consumers × window+shuffle would show as repeated Window nodes)
    assert("Window".r.findAllIn(p).isEmpty, s"pinned edges must hide the window pass:\n$p")
  }

  test("bigram adjacency shares the doc partition between lead() and the pair agg") {
    // posexplode (scan stage) → ONE doc_id exchange for lead() → pair-count
    // exchange → cur-partition window → final sort
    assert(countExchanges(graft.operators.TextAnalysis.bigramLm(spark, d)) <= 4)
  }

  test("partial-merge reaggregation keeps integer units until the final grain") {
    val p = plan(LakeOps.partialMerge(spark, d))
    // two hash aggregations (daily, monthly), no decimal math in the scan
    assert(p.contains("HashAggregate"))
    assert(countExchanges(LakeOps.partialMerge(spark, d)) <= 3)
  }

  test("dt-sliced read of the partitioned lake resolves as PartitionFilters") {
    val p = plan(LakeOps.partitionPrune(spark, d))
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    // the dt predicate must prune directories at planning time, not scan rows
    assert(scanLine.contains("dt"), s"expected dt in PartitionFilters:\n$p")
    val pushed = scanLine.split("PushedFilters: \\[").last.split("]").head
    assert(!pushed.contains("dt"), "dt must be a partition filter, not a data filter")
    val dataF = scanLine.split("DataFilters: \\[").last.split("]").head
    assert(dataF.trim.isEmpty, "no row-level dt filter should remain")
  }

  test("TPC-H Q19's disjunction pushes per-side derived filters into both scans") {
    val p = plan(RelationalOps.sqlQ19(spark, d))
    // Catalyst must extract a brand-only OR for the part scan and keep the
    // equi-join on p_partkey (hash join, not nested loop)
    assert(p.contains("Brand#12"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("TPC-H Q7 broadcasts every dimension; only the fact spine shuffles") {
    val p = plan(RelationalOps.sqlQ7(spark, d))
    // supplier, customer, and both nation roles ride broadcasts — the only
    // (non-broadcast) exchanges are the orders⋈lineitem spine + agg + sort
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    assert(countExchanges(RelationalOps.sqlQ7(spark, d)) <= 4)
  }

  test("TPC-H Q22's anti-join side scans only the recent orders slice") {
    val p = plan(RelationalOps.sqlQ22(spark, d))
    // the o_orderdate cutoff must reach the orders scan feeding the
    // left-anti join (at scale: the anti side is days, not history)
    val pushed = p.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("o_orderdate")).toSeq
    assert(pushed.exists(_.contains("GreaterThanOrEqual")), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("ssjoin verify join carries only longs; no text column past the scan") {
    val p = plan(graft.operators.Dedup.ssjoinPrefix(spark, d))
    // shingle text must be hashed at the scan; no string shingle survives
    // into any exchange (the plan shows only doc_id/g/m/df longs)
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchangeLines.contains("text"), exchangeLines)
  }

  // ---- round-6 additions ----------------------------------------------------

  test("weighted sample is a partial top-k, not a global sort") {
    val p = plan(graft.operators.Sampling.weightedSample(spark, d))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(countExchanges(graft.operators.Sampling.weightedSample(spark, d)) == 0, p)
  }

  test("cluster split shuffles once, on the 8-byte content hash") {
    val df = graft.operators.Sampling.clusterSplit(spark, d)
    // one window exchange by content_hash + the output sort
    assert(countExchanges(df) <= 2, plan(df))
    val exchangeLines = plan(df).linesIterator
      .filter(_.contains("hashpartitioning")).mkString("\n")
    assert(exchangeLines.contains("content_hash"), exchangeLines)
    assert(!exchangeLines.contains("text"), exchangeLines)
  }

  test("embed pooling: partial aggregation before the (group, dim) exchange") {
    val p = plan(graft.operators.Similarity.embedPool(spark, d))
    assert(p.contains("partial_sum") || p.contains("Partial"), p)
    // no array column crosses an exchange: triples only
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchangeLines.contains("embedding"), exchangeLines)
  }

  test("table checksum: map-side combined xor, 64-row shuffle grain") {
    val p = plan(LakeOps.tableChecksum(spark, d))
    assert(p.contains("partial_bit_xor") || p.contains("Partial"), p)
    assert(countExchanges(LakeOps.tableChecksum(spark, d)) <= 2, p)
  }

  test("url parse and html strip stay map-only (zero exchanges)") {
    assert(countExchanges(graft.operators.TextAnalysis.urlParse(spark, d)) == 0)
    // htmlStrip ends in an output orderBy — allow exactly that one exchange
    assert(countExchanges(graft.operators.TextAnalysis.htmlStrip(spark, d)) <= 1)
  }

  test("heavy hitters: candidates broadcast back onto the token scan") {
    val p = plan(graft.operators.TextAnalysis.heavyHitters(spark, d))
    assert(p.contains("BroadcastHashJoin"), p)
    // the MG sketch pass itself sits behind a localCheckpoint, so the
    // audited final plan reads it as an RDD scan rather than MapPartitions
    assert(p.contains("ExistingRDD") || p.contains("Scan"), p)
  }

  test("knn classify: holdout side broadcast, candidate scan never shuffles for similarity") {
    val p = plan(graft.operators.Similarity.knnClassify(spark, d))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dup spans: both window passes and the island agg share the doc_id exchange") {
    val p = plan(graft.operators.Dedup.dupSpans(spark, d))
    // expected wide ops: gram-shuffle agg (x2 branches may reuse), the
    // doc_id window exchange, final sort — but NO extra exchange between
    // the two windows or into the (doc_id, island) aggregation
    val windowIdx = p.linesIterator.zipWithIndex
      .filter(_._1.contains("Window")).map(_._2).toSeq
    assert(windowIdx.nonEmpty)
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(p).length === 1, p)
  }

  test("gini: one window exchange by nation, rank feeds the agg without re-shuffle") {
    val p = plan(TimeSeriesOps.gini(spark, d))
    assert("Exchange hashpartitioning\\(c_nationkey".r.findAllIn(p).length === 1, p)
  }

  test("acf: the pair build is broadcast joins over the pinned daily frame") {
    val p = plan(TimeSeriesOps.acf(spark, d))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("runtime bloom filter injects on the probe side of a selective shuffle join") {
    // The 100 TB lever this guards: a selective dimension filter becomes a
    // bloom filter evaluated on the FACT side BEFORE its shuffle, cutting
    // exchange bytes by the filter's selectivity. Local thresholds are
    // lowered to make the optimizer treat the fact scan as "large" (the
    // real default only engages past 10 GB — exactly the regime the
    // cluster runs in); broadcast is disabled so the join actually
    // shuffles, which is when the filter pays.
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "-1")
      val li = spark.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
      val ord = spark.read.parquet(s"$d/orders.parquet")
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_extendedprice")))
      val opt = q.queryExecution.optimizedPlan.toString
      // probe side gains might_contain(scalar-subquery ...) over a
      // bloom_filter_agg built from the filtered creation side
      assert(opt.contains("might_contain"), opt)
      assert(opt.contains("bloom_filter_agg"), opt)
      // and the filtered answer is unchanged by the injected filter
      assert(q.collect().length === 1)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("sentence chunking is map-only: one Generate, no exchange before the output sort") {
    val q = graft.operators.TextAnalysis.sentenceChunks(spark, d)
    val p = plan(q)
    assert(p.contains("Generate"), p.take(1500))
    // the ONLY exchange is the rangepartitioning for the final orderBy —
    // chunking itself never shuffles document text
    assert(countExchanges(q) === 1, p.take(1500))
    assert(p.contains("rangepartitioning"), p.take(1500))
  }

  test("bitmap distinct-count plans as two hash aggregations — raw values never reshuffle twice") {
    val q = graft.ops.RelationalOps.sqlBitmap(spark, d)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    // inner agg builds per-(group,bucket) bitmaps, outer agg sums counts;
    // no Expand, no distinct-expansion of the raw key domain
    assert(p.contains("bitmap_construct_agg") || p.contains("ObjectHashAggregate"), p.take(1500))
    assert(!p.contains("Expand"), "COUNT(DISTINCT) expansion crept in:\n" + p.take(1500))
  }

  test("target encoding broadcasts category stats; the fact side never re-shuffles") {
    val q = graft.operators.Sampling.targetEncode(spark, d)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    // the stats-side join back onto the fact scan must be broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  // AQE's executed-plan toString carries BOTH the final and initial trees
  // once an action has run — slice to the final section before counting
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("feature hashing shuffles once, on the (doc, bucket) agg after explode") {
    val p = finalPlan(graft.operators.TextAnalysis.featureHash(spark, d))
    assert("(?<!Broadcast)Exchange".r.findAllIn(p).length === 1, p.take(2000))
    assert(p.contains("Generate explode"), p.take(2000))
    // partial aggregation runs before the exchange (map-side combine caps
    // the shuffle at D rows per doc)
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("bootstrap replicas broadcast the rep spine; one B-row aggregation shuffle") {
    val p = finalPlan(graft.operators.Sampling.bootstrap(spark, d))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // fact scan → map → partial agg → ONE hash exchange at B-row grain
    // (the only other exchange is the B-row output sort)
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p.take(2000))
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("kcore supersteps semi-join the pinned base against node-sized survivor sets") {
    import org.apache.spark.sql.functions._
    // rebuild one real superstep input (the loop's plans are gone once
    // kcore returns) and audit the induced-edge join strategy
    val full = GraphOps.kcore(spark, d)
    assert(full.collect().nonEmpty)
    val pairs = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s")).distinct()
    val base = pairs.as("a").join(pairs.as("b"),
        col("a.ok") === col("b.ok") && col("a.s") =!= col("b.s"))
      .select(col("a.s").as("u"), col("b.s").as("v")).distinct()
      .localCheckpoint()
    val survivors = base.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .where(col("deg") >= GraphOps.KCoreK).select(col("u").as("node"))
      .localCheckpoint()
    val p = finalPlan(GraphOps.kcoreStep(base, survivors))
    // survivor sets are node-sized → AQE broadcasts the semi-joins
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("composed data pipeline: bounded exchanges, dedup rewritten to the argmin aggregate") {
    // under the extensions session the row_number()=1 dedup stage must
    // replan to the partial+final MinRowBy aggregate (no Window, no sort)
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val ext = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val q = graft.operators.TextAnalysis.dataPipeline(ext, d)
      q.collect() // finalize AQE
      // the AQE toString prints final AND initial plans — audit the final
      val p = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!p.contains("Window"), "dedup must not plan a Window:\n" + p.take(2000))
      assert(p.contains("min_row_by") || p.contains("MinRowBy") ||
        p.contains("ObjectHashAggregate"),
        "dedup must plan as the argmin aggregate:\n" + p.take(2000))
      // dedup argmin + countDistinct's two-phase rollup + the output
      // sort's range exchange = 4; anything more is a regression
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
      assert(exchanges <= 4, s"expected <= 4 non-broadcast exchanges, got $exchanges:\n" +
        p.take(2500))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("quality sweep scans documents ONCE: the served plan reads the " +
    "pinned bucket rollup, never a second corpus scan") {
    // the r19 shape crossJoin'd scored.agg(sum(w)) for the grand total,
    // re-deriving the full documents scan — 2× the dominant cost at
    // 100 TB. Now the total is a literal from the rollup's own stats
    // pass, so the final plan must contain NO file scan at all (the one
    // corpus scan happened inside the pinned pass at build time).
    val df = graft.operators.TextAnalysis.qualitySweep(spark, d)
    val p = plan(df)
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
      "a file scan in the served plan means the corpus is read twice:\n" +
        p.take(2000))
    assert(p.contains("ExistingRDD"), p.take(2000))
  }

  test("declarative SQL UDFs inline into the plan — no closure, codegen intact") {
    // CREATE FUNCTION bodies must resolve to ordinary expressions: the
    // aggregate over graft_net_units plans as a hash aggregate inside
    // whole-stage codegen with no UDF/eval-python barrier anywhere
    val q = graft.ops.RelationalOps.sqlCreateFunc(spark, d)
    q.collect() // finalize AQE so codegen spans are visible in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(plan.contains("*("), "no WholeStageCodegen span:\n" + plan.take(2000))
    assert(!plan.contains("UDF") && !plan.contains("BatchEval"),
      "SQL UDF must inline, not close over a function:\n" + plan.take(2000))
    // the table function plans as Generate (explode) feeding the join —
    // a derived relation, not a driver-side loop
    val tf = graft.ops.RelationalOps.sqlTableFunc(spark, d)
    val tfPlan = tf.queryExecution.executedPlan.toString
    assert(tfPlan.contains("Generate"), tfPlan.take(2000))
  }
}
