package graft.operators

import org.apache.spark.sql.functions.when

import graft.SparkSpec

class ScaleToolsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("bucketed join elides both exchanges (co-located SortMergeJoin)") {
    val spark2 = spark
    import spark2.implicits._
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val o  = spark.read.parquet(s"$d/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    ScaleTools.writeBucketed(li.select($"l_orderkey", $"l_quantity"), "li_b",
      Seq("l_orderkey"), 8)
    ScaleTools.writeBucketed(o.select($"l_orderkey", $"o_totalprice"), "o_b",
      Seq("l_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ScaleTools.bucketedJoin(spark, "li_b", "o_b", Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // result matches the plain join
      val expected = li.join(o, Seq("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("point lookup on the bucket key prunes to a subset of buckets") {
    val spark2 = spark
    import spark2.implicits._
    val o = spark.read.parquet(s"$d/orders.parquet")
    ScaleTools.writeBucketed(
      o.select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      "o_bkt_prune", Seq("o_custkey"), 16)
    // without a bucketing-exploiting join/agg in the plan, the planner
    // auto-demotes the bucketed scan to a plain file scan — which also
    // forfeits bucket pruning; pin the bucketed read for keyed lookups
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val lookup = spark.table("o_bkt_prune")
      .where($"o_custkey".isin(7L, 77L, 777L))
    val plan = lookup.queryExecution.executedPlan.toString
    // the scan must report bucket pruning: ≤3 of the 16 buckets opened
    val sel = "SelectedBucketsCount: (\\d+) out of 16".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"scan must prune buckets:\n$plan")
    assert(sel.get.group(1).toInt <= 3, plan)
    // and pruning must not change the answer
    val expected = o.where($"o_custkey".isin(7L, 77L, 777L)).count()
    assert(lookup.count() === expected)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // The runtime half of the skew story (the planned half is saltedJoin):
    // one key holding ~90% of the left side, AQE thresholds lowered so the
    // small fixture trips them, broadcast disabled so the join shuffles.
    // After execution the ADAPTIVE final plan must mark the join skew=true
    // — proof the engine splits the hot partition into parallel tasks
    // instead of serializing on one straggler.
    val spark2 = spark
    import spark2.implicits._
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"),
      "spark.sql.shuffle.partitions" ->
        spark.conf.get("spark.sql.shuffle.partitions", "4"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // wide shuffle so the skewed partition dwarfs the median (factor ≥ 5)
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      // 90% of the left side lands on key 7
      val left = spark.range(50000)
        .select(when($"id" % 10 =!= 0, 7L).otherwise($"id").as("k"),
          ($"id" * 3).as("payload"))
      val right = spark.range(2000).select($"id".as("k"), ($"id" + 1).as("r"))
      val joined = left.join(right, "k")
      // drive THIS queryExecution (a df.count() would spawn a separate
      // execution and leave this plan unexecuted / non-final)
      // k=7: the 45000 non-multiples of 10 (incl. id=7), right has k=7
      // once; kept-key matches are the multiples of 10 below 2000 → 200
      assert(joined.queryExecution.toRdd.count() === 45000L + 200L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must flag the skewed join:\n$finalPlan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bloom delta equals the plain left-anti join exactly") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val existing = spark.read.parquet(s"$d/orders.parquet")
      .where(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      .select("o_orderkey")
    val plain = li.join(
      existing.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_anti")
    val bloom = ScaleTools.bloomDelta(li, "l_orderkey", existing, "o_orderkey")
    assert(bloom.count() === plain.count())
    // exact multiset equality, not just counts
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
    // the probe is Catalyst's codegen'd might_contain, not a boxed UDF —
    // the scan-side filter must stay inside whole-stage codegen
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(!plan.contains("UDF"), "probe regressed to a Scala UDF:\n" + plan.take(2000))
  }

  test("bloom delta with an empty existing side returns the full source") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
    val empty = spark.read.parquet(s"$d/orders.parquet")
      .where(org.apache.spark.sql.functions.lit(false))
      .select("o_orderkey")
    val out = ScaleTools.bloomDelta(li, "l_orderkey", empty, "o_orderkey")
    assert(out.count() === li.count())
  }

  test("bloom delta rejects non-bigint keys up front") {
    val o = spark.read.parquet(s"$d/orders.parquet")
    intercept[IllegalArgumentException] {
      ScaleTools.bloomDelta(
        o.select("o_orderstatus"), "o_orderstatus",
        o.select("o_orderpriority"), "o_orderpriority")
    }
  }

  test("salted join preserves inner equi-join semantics") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = ScaleTools.saltedJoin(li, o, "l_orderkey", salts = 7)
    assert(salted.count() === plain.count())
    assert(salted.columns.toSet === plain.columns.toSet)
    // spot check: same row multiset on a projection
    val a = salted.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    val b = plain.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("zone-map pruned read skips files and still returns the exact answer") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_zonemap_li").getAbsolutePath
    // range-clustered layout: the discipline that makes zone maps bite
    spark.read.parquet(s"$d/lineitem.parquet")
      .repartitionByRange(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(dir)
    val zm = ScaleTools.zoneMap(spark, dir, "l_orderkey").collect()
    assert(zm.length === 8)
    val maxKey = zm.map(_.getAs[Long]("zmax")).max
    val (lo, hi) = (maxKey / 2, maxKey / 2 + maxKey / 10)
    val (pruned, opened, total) =
      ScaleTools.prunedRangeRead(spark, dir, "l_orderkey", lo, hi)
    assert(opened < total, "a clustered layout must let the range skip files")
    val full = spark.read.parquet(dir)
      .where(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
    assert(pruned.count() === full.count())
    assert(pruned.agg(sum(col("l_quantity"))).head.getDouble(0) ===
      full.agg(sum(col("l_quantity"))).head.getDouble(0))
    // empty intersection degrades to an empty frame, not an error
    val (none, openedNone, _) =
      ScaleTools.prunedRangeRead(spark, dir, "l_orderkey", maxKey + 10, maxKey + 20)
    assert(openedNone === 0 && none.count() === 0L)
  }

  // ---- two-pass exact global order (round 20) -----------------------------
  // every primitive is checked against the single-partition window it
  // replaces, on shapes chosen to cross partition boundaries: duplicate
  // sort keys (must not straddle), descending orders, n < k ntile, empty
  // input, nulls in the prefix-max value

  test("globalRank equals row_number() over the same total order " +
    "(duplicate keys, desc order, many partitions)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 997).select(
      col("id"), (col("id") % 13).as("k"), (col("id") % 7).as("t"))
    val sort = Seq(col("k").desc, col("id").asc)
    val got = ScaleTools.globalRank(df, sort, "r", parts = 9)
      .select(col("id"), col("r"))
    val want = df.select(col("id"),
      row_number().over(Window.orderBy(sort: _*)).cast("long").as("r"))
    assert(got.orderBy("id").collect().toSeq ===
      want.orderBy("id").collect().toSeq)
    // empty input: no rows, no error
    assert(ScaleTools.globalRank(df.where(lit(false)), sort, "r").count() === 0L)
  }

  test("globalNtile equals ntile() for k < n, k dividing n, and k > n") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 100).select(col("id"), (col("id") % 11).as("k"))
    val sort = Seq(col("k").asc, col("id").asc)
    for (k <- Seq(1, 4, 7, 100, 250)) {
      val got = ScaleTools.globalNtile(df, sort, k, "b", parts = 6)
        .select(col("id"), col("b"))
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy(sort: _*)).cast("long").as("b"))
      assert(got.orderBy("id").collect().toSeq ===
        want.orderBy("id").collect().toSeq, s"k=$k")
    }
  }

  test("globalRankPrefixSums equals running sums over the total order; " +
    "totals are the grand sums") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 500).select(
      col("id"), (col("id") * 3 % 17).as("v"), (col("id") % 5).as("w"))
    val sort = Seq(col("v").desc, col("id").asc)
    val (got, tots) = ScaleTools.globalRankPrefixSums(df, sort,
      Seq((col("v"), "rv"), (col("w"), "rw")), "r", parts = 7)
    val w = Window.orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.select(col("id"),
      row_number().over(Window.orderBy(sort: _*)).cast("long").as("r"),
      sum(col("v")).over(w).cast("long").as("rv"),
      sum(col("w")).over(w).cast("long").as("rw"))
    assert(got.select("id", "r", "rv", "rw").orderBy("id").collect().toSeq ===
      want.orderBy("id").collect().toSeq)
    assert(tots === Seq(
      df.agg(sum("v")).head.getLong(0), df.agg(sum("w")).head.getLong(0)))
  }

  test("globalPrefixMax equals the strict prefix max (null for the " +
    "leading rows, null values skipped)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 300).select(col("id"),
      when(col("id") % 9 === 0, lit(null).cast("long"))
        .otherwise(col("id") * 7 % 23).as("v"))
    val sort = Seq(col("id").desc)
    val got = ScaleTools.globalPrefixMax(df, sort, col("v"), "pm", parts = 5)
      .select(col("id"), col("pm"))
    val w = Window.orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.select(col("id"), max(col("v")).over(w).as("pm"))
    assert(got.orderBy("id").collect().toSeq ===
      want.orderBy("id").collect().toSeq)
  }
}
