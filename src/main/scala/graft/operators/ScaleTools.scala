package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale join machinery the 100 TB deployment leans on: bucketed
  * co-located joins (no shuffle at query time) and salted joins for skewed
  * keys. Neither exists in the reference (its joins are ≤50-row daily
  * batches); both are what its operator graph needs at three orders of
  * magnitude more data.
  */
object ScaleTools {

  // ---- zone maps (file-level min/max data skipping) -------------------------

  /** Per-file min/max statistics for one long column — the manifest-level
    * zone map Delta/Iceberg keep, built here from the files themselves
    * (one map-only pass; on a real lakehouse you'd read the transaction
    * log instead and the pruning below is unchanged). Effective only when
    * the layout clusters the column — write with repartitionByRange on it,
    * the OPTIMIZE-by-sort-key discipline. */
  def zoneMap(spark: SparkSession, dir: String, column: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column)).as("zmin"), max(col(column)).as("zmax"),
        count(lit(1)).as("n_rows"))

  /** Range-predicate read that opens ONLY the files whose [zmin, zmax]
    * intersects [lo, hi] — manifest pruning expressed as a driver-side
    * file-list filter feeding an explicit-path scan. The residual filter
    * still applies (zone maps bound, they don't partition), so the result
    * is EXACTLY the full scan's; only I/O changes. Returns (pruned frame,
    * files opened, files total) so callers/specs can assert the skipping
    * actually happened. The zone map is stats-sized (one row per file):
    * collecting it to the driver is the same order of work every lakehouse
    * planner does per query. */
  def prunedRangeRead(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val zm = zoneMap(spark, dir, column).collect()
    val keep = zm.filter(r =>
      r.getAs[Long]("zmax") >= lo && r.getAs[Long]("zmin") <= hi)
      .map(_.getAs[String]("file"))
    val base =
      if (keep.isEmpty)
        spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
    (base.where(col(column) >= lo && col(column) <= hi), keep.length, zm.length)
  }

  /** Write a table bucketed (and sorted) by the join key. Pre-paying this
    * ONE shuffle at write time means every subsequent equi-join or
    * aggregation on `bucketCols` reads co-located, pre-sorted buckets —
    * no Exchange in the query plan. This is the batch-pipeline version of
    * the reference's date-partitioned zones, applied to join keys.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // idempotent across JVMs: a managed-table location can survive a
    // previous session whose catalog entry is gone — clear both
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Join two tables previously written with [[writeBucketed]] on the same
    * keys/bucket count: planner sees compatible output partitioning on both
    * sides and elides both exchanges (SortMergeJoin straight over buckets).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)

  /** Salted inner equi-join for skewed keys: the big (skewed) side gets a
    * deterministic per-row salt in [0, salts); the small side is replicated
    * once per salt value. The hot key's rows spread over `salts` reducers
    * instead of one straggler task. (AQE's skew-join handles moderate skew
    * automatically; explicit salting is for the pathological keys AQE's
    * split thresholds miss.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // salt derives from the whole row hash — deterministic, no RNG in the plan
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  // ---- exact global order without a single-partition window -----------------
  //
  // row_number()/ntile()/running aggregates OVER (ORDER BY ...) with no
  // PARTITION BY plan as ONE WindowExec partition — every row through a
  // single task, the canonical 100 TB scale-killer. These primitives compute
  // the SAME exact answers in two passes:
  //
  //   1. repartitionByRange on the sort key (the RangePartitioner pass every
  //      global sort already pays) + sortWithinPartitions, then pin the
  //      partitioning (localCheckpoint here; persist/checkpoint on a
  //      cluster — the pin is what lets the stats pass and the main pass
  //      read the SAME physical partitions).
  //   2. collect per-partition stats — one row PER PARTITION (planner-sized,
  //      the zoneMap discipline, never data-sized) — prefix-combine them on
  //      the driver, and broadcast the per-partition offsets back as a
  //      literal map keyed by partition id.
  //
  // Range partition i holds exactly the rows sorting before partition i+1,
  // so (offset of earlier partitions) + (local position) IS the global
  // position: bit-for-bit what the single-partition window returns, with the
  // widest stage bounded by one range partition. Local positions come free
  // from monotonically_increasing_id (partition id in the high 33 bits,
  // sequential local index in the low bits — stable once pinned); running
  // aggregates additionally use a window PARTITIONED BY the range-partition
  // id, so no unpartitioned WindowExec appears anywhere in the plan
  // (PlanAuditSpec lints the whole query surface for exactly that).

  private val MidCol = "__graft_mid"
  private def pidOf: Column = shiftright(col(MidCol), 33)
  private def localOf: Column = col(MidCol).bitwiseAND(lit((1L << 33) - 1))

  private def rangePin(df: DataFrame, sortExprs: Seq[Column], parts: Int): DataFrame = {
    val n = if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.repartitionByRange(n, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .withColumn(MidCol, monotonically_increasing_id())
      .localCheckpoint()
  }

  /** Literal bigint→bigint map — the broadcast vehicle for per-partition
    * offsets (≤ #partitions entries, so always plan-literal-sized). */
  private def litLongMap(entries: Seq[(Long, Long)]): Column =
    map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Exact global `row_number() OVER (ORDER BY sortExprs)` as `rankCol`
    * (1-based bigint), plus the total row count. The sort key must be a
    * total order (include a tie-break column) for the rank to be
    * well-defined — the same requirement the window form has. */
  def globalRankAndCount(df: DataFrame, sortExprs: Seq[Column],
      rankCol: String = "rank", parts: Int = 0): (DataFrame, Long) = {
    val pinned = rangePin(df, sortExprs, parts)
    val cnts = pinned.groupBy(pidOf.as("p")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = cnts.map { case (p, c) => val e = (p, acc); acc += c; e }
    val rank =
      if (offs.isEmpty) localOf + lit(1L)
      else element_at(litLongMap(offs.toIndexedSeq), pidOf) + localOf + lit(1L)
    (pinned.withColumn(rankCol, rank.cast("long")).drop(MidCol), acc)
  }

  def globalRank(df: DataFrame, sortExprs: Seq[Column], rankCol: String = "rank",
      parts: Int = 0): DataFrame =
    globalRankAndCount(df, sortExprs, rankCol, parts)._1

  /** Exact global `ntile(k) OVER (ORDER BY sortExprs)` as `binCol` (bigint).
    * SQL ntile semantics reconstructed from the exact global rank: with n
    * rows, the first n%k buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋ — pure
    * integer arithmetic on the rank, so the output is hash-identical to the
    * window form on both engines. */
  def globalNtile(df: DataFrame, sortExprs: Seq[Column], k: Int,
      binCol: String, parts: Int = 0): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    val (ranked, n) = globalRankAndCount(df, sortExprs, "__graft_rank", parts)
    val small = n / k
    val r = n % k
    val big = small + 1
    val cut = r * big
    val bin =
      if (small == 0) col("__graft_rank") // n <= k: each row its own bucket
      else when(col("__graft_rank") <= cut,
          floor((col("__graft_rank") - 1) / lit(big)) + 1)
        .otherwise(lit(r) + floor((col("__graft_rank") - lit(cut) - 1) / lit(small)) + 1)
    ranked.withColumn(binCol, bin.cast("long")).drop("__graft_rank")
  }

  /** Exact global rank AND inclusive running sums of each `(value, outCol)`
    * over the same total order (all bigint), plus the grand totals —
    * returned driver-side so callers never re-scan the input just to divide
    * by them. The running sums use a window PARTITIONED BY the
    * range-partition id (local prefix) plus the broadcast earlier-partition
    * totals; every value shares the one stats pass and the one local
    * window sort. */
  def globalRankPrefixSums(df: DataFrame, sortExprs: Seq[Column],
      values: Seq[(Column, String)], rankCol: String = "rank",
      parts: Int = 0): (DataFrame, Seq[Long]) = {
    import org.apache.spark.sql.expressions.Window
    val pinned = rangePin(df, sortExprs, parts)
    val aggs = count(lit(1)).as("c") +:
      values.zipWithIndex.map { case ((v, _), i) => sum(v).as(s"s$i") }
    val st = pinned.groupBy(pidOf.as("p")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        values.indices.map(i => if (r.isNullAt(i + 2)) 0L else r.getLong(i + 2))))
      .sortBy(_._1)
    var accC = 0L
    val accS = Array.fill(values.size)(0L)
    val offs = st.map { case (p, c, ss) =>
      val e = (p, accC, accS.toIndexedSeq)
      accC += c
      ss.zipWithIndex.foreach { case (s, i) => accS(i) += s }
      e }
    val rank =
      if (offs.isEmpty) localOf + lit(1L)
      else element_at(litLongMap(offs.map(o => (o._1, o._2)).toIndexedSeq), pidOf) +
        localOf + lit(1L)
    val wLoc = Window.partitionBy(pidOf).orderBy(sortExprs: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withRank = pinned.withColumn(rankCol, rank.cast("long"))
    val out = values.zipWithIndex.foldLeft(withRank) {
      case (acc, ((v, name), i)) =>
        val runOff =
          if (offs.isEmpty) lit(0L)
          else element_at(litLongMap(offs.map(o => (o._1, o._3(i))).toIndexedSeq), pidOf)
        acc.withColumn(name, (sum(v).over(wLoc) + runOff).cast("long"))
    }
    (out.drop(MidCol), accS.toIndexedSeq)
  }

  /** Single-value form of [[globalRankPrefixSums]]. */
  def globalRankPrefixSum(df: DataFrame, sortExprs: Seq[Column], value: Column,
      rankCol: String = "rank", runCol: String = "run",
      parts: Int = 0): (DataFrame, Long) = {
    val (out, tots) =
      globalRankPrefixSums(df, sortExprs, Seq((value, runCol)), rankCol, parts)
    (out, tots.head)
  }

  /** Exact `max(value) OVER (ORDER BY sortExprs ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` — the strict prefix max (null for the
    * first row), as `outCol`. Local strict prefix within each range
    * partition (window partitioned by partition id) combined with the
    * broadcast max over all strictly-earlier partitions. */
  def globalPrefixMax(df: DataFrame, sortExprs: Seq[Column], value: Column,
      outCol: String, parts: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pinned = rangePin(df, sortExprs, parts)
    val st = pinned.groupBy(pidOf.as("p")).agg(max(value).as("m"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    var run: Option[Long] = None
    val prev = st.flatMap { case (p, m) =>
      val e = run.map(v => (p, v))
      run = (run.toSeq ++ m.toSeq).reduceOption((a: Long, b: Long) => math.max(a, b))
      e }
    val wLoc = Window.partitionBy(pidOf).orderBy(sortExprs: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localPrev = max(value).over(wLoc)
    val partPrev =
      if (prev.isEmpty) lit(null).cast("long")
      else element_at(litLongMap(prev.toIndexedSeq), pidOf)
    // greatest() skips nulls (null only when BOTH are null — i.e. the very
    // first rows of the total order), exactly the window frame's semantics
    pinned.withColumn(outCol, greatest(localPrev, partPrev)).drop(MidCol)
  }

  /** Bloom-filter-accelerated incremental delta load (EXACT result): keep
    * source rows whose `key` is not in `existing`.
    *
    * At 100 TB the plain left-anti join shuffles the ENTIRE source on the
    * key; with a daily-delta workload almost every source row is new, so
    * almost all of that shuffle is wasted motion. Instead: build a bloom
    * filter over the existing keys once (executor-side partial sketches
    * merged on the driver, then broadcast — same physics as a broadcast
    * join's build side), prune the source map-side with it, and run the
    * exact anti-join ONLY on the rows the filter says might match — a
    * ~|existing|·(1+fpp) sliver of the source. Rows the filter rejects are
    * DEFINITELY new (bloom filters have no false negatives), so the union
    * below is exactly the anti-join's answer — the filter changes the plan,
    * never the semantics. This is the manual form of Spark's AQE runtime
    * row-level filtering, usable where that doesn't fire (non-join sinks,
    * cross-source deltas).
    *
    * PRECONDITION: `source` must be DETERMINISTIC across re-evaluation —
    * the plan fans it out into two branches (definitely-new + candidates),
    * so a source containing rand()/uuid() or reading a location that
    * changes between the two scans would break the union≡anti-join
    * equivalence (a row could land in both branches or neither).
    * `existing` is additionally probed a third time by the isEmpty guard.
    * For a non-deterministic or expensive source, `localCheckpoint()` (or
    * persist) it BEFORE calling — the same pinning discipline used for
    * shared self-join frontiers elsewhere in this repo (invariant:
    * exchange reuse does not fire across self-join branches).
    */
  /** @param expectedItems sizing hint for the filter; pass the (approximate)
    *        existing-key count to skip the extra count() job — at scale a
    *        metadata row count or a running estimate is enough, since the
    *        value only tunes fpp, never correctness. Default −1 = count. */
  def bloomDelta(source: DataFrame, key: String,
      existing: DataFrame, existingKey: String,
      fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val spark = source.sparkSession
    // long keys only: stat.bloomFilter inserts via the putLong path, and the
    // probe below must use the SAME hash path or the no-false-negative
    // guarantee (the entire correctness argument) silently breaks
    require(source.schema(key).dataType == org.apache.spark.sql.types.LongType &&
      existing.schema(existingKey).dataType == org.apache.spark.sql.types.LongType,
      s"bloomDelta requires bigint keys; got ${source.schema(key).dataType} / " +
        s"${existing.schema(existingKey).dataType}")
    // no non-null existing keys: everything is new — and stat.bloomFilter
    // NPEs when the aggregate saw zero items (BloomFilterAggregate.eval
    // returns null at cardinality 0, and it skips NULL inputs), so this is
    // a required guard for BOTH the empty frame and the all-NULL-keys
    // frame, not just a fast path (one cheap limit-1 job)
    if (existing.where(col(existingKey).isNotNull).isEmpty) return source
    val nExisting =
      if (expectedItems > 0) expectedItems else math.max(existing.count(), 1L)
    // Build with Catalyst's own BloomFilterAggregate and probe with the
    // codegen'd BloomFilterMightContain — the exact pair Spark's runtime
    // row-level filtering injects. The old form probed through a boxed
    // Scala udf((k: Long) => ...), paying per-row boxing + a codegen
    // barrier on precisely the 100 TB scan this utility targets. Clamps
    // mirror the runtime-filter conf ceilings (4M items / 64M bits);
    // beyond them the fpp degrades but semantics never change — the
    // filter is only ever a pruner.
    val nEff = math.min(nExisting, 4000000L)
    val numBits = math.min(
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(nEff, fpp),
      67108864L)
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bytes = existing
      .select(GraftSqlShim.column(new BloomFilterAggregate(
        GraftSqlShim.expression(col(existingKey)),
        Literal(nEff), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    val mightContain = GraftSqlShim.column(BloomFilterMightContain(
      Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
      GraftSqlShim.expression(col(key))))
    // NULL keys: a left-anti join KEEPS a null-keyed left row (null never
    // equals anything), so they route to the definitely-new branch — the
    // probe's null would otherwise drop them from BOTH branches
    val definitelyNew = source.where(col(key).isNull || !mightContain)
    val candidates = source.where(col(key).isNotNull && mightContain)
      .join(existing.select(col(existingKey).as(key)), Seq(key), "left_anti")
    definitelyNew.unionByName(candidates)
  }
}
