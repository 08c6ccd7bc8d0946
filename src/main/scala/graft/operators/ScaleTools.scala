package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
