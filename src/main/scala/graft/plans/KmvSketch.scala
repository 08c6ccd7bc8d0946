package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate`: keeps the k smallest DISTINCT hash values
  * seen per group and evals to them as an ascending `array<bigint>`.
  *
  * The estimator (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM 2002): with hashes uniform on [0, M), the k-th
  * smallest distinct hash h_k estimates the distinct count as
  * (k−1)·M / h_k; when fewer than k distinct hashes exist the sketch IS
  * the distinct set and the count is exact. Unlike HLL the sketch also
  * supports SET OPERATIONS: merging two sketches gives the sketch of the
  * union, and the fraction of the merged k-mins present in both input
  * sketches estimates Jaccard — so union/intersection sizes compose from
  * per-corpus sketches without re-reading either corpus.
  *
  * The scale argument: `COUNT(DISTINCT x)` shuffles every distinct value;
  * `approx_count_distinct` is mergeable but its HLL register layout is
  * engine-internal (not oracle-checkable, no set algebra). This sketch is
  * hash-based and map-side mergeable — each partition ships ≤ k longs —
  * and, because the repo's cross-engine hash ([[graft.functions.Hashing]])
  * is deterministic, the ENTIRE sketch and its estimates are
  * bit-reproducible in another engine: the oracle recomputes the same k
  * minima with a window function. Determinism also makes estimates
  * rerun- and partitioning-stable, which approx_count_distinct is not
  * across engines.
  *
  * Contract: `child` must be LongType (hash the value first — the sketch
  * never sees raw data, so wide strings don't cross the shuffle); nulls
  * are skipped (SQL COUNT(DISTINCT) semantics); duplicates are absorbed
  * by the distinct set, so pre-deduplication (and its shuffle) is never
  * needed — this is why [[TopKRows]] (which retains duplicates) cannot
  * express KMV. Binary buffer → Catalyst plans ObjectHashAggregate,
  * partial+final, no sort.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv_sketch: k must be >= 2, got $k")

  // type check deferred to analysis: at construction the child may still
  // be an unresolved attribute (dataType would lie or throw)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch: input must be BIGINT (hash first), got ${child.dataType}")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  // empty group → empty array, never null; declared nullable so the
  // optimizer keeps defensive IsNull checks (house TopKRows convention)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def admit(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }           // add() dedups
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) admit(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) admit(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}
