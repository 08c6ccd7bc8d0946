package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded per-group top-k as a `TypedImperativeAggregate`: keeps the k
  * input rows with the smallest `ordExpr` (struct of sort keys) in a
  * k-element max-heap keyed by ord, and evals to the retained `valueExpr`
  * structs as an array SORTED ascending by ord (rank order).
  *
  * The scale argument (the reason this exists next to the window form):
  * `row_number() OVER (...) <= k` sorts EVERY group's full row set on both
  * sides of the exchange; `TakeOrderedAndProject` only handles global
  * top-k. This aggregate is hash-based and mergeable — partial heaps of
  * size ≤ k combine map-side, so a group of 10⁸ rows ships k rows per
  * partition instead of 10⁸ through the shuffle, and no sort ever
  * materializes ([[MinRowBy]] is exactly the k=1 case; same binary-buffer
  * trick, so Catalyst plans ObjectHashAggregate).
  *
  * Contract mirrors [[MinRowBy]]: wrap sort keys in `struct(...)` so ord
  * itself is never NULL (field nulls compare nulls-first); ascending per
  * key — express "desc" by negating the key. Ties beyond the total order
  * keep first-seen (same contract as `row_number()` under a non-total
  * order); pass a tie-breaking key for full determinism.
  */
case class TopKRows(
    valueExpr: Expression,
    ordExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  require(k >= 1, s"topk_rows: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, ordExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(valueExpr = newChildren(0), ordExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)

  // containsNull tracks the value expression (a nullable value lands in
  // the array as-is); the aggregate itself yields an empty array — never
  // null — on a zero-row group (e.g. FILTER matching nothing), but the
  // SQL surface declares nullable so the optimizer cannot elide IsNull
  // checks a consumer writes defensively.
  override def dataType: DataType =
    ArrayType(valueExpr.dataType, containsNull = valueExpr.nullable)
  override def nullable: Boolean = true
  override def prettyName: String = "topk_rows"

  // instantiated executor-side AFTER binding to the input schema
  @transient private lazy val proj = UnsafeProjection.create(Seq(ordExpr, valueExpr))
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ordExpr.dataType)
  private def cmp(a: UnsafeRow, b: UnsafeRow): Int =
    ordering.compare(a.get(0, ordExpr.dataType), b.get(0, ordExpr.dataType))
  // max-heap on ord: the head is the WORST retained row, the eviction probe
  @transient private lazy val worstFirst = new java.util.Comparator[UnsafeRow] {
    override def compare(a: UnsafeRow, b: UnsafeRow): Int = -cmp(a, b)
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k, worstFirst)

  /** Admit an already-copied row the buffer may keep a reference to. */
  private def admit(buffer: java.util.PriorityQueue[UnsafeRow], row: UnsafeRow): Unit =
    if (buffer.size < k) buffer.add(row)
    else if (cmp(row, buffer.peek()) < 0) { buffer.poll(); buffer.add(row) }

  override def update(buffer: java.util.PriorityQueue[UnsafeRow],
      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    val pair = proj(input)
    // copy only if retained: full groups reject most rows allocation-free
    if (buffer.size < k || cmp(pair, buffer.peek()) < 0) admit(buffer, pair.copy())
    buffer
  }

  override def merge(buffer: java.util.PriorityQueue[UnsafeRow],
      other: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    val it = other.iterator()
    while (it.hasNext) admit(buffer, it.next()) // rows already owned copies
    buffer
  }

  override def eval(buffer: java.util.PriorityQueue[UnsafeRow]): Any = {
    val arr = buffer.toArray(new Array[UnsafeRow](buffer.size))
    java.util.Arrays.sort(arr, (a: UnsafeRow, b: UnsafeRow) => cmp(a, b))
    new GenericArrayData(arr.map(r =>
      InternalRow.copyValue(r.get(1, valueExpr.dataType))))
  }

  override def serialize(buffer: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buffer = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      buffer.add(row)
      i += 1
    }
    buffer
  }
}
