package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Whole-row argmin as a `TypedImperativeAggregate`: keeps the `valueExpr`
  * (a struct of the full row) of the input whose `ordExpr` (a struct of the
  * sort keys) is smallest — largest when `reverse` — in a single-row binary
  * buffer.
  *
  * This is the aggregation engine behind [[RowNumberDedupRule]]. The
  * built-in `min_by` is declarative but its struct-typed buffer is not
  * mutable-buffer-compatible, so Catalyst plans it as a SORT aggregate
  * (re-introducing the very sort the rewrite wants to kill); a
  * TypedImperativeAggregate with a binary buffer plans as
  * `ObjectHashAggregate` — hash-based, partial/final mergeable, no sort on
  * either side of the exchange.
  *
  * Buffer = one copied UnsafeRow `(ord, value)`; update compares orderings
  * and copies only on improvement, so a group of 10⁸ rows holds O(row
  * width) state and allocates only on new minima. Contract (enforced by
  * the rule, not here): `ordExpr` never evaluates to NULL (wrap sort keys
  * in a struct — field nulls are fine and compare nulls-first), and the
  * caller wants asc-nulls-first per key (or desc-nulls-last with
  * `reverse`), which is exactly Spark's struct ordering (or its reverse).
  * Ties keep the first-seen row — same nondeterminism contract as
  * `row_number()` under a non-total order.
  */
case class MinRowBy(
    valueExpr: Expression,
    ordExpr: Expression,
    reverse: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UnsafeRow] {

  override def children: Seq[Expression] = Seq(valueExpr, ordExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinRowBy =
    copy(valueExpr = newChildren(0), ordExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): MinRowBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinRowBy =
    copy(inputAggBufferOffset = newOffset)

  // A zero-row group (aggregate FILTER matching nothing, or a global
  // aggregate over an empty frame) leaves the buffer null and eval
  // returns null — the declared type must say so, or the optimizer may
  // drop IsNull checks on the result. RowNumberDedupRule call sites
  // always have >= 1 row per group, so this is a pure widening there.
  override def dataType: DataType = valueExpr.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "min_row_by"

  // instantiated executor-side AFTER the aggregation operator has bound
  // this function's expressions to the input schema
  @transient private lazy val proj = UnsafeProjection.create(Seq(ordExpr, valueExpr))
  @transient private lazy val ordering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(ordExpr.dataType)
    if (reverse) base.reverse else base
  }
  private def ordOf(pair: UnsafeRow): Any = pair.get(0, ordExpr.dataType)

  override def createAggregationBuffer(): UnsafeRow = null

  override def update(buffer: UnsafeRow, input: InternalRow): UnsafeRow = {
    val pair = proj(input)
    if (buffer == null || ordering.compare(ordOf(pair), ordOf(buffer)) < 0) pair.copy()
    else buffer
  }

  override def merge(buffer: UnsafeRow, other: UnsafeRow): UnsafeRow =
    if (buffer == null) other
    else if (other == null) buffer
    else if (ordering.compare(ordOf(other), ordOf(buffer)) < 0) other
    else buffer

  override def eval(buffer: UnsafeRow): Any =
    if (buffer == null) null
    else InternalRow.copyValue(buffer.get(1, valueExpr.dataType))

  override def serialize(buffer: UnsafeRow): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else buffer.getBytes

  override def deserialize(bytes: Array[Byte]): UnsafeRow =
    if (bytes.isEmpty) null
    else {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      row
    }
}
