package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `ZOrderExpr(cols, boundaries)` — the interleaved-bit space-filling-curve
  * key behind `OPTIMIZE ... zorder_by`. Each input column is first mapped
  * to a rank bucket by binary search over its pre-computed quantile
  * boundaries (skew-robust: equi-POPULATED buckets, not equi-width), then
  * the bucket ids' bits are interleaved LSB-first so the resulting long
  * orders rows along a Z-curve — rows close in EVERY dimension land close
  * in the one-dimensional sort.
  *
  * Why this shape at 100 TB: a lexicographic `sort_by(a, b)` gives file
  * min/max zone maps selectivity on `a` only — a predicate on `b` alone
  * still opens every file. Z-ordering bounds BOTH dimensions per file, so
  * the same `_STATS` pruning answers either-column predicates; this is the
  * standard lakehouse multi-dimensional clustering (Delta OPTIMIZE ZORDER
  * BY, Iceberg rewrite with zorder strategy) built from two passes: one
  * approx-quantile scan for boundaries, one write clustered by this key.
  *
  * The key is LAYOUT-ONLY: query answers never depend on it, so quantile
  * approximation error or boundary ties cannot affect correctness — only
  * how tight the per-file bounds come out. Nulls sort as bucket 0 (first),
  * matching NULLS FIRST ascending file placement. Buckets use `bits` bits
  * per column; callers must keep `cols.length * bits <= 63`.
  */
case class ZOrderExpr(children: Seq[Expression], boundaries: Seq[Array[Long]],
    bits: Int) extends Expression {

  require(children.nonEmpty && children.length == boundaries.length,
    "zorder: one boundary array per column")
  require(children.length * bits <= 63,
    s"zorder: ${children.length} cols x $bits bits exceeds a long")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder expects integral columns, got ${children.map(_.dataType)}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "zorder_key"

  override def eval(input: InternalRow): Any = {
    val k = children.length
    val zb = new Array[Int](k)
    var j = 0
    while (j < k) {
      val v = children(j).eval(input)
      zb(j) =
        if (v == null) 0
        else ZOrder.bucket(v.asInstanceOf[Number].longValue, boundaries(j), bits)
      j += 1
    }
    ZOrder.interleave(zb, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.length
    val zb = ctx.freshName("zbuckets")
    val boundRefs = boundaries.map(b =>
      ctx.addReferenceObj("zorderBounds", b, "long[]"))
    val evals = children.map(_.genCode(ctx))
    val perChild = evals.zip(boundRefs).zipWithIndex.map {
      case ((e, bref), j) =>
        s"""${e.code}
           |$zb[$j] = ${e.isNull} ? 0
           |  : graft.plans.ZOrder.bucket((long) ${e.value}, $bref, $bits);""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(
          s"""
             |int[] $zb = new int[$k];
             |$perChild
             |long ${ev.value} = graft.plans.ZOrder.interleave($zb, $bits);
             |""".stripMargin)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderExpr =
    copy(children = newChildren)
}

object ZOrder {

  /** Rank bucket of `v` among sorted `bounds` (the interior quantile
    * boundaries), RESCALED to fill [0, 2^bits): when a column has fewer
    * distinct boundaries than 2^bits (ties collapsed by `distinct`), raw
    * ranks would occupy only the low corner of the curve's space and the
    * equal-count range split would cut z-intervals mid-tile — spreading
    * the ranks across the full range keeps z uniform along the curve, so
    * file splits approximate axis-aligned tiles in every dimension. */
  def bucket(v: Long, bounds: Array[Long], bits: Int): Int = {
    val i = java.util.Arrays.binarySearch(bounds, v)
    val rank =
      if (i >= 0) {
        // land ties on the upper side so equal keys share one bucket
        var j = i
        while (j + 1 < bounds.length && bounds(j + 1) == v) j += 1
        j + 1
      } else -i - 1
    ((rank.toLong << bits) / (bounds.length + 1)).toInt
  }

  /** LSB-first bit interleave: bucket j contributes bit b at position
    * b*k + j. Equal-significance bits from every dimension stay adjacent,
    * which is what makes the curve locality-preserving in all dims. */
  def interleave(buckets: Array[Int], bits: Int): Long = {
    val k = buckets.length
    var z = 0L
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < k) {
        z |= ((buckets(j) >> b) & 1L) << (b * k + j)
        j += 1
      }
      b += 1
    }
    z
  }
}
