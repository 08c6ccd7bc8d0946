package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hex_hash60(s)` — the engine's cross-engine 60-bit md5 hash
  * ([[graft.functions.Hashing.hexHash]]) as ONE codegen'd expression.
  *
  * Value-identical to the four-expression chain it replaces,
  * `conv(substring(md5(s), 1, 15), 16, 10) :: long`: the first 15 hex
  * chars of an md5 digest ARE its top 60 bits, so the digest can be
  * bit-packed directly (same trick as
  * [[graft.functions.Hashing.hexHashBytes]] and
  * [[MinMd5Shingle.first60]]). The old chain paid, per row, on top of
  * the md5 itself: a 32-char hex formatting allocation (`md5` returns a
  * hex STRING), a substring copy, `conv`'s base-16 → base-10 digit loop
  * producing ANOTHER string, and a string→long cast parse. All of that
  * is dead weight — this expression digests the UTF-8 bytes and packs
  * the top 60 bits, allocating nothing but the digest buffer.
  * (Optimization-round measurement: see OPTIMIZATION_r21.md — the chain
  * cost ~2.4× the bare md5 on the hash-dominated queries.)
  *
  * Null/UTF-8 semantics match the chain exactly: null in → null out
  * (UnaryExpression default), and `cast(string as binary)` in the old
  * chain is the UTF-8 byte encoding, which is what `UTF8String.getBytes`
  * returns. Inputs are restricted to StringType — every call site hashes
  * strings (concat/cast-built canonical keys), matching the implicit
  * string→binary cast `md5` relied on.
  */
case class HexHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hex_hash60 expects a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hex_hash60"

  override protected def nullSafeEval(input: Any): Any =
    HexHash60.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HexHash60.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): HexHash60Expr =
    copy(child = newChild)
}

object HexHash60 {

  /** One MessageDigest per thread, reset by `digest()` itself — per-row
    * `getInstance` allocation was measurable at millions of rows. */
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Called from generated code. First 60 bits of md5(utf8 bytes) as a
    * non-negative long — bit-identical to
    * `Long.parseLong(hexDigest.substring(0, 15), 16)`. */
  def eval(s: UTF8String): Long = {
    val d = Md5.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
