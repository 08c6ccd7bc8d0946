package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `min_md5_shingle(text)` — the minimum cross-engine 60-bit md5 hash
  * ([[graft.functions.Hashing.hexHash]]) over all word-3-gram shingles of a
  * string, as ONE codegen'd map-only expression.
  *
  * This collapses the fingerprinting pipeline shape
  * (posexplode tokens → window `lead` shingle assembly → per-shingle md5 →
  * hash-agg min → join back) into a single pass with NO shuffle at all:
  * the per-doc min needs no cross-row state, so pushing it inside one
  * expression removes the window exchange+sort and the aggregation exchange
  * entirely — at 100 TB the fingerprint runs at scan speed alongside any
  * other map-only signal.
  *
  * Unlike [[MinShingleHashExpr]] (rolling FNV, no SQL equivalent → rows-only
  * check), this keeps the md5-derived hash, so the DuckDB oracle reproduces
  * it exactly: semantics are IDENTICAL to
  * `min(hexHash(shingle)) GROUP BY doc` over [[graft.operators.Dedup]]'s
  * shingle rows (same `split(text, ' ')` tokenization — empty tokens kept —
  * same single-space shingle join, whole text when < 3 tokens).
  *
  * Reference citation: no equivalent exists in the reference (its only
  * hashing is Python md5 auth, spotify_api/auth.py:18-20); engine extension
  * per SURVEY §7.3 step 6.
  */
case class MinMd5ShingleExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_md5_shingle expects a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "min_md5_shingle"

  override protected def nullSafeEval(input: Any): Any =
    MinMd5Shingle.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinMd5Shingle.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): MinMd5ShingleExpr =
    copy(child = newChild)
}

object MinMd5Shingle {

  /** First 60 bits of an md5 digest as a non-negative long — bit-identical
    * to `Long.parseLong(hexDigest.substring(0, 15), 16)`
    * ([[graft.functions.Hashing.hexHashLocal]]): 15 hex chars are bytes 0-6
    * plus the high nibble of byte 7 = the big-endian first 8 bytes >>> 4. */
  private[plans] def first60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Called from generated code — a tight static loop, one MessageDigest
    * per input row (one row = one document), digests reused across its
    * shingles. */
  def eval(s: UTF8String): Long = {
    val str = s.toString
    val md = MessageDigest.getInstance("MD5")
    // limit -1: KEEP empty tokens, matching Spark's split(text, ' ')
    val toks = str.split(" ", -1)
    if (toks.length < 3)
      return first60(md.digest(str.getBytes("UTF-8")))
    var min = Long.MaxValue
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i + 2 < toks.length) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2))
      val h = first60(md.digest(sb.toString.getBytes("UTF-8")))
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Register as a SQL-callable temp function:
    * `expr("min_md5_shingle(text)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_md5_shingle",
      exprs => MinMd5ShingleExpr(exprs.head),
      "scala_udf")
}
