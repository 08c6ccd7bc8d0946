package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_kgram_hashes(text, k)` — the cross-engine 60-bit md5 hash
  * ([[graft.functions.Hashing.hexHash]]) of every POSITIONAL word-k-gram,
  * in document order, as one array in one pass (round-21 optimization,
  * guide §4: per-row expression cost).
  *
  * Replaces the compositional shape the substring-dedup family used:
  * `posexplode(transform(sequence(1, n-k+1), i -> array_join(slice(
  * split(text,' '), i, k), ' ')))` + `hexHash` per gram. That chain is
  * interpreted (Spark HOFs don't codegen), re-evaluates `split` per
  * lambda, allocates a gram STRING per position, and then pays the
  * md5-chain per gram. This expression tokenizes once, assembles each
  * k-gram in a reused StringBuilder, and bit-packs the digest directly.
  *
  * Semantics are IDENTICAL to the HOF chain (DedupSpec/WinnowSpec lock
  * the consumers; HashingSpec locks the hash): `split(text, ' ')` with
  * empty tokens KEPT, single-space join, and docs with fewer than k
  * tokens yield an EMPTY array (`slice(..., 1, 0)` in the old spelling).
  * Array index+1 = the 1-based gram position the consumers expose.
  *
  * Unlike [[WordShingleHashesExpr]] (k=3, DISTINCT, whole-text fallback
  * for short docs — MinHash set semantics), this keeps every position:
  * the span/winnow family is positional, not set-valued.
  */
case class WordKgramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"word_kgram_hashes needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_kgram_hashes expects a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_kgram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordKgramHashes.eval(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordKgramHashes.eval($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordKgramHashesExpr =
    copy(child = newChild)
}

object WordKgramHashes {

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Called from generated code — one thread-local MessageDigest, one
    * StringBuilder, reused across the row's grams. */
  def eval(s: UTF8String, k: Int): GenericArrayData = {
    val toks = s.toString.split(" ", -1) // limit -1: keep empty tokens
    val n = toks.length - k + 1
    if (n <= 0) return Empty
    val md = Md5.get()
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = MinMd5Shingle.first60(md.digest(sb.toString.getBytes("UTF-8")))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder (no registry needed — used from plan-building code). */
  def kgramHashes(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(
      WordKgramHashesExpr(org.apache.spark.sql.GraftSqlShim.expression(c), k))
}
