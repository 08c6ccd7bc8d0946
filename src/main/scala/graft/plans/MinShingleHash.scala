package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `min_shingle_hash(text, k)` — the minimum 64-bit polynomial rolling hash
  * over all k-byte windows of a string, in ONE pass and O(1) extra memory.
  *
  * This is the document-fingerprinting hot path done natively: the
  * composable equivalent (`array_min(transform(shingles(text), hash))`)
  * materializes every shingle string and hashes each from scratch —
  * O(n·k) bytes touched plus array allocation; this expression touches each
  * byte once (classic Rabin-Karp rolling update) and allocates nothing.
  * At 100 TB of text that difference is the scan bottleneck.
  *
  * Codegen: the generated code calls the static [[MinShingleHash.eval]]
  * (a tight JIT-friendly loop), staying inside whole-stage codegen — no
  * fallback to interpreted evaluation.
  *
  * Reference citation: the reference has no equivalent operator (its only
  * hashing is Python md5 auth, spotify_api/auth.py:18-20); this extends the
  * engine per the build plan (SURVEY §7.3 step 6).
  */
case class MinShingleHashExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_shingle_hash expects a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "min_shingle_hash"

  override protected def nullSafeEval(input: Any): Any =
    MinShingleHash.eval(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinShingleHash.eval($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinShingleHashExpr =
    copy(child = newChild)
}

object MinShingleHash {
  /** Rabin-Karp base (odd, large) — multiplications wrap mod 2^64. */
  private final val B = 0x100000001b3L // FNV prime, good avalanche as a base

  /** One-pass minimum rolling hash over k-byte windows. Called from
    * generated code — must stay a simple static method. */
  def eval(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val kk = math.min(k, n)
    // B^(k-1) for the remove-leading-byte step
    var bk = 1L
    var i = 1
    while (i < kk) { bk *= B; i += 1 }
    // first window
    var h = 0L
    i = 0
    while (i < kk) { h = h * B + (bytes(i) & 0xff); i += 1 }
    var min = h
    // roll
    i = kk
    while (i < n) {
      h = (h - (bytes(i - kk) & 0xff) * bk) * B + (bytes(i) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Register as a SQL-callable temp function on the session:
    * `expr("min_shingle_hash(text, 9)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_shingle_hash",
      { exprs =>
        val k = exprs(1) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"min_shingle_hash: k must be an integer literal, got $other")
        }
        MinShingleHashExpr(exprs.head, k)
      },
      "scala_udf")
}
