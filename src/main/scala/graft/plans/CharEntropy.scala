package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_entropy_q(text)` — Shannon character entropy (bits/char) quantized
  * to a 0.01 grid, as one codegen'd pass. Low entropy flags repetitive /
  * templated / degenerate text; with [[CompressionRatioExpr]] it's the
  * standard cheap quality-signal pair for corpus curation.
  *
  * Why an expression: the compositional form (explode chars → count per
  * (doc, char) → entropy agg) shuffles one ROW PER CHARACTER — at 100 TB
  * that's the corpus re-materialized ~1000×. This runs in the scan stage:
  * one byte-histogram pass per document, zero shuffles.
  *
  * Cross-engine determinism: H = (ln n − Σc·ln c ⁄ n) ⁄ ln 2 over exact
  * integer counts. The float sum's term order differs between engines
  * (hash-group order there, byte order here) and libm ln may differ by an
  * ulp — both effects are ~1e-13 relative, so the 0.01 output grid makes a
  * boundary hit measure-zero. Output is the quantized LONG — the raw
  * double never crosses the engine boundary. Empty text → 0 (convention:
  * no information). Counts are per UTF-8 BYTE (ASCII ⇒ per char; the
  * oracle's string_split is per char — the synthetic corpus is ASCII, and
  * byte-level is the right scale primitive anyway).
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy_q expects a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy_q"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharEntropy.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropy {

  /** floor(H_bits × 100); 0 for the empty string. */
  def eval(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var sum = 0.0
    var j = 0
    while (j < 256) {
      val c = counts(j)
      if (c > 0) sum += c * math.log(c.toDouble)
      j += 1
    }
    val h = (math.log(n.toDouble) - sum / n) / math.log(2.0)
    math.floor(h * 100.0).toLong
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy_q",
      exprs => CharEntropyExpr(exprs.head),
      "scala_udf")
}
