package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngram_codes(text)` — the DISTINCT 24-bit-packed character 3-grams
  * of a string (byte₁·2¹⁶ + byte₂·2⁸ + byte₃) as one array, in ONE O(n)
  * pass (set semantics: n-gram Jaccard is a set measure, and deduping
  * inside the expression deletes the downstream dropDuplicates EXCHANGE —
  * per-doc sets never need cross-row state).
  *
  * Why an expression: the compositional form
  * (`explode(positions) → substr(text, p, …)`) is O(n²) PER DOCUMENT —
  * `UTF8String` substring must scan from the start of the string for every
  * position to honor UTF-8 char boundaries. Measured at sf0.1 that scan was
  * 5.7 s of q_ngram_jaccard's 7 s (the join everyone would suspect was
  * 1.5 s). This expression walks the byte array once.
  *
  * Byte-level packing equals the oracle's `ascii()`-codepoint packing on
  * the ASCII corpus (byte = codepoint). Texts shorter than 3 chars yield a
  * single element packing their 0-2 bytes with trailing zeros — unreachable
  * by real 3-grams (no NUL bytes in text), so no cross-collisions.
  *
  * Reference citation: no equivalent in the reference; engine extension per
  * SURVEY §7.3 step 6.
  */
case class CharNgramCodesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_codes expects a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_ngram_codes"

  override protected def nullSafeEval(input: Any): Any =
    CharNgrams.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharNgrams.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramCodesExpr =
    copy(child = newChild)
}

object CharNgrams {

  /** One-pass distinct packed 3-gram extraction; called from generated
    * code. Insertion-ordered set → deterministic array per input. */
  def eval(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    if (n < 3) {
      val code = (if (n >= 1) (b(0) & 0xff) << 16 else 0) |
        (if (n >= 2) (b(1) & 0xff) << 8 else 0)
      new GenericArrayData(Array[Any](code))
    } else {
      val seen = new java.util.LinkedHashSet[Integer](n * 2)
      var i = 0
      while (i <= n - 3) {
        seen.add(((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next().intValue(); j += 1 }
      new GenericArrayData(out)
    }
  }

  /** Register as a SQL-callable temp function:
    * `expr("char_ngram_codes(text)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngram_codes",
      exprs => CharNgramCodesExpr(exprs.head),
      "scala_udf")
}
