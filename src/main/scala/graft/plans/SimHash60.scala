package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash60(text)` — the 60-bit SimHash of a document's distinct-token
  * set, in ONE map-only pass: per distinct token, the cross-engine md5 hash
  * ([[graft.functions.Hashing.hexHash]]); per bit, a ±1 majority vote;
  * bits with positive vote pack into a long.
  *
  * Why an expression: the compositional scale form exploded distinct
  * tokens to rows and ran SIXTY conditional sums in a hash aggregation —
  * correct and codegen'd, but it shuffles a token row per (doc, token) and
  * pays a 60-column aggregation buffer, all to compute a value that needs
  * no cross-row state. This pass hashes each distinct token once and keeps
  * 60 counters on the stack; the signature exits the scan as 8 bytes.
  *
  * Bit-identical to [[graft.operators.Dedup.simhashCol]] (the executable
  * HOF spec — same tokenizer `split(text, ' ')`, same distinct-set,
  * same majority rule; votes are order-independent) and to the DuckDB
  * oracle built from the same formula.
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash60.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}

object SimHash60 {

  val Bits = 60

  /** Called from generated code — one MessageDigest and one counter array
    * per row. */
  def eval(s: UTF8String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val toks = s.toString.split(" ", -1) // keep empty tokens (Spark split)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val h = MinMd5Shingle.first60(md.digest(t.getBytes("UTF-8")))
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** Register as a SQL-callable temp function: `expr("simhash60(text)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60",
      exprs => SimHash60Expr(exprs.head),
      "scala_udf")
}
