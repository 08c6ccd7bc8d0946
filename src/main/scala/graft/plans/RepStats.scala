package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rep_stats(text)` — the four exact within-document repetition counters
  * (token count, distinct tokens, bigram count, distinct bigrams) in ONE
  * tokenize pass per row (round-21 optimization, guide §1.2 step 1 + §4).
  *
  * Replaces q_repetition's compositional shape: `size(split)` +
  * `size(array_distinct(split))` on one branch plus a second full scan
  * through `posexplode` → `lead` window (hash exchange on doc_id) →
  * `countDistinct` (expand + second exchange) → left join. All four
  * numbers are per-document; nothing about them needs a shuffle.
  *
  * EXACT semantics match the replaced operators: tokens =
  * `split(text, ' ')` with empty tokens kept; distinct tokens by string
  * equality; bigrams = adjacent token pairs (n-1 of them); distinct
  * bigrams by pair equality — encoded as `tok(i) + " " + tok(i+1)`,
  * a bijection because split-on-space tokens contain no space.
  */
case class RepStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rep_stats expects a string argument, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_bigram_distinct", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepStats.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RepStats.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}

object RepStats {
  /** Called from generated code — one HashSet pass over the row's tokens. */
  def eval(s: UTF8String): GenericInternalRow = {
    val toks = s.toString.split(" ", -1) // limit -1: keep empty tokens
    val n = toks.length
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val nBigrams = math.max(n - 1, 0)
    val bigrams = new java.util.HashSet[String]()
    i = 0
    while (i < n - 1) {
      bigrams.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, distinct.size.toLong,
      nBigrams.toLong, bigrams.size.toLong))
  }

  /** Column builder (no registry needed — used from plan-building code). */
  def repStats(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(
      RepStatsExpr(org.apache.spark.sql.GraftSqlShim.expression(c)))
}
