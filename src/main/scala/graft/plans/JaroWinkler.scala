package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler(a, b)` — Jaro-Winkler string similarity as one codegen'd
  * expression. Spark has no built-in (levenshtein is its only edit
  * similarity); record-linkage blocking wants the gold-standard name
  * comparator, so this fills the gap as a native primitive that
  * whole-stage codegen inlines — no UDF fence, no boxing.
  *
  * Semantics are pinned to the de-facto-standard implementation family
  * (the RapidFuzz/Winkler lineage DuckDB also ships, which is how the
  * oracle checks it): match window ⌊max(|a|,|b|)/2⌋−1 clamped to ≥ 0,
  * transpositions = ⌊mismatched-matched-positions/2⌋ (INTEGER halving),
  * similarity 0 when either side is empty or no character matches, and
  * the Winkler boost p·0.1·(1−jaro) with prefix p ≤ 4 applied only when
  * jaro > 0.7. The final double is assembled in the same operation order
  * as that implementation ((m/|a| + m/|b| + (m−t)/m)/3, then
  * jaro + p·0.1·(1−jaro)), so results are bit-identical to the oracle's,
  * not merely close (JaroWinklerSpec pins probed literal values).
  *
  * O(|a|·window) time, two small boolean scratch arrays — scan-speed for
  * name-length strings; comparisons are on UTF-16 code units (≡ bytes ≡
  * code points on the ASCII data this engine processes).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.eval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinkler.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def eval(a: UTF8String, b: UTF8String): Double = sim(a.toString, b.toString)

  def sim(s: String, t: String): Double = {
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val bound = math.max(math.max(la, lb) / 2 - 1, 0)
    val flaggedS = new Array[Boolean](la)
    val flaggedT = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + bound)
      var j = math.max(0, i - bound)
      var found = false
      while (j <= hi && !found) {
        if (!flaggedT(j) && t.charAt(j) == s.charAt(i)) {
          flaggedT(j) = true
          flaggedS(i) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var tr = 0
    var k = 0
    var ii = 0
    while (ii < la) {
      if (flaggedS(ii)) {
        while (!flaggedT(k)) k += 1
        if (s.charAt(ii) != t.charAt(k)) tr += 1
        k += 1
      }
      ii += 1
    }
    val trHalf = tr / 2
    val jaro =
      (m.toDouble / la + m.toDouble / lb + (m - trHalf).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val maxPref = math.min(math.min(la, lb), 4)
      var p = 0
      while (p < maxPref && s.charAt(p) == t.charAt(p)) p += 1
      jaro + p.toDouble * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => JaroWinklerExpr(exprs(0), exprs(1)),
      "scala_udf")
}
