package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `cosine_sim(a, b)` — cosine similarity of two double arrays as ONE
  * codegen'd expression.
  *
  * The compositional form ([[graft.operators.Similarity.cosine]]:
  * aggregate ∘ zip_with three times) is the executable spec, but Spark
  * evaluates higher-order functions INTERPRETED — per element it allocates
  * lambda variables and boxes every double. Inside an ANN verify loop that
  * touches millions of candidate pairs, that interpreter overhead dominates
  * the arithmetic. This expression runs the identical three sequential
  * left-folds (ab, aa, bb accumulate in element order — the SAME double
  * rounding sequence as the HOF spec, so results are bit-identical; guarded
  * by CosineSimSpec) in one tight primitive loop that whole-stage codegen
  * inlines.
  *
  * Precondition: equal-length arrays (the similarity paths all go through
  * the dim guard). The shorter length wins if they ever differ.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CosineSim.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  def eval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimExpr(exprs(0), exprs(1)),
      "scala_udf")
}
