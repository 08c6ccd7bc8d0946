package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `compression_ratio(text)` — deflate-compressed size / raw size, the
  * classic cheap quality/repetitiveness signal for training-data curation
  * (near-random text ≈ 1.0; templated/repetitive boilerplate ≪ 1; a strong
  * feature for filtering and for spotting machine-generated spam).
  *
  * Custom codegen'd expression for the same reason as [[MinShingleHashExpr]]:
  * there is no composable Spark/DuckDB equivalent (no SQL zlib), and the
  * per-row JNI-free Deflater loop belongs inside whole-stage codegen, not a
  * Scala UDF with serialization overhead. The expression itself has no SQL
  * oracle — it is spec-checked exact against direct java.util.zip output and
  * spec-pinned monotone against the hash-checkable dictionary-ratio proxy
  * that q_compress_signal now emits
  * ([[graft.operators.TextAnalysis.compressionSignal]]).
  */
case class CompressionRatioExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"compression_ratio expects a string argument, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  override protected def nullSafeEval(input: Any): Any =
    CompressionRatio.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CompressionRatio.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatioExpr =
    copy(child = newChild)
}

object CompressionRatio {

  def eval(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new Deflater(Deflater.BEST_SPEED, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](1024)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / bytes.length
    } finally d.end()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compression_ratio",
      exprs => CompressionRatioExpr(exprs.head),
      "scala_udf")
}
