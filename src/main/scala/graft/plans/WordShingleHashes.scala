package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingle_hashes(text)` — the cross-engine 60-bit md5 hash
  * ([[graft.functions.Hashing.hexHash]]) of every DISTINCT word-3-gram
  * shingle, as one array in one pass (set semantics: min-aggregation is
  * duplicate-insensitive and Jaccard is a set measure, so deduping inside
  * the expression deletes the downstream dropDuplicates EXCHANGE the
  * hashed-shingle consumers would otherwise pay).
  *
  * This is the front half of the MinHash pipeline done at scan speed: the
  * compositional form (posexplode tokens → window `lead` over a per-doc
  * sort → concat → md5) pays a full shuffle+sort of token rows just to
  * assemble adjacent-word strings that this expression reads off directly.
  * Downstream, only (doc_id, hash) long pairs enter any shuffle — document
  * text never leaves the scan stage anywhere in the dedup suite.
  *
  * Semantics are IDENTICAL to distinct `hexHash(s)` over
  * [[graft.operators.Dedup.shingleRows]]: same `split(text, ' ')`
  * tokenization (empty tokens kept), same single-space join, whole text
  * when < 3 tokens ([[MinMd5ShingleSpec]] guards the min; DedupSpec locks
  * the row form this mirrors).
  */
case class WordShingleHashesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHashes.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordShingleHashes.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashesExpr =
    copy(child = newChild)
}

object WordShingleHashes {

  /** Called from generated code — one MessageDigest per row, reused.
    * Insertion-ordered set → deterministic array per input. */
  def eval(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val md = MessageDigest.getInstance("MD5")
    val toks = str.split(" ", -1) // limit -1: keep empty tokens (Spark split)
    if (toks.length < 3)
      return new GenericArrayData(
        Array[Any](MinMd5Shingle.first60(md.digest(str.getBytes("UTF-8")))))
    val seen = new java.util.LinkedHashSet[java.lang.Long](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + 2 < toks.length) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2))
      seen.add(MinMd5Shingle.first60(md.digest(sb.toString.getBytes("UTF-8"))))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** Register as a SQL-callable temp function:
    * `expr("word_shingle_hashes(text)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingle_hashes",
      exprs => WordShingleHashesExpr(exprs.head),
      "scala_udf")
}
