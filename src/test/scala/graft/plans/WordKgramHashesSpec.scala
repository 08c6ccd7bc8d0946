package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Round-21 optimization guard: the codegen'd positional k-gram hash pass
  * must be row-identical to the interpreted HOF chain it replaced in
  * [[graft.operators.Dedup]] (gramPositions / winnow). */
class WordKgramHashesSpec extends SparkSpec {
  import spark.implicits._

  private def hofChain(k: Int) = expr(
    s"CASE WHEN size(split(text, ' ')) >= $k THEN " +
      s"transform(sequence(1, size(split(text, ' ')) - ${k - 1}), " +
      s"i -> array_join(slice(split(text, ' '), i, $k), ' ')) " +
      s"ELSE slice(split(text, ' '), 1, 0) END")

  private val texts: Seq[String] = {
    val word = Gen.alphaNumStr.map(_.take(6))
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    (Iterator.continually(doc.sample).flatten.take(120) ++ Iterator(
      "", " ", "  ", "a", "a b", "a b c d e f",
      "double  space keeps empty tokens here exactly",
      "ünïcode 日本 語 tokens mixed in a doc", // multibyte UTF-8
      "trailing space ends the doc ",
      " leading space starts the doc")).toSeq.distinct
  }

  test("word_kgram_hashes ≡ posexplode(HOF chain) + hexHash, k = 4 and 5") {
    for (k <- Seq(4, 5)) {
      val df = texts.toDF("text")
      val viaHof = df
        .select(col("text"), posexplode(hofChain(k)))
        .select(col("text"), col("pos"),
          graft.functions.Hashing.hexHashChain(col("col")).as("h"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      val viaNative = df
        .select(col("text"), posexplode(WordKgramHashes.kgramHashes(col("text"), k)))
        .select(col("text"), col("pos"), col("col").as("h"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(viaNative === viaHof, s"diverged at k=$k")
    }
  }

  test("short docs (< k tokens) emit an empty array, never a whole-text hash") {
    val rows = Seq("a b c", "", "x").toDF("text")
      .select(size(WordKgramHashes.kgramHashes(col("text"), 5)).as("n"))
      .collect().map(_.getInt(0))
    assert(rows.toSeq === Seq(0, 0, 0))
  }

  test("null text yields null (UnaryExpression null semantics)") {
    val r = Seq[Option[String]](None).toDF("text")
      .select(WordKgramHashes.kgramHashes(col("text"), 4).as("a"))
      .collect().head
    assert(r.isNullAt(0))
  }
}
