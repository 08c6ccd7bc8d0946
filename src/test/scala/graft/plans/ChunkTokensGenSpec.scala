package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.TextAnalysis

/** The custom chunking Generator: bit-identical to the compositional
  * chunker on real data, edge-exact on empty/short/null docs, and callable
  * through SQL (`LATERAL VIEW chunk_tokens`) on an extensions session. */
class ChunkTokensGenSpec extends AnyFunSuite {

  private lazy val plain: SparkSession = SparkSpec.session

  private lazy val ext: SparkSession = {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("generator ≡ compositional chunker on the documents table") {
    val d = "/root/testdata/sf0.001"
    val gen = TextAnalysis.chunkDocsGen(plain, d)
    val cmp = TextAnalysis.chunkDocs(plain, d)
    assert(gen.count() > 0)
    assert(gen.exceptAll(cmp).isEmpty && cmp.exceptAll(gen).isEmpty)
  }

  test("edges: empty doc → one empty chunk; null → none; short doc → one") {
    import plain.implicits._
    val df = Seq((1L, ""), (2L, null: String), (3L, "a b c"))
      .toDF("doc_id", "text")
    val gen = org.apache.spark.sql.GraftSqlShim.column(
      ChunkTokensGen(org.apache.spark.sql.GraftSqlShim.expression(
        org.apache.spark.sql.functions.col("text")), 40, 20))
    val out = df.select($"doc_id",
        gen.as(Seq("chunk_idx", "start_pos", "chunk_len", "chunk")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSet == Set(
      (1L, 0L, 1L, 1L, ""),        // "" tokenizes to [""] — one 1-token chunk
      (3L, 0L, 1L, 3L, "a b c"))) // short doc: exactly one chunk, no row for null
  }

  test("SQL surface: LATERAL VIEW chunk_tokens on the extensions session") {
    import ext.implicits._
    Seq((1L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
      .createOrReplaceTempView("ctg_docs")
    val rows = ext.sql(
      """SELECT doc_id, c.chunk_idx, c.chunk
        |FROM ctg_docs
        |LATERAL VIEW chunk_tokens(text, 3, 2) c""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSet == Set(
      (1L, 0L, "w1 w2 w3"), (1L, 1L, "w3 w4 w5")))
  }

  test("seeded random differential: generator ≡ the documented contract for any width/stride/delim") {
    import plain.implicits._
    // reference implementation of the contract, independent of the
    // generator's internals
    def reference(text: String, width: Int, stride: Int, delim: String)
        : Seq[(Long, Long, Long, String)] = {
      val toks = text.split(java.util.regex.Pattern.quote(delim), -1)
      val n = toks.length
      val last = math.max(n - stride, 1)
      (1 to last by stride).map { start =>
        val end = math.min(start - 1 + width, n)
        (((start - 1) / stride).toLong, start.toLong, (end - start + 1).toLong,
          toks.slice(start - 1, end).mkString(delim))
      }
    }
    val rng = new scala.util.Random(20260813L)
    val delims = Seq(" ", "\u0001", ",")
    (1 to 25).foreach { trial =>
      val delim = delims(rng.nextInt(delims.length))
      val nTok = rng.nextInt(30) // 0..29 tokens (0 → "" → [""] edge)
      val text = (1 to nTok).map(_ => s"t${rng.nextInt(9)}").mkString(delim)
      val width = 1 + rng.nextInt(8)   // includes width < 2*stride truncation
      val stride = 1 + rng.nextInt(5)
      val gen = org.apache.spark.sql.GraftSqlShim.column(
        ChunkTokensGen(org.apache.spark.sql.GraftSqlShim.expression(
          org.apache.spark.sql.functions.col("text")), width, stride, delim))
      val got = Seq(Tuple1(text)).toDF("text")
        .select(gen.as(Seq("chunk_idx", "start_pos", "chunk_len", "chunk")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sortBy(_._2)
      val want = reference(text, width, stride, delim)
      assert(got === want,
        s"trial $trial: width=$width stride=$stride delim=${delim.map(_.toInt)} text='$text'")
    }
  }

  test("delim variant windows over whole sentences, never cutting one") {
    import plain.implicits._
    val sep = "\u0001"
    val text = "One two. Three four! Five? Six seven. Eight."
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val sentinelized = org.apache.spark.sql.functions.regexp_replace(
      org.apache.spark.sql.functions.col("text"), "([.!?]) +", "$1" + sep)
    val gen = org.apache.spark.sql.GraftSqlShim.column(
      ChunkTokensGen(org.apache.spark.sql.GraftSqlShim.expression(sentinelized),
        width = 2, stride = 1, delim = sep))
    val out = df.select($"doc_id",
        gen.as(Seq("chunk_idx", "start_pos", "chunk_len", "chunk")))
      .collect().map(r => (r.getLong(2), r.getString(4))).toSeq.sortBy(_._1)
    // 5 sentences, width 2 / stride 1 → windows starting at sentences 1..4;
    // each chunk is complete sentences joined by the sentinel
    assert(out === Seq(
      (1L, s"One two.${sep}Three four!"),
      (2L, s"Three four!${sep}Five?"),
      (3L, s"Five?${sep}Six seven."),
      (4L, s"Six seven.${sep}Eight.")))
    // SQL spelling of the same call (4-arg form)
    ext.createDataFrame(Seq((1L, text))).toDF("doc_id", "text")
      .createOrReplaceTempView("ctg_sent_docs_ext")
    val viaSql = ext.sql(
      s"""SELECT c.chunk_len, c.chunk
         |FROM ctg_sent_docs_ext
         |LATERAL VIEW chunk_tokens(
         |  regexp_replace(text, '([.!?]) +', '$$1\\u0001'), 2, 1, '\\u0001') c"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._2)
    assert(viaSql.map(_._2).toSet === out.map(_._2).toSet)
  }
}
