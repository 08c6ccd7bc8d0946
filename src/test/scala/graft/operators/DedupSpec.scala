package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingleRows (codegen form) matches the shingles Column spec exactly") {
    val docs = Seq(
      (1L, "a b c d e"),            // normal: 3 shingles
      (2L, "one two"),              // short: whole text
      (3L, "x"),                    // single token
      (4L, "a b c a b c a b c"),    // repeated shingles → distinct dedupes
      (5L, ""))                     // empty text
      .toDF("doc_id", "text")
    val viaSpec = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaRows = Dedup.shingleRows(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaRows === viaSpec)
    // non-distinct form: same set, duplicates allowed
    val raw = Dedup.shingleRows(docs, distinct = false)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(raw.toSet === viaSpec)
    assert(raw.length >= viaSpec.size)
  }

  test("shingleHashRows equals hexHash over the distinct shingle rows") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "one two"), (3L, "x"),
      (4L, "a b c a b c a b c"), (5L, ""))
      .toDF("doc_id", "text")
    val viaRows = Dedup.shingleRows(docs)
      .select(col("doc_id"), graft.functions.Hashing.hexHash(col("s")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExpr = Dedup.shingleHashRows(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaExpr === viaRows)
  }

  test("simhash60 expression is bit-identical to the simhashCol HOF spec") {
    val docs = Seq(
      (1L, "a b c"), (2L, ""), (3L, "x"), (4L, "a a a b"),
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    graft.plans.SimHash60.register(spark)
    val viaExpr = docs.select(col("doc_id"), expr("simhash60(text)"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaSpec = docs.select(col("doc_id"), Dedup.simhashCol(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaExpr === viaSpec)
    // and on real corpus text
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(100)
    val e = real.select(col("doc_id"), expr("simhash60(text)"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val s = real.select(col("doc_id"), Dedup.simhashCol(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(e === s)
  }

  // STRING-EXACT CANARY for the hash-first gram pipeline: the reference
  // below shares grams by true string equality (no hashing anywhere), so
  // a 60-bit hexHash collision that inflated shared-gram counts would
  // fail here even though the DuckDB oracle (which restates the same
  // hash) structurally cannot see it.
  test("duplicated-span stats match a brute-force in-Scala reference") {
    val d = "/root/testdata/sf0.001"
    val k = Dedup.SpanK
    val texts = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // brute-force positional k-grams and the cross-doc shared set
    val grams = texts.view.mapValues { t =>
      val toks = t.split(" ", -1)
      if (toks.length < k) Array.empty[(Int, String)]
      else (1 to toks.length - k + 1)
        .map(i => i -> toks.slice(i - 1, i - 1 + k).mkString(" ")).toArray
    }.toMap
    val docsOfGram = grams.toSeq
      .flatMap { case (id, gs) => gs.map { case (_, g) => (g, id) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val shared = docsOfGram.collect { case (g, n) if n > 1 => g }.toSet

    val ng = Dedup.dupNgrams(spark, d).collect()
    assert(ng.length === grams.count(_._2.nonEmpty))
    ng.foreach { r =>
      val gs = grams(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_ngrams") === gs.length.toLong)
      assert(r.getAs[Long]("n_dup_pos") === gs.count(p => shared(p._2)).toLong)
      assert(r.getAs[Long]("n_dup_distinct") ===
        gs.collect { case (_, g) if shared(g) => g }.distinct.length.toLong)
    }

    val sp = Dedup.dupSpans(spark, d).collect()
    val expected = grams.view.mapValues(_.collect { case (p, g) if shared(g) => p })
      .filter(_._2.nonEmpty).toMap
    assert(sp.length === expected.size)
    assert(sp.nonEmpty, "fixture corpus must contain duplicated spans")
    sp.foreach { r =>
      val ps = expected(r.getAs[Long]("doc_id")).sorted
      // merge overlapping-or-adjacent [p, p+k-1] intervals
      val spans = ps.foldLeft(List.empty[(Int, Int)]) { case (acc, p) =>
        acc match {
          case (s0, e0) :: rest if p <= e0 + 1 => (s0, math.max(e0, p + k - 1)) :: rest
          case _ => (p, p + k - 1) :: acc
        }
      }.reverse
      assert(r.getAs[Long]("n_spans") === spans.length.toLong)
      assert(r.getAs[Long]("covered_tokens") ===
        spans.map { case (s0, e0) => e0 - s0 + 1 }.sum.toLong)
      assert(r.getAs[Long]("max_span") ===
        spans.map { case (s0, e0) => e0 - s0 + 1 }.max.toLong)
    }
  }
}
