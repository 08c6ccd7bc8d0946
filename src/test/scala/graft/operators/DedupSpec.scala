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
}
