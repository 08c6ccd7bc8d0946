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
}
