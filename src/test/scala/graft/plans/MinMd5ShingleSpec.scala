package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.Hashing

/** Guards that the one-pass codegen'd expression is bit-identical to its
  * compositional specification: min over word-3-gram shingles of
  * [[Hashing.hexHashLocal]] (whole text when < 3 tokens) — the contract the
  * DuckDB oracle of q_fingerprint assumes. */
class MinMd5ShingleSpec extends SparkSpec {

  test("eval matches the shingle/hexHashLocal reference on edge cases") {
    val cases = Seq("", "a", "a b", "a b c", "a b c d", "x  y z  w",
      "hello world foo bar baz", "trailing space ", " leading", "  ")
    cases.foreach { s =>
      val toks = s.split(" ", -1)
      val expected =
        if (toks.length < 3) Hashing.hexHashLocal(s)
        else toks.sliding(3).map(w => Hashing.hexHashLocal(w.mkString(" "))).min
      assert(MinMd5Shingle.eval(UTF8String.fromString(s)) === expected,
        s"for input '$s'")
    }
  }

  test("spark column equals the exploded shingle-row min on real documents") {
    val d = "/root/testdata/sf0.001"
    MinMd5Shingle.register(spark)
    val viaExpr = graft.Tables.documents(spark, d)
      .select(col("doc_id"), expr("min_md5_shingle(text)").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPipeline = graft.operators.Dedup
      .shingleRows(graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text")), distinct = false)
      .select(col("doc_id"), Hashing.hexHash(col("s")).as("h"))
      .groupBy(col("doc_id")).agg(min(col("h")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaPipeline)
  }
}
