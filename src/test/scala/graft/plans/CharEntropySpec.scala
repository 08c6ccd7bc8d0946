package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CharEntropySpec extends SparkSpec {

  private def direct(s: String): Long = {
    // independent reference computation (Map-based, different iteration
    // order than the expression's byte-index loop)
    if (s.isEmpty) return 0L
    val counts = s.getBytes("UTF-8").groupBy(identity).map(_._2.length)
    val n = counts.sum.toDouble
    val h = (math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n) /
      math.log(2.0)
    math.floor(h * 100.0).toLong
  }

  test("char_entropy_q matches an independent reference on known inputs") {
    CharEntropy.register(spark)
    val cases = Seq(
      "",                    // empty → 0 by convention
      "aaaaaaa",             // zero entropy
      "ab",                  // exactly 1 bit
      "abcd",                // exactly 2 bits
      "the quick brown fox jumps over the lazy dog",
      "aabbaabbaabb")
    import spark.implicits._
    val got = cases.toDF("s")
      .select(expr("char_entropy_q(s)").as("h")).collect().map(_.getLong(0))
    cases.zip(got).foreach { case (s, h) =>
      assert(h === direct(s), s"input '$s'")
    }
    assert(direct("aaaaaaa") === 0L)
    assert(direct("ab") === 100L)
    assert(direct("abcd") === 200L)
  }

  test("char_entropy_q matches the independent reference on random ASCII strings") {
    CharEntropy.register(spark)
    import org.scalacheck.Gen
    import spark.implicits._
    val strs = Iterator.continually(Gen.asciiPrintableStr.sample).flatten
      .take(200).toSeq
    val got = strs.toDF("s")
      .select(expr("char_entropy_q(s)").as("h")).collect().map(_.getLong(0))
    strs.zip(got).foreach { case (s, h) =>
      assert(h === direct(s), s"diverged on ${s.take(40)}")
    }
  }

  test("char_entropy_q over the corpus is bounded by log2(alphabet)") {
    CharEntropy.register(spark)
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("char_entropy_q(text)").as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getLong(0)
      assert(h >= 0L && h <= 800L, s"entropy_q $h outside [0, 8 bits]")
    }
  }
}
