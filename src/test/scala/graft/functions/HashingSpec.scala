package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class HashingSpec extends SparkSpec {
  import spark.implicits._

  test("hexHashLocal (plan-time constants) tracks the hexHash Column exactly") {
    // minhash seeds and LSH hyperplanes are precomputed driver-side with
    // hexHashLocal and embedded as literals; if the two functions ever
    // diverge, signatures silently stop matching their oracles
    val gen = Gen.asciiPrintableStr
    val samples = (Iterator.continually(gen.sample).flatten.take(200) ++
      Iterator("", "a", "0:63", "b#11", "ünïcode-日本語")).toSeq.distinct
    val fromSpark = samples.toDF("s")
      .select(col("s"), Hashing.hexHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(fromSpark(s) === Hashing.hexHashLocal(s), s"diverged on: $s")
    }
  }

  test("smallHash stays within [0, P31) and products fit a long") {
    val vals = Seq("x", "y", "", "long string with words").toDF("s")
      .select(Hashing.smallHash(col("s")).as("h")).collect().map(_.getLong(0))
    vals.foreach { h =>
      assert(h >= 0 && h < Hashing.P31)
      // affine seed step cannot overflow: h * (P31-1) + P31 < 2^62
      assert(h * (Hashing.P31 - 1) + Hashing.P31 > 0)
    }
  }
}
