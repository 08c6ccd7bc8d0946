package graft.plans

import org.apache.spark.sql.functions.expr
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class MinShingleHashSpec extends SparkSpec {
  import spark.implicits._

  /** Straightforward reference implementation: hash every k-substring
    * independently, take the min. */
  private def reference(s: String, k: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    val kk = math.min(k, math.max(bytes.length, 1))
    if (bytes.length == 0) 0L
    else (0 to bytes.length - kk).map { i =>
      var h = 0L
      var j = i
      while (j < i + kk) { h = h * 0x100000001b3L + (bytes(j) & 0xff); j += 1 }
      h
    }.min
  }

  test("matches the per-window reference implementation") {
    val samples = Seq("the quick brown fox", "aaaa", "abcabcabc", "x",
      "spark window merge sort", "ab")
    samples.foreach { s =>
      assert(MinShingleHash.eval(UTF8String.fromString(s), 9) === reference(s, 9), s)
      assert(MinShingleHash.eval(UTF8String.fromString(s), 3) === reference(s, 3), s)
    }
  }

  test("rotation-robust: a shared window gives a shared candidate hash") {
    // identical 9-byte windows must produce identical window hashes, so two
    // docs sharing enough text tend to share the min — exact dups certainly do
    val a = MinShingleHash.eval(UTF8String.fromString("common shingle text"), 9)
    val b = MinShingleHash.eval(UTF8String.fromString("common shingle text"), 9)
    assert(a === b)
  }

  test("runs through SQL registration inside whole-stage codegen") {
    MinShingleHash.register(spark)
    // a real file scan — a local Seq would be constant-folded into a
    // LocalTableScan and never exercise the generated code
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(docs("text"), expr("min_shingle_hash(text, 9)").as("fp"))
    val got = df.collect()
    assert(got.length > 0)
    got.foreach(r => assert(r.getLong(1) === reference(r.getString(0), 9)))
    // plan stays in whole-stage codegen: the "*(n)" prefix marks codegen'd
    // operators in the executed plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("null and empty inputs") {
    MinShingleHash.register(spark)
    val got = Seq(Some("abc"), None, Some(""))
      .toDF("text")
      .select(expr("min_shingle_hash(text, 3)").as("fp"))
      .collect()
    assert(got(0).getLong(0) === reference("abc", 3))
    assert(got(1).isNullAt(0))
    assert(got(2).getLong(0) === 0L)
  }
}
