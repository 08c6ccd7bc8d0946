package graft.plans

import org.apache.spark.sql.functions.expr
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class CompressionRatioSpec extends SparkSpec {

  private def referenceRatio(s: String): Double = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.size().toDouble / bytes.length
  }

  test("matches direct java.util.zip deflate output") {
    val samples = Seq(
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",      // repetitive → small ratio
      "the quick brown fox jumps over the lazy dog",   // mixed
      "x", "")
    samples.foreach { s =>
      assert(CompressionRatio.eval(UTF8String.fromString(s)) === referenceRatio(s), s)
    }
  }

  test("repetitive text compresses far better than diverse text") {
    val rep = CompressionRatio.eval(UTF8String.fromString("spam " * 200))
    val div = CompressionRatio.eval(UTF8String.fromString(
      (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")))
    assert(rep < 0.1)
    assert(div > rep * 3)
  }

  test("deflate ratio is monotone against the dictionary-ratio proxy") {
    // a repetitiveness ladder: each rung repeats a smaller vocabulary, so
    // the 3-gram dictionary shrinks and deflate must improve in lockstep —
    // this pins the zlib signal (un-oracle-able) to the hash-checked
    // q_compress_signal proxy
    def dictRatio(s: String): Double = {
      val n = s.length
      if (n < 3) 1.0
      else (0 to n - 3).map(i => s.substring(i, i + 3)).distinct.size.toDouble / (n - 2)
    }
    val rungs = Seq(
      "ab " * 200,                                            // tiny dictionary
      ("spam ham " * 67).take(600),                           // small
      (1 to 100).map(i => s"w${i % 25}").mkString(" "),       // medium
      (1 to 100).map(i => s"w${i * 7919 % 9973}").mkString(" ")) // diverse
    val proxies = rungs.map(dictRatio)
    val deflates = rungs.map(s => CompressionRatio.eval(UTF8String.fromString(s)))
    assert(proxies === proxies.sorted, s"ladder must ascend in proxy: $proxies")
    assert(deflates === deflates.sorted,
      s"deflate must ascend with the proxy: $deflates vs $proxies")
  }

  test("runs through SQL registration over a parquet scan in codegen") {
    CompressionRatio.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(docs("text"), expr("compression_ratio(text)").as("r"))
    val got = df.collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getDouble(1) === referenceRatio(r.getString(0))))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
