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
