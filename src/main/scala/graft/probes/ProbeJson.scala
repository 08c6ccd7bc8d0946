// lives in graft.sources to reach the private[sources] codec objects
package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Microbench of the audit jsonl codec (guide §1: measure first): how many
  * ns/row do serialize (AuditRowJson.line) and parse (AuditJson.parseLine)
  * cost on the q_audit_zorder row shape (3 longs) and a mixed
  * long/string/double shape, single-threaded.
  */
object ProbeJson {
  def main(args: Array[String]): Unit = {
    val n = 600000
    val s3 = StructType(Seq(StructField("okey", LongType),
      StructField("pkey", LongType), StructField("qty", LongType)))
    val rows3 = (0 until n).map(i => new GenericInternalRow(
      Array[Any](i.toLong * 7, i.toLong % 2000, (i % 50).toLong))).toArray
    val sMix = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType), StructField("v", DoubleType),
      StructField("flag", StringType)))
    val rowsMix = (0 until n).map(i => new GenericInternalRow(Array[Any](
      i.toLong,
      org.apache.spark.unsafe.types.UTF8String.fromString(s"Customer#$i name"),
      i * 1.37,
      org.apache.spark.unsafe.types.UTF8String.fromString("AR")))).toArray

    def bench(label: String)(body: => Long): Unit = {
      body // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val sink = body
        val dt = System.nanoTime() - t0
        if (sink == 42) println("?")
        dt / 1e6
      }
      println(f"[probe-json] $label%-34s min=${times.min}%.1f ms " +
        f"(${times.min * 1e6 / n}%.0f ns/row)")
    }

    val nullOut = java.io.Writer.nullWriter()
    bench("serialize 3-long rows (Enc)") {
      val enc = new AuditRowJson.Enc(s3)
      var i = 0; var acc = 0L
      while (i < n) { enc.writeTo(rows3(i), nullOut); acc += 1; i += 1 }
      acc
    }
    val lines3 = rows3.map(r => AuditRowJson.line(s3, r))
    bench("parse 3-long rows") {
      var i = 0; var acc = 0L
      while (i < n) { acc += AuditJson.parseLine(lines3(i), s3).numFields; i += 1 }
      acc
    }
    bench("serialize mixed rows (Enc)") {
      val enc = new AuditRowJson.Enc(sMix)
      var i = 0; var acc = 0L
      while (i < n) { enc.writeTo(rowsMix(i), nullOut); acc += 1; i += 1 }
      acc
    }
    val linesMix = rowsMix.map(r => AuditRowJson.line(sMix, r))
    bench("parse mixed rows") {
      var i = 0; var acc = 0L
      while (i < n) { acc += AuditJson.parseLine(linesMix(i), sMix).numFields; i += 1 }
      acc
    }
  }
}
