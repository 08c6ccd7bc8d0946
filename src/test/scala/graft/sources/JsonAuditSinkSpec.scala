package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** JsonAuditSink (DSv2 write path): staged-file two-phase commit must
  * publish exactly the written rows with a truthful manifest, overwrite
  * must truncate prior files, and aborted attempts must leave no trace. */
class JsonAuditSinkSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def tempDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_audit_sink")

  test("append publishes committed part files plus a manifest that adds up") {
    val dir = tempDir()
    val src = graft.Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartition(3)
    val n = src.count()
    src.write.format(classOf[JsonAuditSink].getName)
      .option("path", dir.toString).mode("append").save()

    val files = java.nio.file.Files.list(dir)
    val names = try files.iterator().asScala.map(_.getFileName.toString).toSet
      finally files.close()
    assert(names.count(_.endsWith(".jsonl")) === 3, names)
    assert(names.contains("_MANIFEST"))
    assert(!names.contains("_staging"), "staging must be cleaned on commit")

    val manifestHead = java.nio.file.Files.readAllLines(dir.resolve("_MANIFEST"))
      .get(0)
    assert(manifestHead === s"""{"files":3,"rows":$n}""", manifestHead)

    // byte-exact round trip through a plain JSON reader
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = spark.read.schema(schema).json(s"$dir/*.jsonl")
    assert(back.count() === n)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toString).sorted.toSeq
    assert(key(back) === key(src))
  }

  test("overwrite truncates previously committed files, not just adds") {
    val dir = tempDir()
    def write(df: org.apache.spark.sql.DataFrame, mode: String): Unit =
      df.write.format(classOf[JsonAuditSink].getName)
        .option("path", dir.toString).mode(mode).save()
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"), col("event_type")).repartition(2)
    write(ev, "append")
    write(ev.limit(10).repartition(1), "overwrite")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType)))
    assert(spark.read.schema(schema).json(s"$dir/*.jsonl").count() === 10L)
    val head = java.nio.file.Files.readAllLines(dir.resolve("_MANIFEST")).get(0)
    assert(head === """{"files":1,"rows":10}""", head)
  }

  test("streaming write commits one atomic epoch per micro-batch (full custom loop)") {
    // custom source → custom sink: 4 one-page micro-batches through the
    // epoch-committed streaming write; every row lands exactly once
    val dir = tempDir()
    val ckpt = tempDir()
    val stream = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "4").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load()
      .select(col("id"), col("track_id"), col("title"))
    val q = stream.writeStream.format(classOf[JsonAuditSink].getName)
      .option("path", dir.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val epochs = java.nio.file.Files.readAllLines(dir.resolve("_EPOCHS")).asScala
    assert(epochs.size >= 4, epochs.mkString("\n"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("track_id", LongType),
      StructField("title", StringType)))
    val back = spark.read.schema(schema).json(s"$dir/*.jsonl")
    assert(back.count() === 400L)
    assert(back.agg(countDistinct(col("id"))).head.getLong(0) === 400L)
  }

  test("aborted writer leaves no staged file behind") {
    val dir = tempDir()
    val schema = StructType(Seq(StructField("x", LongType)))
    val w = new AuditWriterFactory(dir.toString, schema).createWriter(0, 42L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(1L))
    w.abort()
    val staged = java.nio.file.Files.list(dir.resolve("_staging"))
    val left = try staged.count() finally staged.close()
    assert(left === 0L)
  }
}
