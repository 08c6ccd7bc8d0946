package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PRE-FOLD-AXIS checkpoint migration (round-15 offsets): a live-entry-
  * axis checkpoint is EXACTLY translatable onto the round-16 fold-stable
  * axis while the directory has never folded (live entries = all
  * entries when mfolds = 0) — the feed resumes seamlessly. Once a
  * partitioned OPTIMIZE folds entries, the axes diverge and the resume
  * restarts loudly instead of drifting. */
class AuditLegacyOffsetSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshTable(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_lo_${tag}_")
    val cat = s"graft_lo_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(
      s"""CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT)
         |USING audit PARTITIONED BY (flag)""".stripMargin)
    (cat, wh.resolve("db").resolve("t"))
  }

  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("flag", LongType), StructField("_change_type", StringType)))

  /** Serialize the CURRENT feed position in the round-15 format:
    * `"tok":"entries:rows:dels:folds"` — live-entry axis, no mfolds. */
  private def legacyOffsetJson(path: String): String =
    AuditPartition.listDirsByCols(path, Seq("flag")).map { case (rel, d) =>
      val live = AuditBase.readManifest(d.toString).filterNot(_.folded)
      s""""${rel.stripPrefix("flag=")}":"${live.size}:${live.map(_.rows).sum}:""" +
        s"""${AuditDeletes.entries(d.toString).size}:""" +
        s"""${AuditDeletes.foldedRows(d.toString)}""""
    }.mkString("{", ",", "}")

  private def readEvents(stream: AuditPartitionedCdfStream,
      from: org.apache.spark.sql.connector.read.streaming.Offset)
      : Seq[(Long, String)] = {
    val parts = stream.planInputPartitions(from, stream.latestOffset())
    val factory = stream.createReaderFactory()
    parts.toSeq.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), row.getUTF8String(2).toString))
      }
      r.close(); buf
    }
  }

  test("a round-15 checkpoint resumes seamlessly while the table has " +
    "never folded") {
    val (cat, dataDir) = freshTable("ok")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 2 FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 50 = 7") // 2 vectors
    val legacy = legacyOffsetJson(dataDir.toString)
    // new history after the pre-upgrade checkpoint
    spark.sql(s"INSERT INTO $cat.db.t VALUES (9000, 0), (9001, 1)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 33 = 5")
    val stream = new AuditPartitionedCdfStream(dataDir.toString, schema,
      Seq(AuditPartition.Level("flag", LongType, None)))
    val events = readEvents(stream, stream.deserializeOffset(legacy))
    // exactly the post-checkpoint slice: 2 inserts + the new deletes
    assert(events.filter(_._2 == "insert").map(_._1).toSet
      === Set(9000L, 9001L))
    val newDeletes = (0L until 100L).filter(i => i % 33 == 5 && i % 50 != 7)
    assert(events.filter(_._2 == "delete").map(_._1).toSet
      === newDeletes.toSet)
  }

  test("the same checkpoint restarts loudly once a fold intervened") {
    val (cat, dataDir) = freshTable("fold")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 2 FROM range(100)")
    val legacy = legacyOffsetJson(dataDir.toString)
    // a partitioned OPTIMIZE folds the consumed entries — the live-entry
    // axis no longer aligns with the fold-stable axis
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (9000, 0)")
    val stream = new AuditPartitionedCdfStream(dataDir.toString, schema,
      Seq(AuditPartition.Level("flag", LongType, None)))
    val ex = intercept[IllegalArgumentException](
      readEvents(stream, stream.deserializeOffset(legacy)))
    assert(ex.getMessage.contains("folded"), ex.getMessage)
  }
}
