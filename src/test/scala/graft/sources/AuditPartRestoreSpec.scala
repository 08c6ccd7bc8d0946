package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PARTITIONED RESTORE to an OPTIMIZE checkpoint boundary: per-dir base
  * checkpoints materialize the boundary state in every directory, so the
  * bad-publish undo is per-dir vintage truncation — post-checkpoint
  * epochs truncate from the root log, live manifest entries delete,
  * vectors split on the commit-time axis at the shared snapshot instant,
  * and directories born after the checkpoint empty entirely.
  * clean_orphans composes; non-boundary targets keep refusing loudly. */
class AuditPartRestoreSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def withShortStreamLease[T](body: => T): T = {
    sys.props("graft.audit.streamLeaseMs") = "1"
    try body finally sys.props.remove("graft.audit.streamLeaseMs")
  }

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_prk_${tag}_")
    val cat = s"graft_prk_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  private def wave(cat: String, ckpt: java.nio.file.Path, pages: Int): Unit = {
    val w = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", pages.toString).option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"), (col("id") % 3).as("flag"))
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.t")
    try w.processAllAvailable() finally w.stop()
  }

  test("partitioned restore to the boundary undoes post-checkpoint " +
    "epochs, appends, DML — and empties a dir born after it") {
    val (cat, wh) = freshCat("main")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_prk_sck")
    wave(cat, ckpt, 2) // epochs 0-1: ids 0..199 over flag 0..2
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1000, 1)") // pre-ckpt append
    spark.sql(s"UPDATE $cat.db.t SET id = id + 5000 WHERE id % 100 = 7")
    val expected = spark.sql(
      s"SELECT id, flag FROM $cat.db.t ORDER BY id, flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    withShortStreamLease {
      Thread.sleep(4)
      spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
        "target_file_count => 3)") // checkpoint at epoch 1
    }
    // post-checkpoint damage: a third epoch, an append into a NEW dir
    // value, and more DML
    wave(cat, ckpt, 3) // epoch 2: ids 200..299
    spark.sql(s"INSERT INTO $cat.db.t VALUES (7000, 9)") // flag=9: new dir
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 100 = 13")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
      !== expected.size.toLong)
    // non-boundary target refuses loudly
    val ex = intercept[Exception](withShortStreamLease(spark.sql(
      s"CALL $cat.system.restore(table => 'db.t', version => 0)").collect()))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("checkpoint")), ex.toString)
    // boundary restore: state equals the pre-captured answer exactly
    withShortStreamLease(spark.sql(
      s"CALL $cat.system.restore(table => 'db.t', version => 1)").collect())
    spark.catalog.refreshTable(s"$cat.db.t")
    val after = spark.sql(
      s"SELECT id, flag FROM $cat.db.t ORDER BY id, flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after === expected)
    // the post-checkpoint dir is empty (its only row un-happened)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE flag = 9")
      .head.getLong(0) === 0L)
    // metadata counts agree with the row-level answer
    val cnt = spark.sql(s"SELECT count(*) FROM $cat.db.t")
    assert(cnt.head.getLong(0) === expected.size.toLong)
    // clean_orphans composes (reclaims truncated-epoch debris, if any)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      "clean_orphans => true)").collect()
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
      === expected.size.toLong)
    // travel to the checkpoint instant still answers after the restore
    val path = wh.resolve("db").resolve("t").toString
    val wm = AuditPartition.listDirsByCols(path, Seq("flag"))
      .map { case (_, d) => AuditBase.maxVisibleTs(d.toString) }.max
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($wm)").head.getLong(0)
      === expected.size.toLong)
  }

  test("restore PAST the boundary truncates only newer history: " +
    "epochs > version go, pre-target appends and DML stay") {
    val (cat, wh) = freshCat("post")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_prk_pck")
    wave(cat, ckpt, 2) // epochs 0-1
    withShortStreamLease {
      Thread.sleep(4)
      spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
        "target_file_count => 3)") // checkpoint at epoch 1
    }
    // post-checkpoint, PRE-target history that must SURVIVE: an append
    // and DML (vectors + replacement rows committed before epoch 2)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1000, 1)")
    spark.sql(s"UPDATE $cat.db.t SET id = id + 5000 WHERE id % 100 = 7")
    Thread.sleep(4)
    wave(cat, ckpt, 3) // epoch 2 — the restore target
    val expected = spark.sql(
      s"SELECT id, flag FROM $cat.db.t ORDER BY id, flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // post-target damage: a fourth epoch, a new-dir append, more DML
    Thread.sleep(4)
    wave(cat, ckpt, 4) // epoch 3
    spark.sql(s"INSERT INTO $cat.db.t VALUES (7000, 9)") // flag=9: new dir
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 100 = 13")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
      !== expected.size.toLong)
    withShortStreamLease(spark.sql(
      s"CALL $cat.system.restore(table => 'db.t', version => 2)").collect())
    spark.catalog.refreshTable(s"$cat.db.t")
    val after = spark.sql(
      s"SELECT id, flag FROM $cat.db.t ORDER BY id, flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after === expected)
    // the post-target dir is empty, metadata counts agree
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE flag = 9")
      .head.getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
      === expected.size.toLong)
    // the root epoch log was truncated to the target
    val path = wh.resolve("db").resolve("t").toString
    assert(AuditScan.committedEpochs(path).max === 2L)
  }

  test("boundary restore is a no-op when nothing followed the checkpoint") {
    val (cat, _) = freshCat("noop")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_prk_nck")
    wave(cat, ckpt, 2)
    withShortStreamLease {
      spark.sql(s"CALL $cat.system.optimize(table => 'db.t')")
      val res = spark.sql(
        s"CALL $cat.system.restore(table => 'db.t', version => 1)").collect()
      assert(res.head.getInt(2) === 0) // removed_files
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
      === 200L)
  }
}
