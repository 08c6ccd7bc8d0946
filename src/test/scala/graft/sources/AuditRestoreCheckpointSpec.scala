package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** RESTORE to an OPTIMIZE checkpoint boundary on a MIXED table: the base
  * materializes full state at its boundary epoch, and the commit-time
  * axis splits pre- from post-checkpoint delete vectors — so the
  * bad-publish undo works exactly where it is most needed (DML-active
  * tables), while every non-boundary target keeps refusing loudly. */
class AuditRestoreCheckpointSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  // a gracefully stopped stream's writer lease lingers until its TTL;
  // RESTORE refuses live writers, so shrink the TTL for these tests
  private def withShortStreamLease[T](body: => T): T = {
    sys.props("graft.audit.streamLeaseMs") = "1"
    try body finally sys.props.remove("graft.audit.streamLeaseMs")
  }

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_rck_${tag}_")
    val cat = s"graft_rck_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  private def wave(cat: String, ckpt: java.nio.file.Path, pages: Int): Unit = {
    import org.apache.spark.sql.functions._
    val w = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", pages.toString).option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"), col("id").as("v"))
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.t")
    try w.processAllAvailable() finally w.stop()
  }

  test("restore to the checkpoint boundary undoes post-checkpoint " +
      "epochs, batch appends and DML exactly") {
    val (cat, wh) = freshCat("main")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rck_sck")
    wave(cat, ckpt, 2) // epochs 0-1: ids 0..199
    spark.sql(s"INSERT INTO $cat.db.t SELECT id + 1000, id + 1000 " +
      "FROM range(50)")
    // PRE-checkpoint DML: vectors + replacement rows, both inside the
    // checkpoint snapshot
    spark.sql(s"UPDATE $cat.db.t SET v = 999 WHERE id % 100 = 7 AND id < 400")
    // the streaming writer lease lingers until its TTL — steal window
    // is not the point here; OPTIMIZE takes the maintenance lease only
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 2)")
    val checkpointState = spark.sql(
      s"SELECT id, v FROM $cat.db.t ORDER BY id, v").collect().toSeq
    assert(checkpointState.size === 250)

    // POST-checkpoint history: a batch append, two more epochs, DML that
    // touches PRE-checkpoint rows (vectors on base-origin row ids) and
    // post-checkpoint rows
    spark.sql(s"INSERT INTO $cat.db.t SELECT id + 2000, id FROM range(20)")
    wave(cat, ckpt, 4) // epochs 2-3: ids 200..399
    spark.sql(s"UPDATE $cat.db.t SET v = 111 WHERE id % 100 = 55 AND id < 200")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 1000 < 5 AND id >= 2000")
    assert(spark.table(s"$cat.db.t").count() === 250 + 20 + 200 - 5)

    // non-boundary targets refuse loudly on a compacted table
    val ex = withShortStreamLease(intercept[Exception](
      spark.sql(s"CALL $cat.system.restore(table => 'db.t', version => 0)")))
    assert(ex.getMessage.contains("checkpoint boundary"), ex.getMessage)

    // boundary restore: state equals the checkpoint-time capture
    withShortStreamLease(
      spark.sql(s"CALL $cat.system.restore(table => 'db.t', version => 1)"))
    val restored = spark.sql(
      s"SELECT id, v FROM $cat.db.t ORDER BY id, v").collect().toSeq
    assert(restored === checkpointState)
    // the pre-checkpoint UPDATE survived; the post-checkpoint one undid
    assert(spark.sql(s"SELECT v FROM $cat.db.t WHERE id = 7")
      .head.getLong(0) === 999L)
    assert(spark.sql(s"SELECT v FROM $cat.db.t WHERE id = 55")
      .head.getLong(0) === 55L)

    // clean_orphans reclaims anything a crash window could have left;
    // the restored answer is untouched
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      "clean_orphans => true)")
    assert(spark.sql(s"SELECT id, v FROM $cat.db.t ORDER BY id, v")
      .collect().toSeq === checkpointState)
    val _ = wh
  }

  test("restore-to-boundary is a no-op when nothing followed the checkpoint") {
    val (cat, _) = freshCat("noop")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rck_nck")
    wave(cat, ckpt, 1)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (9000, 1)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    val before = spark.sql(s"SELECT id, v FROM $cat.db.t ORDER BY id")
      .collect().toSeq
    withShortStreamLease(
      spark.sql(s"CALL $cat.system.restore(table => 'db.t', version => 0)"))
    assert(spark.sql(s"SELECT id, v FROM $cat.db.t ORDER BY id")
      .collect().toSeq === before)
  }

  test("a pre-commit-time base checkpoint refuses boundary restore") {
    val (cat, wh) = freshCat("legacy")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rck_lck")
    wave(cat, ckpt, 1)
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    // strip the ts from the _BASE header — a pre-upgrade checkpoint
    val bf = wh.resolve("db/t/_BASE")
    val stripped = new String(java.nio.file.Files.readAllBytes(bf), "UTF-8")
      .replaceAll(""","ts":\d+\}""", "}")
    java.nio.file.Files.write(bf, stripped.getBytes("UTF-8"))
    val ex = withShortStreamLease(intercept[Exception](
      spark.sql(s"CALL $cat.system.restore(table => 'db.t', version => 0)")))
    assert(ex.getMessage.contains("predates commit-time stamping"),
      ex.getMessage)
  }
}
