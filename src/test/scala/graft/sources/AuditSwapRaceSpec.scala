package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Stage-and-swap vs wait-free OCC appends: `commitTxn` deliberately runs
  * without the maintenance lease, so an INSERT INTO can commit into the
  * old tree at any point of a long `repartition_table` / partitioned
  * OPTIMIZE. Acknowledged rows must never be destroyed by the
  * displaced-tree delete: an append during STAGING aborts the swap loudly
  * (nothing changed), and an append in the check→rename window is
  * re-appended into the new tree before the delete. */
class AuditSwapRaceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_swap_${tag}_")
    val cat = s"graft_swap_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("repartition_table: an append during staging aborts the swap; " +
    "the raced rows survive in the untouched table") {
    val (cat, wh) = freshCat("abort")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, day BIGINT, r BIGINT) " +
      "USING audit PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 3, id % 2 " +
      "FROM range(60)")
    AuditMaintenance.afterStageHook = Some(() =>
      spark.sql(s"INSERT INTO $cat.db.t VALUES (1000, 1, 0), (1001, 2, 1)"))
    try {
      val ex = intercept[Throwable](spark.sql(
        s"CALL $cat.system.repartition_table(table => 'db.t', spec => 'r')"))
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains("concurrent append")), ex.toString)
    } finally AuditMaintenance.afterStageHook = None
    // nothing changed: still day-partitioned, all 62 rows present
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .head.getLong(0) === 62L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE id >= 1000")
      .head.getLong(0) === 2L)
    assert(java.nio.file.Files.isDirectory(
      wh.resolve("db").resolve("t").resolve("day=1")))
    // and the stage was reclaimed (no orphan sibling trees)
    val sib = java.nio.file.Files.list(wh.resolve("db"))
    try assert(!sib.iterator().asScala.exists(
      _.getFileName.toString.contains("repartstage")), "stage left behind")
    finally sib.close()
  }

  test("repartition_table: an append in the check→rename window is " +
    "re-appended into the new layout before the displaced delete") {
    val (cat, wh) = freshCat("reapp")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, day BIGINT, r BIGINT) " +
      "USING audit PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 3, id % 2 " +
      "FROM range(60)")
    AuditMaintenance.afterCheckHook = Some(() =>
      spark.sql(s"INSERT INTO $cat.db.t VALUES (1000, 1, 0), (1001, 2, 1)"))
    try spark.sql(
      s"CALL $cat.system.repartition_table(table => 'db.t', spec => 'r')")
    finally AuditMaintenance.afterCheckHook = None
    // acknowledged raced rows survived the swap...
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .head.getLong(0) === 62L)
    val raced = spark.sql(
      s"SELECT id, day, r FROM $cat.db.t WHERE id >= 1000 ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(raced === Seq((1000L, 1L, 0L), (1001L, 2L, 1L)))
    // ...routed by the NEW spec (r), physically in the right directories
    val root = wh.resolve("db").resolve("t")
    assert(java.nio.file.Files.isDirectory(root.resolve("r=0")))
    assert(!java.nio.file.Files.isDirectory(root.resolve("day=1")))
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.db.t WHERE r = 0 AND id >= 1000")
      .head.getLong(0) === 1L)
    // displaced tree is gone
    val sib = java.nio.file.Files.list(wh.resolve("db"))
    try assert(!sib.iterator().asScala.exists(
      _.getFileName.toString.contains(".old.")), "displaced tree left")
    finally sib.close()
  }

  test("partitioned OPTIMIZE: same two-phase defense") {
    val (cat, wh) = freshCat("opt")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, day BIGINT) " +
      "USING audit PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 3 FROM range(60)")
    // abort half
    AuditMaintenance.afterStageHook = Some(() =>
      spark.sql(s"INSERT INTO $cat.db.t VALUES (1000, 1)"))
    try {
      val ex = intercept[Throwable](spark.sql(
        s"CALL $cat.system.optimize(table => 'db.t')"))
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains("concurrent append")), ex.toString)
    } finally AuditMaintenance.afterStageHook = None
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .head.getLong(0) === 61L)
    // re-append half
    AuditMaintenance.afterCheckHook = Some(() =>
      spark.sql(s"INSERT INTO $cat.db.t VALUES (2000, 2)"))
    try spark.sql(s"CALL $cat.system.optimize(table => 'db.t')")
    finally AuditMaintenance.afterCheckHook = None
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .head.getLong(0) === 62L)
    assert(spark.sql(s"SELECT day FROM $cat.db.t WHERE id = 2000")
      .head.getLong(0) === 2L)
  }
}
