package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Column RENAME/DROP without data rewrite: the jsonl payload stays keyed
  * by each column's STORAGE name (its name at ADD time) and the catalog
  * metadata carries a current→storage map — a rename is O(1) metadata,
  * reads and writes translate at the table boundary, and a forced DROP
  * retires the storage name so a re-added column of the same name can
  * never resurrect old bytes. */
class AuditColumnMapSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_cmap_${tag}_")
    val cat = s"graft_cmap_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("RENAME COLUMN: one coherent column across vintages, no rewrite") {
    val (cat, wh) = freshCat("ren")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 10 FROM range(0, 100)")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO score")
    // the files were NOT rewritten — old vintage still keyed "v"
    val dataDir = wh.resolve("db").resolve("t")
    val firstFile = {
      val l = java.nio.file.Files.list(dataDir)
      try l.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".jsonl")).toSeq.head
      finally l.close()
    }
    assert(java.nio.file.Files.readAllLines(firstFile).asScala.head
      .contains("\"v\":"), "old vintage must stay keyed by the storage name")
    // appends after the rename ALSO write the storage name
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 10 FROM range(100, 200)")
    // one coherent column across vintages, via the current name
    assert(spark.sql(s"SELECT sum(score) FROM $cat.db.t").head.getLong(0)
      === (0L until 200L).map(_ * 10).sum)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE score = 990")
      .head.getLong(0) === 1L)
    // DML through the renamed column (delta path: filters translate too)
    spark.sql(s"DELETE FROM $cat.db.t WHERE score >= 1500 AND id % 2 = 1")
    spark.sql(
      s"""MERGE INTO $cat.db.t t USING (SELECT 5L AS id, 999L AS score) s
         |ON t.id = s.id WHEN MATCHED THEN UPDATE SET t.score = s.score
         |""".stripMargin)
    val expect = (0L until 200L).filterNot(i => i * 10 >= 1500 && i % 2 == 1)
      .map(i => if (i == 5) 999L else i * 10).sum
    assert(spark.sql(s"SELECT sum(score) FROM $cat.db.t").head.getLong(0)
      === expect)
  }

  test("DROP COLUMN errors loudly unless forced; re-ADD never resurrects") {
    val (cat, _) = freshCat("drop")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, secret BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, 777 FROM range(0, 10)")
    val ex = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN secret"))
    assert(ex.getMessage.contains("allow-column-drop"), ex.getMessage)
    spark.sql(
      s"ALTER TABLE $cat.db.t SET TBLPROPERTIES ('graft.allow-column-drop'='true')")
    spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN secret")
    assert(spark.table(s"$cat.db.t").columns.toSeq === Seq("id"))
    // re-ADD of the dropped name: fresh storage key — old 777s stay buried
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN secret BIGINT")
    val back = spark.sql(s"SELECT secret FROM $cat.db.t")
    assert(back.where(col("secret").isNotNull).count() === 0L,
      "re-added column must read null, never the dropped column's bytes")
    // and new writes to the re-added column round-trip
    spark.sql(s"INSERT INTO $cat.db.t VALUES (100, 42)")
    assert(spark.sql(s"SELECT secret FROM $cat.db.t WHERE id = 100")
      .head.getLong(0) === 42L)
  }

  test("rename survives OPTIMIZE; maintenance speaks storage names") {
    val (cat, _) = freshCat("opt")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 3 FROM range(0, 100)")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO amount")
    // sort_by arrives in the CURRENT name and translates to storage
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 2, sort_by => 'amount')")
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.db.t").head.getLong(0)
      === (0L until 100L).map(_ * 3).sum)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (200, 777)")
    assert(spark.sql(s"SELECT amount FROM $cat.db.t WHERE id = 200")
      .head.getLong(0) === 777L)
  }

  test("partitioned tables: non-partition columns rename/drop; partition col refused") {
    val (cat, wh) = freshCat("part")
    spark.sql(
      s"""CREATE TABLE $cat.db.p (id BIGINT, v BIGINT, flag BIGINT)
         |USING audit PARTITIONED BY (flag)""".stripMargin)
    spark.sql(
      s"INSERT INTO $cat.db.p SELECT id, id * 10, id % 3 FROM range(0, 90)")
    // the PARTITION column is immovable — directory names embed it
    val ex = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.db.p RENAME COLUMN flag TO f2"))
    assert(ex.getMessage.contains("partition column"), ex.getMessage)
    val ex2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.db.p DROP COLUMN flag"))
    assert(ex2.getMessage.contains("partition column"), ex2.getMessage)
    // a NON-partition column renames freely: coherent reads across
    // vintages, partition pruning and metadata counts intact
    spark.sql(s"ALTER TABLE $cat.db.p RENAME COLUMN v TO score")
    spark.sql(
      s"INSERT INTO $cat.db.p SELECT id, id * 10, id % 3 FROM range(90, 120)")
    assert(spark.sql(s"SELECT sum(score) FROM $cat.db.p").head.getLong(0)
      === (0L until 120L).map(_ * 10).sum)
    assert(spark.sql(
      s"SELECT sum(score) FROM $cat.db.p WHERE flag = 1").head.getLong(0)
      === (0L until 120L).filter(_ % 3 == 1).map(_ * 10).sum)
    // DML through the renamed column on the partitioned DELTA path
    spark.sql(s"UPDATE $cat.db.p SET score = 0 WHERE id = 7")
    assert(spark.sql(s"SELECT score FROM $cat.db.p WHERE id = 7")
      .head.getLong(0) === 0L)
    // partitioned OPTIMIZE keeps the storage keys AND the replicated map
    spark.sql(s"CALL $cat.system.optimize(table => 'db.p', " +
      "target_file_count => 2, sort_by => 'score')")
    assert(spark.sql(s"SELECT sum(score) FROM $cat.db.p").head.getLong(0)
      === (0L until 120L).map(i => if (i == 7) 0L else i * 10).sum)
    val dataDir = wh.resolve("db").resolve("p")
    assert(java.nio.file.Files.exists(dataDir.resolve("_COLMAP")),
      "partitioned OPTIMIZE must carry _COLMAP across the swap")
    // forced DROP + re-ADD: fresh storage key, old bytes stay buried
    spark.sql(
      s"ALTER TABLE $cat.db.p SET TBLPROPERTIES ('graft.allow-column-drop'='true')")
    spark.sql(s"ALTER TABLE $cat.db.p DROP COLUMN score")
    spark.sql(s"ALTER TABLE $cat.db.p ADD COLUMN score BIGINT")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.p WHERE score IS NOT NULL")
      .head.getLong(0) === 0L)
  }

  test("change feed surfaces CURRENT names across vintages after a rename") {
    val (cat, wh) = freshCat("cdf")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 10 FROM range(0, 50)")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO score")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (100, 42)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 1000 = 3") // delta: a delete event
    // PATH-BASED change-feed read with the CURRENT-named schema: the
    // data-dir _COLMAP translates both vintages (pre- and post-rename
    // files) without the catalog in the loop
    val cdfSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType)))
    val events = spark.read.schema(cdfSchema)
      .format(classOf[JsonAuditSink].getName)
      .option("path", wh.resolve("db").resolve("t").toString)
      .option("changeFeed", "true").load()
    assert(events.columns.toSeq === Seq("id", "score", "_change_type"))
    // pre-rename vintage values arrive under the current name
    assert(events.filter(col("_change_type") === "insert")
      .agg(sum(col("score"))).head.getLong(0)
      === (0L until 50L).map(_ * 10).sum + 42L)
    // the delete event carries the original row's value, translated too
    val del = events.filter(col("_change_type") === "delete").collect()
    assert(del.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((3L, 30L)))
    // the plain path-based CURRENT read translates as well
    val t = spark.read.schema(org.apache.spark.sql.types.StructType(cdfSchema.take(2)))
      .format(classOf[JsonAuditSink].getName)
      .option("path", wh.resolve("db").resolve("t").toString).load()
    assert(t.agg(sum(col("score"))).head.getLong(0)
      === (0L until 50L).filterNot(_ == 3L).map(_ * 10).sum + 42L)
  }
}
