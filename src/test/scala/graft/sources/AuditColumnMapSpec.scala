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

  test("rename/drop refused on partitioned tables") {
    val (cat, _) = freshCat("part")
    spark.sql(
      s"""CREATE TABLE $cat.db.p (id BIGINT, flag BIGINT)
         |USING audit PARTITIONED BY (flag)""".stripMargin)
    val ex = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.db.p RENAME COLUMN id TO key"))
    assert(ex.getMessage.contains("partitioned"), ex.getMessage)
  }
}
