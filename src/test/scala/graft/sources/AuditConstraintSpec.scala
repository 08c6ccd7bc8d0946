package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Enforced CHECK constraints (Spark 4 DSv2 constraints API) on audit
  * tables: stored in catalog metadata, served through
  * Table.constraints(), validated by Spark on every write path —
  * INSERT, DML, and ALTER-time validation of existing rows — and
  * droppable. Renaming or dropping a referenced column is refused while
  * the constraint stands. */
class AuditConstraintSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def chain(t: Throwable): Seq[Throwable] =
    if (t == null) Seq.empty else t +: chain(t.getCause)

  private def freshCat(tag: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_chk_${tag}_")
    val cat = s"graft_chk_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    cat
  }

  test("CREATE TABLE with CHECK enforces every subsequent write") {
    val cat = freshCat("ddl")
    spark.sql(
      s"""CREATE TABLE $cat.db.t (
         |  id BIGINT, v BIGINT,
         |  CONSTRAINT v_nonneg CHECK (v >= 0))
         |USING audit""".stripMargin)
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 2 FROM range(0, 10)")
    assert(spark.table(s"$cat.db.t").count() === 10L)
    val ex = intercept[Throwable](
      spark.sql(s"INSERT INTO $cat.db.t VALUES (100, -1)"))
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("v_nonneg")), ex.toString)
    // nothing published by the failed write
    assert(spark.table(s"$cat.db.t").count() === 10L)
    // DML revalidates too: an UPDATE driving v negative must fail...
    val ex2 = intercept[Throwable](
      spark.sql(s"UPDATE $cat.db.t SET v = -5 WHERE id = 3"))
    assert(chain(ex2).exists(t => t.getMessage != null &&
      t.getMessage.contains("v_nonneg")), ex2.toString)
    // ...while a conforming UPDATE goes through
    spark.sql(s"UPDATE $cat.db.t SET v = 99 WHERE id = 3")
    assert(spark.sql(s"SELECT v FROM $cat.db.t WHERE id = 3")
      .head.getLong(0) === 99L)
  }

  test("ADD CONSTRAINT validates existing rows; DROP lifts enforcement") {
    val cat = freshCat("alter")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 5), (2, -7)")
    // existing data violates → the ALTER itself must fail (ENFORCED)
    val ex = intercept[Throwable](spark.sql(
      s"ALTER TABLE $cat.db.t ADD CONSTRAINT v_pos CHECK (v >= 0)"))
    assert(chain(ex).exists(t => t.getMessage != null &&
      (t.getMessage.contains("v_pos") ||
        t.getMessage.toLowerCase.contains("violate"))), ex.toString)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id = 2")
    spark.sql(s"ALTER TABLE $cat.db.t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val ex2 = intercept[Throwable](
      spark.sql(s"INSERT INTO $cat.db.t VALUES (3, -1)"))
    assert(chain(ex2).exists(t => t.getMessage != null &&
      t.getMessage.contains("v_pos")), ex2.toString)
    // rename of the constrained column is refused while it stands
    val ex3 = intercept[Throwable](
      spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO w"))
    assert(chain(ex3).exists(t => t.getMessage != null &&
      t.getMessage.contains("v_pos")), ex3.toString)
    spark.sql(s"ALTER TABLE $cat.db.t DROP CONSTRAINT v_pos")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, -1)") // enforcement lifted
    assert(spark.table(s"$cat.db.t").count() === 2L)
    // and the rename now works
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO w")
    assert(spark.sql(s"SELECT sum(w) FROM $cat.db.t").head.getLong(0) === 4L)
  }

  test("CHECK constraints compose with partitioned tables and streaming") {
    val cat = freshCat("part")
    spark.sql(
      s"""CREATE TABLE $cat.db.p (
         |  id BIGINT, flag BIGINT,
         |  CONSTRAINT flag_small CHECK (flag < 100))
         |USING audit PARTITIONED BY (flag)""".stripMargin)
    spark.sql(s"INSERT INTO $cat.db.p SELECT id, id % 3 FROM range(0, 30)")
    val ex = intercept[Throwable](
      spark.sql(s"INSERT INTO $cat.db.p VALUES (1, 500)"))
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("flag_small")), ex.toString)
    // a streaming write into the constrained table validates per row
    import org.apache.spark.sql.functions._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_chk_ckpt")
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "1").option("pageSize", "50")
      .load().select(col("id"), (col("id") % 3).as("flag"))
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.p")
    try q.processAllAvailable() finally q.stop()
    assert(spark.table(s"$cat.db.p").count() === 80L)
  }
}
