package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Column DEFAULT values (Spark 4 DSv2 SUPPORT_COLUMN_DEFAULT_VALUE):
  * CREATE-time defaults fill INSERTs that omit the column; ADD COLUMN
  * ... DEFAULT gives rows that PREDATE the column the existence default
  * on read (an explicitly stored NULL stays null); ALTER COLUMN SET
  * DEFAULT changes only future INSERTs. The metadata min/max and
  * zone-map skip paths refuse existence-defaulted columns (their stats
  * never saw the default). */
class AuditDefaultSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): String = {
    val cat = s"graft_dflt_$tag"
    val wh = java.nio.file.Files.createTempDirectory(s"graft_dflt_${tag}_")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    cat
  }

  test("CREATE-time DEFAULT fills omitted columns on INSERT") {
    val cat = freshCat("create")
    spark.sql(
      s"""CREATE TABLE $cat.db.t (
         |  id BIGINT, v BIGINT DEFAULT 7, tag STRING DEFAULT 'x')
         |USING audit""".stripMargin)
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 99, 'y')")
    val rows = spark.sql(s"SELECT id, v, tag FROM $cat.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows === Seq((1L, 7L, "x"), (2L, 7L, "x"), (3L, 99L, "y")))
  }

  test("ADD COLUMN DEFAULT backfills pre-column rows on read; stored null stays null") {
    val cat = freshCat("add")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id FROM range(0, 5)")
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN w BIGINT DEFAULT 42")
    // pre-column rows read the EXISTENCE default
    assert(spark.sql(s"SELECT sum(w) FROM $cat.db.t").head.getLong(0)
      === 5L * 42L)
    // new INSERT omitting w gets the CURRENT default; explicit null stays
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (10)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (11, NULL)")
    val rows = spark.sql(s"SELECT id, w FROM $cat.db.t WHERE id >= 10 ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(rows === Seq((10L, 42L), (11L, -1L)))
    // filters over the defaulted column see the backfilled value (file
    // skipping must NOT treat pre-column files as all-null)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE w = 42")
      .head.getLong(0) === 6L)
    // metadata min/max refuses the defaulted column (stats never saw 42)
    val agg = spark.sql(s"SELECT min(w), max(w) FROM $cat.db.t")
    assert(!agg.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(agg.head.getLong(0) === 42L && agg.head.getLong(1) === 42L)
  }

  test("SET DEFAULT changes future INSERTs only; DML and OPTIMIZE preserve values") {
    val cat = freshCat("set")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (0)")
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN w BIGINT DEFAULT 5")
    spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN w SET DEFAULT 9")
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (1)")
    // pre-column row keeps existence default 5; new row gets current 9
    val rows = spark.sql(s"SELECT id, w FROM $cat.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((0L, 5L), (1L, 9L)))
    // the metadata DELETE evaluates predicates against the backfill
    spark.sql(s"DELETE FROM $cat.db.t WHERE w = 5")
    assert(spark.table(s"$cat.db.t").count() === 1L)
    // OPTIMIZE materializes defaults into the base; answers unchanged
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (2)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    val after = spark.sql(s"SELECT id, w FROM $cat.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after === Seq((1L, 9L), (2L, 9L)))
  }
}
