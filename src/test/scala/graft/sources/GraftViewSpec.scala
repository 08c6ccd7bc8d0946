package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SQL views through the catalog (DSv2 ViewCatalog): CREATE VIEW stores
  * the definition as catalog metadata, SELECT re-resolves the stored SQL
  * lazily (new base-table data is visible through the view), SHOW VIEWS
  * lists, ALTER VIEW edits properties, DROP VIEW removes — and views
  * compose with the engine's own surfaces (partitioned audit tables,
  * time travel inside the view text). */
class GraftViewSpec extends AnyFunSuite {

  // the view SQL surface rides GraftExtensions (GraftViewRules) — build
  // a fresh session with them, the GraftExtensionsSpec convention
  private lazy val spark: SparkSession = {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def freshCat(tag: String): String = {
    val cat = s"graft_view_$tag"
    val wh = java.nio.file.Files.createTempDirectory(s"graft_view_${tag}_")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    cat
  }

  test("CREATE VIEW / SELECT / SHOW VIEWS / ALTER / RENAME / DROP round trip") {
    val cat = freshCat("crud")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) USING audit " +
      "PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 3 FROM range(0, 90)")
    spark.sql(
      s"""CREATE VIEW $cat.db.v (grp, n, total) AS
         |SELECT flag, count(*), sum(id) FROM $cat.db.t GROUP BY flag
         |""".stripMargin)
    val rows = spark.sql(s"SELECT grp, n, total FROM $cat.db.v ORDER BY grp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === (0L to 2L).map(g =>
      (g, 30L, (0L until 90L).filter(_ % 3 == g).sum)))
    // LAZY resolution: new base rows are visible through the view
    spark.sql(s"INSERT INTO $cat.db.t VALUES (900, 0)")
    assert(spark.sql(s"SELECT n FROM $cat.db.v WHERE grp = 0").head.getLong(0)
      === 31L)
    // SHOW VIEWS lists it; tables are not views and vice versa
    val shown = spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(_.getString(1)).toSeq
    assert(shown === Seq("v"), shown)
    assert(!spark.sql(s"SHOW TABLES IN $cat.db").collect()
      .map(_.getString(1)).contains("v"))
    // ALTER VIEW properties round-trip
    spark.sql(s"ALTER VIEW $cat.db.v SET TBLPROPERTIES ('note' = 'hello')")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.v").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("note").contains("hello"), props)
    // ALTER VIEW AS redefines lazily and keeps properties
    spark.sql(s"ALTER VIEW $cat.db.v AS SELECT count(*) AS only_n FROM $cat.db.t")
    assert(spark.sql(s"SELECT only_n FROM $cat.db.v").head.getLong(0) === 91L)
    assert(spark.sql(s"SHOW TBLPROPERTIES $cat.db.v").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
      .get("note").contains("hello"))
    spark.sql(
      s"""ALTER VIEW $cat.db.v AS
         |SELECT flag AS grp, count(*) AS n, sum(id) AS total
         |FROM $cat.db.t GROUP BY flag""".stripMargin)
    // RENAME, then the old name is gone and the new one answers
    spark.sql(s"ALTER VIEW $cat.db.v RENAME TO db.v2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.v2").head.getLong(0) === 3L)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.v").collect())
    spark.sql(s"DROP VIEW $cat.db.v2")
    assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect().isEmpty)
  }

  test("views over engine surfaces: time travel text; name collisions refused") {
    val cat = freshCat("tt")
    spark.sql(s"CREATE TABLE $cat.db.log (id BIGINT, v BIGINT) USING audit")
    // two streamed epochs so VERSION AS OF 0 differs from current
    val ckpt = java.nio.file.Files.createTempDirectory("graft_view_ckpt")
    import org.apache.spark.sql.functions._
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "2").option("pageSize", "50")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"), col("duration_ms").as("v"))
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.log")
    try q.processAllAvailable() finally q.stop()
    spark.sql(
      s"""CREATE VIEW $cat.db.asof0 AS
         |SELECT count(*) AS n FROM $cat.db.log VERSION AS OF 0""".stripMargin)
    assert(spark.sql(s"SELECT n FROM $cat.db.asof0").head.getLong(0) === 50L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.log").head.getLong(0) === 100L)
    // a view may not shadow a table, nor a table a view
    intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.db.log AS SELECT 1 AS x"))
    intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.db.asof0 (x BIGINT) USING audit"))
  }

  test("CREATE OR REPLACE / IF NOT EXISTS / atomic ALTER VIEW AS") {
    val cat = freshCat("forms")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 2 FROM range(0, 10)")
    spark.sql(s"CREATE VIEW $cat.db.w (a COMMENT 'the id', b) AS " +
      s"SELECT id, v FROM $cat.db.t")
    spark.sql(s"ALTER VIEW $cat.db.w SET TBLPROPERTIES ('team' = 'graft')")
    // IF NOT EXISTS over an existing view: no-op, definition untouched
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.db.w AS SELECT 1 AS only")
    assert(spark.sql(s"SELECT a, b FROM $cat.db.w").count() === 10L)
    // ALTER VIEW AS: same arity → declared aliases AND comments survive,
    // properties survive, new query takes effect
    spark.sql(s"ALTER VIEW $cat.db.w AS SELECT id, v FROM $cat.db.t " +
      "WHERE id < 5")
    assert(spark.sql(s"SELECT a, b FROM $cat.db.w").count() === 5L)
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val id = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "w")
    val after = g.loadView(id).asInstanceOf[GraftView]
    assert(after.aliases.toSeq === Seq("a", "b"))
    assert(after.comments.toSeq === Seq("the id", null))
    assert(after.props.get("team").contains("graft"))
    // a FAILING redefinition (analysis error) leaves the view intact —
    // the atomic replace has no dropped-but-not-recreated window
    intercept[Exception](spark.sql(
      s"ALTER VIEW $cat.db.w AS SELECT no_such_col FROM $cat.db.t"))
    assert(spark.sql(s"SELECT a, b FROM $cat.db.w").count() === 5L)
    // arity change resets aliases/comments to the new query's columns
    spark.sql(s"ALTER VIEW $cat.db.w AS SELECT id FROM $cat.db.t")
    val reset = g.loadView(id).asInstanceOf[GraftView]
    assert(reset.aliases.toSeq === Seq("id"))
    assert(spark.sql(s"SELECT id FROM $cat.db.w").count() === 10L)
    // CREATE OR REPLACE swaps the whole definition atomically
    spark.sql(s"CREATE OR REPLACE VIEW $cat.db.w (total) AS " +
      s"SELECT sum(v) FROM $cat.db.t")
    assert(spark.sql(s"SELECT total FROM $cat.db.w").head.getLong(0) === 90L)
  }

  test("a view resolves against its STORED context from any session context") {
    val cat = freshCat("ctx")
    spark.sql(s"CREATE TABLE $cat.db.base (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.base SELECT id FROM range(0, 7)")
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    // create the view FROM the graft catalog context with a RELATIVE
    // base-table reference (db.base, no catalog)
    spark.sql(s"USE $cat")
    try {
      spark.sql(s"CREATE VIEW db.ctx_v AS SELECT count(*) AS n FROM db.base")
      assert(spark.sql(s"SELECT n FROM $cat.db.ctx_v").head.getLong(0) === 7L)
    } finally spark.sql(s"USE $prevCat")
    // read it from a DIFFERENT current catalog: the stored context wins
    assert(spark.sessionState.catalogManager.currentCatalog.name() === prevCat)
    assert(spark.sql(s"SELECT n FROM $cat.db.ctx_v").head.getLong(0) === 7L)
  }

  test("a stored view containing a WITH clause keeps its CTE references") {
    // qualification of relative names must NOT touch CTE-defined names:
    // `WITH x AS (...) ... FROM x` parses `x` as a 1-part relation, and
    // rewriting it to catalog.ns.x would resolve it to a real table of
    // the same name (wrong results) or fail analysis. The trap case is a
    // CTE whose name SHADOWS a real table.
    val cat = freshCat("cte")
    spark.sql(s"CREATE TABLE $cat.db.base (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.base SELECT id FROM range(0, 10)")
    // a real table named exactly like the CTE, with DIFFERENT contents —
    // if the CTE reference were qualified, the view would read this one
    spark.sql(s"CREATE TABLE $cat.db.evens (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.evens VALUES (777)")
    spark.sql(
      s"""CREATE VIEW $cat.db.cte_v AS
         |WITH evens AS (SELECT id FROM $cat.db.base WHERE id % 2 = 0)
         |SELECT count(*) AS n, sum(id) AS total FROM evens""".stripMargin)
    val r = spark.sql(s"SELECT n, total FROM $cat.db.cte_v").head
    assert(r.getLong(0) === 5L, "CTE must win over the same-named table")
    assert(r.getLong(1) === 20L) // 0+2+4+6+8, NOT 777
    // nested CTEs inside a subquery survive too
    spark.sql(
      s"""CREATE VIEW $cat.db.cte_nested AS
         |SELECT * FROM (
         |  WITH odds AS (SELECT id FROM $cat.db.base WHERE id % 2 = 1)
         |  SELECT max(id) AS m FROM odds)""".stripMargin)
    assert(spark.sql(s"SELECT m FROM $cat.db.cte_nested").head.getLong(0)
      === 9L)
  }

  test("a view over a view in a DIFFERENT namespace re-qualifies nested refs") {
    val cat = freshCat("nest")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.inner_ns")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.outer_ns")
    spark.sql(s"CREATE TABLE $cat.inner_ns.t (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.inner_ns.t SELECT id FROM range(0, 12)")
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    spark.sql(s"USE $cat.inner_ns")
    try {
      // inner view: RELATIVE reference to t, stored context = inner_ns
      spark.sql("CREATE VIEW inner_v AS SELECT id * 10 AS x FROM t")
      spark.sql(s"USE $cat.outer_ns")
      // outer view in ANOTHER namespace references the inner view by a
      // 2-part name — its stored context (catalog only) must carry
      spark.sql(s"CREATE VIEW outer_v AS " +
        "SELECT count(*) AS n, max(x) AS mx FROM inner_ns.inner_v")
    } finally spark.sql(s"USE $prevCat")
    // resolve the whole chain from an unrelated session context
    val r = spark.sql(s"SELECT n, mx FROM $cat.outer_ns.outer_v").head
    assert(r.getLong(0) === 12L && r.getLong(1) === 110L)
  }
}
