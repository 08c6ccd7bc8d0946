package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The `ASOF JOIN` SQL syntax: parses on an extensions session, lowers
  * onto the native sorted-merge exec (never a window emulation), agrees
  * with the DataFrame-API operator, and rejects the out-of-subset shapes
  * with clear errors instead of silently mis-planning. */
class AsOfSqlSpec extends AnyFunSuite {

  private lazy val ext: SparkSession = {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def seed(): Unit = {
    ext.createDataFrame(Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 150L), (4L, 30L, 50L)))
      .toDF("eid", "uid", "ts").createOrReplaceTempView("asof_sql_l")
    ext.createDataFrame(Seq(
      (10L, 90L, "a"), (10L, 150L, "b"), (20L, 150L, "c"), (40L, 1L, "d")))
      .toDF("uid", "ts", "tag").createOrReplaceTempView("asof_sql_r")
  }

  test("ASOF JOIN plans onto the native exec and picks the latest at-or-before row") {
    seed()
    val q = ext.sql(
      """SELECT l.eid, r.tag
        |FROM asof_sql_l l ASOF JOIN asof_sql_r r
        |  ON l.uid = r.uid AND l.ts >= r.ts
        |ORDER BY l.eid""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      q.queryExecution.executedPlan.toString.take(1500))
    val rows = q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // eid 1: uid 10, ts 100 → latest r.ts ≤ 100 is 90 ("a");
    // eid 2: ts 200 → 150 ("b"); eid 3: uid 20 ts 150 → boundary-inclusive
    // ("c"); eid 4: uid 30 unmatched → dropped (inner)
    assert(rows === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("ASOF LEFT JOIN keeps unmatched left rows null-padded") {
    seed()
    val rows = ext.sql(
      """SELECT l.eid, r.tag
        |FROM asof_sql_l l ASOF LEFT JOIN asof_sql_r r
        |  ON l.uid = r.uid AND l.ts >= r.ts
        |ORDER BY l.eid""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows === Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("c")), (4L, None)))
  }

  test("SQL form agrees with the DataFrame-API native operator on real data") {
    val d = "/root/testdata/sf0.001"
    val viaSql = graft.ops.NativeAsOf.sqlAsOf(ext, d)
    val viaApi = graft.ops.NativeAsOf.eventToLastSignupNative(ext, d)
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("an ASOF join composes with ordinary joins in the same statement") {
    seed()
    // the ASOF alias `r` marks which join lowers onto the native exec; the
    // r2 join stays a plain equi-join against the SAME table name
    val rows = ext.sql(
      """SELECT l.eid, r.tag, r2.tag AS tag2
        |FROM asof_sql_l l
        |ASOF JOIN asof_sql_r r ON l.uid = r.uid AND l.ts >= r.ts
        |JOIN asof_sql_r r2 ON l.uid = r2.uid AND r2.ts = 150
        |ORDER BY l.eid""".stripMargin)
    assert(rows.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      rows.queryExecution.executedPlan.toString.take(1500))
    assert(rows.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1L, "a", "b"), (2L, "b", "b"), (3L, "c", "c")))
  }

  test("non-asof statements delegate untouched; subset violations error clearly") {
    seed()
    // plain SQL still parses through the delegating parser
    assert(ext.sql("SELECT count(*) FROM asof_sql_l").head.getLong(0) === 4L)
    // an UNALIASED asof side that can't be told apart from another join
    // against the same table is a hard error, not a guess
    val ambiguous = intercept[IllegalArgumentException] {
      ext.sql(
        """SELECT * FROM asof_sql_l l
          |ASOF JOIN asof_sql_r ON l.uid = asof_sql_r.uid AND l.ts >= asof_sql_r.ts
          |JOIN asof_sql_r r2 ON l.uid = r2.uid""".stripMargin)
    }
    assert(ambiguous.getMessage.contains("exactly one join"), ambiguous.getMessage)
    // a forward bound is rejected with guidance, not silently mis-planned
    val fwd = intercept[Exception] {
      ext.sql(
        """SELECT * FROM asof_sql_l l ASOF JOIN asof_sql_r r
          |  ON l.uid = r.uid AND l.ts <= r.ts""".stripMargin).collect()
    }
    assert(fwd.getMessage.contains("backward"), fwd.getMessage)
  }
}
