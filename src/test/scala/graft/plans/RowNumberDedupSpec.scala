package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** RowNumberDedupRule: `row_number()=1` windows must become hash
  * aggregates under the extensions session, with answers identical to the
  * un-rewritten window on a plain session — including null sort keys, ties
  * broken by a total order, desc and asc specs, and residual conjuncts. */
class RowNumberDedupSpec extends AnyFunSuite {

  private lazy val plain: SparkSession = SparkSpec.session

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

  // events at sf0.001, parquet-backed so the rewrite survives real scans
  private def latest(s: SparkSession): DataFrame = {
    val ev = graft.Tables.events(s, "/root/testdata/sf0.001")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("user_id", "event_id", "event_type")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("rewrite fires: ObjectHashAggregate, no Window, no sort for the dedup") {
    // string audit (AQE wraps the tree, PlanAuditSpec convention)
    val plan = latest(ext).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).length == 2, plan) // partial + final
    assert(plan.contains("min_row_by"), plan)
  }

  test("rewritten answer ≡ window answer (desc-nulls-last spec)") {
    assert(sortedRows(latest(ext)) == sortedRows(latest(plain)))
    assert(latest(ext).count() > 0)
  }

  test("asc spec with null sort keys and ties: identical row sets") {
    import scala.jdk.CollectionConverters._
    val schema = "grp INT, ord BIGINT, payload STRING"
    val rows = Seq(
      Row(1, 5L, "a"), Row(1, null, "b"), Row(1, 5L, "c"),
      Row(2, 2L, "d"), Row(2, 3L, "e"), Row(3, null, "f"))
    def df(s: SparkSession) = s.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    def first(s: SparkSession) = {
      val w = Window.partitionBy(col("grp")).orderBy(col("ord").asc, col("payload").asc)
      df(s).withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    }
    // total order (payload tie-break) ⇒ engines must agree exactly
    assert(sortedRows(first(ext)) == sortedRows(first(plain)))
    // null ord sorts FIRST under asc: groups 1 and 3 pick the null rows
    val picked = first(ext).select("grp", "payload").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(picked == Map(1 -> "b", 2 -> "d", 3 -> "f"))
  }

  test("residual conjuncts survive above the aggregate") {
    val ev = graft.Tables.events(ext, "/root/testdata/sf0.001")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val q = ev.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") === "click")
      .select("user_id", "event_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // reference: filter applied after the window dedup, not before
    val evP = graft.Tables.events(plain, "/root/testdata/sf0.001")
    val ref = evP.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") === "click")
      .select("user_id", "event_id")
    assert(sortedRows(q) == sortedRows(ref))
  }

  test("argmin_row SQL aggregate: earliest event per user ≡ window form") {
    graft.Tables.events(ext, "/root/testdata/sf0.001")
      .createOrReplaceTempView("rnd_events")
    val viaAgg = ext.sql(
      """SELECT user_id, r.event_id AS event_id, r.event_type AS event_type
        |FROM (SELECT user_id,
        |             argmin_row(struct(event_id, event_type), struct(ts, event_id)) AS r
        |      FROM rnd_events GROUP BY user_id)""".stripMargin)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val viaWin = graft.Tables.events(plain, "/root/testdata/sf0.001")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("user_id", "event_id", "event_type")
    assert(sortedRows(viaAgg) == sortedRows(viaWin))
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Sort"), plan)
  }

  test("guards: rn=2, extra window outputs, mixed directions stay windows") {
    val ev = graft.Tables.events(ext, "/root/testdata/sf0.001")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    def hasWindow(df: DataFrame) =
      df.queryExecution.executedPlan.toString.contains("Window")
    assert(hasWindow(ev.withColumn("rn", row_number().over(w)).where(col("rn") === 2)))
    assert(hasWindow(ev.withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w)).where(col("rn") === 1)))
    val mixed = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").asc)
    assert(hasWindow(ev.withColumn("rn", row_number().over(mixed)).where(col("rn") === 1)))
  }
}
