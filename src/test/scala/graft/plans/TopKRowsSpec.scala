package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** TopKRows: the bounded-heap top-k-per-group aggregate must reproduce the
  * window `row_number() <= k` answer (rank order included) while planning
  * as a mergeable hash aggregate — on real parquet scans, under ties,
  * short groups, and null sort-key fields. */
class TopKRowsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session
  private val d = "/root/testdata/sf0.001"
  private val shim = org.apache.spark.sql.GraftSqlShim

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def topkOf(df: DataFrame, group: String, k: Int,
      value: org.apache.spark.sql.Column,
      ord: org.apache.spark.sql.Column): DataFrame = {
    val agg = shim.column(TopKRows(
      shim.expression(value), shim.expression(ord), k).toAggregateExpression())
    df.groupBy(col(group)).agg(agg.as("top"))
      .select(col(group), posexplode(col("top")))
      .select(col(group), (col("pos") + 1).cast("long").as("rk"), col("col.*"))
  }

  test("top-3 events per user ≡ the window row_number form, ranks aligned") {
    val ev = graft.Tables.events(spark, d)
    val got = topkOf(ev, "user_id", 3,
      struct(col("event_id"), col("value")),
      struct(-col("value"), col("event_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val ref = graft.Tables.events(spark, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("user_id"), col("rk"), col("event_id"), col("value"))
    assert(sortedRows(got) == sortedRows(ref))
    // groups smaller than k return their full membership (no padding)
    val sizes = got.groupBy("user_id").count()
      .join(ev.groupBy("user_id").count().withColumnRenamed("count", "n"), "user_id")
    assert(sizes.where(col("count") =!= least(col("n"), lit(3))).isEmpty)
  }

  test("plans as partial+final ObjectHashAggregate with no Window, no Sort") {
    val ev = graft.Tables.events(spark, d)
    val got = topkOf(ev, "user_id", 3,
      struct(col("event_id")), struct(col("ts"), col("event_id")))
    val plan = got.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("null sort-key fields order nulls-first, matching asc_nulls_first windows") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType)))
    val rows: Seq[org.apache.spark.sql.Row] = Seq(
      org.apache.spark.sql.Row(1, null, 10), org.apache.spark.sql.Row(1, Int.box(5), 11),
      org.apache.spark.sql.Row(1, Int.box(2), 12), org.apache.spark.sql.Row(1, null, 13),
      org.apache.spark.sql.Row(2, Int.box(7), 20))
    val df = spark.createDataFrame(rows.asJava, schema)
      // parquet-backed round trip not needed: aggregate is runtime, not a rule
      .repartition(3)
    val got = topkOf(df, "g", 2, struct(col("id")), struct(col("k"), col("id")))
    val w = Window.partitionBy(col("g"))
      .orderBy(col("k").asc_nulls_first, col("id").asc)
    val ref = df.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 2).select(col("g"), col("rk"), col("id"))
    assert(sortedRows(got) == sortedRows(ref))
  }

  test("topk_rows SQL surface under the extensions session") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext =
      try SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(spark)
        SparkSession.setActiveSession(spark)
      }
    graft.Tables.events(ext, d).createOrReplaceTempView("topk_events")
    val viaSql = ext.sql(
      """SELECT user_id, r.event_id, r.event_type
        |FROM (SELECT user_id,
        |             topk_rows(struct(event_id, event_type),
        |                       struct(ts, event_id), 2) AS tops
        |      FROM topk_events GROUP BY user_id)
        |LATERAL VIEW explode(tops) AS r""".stripMargin)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val ref = graft.Tables.events(spark, d)
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 2)
      .select("user_id", "event_id", "event_type")
    assert(sortedRows(viaSql) == sortedRows(ref))
  }
}
