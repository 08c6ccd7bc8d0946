package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** KmvSketch: the k-minimum-values sketch must hold EXACTLY the k
  * smallest distinct hashes of its group regardless of partitioning
  * (merge path), skip nulls, go exact below k, and plan as a mergeable
  * ObjectHashAggregate — plus the SQL registration surface. */
class KmvSketchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session
  private val shim = org.apache.spark.sql.GraftSqlShim

  private def kmv(c: org.apache.spark.sql.Column, k: Int) =
    shim.column(KmvSketch(shim.expression(c), k).toAggregateExpression())

  /** hash-derived deterministic values with heavy duplication */
  private def frame(n: Int, mod: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val g = i % 3
      val v = graft.functions.Hashing.hexHashLocal(s"kmv:$g:${i % mod}")
      (g, v)
    }.toDF("g", "h")
  }

  test("sketch = k smallest distinct hashes, any partitioning") {
    val df = frame(3000, 400)
    val expected = df.collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (g, vs) =>
        g -> vs.map(_._2).distinct.sorted.take(64).toSeq
      }
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts).groupBy(col("g"))
        .agg(kmv(col("h"), 64).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      assert(got.keySet === expected.keySet)
      expected.foreach { case (g, exp) => assert(got(g) === exp, s"group $g") }
    }
  }

  test("below k the sketch is the whole distinct set (exact regime)") {
    val df = frame(300, 10) // 10 distinct values per group
    val got = df.groupBy(col("g")).agg(kmv(col("h"), 64).as("s"))
      .select(size(col("s")).as("n")).collect().map(_.getInt(0))
    assert(got.forall(_ == 10))
  }

  test("nulls are skipped; all-null group yields an empty sketch") {
    import spark.implicits._
    val df = Seq((0, Some(5L)), (0, None), (1, None), (1, None))
      .toDF("g", "h")
    val got = df.groupBy(col("g")).agg(kmv(col("h"), 8).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got(0) === Seq(5L))
    assert(got(1) === Seq.empty)
  }

  test("plans as ObjectHashAggregate (mergeable partial+final, no sort)") {
    val df = frame(100, 20).groupBy(col("g")).agg(kmv(col("h"), 16).as("s"))
    df.collect() // AQE finalizes lazily — run before asserting
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("SQL surface: kmv_sketch(hash, k) via the extension registration") {
    // clear the suite-shared session so withExtensions takes effect
    // (GraftExtensionsSpec convention — a reused session keeps only
    // runtime confs, never new function registrations)
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = try SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
    try {
      val rows = ext.sql(
        """SELECT kmv_sketch(h, 4) AS s FROM VALUES
          |  (9L), (1L), (7L), (1L), (3L), (5L), (CAST(NULL AS BIGINT))
          |AS t(h)""".stripMargin).collect()
      assert(rows.head.getSeq[Long](0) === Seq(1L, 3L, 5L, 7L))
      val err = intercept[Exception] {
        ext.sql("SELECT kmv_sketch('abc', 4) FROM VALUES (1) t(x)").collect()
      }
      assert(err.getMessage.toLowerCase.contains("bigint")
        || err.getMessage.contains("DATATYPE_MISMATCH"), err.getMessage)
    } finally ()
  }
}
