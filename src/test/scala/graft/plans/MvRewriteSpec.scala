package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** MvRewriteRule: aggregates over the base scan must be answered from the
  * registered summary table exactly when the rewrite is provably exact —
  * and left alone otherwise. A/B: rewritten answers ≡ direct answers on
  * every firing shape; every guard case keeps the base scan. */
class MvRewriteSpec extends AnyFunSuite {

  private val d = "/root/testdata/sf0.001"

  // extensions need a fresh session (static conf — GraftExtensionsSpec
  // convention)
  private lazy val ext: SparkSession = {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private lazy val mvDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_spec_").toString
    MvRewriteRule.materialize(graft.Tables.lineitem(ext, d), mvDef(dir), dir)
    dir
  }

  private def mvDef(dir: String) = MvRewriteRule.MvDef(
    basePath = s"$d/lineitem.parquet",
    groupCols = Seq("l_returnflag", "l_linestatus"),
    cnt = "mv_cnt",
    sums = Map("l_quantity" -> "mv_sum_qty"),
    mins = Map("l_extendedprice" -> "mv_min_price"),
    maxs = Map("l_extendedprice" -> "mv_max_price"),
    mvPlan = s => s.read.parquet(dir).queryExecution.analyzed)

  private def withMv[T](body: => T): T = {
    MvRewriteRule.register(ext, mvDef(mvDir))
    try body finally MvRewriteRule.unregister(ext, s"$d/lineitem.parquet")
  }

  private def q(): DataFrame =
    graft.Tables.lineitem(ext, d)
      .where(col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag")

  // Relation.toString omits the location — inspect rootPaths directly
  private def fired(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten.exists(_.contains(mvDir))

  test("rewrite fires and the answers equal the direct plan's") {
    val direct = q().collect().map(_.toString).toSeq
    val rewritten = withMv {
      val df = q()
      assert(fired(df), df.queryExecution.optimizedPlan.toString)
      df.collect().map(_.toString).toSeq
    }
    assert(rewritten === direct)
  }

  test("exact-grain grouping (both MV columns) also rewrites") {
    val mk = () => graft.Tables.lineitem(ext, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
    val direct = mk().collect().map(_.toString).toSeq
    val rewritten = withMv {
      val df = mk()
      assert(fired(df), df.queryExecution.optimizedPlan.toString)
      df.collect().map(_.toString).toSeq
    }
    assert(rewritten === direct)
  }

  test("guards: non-group filter, non-rollupable agg, distinct, finer grouping") {
    withMv {
      // filter on a non-group column → base rows needed
      assert(!fired(graft.Tables.lineitem(ext, d)
        .where(col("l_quantity") > 10)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("c"))))
      // avg is not rollup-able bit-exactly → not matched
      assert(!fired(graft.Tables.lineitem(ext, d)
        .groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))))
      // distinct aggregate → not matched
      assert(!fired(graft.Tables.lineitem(ext, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n"))))
      // grouping on a non-MV column → finer grain than the MV
      assert(!fired(graft.Tables.lineitem(ext, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))))
      // sum of a column the MV does not carry
      assert(!fired(graft.Tables.lineitem(ext, d)
        .groupBy(col("l_returnflag")).agg(sum(col("l_tax")).as("s"))))
    }
  }

  test("unregistered: the same query keeps the base scan") {
    assert(!fired(q()))
  }

  test("the registry is per-session: a sibling session is never rewritten") {
    // newSession shares the SparkContext AND the injected extensions, but
    // gets its own optimizer (and thus its own MvRewriteRule instance)
    val sibling = ext.newSession()
    def sq(s: SparkSession): DataFrame = graft.Tables.lineitem(s, d)
      .where(col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
    withMv {
      assert(fired(sq(ext)), "owning session must rewrite")
      assert(!fired(sq(sibling)),
        "an MV registered in one session must NEVER rewrite another's query")
      // and registering in the sibling affects only the sibling
      MvRewriteRule.register(sibling, mvDef(mvDir))
      try assert(fired(sq(sibling)))
      finally MvRewriteRule.unregister(sibling, s"$d/lineitem.parquet")
    }
    // after unregister (withMv's finally), the owner stops rewriting too
    assert(!fired(sq(ext)))
  }

  test("a dropped session's registrations are GC-reclaimable") {
    // MvDef.mvPlan takes the session as a PARAMETER — a closure capturing
    // it would make the weak map's value reference its own key and pin
    // discarded sessions forever. Register in a throwaway session, drop
    // the only strong reference, and watch the weak entry expunge.
    val before = MvRewriteRule.registeredSessionCount
    var throwaway: SparkSession = ext.newSession()
    MvRewriteRule.register(throwaway, mvDef(mvDir))
    assert(MvRewriteRule.registeredSessionCount === before + 1)
    val ref = new java.lang.ref.WeakReference[SparkSession](throwaway)
    throwaway = null
    SparkSession.clearActiveSession()
    val deadline = System.nanoTime + 30_000_000_000L
    while (ref.get() != null && System.nanoTime < deadline) {
      System.gc(); Thread.sleep(50)
    }
    SparkSession.setActiveSession(ext)
    assert(ref.get() == null,
      "the throwaway session was never collected — something (the MV " +
        "registry's value closure?) still references it")
    // other dropped sessions (e.g. an earlier test's sibling) may
    // expunge in the same GC — assert the count fell back, not equality
    assert(MvRewriteRule.registeredSessionCount <= before,
      "the weak registry entry must expunge once the session is gone")
  }
}
