package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.{AsOfJoin, NativeAsOf}

/** Seeded random differential tests for the round-6 engine components:
  * the native as-of exec against the union-window composition, and the
  * dedup rewrite against the un-rewritten window — on frames with hot
  * keys, duplicate timestamps, boundary-equal rows, and null keys/ts that
  * the curated testdata is too polite to produce. Seeds are fixed, so a
  * failure reproduces exactly. */
class RandomDifferentialSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

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

  /** Random (key, ts, tag) frame: few keys (hot), coarse ts grid (many
    * exact ties and boundary collisions), ~3% null keys, ~3% null ts. */
  private def randFrame(s: SparkSession, seed: Long, n: Int, tagPrefix: String): DataFrame = {
    val rng = new scala.util.Random(seed)
    import s.implicits._
    (1 to n).map { i =>
      val k: java.lang.Long = if (rng.nextInt(33) == 0) null else rng.nextInt(7).toLong
      val t: java.lang.Long = if (rng.nextInt(33) == 0) null else rng.nextInt(40).toLong
      (k, t, s"$tagPrefix$i")
    }.toDF("k", "t", "tag")
  }

  test("native as-of ≡ composition on 6 random hot-key frames (incl. outer)") {
    for (seed <- 1L to 3L) {
      // null keys/ts EXCLUDED here: the union-window composition groups
      // null keys into one window partition (null would match null),
      // while the native exec follows SQL/DuckDB ASOF semantics (null
      // never matches) — a real divergence, pinned in AsOfNativeSpec's
      // edge test and documented on AsOfJoin.asOf; production callers
      // pre-filter
      val l = randFrame(spark, seed, 300, "L")
        .where(col("k").isNotNull && col("t").isNotNull)
      val r = randFrame(spark, seed + 100, 200, "R")
        .where(col("k").isNotNull && col("t").isNotNull)
      // composition needs right unique per (key, ts): pre-dedup like the
      // production queries do
      val rUniq = r.groupBy("k", "t").agg(max("tag").as("tag"))
      for (outer <- Seq(false, true)) {
        val nat = NativeAsOf.asOfNative(l, rUniq, "k", "t", leftOuter = outer)
          .select(col("tag"), col("asof_tag"))
        val cmp = AsOfJoin.asOf(l, rUniq, "k", "t")
          .select(col("tag"), col("__asof_tag").as("asof_tag"))
        val cmpFiltered = if (outer) cmp else cmp.where(col("asof_tag").isNotNull)
        val natFiltered = if (outer) nat else nat
        assert(natFiltered.exceptAll(cmpFiltered).isEmpty &&
          cmpFiltered.exceptAll(natFiltered).isEmpty,
          s"seed=$seed outer=$outer")
      }
    }
  }

  test("dedup rewrite ≡ window on 3 random frames with heavy ties") {
    for (seed <- 11L to 13L) {
      // null keys KEPT: GROUP BY and window PARTITION BY both coalesce
      // nulls into one group, so the rewrite must agree there too
      def df(s: SparkSession) = randFrame(s, seed, 400, "X")
      // TOTAL order (tag tie-break) so both plans pick identical rows
      val w = Window.partitionBy(col("k")).orderBy(col("t").asc, col("tag").asc)
      def firstRows(s: SparkSession) =
        df(s).withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .collect().map(_.toString).toSeq.sorted
      assert(firstRows(ext) == firstRows(spark), s"seed=$seed")
    }
  }
}
