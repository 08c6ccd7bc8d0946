package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The SparkSessionExtensions surface: a session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` must rewrite bound
  * full-DP Levenshtein predicates to the banded threshold form, without
  * changing any filter's row set. */
class GraftExtensionsSpec extends AnyFunSuite {

  // `spark.sql.extensions` is a STATIC conf read from the SparkContext —
  // on a suite-shared context it cannot take effect (Verify/Bench create
  // their own context, so the config path works there; verified by a
  // standalone run). Tests must hand the extensions object to the builder.
  private lazy val ext: SparkSession = {
    val base = SparkSpec.session // ensures the context exists
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

  // parquet-backed (a LocalRelation would be constant-folded away before
  // the rule's effect is observable in the optimized plan)
  private def pairs(s: SparkSession) =
    graft.Tables.customer(s, "/root/testdata/sf0.001")
      .select(col("c_name").as("a"), lit("Customer#100").as("b"))

  private def thresholds(s: SparkSession, cond: String): Seq[Levenshtein] =
    pairs(s).where(expr(cond))
      .queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein => l })

  test("<= k rewrites to the banded form (threshold present in the plan)") {
    val ls = thresholds(ext, "levenshtein(a, b) <= 2")
    assert(ls.nonEmpty && ls.forall(_.threshold.isDefined), ls.toString)
  }

  test("< k rewrites to banded k-1; unbounded projection is untouched") {
    val ls = thresholds(ext, "levenshtein(a, b) < 3")
    assert(ls.nonEmpty && ls.forall(
      _.threshold.exists(_.toString.contains("2"))), ls.toString)
    val proj = pairs(ext).select(expr("levenshtein(a, b)").as("d"))
      .queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein => l })
    assert(proj.nonEmpty && proj.forall(_.threshold.isEmpty))
  }

  test("rewritten filters keep exactly the unrewritten row sets") {
    for (cond <- Seq("levenshtein(a, b) <= 0", "levenshtein(a, b) <= 2",
        "levenshtein(a, b) < 1", "levenshtein(a, b) < 4")) {
      val got = pairs(ext).where(expr(cond))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      // reference row set from the full-DP distance computed as a projection
      // (projections are not rewritten), filtered driver-side
      val bound = cond.split(" ").takeRight(1).head.toInt
      val le = cond.contains("<=")
      val ref = pairs(ext).select(col("a"), col("b"),
          expr("levenshtein(a, b)").as("d"))
        .collect()
        .filter(r => if (le) r.getInt(2) <= bound else r.getInt(2) < bound)
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === ref, cond)
    }
  }

  test("the plain suite session (no extensions) keeps the full-DP form") {
    val ls = thresholds(SparkSpec.session, "levenshtein(a, b) <= 2")
    assert(ls.nonEmpty && ls.forall(_.threshold.isEmpty))
  }
}
