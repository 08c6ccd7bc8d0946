package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}

/** Engine-wide scale lint: NO query may plan an unpartitioned window.
  *
  * `row_number()/ntile()/sum() OVER (ORDER BY ...)` with no PARTITION BY
  * executes as ONE WindowExec partition — every row through a single task,
  * the canonical 100 TB scale-killer ("No Partition Defined for Window"
  * warning at runtime). Rounds 1–19 accumulated four such sites before the
  * two-pass exact primitives ([[graft.operators.ScaleTools.globalRank]] /
  * globalNtile / globalRankPrefixSum / globalPrefixMax) replaced them; this
  * spec walks the optimized logical plan of EVERY query in the driver
  * contract so a fifth site fails CI with its query name instead of
  * shipping. Runs at the smoke scale factor — plan shapes don't change
  * with data volume, and eager queries (procedures, streaming drives) are
  * cheap there.
  */
class WindowLintSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("no query plans an unpartitioned Window over any input") {
    // dedicated session: the extensions are part of the production plan
    // pipeline (banded levenshtein, row_number-dedup, chunk_tokens parser),
    // and several queries require them to even analyze
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    ext.sparkContext.setLogLevel("ERROR")
    try {
      val skipped = Seq.newBuilder[String]
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val bad =
            try {
              val df = fn(ext, d)
              df.queryExecution.optimizedPlan.collectWithSubqueries {
                case w: LWindow if w.partitionSpec.isEmpty => "Window"
                case w: WindowGroupLimit if w.partitionSpec.isEmpty =>
                  "WindowGroupLimit"
              }
            } catch {
              // an unbuildable query is a coverage hole — the lint can't
              // vouch for a plan it never saw, so report it too
              case e: Throwable =>
                skipped += s"$name: ${e.getClass.getSimpleName}: " +
                  String.valueOf(e.getMessage).linesIterator.take(1).mkString
                Nil
            }
          if (bad.isEmpty) Nil else Seq(s"$name: ${bad.mkString(", ")}")
      }
      assert(offenders.isEmpty,
        "unpartitioned windows (single-partition WindowExec at scale):\n" +
          offenders.mkString("\n"))
      val holes = skipped.result()
      assert(holes.isEmpty,
        s"queries the lint could not plan (coverage holes):\n${holes.mkString("\n")}")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
