package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TUNING REPORT — the closing loop over the three parameter-sweep
  * curves (round-19's q_lsh_sweep / q_ann_sweep / q_quality_sweep): a
  * curation pipeline doesn't read three curves by hand, it states its
  * targets and gets the knob settings back. One call reuses the three
  * pinned sweep passes verbatim and applies the stated policy:
  *
  *  - `lsh_banding`: the CHEAPEST banding (fewest candidate pairs, then
  *    fewest bands) whose measured recall meets the target — candidates
  *    are the serving cost at 100 TB, so cost-minimization subject to
  *    recall is the right objective;
  *  - `ivf_nprobe`: the SMALLEST nprobe meeting the recall target —
  *    probes scanned is the ANN serving cost, monotone in nprobe;
  *  - `quality_cutoff`: the HIGHEST score bucket whose cumulative
  *    kept-token share meets the training budget — "keep the best
  *    documents until the token budget is met".
  *
  * Output is one row per knob (knob, chosen, aux, metric_ppm, cost) —
  * each selection runs over the sweep's few-row result frame, so the
  * report costs exactly the three sweeps. The DuckDB oracle restates
  * the three sweeps AND the selection policy, so a wrong pick (an
  * off-by-one on the recall boundary, a tie broken differently)
  * hash-fails, not just a wrong curve.
  */
object Tuning {

  /** Recall floor (ppm) for the dedup-banding and ANN-nprobe knobs. */
  val RecallTargetPpm = 900000L
  /** Kept-token floor (ppm of the corpus) for the quality cutoff. */
  val TokenBudgetPpm = 700000L

  def tuningReport(spark: SparkSession, d: String): DataFrame = {
    // The three sweeps are INDEPENDENT jobs whose construction each runs
    // eager pin jobs (localCheckpoint); built sequentially the report's
    // wall-clock is their SUM. Overlapping the constructions on a small
    // pool lets each sweep's tail back-fill the others' idle executors
    // (guide §2.6) — same jobs, same pinned frames, same output; measured
    // 4.10 → 2.21 s warm min at sf0.1/local[32] (OPTIMIZATION_r21.md). On
    // a cluster this is the same dial: three independent job groups
    // sharing the scheduler.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val (lshSweep, ivfSweep, cutSweep) =
      try {
        val fLsh = scala.concurrent.Future(Dedup.lshBandingSweep(spark, d))
        val fIvf = scala.concurrent.Future(Similarity.ivfNprobeSweep(spark, d))
        val fCut = scala.concurrent.Future(TextAnalysis.qualitySweep(spark, d))
        import scala.concurrent.duration.Duration
        // Future.sequence fails as soon as ANY sweep fails (a per-future
        // Await chain would sit through the healthy sweeps first —
        // round-21 review finding)
        val Seq(lsh, ivf, cut) = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(Seq(fLsh, fIvf, fCut)),
          Duration.Inf)
        (lsh, ivf, cut)
      } finally pool.shutdown()
    val lsh = lshSweep
      .where(col("recall_ppm") >= RecallTargetPpm)
      .orderBy(col("n_cand"), col("bands"))
      .limit(1)
      .select(lit("lsh_banding").as("knob"), col("bands").as("chosen"),
        col("rows_per_band").as("aux"), col("recall_ppm").as("metric_ppm"),
        col("n_cand").as("cost"))
    val ivf = ivfSweep
      .where(col("recall_ppm") >= RecallTargetPpm)
      .orderBy(col("nprobe"))
      .limit(1)
      .select(lit("ivf_nprobe").as("knob"), col("nprobe").as("chosen"),
        col("n_ivf").as("aux"), col("recall_ppm").as("metric_ppm"),
        col("nprobe").as("cost"))
    val cut = cutSweep
      .where(col("cum_tokens_ppm") >= TokenBudgetPpm)
      .orderBy(col("bucket").desc)
      .limit(1)
      .select(lit("quality_cutoff").as("knob"), col("bucket").as("chosen"),
        col("cum_docs").as("aux"), col("cum_tokens_ppm").as("metric_ppm"),
        col("cum_tokens").as("cost"))
    lsh.unionAll(ivf).unionAll(cut).orderBy("knob")
  }

  val tuningReportSql: String =
    s"""SELECT * FROM (
       |SELECT 'lsh_banding' AS knob, bands AS chosen, rows_per_band AS aux,
       |       recall_ppm AS metric_ppm, n_cand AS cost
       |FROM (${Dedup.lshBandingSweepSql()})
       |WHERE recall_ppm >= $RecallTargetPpm
       |ORDER BY n_cand, bands LIMIT 1)
       |UNION ALL
       |SELECT * FROM (
       |SELECT 'ivf_nprobe' AS knob, nprobe AS chosen, n_ivf AS aux,
       |       recall_ppm AS metric_ppm, nprobe AS cost
       |FROM (${Similarity.ivfNprobeSweepSql()})
       |WHERE recall_ppm >= $RecallTargetPpm
       |ORDER BY nprobe LIMIT 1)
       |UNION ALL
       |SELECT * FROM (
       |SELECT 'quality_cutoff' AS knob, bucket AS chosen, cum_docs AS aux,
       |       cum_tokens_ppm AS metric_ppm, cum_tokens AS cost
       |FROM (${TextAnalysis.qualitySweepSql})
       |WHERE cum_tokens_ppm >= $TokenBudgetPpm
       |ORDER BY bucket DESC LIMIT 1)
       |ORDER BY knob""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_tuning_report" -> ((s, d) => tuningReport(s, d)))

  def oracles: Map[String, String] =
    Map("q_tuning_report" -> tuningReportSql)
}
