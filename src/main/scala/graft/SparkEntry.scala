package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator family's named queries; `oracleSql`
  * carries the DuckDB-runnable ANSI equivalent for each (omitted only for
  * ops whose semantics aren't SQL-expressible — the driver then records a
  * weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.CoreOps.playbackFlatten(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data extensions (dedup, similarity, text analysis,
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.CoreOps.queries ++ ops.RelationalOps.queries ++ ops.ScalarOps.queries ++
      ops.AnalyticOps.queries ++
      operators.Dedup.queries ++ operators.TextAnalysis.queries ++
      operators.Similarity.queries ++ operators.Multimodal.queries ++
      operators.Sampling.queries ++ operators.Tuning.queries ++
      streaming.EventStream.queries ++
      ops.AsOfJoin.queries ++ ops.NativeAsOf.queries ++ ops.RangeJoin.queries ++
      ops.LakeOps.queries ++ ops.TimeSeriesOps.queries ++ ops.GraphOps.queries ++
      ops.TypedOps.queries ++ sources.PagedApi.queries ++ sources.CatalogApi.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.CoreOps.oracles ++ ops.RelationalOps.oracles ++ ops.ScalarOps.oracles ++
      ops.AnalyticOps.oracles ++
      operators.Dedup.oracles ++ operators.TextAnalysis.oracles ++
      operators.Similarity.oracles ++ operators.Multimodal.oracles ++
      operators.Sampling.oracles ++ operators.Tuning.oracles ++
      streaming.EventStream.oracles ++
      ops.AsOfJoin.oracles ++ ops.NativeAsOf.oracles ++ ops.RangeJoin.oracles ++
      ops.LakeOps.oracles ++ ops.TimeSeriesOps.oracles ++ ops.GraphOps.oracles ++
      ops.TypedOps.oracles ++ sources.PagedApi.oracles ++ sources.CatalogApi.oracles
}
