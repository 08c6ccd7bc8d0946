package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Hashing

/** Reproducible sampling and splitting for training-data pipelines.
  *
  * Everything keys off the deterministic content-independent hash of the
  * document id — the property that matters at 100 TB: the same document
  * lands in the same split on every run, on any cluster, regardless of
  * partitioning, with no RNG state to coordinate. Map-only (scan-speed),
  * and the hash is the cross-engine [[Hashing.hexHash]] so the sample
  * membership itself is oracle-checked.
  */
object Sampling {

  private def bucket100(c: org.apache.spark.sql.Column) =
    pmod(Hashing.hexHash(c.cast("string")), lit(100L))

  private def bucket100Sql(expr: String) =
    s"(${Hashing.hexHashSql(s"CAST($expr AS VARCHAR)")} % 100)"

  /** Deterministic ~10% sample by id-hash bucket. */
  def hashSample(spark: SparkSession, d: String, pct: Int = 10): DataFrame =
    documents(spark, d)
      .where(bucket100(col("doc_id")) < pct)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  def hashSampleSql(pct: Int = 10): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE ${bucket100Sql("doc_id")} < $pct""".stripMargin

  /** STRATIFIED sample: a different deterministic rate per stratum (here:
    * per source), the training-data rebalancing primitive — downsample the
    * over-represented crawl, keep all of the rare high-quality source. Same
    * hash-bucket machinery as [[hashSample]] so membership is reproducible
    * and oracle-checked; rates are a plan-time literal map (no data-driven
    * discovery pass). Map-only: the filter runs at scan speed and pushes
    * into the parquet scan like any comparison predicate. */
  /** Rate by stratum class (sources are `src0`..`src19`; class = numeric
    * suffix mod 4): 10% / 40% / 80% / keep-all. */
  val StrataRates: Seq[Int] = Seq(10, 40, 80, 100)

  def stratifiedSample(spark: SparkSession, d: String): DataFrame = {
    val cls = substring(col("source"), 4, 10).cast("int") % 4
    val rate = StrataRates.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (pct, i)) => when(cls === i, lit(pct)).otherwise(acc)
    }
    documents(spark, d)
      .where(bucket100(col("doc_id")) < rate)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  def stratifiedSampleSql: String = {
    val rate = StrataRates.zipWithIndex.foldRight("0") {
      case ((pct, i), acc) =>
        s"CASE WHEN (TRY_CAST(substring(source, 4, 10) AS INT) % 4) = $i THEN $pct ELSE $acc END"
    }
    s"""SELECT doc_id, source, lang, n_chars FROM documents
       |WHERE ${bucket100Sql("doc_id")} < $rate
       |ORDER BY doc_id""".stripMargin
  }

  /** Train/val/test assignment: 90/5/5 by hash bucket — stable across runs
    * and engines. */
  def dataSplit(spark: SparkSession, d: String): DataFrame = {
    val b = bucket100(col("doc_id"))
    documents(spark, d).select(
      col("doc_id"), col("lang"),
      when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
  }

  val dataSplitSql: String = {
    val b = bucket100Sql("doc_id")
    s"""SELECT doc_id, lang,
       |       CASE WHEN $b < 90 THEN 'train'
       |            WHEN $b < 95 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  /** Corpus rollup per (lang, source): the reporting pass every curation
    * pipeline runs after filtering — doc counts, volume, mean length.
    * n_chars is integral so the sums (and the single avg division) are
    * exact in fp across engines. */
  def corpusStats(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        avg(col("n_chars")).as("mean_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang", "source")

  val corpusStatsSql: String =
    """SELECT lang, source,
      |       count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       avg(n_chars) AS mean_chars,
      |       min(n_chars) AS min_chars,
      |       max(n_chars) AS max_chars
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hash_sample"  -> ((s, d) => hashSample(s, d)),
    "q_strat_sample" -> ((s, d) => stratifiedSample(s, d)),
    "q_data_split"   -> ((s, d) => dataSplit(s, d)),
    "q_corpus_stats" -> ((s, d) => corpusStats(s, d)))

  def oracles: Map[String, String] = Map(
    "q_hash_sample"  -> hashSampleSql(),
    "q_strat_sample" -> stratifiedSampleSql,
    "q_data_split"   -> dataSplitSql,
    "q_corpus_stats" -> corpusStatsSql)
}
