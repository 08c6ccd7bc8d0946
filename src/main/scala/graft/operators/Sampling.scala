package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.{Hashing, Money}

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

  /** DOMAIN FREQUENCY CAP — the corpus-balancing stage that keeps a
    * handful of over-represented sources from dominating the training
    * mix: per source, rank documents by a deterministic quality proxy
    * (longer first, doc_id tiebreak) and keep the top `cap`. The window
    * partitions on the source key, so the shuffle is domain-keyed —
    * at 100 TB that is the natural key distribution, and a skewed mega-
    * domain is exactly what AQE skew-split handles (rank-within-key
    * still only needs the per-key top slice after partial limits). */
  def domainCap(spark: SparkSession, d: String, cap: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    documents(spark, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= cap.toLong)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum("doc_id").as("sum_doc_id"),
        min("n_chars").as("min_kept_chars"))
      .orderBy("source")
  }

  def domainCapSql(cap: Int = 10): String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
       |  FROM documents)
       |SELECT source, count(*) AS n_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       |  min(n_chars) AS min_kept_chars
       |FROM ranked WHERE rk <= $cap
       |GROUP BY source ORDER BY source""".stripMargin

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

  /** Temperature-scaled training-mix weights per source: weight ∝
    * n_tokens^α with α = 0.5 — the standard upweight-the-tail sampling
    * temperature for multi-source pretraining mixes. α is DELIBERATELY 1/2:
    * IEEE-754 sqrt is correctly rounded (unlike libm pow), so the per-source
    * weight is bit-identical across engines with no tolerance games — it's
    * quantized to an integer (floor(√tokens·1000)) and the final ppm share
    * is pure integer arithmetic. One fact shuffle (groupBy source); the
    * source-cardinality total broadcasts back. */
  def mixWeights(spark: SparkSession, d: String): DataFrame = {
    val per = documents(spark, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("qsqrt",
        floor(sqrt(col("n_tokens").cast("double")) * 1000).cast("long"))
    val tot = per.agg(sum(col("qsqrt")).as("tot"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(qsqrt * 1000000) div tot").as("weight_ppm"))
      .orderBy("source")
  }

  val mixWeightsSql: String =
    """WITH per AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), q AS (
      |  SELECT source, n_docs, n_tokens,
      |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS qsqrt
      |  FROM per
      |)
      |SELECT source, n_docs, n_tokens,
      |       CAST((qsqrt * 1000000) // (SELECT sum(qsqrt) FROM q) AS BIGINT) AS weight_ppm
      |FROM q ORDER BY source""".stripMargin

  /** Curriculum shard assignment: rank documents by a deterministic
    * curriculum key (longest first, id tie-break) and deal them
    * round-robin into [[NShards]] shards — the standard way to get
    * training shards that are balanced in BOTH doc count and volume
    * without a bin-packing pass. Output is the per-shard balance sheet
    * proving it (counts within 1, volumes near-equal). The global
    * row_number is [[ScaleTools.globalRank]] — range partition on the
    * curriculum key, broadcast per-partition counts as offsets — so the
    * widest stage is one range partition, never the whole corpus;
    * everything after is shard-sized. */
  val NShards = 16

  def shardAssign(spark: SparkSession, d: String): DataFrame = {
    ScaleTools.globalRank(
      documents(spark, d).select(col("doc_id"), col("n_chars")),
      Seq(col("n_chars").desc, col("doc_id").asc), "rank")
      .withColumn("shard", (col("rank") - 1) % NShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("rank")).as("first_rank"),
        max(col("rank")).as("last_rank"))
      .orderBy("shard")
  }

  val shardAssignSql: String =
    s"""WITH ranked AS (
      |  SELECT doc_id, n_chars,
      |         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
      |  FROM documents
      |)
      |SELECT (rank - 1) % $NShards AS shard,
      |       count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       min(rank) AS first_rank,
      |       max(rank) AS last_rank
      |FROM ranked
      |GROUP BY shard ORDER BY shard""".stripMargin

  // ---- deterministic negative sampling (retrieval / ranking training) -------

  /** Negatives per batch-slice customer. */
  val NegK = 3
  /** Deterministic batch slice (a shard of the customer dimension — the
    * production pipeline runs one such slice per task). */
  val NegCustLimit = 100L

  /** Hash-ranked NEGATIVE SAMPLING — the contrastive-training data builder:
    * for each customer in the batch slice, the [[NegK]] catalog items they
    * never purchased, chosen by ranking the ENTIRE catalog on the
    * deterministic pair hash h(customer:part). Same-run-anywhere property
    * as the split samplers: no RNG state, membership is reproducible and
    * oracle-checkable, and a re-run after a catalog append only shifts
    * pairs whose hash order changed.
    *
    * Scale shape: the catalog is a broadcast DIMENSION (items are bounded;
    * facts are not), so candidates = slice × catalog is a map-side
    * crossJoin at |slice|·|catalog| rows — sized by the batch slice, never
    * by the fact table. Purchases prune via one left-anti hash join on the
    * pair key; the per-customer top-k window then reuses that customer
    * partitioning (at production scale the window would be the
    * [[graft.functions.TopKPairs]] aggregate — same answer, map-side
    * partial top-k). */
  def negativeSample(spark: SparkSession, d: String): DataFrame = {
    val cust = customer(spark, d)
      .where(col("c_custkey") < NegCustLimit)
      .select(col("c_custkey"))
    val cand = cust.crossJoin(broadcast(part(spark, d).select(col("p_partkey"))))
      .withColumn("h", Hashing.hexHash(
        concat(col("c_custkey").cast("string"), lit(":"),
          col("p_partkey").cast("string"))))
    val purchased = lineitem(spark, d)
      .join(orders(spark, d).where(col("o_custkey") < NegCustLimit),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c_custkey"), col("l_partkey").as("p_partkey"))
      .distinct()
    // Round-21 A/B (guide §1.1 empirical loop): converting this window to
    // the [[graft.functions.TopKPairs]] partial aggregate — the documented
    // production shape — measured SLOWER here (1.93 → 2.31 s warm min,
    // one JVM): the typed-Aggregator path pays a tuple-encoder round trip
    // per candidate row, and at local[32] the window's one exchange is a
    // memory copy, so there are no network bytes for the pre-aggregation
    // to save. The window stays; on a real cluster the aggregate form
    // wins exactly as this scaladoc describes (shuffle carries k rows per
    // customer per map task instead of the full candidate set).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_custkey")).orderBy(col("h"), col("p_partkey"))
    cand.join(purchased, Seq("c_custkey", "p_partkey"), "left_anti")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= NegK)
      .select(col("c_custkey"), col("rank"), col("p_partkey"), col("h"))
      .orderBy("c_custkey", "rank")
  }

  val negativeSampleSql: String = {
    val h = Hashing.hexHashSql(
      "CAST(c_custkey AS VARCHAR) || ':' || CAST(p_partkey AS VARCHAR)")
    s"""WITH cand AS (
       |  SELECT c.c_custkey, p.p_partkey, $h AS h
       |  FROM customer c CROSS JOIN part p
       |  WHERE c.c_custkey < $NegCustLimit
       |), purchased AS (
       |  SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE o.o_custkey < $NegCustLimit
       |), ranked AS (
       |  SELECT c.c_custkey, c.p_partkey, c.h,
       |         row_number() OVER (PARTITION BY c.c_custkey
       |                            ORDER BY c.h, c.p_partkey) AS rank
       |  FROM cand c
       |  WHERE NOT EXISTS (SELECT 1 FROM purchased u
       |                    WHERE u.c_custkey = c.c_custkey
       |                      AND u.p_partkey = c.p_partkey)
       |)
       |SELECT c_custkey, CAST(rank AS BIGINT) AS rank, p_partkey, h
       |FROM ranked WHERE rank <= $NegK
       |ORDER BY c_custkey, rank""".stripMargin
  }

  // ---- weighted sampling (A-Res) -------------------------------------------

  /** Weighted sample without replacement — Efraimidis–Spirakis A-Res: each
    * item draws u ∈ (0,1) and gets key u^(1/w); the k largest keys are a
    * weighted sample without replacement. Here w = n_chars (size-biased
    * curation draw) and u is hash-derived (salted [[Hashing.hexHash]] of
    * the id → a 10⁻⁶-grid uniform), so membership is reproducible and
    * engine-independent like every sampler in this file. Ranked by
    * ln(u)/w — the same ordering as u^(1/w) (ln is monotone and negative
    * here) without the pow — and quantized to a 10⁻⁹ grid before the
    * comparison so both engines rank identical integers (a double ulp is
    * ~10⁻¹⁸ relative; the grid absorbs it). Top-k runs as
    * TakeOrderedAndProject: per-partition partial top-k, only k rows per
    * partition reach the driver-side merge — no global sort at 100 TB. */
  def weightedSample(spark: SparkSession, d: String, k: Int = 500): DataFrame = {
    val u = (pmod(Hashing.hexHash(concat(lit("ws:"), col("doc_id").cast("string"))),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
    val key = log(u) / col("n_chars").cast("double")
    documents(spark, d)
      .where(col("n_chars") > 0)
      .withColumn("key_q", floor(key * lit(1000000000.0)).cast("long"))
      .orderBy(col("key_q").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("source"), col("n_chars"), col("key_q"))
  }

  def weightedSampleSql(k: Int = 500): String = {
    val h = Hashing.hexHashSql("'ws:' || CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, source, n_chars, key_q FROM (
       |  SELECT doc_id, source, n_chars,
       |         CAST(floor(ln((CAST($h % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
       |                    / CAST(n_chars AS DOUBLE) * 1000000000.0) AS BIGINT) AS key_q
       |  FROM documents WHERE n_chars > 0) t
       |ORDER BY key_q DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  // ---- leakage-safe split (cluster-aware) -----------------------------------

  /** Train/val/test split that cannot leak near-identical text across
    * splits: every member of an exact-duplicate cluster is assigned by the
    * hash of the cluster REPRESENTATIVE (min doc_id over the content-hash
    * group), not its own id — the standard decontamination-adjacent
    * discipline for eval splits. Runs over [[Dedup.docsWithInjectedDups]]
    * so clusters are non-trivial on the synthetic corpus. One shuffle (the
    * content-hash window); the 8-byte hash is the partition key, never the
    * text. */
  def clusterSplit(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
    val b = bucket100(col("rep_id"))
    Dedup.docsWithInjectedDups(spark, d)
      .select(col("doc_id"), Hashing.hexHash(col("text")).as("content_hash"))
      .withColumn("rep_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("rep_id"),
        when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  val clusterSplitSql: String = {
    val b = bucket100Sql("rep_id")
    s"""WITH c AS (
       |  SELECT doc_id,
       |         min(doc_id) OVER (PARTITION BY ${Hashing.hexHashSql("text")}) AS rep_id
       |  FROM (${Dedup.docsWithInjectedDupsSql()})
       |)
       |SELECT doc_id, rep_id,
       |       CASE WHEN $b < 90 THEN 'train'
       |            WHEN $b < 95 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // ---- leave-one-out target encoding ---------------------------------------

  /** LOO target encoding of the customer market segment against order
    * totals: each row's feature is its category's target mean EXCLUDING
    * the row itself — (Σcents − own)/(n−1) — the leakage-free categorical
    * encoder. Shape: one hash agg down to category-cardinality stats, then
    * a BROADCAST join back onto the fact scan (the stats frame is tiny by
    * construction; the fact side never shuffles) — at 100 TB this is a
    * scan + map, not a window over five giant partitions. Exact integer
    * numerator/denominator → one deterministic double division,
    * floor-quantized. */
  def targetEncode(spark: SparkSession, d: String): DataFrame = {
    val oc = orders(spark, d)
      .join(customer(spark, d), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        Money.cents(col("o_totalprice")).as("cents"))
    val stats = oc.groupBy(col("c_mktsegment"))
      .agg(sum(col("cents")).as("seg_cents"), count(lit(1)).as("seg_n"))
    oc.join(broadcast(stats), Seq("c_mktsegment"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        floor((col("seg_cents") - col("cents")).cast("double") /
          (col("seg_n") - lit(1L)).cast("double") * lit(100.0))
          .cast("long").as("loo_mean_q"))
  }

  val targetEncodeSql: String = {
    val c = Money.centsSql("o_totalprice")
    s"""WITH oc AS (
       |  SELECT o_orderkey, c_mktsegment, $c AS cents
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |), stats AS (
       |  SELECT c_mktsegment, CAST(sum(cents) AS BIGINT) AS seg_cents,
       |         count(*) AS seg_n
       |  FROM oc GROUP BY 1
       |)
       |SELECT o_orderkey, oc.c_mktsegment,
       |       CAST(floor(CAST(seg_cents - cents AS DOUBLE)
       |                  / CAST(seg_n - 1 AS DOUBLE) * 100.0) AS BIGINT)
       |         AS loo_mean_q
       |FROM oc JOIN stats USING (c_mktsegment)""".stripMargin
  }

  // ---- deterministic Poisson bootstrap ---------------------------------------

  /** Hash-derived Poisson bootstrap: [[BootReps]] resampled replicas of the
    * mean order total, each row weighted by a Poisson(1) draw taken from
    * the inverse CDF of a [[Hashing.hexHash]] uniform on (o_orderkey, rep)
    * — the bootstrap-on-a-cluster construction (Chamandy et al.'s Poisson
    * approximation, public): no RNG state, any partitioning, same replica
    * membership on every run and every engine. The CDF thresholds are
    * exact double literals shared with the oracle text; weighted sums stay
    * in exact integers until one final division. Shape: fact × B flatmap
    * (map-only) → hash agg to B rows; map-side partials mean the shuffle
    * carries B rows per task regardless of data size. */
  val BootReps = 16
  /** Cumulative Poisson(1) CDF at k = 0..5 (correctly-rounded literals). */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.73575888234288466, 0.91969860292860583,
    0.98101184312384622, 0.99634015317265632, 0.99940581518241834)
  private val TwoPow60 = 1152921504606846976.0 // 2^60, exact

  def bootstrap(spark: SparkSession, d: String): DataFrame = {
    val reps = spark.range(0, BootReps).select(col("id").as("rep"))
    val u = Hashing.hexHash(concat(col("o_orderkey").cast("string"),
      lit("#"), col("rep").cast("string"))).cast("double") / lit(TwoPow60)
    val k = PoissonCdf.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (cdf, i)) =>
        acc.when(u < lit(cdf), lit(i.toLong))
      }.otherwise(lit(PoissonCdf.size.toLong))
    orders(spark, d)
      .select(col("o_orderkey"), Money.cents(col("o_totalprice")).as("cents"))
      .crossJoin(broadcast(reps))
      .select(col("rep"), k.as("k"), col("cents"))
      .groupBy(col("rep"))
      .agg(sum(col("k")).as("n_eff"),
        sum(col("k") * col("cents")).as("wcents"))
      .select(col("rep"), col("n_eff"),
        floor(col("wcents").cast("double") / col("n_eff").cast("double")
          * lit(100.0)).cast("long").as("boot_mean_q"))
      .orderBy("rep")
  }

  val bootstrapSql: String = {
    val c = Money.centsSql("o_totalprice")
    val u = s"(CAST(${Hashing.hexHashSql(
      "CAST(o_orderkey AS VARCHAR) || '#' || CAST(rep AS VARCHAR)")} AS DOUBLE)" +
      s" / $TwoPow60)"
    val k = PoissonCdf.zipWithIndex
      .map { case (cdf, i) => s"WHEN $u < $cdf THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${PoissonCdf.size} END")
    s"""WITH w AS (
       |  SELECT rep, $k AS k, $c AS cents
       |  FROM orders CROSS JOIN (SELECT unnest(range(0, $BootReps)) AS rep) r
       |)
       |SELECT rep, CAST(sum(k) AS BIGINT) AS n_eff,
       |       CAST(floor(CAST(sum(k * cents) AS DOUBLE)
       |                  / CAST(sum(k) AS DOUBLE) * 100.0) AS BIGINT)
       |         AS boot_mean_q
       |FROM w GROUP BY rep ORDER BY rep""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_target_encode" -> ((s, d) => targetEncode(s, d)),
    "q_bootstrap"     -> ((s, d) => bootstrap(s, d)),
    "q_weighted_sample" -> ((s, d) => weightedSample(s, d)),
    "q_cluster_split"   -> ((s, d) => clusterSplit(s, d)),
    "q_neg_sample" -> ((s, d) => negativeSample(s, d)),
    "q_hash_sample"  -> ((s, d) => hashSample(s, d)),
    "q_domain_cap"   -> ((s, d) => domainCap(s, d)),
    "q_strat_sample" -> ((s, d) => stratifiedSample(s, d)),
    "q_data_split"   -> ((s, d) => dataSplit(s, d)),
    "q_mix_weights"  -> ((s, d) => mixWeights(s, d)),
    "q_shard_assign" -> ((s, d) => shardAssign(s, d)),
    "q_corpus_stats" -> ((s, d) => corpusStats(s, d)))

  def oracles: Map[String, String] = Map(
    "q_domain_cap" -> domainCapSql(),
    "q_target_encode" -> targetEncodeSql,
    "q_bootstrap"     -> bootstrapSql,
    "q_weighted_sample" -> weightedSampleSql(),
    "q_cluster_split"   -> clusterSplitSql,
    "q_neg_sample" -> negativeSampleSql,
    "q_hash_sample"  -> hashSampleSql(),
    "q_strat_sample" -> stratifiedSampleSql,
    "q_data_split"   -> dataSplitSql,
    "q_mix_weights"  -> mixWeightsSql,
    "q_shard_assign" -> shardAssignSql,
    "q_corpus_stats" -> corpusStatsSql)
}
