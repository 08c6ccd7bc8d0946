package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Hashing

/** Deduplication suite for large-scale training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join →
  * exact-Jaccard verify), and SimHash (bit-majority fingerprint + banded
  * hamming pairs). Embedding-cosine near-dup lives in [[Similarity]].
  *
  * Scale design (the whole point at 100 TB):
  *  - No O(n²) anywhere: candidate pairs come only from LSH band buckets /
  *    hamming bands, whose sizes are bounded by the banding parameters, and
  *    expensive verification (exact Jaccard) runs on candidates only.
  *  - Shuffles carry hashes/signatures (longs), never document text, except
  *    the one candidate-verify join that fetches shingle sets for matched
  *    pairs.
  *  - Every hash is the cross-engine [[Hashing.hexHash]] so the entire
  *    pipeline — signatures AND final verified pairs — is oracle-checked in
  *    DuckDB, not rows-only.
  */
object Dedup {

  // ---- shared text → shingle plumbing (mirrored 1:1 in the oracle SQL) ----

  /** Word tokens; the synthetic corpus is single-space lowercase words. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word-3-gram shingles. Random-vocab docs give diverse shingles
    * (unigram sets over a 40-word vocab would all collide — shingling is
    * what keeps LSH buckets small). */
  def shingles(text: Column): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= 3,
        transform(sequence(lit(1), size(t) - 2), i =>
          concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
        .otherwise(array(text)))
  }

  val tokensSql = "string_split(text, ' ')"
  val shinglesSql: String =
    s"""list_distinct(CASE WHEN len($tokensSql) >= 3
       |  THEN list_transform(generate_series(1, len($tokensSql) - 2),
       |         i -> $tokensSql[i] || ' ' || $tokensSql[i+1] || ' ' || $tokensSql[i+2])
       |  ELSE [text] END)""".stripMargin.replace("\n", " ")

  /** DISTINCT word-3-gram shingles as ROWS (doc_id, s) — the codegen form.
    * The array-lambda [[shingles]] is interpreted (Spark HOFs don't
    * codegen; measured ~0.8 ms/doc); here tokens posexplode and the 3-grams
    * assemble via window `lead` — posexplode, window, concat are all
    * whole-stage-codegen'd, and the one extra shuffle (by doc_id for the
    * window sort) is exactly the partitioning the downstream signature
    * aggregation needs anyway. Short docs (<3 tokens) contribute the whole
    * text as their single shingle, matching [[shingles]]. */
  /** @param distinct dedupe shingles per doc (set semantics — needed by
    *   Jaccard counting). Min-based consumers (minhash, fingerprints) pass
    *   false: min is duplicate-insensitive, and skipping the dedup saves a
    *   full shuffle of shingle strings. */
  def shingleRows(docs: DataFrame, distinct: Boolean = true): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    // normal docs: token rows through the window — only (doc_id, pos, t)
    // ride the window shuffle, never the full text
    val long3 = docs
      .where(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("t"))
      .withColumn("t1", lead(col("t"), 1).over(w))
      .withColumn("t2", lead(col("t"), 2).over(w))
      .where(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t"), col("t1"), col("t2")).as("s"))
    // degenerate docs (<3 tokens): the whole text is the single shingle
    val short3 = docs
      .where(size(tokens(col("text"))) < 3)
      .select(col("doc_id"), col("text").as("s"))
    val all = long3.union(short3)
    if (distinct) all.dropDuplicates("doc_id", "s") else all
  }

  /** documents ∪ re-keyed copies of the first `nDup` docs — injected exact
    * duplicates so dedup queries verifiably FIND something on the synthetic
    * corpus (pure-random corpora have no near-dups). Offset keeps ids
    * disjoint; the oracle mirrors the same injection. */
  def docsWithInjectedDups(spark: SparkSession, d: String, nDup: Int = 20): DataFrame = {
    val docs = documents(spark, d).select(col("doc_id"), col("text"))
    docs.union(
      docs.where(col("doc_id") < nDup)
        .select((col("doc_id") + lit(1000000)).as("doc_id"), col("text")))
  }

  def docsWithInjectedDupsSql(nDup: Int = 20): String =
    s"""SELECT doc_id, text FROM documents
       |UNION ALL
       |SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < $nDup""".stripMargin

  // ---- exact dedup: hash-groupBy --------------------------------------------

  /** Exact duplicate groups by content hash. The groupBy key is the 60-bit
    * hash (8 bytes through the shuffle), never the text itself; min(doc_id)
    * is the canonical representative. Only groups with >1 member survive.
    * member_ids is a comma-joined sorted id string (not an array): the
    * driver's canonicalizer can't hash array cells, and the string form is
    * deterministic on both engines. */
  def exactDedup(spark: SparkSession, d: String): DataFrame =
    docsWithInjectedDups(spark, d)
      .groupBy(Hashing.hexHash(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          _.cast("string")), ",").as("member_ids"))
      .where(col("n_copies") > 1)
      .orderBy("keep_doc_id")

  val exactDedupSql: String =
    s"""SELECT ${Hashing.hexHashSql("text")} AS content_hash,
       |       min(doc_id) AS keep_doc_id,
       |       count(*) AS n_copies,
       |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS member_ids
       |FROM (${docsWithInjectedDupsSql()})
       |GROUP BY 1 HAVING count(*) > 1
       |ORDER BY keep_doc_id""".stripMargin

  // ---- exact dedup with a keep policy ----------------------------------------

  /** Survivor selection: one row per content-hash group, keeping the BEST
    * copy by policy (longest text, then lowest doc_id) — the curation form
    * of dedup (exactDedup reports groups; this emits the kept corpus).
    * One shuffle by the 60-bit hash; the policy is a row_number frame, so
    * swapping policies (newest, highest-quality-score, …) is an orderBy
    * change, not a new operator. */
  def dedupKeepBest(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
      .orderBy(length(col("text")).desc, col("doc_id"))
    val g = org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
    docsWithInjectedDups(spark, d)
      .withColumn("content_hash", Hashing.hexHash(col("text")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(g))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("content_hash"), col("n_copies"),
        length(col("text")).cast("long").as("n_chars_kept"))
      .orderBy("doc_id")
  }

  val dedupKeepBestSql: String =
    s"""SELECT doc_id, content_hash, n_copies, length(text) AS n_chars_kept
       |FROM (
       |  SELECT doc_id, text, ${Hashing.hexHashSql("text")} AS content_hash,
       |         row_number() OVER (PARTITION BY ${Hashing.hexHashSql("text")}
       |                            ORDER BY length(text) DESC, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY ${Hashing.hexHashSql("text")}) AS n_copies
       |  FROM (${docsWithInjectedDupsSql()})
       |) WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  // ---- MinHash signatures ----------------------------------------------------

  val NumHashes = 12
  val Bands = 4
  val RowsPerBand = 3 // NumHashes / Bands

  /** Affine seed family over the 31-bit base hash: h_i(x) = (a_i·x + b_i)
    * mod P31. ONE md5 per shingle (the base hash); the 12 variants are two
    * integer ops each — the standard minhash construction, ~12× cheaper
    * than 12 independent md5 families (measured: 91 s → single-digit at
    * sf0.1). Seeds are plan-time constants derived from the same md5
    * function, so the oracle reproduces them as literal numbers. */
  def seedA(i: Int): Long = Hashing.hexHashLocal(s"a#$i") % (Hashing.P31 - 1) + 1
  def seedB(i: Int): Long = Hashing.hexHashLocal(s"b#$i") % Hashing.P31

  val baseHashesSql: String =
    s"list_transform($shinglesSql, s -> ${Hashing.smallHashSql("s")})"

  def signatureFromBaseSql(h0: String): String =
    "[" + (0 until NumHashes).map { i =>
      s"list_min(list_transform($h0, h -> (h * ${seedA(i)} + ${seedB(i)}) % ${Hashing.P31}))"
    }.mkString(", ") + "]"

  /** DISTINCT 60-bit shingle-hash ROWS (doc_id, h) — the hashed twin of
    * [[shingleRows]], via the one-pass [[graft.plans.WordShingleHashesExpr]]
    * (the window-assembled string form pays a shuffle+sort of token rows
    * just to build adjacent-word strings). Document text never enters a
    * shuffle: only 8-byte hashes do. Distinct-on-hash ≡ distinct-on-shingle
    * up to md5 collisions (~2⁻⁶⁰ per pair — absent at any real corpus). */
  def shingleHashRows(docs: DataFrame): DataFrame = {
    graft.plans.WordShingleHashes.register(docs.sparkSession)
    // the expression dedupes per doc at the scan — rows are already
    // set-semantic, no dropDuplicates exchange
    docs.select(col("doc_id"), explode(expr("word_shingle_hashes(text)")).as("h"))
  }

  /** MinHash signatures from (doc_id, h) shingle-hash ROWS via codegen'd
    * hash aggregation: the 12 mins run partial+final in a whole-stage-codegen
    * HashAggregate. min is duplicate-insensitive, so distinct and
    * non-distinct hash rows give identical signatures — callers reuse
    * whichever frontier they already have. */
  def minhashFromHashRows(hs: DataFrame): DataFrame = {
    val ex = hs.select(col("doc_id"), pmod(col("h"), lit(Hashing.P31)).as("h31"))
    val aggs = (0 until NumHashes).map(i =>
      min(pmod(col("h31") * lit(seedA(i)) + lit(seedB(i)), lit(Hashing.P31)))
        .as(s"m$i"))
    ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"m$i")): _*).as("minhash"))
  }

  /** MinHash signatures via the one-pass hash expression + codegen'd hash
    * aggregation — the scale form. One shuffle of (doc_id, hash) long rows.
    * (The array-lambda formulation is interpreted — Spark HOFs don't
    * codegen — and was the dominant cost of the pairs query.) */
  def minhashSigDf(docs: DataFrame): DataFrame = {
    graft.plans.WordShingleHashes.register(docs.sparkSession)
    // no dedup needed: min is duplicate-insensitive, skip the shuffle
    minhashFromHashRows(
      docs.select(col("doc_id"), explode(expr("word_shingle_hashes(text)")).as("h")))
  }

  /** Driver-facing signature query: the 12-long signature comma-joined to a
    * string (the driver's canonicalizer can't hash array cells). element_at
    * + concat_ws stays codegen'd; [[minhashSigDf]] keeps the array form for
    * LSH composition. */
  def minhashSig(spark: SparkSession, d: String): DataFrame =
    minhashSigDf(documents(spark, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        concat_ws(",", (0 until NumHashes).map(i =>
          element_at(col("minhash"), i + 1).cast("string")): _*).as("minhash"))

  val minhashSigSql: String =
    s"""SELECT doc_id, array_to_string(${signatureFromBaseSql("h0")}, ',') AS minhash
       |FROM (SELECT doc_id, $baseHashesSql AS h0 FROM documents)""".stripMargin

  // ---- MinHash + LSH near-dup pairs -----------------------------------------

  /** Near-duplicate pairs via LSH banding + exact-Jaccard verification.
    *
    * Plan shape (all distributed, no O(n²)):
    *  1. signature per doc (map-only);
    *  2. explode into `Bands` (band_id, band_key) rows — band_key is the
    *     concatenated minhash slice;
    *  3. self-equi-join on (band_id, band_key) with doc_a < doc_b → candidate
    *     pairs (shuffle on the band key — collision buckets only);
    *  4. distinct pairs, then ONE join back to fetch both shingle sets and
    *     compute exact Jaccard |∩|/|∪|; keep jaccard ≥ threshold.
    */
  /** LSH banding candidate generation over a (doc_id, minhash) signature
    * table: explode to (band_id, band_key) rows, self-equi-join on the band
    * key (collision buckets only — never the cross product), distinct
    * ordered pairs. Shared by [[minhashPairs]] and [[fuzzyPairs]]. */
  private def lshCandidatePairs(sigs: DataFrame): DataFrame = {
    val bands = sigs.select(col("doc_id"),
        explode(array((0 until Bands).map(b =>
          struct(lit(b).as("band_id"),
            slice(col("minhash"), b * RowsPerBand + 1, RowsPerBand).as("band_key"))): _*))
          .as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
    bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH RECALL EVALUATION — the validation step a real pipeline runs
    * before trusting banded MinHash at scale: on a deterministic sample
    * (hash-bucket slice + the PLANTED duplicate pairs, the seeded-eval
    * shape), compare the LSH candidate set against brute-force exact
    * Jaccard and report true/candidate/hit counts with an integer
    * recall in ppm. Brute force joins shingle rows on the hash — a true
    * pair (Jaccard ≥ 0.8 > 0) necessarily shares a shingle, so the
    * shingle join IS exhaustive while never materializing the n² pair
    * space. At 100 TB this runs on exactly this kind of bounded sample;
    * the LSH parameters it validates then serve the full corpus. */
  def lshRecallEval(spark: SparkSession, d: String,
      threshold: Double = 0.8): DataFrame = {
    val sample = docsWithInjectedDups(spark, d).where(
      pmod(Hashing.hexHash(col("doc_id").cast("string")), lit(100L)) < 40L ||
        col("doc_id") < 20L || col("doc_id") >= 1000000L)
    val sh = shingleHashRows(sample).localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("h"))
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    val truePairs = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .where(col("inter") / (col("n_a") + col("n_b") - col("inter"))
        >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val cand = lshCandidatePairs(minhashFromHashRows(sh)).localCheckpoint()
    val hit = truePairs.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    truePairs.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        expr("(n_hit * 1000000) div n_true").as("recall_ppm"))
  }

  def lshRecallEvalSql(threshold: Double = 0.8): String =
    s"""WITH samp AS (
       |  SELECT doc_id, text FROM (${docsWithInjectedDupsSql()})
       |  WHERE (${Hashing.hexHashSql("CAST(doc_id AS VARCHAR)")} % 100) < 40
       |     OR doc_id < 20 OR doc_id >= 1000000
       |), base AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform($shinglesSql,
       |           s -> ${Hashing.hexHashSql("s")})) AS sh,
       |         $baseHashesSql AS h0
       |  FROM samp
       |), docs AS (
       |  SELECT doc_id, sh, ${signatureFromBaseSql("h0")} AS sig FROM base
       |), bands AS (
       |  SELECT doc_id, b AS band_id,
       |         sig[b*$RowsPerBand+1 : b*$RowsPerBand+$RowsPerBand] AS band_key
       |  FROM docs, range(0, $Bands) AS t(b)
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key
       |   AND x.doc_id < y.doc_id
       |), true_p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM base a JOIN base b ON a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |    >= $threshold
       |), hit AS (
       |  SELECT doc_a, doc_b FROM true_p
       |  INTERSECT SELECT doc_a, doc_b FROM cand
       |)
       |SELECT (SELECT count(*) FROM true_p) AS n_true,
       |       (SELECT count(*) FROM cand) AS n_cand,
       |       (SELECT count(*) FROM hit) AS n_hit,
       |       ((SELECT count(*) FROM hit) * 1000000)
       |         // (SELECT count(*) FROM true_p) AS recall_ppm""".stripMargin

  /** The bandings a 12-hash signature admits: (bands, rows_per_band). */
  val SweepBandings: Seq[(Int, Int)] = Seq((2, 6), (3, 4), (4, 3), (6, 2), (12, 1))

  /** LSH BANDING PARAMETER SWEEP — how a pipeline actually picks its
    * banding at 100 TB: from ONE signature pass over the same bounded
    * sample as [[lshRecallEval]] (hash-bucket slice + planted
    * duplicates), evaluate EVERY banding the signature admits — more
    * bands / fewer rows = higher recall but more candidate pairs to
    * verify (cost), fewer bands / more rows = the reverse — and report
    * per banding the candidate count (the verify bill) and the recall
    * vs exact-Jaccard truth. Truth is computed ONCE (the shingle-hash
    * equi-join — exhaustive above any positive threshold without the
    * n² pair space); signatures are computed ONCE and pinned; each
    * banding is then just a band-key self-join over the pinned frame.
    * The operator picks the cheapest banding above the recall target
    * and serves the full corpus with it. */
  def lshBandingSweep(spark: SparkSession, d: String,
      threshold: Double = 0.8): DataFrame = {
    val sample = docsWithInjectedDups(spark, d).where(
      pmod(Hashing.hexHash(col("doc_id").cast("string")), lit(100L)) < 40L ||
        col("doc_id") < 20L || col("doc_id") >= 1000000L)
    val sh = shingleHashRows(sample).localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("h"))
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    val truePairs = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .where(col("inter") / (col("n_a") + col("n_b") - col("inter"))
        >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val sigs = minhashFromHashRows(sh).localCheckpoint()
    // r21 (guide §2.4 — one exchange instead of five): the old shape ran
    // a PER-BANDING loop — 5 × (band explode → self-join → distinct →
    // localCheckpoint → semi-join → two single-row aggs), ~25 jobs. All
    // five bandings now ride ONE exploded band frame (banding id leads
    // the band key), ONE self-join, ONE distinct, and ONE aggregation;
    // n_hit folds into the same pass as a LEFT-join marker count instead
    // of a separate semi-join per arm. Row-identical output (the DuckDB
    // oracle still restates the per-arm form): candidates per banding
    // are the same pair sets, counted per banding key.
    import spark.implicits._
    val bandsAll = sigs.select(col("doc_id"),
        explode(array(SweepBandings.flatMap { case (b, r) =>
          (0 until b).map(i =>
            struct(lit(b).as("banding"), lit(i).as("band_id"),
              slice(col("minhash"), i * r + 1, r).as("band_key")))
        }: _*)).as("band"))
      .select(col("doc_id"), col("band.banding"), col("band.band_id"),
        col("band.band_key"))
    val candAll = bandsAll.as("x").join(bandsAll.as("y"),
        col("x.banding") === col("y.banding") &&
          col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.banding").as("banding"),
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val counts = candAll
      .join(truePairs.withColumn("__hit", lit(1)), Seq("doc_a", "doc_b"), "left")
      .groupBy(col("banding"))
      .agg(count(lit(1)).as("n_cand"), count(col("__hit")).as("n_hit"))
    // left join from the literal arm list so a zero-candidate banding
    // still emits its row (the old per-arm agg-without-groupBy did)
    val arms = SweepBandings.map { case (b, r) => (b.toLong, r.toLong) }
      .toDF("bands", "rows_per_band")
    arms.join(counts, col("bands") === col("banding"), "left")
      .crossJoin(truePairs.agg(count(lit(1)).as("n_true")))
      .select(col("bands"), col("rows_per_band"), col("n_true"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_ppm", expr("(n_hit * 1000000) div n_true"))
      .orderBy(col("bands"))
  }

  def lshBandingSweepSql(threshold: Double = 0.8): String = {
    val configArms = SweepBandings.map { case (b, r) =>
      s"""SELECT CAST($b AS BIGINT) AS bands,
         |       CAST($r AS BIGINT) AS rows_per_band,
         |       (SELECT count(*) FROM true_p) AS n_true,
         |       (SELECT count(*) FROM (
         |          SELECT DISTINCT x.doc_id, y.doc_id
         |          FROM bands_$b x JOIN bands_$b y
         |            ON x.band_id = y.band_id AND x.band_key = y.band_key
         |           AND x.doc_id < y.doc_id)) AS n_cand,
         |       (SELECT count(*) FROM (
         |          SELECT doc_a, doc_b FROM true_p
         |          INTERSECT
         |          SELECT DISTINCT x.doc_id, y.doc_id
         |          FROM bands_$b x JOIN bands_$b y
         |            ON x.band_id = y.band_id AND x.band_key = y.band_key
         |           AND x.doc_id < y.doc_id)) AS n_hit""".stripMargin
    }.mkString("\n|UNION ALL\n|".stripMargin)
    val bandCtes = SweepBandings.map { case (b, r) =>
      s"""bands_$b AS (
         |  SELECT doc_id, bb AS band_id,
         |         sig[bb*$r+1 : bb*$r+$r] AS band_key
         |  FROM docs, range(0, $b) AS t(bb)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH samp AS (
       |  SELECT doc_id, text FROM (${docsWithInjectedDupsSql()})
       |  WHERE (${Hashing.hexHashSql("CAST(doc_id AS VARCHAR)")} % 100) < 40
       |     OR doc_id < 20 OR doc_id >= 1000000
       |), base AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform($shinglesSql,
       |           s -> ${Hashing.hexHashSql("s")})) AS sh,
       |         $baseHashesSql AS h0
       |  FROM samp
       |), docs AS (
       |  SELECT doc_id, sh, ${signatureFromBaseSql("h0")} AS sig FROM base
       |), true_p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM base a JOIN base b ON a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |    >= $threshold
       |), $bandCtes
       |SELECT bands, rows_per_band, n_true, n_cand, n_hit,
       |       (n_hit * 1000000) // n_true AS recall_ppm
       |FROM ($configArms)
       |ORDER BY bands""".stripMargin
  }

  def minhashPairs(spark: SparkSession, d: String, threshold: Double = 0.8): DataFrame = {
    // localCheckpoint pins the computed signatures/shingle hashes: a lazy
    // plan would re-derive them for EVERY downstream branch (x side, y side,
    // both verify probes — measured 24 parquet re-scans per run; exchange
    // reuse does not fire across self-join branches). Same pattern as
    // persisting the signature table on a real cluster before LSH fan-out.
    // ONE hashed-shingle derivation feeds both the signatures and the
    // Jaccard verify; text never shuffles (only 8-byte hashes and the
    // Jaccard here is over the 60-bit shingle-hash space — identical to
    // string-shingle Jaccard absent md5 collisions, and the oracle hashes
    // its shingle lists the same way).
    val base = docsWithInjectedDups(spark, d)
    val sh = shingleHashRows(base).localCheckpoint()
    val sigs = minhashFromHashRows(sh).localCheckpoint()
    val candidates = lshCandidatePairs(sigs)

    // exact-Jaccard verify, distributively: join candidate pairs to the
    // shingle rows of each side, count matching shingles (|∩|), combine
    // with per-doc distinct-shingle counts — joins + hash aggs, all
    // codegen'd, no per-pair array materialization
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))

    val inter = candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def minhashPairsSql(threshold: Double = 0.8): String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform($shinglesSql,
       |           s -> ${Hashing.hexHashSql("s")})) AS sh,
       |         $baseHashesSql AS h0
       |  FROM (${docsWithInjectedDupsSql()})
       |), docs AS (
       |  SELECT doc_id, sh, ${signatureFromBaseSql("h0")} AS sig FROM base
       |), bands AS (
       |  SELECT doc_id, b AS band_id,
       |         sig[b*$RowsPerBand+1 : b*$RowsPerBand+$RowsPerBand] AS band_key
       |  FROM docs, range(0, $Bands) AS t(b)
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key
       |   AND x.doc_id < y.doc_id
       |)
       |SELECT c.doc_a, c.doc_b,
       |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
       |FROM cand c
       |JOIN docs a ON c.doc_a = a.doc_id
       |JOIN docs b ON c.doc_b = b.doc_id
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- duplicate clustering: connected components over near-dup pairs ------

  /** Connected components over the MinHash near-dup pairs — the transitive-
    * closure step that turns pairwise matches into DUP CLUSTERS (a~b and
    * b~c must collapse into one {a,b,c} group even when a~c never shared an
    * LSH band). Implemented as Hash-Min label propagation: every vertex
    * starts labeled with its own id; each round, labels flow across edges
    * and each vertex keeps the min; converged when no label changed. Rounds
    * needed = component diameter (tiny for dup clusters), each round is one
    * join + one hash agg shuffled on vertex id — the standard cluster-scale
    * connected-components. `localCheckpoint` per round truncates the plan
    * lineage: without it, iteration N re-executes all N−1 prior rounds (the
    * classic Spark iterative-algorithm trap). The driver-side loop holds
    * only a changed/not-changed bit, never data.
    *
    * Oracle: a recursive CTE computing min-reachable-id per vertex —
    * fixpoint semantics identical to the propagation's. */
  def dupClusters(spark: SparkSession, d: String): DataFrame = {
    val pairs = minhashPairs(spark, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    var labels = edges.select(col("doc_a").as("v")).distinct()
      .select(col("v"), col("v").as("label")).localCheckpoint()
    // convergence via the label-sum invariant: labels only ever DECREASE
    // (min-propagation), so the total is strictly monotone until fixpoint —
    // one cheap aggregate per round instead of a full old-vs-new join.
    // Decimal sum: immune to long overflow at cluster-scale id ranges.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // empty vertex set → sum is NULL → treat as zero (loop converges
      // immediately and the cluster set is empty, not an NPE)
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val propagated = edges.join(labels, edges("doc_b") === labels("v"))
        .select(edges("doc_a").as("v"), col("label"))
      // LAZY pin: the labelSum action materializes the checkpoint in the
      // same pass (eager pin + sum was two jobs per round — round 21,
      // guide §1.2; same lineage cut, half the round's actions)
      val updated = labels.unionByName(propagated)
        .groupBy(col("v")).agg(min(col("label")).as("label"))
        .localCheckpoint(eager = false)
      val s = labelSum(updated)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      // NOTE (round-21 review): Dataset.unpersist only consults the
      // CacheManager and does NOT free localCheckpoint blocks — those are
      // reclaimed by the ContextCleaner once the prior round's RDD is
      // unreachable. Kept for the plan-cache entry it does drop; the
      // per-round label frames are node-sized, so the transient block
      // accumulation is bounded by diameter × |V|, tiny here.
      labels.unpersist()
      labels = updated
    }
    labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        array_join(transform(array_sort(collect_list(col("v"))),
          _.cast("string")), ",").as("member_ids"))
      .orderBy("cluster_id")
  }

  def dupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (${minhashPairsSql()})
       |), edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |), verts AS (
       |  SELECT DISTINCT a AS v FROM edges
       |), reach(v, l) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.v
       |), lbl AS (
       |  SELECT v, min(l) AS cluster_id FROM reach GROUP BY v
       |)
       |SELECT cluster_id, count(*) AS n_members,
       |       string_agg(CAST(v AS VARCHAR), ',' ORDER BY v) AS member_ids
       |FROM lbl
       |GROUP BY cluster_id
       |ORDER BY cluster_id""".stripMargin

  // ---- fuzzy dedup: edit-distance verify over LSH candidates ----------------

  /** Fuzzy near-dup pairs: MinHash-LSH candidate generation, verified by
    * Levenshtein edit distance over a fixed prefix. The edit-distance stage
    * of a real fuzzy-dedup pipeline — quadratic per PAIR, so it must only
    * ever run on LSH candidates (the full corpus would be O(n²·L²)); the
    * prefix bound keeps the verify cost constant per pair regardless of
    * document length, and the THRESHOLD form of levenshtein runs the banded
    * DP — O(maxDist·prefixLen) per pair with early exit, returning −1 past
    * the bound instead of computing the exact large distance nobody needs.
    * Candidates reuse [[lshCandidatePairs]]; only doc ids and fixed-size
    * prefixes shuffle. */
  def fuzzyPairs(spark: SparkSession, d: String,
      prefixLen: Int = 80, maxDist: Int = 20): DataFrame = {
    val base = docsWithInjectedDups(spark, d)
    // pinned before fan-out: sigs feed both sides of the band self-join,
    // prefixes both verify branches (exchange reuse does not fire across
    // self-join branches — see minhashPairs)
    val sigs = minhashFromHashRows(shingleHashRows(base)).localCheckpoint()
    val candidates = lshCandidatePairs(sigs)
    val prefixes = base.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("prefix")).localCheckpoint()
    candidates
      .join(prefixes.select(col("doc_id").as("doc_a"), col("prefix").as("ta")), "doc_a")
      .join(prefixes.select(col("doc_id").as("doc_b"), col("prefix").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb"), maxDist).cast("long").as("edit_dist"))
      .where(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  def fuzzyPairsSql(prefixLen: Int = 80, maxDist: Int = 20): String =
    s"""WITH base AS (
       |  SELECT doc_id, text, $baseHashesSql AS h0
       |  FROM (${docsWithInjectedDupsSql()})
       |), docs AS (
       |  SELECT doc_id, text, ${signatureFromBaseSql("h0")} AS sig FROM base
       |), bands AS (
       |  SELECT doc_id, b AS band_id,
       |         sig[b*$RowsPerBand+1 : b*$RowsPerBand+$RowsPerBand] AS band_key
       |  FROM docs, range(0, $Bands) AS t(b)
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key
       |   AND x.doc_id < y.doc_id
       |)
       |SELECT c.doc_a, c.doc_b,
       |       CAST(levenshtein(substring(a.text, 1, $prefixLen),
       |                        substring(b.text, 1, $prefixLen)) AS BIGINT) AS edit_dist
       |FROM cand c
       |JOIN docs a ON c.doc_a = a.doc_id
       |JOIN docs b ON c.doc_b = b.doc_id
       |WHERE levenshtein(substring(a.text, 1, $prefixLen),
       |                  substring(b.text, 1, $prefixLen)) <= $maxDist
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- SimHash ---------------------------------------------------------------

  // 60 bits (not 32): with 15-bit bands the candidate buckets are 32768-way
  // instead of 256-way, which is what keeps the band self-join from
  // exploding on correlated corpora (measured at sf0.1: byte bands produced
  // ~80M candidate rows; 15-bit bands cut that by ~two orders). 60 keeps
  // every packed value non-negative, so >> behaves identically in Spark and
  // DuckDB without sign games.
  val SimHashBits = 60
  val SimHashBandBits = 15
  val SimHashBands = 4
  val SimHashBandMask = (1L << SimHashBandBits) - 1

  /** Per-row SimHash as a single Column (higher-order functions). Correct
    * but INTERPRETED — Spark HOFs don't codegen — so use [[simhashDf]] for
    * anything beyond small inputs; this form exists for composition in
    * other expressions and as the executable spec. */
  def simhashCol(text: Column): Column = {
    val th = transform(array_distinct(tokens(text)), t => Hashing.hexHash(t))
    (0 until SimHashBits).map { j =>
      when(aggregate(th, lit(0L),
          (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash via the one-pass custom expression — the scale form: the
    * signature needs no cross-row state, so it exits the scan as 8 bytes
    * with NO shuffle at all. (History: the interpreted HOF form
    * [[simhashCol]] cost 19 s at sf0.1; the explode + 60-conditional-sum
    * HashAggregate cut it to ~1 s but still shuffled a row per (doc,
    * token); [[graft.plans.SimHash60Expr]] removes even that.)
    * Bit-identical to [[simhashCol]] — SimHashSpec-guarded. */
  def simhashDf(docs: DataFrame): DataFrame = {
    graft.plans.SimHash60.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("simhash60(text)").as("simhash"))
  }

  val simhashColSql: String = {
    val th = s"list_transform(list_distinct($tokensSql), t -> ${Hashing.hexHashSql("t")})"
    s"""list_reduce(list_transform(generate_series(0, ${SimHashBits - 1}),
       |  j -> CASE WHEN list_reduce(list_transform($th,
       |              h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END),
       |            (a, b) -> a + b) > 0
       |       THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END),
       |  (a, b) -> a + b)""".stripMargin.replace("\n", " ")
  }

  def simhash(spark: SparkSession, d: String): DataFrame =
    simhashDf(documents(spark, d).select(col("doc_id"), col("text")))

  val simhashSql: String =
    s"SELECT doc_id, $simhashColSql AS simhash FROM documents"

  /** SimHash near-dup pairs: band the 60 bits into 4×15-bit keys; docs
    * sharing any band become candidates (pigeonhole: hamming ≤ 3 ⇒ ≥ 1
    * untouched band); verify with bit_count(xor) ≤ maxHamming. Same
    * no-O(n²) shape as minhashPairs. */
  def simhashPairs(spark: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    // materialize signatures once for the x/y self-join fan-out (see
    // minhashPairs: exchange reuse does not fire across self-join branches)
    val docs = simhashDf(docsWithInjectedDups(spark, d)).localCheckpoint()

    val bands = docs.select(col("doc_id"), col("simhash"),
        explode(array((0 until SimHashBands).map(b =>
          struct(lit(b).as("band_id"),
            shiftright(col("simhash"), b * SimHashBandBits)
              .bitwiseAND(SimHashBandMask).as("band_key"))): _*))
          .as("band"))
      .select(col("doc_id"), col("simhash"), col("band.band_id"), col("band.band_key"))

    bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  def simhashPairsSql(maxHamming: Int = 3): String =
    s"""WITH docs AS (
       |  SELECT doc_id, $simhashColSql AS simhash
       |  FROM (${docsWithInjectedDupsSql()})
       |), bands AS (
       |  SELECT doc_id, simhash, b AS band_id,
       |         (simhash >> (b*$SimHashBandBits)) & $SimHashBandMask AS band_key
       |  FROM docs, range(0, $SimHashBands) AS t(b)
       |)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
       |FROM bands x JOIN bands y
       |  ON x.band_id = y.band_id AND x.band_key = y.band_key
       | AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- n-gram Jaccard within bounded buckets ---------------------------------

  /** Character-3-gram Jaccard over same-(lang, source, length-bucket) pairs.
    * The bucket key bounds candidates (no global self-join); the length
    * bucket is the standard cheap pre-filter: near-dups have near-equal
    * length.
    *
    * Set intersection is computed distributively: explode grams to
    * (bucket…, gram, doc_id) rows, equi-join on (bucket…, gram), count per
    * pair — everything whole-stage codegen'd through joins and hash
    * aggregates, no per-pair interpreted array_intersect, and at scale the
    * gram join partitions across the cluster instead of holding both gram
    * arrays per candidate pair in memory.
    *
    * Grams ride the shuffles as PACKED 24-BIT INTS (byte₁·2¹⁶+byte₂·2⁸+byte₃
    * over the ASCII corpus — injective, so counts are identical to string
    * grams): the dedup shuffle, the gram equi-join, and the hash tables all
    * compare ints instead of 3-char strings. Extraction is the one-pass
    * custom expression [[graft.plans.CharNgramCodesExpr]]: the compositional
    * explode+substr form is O(n²) per document (UTF8String substring scans
    * from the string start at every position) and was 5.7 s of this query's
    * 7 s at sf0.1. */
  def ngramJaccard(spark: SparkSession, d: String, threshold: Double = 0.9): DataFrame = {
    graft.plans.CharNgrams.register(spark)
    val base = documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
    val injected = base.union(
      base.where(col("doc_id") < 20)
        .select((col("doc_id") + lit(1000000)).as("doc_id"),
          col("lang"), col("source"), col("n_chars"), col("text")))
    // char_ngram_codes is distinct-per-doc at the scan, so the gram rows
    // are ALREADY set-semantic — no dropDuplicates exchange needed; the
    // checkpoint materializes map-only output
    val grams = injected
      .select(col("doc_id"), col("lang"), col("source"),
        floor(col("n_chars") / lit(10.0)).cast("int").as("len_bucket"),
        explode(expr("char_ngram_codes(text)")).as("gram"))
      .localCheckpoint() // shared by both self-join sides + the size rollup

    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))

    val inter = grams.as("x").join(grams.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.len_bucket") === col("y.len_bucket") &&
          col("x.gram") === col("y.gram") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_grams").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_grams").as("n_b")), "doc_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def ngramJaccardSql(threshold: Double = 0.9): String =
    s"""WITH injected AS (
       |  SELECT doc_id, lang, source, n_chars, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, lang, source, n_chars, text FROM documents
       |  WHERE doc_id < 20
       |), docs AS (
       |  SELECT doc_id, lang, source, CAST(floor(n_chars / 10.0) AS INT) AS len_bucket,
       |         list_distinct(CASE WHEN length(text) >= 3
       |           THEN list_transform(generate_series(1, length(text) - 2),
       |                  i -> ascii(substring(text, i, 1))*65536 +
       |                       ascii(substring(text, i+1, 1))*256 +
       |                       ascii(substring(text, i+2, 1)))
       |           ELSE [ascii(substring(text, 1, 1))*65536 +
       |                 ascii(substring(text, 2, 1))*256] END) AS g
       |  FROM injected
       |)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |       CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
       |         / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) AS jaccard
       |FROM docs x JOIN docs y
       |  ON x.lang = y.lang AND x.source = y.source
       | AND x.len_bucket = y.len_bucket AND x.doc_id < y.doc_id
       |WHERE CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
       |         / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- sorted-neighborhood dedup (blocking alternative to LSH) --------------

  /** Blocked sorted-neighborhood near-dup pairs: block on a cheap text
    * prefix, sort within each block, compare each row only to its next
    * [[SnmWindow]] sort neighbors (lead), verify with banded Levenshtein.
    * The classic SNM layout for the case LSH over-engineers: candidate
    * count is EXACTLY n·w by construction (LSH's bucket-collision blowup
    * can't happen), at the cost of only finding dups whose sort keys land
    * within w of each other. One shuffle on the block key; the leads share
    * the block sort; only ids + fixed-size prefixes ever move. Injected
    * exact copies share a prefix, sort adjacent, and verify at distance 0.
    * At 100 TB the block key doubles as the partition key — per-block
    * work is windowed, never quadratic. */
  val SnmWindow = 3

  def sortedNeighborPairs(spark: SparkSession, d: String,
      prefixLen: Int = 80, maxDist: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("prefix"), col("doc_id"))
    val keyed = docsWithInjectedDups(spark, d).select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("prefix"),
      substring(col("text"), 1, 2).as("blk"))
    val neighbors = (1 to SnmWindow).map { k =>
      keyed
        .withColumn("nb_id", lead(col("doc_id"), k).over(w))
        .withColumn("nb_prefix", lead(col("prefix"), k).over(w))
        .where(col("nb_id").isNotNull)
    }.reduce(_.unionByName(_))
    neighbors
      .select(
        least(col("doc_id"), col("nb_id")).as("doc_a"),
        greatest(col("doc_id"), col("nb_id")).as("doc_b"),
        levenshtein(col("prefix"), col("nb_prefix"), maxDist).cast("long").as("edit_dist"))
      .where(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  def sortedNeighborPairsSql(prefixLen: Int = 80, maxDist: Int = 20): String = {
    val arms = (1 to SnmWindow).map(k =>
      s"""SELECT doc_id, prefix,
         |         lead(doc_id, $k) OVER w$k AS nb_id,
         |         lead(prefix, $k) OVER w$k AS nb_prefix
         |  FROM keyed WINDOW w$k AS (PARTITION BY blk ORDER BY prefix, doc_id)""")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH keyed AS (
       |  SELECT doc_id, substring(text, 1, $prefixLen) AS prefix,
       |         substring(text, 1, 2) AS blk
       |  FROM (${docsWithInjectedDupsSql()})
       |), nb AS (
       |  $arms
       |)
       |SELECT least(doc_id, nb_id) AS doc_a, greatest(doc_id, nb_id) AS doc_b,
       |       CAST(levenshtein(prefix, nb_prefix) AS BIGINT) AS edit_dist
       |FROM nb
       |WHERE nb_id IS NOT NULL AND levenshtein(prefix, nb_prefix) <= $maxDist
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- prefix-filtered EXACT set-similarity self-join (AllPairs) ------------

  /** Exact all-pairs Jaccard ≥ τ threshold. */
  val SsjoinTauNum = 4
  val SsjoinTauDen = 5

  /** EXACT all-pairs shingle-set similarity self-join at Jaccard ≥ 4/5 —
    * the deterministic complement to the LSH family above (minhash banding
    * trades recall for speed; this finds EVERY qualifying pair) via prefix
    * filtering (the AllPairs/PPJoin family, Bayardo et al. WWW'07).
    *
    * Tokens (60-bit shingle hashes) are globally ordered rarest-first by
    * document frequency; a doc of set size m only emits its first
    * m − ⌈τ·m⌉ + 1 tokens as join keys. Two sets with Jaccard ≥ τ MUST
    * share a token inside both prefixes (if all ≥⌈τ·m⌉ shared tokens sat
    * beyond the prefix, the suffix — only ⌈τ·m⌉ − 1 long — couldn't hold
    * them), so the candidate join never misses a pair, and because prefix
    * tokens are the RAREST, bucket sizes stay tiny: a token shared by k
    * docs costs k² candidate rows, and frequent tokens never become join
    * keys. The ⌈τ·m⌉ arithmetic is exact-integer ((num·m + den − 1) div
    * den) — no double rounding can shrink a prefix into a false negative.
    *
    * Plan shape (all distributed, no O(n²)): hash rows → df counts (one
    * groupBy) → per-doc rarity-sorted array (one groupBy; array_sort on
    * (df, g) structs is deterministic) → prefix explode → self-equi-join on
    * the token with a size-ratio prune (den·m_small ≥ num·m_big, integer
    * form) → distinct pairs → ONE count-join verify computing exact
    * |∩| like [[ngramJaccard]], with the threshold test in cross-multiplied
    * integers. Shuffles carry only longs. The final jaccard double is one
    * int/int division — identical in both engines.
    *
    * Reference dedup surface: the drop_duplicates call sites
    * (spark_jobs/playback_pipeline.py:150,171,189) are exact-only; this is
    * the scale path a training corpus needs for near-dups with guaranteed
    * recall. */
  def ssjoinPrefix(spark: SparkSession, d: String): DataFrame = {
    val sh = shingleHashRows(docsWithInjectedDups(spark, d))
      .select(col("doc_id"), col("h").as("g"))
      .localCheckpoint() // 4 consumers: df agg, doc arrays, both verify sides
    val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val docs = sh.join(dfreq, "g")
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("df"), col("g"))).as("raw"))
      .select(col("doc_id"),
        transform(array_sort(col("raw")), x => x.getField("g")).as("gs"))
      .select(col("doc_id"), col("gs"), size(col("gs")).cast("long").as("m"))
    // p = m − ⌈τ·m⌉ + 1 in exact integers: ⌈n/d⌉ = (n + d − 1) div d
    val ceilTauM = floor((col("m") * SsjoinTauNum + (SsjoinTauDen - 1)) /
      lit(SsjoinTauDen.toDouble)).cast("long")
    val pref = docs
      .select(col("doc_id"), col("m"),
        explode(slice(col("gs"), lit(1),
          (col("m") - ceilTauM + lit(1L)).cast("int"))).as("g"))

    val cand = pref.as("x").join(pref.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
          col("x.m") * SsjoinTauDen >= col("y.m") * SsjoinTauNum &&
          col("y.m") * SsjoinTauDen >= col("x.m") * SsjoinTauNum)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sizes = docs.select(col("doc_id"), col("m"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("g")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("g")), Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("m").as("m_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("m").as("m_b")), "doc_b")
      .withColumn("n_union", col("m_a") + col("m_b") - col("n_inter"))
      .where(col("n_inter") * SsjoinTauDen >= col("n_union") * SsjoinTauNum)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        (col("n_inter").cast("double") / col("n_union")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Brute-force oracle: the O(n²) pair scan with exact list intersection —
    * states pure SEMANTICS (every pair at Jaccard ≥ τ), no prefix filter to
    * share bugs with. Same hashed-distinct shingle sets, integer
    * cross-multiplied threshold. */
  val ssjoinPrefixSql: String =
    s"""WITH injected AS (
       |  ${docsWithInjectedDupsSql()}
       |), docs AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform($shinglesSql,
       |           s -> ${Hashing.hexHashSql("s")})) AS g
       |  FROM injected
       |)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |       CAST(len(list_intersect(x.g, y.g)) AS BIGINT) AS n_inter,
       |       CAST(len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)) AS BIGINT)
       |         AS n_union,
       |       CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
       |         / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) AS jaccard
       |FROM docs x JOIN docs y ON x.doc_id < y.doc_id
       |WHERE $SsjoinTauDen * len(list_intersect(x.g, y.g))
       |        >= $SsjoinTauNum * (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)))
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- benchmark decontamination --------------------------------------------

  /** Containment threshold as an exact rational: a (train, eval) pair is
    * contaminated when the train doc covers ≥ num/den of the eval doc's
    * distinct word-3-gram shingles. Containment (not absolute count) is the
    * real-world rule — a short eval item fully embedded in a long training
    * doc must flag, and an absolute floor would miss it (measured: sf0.001
    * eval docs with 8 shingles slipped under a 25-shingle floor). */
  val DecontamNum = 4
  val DecontamDen = 5

  /** Train/eval overlap detection — benchmark DECONTAMINATION, the step
    * every serious training-data pipeline runs before the corpus ships:
    * find training documents containing ≥ 4/5 of some held-out eval
    * document's distinct word-3-gram shingles. The synthetic eval split is
    * doc_id % 97 = 0; copies of the first eval docs are injected into the
    * train side (id + 2000000) so the query verifiably fires at 100%
    * containment (organic 3-gram collisions over the small vocab sit far
    * below 4/5).
    *
    * Scale shape: the eval set is SMALL BY NATURE (benchmarks are KBs, the
    * corpus is TBs) — its shingle-hash rows BROADCAST, so the train side is
    * scanned once, map-side joined, and only matching (train, eval, shingle)
    * rows reach the pair-count shuffle. Text never shuffles — 8-byte hashes
    * only. Emits one row per contaminated pair with the exact overlap count
    * (n_shared ≥ threshold), ordered for the driver's hash compare. */
  def decontaminate(spark: SparkSession, d: String): DataFrame = {
    val docs = documents(spark, d).select(col("doc_id"), col("text"))
    val isEval = col("doc_id") % 97 === 0
    val trainDocs = docs.where(!isEval).union(
      docs.where(isEval && col("doc_id") < 300)
        .select((col("doc_id") + lit(2000000)).as("doc_id"), col("text")))
    val shTrain = shingleHashRows(trainDocs)
    val shEval = shingleHashRows(docs.where(isEval))
      .localCheckpoint() // tiny; consumed by the size agg and the probe join
    val evalSizes = shEval.groupBy(col("doc_id").as("eval_id"))
      .agg(count(lit(1)).as("m_eval"))
    shTrain.as("t")
      .join(broadcast(shEval.as("e")), col("t.h") === col("e.h"))
      .groupBy(col("t.doc_id").as("train_id"), col("e.doc_id").as("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(evalSizes), "eval_id")
      .where(col("n_shared") * DecontamDen >= col("m_eval") * DecontamNum)
      .select(col("train_id"), col("eval_id"), col("n_shared"), col("m_eval"))
      .orderBy("train_id", "eval_id")
  }

  val decontaminateSql: String =
    s"""WITH evals AS (
       |  SELECT doc_id, list_distinct(list_transform($shinglesSql,
       |           s -> ${Hashing.hexHashSql("s")})) AS g
       |  FROM documents WHERE doc_id % 97 = 0
       |), train AS (
       |  SELECT doc_id, list_distinct(list_transform($shinglesSql,
       |           s -> ${Hashing.hexHashSql("s")})) AS g
       |  FROM documents WHERE doc_id % 97 <> 0
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id,
       |         list_distinct(list_transform($shinglesSql,
       |           s -> ${Hashing.hexHashSql("s")})) AS g
       |  FROM documents WHERE doc_id % 97 = 0 AND doc_id < 300
       |)
       |SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
       |       CAST(len(list_intersect(t.g, e.g)) AS BIGINT) AS n_shared,
       |       CAST(len(e.g) AS BIGINT) AS m_eval
       |FROM train t CROSS JOIN evals e
       |WHERE $DecontamDen * len(list_intersect(t.g, e.g)) >= $DecontamNum * len(e.g)
       |ORDER BY train_id, eval_id""".stripMargin

  // ---- substring-level dedup: duplicated n-gram spans -----------------------
  // The span-granular dedup primitive (Lee et al., "Deduplicating Training
  // Data Makes Language Models Better"): instead of whole-document near-dup,
  // find the exact token K-gram RUNS a document shares with any other
  // document — the unit you'd actually cut from a training corpus. Two
  // relational passes: (1) group the corpus's positional K-grams by gram to
  // find cross-document duplicates; (2) per doc, merge overlapping/adjacent
  // duplicated positions into maximal spans (gaps-and-islands: running-max
  // window + island numbering sharing ONE per-doc sort).
  //
  // Scale: the gram shuffle is the one heavy exchange and it is inherent
  // to cross-document matching — gram text reduces to an 8-byte hash AT
  // THE SCAN (the winnow/minhash discipline: shuffle only ids +
  // fixed-width values, never gram strings). Since round 17 that shuffle
  // happens exactly ONCE: "gram appears in ≥2 docs" is computed as
  // `min(doc_id) OVER (PARTITION BY gram) <> max(doc_id) OVER (...)` —
  // the dup flag rides on the same shuffled rows, replacing the old
  // groupBy(gram)+self-join shape that exploded and shuffled the
  // positional grams TWICE (measured 2.1x at sf0.1, ProbeR17; one fewer
  // exchange in the plan). Window groups are per-gram (a handful of
  // positions each; a degenerate heavy gram spills, and its rows were
  // shuffled by the old join anyway). Span merging shuffles once on
  // doc_id and both window passes share the sort.
  //
  // Collision bound: the hash is 60 bits (15 md5 hex chars), so by the
  // birthday bound P(any two distinct grams collide) ≈ n²/2^61 — at 10^9
  // distinct grams (~a 100 TB text corpus) that is ~4×10^-4 for one false
  // shared-gram POSITION, which span merging can only extend by ≤ K-1
  // tokens; acceptable for corpus curation. Because the DuckDB oracle
  // restates the identical hash, the harness structurally cannot catch a
  // collision-induced wrong answer — DedupSpec's "duplicated-span stats
  // match a brute-force in-Scala reference" is the STRING-EXACT canary
  // (its reference shares grams by true string equality, never a hash)
  // cross-checking this path on a fixed corpus.

  val SpanK = 5

  /** (doc_id, pos, gram): 1-based token positions of the doc's K-gram
    * stream; docs shorter than K tokens contribute nothing. The token
    * array is sliced per position (O(K) each) — never per-character
    * substr (the round-4 O(n²) trap). */
  private def gramPositions(spark: SparkSession, d: String): DataFrame =
    // r21: one codegen'd pass ([[graft.plans.WordKgramHashesExpr]])
    // replaces the interpreted transform/slice/array_join HOF chain +
    // per-gram hexHash — same positional grams, same hashes (spec'd)
    documents(spark, d)
      .select(col("doc_id"),
        posexplode(graft.plans.WordKgramHashes.kgramHashes(col("text"), SpanK)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gram"))

  private val gramPositionsSql: String =
    s"""toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), posu AS (
      |  SELECT doc_id, t,
      |         unnest(generate_series(1, len(t) - ${SpanK - 1})) AS pos
      |  FROM toks
      |), grams AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |         ${Hashing.hexHashSql(
                  s"array_to_string(t[pos:pos + ${SpanK - 1}], ' ')")} AS gram
      |  FROM posu
      |), shared AS (
      |  SELECT gram FROM grams GROUP BY gram
      |  HAVING count(DISTINCT doc_id) > 1
      |)""".stripMargin

  /** Per-doc duplicated-K-gram stats: total positional grams, positions
    * whose gram appears in ≥ 2 docs, and distinct such grams. */
  def dupNgrams(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("gram")
    // one gram-keyed pass: min≠max doc_id over the gram partition IS
    // "appears in ≥2 docs" (same-doc repeats keep min = max)
    val flagged = gramPositions(spark, d).withColumn("dup",
      min(col("doc_id")).over(w) =!= max(col("doc_id")).over(w))
    flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_pos"),
        countDistinct(when(col("dup"), col("gram"))).as("n_dup_distinct"))
      .orderBy("doc_id")
  }

  val dupNgramsSql: String =
    s"""WITH $gramPositionsSql
      |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
      |       CAST(sum(CASE WHEN s.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_dup_pos,
      |       CAST(count(DISTINCT CASE WHEN s.gram IS NOT NULL THEN g.gram END)
      |            AS BIGINT) AS n_dup_distinct
      |FROM grams g LEFT JOIN shared s ON g.gram = s.gram
      |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  /** Maximal duplicated spans per doc: overlapping or adjacent duplicated
    * K-gram positions merge into islands; outputs span count, total
    * covered tokens, and the longest span. Docs with no duplicated gram
    * are absent (they carry no spans). */
  def dupSpans(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wg = Window.partitionBy("gram")
    // same one-pass dup flag as [[dupNgrams]] — no join, one gram shuffle
    val dupPos = gramPositions(spark, d)
      .withColumn("dup",
        min(col("doc_id")).over(wg) =!= max(col("doc_id")).over(wg))
      .where(col("dup"))
      .select(col("doc_id"), col("pos"), (col("pos") + SpanK - 1).as("e"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prevMaxEnd = max(col("e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = dupPos
      .withColumn("is_new",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd + 1, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), max(col("e")).as("e2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e2") - col("s") + 1).as("covered_tokens"),
        max(col("e2") - col("s") + 1).as("max_span"))
      .orderBy("doc_id")
  }

  /** The shared gram → duplicated-position → island-merge CTE chain
    * (everything up to per-island extents), reused by the span stats and
    * the corpus-cut rollup oracles. */
  private val spanChainSql: String =
    s"""$gramPositionsSql,
      |dup AS (
      |  SELECT g.doc_id, g.pos, g.pos + ${SpanK - 1} AS e
      |  FROM grams g JOIN shared s ON g.gram = s.gram
      |), flg AS (
      |  SELECT doc_id, pos, e,
      |         CASE WHEN max(e) OVER pw IS NULL OR pos > max(e) OVER pw + 1
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM dup
      |  WINDOW pw AS (PARTITION BY doc_id ORDER BY pos
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |), isl AS (
      |  SELECT doc_id, pos, e,
      |         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM flg
      |), spans AS (
      |  SELECT doc_id, island, min(pos) AS s, max(e) AS e2
      |  FROM isl GROUP BY doc_id, island
      |)""".stripMargin

  val dupSpansSql: String =
    s"""WITH $spanChainSql
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |       CAST(sum(e2 - s + 1) AS BIGINT) AS covered_tokens,
      |       CAST(max(e2 - s + 1) AS BIGINT) AS max_span
      |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Corpus-cut rollup: what span-level dedup would actually remove, per
    * source — the report that drives the keep/cut decision. Composes
    * [[dupSpans]] (docs without spans kept via LEFT join, zero removed);
    * retention is exact integer ppm. */
  def spanCut(spark: SparkSession, d: String): DataFrame = {
    val spans = dupSpans(spark, d).select(col("doc_id"), col("covered_tokens"))
    documents(spark, d)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(coalesce(col("covered_tokens"), lit(0L))).as("removed_tokens"))
      .withColumn("retained_ppm",
        expr("((total_tokens - removed_tokens) * 1000000) div total_tokens"))
      .orderBy("source")
  }

  val spanCutSql: String =
    s"""WITH $spanChainSql,
      |per_doc AS (
      |  SELECT doc_id, CAST(sum(e2 - s + 1) AS BIGINT) AS covered
      |  FROM spans GROUP BY doc_id
      |)
      |SELECT d.source, count(*) AS n_docs,
      |       CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS total_tokens,
      |       CAST(sum(COALESCE(p.covered, 0)) AS BIGINT) AS removed_tokens,
      |       CAST((CAST(sum(len(string_split(d.text, ' '))) AS BIGINT)
      |             - CAST(sum(COALESCE(p.covered, 0)) AS BIGINT)) * 1000000
      |            // CAST(sum(len(string_split(d.text, ' '))) AS BIGINT)
      |            AS BIGINT) AS retained_ppm
      |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin

  // ---- robust winnowing fingerprints (MOSS) ---------------------------------

  /** Winnowing gram width (word K-grams) and window size: every window of
    * WinnowW consecutive gram hashes contributes its minimum — the classic
    * guarantee that any shared run of WinnowK+WinnowW-1 tokens yields at
    * least one shared fingerprint (Schleimer/Wilkerson/Aiken, MOSS). */
  val WinnowK = 4
  val WinnowW = 4

  /** Fingerprints live in 40 bits and positions in 20, so the combined
    * selection key h·2^20 + (2^20-1-pos) fits a long: minimizing it picks
    * the smallest hash and, on ties, the RIGHTMOST position — robust
    * winnowing's tie rule — in one integer min both engines agree on. */
  val WinnowFpMod = 1099511627776L // 2^40
  val WinnowPosMod = 1048576L      // 2^20

  /** Selected fingerprints per document. One hash exchange on doc_id
    * serves both window passes (min and frame-count share the frame);
    * text never shuffles — gram hashes reduce to longs at the scan. Docs
    * shorter than WinnowK+WinnowW-1 tokens have no full window and emit
    * nothing (the standard winnowing domain). */
  def winnow(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r21: same codegen'd k-gram pass as [[gramPositions]] (WordKgramHashesExpr)
    val keyed = documents(spark, d)
      .select(col("doc_id"),
        posexplode(graft.plans.WordKgramHashes.kgramHashes(col("text"), WinnowK)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        (col("col") % WinnowFpMod).as("h40"))
      .select(col("doc_id"), col("pos"),
        (col("h40") * WinnowPosMod + (lit(WinnowPosMod - 1) - col("pos"))).as("k"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, WinnowW - 1)
    keyed
      .select(col("doc_id"), min(col("k")).over(w).as("mk"),
        count(lit(1)).over(w).as("nwin"))
      .where(col("nwin") === WinnowW)
      .select(col("doc_id"),
        (lit(WinnowPosMod - 1) - col("mk") % WinnowPosMod).as("fpos"),
        expr(s"mk div $WinnowPosMod").as("fp"))
      .distinct()
      .orderBy("doc_id", "fpos", "fp")
  }

  private val winnowChainSql: String =
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), posu AS (
       |  SELECT doc_id, t,
       |         unnest(generate_series(1, len(t) - ${WinnowK - 1})) AS pos
       |  FROM toks
       |), keyed AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |         (${Hashing.hexHashSql(s"array_to_string(t[pos:pos + ${WinnowK - 1}], ' ')")}
       |          % $WinnowFpMod) * $WinnowPosMod
       |           + ($WinnowPosMod - 1 - pos) AS k
       |  FROM posu
       |), wmin AS (
       |  SELECT doc_id,
       |         min(k) OVER fw AS mk,
       |         count(*) OVER fw AS nwin
       |  FROM keyed
       |  WINDOW fw AS (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING)
       |), sel AS (
       |  SELECT DISTINCT doc_id,
       |         $WinnowPosMod - 1 - (mk % $WinnowPosMod) AS fpos,
       |         mk // $WinnowPosMod AS fp
       |  FROM wmin WHERE nwin = $WinnowW
       |)""".stripMargin

  val winnowSql: String =
    s"""WITH $winnowChainSql
       |SELECT doc_id, fpos, fp FROM sel ORDER BY doc_id, fpos, fp""".stripMargin

  /** Stop-fingerprint cap: a fingerprint present in more than DfCap docs is
    * boilerplate and generates O(df²) pairs — dropped BEFORE the pair join,
    * the same guard every LSH family here uses. Deterministic, mirrored in
    * the oracle. */
  val WinnowDfCap = 50

  /** Pairs at or above this many shared distinct fingerprints. */
  val WinnowMinShared = 3

  /** MOSS-style overlap pairs: documents sharing ≥ WinnowMinShared distinct
    * winnowing fingerprints. Candidates meet only inside a fingerprint
    * posting (bounded by WinnowDfCap) — never a cross product; the join
    * carries (doc_id, fp) longs only. */
  def winnowPairs(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE pass over the (expensive) winnow chain: the old df-filter
    // (agg + join) and posting self-join re-derived it up to 4x. The
    // fp-window df prefilter rides the same fp shuffle as the bucket
    // collect (exchange reuse), the DfCap bounds every collected bucket
    // BEFORE it materializes (a boilerplate fingerprint shared by
    // millions of docs never builds a bucket), and the ≤ cap²/2 pairs
    // expand with array HOFs — the bucketed-candidate discipline the
    // minhash/ANN paths already use. 1.23x at sf0.1 (ProbeR17b),
    // identical results.
    val sel = winnow(spark, d).select(col("doc_id"), col("fp")).distinct()
    val wfp = Window.partitionBy("fp")
    sel.withColumn("df", count(lit(1)).over(wfp))
      .where(col("df").between(2, WinnowDfCap))
      .groupBy(col("fp"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ds) - 2),
          |  i -> transform(slice(ds, i + 2, size(ds) - i - 1),
          |    b -> struct(ds[i] AS doc_a, b AS doc_b))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= WinnowMinShared)
      .orderBy("doc_a", "doc_b")
  }

  val winnowPairsSql: String =
    s"""WITH $winnowChainSql,
       |dfp AS (
       |  SELECT DISTINCT doc_id, fp FROM sel
       |), keep AS (
       |  SELECT fp FROM dfp GROUP BY fp
       |  HAVING count(*) BETWEEN 2 AND $WinnowDfCap
       |), posting AS (
       |  SELECT dfp.doc_id, dfp.fp FROM dfp JOIN keep ON dfp.fp = keep.fp
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(count(*) AS BIGINT) AS shared
       |FROM posting a JOIN posting b
       |  ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY doc_a, doc_b
       |HAVING count(*) >= $WinnowMinShared
       |ORDER BY doc_a, doc_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_winnow"        -> ((s, d) => winnow(s, d)),
    "q_winnow_pairs"  -> ((s, d) => winnowPairs(s, d)),
    "q_dup_ngrams"    -> ((s, d) => dupNgrams(s, d)),
    "q_dup_spans"     -> ((s, d) => dupSpans(s, d)),
    "q_span_cut"      -> ((s, d) => spanCut(s, d)),
    "q_ssjoin_prefix" -> ((s, d) => ssjoinPrefix(s, d)),
    "q_decontaminate" -> ((s, d) => decontaminate(s, d)),
    "q_sorted_neighbors" -> ((s, d) => sortedNeighborPairs(s, d)),
    "q_dedup_exact"   -> ((s, d) => exactDedup(s, d)),
    "q_dedup_keep"    -> ((s, d) => dedupKeepBest(s, d)),
    "q_minhash_sig"   -> ((s, d) => minhashSig(s, d)),
    "q_minhash_pairs" -> ((s, d) => minhashPairs(s, d)),
    "q_dedup_eval"    -> ((s, d) => lshRecallEval(s, d)),
    "q_lsh_sweep"     -> ((s, d) => lshBandingSweep(s, d)),
    "q_simhash"       -> ((s, d) => simhash(s, d)),
    "q_simhash_pairs" -> ((s, d) => simhashPairs(s, d)),
    "q_ngram_jaccard" -> ((s, d) => ngramJaccard(s, d)),
    "q_fuzzy_pairs"   -> ((s, d) => fuzzyPairs(s, d)),
    "q_dup_clusters"  -> ((s, d) => dupClusters(s, d)))

  def oracles: Map[String, String] = Map(
    "q_winnow"        -> winnowSql,
    "q_winnow_pairs"  -> winnowPairsSql,
    "q_dup_ngrams"    -> dupNgramsSql,
    "q_dup_spans"     -> dupSpansSql,
    "q_span_cut"      -> spanCutSql,
    "q_ssjoin_prefix" -> ssjoinPrefixSql,
    "q_decontaminate" -> decontaminateSql,
    "q_sorted_neighbors" -> sortedNeighborPairsSql(),
    "q_dedup_exact"   -> exactDedupSql,
    "q_dedup_keep"    -> dedupKeepBestSql,
    "q_minhash_sig"   -> minhashSigSql,
    "q_minhash_pairs" -> minhashPairsSql(),
    "q_dedup_eval"    -> lshRecallEvalSql(),
    "q_lsh_sweep"     -> lshBandingSweepSql(),
    "q_simhash"       -> simhashSql,
    "q_simhash_pairs" -> simhashPairsSql(),
    "q_ngram_jaccard" -> ngramJaccardSql(),
    "q_fuzzy_pairs"   -> fuzzyPairsSql(),
    "q_dup_clusters"  -> dupClustersSql)
}
