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
    */
  def exactDedup(spark: SparkSession, d: String): DataFrame =
    docsWithInjectedDups(spark, d)
      .groupBy(Hashing.hexHash(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col("doc_id"))).as("member_ids"))
      .where(col("n_copies") > 1)
      .orderBy("keep_doc_id")

  val exactDedupSql: String =
    s"""SELECT ${Hashing.hexHashSql("text")} AS content_hash,
       |       min(doc_id) AS keep_doc_id,
       |       count(*) AS n_copies,
       |       list(doc_id ORDER BY doc_id) AS member_ids
       |FROM (${docsWithInjectedDupsSql()})
       |GROUP BY 1 HAVING count(*) > 1
       |ORDER BY keep_doc_id""".stripMargin

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

  /** Per-shingle 31-bit base hashes (the only md5 work per document). */
  def baseHashes(text: Column): Column =
    transform(shingles(text), s => Hashing.smallHash(s))

  /** sig[i] = min over shingles of (a_i·h0 + b_i) mod P31, from the
    * precomputed base-hash array. */
  def signatureFromBase(h0: Column): Column =
    array((0 until NumHashes).map { i =>
      array_min(transform(h0, h =>
        pmod(h * lit(seedA(i)) + lit(seedB(i)), lit(Hashing.P31))))
    }: _*)

  val baseHashesSql: String =
    s"list_transform($shinglesSql, s -> ${Hashing.smallHashSql("s")})"

  def signatureFromBaseSql(h0: String): String =
    "[" + (0 until NumHashes).map { i =>
      s"list_min(list_transform($h0, h -> (h * ${seedA(i)} + ${seedB(i)}) % ${Hashing.P31}))"
    }.mkString(", ") + "]"

  def minhashSig(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(col("doc_id"), baseHashes(col("text")).as("h0"))
      .select(col("doc_id"), signatureFromBase(col("h0")).as("minhash"))

  val minhashSigSql: String =
    s"""SELECT doc_id, ${signatureFromBaseSql("h0")} AS minhash
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
  def minhashPairs(spark: SparkSession, d: String, threshold: Double = 0.8): DataFrame = {
    // two-stage projection so shingles and base hashes are computed exactly
    // once per document, shared by the signature and the Jaccard verify
    val docs = docsWithInjectedDups(spark, d)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .select(col("doc_id"), col("sh"),
        transform(col("sh"), s => Hashing.smallHash(s)).as("h0"))
      .select(col("doc_id"), col("sh"), signatureFromBase(col("h0")).as("sig"))

    val bands = docs.select(col("doc_id"),
        explode(array((0 until Bands).map(b =>
          struct(lit(b).as("band_id"),
            slice(col("sig"), b * RowsPerBand + 1, RowsPerBand).as("band_key"))): _*))
          .as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))

    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sa = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    candidates.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def minhashPairsSql(threshold: Double = 0.8): String =
    s"""WITH base AS (
       |  SELECT doc_id, $shinglesSql AS sh, $baseHashesSql AS h0
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

  // ---- SimHash ---------------------------------------------------------------

  val SimHashBits = 32

  /** 32-bit SimHash: per-token 60-bit hashes, bit-majority vote per
    * position. Bit positions are compile-time constants, so the shifts are
    * literal and the whole expression stays in codegen. */
  def simhashCol(text: Column): Column = {
    val th = transform(array_distinct(tokens(text)), t => Hashing.hexHash(t))
    (0 until SimHashBits).map { j =>
      when(aggregate(th, lit(0L),
          (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
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
    documents(spark, d)
      .select(col("doc_id"), simhashCol(col("text")).as("simhash"))

  val simhashSql: String =
    s"SELECT doc_id, $simhashColSql AS simhash FROM documents"

  /** SimHash near-dup pairs: band the 32 bits into 4 bytes; docs sharing any
    * byte become candidates (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 identical byte);
    * verify with bit_count(xor) ≤ maxHamming. Same no-O(n²) shape as
    * minhashPairs. */
  def simhashPairs(spark: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    val docs = docsWithInjectedDups(spark, d)
      .select(col("doc_id"), simhashCol(col("text")).as("simhash"))

    val bands = docs.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_id"),
            shiftright(col("simhash"), b * 8).bitwiseAND(255L).as("band_key"))): _*))
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
       |  SELECT doc_id, simhash, b AS band_id, (simhash >> (b*8)) & 255 AS band_key
       |  FROM docs, range(0, 4) AS t(b)
       |)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |       bit_count(xor(x.simhash, y.simhash)) AS hamming
       |FROM bands x JOIN bands y
       |  ON x.band_id = y.band_id AND x.band_key = y.band_key
       | AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- n-gram Jaccard within bounded buckets ---------------------------------

  /** Character-3-gram Jaccard over same-(lang, source, length-bucket) pairs.
    * The bucket key bounds candidates (no global self-join); the length
    * bucket is the standard cheap pre-filter: near-dups have near-equal
    * length. */
  def ngramJaccard(spark: SparkSession, d: String, threshold: Double = 0.9): DataFrame = {
    val base = documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
    val injected = base.union(
      base.where(col("doc_id") < 20)
        .select((col("doc_id") + lit(1000000)).as("doc_id"),
          col("lang"), col("source"), col("n_chars"), col("text")))
    val docs = injected
      .select(col("doc_id"), col("lang"), col("source"),
        floor(col("n_chars") / lit(40.0)).cast("int").as("len_bucket"),
        gramsCol(col("text")).as("g"))
    docs.as("x").join(docs.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.len_bucket") === col("y.len_bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .withColumn("inter", size(array_intersect(col("x.g"), col("y.g"))))
      .withColumn("jaccard",
        col("inter") / (size(col("x.g")) + size(col("y.g")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Distinct character 3-grams via dynamic substring in a lambda. */
  private def gramsCol(t: Column): Column =
    array_distinct(
      when(length(t) >= 3,
        transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
        .otherwise(array(t)))

  def ngramJaccardSql(threshold: Double = 0.9): String =
    s"""WITH injected AS (
       |  SELECT doc_id, lang, source, n_chars, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, lang, source, n_chars, text FROM documents
       |  WHERE doc_id < 20
       |), docs AS (
       |  SELECT doc_id, lang, source, CAST(floor(n_chars / 40.0) AS INT) AS len_bucket,
       |         list_distinct(CASE WHEN length(text) >= 3
       |           THEN list_transform(generate_series(1, length(text) - 2),
       |                  i -> substring(text, i, 3))
       |           ELSE [text] END) AS g
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact"   -> ((s, d) => exactDedup(s, d)),
    "q_minhash_sig"   -> ((s, d) => minhashSig(s, d)),
    "q_minhash_pairs" -> ((s, d) => minhashPairs(s, d)),
    "q_simhash"       -> ((s, d) => simhash(s, d)),
    "q_simhash_pairs" -> ((s, d) => simhashPairs(s, d)),
    "q_ngram_jaccard" -> ((s, d) => ngramJaccard(s, d)))

  def oracles: Map[String, String] = Map(
    "q_dedup_exact"   -> exactDedupSql,
    "q_minhash_sig"   -> minhashSigSql,
    "q_minhash_pairs" -> minhashPairsSql(),
    "q_simhash"       -> simhashSql,
    "q_simhash_pairs" -> simhashPairsSql(),
    "q_ngram_jaccard" -> ngramJaccardSql())
}
