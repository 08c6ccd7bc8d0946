package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Hashing

/** Text-analysis operators for training-data curation: language ID (stopword
  * heuristic), quality scoring, token counting, and content fingerprinting.
  * All map-only (no shuffle): at 100 TB these run at scan speed and pipeline
  * into whatever filter/group follows.
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  // ---- token counting -------------------------------------------------------

  /** Whitespace token count + a BPE-ish regex token count (letter runs,
    * digit runs, single punctuation — the usual pre-tokenizer shape). */
  def tokenCount(spark: SparkSession, d: String): DataFrame =
    documents(spark, d).select(
      col("doc_id"),
      // long casts: Spark size()/length() are int32, DuckDB len()/length()
      // are int64 — align output schema to the oracle's
      size(toks(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_calc"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS ws_tokens,
      |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
      |       length(text) AS n_chars_calc
      |FROM documents""".stripMargin

  // ---- feature hashing (hashing trick) --------------------------------------

  /** Signed hashing-trick featurization: each whitespace token lands in
    * bucket `hexHash(tok) mod D` with sign `±1` from an independent hash
    * (the signed variant keeps collision bias zero-mean — Weinberger et al.,
    * public feature-hashing construction). Output is the sparse form
    * (doc_id, bucket, feat): explode → map-side-combinable hash agg keyed
    * (doc_id, bucket), so the shuffle carries at most D=64 rows per doc no
    * matter how long the text — the fixed-width featurizer a 100 TB corpus
    * feeds to a linear probe/classifier without ever building a vocab. */
  def featureHash(spark: SparkSession, d: String): DataFrame = {
    val D = 64L
    documents(spark, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(Hashing.hexHash(col("tok")), lit(D)).as("bucket"),
        when(pmod(Hashing.hexHash(concat(lit("s#"), col("tok"))), lit(2L)) === 0,
          lit(1L)).otherwise(lit(-1L)).as("sign"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sign")).as("feat"))
  }

  val featureHashSql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |)
      |SELECT doc_id,
      |       ${Hashing.hexHashSql("tok")} % 64 AS bucket,
      |       CAST(sum(CASE WHEN ${Hashing.hexHashSql("'s#' || tok")} % 2 = 0
      |                     THEN 1 ELSE -1 END) AS BIGINT) AS feat
      |FROM tok
      |GROUP BY 1, 2""".stripMargin

  // ---- quality scoring ------------------------------------------------------

  /** Heuristic quality features: token stats, lexical diversity, stopword
    * ratio, mean token length — single divisions of exact ints, so doubles
    * agree bit-for-bit across engines. */
  def qualityScore(spark: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val stop = Seq("the", "a", "of", "and", "is", "in", "to", "it")
    documents(spark, d).select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      (size(array_distinct(t)) / size(t).cast("double")).as("unique_ratio"),
      (size(filter(t, x => x.isin(stop: _*))) / size(t).cast("double"))
        .as("stopword_ratio"),
      ((length(col("text")) - size(t) + 1) / size(t).cast("double"))
        .as("mean_token_len"))
  }

  val qualityScoreSql: String =
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS n_tokens,
      |       len(list_distinct(string_split(text, ' ')))
      |         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS unique_ratio,
      |       len(list_filter(string_split(text, ' '),
      |             x -> x IN ('the','a','of','and','is','in','to','it')))
      |         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
      |       (length(text) - len(string_split(text, ' ')) + 1)
      |         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len
      |FROM documents""".stripMargin

  // ---- Gopher-style quality-rule filter -------------------------------------

  /** Rule-based document filter in the Gopher/C4 style: each rule is one
    * bit of a reasons bitmask, `keep` = all rules pass — the curation shape
    * where dropped docs stay auditable by failure reason. Every rule is
    * EXACT integer arithmetic (ratios compare cross-multiplied, never as
    * floats), so the bitmask is hash-stable across engines.
    *
    * Rules (bounds picked to discriminate on this corpus; the operator
    * shape — thresholded per-doc scalars ANDed into a mask — is the
    * general one):
    *   bit 0  word count in [25, 90]
    *   bit 1  mean word length in [4, 5]        (4·wc ≤ Σlen ≤ 5·wc)
    *   bit 2  distinct-word ratio ≥ 0.4         (5·distinct ≥ 2·wc)
    *   bit 3  ≥ 2 stopword types present ('the', 'a')
    *
    * Scale: map-only over the scan — one projection, no shuffle, no UDF;
    * everything codegens. */
  /** FILTER-FUNNEL curation report — the standard corpus-cleaning
    * artifact (ccnet/Dolma-style): every document gets its FIRST failing
    * reason in a fixed predicate cascade (length floor, length ceiling,
    * stopword share, lexical diversity), and the report aggregates docs
    * and id-sums per reason. All predicates are integer
    * cross-multiplications (never a float ratio), so the DuckDB oracle
    * reproduces them bit-exactly; at 100 TB this is one map + one
    * 5-group aggregate — no shuffle wider than the reason cardinality. */
  def filterFunnel(spark: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val words = size(t).cast("long")
    val dwords = size(array_distinct(t)).cast("long")
    val stops = size(filter(t,
      w => w === lit("a") || w === lit("the"))).cast("long")
    val reason =
      when(words < 40L, "too_short")
        .when(col("n_chars") > 400L, "too_long")
        .when(stops * 100L > words * 12L, "stopword_heavy")
        .when(dwords * 10L < words * 5L, "low_diversity")
        .otherwise("pass")
    documents(spark, d)
      .select(col("doc_id"), reason.as("reason"))
      .groupBy("reason")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_doc_id"))
      .orderBy("reason")
  }

  val filterFunnelSql: String =
    """WITH sig AS (
      |  SELECT doc_id, n_chars,
      |    len(string_split(text, ' ')) AS words,
      |    len(list_distinct(string_split(text, ' '))) AS dwords,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('a','the'))) AS stops
      |  FROM documents),
      |lab AS (
      |  SELECT doc_id,
      |    CASE WHEN words < 40 THEN 'too_short'
      |         WHEN n_chars > 400 THEN 'too_long'
      |         WHEN stops * 100 > words * 12 THEN 'stopword_heavy'
      |         WHEN dwords * 10 < words * 5 THEN 'low_diversity'
      |         ELSE 'pass' END AS reason
      |  FROM sig)
      |SELECT reason, count(*) AS n_docs,
      |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
      |FROM lab GROUP BY reason ORDER BY reason""".stripMargin

  /** QUALITY-CUTOFF SWEEP — the third tuning curve a curation pipeline
    * reads (after dedup banding and ANN nprobe): an integer-exact
    * quality score per document (lexical diversity + length-band bonus
    * − stopword penalty, all floor-div permille so both engines agree
    * bit-for-bit), bucketed by score/100, with the CUMULATIVE
    * kept-docs/kept-tokens curve from the best bucket down. The
    * operator picks the cutoff whose cumulative token count fits the
    * training budget ("keep the top X% of tokens by quality").
    * ONE map-only scan → ~20-row bucket rollup; both cumulative curves
    * and the grand total come out of [[ScaleTools.globalRankPrefixSums]]
    * over the bucket frame (the total is the sum of the per-partition
    * sums that pass collects anyway — never a second scan of
    * `documents`, and no unpartitioned window; PlanAuditSpec pins both
    * properties). */
  def qualitySweep(spark: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val base = documents(spark, d).select(col("doc_id"),
      greatest(size(t).cast("long"), lit(1L)).as("w"),
      size(array_distinct(t)).cast("long").as("dw"),
      size(filter(t, x => x === lit("a") || x === lit("the")))
        .cast("long").as("st"))
    // +1000 offset keeps the score NONNEGATIVE: Spark's `div` truncates
    // toward zero while DuckDB's `//` floors, so a negative score would
    // bucket differently per engine
    val scored = base.select(col("w"),
      (lit(1000L) + expr("dw * 1000 div w") +
        when(col("w").between(40L, 400L), 200L).otherwise(0L) -
        expr("st * 1000 div w")).as("score"))
    val bucketed = scored
      .select(expr("score div 100").as("bucket"), col("w"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("n_tokens"))
    val (cum, totals) = ScaleTools.globalRankPrefixSums(
      bucketed, Seq(col("bucket").desc),
      Seq((col("n_docs"), "cum_docs"), (col("n_tokens"), "cum_tokens")),
      "__graft_rank")
    val totalTokens = totals(1)
    cum
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        col("cum_docs"), col("cum_tokens"),
        expr(s"(cum_tokens * 1000000) div ${totalTokens}L")
          .as("cum_tokens_ppm"))
      .orderBy(col("bucket").desc)
  }

  val qualitySweepSql: String =
    """WITH sig AS (
      |  SELECT doc_id,
      |    greatest(len(string_split(text, ' ')), 1) AS w,
      |    len(list_distinct(string_split(text, ' '))) AS dw,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('a','the'))) AS st
      |  FROM documents),
      |scored AS (
      |  SELECT w,
      |    1000 + (dw * 1000) // w
      |      + CASE WHEN w BETWEEN 40 AND 400 THEN 200 ELSE 0 END
      |      - (st * 1000) // w AS score
      |  FROM sig),
      |bucketed AS (
      |  SELECT score // 100 AS bucket, count(*) AS n_docs,
      |         CAST(sum(w) AS BIGINT) AS n_tokens
      |  FROM scored GROUP BY 1),
      |cum AS (
      |  SELECT bucket, n_docs, n_tokens,
      |    CAST(sum(n_docs) OVER (ORDER BY bucket DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
      |    CAST(sum(n_tokens) OVER (ORDER BY bucket DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM bucketed)
      |SELECT bucket, n_docs, n_tokens, cum_docs, cum_tokens,
      |       (cum_tokens * 1000000)
      |         // (SELECT CAST(sum(n_tokens) AS BIGINT) FROM bucketed)
      |         AS cum_tokens_ppm
      |FROM cum ORDER BY bucket DESC""".stripMargin

  def gopherFilter(spark: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val wc = size(t).cast("long")
    val sumLen = (length(col("text")) - size(t) + 1).cast("long")
    val dw = size(array_distinct(t)).cast("long")
    val stops = (when(array_contains(t, "the"), 1L).otherwise(0L) +
      when(array_contains(t, "a"), 1L).otherwise(0L))
    val r0 = wc >= 25 && wc <= 90
    val r1 = sumLen >= wc * 4 && sumLen <= wc * 5
    val r2 = dw * 5 >= wc * 2
    val r3 = stops >= 2L
    val flags = when(r0, 1L).otherwise(0L) + when(r1, 2L).otherwise(0L) +
      when(r2, 4L).otherwise(0L) + when(r3, 8L).otherwise(0L)
    documents(spark, d).select(
      col("doc_id"), wc.as("wc"), flags.as("flags"),
      when(r0 && r1 && r2 && r3, 1L).otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  val gopherFilterSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
      |         CAST(length(text) - len(string_split(text, ' ')) + 1 AS BIGINT)
      |           AS sumlen,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS dw,
      |         (CASE WHEN list_contains(string_split(text, ' '), 'the')
      |               THEN 1 ELSE 0 END
      |          + CASE WHEN list_contains(string_split(text, ' '), 'a')
      |                 THEN 1 ELSE 0 END) AS stops
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, wc,
      |         (wc >= 25 AND wc <= 90) AS r0,
      |         (sumlen >= wc * 4 AND sumlen <= wc * 5) AS r1,
      |         (dw * 5 >= wc * 2) AS r2,
      |         (stops >= 2) AS r3
      |  FROM m
      |)
      |SELECT doc_id, wc,
      |       CAST(CASE WHEN r0 THEN 1 ELSE 0 END
      |            + CASE WHEN r1 THEN 2 ELSE 0 END
      |            + CASE WHEN r2 THEN 4 ELSE 0 END
      |            + CASE WHEN r3 THEN 8 ELSE 0 END AS BIGINT) AS flags,
      |       CAST(CASE WHEN r0 AND r1 AND r2 AND r3 THEN 1 ELSE 0 END AS BIGINT)
      |         AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  // ---- language identification ---------------------------------------------

  /** Stopword-set language ID. Marker hits per language, argmax with a fixed
    * tie order (en > de > fr > es), 'und' when nothing matches — the n-gram
    * heuristic shape used by fast LID passes, deterministic and mirrored in
    * the oracle. */
  def langId(spark: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    def score(words: Seq[String]): Column =
      size(filter(t, x => x.isin(words: _*))).cast("long")
    val sEn = score(Seq("the", "a", "of", "and", "is"))
    val sDe = score(Seq("der", "die", "das", "und", "ist"))
    val sFr = score(Seq("le", "la", "les", "et", "est"))
    val sEs = score(Seq("el", "los", "las", "y", "es"))
    val mx = greatest(sEn, sDe, sFr, sEs)
    documents(spark, d).select(
      col("doc_id"), col("lang"),
      sEn.as("s_en"), sDe.as("s_de"), sFr.as("s_fr"), sEs.as("s_es"),
      when(mx === 0, "und")
        .when(sEn === mx, "en").when(sDe === mx, "de")
        .when(sFr === mx, "fr").otherwise("es").as("predicted"))
  }

  val langIdSql: String = {
    def score(words: Seq[String]): String =
      s"len(list_filter(string_split(text, ' '), x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"
    val sEn = score(Seq("the", "a", "of", "and", "is"))
    val sDe = score(Seq("der", "die", "das", "und", "ist"))
    val sFr = score(Seq("le", "la", "les", "et", "est"))
    val sEs = score(Seq("el", "los", "las", "y", "es"))
    val mx = s"greatest($sEn, $sDe, $sFr, $sEs)"
    s"""SELECT doc_id, lang,
       |       $sEn AS s_en, $sDe AS s_de, $sFr AS s_fr, $sEs AS s_es,
       |       CASE WHEN $mx = 0 THEN 'und'
       |            WHEN $sEn = $mx THEN 'en'
       |            WHEN $sDe = $mx THEN 'de'
       |            WHEN $sFr = $mx THEN 'fr'
       |            ELSE 'es' END AS predicted
       |FROM documents""".stripMargin
  }

  // ---- document fingerprinting ----------------------------------------------

  /** Content fingerprints: whole-text 60-bit hash (exact-dup key) + the
    * minimum shingle hash (a winnowing-style robust fingerprint that
    * survives local edits) over normalized text.
    *
    * The min-shingle side is the custom codegen'd
    * [[graft.plans.MinMd5ShingleExpr]] — one map-only pass, NO shuffle (the
    * round-1 shape exploded shingle rows through a window exchange+sort and
    * a hash agg, then joined back; the per-doc min needs none of that). The
    * md5-derived hash is unchanged, so the DuckDB oracle still reproduces
    * every value. */
  def fingerprint(spark: SparkSession, d: String): DataFrame = {
    graft.plans.MinMd5Shingle.register(spark)
    val norm = regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ")
    documents(spark, d)
      .select(col("doc_id"),
        Hashing.hexHash(norm).as("content_fp"),
        expr("min_md5_shingle(regexp_replace(lower(text), '[^a-z0-9 ]', ' '))")
          .as("min_shingle_fp"))
  }

  val fingerprintSql: String = {
    val normSql = "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')"
    val shSql = Dedup.shinglesSql.replace("text", normSql)
    s"""SELECT doc_id,
       |       ${Hashing.hexHashSql(normSql)} AS content_fp,
       |       list_min(list_transform($shSql, s -> ${Hashing.hexHashSql("s")}))
       |         AS min_shingle_fp
       |FROM documents""".stripMargin
  }

  /** Fast-path fingerprint via the custom codegen'd rolling-hash expression
    * ([[graft.plans.MinShingleHashExpr]]): one pass, no shingle arrays. No
    * DuckDB oracle exists for this hash (that's the point — it's the
    * native-speed variant), so the driver records a rows-only check; its
    * correctness is covered by MinShingleHashSpec against a reference
    * implementation. */
  def fastFingerprint(spark: SparkSession, d: String): DataFrame = {
    graft.plans.MinShingleHash.register(spark)
    documents(spark, d).select(
      col("doc_id"),
      expr("min_shingle_hash(text, 9)").as("rolling_fp"))
  }

  /** Compression/repetitiveness signal, restated as the DICTIONARY RATIO:
    * distinct character 3-grams / total 3-gram positions. Near-random text
    * ≈ 1.0; templated or repetitive boilerplate ≪ 1 — the same curation
    * decision the deflate ratio drives, from the same underlying quantity
    * (LZ-family compressors win exactly when the 3-gram dictionary is
    * small relative to the text). Unlike deflate output, this proxy is
    * deterministic across engines, so the query is hash-checkable against
    * DuckDB end to end: integer counts both sides, one final
    * correctly-rounded IEEE division.
    *
    * One codegen'd O(n) pass per row ([[graft.plans.CharNgramCodesExpr]]
    * dedups inside the expression — no explode, no shuffle; a map-only
    * scan at 100 TB). The zlib variant stays available as the
    * `compression_ratio(text)` SQL function
    * ([[graft.plans.CompressionRatioExpr]]), spec-pinned MONOTONE against
    * this proxy on a repetitiveness ladder (CompressionRatioSpec) and
    * exact-checked against java.util.zip. */
  def compressionSignal(spark: SparkSession, d: String): DataFrame = {
    graft.plans.CharNgrams.register(spark)
    val n = length(col("text"))
    documents(spark, d).select(
      col("doc_id"),
      when(n >= 3, (n - lit(2)).cast("long")).otherwise(0L).as("total_3grams"),
      when(n >= 3, size(expr("char_ngram_codes(text)")).cast("long"))
        .otherwise(0L).as("distinct_3grams"),
      when(n >= 3,
        size(expr("char_ngram_codes(text)")).cast("double") / (n - lit(2)))
        .otherwise(1.0).as("dict_ratio"))
  }

  /** DuckDB twin of [[compressionSignal]]: the distinct-trigram count via
    * list_distinct over positional substrings (byte 3-grams ≡ char
    * 3-grams on the ASCII corpus — same identity q_ngram_jaccard uses).
    * CAST(... AS DOUBLE)/(n-2) is a single correctly-rounded division of
    * two exact integers on both engines, so no quantization grid is
    * needed. */
  val compressionSignalSql: String =
    """WITH g AS (
      |  SELECT doc_id, length(text) AS n,
      |         CASE WHEN length(text) >= 3 THEN
      |           length(list_distinct(list_transform(range(1, length(text)-1),
      |             i -> substr(text, CAST(i AS INTEGER), 3))))
      |         ELSE 0 END AS dcount
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN n >= 3 THEN CAST(n-2 AS BIGINT) ELSE 0 END AS total_3grams,
      |  CAST(dcount AS BIGINT) AS distinct_3grams,
      |  CASE WHEN n >= 3 THEN CAST(dcount AS DOUBLE)/(n-2) ELSE 1.0 END AS dict_ratio
      |FROM g
      |ORDER BY doc_id""".stripMargin

  // ---- corpus-weighted top terms (tf-idf shape) ------------------------------

  /** Highest-weighted term per document: tf·N/df — the tf-idf ranking shape
    * with an exact rational weight instead of ln(N/df) (libm log differs in
    * the last ulp across engines; the ranking is the operator under test).
    * Two hash aggregations (tf per (doc, term); df per term) + a broadcast
    * of the 1-row corpus count + a per-doc window top-1 — at scale: token
    * rows shuffle once by (doc, term), once by term; no driver round-trip.
    * Ties break on the term string, so top-1 is deterministic. */
  def topTerms(spark: SparkSession, d: String): DataFrame = {
    val docs = documents(spark, d).select(col("doc_id"), col("text"))
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("t"))
    tf.join(df, "t")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("t").as("top_term"), col("tf"), col("df"),
        col("score"))
      .orderBy("doc_id")
  }

  val topTermsSql: String =
    """WITH tf AS (
      |  SELECT doc_id, t, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY doc_id, t
      |), df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, t AS top_term, tf, df, score FROM (
      |  SELECT tf.doc_id, tf.t, tf.tf, df.df,
      |         CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score,
      |         row_number() OVER (PARTITION BY tf.doc_id
      |                            ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC,
      |                                     tf.t) AS rn
      |  FROM tf JOIN df ON tf.t = df.t CROSS JOIN n) s
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  // ---- end-to-end curation pipeline ------------------------------------------

  /** The training-data curation pass as ONE composed plan: quality-score →
    * filter → exact-dedup (keep lowest doc_id per content hash) → corpus
    * rollup. This is the shape the whole operator suite exists for at
    * 100 TB: scoring is map-only and fuses into the scan, the filter prunes
    * before anything shuffles, dedup shuffles 8-byte content hashes (not
    * text), and the rollup is a partial+final hash agg on low-cardinality
    * keys — one scan, two shuffles, end to end. */
  private def curatedSurvivors(spark: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val scored = documents(spark, d).select(
      col("doc_id"), col("lang"), col("source"), col("text"),
      size(t).cast("long").as("n_tokens"),
      (size(array_distinct(t)) / size(t).cast("double")).as("unique_ratio"))
    val kept = scored.where(col("n_tokens") >= 5 && col("unique_ratio") > 0.3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash")).orderBy(col("doc_id"))
    kept
      .withColumn("content_hash", Hashing.hexHash(col("text")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
  }

  def curationPipeline(spark: SparkSession, d: String): DataFrame =
    curatedSurvivors(spark, d).groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy("lang", "source")

  val curationPipelineSql: String =
    s"""WITH scored AS (
      |  SELECT doc_id, lang, source, text,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         len(list_distinct(string_split(text, ' ')))
      |           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS unique_ratio
      |  FROM documents
      |), kept AS (
      |  SELECT * FROM scored WHERE n_tokens >= 5 AND unique_ratio > 0.3
      |), dedup AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY ${Hashing.hexHashSql("text")} ORDER BY doc_id) AS rn
      |  FROM kept
      |)
      |SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM dedup WHERE rn = 1
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  // ---- curation report over grouping sets ------------------------------------

  /** The curation rollup reported at THREE grains in one pass — (lang,
    * source) leaves, per-lang marginals, grand total — via explicit
    * GROUPING SETS over the deduped survivor set (the report every
    * training-mix review wants, without three scans). Same Expand +
    * partial/final hash-agg physics as the relational grouping-sets
    * operator; the expensive part (score, filter, dedup) runs ONCE. */
  def curationSets(spark: SparkSession, d: String): DataFrame =
    curatedSurvivors(spark, d)
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq()),
        col("lang"), col("source"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("gid"),
        col("lang").asc_nulls_first, col("source").asc_nulls_first)

  val curationSetsSql: String =
    s"""WITH scored AS (
      |  SELECT doc_id, lang, source, text,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         len(list_distinct(string_split(text, ' ')))
      |           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS unique_ratio
      |  FROM documents
      |), kept AS (
      |  SELECT * FROM scored WHERE n_tokens >= 5 AND unique_ratio > 0.3
      |), dedup AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY ${Hashing.hexHashSql("text")} ORDER BY doc_id) AS rn
      |  FROM kept
      |)
      |SELECT CAST(GROUPING(lang, source) AS BIGINT) AS gid,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |       lang, source
      |FROM dedup WHERE rn = 1
      |GROUP BY GROUPING SETS ((lang, source), (lang), ())
      |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin

  // ---- PII redaction --------------------------------------------------------

  private val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRx = "\\+1-555-[0-9]{4}"

  /** PII scrubbing — standard curation pass before text enters a training
    * corpus. The synthetic docs carry no PII, so the query deterministically
    * plants an email + phone per document and then redacts them; the
    * redaction expressions (global regexp_replace + match counting) are the
    * operator under test, and the oracle replays both the planting and the
    * scrub. Map-only, scan-speed at scale. */
  def piiScrub(spark: SparkSession, d: String): DataFrame = {
    val raw = concat(col("text"),
      lit(" contact: user"), col("doc_id"), lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"))
    documents(spark, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("raw"), EmailRx, "<EMAIL>"),
          PhoneRx, "<PHONE>").as("redacted"),
        size(regexp_extract_all(col("raw"), lit(EmailRx), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(PhoneRx), lit(0)))
          .cast("long").as("n_phones"))
  }

  val piiScrubSql: String = {
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val phone = """\+1-555-[0-9]{4}"""
    s"""SELECT doc_id,
       |       regexp_replace(regexp_replace(raw, '$email', '<EMAIL>', 'g'),
       |                      '$phone', '<PHONE>', 'g') AS redacted,
       |       CAST(len(regexp_extract_all(raw, '$email')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(raw, '$phone')) AS BIGINT) AS n_phones
       |FROM (SELECT doc_id,
       |        text || ' contact: user' || doc_id || '@example.com or +1-555-' ||
       |        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
       |      FROM documents)""".stripMargin
  }

  // ---- character entropy (quality signal) -----------------------------------

  /** Per-document Shannon character entropy via the codegen'd
    * [[graft.plans.CharEntropyExpr]] — one histogram pass in the scan
    * stage, zero shuffles (the compositional explode-chars form would
    * shuffle a row per character). Quantized long output; oracle recomputes
    * the same formula relationally. */
  def entropySignal(spark: SparkSession, d: String): DataFrame = {
    graft.plans.CharEntropy.register(spark)
    documents(spark, d).select(
      col("doc_id"), col("lang"),
      expr("char_entropy_q(text)").as("entropy_q"),
      length(col("text")).cast("long").as("n_chars_calc"))
  }

  val entropySignalSql: String =
    """WITH counts AS (
      |  SELECT doc_id, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents) t
      |  GROUP BY doc_id, ch
      |), agg AS (
      |  SELECT doc_id, sum(c) AS n, sum(c * ln(c)) AS s FROM counts GROUP BY doc_id
      |)
      |SELECT d.doc_id, d.lang,
      |       CASE WHEN length(d.text) = 0 THEN 0
      |            ELSE CAST(floor((ln(a.n) - a.s / a.n) / ln(2) * 100) AS BIGINT)
      |       END AS entropy_q,
      |       length(d.text) AS n_chars_calc
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin

  // ---- BM25 term scoring -----------------------------------------------------

  /** BM25 relevance of a fixed literal query-term set against every
    * document. All inputs to the formula are exact (integer tf/df/dl, the
    * avgdl ratio is one double division), the per-term sum runs in literal
    * order on both engines, and the output is 0.01-quantized — so the only
    * cross-engine wiggle is a libm ulp on ln, absorbed by the grid. The
    * corpus stats (N, df per term, avgdl) are ONE tiny aggregate
    * cross-joined (broadcast) onto the scan — at any scale the fact table
    * is touched twice at most, never shuffled on a key. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Terms: Seq[String] = Seq("data", "model", "the")

  def bm25(spark: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val withTf = documents(spark, d).select(
      col("doc_id") +:
        size(t).cast("long").as("dl") +:
        Bm25Terms.zipWithIndex.map { case (term, i) =>
          size(filter(t, _ === lit(term))).cast("long").as(s"tf$i")
        }: _*)
    val statExprs =
      count(lit(1)).cast("double").as("n_docs") +:
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
        Bm25Terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df$i"))
    val stats = withTf.agg(statExprs.head, statExprs.tail: _*)
    val score = Bm25Terms.indices.map { i =>
      val idf = log((col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      val tf = col(s"tf$i").cast("double")
      idf * (tf * lit(Bm25K1 + 1.0)) /
        (tf + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        floor(score * lit(100.0)).as("bm25_q"))
      .orderBy("doc_id")
  }

  val bm25Sql: String = {
    val tfDefs = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"len(list_filter(string_split(text, ' '), x -> x = '$term')) AS tf$i"
    }.mkString(",\n      |         ")
    val dfDefs = Bm25Terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i")
      .mkString(",\n      |         ")
    val score = Bm25Terms.indices.map { i =>
      s"""ln((n_docs - df$i + 0.5) / (df$i + 0.5))
         | * (CAST(tf$i AS DOUBLE) * ${Bm25K1 + 1.0})
         | / (CAST(tf$i AS DOUBLE) + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * dl / avgdl))"""
        .stripMargin.replace("\n", "")
    }.mkString(" + ")
    s"""WITH tf AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |         $tfDefs
      |  FROM documents
      |), stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
      |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
      |         $dfDefs
      |  FROM tf
      |)
      |SELECT tf.doc_id, tf.dl,
      |       CAST(floor(($score) * 100.0) AS BIGINT) AS bm25_q
      |FROM tf CROSS JOIN stats
      |ORDER BY doc_id""".stripMargin
  }

  // ---- training-sequence packing (token-budget bin assignment) --------------

  /** Pack documents into fixed-token-budget training sequences: docs are
    * laid out in a deterministic order (source, then doc_id — the shard
    * order a curation pipeline would write) and CUT into sequences
    * wherever the running token total crosses a multiple of the budget —
    * seq_id = floor((cumsum − tokens)/budget), i.e. each doc belongs to
    * the sequence its FIRST token falls in. This is the contiguous-fill
    * packing a streaming tokenizer applies (greedy first-fit needs
    * sequential state; contiguous fill is one window pass and at most one
    * boundary-straddling doc per sequence — the standard distributed
    * approximation). One window sort per SOURCE partition, so at 100 TB
    * each source shard packs independently — embarrassingly parallel.
    * Output: per sequence: doc count, exact token total, id range. */
  val SeqPackBudget = 512L

  def seqPack(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, d)
      .select(col("source"), col("doc_id"),
        size(toks(col("text"))).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("seq_id", expr(s"(cum - toks) div $SeqPackBudget"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("source", "seq_id")
  }

  val seqPackSql: String =
    s"""WITH t AS (
      |  SELECT source, doc_id, len(string_split(text, ' ')) AS toks
      |  FROM documents
      |), c AS (
      |  SELECT *, sum(toks) OVER (PARTITION BY source ORDER BY doc_id
      |                            ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t
      |)
      |SELECT source, (CAST(cum AS BIGINT) - toks) // $SeqPackBudget AS seq_id,
      |       count(*) AS n_docs,
      |       CAST(sum(toks) AS BIGINT) AS n_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c
      |GROUP BY 1, 2
      |ORDER BY source, seq_id""".stripMargin

  // ---- TF-IDF cosine document similarity (inverted-index join) --------------

  /** Top-[[TfidfTopK]] most-similar documents per document by TF-IDF cosine,
    * via the inverted-index self-join: postings (doc, term, weight) join on
    * TERM, so only documents sharing a term ever pair, and the dot product
    * arrives as one hash-agg over the matched postings — the sparse-vector
    * similarity plan that scales where dense pairwise (n²·dims) cannot.
    * A hash-sampled doc subset bounds Σ df² fanout at any scale factor
    * (this corpus is dense — 31-word vocab — so sampling stands in for the
    * df-cap stopword prune a natural corpus would use; both bound the same
    * quantity, the per-term posting length).
    *
    * Determinism: tf and df are exact longs; idf quantizes to floor(ln·1e3)
    * once per term; weights w = tf·idf_q and the dot/norm sums are exact
    * long arithmetic (order-free), so cosine = dot/(√na·√nb) is the same
    * correctly-rounded double on both engines, requantized to 1e-6. */
  val TfidfTopK = 3

  def tfidfPairs(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(spark, d)
      .where(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
    // postings: (doc_id, term, tf)
    val tf = docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // pinned: feeds df-stats AND both join sides
    val nDocs = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("term"),
        floor(log(col("n_docs").cast("double") / col("df").cast("double")) * 1000)
          .cast("long").as("idf_q"))
    val w = tf.join(broadcast(df), Seq("term"))
      .select(col("doc_id"), col("term"), (col("tf") * col("idf_q")).as("w"))
      .localCheckpoint() // pinned: norms + both posting-join sides
    val norms = w.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("norm2"))
    val dots = w.select(col("doc_id").as("doc_a"), col("term"), col("w").as("wa"))
      .join(w.select(col("doc_id").as("doc_b"), col("term"), col("w").as("wb")), Seq("term"))
      .where(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(sum(col("wa") * col("wb")).as("dot"))
    val rankW = Window.partitionBy(col("doc_a"))
      .orderBy(col("cos_q").desc, col("doc_b"))
    dots
      .join(broadcast(norms.select(col("doc_id").as("doc_a"), col("norm2").as("na"))), "doc_a")
      .join(broadcast(norms.select(col("doc_id").as("doc_b"), col("norm2").as("nb"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        floor(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))) *
          1000000).cast("long").as("cos_q"))
      .withColumn("rnk", row_number().over(rankW).cast("long"))
      .where(col("rnk") <= TfidfTopK)
      .orderBy("doc_a", "rnk")
  }

  val tfidfPairsSql: String =
    s"""WITH docs AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      |), tf AS (
      |  SELECT doc_id, t AS term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM docs)
      |  GROUP BY 1, 2
      |), idf AS (
      |  SELECT term, CAST(floor(ln(
      |           CAST((SELECT count(DISTINCT doc_id) FROM tf) AS DOUBLE)
      |           / CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT) AS idf_q
      |  FROM tf GROUP BY term
      |), w AS (
      |  SELECT tf.doc_id, tf.term, tf.tf * idf.idf_q AS w
      |  FROM tf JOIN idf USING (term)
      |), norms AS (
      |  SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS norm2 FROM w GROUP BY doc_id
      |), dots AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         CAST(sum(a.w * b.w) AS BIGINT) AS dot
      |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT doc_a, doc_b,
      |         CAST(floor(CAST(dot AS DOUBLE)
      |           / (sqrt(CAST(na.norm2 AS DOUBLE)) * sqrt(CAST(nb.norm2 AS DOUBLE)))
      |           * 1000000) AS BIGINT) AS cos_q
      |  FROM dots
      |  JOIN norms na ON na.doc_id = doc_a
      |  JOIN norms nb ON nb.doc_id = doc_b
      |)
      |SELECT doc_a, doc_b, cos_q, rnk FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_a
      |              ORDER BY cos_q DESC, doc_b) AS BIGINT) AS rnk
      |  FROM scored
      |)
      |WHERE rnk <= $TfidfTopK
      |ORDER BY doc_a, rnk""".stripMargin

  // ---- vocabulary coverage (token-frequency head analysis) -------------------

  /** Cumulative vocabulary coverage: rank every token by corpus frequency
    * and report each rank's running share of all token occurrences in exact
    * integer ppm — the "how small can the vocab be" planning table for
    * tokenizer training. One fact shuffle (term counts); the rank + running
    * sum over the vocabulary frame is the two-pass exact form
    * ([[ScaleTools.globalRankPrefixSum]]): range partition on (tf desc,
    * term), local prefix windows PARTITIONED by the range-partition id,
    * broadcast earlier-partition count/sum offsets — at a billion-term
    * vocab no stage ever holds more than one range partition. The grand
    * total falls out of the same per-partition stats (a literal, not a
    * second scan). */
  def vocabCoverage(spark: SparkSession, d: String): DataFrame = {
    val tf = documents(spark, d)
      .select(explode(toks(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val (ranked, tot) = ScaleTools.globalRankPrefixSum(
      tf, Seq(col("tf").desc, col("term").asc), col("tf"), "rank", "run")
    ranked
      .select(col("rank"), col("term"), col("tf"),
        expr(s"(run * 1000000) div ${tot}L").as("cum_ppm"))
      .orderBy("rank")
  }

  val vocabCoverageSql: String =
    """WITH tf AS (
      |  SELECT term, count(*) AS tf
      |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
      |  GROUP BY term
      |), ranked AS (
      |  SELECT term, tf,
      |         CAST(row_number() OVER (ORDER BY tf DESC, term) AS BIGINT) AS rank,
      |         CAST(sum(tf) OVER (ORDER BY tf DESC, term
      |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      |  FROM tf
      |)
      |SELECT rank, term, tf,
      |       CAST((run * 1000000) // (SELECT sum(tf) FROM tf) AS BIGINT) AS cum_ppm
      |FROM ranked ORDER BY rank""".stripMargin

  // ---- PMI term co-occurrence ------------------------------------------------

  /** Pointwise mutual information between vocabulary terms over
    * document-level co-occurrence — the collocation/feature-association
    * signal. Presence rows are (doc, term) for a PLAN-TIME literal
    * vocabulary, so the self-join fan-out is ≤ |V|²/2 pairs per document
    * no matter how large the corpus — the same bounded-candidates
    * discipline as the fixed-vocab BM25. All counts are exact; the single
    * ln runs on an exactly-computed double ratio, spelled identically in
    * both engines, and the 1e-3 grid absorbs libm ulps (rounds toward
    * -inf, invariant #1). */
  val PmiVocab: Seq[String] = Seq("data", "model", "table", "query", "join",
    "spark", "hash", "row", "scan", "filter", "window", "agg")

  private def presence(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("term"))
      .where(col("term").isin(PmiVocab: _*))
      .select(col("doc_id"), col("lang"), col("term")).distinct()

  private def presenceSql: String =
    s"""pres AS (
      |  SELECT DISTINCT doc_id, lang, term
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      |        FROM documents) t
      |  WHERE term IN (${PmiVocab.map(t => s"'$t'").mkString(", ")})
      |)""".stripMargin

  def pmiPairs(spark: SparkSession, d: String): DataFrame = {
    val pres = presence(spark, d).select(col("doc_id"), col("term"))
    val nDocs = documents(spark, d).agg(count(lit(1)).as("n"))
    val nT = pres.groupBy(col("term")).agg(count(lit(1)).as("n_t"))
    val pairs = pres.as("a").join(pres.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("t1"), col("b.term").as("t2"))
      .agg(count(lit(1)).as("n12"))
    pairs
      .join(broadcast(nT.select(col("term").as("t1"), col("n_t").as("n1"))), Seq("t1"))
      .join(broadcast(nT.select(col("term").as("t2"), col("n_t").as("n2"))), Seq("t2"))
      .crossJoin(broadcast(nDocs))
      .select(col("t1"), col("t2"), col("n1"), col("n2"), col("n12"),
        expr("floor(ln(cast(n12 * n as double) / cast(n1 * n2 as double)) * 1000)")
          .as("pmi_q"))
      .orderBy("t1", "t2")
  }

  val pmiPairsSql: String =
    s"""WITH $presenceSql,
      |n_t AS (SELECT term, count(*) AS n_t FROM pres GROUP BY term),
      |pairs AS (
      |  SELECT a.term AS t1, b.term AS t2, count(*) AS n12
      |  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.term < b.term
      |  GROUP BY a.term, b.term
      |)
      |SELECT t1, t2, n1.n_t AS n1, n2.n_t AS n2, n12,
      |       CAST(floor(ln(CAST(n12 * (SELECT count(*) FROM documents) AS DOUBLE)
      |                     / CAST(n1.n_t * n2.n_t AS DOUBLE)) * 1000) AS BIGINT) AS pmi_q
      |FROM pairs
      |JOIN n_t n1 ON n1.term = t1
      |JOIN n_t n2 ON n2.term = t2
      |ORDER BY t1, t2""".stripMargin

  // ---- chi-squared term–label association ------------------------------------

  /** χ² association between language labels and term presence — the
    * classic feature-selection score for labeled corpora. The 2×2
    * contingency counts come from ONE presence aggregation joined onto the
    * (label × vocab) grid (tiny, broadcast, absent combinations coalesce
    * to 0); the χ² itself is one double expression over exact longs,
    * spelled identically in both engines and floor-quantized to a 0.01
    * grid. Degenerate margins (a term in every doc, or none) emit 0 via
    * the den=0 guard instead of dividing by zero. */
  def chi2Terms(spark: SparkSession, d: String): DataFrame = {
    val docs = documents(spark, d)
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val langN = docs.groupBy(col("lang")).agg(count(lit(1)).as("lang_docs"))
    val pres = presence(spark, d)
    val nT = pres.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("n_t"))
    val n11 = pres.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n11"))
    langN.crossJoin(broadcast(nT))
      .join(n11, Seq("lang", "term"), "left")
      .na.fill(0L, Seq("n11"))
      .crossJoin(broadcast(nDocs))
      .select(col("lang"), col("term"), col("n11"),
        expr("""CASE WHEN lang_docs * (n - lang_docs) * n_t * (n - n_t) = 0 THEN 0
               |ELSE floor(cast(n as double)
               |  * cast(n11 * (n - lang_docs - n_t + n11) - (lang_docs - n11) * (n_t - n11) as double)
               |  * cast(n11 * (n - lang_docs - n_t + n11) - (lang_docs - n11) * (n_t - n11) as double)
               |  / cast(lang_docs * (n - lang_docs) * n_t * (n - n_t) as double) * 100)
               |END""".stripMargin).as("chi2_q"))
      .orderBy("lang", "term")
  }

  val chi2TermsSql: String =
    s"""WITH $presenceSql,
      |n_t AS (SELECT term, count(*) AS n_t
      |        FROM (SELECT DISTINCT doc_id, term FROM pres) p GROUP BY term),
      |lang_n AS (SELECT lang, count(*) AS lang_docs FROM documents GROUP BY lang),
      |n11s AS (SELECT lang, term, count(*) AS n11 FROM pres GROUP BY lang, term),
      |grid AS (
      |  SELECT l.lang, t.term, l.lang_docs, t.n_t,
      |         CAST(COALESCE(p.n11, 0) AS BIGINT) AS n11,
      |         (SELECT count(*) FROM documents) AS n
      |  FROM lang_n l CROSS JOIN n_t t
      |  LEFT JOIN n11s p ON p.lang = l.lang AND p.term = t.term
      |)
      |SELECT lang, term, n11,
      |       CAST(CASE WHEN lang_docs * (n - lang_docs) * n_t * (n - n_t) = 0 THEN 0
      |            ELSE floor(CAST(n AS DOUBLE)
      |              * CAST(n11 * (n - lang_docs - n_t + n11) - (lang_docs - n11) * (n_t - n11) AS DOUBLE)
      |              * CAST(n11 * (n - lang_docs - n_t + n11) - (lang_docs - n11) * (n_t - n11) AS DOUBLE)
      |              / CAST(lang_docs * (n - lang_docs) * n_t * (n - n_t) AS DOUBLE) * 100)
      |            END AS BIGINT) AS chi2_q
      |FROM grid
      |ORDER BY lang, term""".stripMargin

  // ---- bigram language-model counts ------------------------------------------

  /** Order-sensitive bigram statistics with exact conditional probabilities
    * in integer ppm — the n-gram LM / next-token table PMI can't give
    * (PMI is order-blind document co-occurrence; this is adjacency).
    * Positions come from the posexplode generator (pipelined in the scan
    * stage), adjacency from ONE lead() window pass partitioned by doc —
    * the only fact shuffle. Bigram counts and the per-prefix totals then
    * share the groupBy(cur) partitioning. Output is vocab²-bounded
    * regardless of corpus size. */
  def bigramLm(spark: SparkSession, d: String): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val pos = documents(spark, d)
      .select(col("doc_id"), posexplode(toks(col("text"))))
    val pairs = pos.withColumn("nxt", lead(col("col"), 1).over(byDoc))
      .where(col("nxt").isNotNull)
    val n12 = pairs.groupBy(col("col").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n12"))
    val byCur = org.apache.spark.sql.expressions.Window.partitionBy("cur")
    n12.withColumn("n_cur", sum(col("n12")).over(byCur))
      .select(col("cur"), col("nxt"), col("n12"), col("n_cur"),
        expr("(n12 * 1000000) div n_cur").as("p_ppm"))
      .orderBy("cur", "nxt")
  }

  val bigramLmSql: String =
    """WITH pos AS (
      |  SELECT doc_id,
      |         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
      |         unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), pairs AS (
      |  SELECT term AS cur,
      |         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      |  FROM pos
      |), n12s AS (
      |  SELECT cur, nxt, count(*) AS n12
      |  FROM pairs WHERE nxt IS NOT NULL GROUP BY cur, nxt
      |)
      |SELECT cur, nxt, n12,
      |       CAST(sum(n12) OVER (PARTITION BY cur) AS BIGINT) AS n_cur,
      |       CAST((n12 * 1000000) // (sum(n12) OVER (PARTITION BY cur)) AS BIGINT) AS p_ppm
      |FROM n12s ORDER BY cur, nxt""".stripMargin

  // ---- repetition quality signal (Gopher-style) ------------------------------

  /** Within-document repetition — the Gopher/MassiveText quality rule the
    * simple length/punct ratios can't see: heavily repeated n-grams mark
    * boilerplate, keyboard mash, and generation loops. Two exact-integer
    * signals per doc: repeated-TOKEN fraction (1 − distinct/total) and
    * repeated-BIGRAM fraction, both in ppm via integer floor-div (no float
    * ever — a ratio of counts, order-free, hash-exact). Map + two tiny
    * per-doc aggregates; at 100 TB this is scan-bound like the other
    * quality signals. Empty docs keep a row with 0s (LEFT JOIN both
    * sides — the ADVICE r4 empty-input rule). */
  def repetitionSignal(spark: SparkSession, d: String): DataFrame = {
    // Round 21 (guide §1.2 step 1): all four counters are per-document, so
    // the old posexplode → lead-window (doc_id exchange) → countDistinct
    // (expand + exchange) → join shape shuffled ~250k token rows for
    // numbers one codegen expression computes in a single pass
    // ([[graft.plans.RepStats]]; 1.70 → sub-second warm, plan has zero
    // pre-sort exchanges — plans/r21/q_repetition_{before,after}.txt).
    // Semantics byte-identical: same tokenizer, exact distinct counts;
    // docs with <2 tokens have n_bigrams = 0 and keep rep_bigram_ppm = 0
    // exactly like the old left-join-null + coalesce path.
    documents(spark, d)
      .select(col("doc_id"), col("lang"),
        graft.plans.RepStats.repStats(col("text")).as("s"))
      .select(col("doc_id"), col("lang"),
        expr("((s.n_tokens - s.n_distinct) * 1000000) div s.n_tokens")
          .as("rep_token_ppm"),
        when(col("s.n_bigrams") > 0,
          expr("((s.n_bigrams - s.n_bigram_distinct) * 1000000) div s.n_bigrams"))
          .otherwise(0L).as("rep_bigram_ppm"))
      .orderBy("doc_id")
  }

  val repetitionSignalSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         len(list_distinct(string_split(text, ' '))) AS n_distinct
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id,
      |         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
      |         unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |         count(DISTINCT (cur, nxt)) AS n_bigram_distinct
      |  FROM (SELECT doc_id, term AS cur,
      |          lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      |        FROM pos) t
      |  WHERE nxt IS NOT NULL
      |  GROUP BY doc_id
      |)
      |SELECT b.doc_id, b.lang,
      |       ((b.n_tokens - b.n_distinct) * 1000000) // b.n_tokens
      |         AS rep_token_ppm,
      |       COALESCE(((g.n_bigrams - g.n_bigram_distinct) * 1000000)
      |         // g.n_bigrams, 0) AS rep_bigram_ppm
      |FROM base b LEFT JOIN bg g ON b.doc_id = g.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // ---- sliding-window document chunking (RAG / context-window prep) ----------

  val ChunkWidth = 40
  val ChunkStride = 20

  /** Overlapping token-window chunking — the retrieval/context-window prep
    * step: split each document into [[ChunkWidth]]-token windows every
    * [[ChunkStride]] tokens. Start positions are 1, 1+s, … ≤
    * max(n − s, 1); with width ≥ 2·stride (as here: 40/20) every token
    * lands in a chunk, trailing windows may run short, and a short doc
    * yields exactly one chunk (narrower widths would truncate the tail —
    * see the coverage note on [[graft.plans.ChunkTokensGen]]). Emits position
    * metadata plus the chunk CONTENT HASH (cross-engine
    * [[graft.functions.Hashing]]) rather than the text — chunk identity is
    * checkable without shuffling strings, the same discipline as the dedup
    * suite. Map-side generate+slice at scan speed; no shuffle at all
    * before the output sort. */
  def chunkDocs(spark: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    documents(spark, d)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          greatest(size(t) - ChunkStride, lit(1)), lit(ChunkStride)))
          .as("start"))
      .select(col("doc_id"),
        (((col("start") - 1) / ChunkStride).cast("long")).as("chunk_idx"),
        col("start").cast("long").as("start_pos"),
        size(slice(toks(col("text")), col("start"), lit(ChunkWidth))).cast("long")
          .as("chunk_len"),
        Hashing.hexHash(
          concat_ws(" ", slice(toks(col("text")), col("start"), lit(ChunkWidth))))
          .as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  val chunkDocsSql: String = {
    val sliceExpr =
      s"list_slice(tk, start, start + ${ChunkWidth - 1})"
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       |), s AS (
       |  SELECT doc_id, tk,
       |         unnest(generate_series(1, greatest(len(tk) - $ChunkStride, 1),
       |                                $ChunkStride)) AS start
       |  FROM t
       |)
       |SELECT doc_id,
       |       (start - 1) // $ChunkStride AS chunk_idx,
       |       CAST(start AS BIGINT) AS start_pos,
       |       CAST(len($sliceExpr) AS BIGINT) AS chunk_len,
       |       ${Hashing.hexHashSql(s"array_to_string($sliceExpr, ' ')")}
       |         AS chunk_hash
       |FROM s
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // ---- composed training-data pipeline --------------------------------------

  /** The COMPOSED corpus-prep pipeline in one plan — what an actual
    * training-data run executes, end to end: quality filter (length +
    * repetition), exact dedup keep-lowest-id (written as the
    * row_number()=1 window so [[graft.plans.RowNumberDedupRule]] replans it
    * to the partial+final argmin aggregate engine-wide), token-window
    * chunking (map-side generate), and hash-sharding with per-shard
    * rollups. Every stage is individually oracle-checked elsewhere; this
    * query proves they COMPOSE — one plan, two shuffles total: the dedup
    * argmin (which necessarily carries the kept rows' text — the content
    * is consumed downstream) and the final shard rollup, which moves only
    * hashes and counts. Thresholds are exact-integer
    * cross-multiplications, so the filter line is engine-identical. */
  def dataPipeline(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = toks(col("text"))
    val filtered = documents(spark, d)
      .withColumn("n_tok", size(t).cast("long"))
      .where(col("n_tok") >= 30L &&
        size(array_distinct(t)).cast("long") * 10L >= col("n_tok") * 3L)
    val deduped = filtered
      .withColumn("tkey", Hashing.hexHash(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("tkey")).orderBy(col("doc_id"))))
      .where(col("rn") === 1)
    val chunks = deduped
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          greatest(size(t) - ChunkStride, lit(1)), lit(ChunkStride)))
          .as("start"))
      .select(col("doc_id"),
        size(slice(toks(col("text")), col("start"), lit(ChunkWidth)))
          .cast("long").as("chunk_len"))
    chunks
      .withColumn("shard",
        pmod(Hashing.hexHash(
          concat(lit("shard:"), col("doc_id").cast("string"))), lit(8L)))
      .groupBy(col("shard"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("total_tokens"))
      .orderBy(col("shard"))
  }

  val dataPipelineSql: String = {
    val slice = s"list_slice(tk, start, start + ${ChunkWidth - 1})"
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
       |), f AS (
       |  SELECT doc_id, text, tk FROM t
       |  WHERE len(tk) >= 30 AND len(list_distinct(tk)) * 10 >= len(tk) * 3
       |), keyed AS (
       |  SELECT doc_id, tk, ${Hashing.hexHashSql("text")} AS tkey,
       |         row_number() OVER (PARTITION BY ${Hashing.hexHashSql("text")}
       |                            ORDER BY doc_id) AS rn
       |  FROM f
       |), kept AS (
       |  SELECT doc_id, tk FROM keyed WHERE rn = 1
       |), s AS (
       |  SELECT doc_id, tk,
       |         unnest(generate_series(1, greatest(len(tk) - $ChunkStride, 1),
       |                                $ChunkStride)) AS start
       |  FROM kept
       |), c AS (
       |  SELECT doc_id, CAST(len($slice) AS BIGINT) AS chunk_len FROM s
       |)
       |SELECT ${Hashing.hexHashSql("'shard:' || CAST(doc_id AS VARCHAR)")} % 8
       |         AS shard,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       count(*) AS n_chunks,
       |       CAST(sum(chunk_len) AS BIGINT) AS total_tokens
       |FROM c
       |GROUP BY 1
       |ORDER BY shard""".stripMargin
  }

  // ---- bigram-LM perplexity scoring ------------------------------------------

  /** Per-document negative log-likelihood under the corpus's OWN add-one-
    * smoothed bigram LM — the classic KenLM-style quality filter (score
    * each doc by how "surprising" its token sequence is; high NLL → noisy
    * or off-distribution text for the training mix).
    *
    * Numerics contract: each bigram's log-prob ln((n12+1)/(n_cur+V)) is
    * quantized to a CENTI-NAT INTEGER (floor ×100 — the repo's entropy
    * grid, wide enough to absorb libm ulps) BEFORE summing, so the per-doc
    * sum is an order-free integer — a distributed groupBy can hash-match a
    * single-threaded oracle exactly. The ln argument set is vocab²-bounded,
    * not corpus-bounded.
    *
    * Plan shape: ONE window pass builds (doc_id, cur, nxt) adjacency rows
    * (the only fact shuffle, same as [[bigramLm]]); the bigram table and
    * the vocab size are vocab²-bounded aggregates BROADCAST back onto the
    * adjacency rows — at 100 TB the fact side is never reshuffled for the
    * lookup. Docs with < 2 tokens (no bigrams) are kept via the final left
    * join with NLL 0 — the engine/oracle row sets must agree on empty
    * inputs. */
  def perplexity(spark: SparkSession, d: String): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val pos = documents(spark, d)
      .select(col("doc_id"), posexplode(toks(col("text"))))
    val pairs = pos.withColumn("nxt", lead(col("col"), 1).over(byDoc))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), col("col").as("cur"), col("nxt"))
      .localCheckpoint() // consumed by the LM build AND the scoring join
    val n12 = pairs.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n12"))
    val nCur = pairs.groupBy(col("cur")).agg(count(lit(1)).as("n_cur"))
    val vocab = documents(spark, d)
      .select(explode(toks(col("text"))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val scored = pairs
      .join(broadcast(n12), Seq("cur", "nxt"))
      .join(broadcast(nCur), Seq("cur"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(log((col("n12") + 1).cast("double") / (col("n_cur") + col("v")))
          * 100).cast("long").as("lp_q"))
      .groupBy(col("doc_id"))
      .agg((-sum(col("lp_q"))).as("nll_q"), count(lit(1)).as("n_bigrams"))
    documents(spark, d).select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_q"), lit(0L)).as("nll_q"),
        coalesce(expr("nll_q div n_bigrams"), lit(0L)).as("avg_nll_q"))
      .orderBy("doc_id")
  }

  val perplexitySql: String =
    """WITH pos AS (
      |  SELECT doc_id,
      |         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
      |         unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), pairs AS (
      |  SELECT doc_id, cur, nxt FROM (
      |    SELECT doc_id, term AS cur,
      |           lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      |    FROM pos) t
      |  WHERE nxt IS NOT NULL
      |), n12s AS (
      |  SELECT cur, nxt, count(*) AS n12 FROM pairs GROUP BY cur, nxt
      |), ncurs AS (
      |  SELECT cur, count(*) AS n_cur FROM pairs GROUP BY cur
      |), vocab AS (
      |  SELECT count(DISTINCT term) AS v FROM pos
      |), scored AS (
      |  SELECT p.doc_id,
      |         CAST(-sum(CAST(floor(ln(CAST(b.n12 + 1 AS DOUBLE) / (c.n_cur + vocab.v))
      |                 * 100) AS BIGINT)) AS BIGINT) AS nll_q,
      |         count(*) AS n_bigrams
      |  FROM pairs p
      |  JOIN n12s b ON p.cur = b.cur AND p.nxt = b.nxt
      |  JOIN ncurs c ON p.cur = c.cur
      |  CROSS JOIN vocab
      |  GROUP BY p.doc_id
      |)
      |SELECT d.doc_id, d.lang,
      |       COALESCE(s.n_bigrams, 0) AS n_bigrams,
      |       COALESCE(s.nll_q, 0) AS nll_q,
      |       COALESCE(s.nll_q // s.n_bigrams, 0) AS avg_nll_q
      |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---- URL parsing (web-crawl curation) -------------------------------------

  /** URL decomposition — the first pass over any crawl manifest: protocol /
    * host / path / query-param extraction. The synthetic docs carry no
    * URLs, so the query deterministically derives one per document from its
    * own fields (same planting discipline as [[piiScrub]]); the operator
    * under test is Spark's native codegen'd `parse_url`, and the oracle
    * replays the derivation and parses with regexes — two independent
    * parser implementations. Map-only, scan-speed. */
  def urlParse(spark: SparkSession, d: String): DataFrame = {
    val url = concat(
      lit("https://"), col("source"), lit(".example.com/docs/"), col("lang"),
      lit("/"), col("doc_id").cast("string"),
      lit("?ref=r"), pmod(col("doc_id"), lit(7L)).cast("string"),
      lit("&page="), pmod(col("doc_id"), lit(13L)).cast("string"))
    documents(spark, d)
      .select(col("doc_id"), url.as("url"))
      .select(
        col("doc_id"), col("url"),
        parse_url(col("url"), lit("PROTOCOL")).as("protocol"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"))
  }

  val urlParseSql: String =
    """SELECT doc_id, url,
      |       regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
      |       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
      |       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
      |       regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param
      |FROM (
      |  SELECT doc_id,
      |         'https://' || source || '.example.com/docs/' || lang || '/' ||
      |         CAST(doc_id AS VARCHAR) || '?ref=r' || CAST(doc_id % 7 AS VARCHAR) ||
      |         '&page=' || CAST(doc_id % 13 AS VARCHAR) AS url
      |  FROM documents)""".stripMargin

  /** [[chunkDocs]] re-expressed over the custom [[graft.plans.ChunkTokensGen]]
    * GENERATOR (UDTF surface): one tokenize per document instead of one per
    * chunk row, same contract, same oracle. Uses the shim-wrapped Column
    * directly (no registry dependency), so it runs on any session; the SQL
    * spelling `LATERAL VIEW chunk_tokens(...)` is exercised in
    * ChunkTokensGenSpec. */
  def chunkDocsGen(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    val gen = GraftSqlShim.column(graft.plans.ChunkTokensGen(
      GraftSqlShim.expression(col("text")), ChunkWidth, ChunkStride))
    documents(spark, d)
      .select(col("doc_id"), gen.as(Seq("chunk_idx", "start_pos", "chunk_len", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"), col("chunk_len"),
        Hashing.hexHash(col("chunk")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  // ---- BPE trainer step (pair statistics + argmax merge choice) -------------

  val BpeTopPairs = 50

  /** One BPE trainer iteration's DECISION: adjacent character-pair
    * frequencies over the corpus and the deterministic argmax pair the
    * next merge would create (rank 1; ties break lexicographically — the
    * standard reproducible-trainer convention). The merge APPLICATION
    * (left-to-right non-overlapping rewrite) is deliberately out of scope:
    * its overlap semantics are engine-internal and un-oracle-able, while
    * the pair-statistics step — where all the data volume is — is exact.
    *
    * Scale shape (the real BPE-trainer trick): collapse the corpus to the
    * DISTINCT-WORD frequency table first (one corpus-sized shuffle), then
    * all character-pair work runs on the vocabulary — thousands of rows,
    * not billions; pair counts weight by word frequency. Real tokenizer
    * trainers (the published BPE algorithm) operate on exactly this
    * word-frequency dict; the per-word position explode is bounded by
    * word length, never document length. */
  def bpePairs(spark: SparkSession, d: String): DataFrame = {
    val counts = documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .where(length(col("w")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
    // global rank over the pair vocabulary: two-pass exact
    // ([[ScaleTools.globalRank]]) — at a byte-pair vocabulary of billions
    // the ranking still never single-threads
    ScaleTools.globalRank(counts, Seq(col("cnt").desc, col("pair")), "rank")
      .where(col("rank") <= BpeTopPairs)
      .orderBy("rank")
  }

  val bpePairsSql: String =
    s"""WITH words AS (
       |  SELECT w, count(*) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w
       |), pos AS (
       |  SELECT w, freq, unnest(range(1, length(w))) AS i
       |  FROM words WHERE length(w) >= 2
       |), pairs AS (
       |  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair,
       |         CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM pos GROUP BY 1
       |)
       |SELECT pair, cnt,
       |       CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank
       |FROM pairs
       |QUALIFY rank <= $BpeTopPairs
       |ORDER BY rank""".stripMargin

  /** The FIXED merge table for the bounded encode step — a trained
    * tokenizer's model artifact (3 ranked merges learned once, broadcast
    * everywhere; merge 2 consumes merge 1's output, so the chain is a real
    * priority-ordered BPE application, not 3 independent rewrites). */
  val BpeMerges: Seq[(String, String)] =
    Seq(("t a", "ta"), ("ta b", "tab"), ("a l", "al"))

  /** BPE ENCODE with a fixed merge table (the bounded-merge-count variant
    * the trainer's pair-statistics step pairs with): text collapses to its
    * letter stream, explodes to space-separated character tokens, then the
    * ranked merges apply in priority order as left-to-right non-overlapping
    * rewrites. On space-separated tokens, `replace(s, "a b", "ab")` IS the
    * published algorithm's apply step for one merge — both engines scan
    * left to right over non-overlapping occurrences, so the semantics are
    * identical and the whole encode is hash-checkable (the unbounded
    * repeat-until-fixpoint loop stays out of scope — un-oracle-able).
    * Map-only over documents: at 100 TB this is scan-speed tokenization,
    * the merge table rides along as 3 string literals. */
  def bpeApply(spark: SparkSession, d: String): DataFrame = {
    val base = substring(
      regexp_replace(lower(col("text")), "[^a-z]+", ""), 1, 80)
    val spaced = trim(regexp_replace(base, "(.)", "$1 "))
    val enc = BpeMerges.foldLeft(spaced) { case (c, (from, to)) =>
      org.apache.spark.sql.functions.replace(c, lit(from), lit(to))
    }
    documents(spark, d)
      .select(col("doc_id"), enc.as("enc"))
      .select(col("doc_id"),
        when(col("enc") === "", 0L)
          .otherwise(size(split(col("enc"), " ")).cast("long")).as("n_tokens"),
        substring(col("enc"), 1, 60).as("enc_prefix"))
      .orderBy("doc_id")
  }

  val bpeApplySql: String = {
    val enc = BpeMerges.foldLeft(
      """trim(regexp_replace(substr(regexp_replace(lower(text), '[^a-z]+', '', 'g'), 1, 80), '(.)', '\1 ', 'g'))""") {
      case (s, (from, to)) => s"replace($s, '$from', '$to')"
    }
    s"""SELECT doc_id,
       |       CASE WHEN enc = '' THEN 0
       |            ELSE CAST(len(string_split(enc, ' ')) AS BIGINT) END AS n_tokens,
       |       substr(enc, 1, 60) AS enc_prefix
       |FROM (SELECT doc_id, $enc AS enc FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- sentence-boundary chunking -------------------------------------------

  val SentWidth = 6
  val SentStride = 3
  private val SentSep = "\u0001"

  /** Sentence-boundary chunking: overlapping windows of WHOLE sentences —
    * the retrieval-prep variant that never cuts mid-sentence. Sentences
    * split on the `([.!?]) +` boundary, rewritten to a sentinel so each
    * sentence keeps its punctuation; the SAME [[graft.plans.ChunkTokensGen]]
    * generator then windows over sentence units through its delim
    * parameter (width 6 / stride 3 ≥ the 2·stride coverage bound, so
    * every sentence lands in a chunk). One split per document, all chunks
    * emitted at scan speed, map-only — no shuffle before the output sort.
    * Emits the chunk FINGERPRINT (engine-standard hash of the
    * sentinel-joined window), not the text: chunk identity without
    * shuffling strings. */
  def sentenceChunks(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    val sentinelized = regexp_replace(col("text"), "([.!?]) +", "$1" + SentSep)
    val gen = GraftSqlShim.column(graft.plans.ChunkTokensGen(
      GraftSqlShim.expression(sentinelized), SentWidth, SentStride, SentSep))
    documents(spark, d)
      .select(col("doc_id"),
        gen.as(Seq("chunk_idx", "start_sent", "n_sents", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("start_sent"), col("n_sents"),
        Hashing.hexHash(col("chunk")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** DuckDB twin of [[sentenceChunks]]: the same sentinel rewrite (RE2
    * capture-group replacement ≡ Java's), positional sentence windows via
    * generate_series over the generator's start grid, 1-based inclusive
    * list slicing, and the shared hash of the sentinel-joined window. */
  val sentenceChunksSql: String = {
    val fp = Hashing.hexHashSql(
      s"array_to_string(l[start:least(start + ${SentWidth - 1}, n)], chr(1))")
    s"""WITH lists AS (
       |  SELECT doc_id,
       |         string_split(regexp_replace(text, '([.!?]) +', '\\1' || chr(1), 'g'),
       |                      chr(1)) AS l
       |  FROM documents
       |), info AS (
       |  SELECT doc_id, l, len(l) AS n FROM lists
       |), starts AS (
       |  SELECT doc_id, l, n,
       |         unnest(generate_series(1, greatest(n - $SentStride, 1), $SentStride))
       |           AS start
       |  FROM info
       |)
       |SELECT doc_id,
       |       CAST((start - 1) // $SentStride AS BIGINT) AS chunk_idx,
       |       CAST(start AS BIGINT) AS start_sent,
       |       CAST(least(start + ${SentWidth - 1}, n) - start + 1 AS BIGINT)
       |         AS n_sents,
       |       $fp AS chunk_fp
       |FROM starts
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // ---- HTML stripping (crawl cleaning) --------------------------------------

  /** Boilerplate/tag removal — the first transform on any HTML crawl
    * before text quality scoring. The synthetic docs are plain text, so
    * the query deterministically wraps each doc in markup (same planting
    * discipline as [[piiScrub]]/[[urlParse]]) and the STRIP chain is the
    * operator under test: script blocks drop first (their CONTENT must go
    * too, including literal '<'), then tags, then whitespace collapse.
    * Map-only regex at scan speed; the oracle replays the plant and strips
    * with the same patterns under RE2. */
  def htmlStrip(spark: SparkSession, d: String): DataFrame = {
    val raw = concat(
      lit("<html><body><h1>Doc "), col("doc_id"), lit("</h1><p id=\"a\">"),
      substring(col("text"), 1, 80),
      lit("</p><script>var x = 1 < 2;</script></body></html>"))
    documents(spark, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(
        col("doc_id"),
        trim(regexp_replace(regexp_replace(regexp_replace(col("raw"),
          "<script[\\s\\S]*?</script>", ""), "<[^>]*>", " "), " +", " "))
          .as("clean"),
        size(regexp_extract_all(col("raw"), lit("<[^>]*>"), lit(0)))
          .cast("long").as("n_tags"))
      .orderBy("doc_id")
  }

  val htmlStripSql: String =
    """SELECT doc_id,
      |       trim(regexp_replace(regexp_replace(regexp_replace(raw,
      |         '<script[\s\S]*?</script>', '', 'g'), '<[^>]*>', ' ', 'g'),
      |         ' +', ' ', 'g')) AS clean,
      |       CAST(len(regexp_extract_all(raw, '<[^>]*>')) AS BIGINT) AS n_tags
      |FROM (
      |  SELECT doc_id,
      |         '<html><body><h1>Doc ' || doc_id || '</h1><p id="a">' ||
      |         substring(text, 1, 80) ||
      |         '</p><script>var x = 1 < 2;</script></body></html>' AS raw
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---- exact heavy hitters (Misra-Gries candidates + recount) ---------------

  /** Corpus-wide frequent tokens (count·K > total tokens), EXACT — via the
    * canonical two-pass sketch-then-verify pattern: each partition runs a
    * Misra-Gries summary with K counters over its token stream
    * (mapPartitions, O(K) memory, no shuffle), the union of per-partition
    * survivors is the candidate set, and a broadcast semi-join + exact
    * recount of candidates only produces the final answer.
    *
    * Why this is exact: MG with K counters keeps every item whose
    * partition-local frequency exceeds n_p/(K+1). If freq(x) > n/K
    * globally then freq_p(x) > n_p/K ≥ n_p/(K+1) in at least one
    * partition (else summing the per-partition bounds contradicts the
    * global one), so x is ALWAYS a candidate; the recount then filters
    * false positives with exact counts. The candidate set depends on the
    * partitioning, the OUTPUT does not.
    *
    * Scale: the token stream is never shuffled on token — the only wide
    * ops are the distinct over ≤ partitions·K candidate rows and the
    * recount groupBy over candidate-matching tokens (a vanishing fraction
    * of the corpus). At 100 TB the alternative (groupBy every token)
    * shuffles the entire tokenized corpus; this shuffles kilobytes.
    *
    * Honest probe note (Probe, sf0.1 local[32]): the naive groupBy WINS
    * locally (0.34 s vs 0.60 s) — a single-JVM "shuffle" is a memory
    * copy, so the avoided network transfer can't show up while the
    * sketch's second scan does. The pattern's payoff is cluster-network
    * economics (shuffle bytes: full corpus vs kilobytes), not local CPU;
    * that is the metric that matters at 1000 executors.
    */
  val HhK = 100

  def heavyHitters(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val tokens = documents(spark, d).select(explode(toks(col("text"))).as("token"))
    // ONE pass produces both the MG candidate keys and the partition's
    // token count (tagged rows) — folding the corpus-size count into the
    // sketch scan instead of paying a separate count() job. The summary is
    // tiny (≤ partitions·(K+1) rows): pin it, then derive n and the
    // candidate set without re-running the pass.
    val summary = tokens.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      it.foreach { t =>
        np += 1L
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < HhK) counters(t) = 1L
        else {
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.filterInPlace((_, v) => v > 0L)
        }
      }
      Iterator.single((true, "", np)) ++
        counters.keysIterator.map(k => (false, k, 0L))
    }.toDF("is_count", "token", "n").localCheckpoint()
    val n = summary.where(col("is_count")).agg(sum(col("n"))).head.getLong(0)
    val candidates = summary.where(!col("is_count")).select("token").distinct()
    tokens.join(broadcast(candidates), Seq("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * HhK > lit(n))
      .orderBy("token")
  }

  val heavyHittersSql: String =
    s"""WITH tokens AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |), tot AS (SELECT count(*) AS n FROM tokens)
      |SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |FROM tokens GROUP BY token
      |HAVING count(*) * $HhK > (SELECT n FROM tot)
      |ORDER BY token""".stripMargin

  // ---- DSIR importance weighting (data selection) ---------------------------

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by the log importance ratio log p_target(x)/p_raw(x) under
    * add-one-smoothed unigram bag models of a TARGET slice (lang='en'
    * here) vs the whole raw corpus, and keep the top-k — the standard way
    * a 100 TB web crawl is steered toward a target domain without
    * training a classifier.
    *
    * Numerics contract (the [[perplexity]] pattern): each token's
    * log-ratio ln(((n_t+1)·(N_r+V)) / ((n_r+1)·(N_t+V))) is ONE double
    * expression evaluated in the same order by both engines — integer
    * products are exact in doubles at these magnitudes — then floor-
    * quantized to a CENTI-NAT INTEGER per DISTINCT token before the
    * per-doc sum, so document scores are order-free exact integers.
    *
    * Plan shape: both unigram tables are vocab-bounded aggregates
    * BROADCAST onto the token stream; the only corpus-wide shuffle is the
    * per-doc score groupBy, and the top-k is TakeOrderedAndProject.
    * Docs with no tokens score 0 via the left join. */
  /** DSIR importance weights over HASHED token buckets (Xie et al.'s
    * scalable variant): tokens hash into a FIXED number of buckets and
    * the importance "LM" is the per-bucket target/raw count ratio — the
    * broadcast side is O(buckets), a compile-time constant, never
    * O(vocabulary). At 100 TB the vocabulary grows without bound (URLs,
    * ids, typos) but the LM stays exactly `DsirBuckets` longs, which is
    * the whole point of the paper's hashed n-gram features. Quantized
    * log-ratios keep the weights exact-integer (bit-reproducible against
    * the DuckDB oracle, which restates the same bucketing through the
    * shared cross-engine hash). */
  val DsirBuckets = 8192

  /** (doc_id, lang, hashed token bucket) rows — the LM's only input. */
  private[operators] def dsirTokens(spark: SparkSession, d: String,
      buckets: Int): DataFrame =
    documents(spark, d)
      .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("t"))
      .select(col("doc_id"), col("lang"),
        pmod(graft.functions.Hashing.hexHash(col("t")),
          lit(buckets.toLong)).as("b"))

  /** The broadcast importance LM alone, for the O(buckets) bound spec. */
  private[operators] def dsirLm(spark: SparkSession, d: String,
      buckets: Int): DataFrame =
    dsirTokens(spark, d, buckets).groupBy(col("b"))
      .agg(count(lit(1)).as("nr"))

  def dsirSelect(spark: SparkSession, d: String, k: Int = 20,
      buckets: Int = DsirBuckets): DataFrame = {
    val tokens = dsirTokens(spark, d, buckets)
      .localCheckpoint() // LM build (×2 aggregates) AND scoring read it
    val tgt = tokens.where(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("nt"))
    val raw = tokens.groupBy(col("b")).agg(count(lit(1)).as("nr"))
    val totals = tokens.agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_tgt"),
      count(lit(1)).as("n_raw"))
    // per-BUCKET quantized log-ratio: the O(buckets) broadcastable "LM"
    // (add-1 smoothing over the fixed bucket alphabet)
    val lm = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor(log(((coalesce(col("nt"), lit(0L)) + 1L).cast("double") *
            (col("n_raw") + lit(buckets.toLong))) /
          ((col("nr") + 1L).cast("double") *
            (col("n_tgt") + lit(buckets.toLong))))
          * 100).cast("long").as("lr_q"))
    val scored = tokens
      .join(broadcast(lm), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lr_q")).as("w_q"), count(lit(1)).as("n_toks"))
    documents(spark, d).select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("w_q"), lit(0L)).as("w_q"))
      .orderBy(col("w_q").desc, col("doc_id"))
      .limit(k)
  }

  val dsirSelectSql: String = {
    val h = graft.functions.Hashing.hexHashSql("t")
    s"""WITH tokens AS (
      |  SELECT doc_id, lang,
      |         ((($h) % $DsirBuckets) + $DsirBuckets) % $DsirBuckets AS b
      |  FROM (SELECT doc_id, lang,
      |               unnest(string_split(text, ' ')) AS t
      |        FROM documents)
      |), tgt AS (
      |  SELECT b, count(*) AS nt FROM tokens WHERE lang = 'en' GROUP BY b
      |), raw AS (
      |  SELECT b, count(*) AS nr FROM tokens GROUP BY b
      |), totals AS (
      |  SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_tgt,
      |         count(*) AS n_raw
      |  FROM tokens
      |), lm AS (
      |  SELECT r.b,
      |         CAST(floor(ln((CAST(COALESCE(g.nt, 0) + 1 AS DOUBLE)
      |                         * (totals.n_raw + $DsirBuckets))
      |                       / (CAST(r.nr + 1 AS DOUBLE)
      |                         * (totals.n_tgt + $DsirBuckets)))
      |                    * 100) AS BIGINT) AS lr_q
      |  FROM raw r LEFT JOIN tgt g ON r.b = g.b CROSS JOIN totals
      |), scored AS (
      |  SELECT tk.doc_id, CAST(sum(lm.lr_q) AS BIGINT) AS w_q,
      |         count(*) AS n_toks
      |  FROM tokens tk JOIN lm ON tk.b = lm.b
      |  GROUP BY tk.doc_id
      |)
      |SELECT d.doc_id, d.lang,
      |       COALESCE(s.n_toks, 0) AS n_toks,
      |       COALESCE(s.w_q, 0) AS w_q
      |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
      |ORDER BY w_q DESC, d.doc_id
      |LIMIT 20""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dsir" -> ((s, d) => dsirSelect(s, d)),
    "q_heavy_hitters"    -> ((s, d) => heavyHitters(s, d)),
    "q_html_strip"       -> ((s, d) => htmlStrip(s, d)),
    "q_chunk_gen"        -> ((s, d) => chunkDocsGen(s, d)),
    "q_gopher_filter"    -> ((s, d) => gopherFilter(s, d)),
    "q_filter_funnel"    -> ((s, d) => filterFunnel(s, d)),
    "q_quality_sweep"    -> ((s, d) => qualitySweep(s, d)),
    "q_sent_chunk"       -> ((s, d) => sentenceChunks(s, d)),
    "q_bpe_pairs"        -> ((s, d) => bpePairs(s, d)),
    "q_bpe_apply"        -> ((s, d) => bpeApply(s, d)),
    "q_data_pipeline"    -> ((s, d) => dataPipeline(s, d)),
    "q_url_parse"        -> ((s, d) => urlParse(s, d)),
    "q_perplexity"       -> ((s, d) => perplexity(s, d)),
    "q_repetition"       -> ((s, d) => repetitionSignal(s, d)),
    "q_chunk"            -> ((s, d) => chunkDocs(s, d)),
    "q_bigram_lm"        -> ((s, d) => bigramLm(s, d)),
    "q_vocab_coverage"   -> ((s, d) => vocabCoverage(s, d)),
    "q_pmi"              -> ((s, d) => pmiPairs(s, d)),
    "q_chi2"             -> ((s, d) => chi2Terms(s, d)),
    "q_tfidf_pairs"      -> ((s, d) => tfidfPairs(s, d)),
    "q_seq_pack"         -> ((s, d) => seqPack(s, d)),
    "q_entropy"          -> ((s, d) => entropySignal(s, d)),
    "q_bm25"             -> ((s, d) => bm25(s, d)),
    "q_pii_scrub"        -> ((s, d) => piiScrub(s, d)),
    "q_token_count"      -> ((s, d) => tokenCount(s, d)),
    "q_feature_hash"     -> ((s, d) => featureHash(s, d)),
    "q_text_quality"     -> ((s, d) => qualityScore(s, d)),
    "q_lang_id"          -> ((s, d) => langId(s, d)),
    "q_fingerprint"      -> ((s, d) => fingerprint(s, d)),
    "q_fast_fingerprint" -> ((s, d) => fastFingerprint(s, d)),
    "q_compress_signal"  -> ((s, d) => compressionSignal(s, d)),
    "q_top_terms"        -> ((s, d) => topTerms(s, d)),
    "q_curation"         -> ((s, d) => curationPipeline(s, d)),
    "q_curation_sets"    -> ((s, d) => curationSets(s, d)))

  /** Oracle for the rolling-fingerprint custom expression — the polynomial
    * rolling hash restated positionally: per window, nine chained
    * (h·B + byte) mod 2^64 steps in HUGEINT (128-bit) arithmetic, mapped
    * to the signed long domain BEFORE the min (Spark mins signed longs —
    * an unsigned min silently picks different windows). ord(char) ≡ byte
    * because the corpus is ASCII (probed: max code point 121). Short-doc
    * arms mirror the operator's min(k, n) window exactly even though the
    * corpus never exercises them. This retires the query's rows-only
    * status: the custom codegen expression is now DuckDB-checked
    * end-to-end, not just spec-checked. */
  val fastFingerprintSql: String = {
    val B = "1099511628211" // 0x100000001b3, the FNV prime base
    val M = "18446744073709551616::HUGEINT"
    val signedMin = "9223372036854775808::HUGEINT"
    val chain = (0 until 9).foldLeft("CAST(0 AS HUGEINT)") { (h, j) =>
      s"(($h) * $B + ord(substring(text, CAST(pos AS INTEGER) + $j, 1))) % $M"
    }
    val fold =
      s"""list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |  [CAST(ord(x) AS HUGEINT) for x in string_split(text, '')]),
         |  (a, b) -> (a * $B + b) % $M)""".stripMargin
    s"""WITH long_docs AS (
      |  SELECT doc_id, text, unnest(generate_series(1, length(text) - 8)) AS pos
      |  FROM documents WHERE length(text) >= 9
      |), win AS (
      |  SELECT doc_id, $chain AS hu FROM long_docs
      |), long_fp AS (
      |  SELECT doc_id,
      |         min(CASE WHEN hu >= $signedMin
      |                  THEN CAST(hu - $M AS BIGINT)
      |                  ELSE CAST(hu AS BIGINT) END) AS rolling_fp
      |  FROM win GROUP BY doc_id
      |), short_fp AS (
      |  SELECT doc_id,
      |         CASE WHEN length(text) = 0 THEN 0
      |              WHEN h >= $signedMin THEN CAST(h - $M AS BIGINT)
      |              ELSE CAST(h AS BIGINT) END AS rolling_fp
      |  FROM (SELECT doc_id, text, $fold AS h
      |        FROM documents WHERE length(text) < 9)
      |)
      |SELECT doc_id, rolling_fp FROM long_fp
      |UNION ALL
      |SELECT doc_id, rolling_fp FROM short_fp
      |ORDER BY doc_id""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q_dsir" -> dsirSelectSql,
    "q_fast_fingerprint" -> fastFingerprintSql,
    "q_compress_signal" -> compressionSignalSql,
    "q_heavy_hitters" -> heavyHittersSql,
    "q_html_strip"    -> htmlStripSql,
    "q_chunk_gen"     -> chunkDocsSql,
    "q_sent_chunk"    -> sentenceChunksSql,
    "q_bpe_pairs"     -> bpePairsSql,
    "q_bpe_apply"     -> bpeApplySql,
    "q_data_pipeline" -> dataPipelineSql,
    "q_filter_funnel" -> filterFunnelSql,
    "q_quality_sweep" -> qualitySweepSql,
    "q_url_parse"     -> urlParseSql,
    "q_perplexity"    -> perplexitySql,
    "q_repetition"    -> repetitionSignalSql,
    "q_chunk"         -> chunkDocsSql,
    "q_bigram_lm"     -> bigramLmSql,
    "q_vocab_coverage" -> vocabCoverageSql,
    "q_pmi"           -> pmiPairsSql,
    "q_chi2"          -> chi2TermsSql,
    "q_tfidf_pairs"   -> tfidfPairsSql,
    "q_seq_pack"      -> seqPackSql,
    "q_entropy"       -> entropySignalSql,
    "q_bm25"          -> bm25Sql,
    "q_pii_scrub"     -> piiScrubSql,
    "q_token_count"   -> tokenCountSql,
    "q_feature_hash"  -> featureHashSql,
    "q_gopher_filter" -> gopherFilterSql,
    "q_text_quality"  -> qualityScoreSql,
    "q_lang_id"       -> langIdSql,
    "q_fingerprint"   -> fingerprintSql,
    "q_top_terms"     -> topTermsSql,
    "q_curation"      -> curationPipelineSql,
    "q_curation_sets" -> curationSetsSql)
}
