package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Hashing

/** Similarity search over the embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Numeric discipline: embeddings are cast to double BEFORE any arithmetic
  * and dot products are sequential left-folds — the same operation order as
  * the DuckDB oracle's list_reduce, so cosine values match bit-for-bit with
  * no tolerance games.
  *
  * Scale design: brute-force top-k is a broadcast of ONE query vector +
  * a map-side partial top-k (TakeOrderedAndProject) — linear scan, no
  * shuffle of the corpus. The LSH variant buckets by sign-bit signature so
  * candidate generation touches only same-bucket vectors; at 100 TB you
  * re-partition by bucket once and reuse across queries.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays (order-stable). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** DuckDB spelling of the same left-fold dot product. */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |  s -> s[1] * s[2]), (x, y) -> x + y)""".stripMargin.replace("\n", " ")

  /** Executable spec of cosine similarity (interpreted HOFs — see
    * [[graft.plans.CosineSimExpr]] for why the hot paths use the codegen'd
    * expression instead; CosineSimSpec guards bit-parity between the two). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Codegen'd cosine — same three sequential folds, one primitive loop.
    * Requires [[graft.plans.CosineSim.register]] on the session (every
    * query path below does this). */
  def cosineFast(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  private def embDouble(spark: SparkSession, d: String): DataFrame =
    embeddings(spark, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))

  // ---- brute-force cosine top-k ---------------------------------------------

  /** Exact top-k nearest neighbors (cosine) of the query vector vec_id=0.
    * The one-row query side is broadcast; orderBy+limit plans as a
    * partial-top-k per partition — the linear-scan exact baseline. */
  def cosineTopK(spark: SparkSession, d: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    graft.plans.CosineSim.register(spark)
    val e = embDouble(spark, d)
    val q = e.where(col("vec_id") === queryId)
      .select(col("emb").as("q_emb"))
    e.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        cosineFast(col("emb"), col("q_emb")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  def cosineTopKSql(queryId: Long = 0L, k: Int = 10): String = {
    val cos = cosineSql("CAST(e.embedding AS DOUBLE[])", "CAST(q.embedding AS DOUBLE[])")
    s"""SELECT e.vec_id, e.label, $cos AS cos_sim
       |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = $queryId) q
       |WHERE e.vec_id <> $queryId
       |ORDER BY cos_sim DESC, e.vec_id LIMIT $k""".stripMargin
  }

  // ---- random-hyperplane LSH signature + bucketed near-dup -------------------

  val Planes = 16

  /** Max supported embedding dimension for the literal hyperplane table. */
  val MaxDim = 128

  /** Quantization scale: embeddings are floored to 1e-6 grid ints before the
    * plane projection, so every dot product is EXACT integer arithmetic —
    * order-independent, which is what legalizes the codegen'd explode+agg
    * formulation ([[lshBucketsDf]]): a float dot's sign near zero depends on
    * summation order, so a distributed sum could disagree with the oracle's
    * sequential fold. Bucketing quality is unaffected (1e-6 jitter on a
    * random hyperplane sign test). */
  val QuantScale = 1000000.0

  /** Dimension guard shared by every embedding path: raise on dim > MaxDim
    * (the literal plane/centroid tables end there) AND on dim == 0 — the
    * posexplode scale forms emit no rows for an empty array, so the vec_id
    * would silently vanish from the output while the HOF executable specs
    * would keep it (bucket 0). Raising keeps spec and scale form
    * contractually identical on all inputs. */
  private def dimChecked(emb: Column, who: String): Column =
    when(size(emb) > MaxDim || size(emb) === 0,
      raise_error(format_string(
        s"$who: embedding dim %s outside [1, $MaxDim]", size(emb))))
      .otherwise(emb)

  /** Deterministic pseudo-random hyperplane component w[p][j] ∈ [-500, 500),
    * derived from the cross-engine hash. Evaluated ONCE at plan-build time
    * (driver-side) and embedded as literals — the per-row-per-element md5
    * of the naive formulation was the entire cost of this operator
    * (16 planes × dim × rows md5 calls; measured 12 s → ~1 s at sf0.1).
    * The oracle recomputes the same values from the md5 formula in SQL. */
  def planeComponent(p: Int, j: Int): Long =
    Math.floorMod(Hashing.hexHashLocal(s"$p:$j"), 1000L) - 500L

  private def planeLit(p: Int): Column =
    array((0 until MaxDim).map(j => lit(planeComponent(p, j))): _*)

  private def planeComponentSql(p: String, j: String): String =
    s"${Hashing.hexHashSql(s"CAST($p AS VARCHAR) || ':' || CAST($j AS VARCHAR)")} % 1000 - 500"

  /** Sign-bit LSH signature as a single Column (higher-order functions):
    * bit p = 1 iff ⟨w_p, floor(x·1e6)⟩ > 0, packed into a long bucket id.
    * Correct but INTERPRETED — the executable spec; [[lshBucketsDf]] is the
    * scale form. Supports dim ≤ [[MaxDim]] — larger embeddings raise at run
    * time rather than silently landing every vector in bucket 0 (zip_with
    * would pad the sliced plane with nulls and null out the dot product). */
  def lshSignature(emb: Column): Column = {
    val xq = transform(emb, x => floor(x * lit(QuantScale)))
    val sig = (0 until Planes).map { p =>
      when(aggregate(
          zip_with(xq, slice(planeLit(p), lit(1), size(emb)),
            (x, w) => x * w),
          lit(0L), (acc, x) => acc + x) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    when(size(emb) > MaxDim || size(emb) === 0,
      raise_error(format_string(
        s"lshSignature: embedding dim %s outside [1, $MaxDim]", size(emb))))
      .otherwise(sig)
  }

  val lshSignatureSql: String = {
    val comp = planeComponentSql("p", "j - 1")
    s"""list_reduce(list_transform(generate_series(0, ${Planes - 1}),
       |  p -> CASE WHEN list_reduce(list_transform(
       |              generate_series(1, len(CAST(embedding AS DOUBLE[]))),
       |              j -> CAST(floor(CAST(embedding AS DOUBLE[])[j] * $QuantScale) AS BIGINT)
       |                     * ($comp)),
       |            (x, y) -> x + y) > 0
       |       THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END),
       |  (x, y) -> x + y)""".stripMargin.replace("\n", " ")
  }

  /** LSH buckets via posexplode + codegen'd hash aggregation — the scale
    * form (HOFs don't codegen). One shuffle of (vec_id, pos, xq) int rows;
    * the 16 plane dots run as primitive-long sums in a whole-stage-codegen
    * HashAggregate with plane weights fetched from constant-folded literal
    * arrays. Exact integer dots ⇒ identical to [[lshSignature]] and to the
    * oracle regardless of partitioning. Input `e`: (vec_id, emb). */
  def lshBucketsDf(e: DataFrame): DataFrame = {
    val checked = e.select(col("vec_id"),
      dimChecked(col("emb"), "lshBuckets").as("emb"))
    val rows = checked
      .select(col("vec_id"), posexplode(col("emb")))
      .select(col("vec_id"), col("pos"),
        floor(col("col") * lit(QuantScale)).as("xq"))
    val aggs = (0 until Planes).map(p =>
      sum(col("xq") * element_at(planeLit(p), col("pos") + 1)).as(s"d$p"))
    val packed = (0 until Planes).map(p =>
      when(col(s"d$p") > 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)
    rows.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"), packed.as("bucket"))
  }

  /** Per-vector LSH bucket assignment (the signature itself, oracle-checked). */
  def lshBuckets(spark: SparkSession, d: String): DataFrame =
    lshBucketsDf(embDouble(spark, d).select(col("vec_id"), col("emb")))

  val lshBucketsSql: String =
    s"SELECT vec_id, $lshSignatureSql AS bucket FROM embeddings"

  /** ANN near-dup pairs: vectors sharing an LSH bucket, verified by exact
    * cosine ≥ threshold. Injected duplicate vectors (vec_id+1000000 for
    * vec_id < 10) guarantee verifiable hits on the random corpus. Candidate
    * generation is the bucket self-join — never the full cross product; the
    * interpreted-HOF cosine runs on candidates only. */
  /** Corpus with injected duplicates (vec_id+1000000 for vec_id < 10) —
    * shared by the ANN-pair and embedding-dedup queries. */
  private def injectedCorpus(spark: SparkSession, d: String): DataFrame = {
    val base = embDouble(spark, d).select(col("vec_id"), col("emb"))
    base.union(
      base.where(col("vec_id") < 10)
        .select((col("vec_id") + lit(1000000)).as("vec_id"), col("emb")))
  }

  /** Unordered near-dup pairs (vec_a < vec_b, cosine ≥ threshold) over a
    * (vec_id, emb) corpus — the shared core of [[annPairs]] and
    * [[dedupEmbed]]. */
  private def annPairsRaw(e: DataFrame, threshold: Double): DataFrame = {
    graft.plans.CosineSim.register(e.sparkSession)
    // buckets from the codegen path, embeddings re-attached by key;
    // materialized once for the self-join fan-out (see Dedup.minhashPairs:
    // exchange reuse does not fire across self-join branches)
    val sig = lshBucketsDf(e).join(e, Seq("vec_id")).localCheckpoint()
    sig.as("x").join(sig.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        cosineFast(col("x.emb"), col("y.emb")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  def annPairs(spark: SparkSession, d: String, threshold: Double = 0.99): DataFrame =
    annPairsRaw(injectedCorpus(spark, d), threshold).orderBy("vec_a", "vec_b")

  def annPairsSql(threshold: Double = 0.99): String = {
    val cos = cosineSql("x.emb", "y.emb")
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]), embedding
       |  FROM embeddings WHERE vec_id < 10
       |), sig AS (
       |  SELECT vec_id, emb, $lshSignatureSql AS bucket FROM base
       |)
       |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, $cos AS cos_sim
       |FROM sig x JOIN sig y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE $cos >= $threshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Embedding-cosine near-dup DEDUP: the survivor set after removing
    * near-duplicates (cosine ≥ threshold) from the injected-dup corpus.
    * Survivor policy is greedy-by-id — drop y whenever some x < y is a
    * near-dup of y — the standard LSH-dedup policy (one pass, no iterative
    * connected components; a transitive chain keeps only its minimum id if
    * every link shares a bucket). Scale shape: LSH candidate pairs (never
    * the cross product) → exact cosine verify → anti-join of the
    * dropped-id set against the corpus. No broadcast hint on the dropped
    * set: on a high-dup corpus it is O(corpus), so forcing a broadcast is
    * exactly wrong at scale — size statistics (AQE) pick broadcast when
    * the set really is small, shuffle when it is not. */
  def dedupEmbed(spark: SparkSession, d: String, threshold: Double = 0.99): DataFrame = {
    val corpus = injectedCorpus(spark, d)
    val dropped = annPairsRaw(corpus, threshold)
      .select(col("vec_b").as("vec_id")).distinct()
    corpus.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"))
      .orderBy("vec_id")
  }

  def dedupEmbedSql(threshold: Double = 0.99): String = {
    val cos = cosineSql("x.emb", "y.emb")
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]), embedding
       |  FROM embeddings WHERE vec_id < 10
       |), sig AS (
       |  SELECT vec_id, emb, $lshSignatureSql AS bucket FROM base
       |), dropped AS (
       |  SELECT DISTINCT y.vec_id
       |  FROM sig x JOIN sig y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |  WHERE $cos >= $threshold
       |)
       |SELECT vec_id FROM base
       |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY vec_id""".stripMargin
  }

  // ---- SemDeDup (cluster-then-dedup) ----------------------------------------

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embeddings, then search for near-duplicate pairs ONLY inside each
    * cluster and drop the higher-id member — the clustering exists to
    * bound the pair search at O(Σ n_c²) instead of O(n²), which is what
    * makes embedding dedup feasible on a web-scale corpus (the paper
    * runs K ∝ n so cells stay constant-sized; here K = [[KmK]]).
    *
    * Beside [[dedupEmbed]] (LSH-bucketed candidates) this is the OTHER
    * standard blocking scheme: LSH bounds by hash agreement, SemDeDup by
    * cluster membership — exact duplicates always share a cluster (same
    * vector ⇒ same distances ⇒ same argmin cell), so injected dups are
    * provably caught. One-pass assignment to the hash-derived seed
    * centroids in exact integer arithmetic ([[kmeansAssign]]'s seed
    * formula — the clustering is a blocking device, determinism matters
    * and Lloyd fidelity does not); pair verification is the codegen'd
    * exact cosine, bit-identical in both engines. */
  /** Vectors per k-means cell SemDeDup aims for: the number of cells is
    * K = max(KmK, ceil(n / TargetCellSize)), so the within-cell pair join
    * stays O(Σ cell²) ≈ O(n · TargetCellSize) — LINEAR in the corpus —
    * instead of exploding quadratically under a compile-time-constant K
    * (the paper's own regime: K grows with the corpus). */
  val SemDedupCellSize = 512L

  def semDedupCells(n: Long): Long =
    math.max(KmK.toLong, (n + SemDedupCellSize - 1) / SemDedupCellSize)

  /** Hash-seeded single-pass cell assignment (the Lloyd-0 blocking step):
    * (vec_id, cell) for K cells. */
  private[operators] def semDedupAssign(spark: SparkSession,
      corpus: DataFrame, k: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = corpus
      .select(col("vec_id"), posexplode(dimChecked(col("emb"), "semdedup")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        floor(col("col") * lit(QuantScale)).cast("long").as("xq"))
    val seeds = rows.select(col("pos")).distinct()
      .crossJoin(spark.range(k).select(col("id").as("cell")))
      .select(col("cell"), col("pos"),
        (Hashing.hexHash(concat(lit("km"), col("cell").cast("string"),
          lit(":"), col("pos").cast("string"))) % 1000001L - 500000L).as("cq"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cell"))
    rows.join(broadcast(seeds), Seq("pos"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("dist"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cell"))
  }

  def semDedup(spark: SparkSession, d: String, threshold: Double = 0.99): DataFrame = {
    graft.plans.CosineSim.register(spark)
    val corpus = injectedCorpus(spark, d)
    // K scales with the corpus (one metadata-cheap count) — cells stay
    // bounded near SemDedupCellSize as the corpus grows
    val k = semDedupCells(corpus.count())
    val assigned = semDedupAssign(spark, corpus, k)
    // pinned: the self-join fan-out reads it twice (exchange reuse does
    // not fire across self-join branches) plus the rollup
    val withCell = corpus.join(assigned, Seq("vec_id")).localCheckpoint()
    val dropped = withCell.as("x").join(withCell.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .where(cosineFast(col("x.emb"), col("y.emb")) >= threshold)
      .select(col("y.vec_id").as("vec_id"), col("y.cell").as("cell"))
      .distinct()
    withCell.groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
      .join(dropped.groupBy(col("cell")).agg(count(lit(1)).as("n_dropped")),
        Seq("cell"), "left")
      .select(col("cell"), col("n_vecs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
      .orderBy("cell")
  }

  def semDedupSql(threshold: Double = 0.99): String = {
    val seedCq = s"(${Hashing.hexHashSql("'km' || CAST(cell AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")} % 1000001) - 500000"
    val cos = cosineSql("x.emb", "y.emb")
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[])
       |  FROM embeddings WHERE vec_id < 10
       |), rws AS (
       |  SELECT vec_id, CAST(s[2] AS BIGINT) - 1 AS pos,
       |         CAST(floor(CAST(s[1] AS DOUBLE) * $QuantScale) AS BIGINT) AS xq
       |  FROM (SELECT vec_id, unnest(list_zip(emb,
       |          generate_series(1, len(emb)))) AS s
       |        FROM base) t
       |), cells AS (
       |  SELECT unnest(generate_series(0, (SELECT greatest(CAST($KmK AS BIGINT),
       |           CAST(ceil(count(*) / $SemDedupCellSize.0) AS BIGINT)) - 1
       |         FROM base))) AS cell
       |), seeds AS (
       |  SELECT cell, pos, $seedCq AS cq
       |  FROM (SELECT DISTINCT pos FROM rws), cells
       |), assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM (SELECT r.vec_id, c.cell,
       |                 CAST(sum((r.xq - c.cq) * (r.xq - c.cq)) AS BIGINT) AS dist
       |          FROM rws r JOIN seeds c ON r.pos = c.pos
       |          GROUP BY 1, 2)
       |  ) WHERE rn = 1
       |), wc AS (
       |  SELECT b.vec_id, b.emb, a.cell FROM base b JOIN assigned a USING (vec_id)
       |), dropped AS (
       |  SELECT DISTINCT y.vec_id, y.cell
       |  FROM wc x JOIN wc y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE $cos >= $threshold
       |), nv AS (
       |  SELECT cell, count(*) AS n_vecs FROM wc GROUP BY cell
       |), nd AS (
       |  SELECT cell, count(*) AS n_dropped FROM dropped GROUP BY cell
       |)
       |SELECT nv.cell, nv.n_vecs,
       |       CAST(COALESCE(nd.n_dropped, 0) AS BIGINT) AS n_dropped
       |FROM nv LEFT JOIN nd USING (cell)
       |ORDER BY cell""".stripMargin
  }

  // ---- multi-probe IVF -------------------------------------------------------

  /** IVF with nprobe > 1 — the recall dial: rank ALL cells by the query's
    * exact-int distance, search the nearest `nprobe` (not just the argmin
    * cell), exact-cosine top-k over their union. Costs nprobe/[[IvfCells]]
    * of the corpus instead of 1/[[IvfCells]]; recovers neighbors that fell
    * just across a Voronoi boundary. The probe-cell set is a broadcast
    * 3-row side; ties rank toward the lower cell id on both engines. */
  def ivfTopKProbe(spark: SparkSession, d: String, queryId: Long = 0L,
      k: Int = 10, nprobe: Int = 3): DataFrame = {
    graft.plans.CosineSim.register(spark)
    val e = embDouble(spark, d)
    // pinned because THREE consumers read it: the cell scan, the query-row
    // probe ranking, and the query-embedding broadcast — a lazy plan would
    // re-run the assignment aggregation for each
    val withCell = e.join(ivfAssignDf(e.select(col("vec_id"), col("emb"))), Seq("vec_id"))
      .localCheckpoint()
    val probeCells = ivfDistAgg(
        withCell.where(col("vec_id") === queryId).select(col("vec_id"), col("emb")))
      .select(explode(array((0 until IvfCells).map(kk =>
        struct(col(s"d$kk").as("dist"), lit(kk).as("cell"))): _*)).as("c"))
      .select(col("c.dist"), col("c.cell"))
      .orderBy(col("dist"), col("cell"))
      .limit(nprobe)
      .select(col("cell").as("q_cell"))
    val q = withCell.where(col("vec_id") === queryId).select(col("emb").as("q_emb"))
    withCell
      .join(broadcast(probeCells), col("cell") === col("q_cell"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        cosineFast(col("emb"), col("q_emb")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  def ivfTopKProbeSql(queryId: Long = 0L, k: Int = 10, nprobe: Int = 3): String = {
    val cos = cosineSql("CAST(c.embedding AS DOUBLE[])", "CAST(q.embedding AS DOUBLE[])")
    val distArms = (0 until IvfCells).map(kk =>
      s"SELECT $kk AS cell, ${ivfDistSql(kk, "embedding")} AS dist FROM qrow")
      .mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH cells AS (
       |  SELECT vec_id, label, embedding, cell
       |  FROM ${ivfCellsFromSql(", label, embedding")}
       |), qrow AS (SELECT embedding FROM embeddings WHERE vec_id = $queryId),
       |probe AS (
       |  SELECT cell FROM (
       |  $distArms
       |  ) ORDER BY dist, cell LIMIT $nprobe
       |), q AS (SELECT embedding FROM qrow)
       |SELECT c.vec_id, c.label, $cos AS cos_sim
       |FROM cells c JOIN probe p ON c.cell = p.cell, q
       |WHERE c.vec_id <> $queryId
       |ORDER BY cos_sim DESC, c.vec_id LIMIT $k""".stripMargin
  }

  /** Planted-neighbor id offset for [[ivfRecallEval]]:
    * 10000000 % 97 = 76, so a planted row can never join the query
    * panel (vec_id % 97 = 0); [[requirePlantOffsetClear]] asserts no
    * REAL vec_id reaches the offset (a collision would silently skew
    * recall), and the panel/planted filters carry an explicit
    * `vec_id < PlantOffset` guard mirroring the SQL oracle's. */
  private val PlantOffset = 10000000L

  /** Fail LOUDLY when the corpus id space reaches [[PlantOffset]]:
    * planted ids would collide with real rows and the two engines'
    * query panels would silently diverge. One min/max-stats-sized
    * aggregate over the id column — eval-path cost only. */
  private def requirePlantOffsetClear(e: DataFrame): Unit = {
    val row = e.agg(max(col("vec_id"))).head
    // empty corpus: max is NULL and nothing can collide — fall through
    // to the (empty) eval instead of an opaque NPE
    if (row.isNullAt(0)) return
    val maxId = row.getLong(0)
    require(maxId < PlantOffset,
      s"ivf eval: corpus max vec_id $maxId >= planted-id offset " +
        s"$PlantOffset — raise PlantOffset (planted ids must not " +
        "collide with real rows)")
  }

  /** ANN RECALL EVALUATION — the IVF twin of the text side's
    * q_dedup_eval, in the 100-TB-legal form BOTH sides of that eval
    * now share (round-18 verdict #6): the ground truth is computed on
    * a BOUNDED corpus — a deterministic hash-bucket slice (25%) plus
    * PLANTED near-neighbors (each query vector re-scaled and shifted,
    * `x*0.9 + 0.01`: high-cosine but not identical) — never the full
    * corpus, so the brute-force side stays sample-sized no matter how
    * big the table is. For a deterministic panel of query vectors
    * (vec_id % 97 = 0), compare multi-probe IVF top-k against
    * brute-force exact-cosine top-k and report overlap as an integer
    * recall in ppm, plus how many planted neighbors the IVF ranking
    * recovered. The panel is bounded and broadcast, the sliced corpus
    * is scored ONCE (both rankings read the same scored frame), and
    * ties break identically on (cos desc, vec_id) in both engines —
    * so the report is bit-deterministic. At 100 TB this is how nprobe
    * gets chosen: run the eval on a sample, pick the smallest nprobe
    * above the recall target, serve the full corpus with it. */
  def ivfRecallEval(spark: SparkSession, d: String, k: Int = 10,
      nprobe: Int = 3): DataFrame = {
    graft.plans.CosineSim.register(spark)
    val w = org.apache.spark.sql.expressions.Window
    val e = embDouble(spark, d).select(col("vec_id"), col("emb"))
    requirePlantOffsetClear(e)
    // bounded corpus: deterministic hash slice ∪ the query panel …
    val slice = e.where(
      pmod(graft.functions.Hashing.hexHash(col("vec_id").cast("string")),
        lit(100L)) < 25L ||
        (pmod(col("vec_id"), lit(97L)) === 0L &&
          col("vec_id") < lit(PlantOffset)))
    // … ∪ one planted near-neighbor per query (deterministic transform:
    // same IEEE double ops on both engines)
    val planted = e.where(pmod(col("vec_id"), lit(97L)) === 0L &&
        col("vec_id") < lit(PlantOffset))
      .select((col("vec_id") + lit(PlantOffset)).as("vec_id"),
        transform(col("emb"), x => x * lit(0.9) + lit(0.01)).as("emb"))
    // pin the bounded corpus once: it fans out into the cell-assignment
    // aggregate AND the join's probe side (exchange reuse does not fire
    // across fan-out branches — the slice scan + planted transform would
    // otherwise run twice)
    val corpus = slice.unionAll(planted).localCheckpoint()
    val withCell = corpus.join(ivfAssignDf(corpus), Seq("vec_id"))
      .localCheckpoint()
    val queries = withCell.where(pmod(col("vec_id"), lit(97L)) === 0L &&
        col("vec_id") < lit(PlantOffset))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      .localCheckpoint()
    val probe = ivfDistAgg(queries.select(
        col("q_id").as("vec_id"), col("q_emb").as("emb")))
      .select(col("vec_id").as("q_id"),
        explode(array((0 until IvfCells).map(kk =>
          struct(col(s"d$kk").as("dist"), lit(kk).as("cell"))): _*)).as("c"))
      .select(col("q_id"), col("c.dist"), col("c.cell"))
      .withColumn("pr", row_number().over(
        w.partitionBy("q_id").orderBy(col("dist"), col("cell"))))
      .where(col("pr") <= nprobe).select(col("q_id"), col("cell"))
    val scored = withCell.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("cell"),
        cosineFast(col("emb"), col("q_emb")).as("cs"))
      .localCheckpoint() // ONE scoring pass feeds both rankings
    def topk(df: DataFrame): DataFrame =
      df.withColumn("rk", row_number().over(
          w.partitionBy("q_id").orderBy(col("cs").desc, col("vec_id"))))
        .where(col("rk") <= k).select(col("q_id"), col("vec_id"))
    val brute = topk(scored).localCheckpoint()
    val ivf = topk(scored.join(broadcast(probe), Seq("q_id", "cell")))
      .localCheckpoint()
    val hit = brute.join(ivf, Seq("q_id", "vec_id"), "left_semi")
    // planted-neighbor recovery: did IVF's top-k surface the known
    // near-duplicate planted for this query?
    val plantedHit = ivf.where(col("vec_id") === col("q_id") + lit(PlantOffset))
    queries.agg(count(lit(1)).as("n_queries"))
      .crossJoin(brute.agg(count(lit(1)).as("n_true")))
      .crossJoin(ivf.agg(count(lit(1)).as("n_ivf")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .crossJoin(plantedHit.agg(count(lit(1)).as("n_planted_found")))
      .select(col("n_queries"), col("n_true"), col("n_ivf"), col("n_hit"),
        expr("(n_hit * 1000000) div n_true").as("recall_ppm"),
        col("n_planted_found"))
  }

  def ivfRecallEvalSql(k: Int = 10, nprobe: Int = 3): String = {
    val cos = cosineSql("c.de", "q.q_emb")
    val distArms = (0 until IvfCells).map(kk =>
      s"SELECT vec_id AS q_id, $kk AS cell, " +
        s"${ivfDistSql(kk, "de")} AS dist FROM qrows")
      .mkString("\n       |    UNION ALL\n       |    ")
    val dists = (0 until IvfCells)
      .map(kk => s"${ivfDistSql(kk, "de")} AS d$kk")
      .mkString(",\n       |         ")
    val least =
      s"least(${(0 until IvfCells).map(kk => s"d$kk").mkString(", ")})"
    val cases = (0 until IvfCells)
      .map(kk => s"WHEN d$kk = m THEN $kk").mkString(" ")
    s"""WITH qsrc AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de
       |  FROM embeddings WHERE vec_id % 97 = 0 AND vec_id < $PlantOffset
       |), corpus AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings
       |  WHERE (${Hashing.hexHashSql("CAST(vec_id AS VARCHAR)")} % 100) < 25
       |     OR (vec_id % 97 = 0 AND vec_id < $PlantOffset)
       |  UNION ALL
       |  SELECT vec_id + $PlantOffset,
       |         list_transform(de, x -> x * 0.9 + 0.01) FROM qsrc
       |), cells AS (
       |  SELECT vec_id, de, CAST(CASE $cases END AS INT) AS cell
       |  FROM (SELECT vec_id, de, $least AS m,
       |        ${(0 until IvfCells).map(kk => s"d$kk").mkString(", ")}
       |        FROM (SELECT vec_id, de,
       |        $dists
       |        FROM corpus))
       |), qrows AS (
       |  SELECT vec_id, de FROM corpus
       |  WHERE vec_id % 97 = 0 AND vec_id < $PlantOffset
       |), q AS (
       |  SELECT vec_id AS q_id, de AS q_emb FROM qrows
       |), probe AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q_id, cell,
       |      row_number() OVER (PARTITION BY q_id ORDER BY dist, cell) AS pr
       |    FROM (
       |    $distArms
       |    )) WHERE pr <= $nprobe
       |), scored AS (
       |  SELECT q.q_id, c.vec_id, c.cell, $cos AS cs
       |  FROM cells c, q WHERE c.vec_id <> q.q_id
       |), brute AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY cs DESC, vec_id) AS rk
       |    FROM scored) WHERE rk <= $k
       |), ivf AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT s.q_id, s.vec_id,
       |      row_number() OVER (PARTITION BY s.q_id
       |        ORDER BY s.cs DESC, s.vec_id) AS rk
       |    FROM scored s JOIN probe p
       |      ON s.q_id = p.q_id AND s.cell = p.cell) WHERE rk <= $k
       |), hit AS (
       |  SELECT q_id, vec_id FROM brute
       |  INTERSECT SELECT q_id, vec_id FROM ivf
       |), planted AS (
       |  SELECT q_id, vec_id FROM ivf WHERE vec_id = q_id + $PlantOffset
       |)
       |SELECT (SELECT count(*) FROM q) AS n_queries,
       |       (SELECT count(*) FROM brute) AS n_true,
       |       (SELECT count(*) FROM ivf) AS n_ivf,
       |       (SELECT count(*) FROM hit) AS n_hit,
       |       ((SELECT count(*) FROM hit) * 1000000)
       |         // (SELECT count(*) FROM brute) AS recall_ppm,
       |       (SELECT count(*) FROM planted) AS n_planted_found""".stripMargin
  }

  /** NPROBE PARAMETER SWEEP — the IVF twin of the text side's banding
    * sweep (q_lsh_sweep): from ONE scoring pass over the same bounded
    * corpus as [[ivfRecallEval]], rank IVF top-k at EVERY nprobe
    * 1..[[IvfCells]] and report per setting the retrieved count, the
    * overlap with brute-force truth (recall in ppm) and the planted-
    * neighbor recovery. More probes = more cells scanned (serving
    * cost) for more recall; the operator picks the smallest nprobe
    * above the target from this curve and serves the full corpus with
    * it. The scored frame and the brute ranking are computed once and
    * pinned; each nprobe is just a filtered re-rank. */
  def ivfNprobeSweep(spark: SparkSession, d: String, k: Int = 10): DataFrame = {
    graft.plans.CosineSim.register(spark)
    val w = org.apache.spark.sql.expressions.Window
    val e = embDouble(spark, d).select(col("vec_id"), col("emb"))
    requirePlantOffsetClear(e)
    val slice = e.where(
      pmod(graft.functions.Hashing.hexHash(col("vec_id").cast("string")),
        lit(100L)) < 25L ||
        (pmod(col("vec_id"), lit(97L)) === 0L &&
          col("vec_id") < lit(PlantOffset)))
    val planted = e.where(pmod(col("vec_id"), lit(97L)) === 0L &&
        col("vec_id") < lit(PlantOffset))
      .select((col("vec_id") + lit(PlantOffset)).as("vec_id"),
        transform(col("emb"), x => x * lit(0.9) + lit(0.01)).as("emb"))
    val corpus = slice.unionAll(planted).localCheckpoint()
    val withCell = corpus.join(ivfAssignDf(corpus), Seq("vec_id"))
      .localCheckpoint()
    val queries = withCell.where(pmod(col("vec_id"), lit(97L)) === 0L &&
        col("vec_id") < lit(PlantOffset))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      .localCheckpoint()
    // ranked probe cells, UNfiltered — every nprobe slices this frame
    val probeRanked = ivfDistAgg(queries.select(
        col("q_id").as("vec_id"), col("q_emb").as("emb")))
      .select(col("vec_id").as("q_id"),
        explode(array((0 until IvfCells).map(kk =>
          struct(col(s"d$kk").as("dist"), lit(kk).as("cell"))): _*)).as("c"))
      .select(col("q_id"), col("c.dist"), col("c.cell"))
      .withColumn("pr", row_number().over(
        w.partitionBy("q_id").orderBy(col("dist"), col("cell"))))
      .select(col("q_id"), col("cell"), col("pr"))
      .localCheckpoint()
    val scored = withCell.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("cell"),
        cosineFast(col("emb"), col("q_emb")).as("cs"))
      .localCheckpoint()
    def topk(df: DataFrame): DataFrame =
      df.withColumn("rk", row_number().over(
          w.partitionBy("q_id").orderBy(col("cs").desc, col("vec_id"))))
        .where(col("rk") <= k).select(col("q_id"), col("vec_id"))
    val brute = topk(scored).localCheckpoint()
    // r21 (guide §2.4 — one exchange instead of eight): the old shape ran
    // a PER-NPROBE loop — 8 × (probe-cell join → top-k window, the window
    // re-run for each of the arm's THREE consumers → ~24 window jobs +
    // 24 single-row aggs). The arms are NESTED (np=1 ⊂ np=2 ⊂ …), so each
    // candidate row belongs to every arm np ≥ pr(its cell): explode that
    // range once, rank ONE window partitioned by (np, q_id), and fold all
    // three per-arm counts (candidates, brute-truth hits, planted hits)
    // into ONE aggregation via a LEFT-join marker. Total rows through the
    // window are IDENTICAL to the sum of the eight per-arm subsets; the
    // output is row-identical (same tie-breaks, same counts — the DuckDB
    // oracle still restates the per-arm form).
    val scoredPr = scored.join(broadcast(probeRanked), Seq("q_id", "cell"))
    val ivfAll = scoredPr
      .select(col("q_id"), col("vec_id"), col("cs"),
        explode(sequence(col("pr"), lit(IvfCells))).as("nprobe"))
      .withColumn("rk", row_number().over(
        w.partitionBy(col("nprobe"), col("q_id"))
          .orderBy(col("cs").desc, col("vec_id"))))
      .where(col("rk") <= k)
      .select(col("nprobe").cast("long").as("nprobe"), col("q_id"), col("vec_id"))
    val counts = ivfAll
      .join(brute.withColumn("__hit", lit(1)), Seq("q_id", "vec_id"), "left")
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_ivf"), count(col("__hit")).as("n_hit"),
        sum(when(col("vec_id") === col("q_id") + lit(PlantOffset), 1L)
          .otherwise(0L)).as("n_planted_found"))
    // left join from the literal arm list so an empty arm still emits its
    // zero-count row (the old agg-without-groupBy did)
    import spark.implicits._
    val arms = (1 to IvfCells).map(_.toLong).toDF("np")
    arms.join(counts, col("np") === col("nprobe"), "left")
      .crossJoin(brute.agg(count(lit(1)).as("n_true")))
      .select(col("np").as("nprobe"), col("n_true"),
        coalesce(col("n_ivf"), lit(0L)).as("n_ivf"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("n_planted_found"), lit(0L)).as("n_planted_found"))
      .select(col("nprobe"), col("n_true"), col("n_ivf"), col("n_hit"),
        expr("(n_hit * 1000000) div n_true").as("recall_ppm"),
        col("n_planted_found"))
      .orderBy(col("nprobe"))
  }

  def ivfNprobeSweepSql(k: Int = 10): String = {
    val cos = cosineSql("c.de", "q.q_emb")
    val distArms = (0 until IvfCells).map(kk =>
      s"SELECT vec_id AS q_id, $kk AS cell, " +
        s"${ivfDistSql(kk, "de")} AS dist FROM qrows")
      .mkString("\n       |    UNION ALL\n       |    ")
    val dists = (0 until IvfCells)
      .map(kk => s"${ivfDistSql(kk, "de")} AS d$kk")
      .mkString(",\n       |         ")
    val least =
      s"least(${(0 until IvfCells).map(kk => s"d$kk").mkString(", ")})"
    val cases = (0 until IvfCells)
      .map(kk => s"WHEN d$kk = m THEN $kk").mkString(" ")
    val probeArms = (1 to IvfCells).map { np =>
      s"""SELECT CAST($np AS BIGINT) AS nprobe,
         |       (SELECT count(*) FROM ivf_$np) AS n_ivf,
         |       (SELECT count(*) FROM (
         |          SELECT q_id, vec_id FROM brute
         |          INTERSECT SELECT q_id, vec_id FROM ivf_$np)) AS n_hit,
         |       (SELECT count(*) FROM ivf_$np
         |        WHERE vec_id = q_id + $PlantOffset) AS n_planted_found"""
        .stripMargin
    }.mkString("\n|UNION ALL\n|".stripMargin)
    val ivfCtes = (1 to IvfCells).map { np =>
      s"""ivf_$np AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT s.q_id, s.vec_id,
         |      row_number() OVER (PARTITION BY s.q_id
         |        ORDER BY s.cs DESC, s.vec_id) AS rk
         |    FROM scored s JOIN probe p
         |      ON s.q_id = p.q_id AND s.cell = p.cell AND p.pr <= $np)
         |  WHERE rk <= $k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH qsrc AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de
       |  FROM embeddings WHERE vec_id % 97 = 0 AND vec_id < $PlantOffset
       |), corpus AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings
       |  WHERE (${Hashing.hexHashSql("CAST(vec_id AS VARCHAR)")} % 100) < 25
       |     OR (vec_id % 97 = 0 AND vec_id < $PlantOffset)
       |  UNION ALL
       |  SELECT vec_id + $PlantOffset,
       |         list_transform(de, x -> x * 0.9 + 0.01) FROM qsrc
       |), cells AS (
       |  SELECT vec_id, de, CAST(CASE $cases END AS INT) AS cell
       |  FROM (SELECT vec_id, de, $least AS m,
       |        ${(0 until IvfCells).map(kk => s"d$kk").mkString(", ")}
       |        FROM (SELECT vec_id, de,
       |        $dists
       |        FROM corpus))
       |), qrows AS (
       |  SELECT vec_id, de FROM corpus
       |  WHERE vec_id % 97 = 0 AND vec_id < $PlantOffset
       |), q AS (
       |  SELECT vec_id AS q_id, de AS q_emb FROM qrows
       |), probe AS (
       |  SELECT q_id, cell,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dist, cell) AS pr
       |  FROM (
       |    $distArms
       |  )
       |), scored AS (
       |  SELECT q.q_id, c.vec_id, c.cell, $cos AS cs
       |  FROM cells c, q WHERE c.vec_id <> q.q_id
       |), brute AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY cs DESC, vec_id) AS rk
       |    FROM scored) WHERE rk <= $k
       |), $ivfCtes
       |SELECT nprobe, (SELECT count(*) FROM brute) AS n_true, n_ivf,
       |       n_hit, (n_hit * 1000000) // (SELECT count(*) FROM brute)
       |         AS recall_ppm, n_planted_found
       |FROM ($probeArms)
       |ORDER BY nprobe""".stripMargin
  }

  // ---- dedup → curation composite -------------------------------------------

  /** The cross-table training-data story in one query: embedding near-dup
    * dedup decides survivors, the documents table supplies the content
    * stats, and the rollup reports retention per language. Same ids link
    * the tables (vec_id ≡ doc_id); injected synthetic dups (≥1e6) have no
    * document and are excluded. Shape: the dedup sub-pipeline (LSH
    * candidates → cosine verify → broadcast anti-join) plus ONE dimension-
    * sized join and a low-cardinality rollup — nothing new shuffles at
    * scale beyond what dedup already paid. */
  def dedupQuality(spark: SparkSession, d: String): DataFrame = {
    val survivors = dedupEmbed(spark, d)
      .where(col("vec_id") < 1000000)
    documents(spark, d)
      .join(survivors, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("vec_id")).as("n_survived"),
        sum(when(col("vec_id").isNotNull, col("n_chars")).otherwise(0L)).as("chars_kept"))
      .orderBy("lang")
  }

  def dedupQualitySql(threshold: Double = 0.99): String =
    s"""WITH survivors AS (
       |  SELECT vec_id FROM (${dedupEmbedSql(threshold)}) WHERE vec_id < 1000000
       |)
       |SELECT d.lang,
       |       count(*) AS n_docs,
       |       count(s.vec_id) AS n_survived,
       |       CAST(sum(CASE WHEN s.vec_id IS NOT NULL THEN d.n_chars ELSE 0 END)
       |            AS BIGINT) AS chars_kept
       |FROM documents d
       |LEFT JOIN survivors s ON d.doc_id = s.vec_id
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin

  // ---- L2 normalization ------------------------------------------------------

  /** Unit-normalize each embedding — the preprocessing step before any
    * cosine/IP index build. Cross-engine determinism: elements quantize to
    * exact ints q_i = floor(e_i·1e6); the squared norm Σq_i² is an exact
    * long (order-free), so norm and each q_i/√Σq_i² are the same IEEE
    * doubles in both engines, and the 1e6-requantized outputs match
    * bit-for-bit. Zero vectors yield NULL (nullif guard) rather than
    * engine-specific NaN/Inf formatting. Per-row only — zero shuffles. */
  def l2Normalize(spark: SparkSession, d: String): DataFrame = {
    val q = transform(col("emb"), e => floor(e * lit(1000000.0)).cast("long"))
    embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("sumsq", aggregate(q, lit(0L), (acc, x) => acc + x * x))
      .select(col("vec_id"),
        floor(sqrt(nullif(col("sumsq"), lit(0L)).cast("double"))).cast("long").as("norm_q"),
        array_join(transform(col("emb"),
          e => floor(floor(e * lit(1000000.0)) /
            sqrt(nullif(col("sumsq"), lit(0L)).cast("double")) * lit(1000000.0))
            .cast("long").cast("string")), ",").as("unit_q"))
      .orderBy("vec_id")
  }

  val l2NormalizeSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |), s AS (
      |  SELECT vec_id, emb,
      |         CAST(list_sum(list_transform(emb, x ->
      |           CAST(floor(x * 1000000.0) AS BIGINT)
      |             * CAST(floor(x * 1000000.0) AS BIGINT))) AS BIGINT) AS sumsq
      |  FROM e
      |)
      |SELECT vec_id,
      |       CAST(floor(sqrt(CAST(nullif(sumsq, 0) AS DOUBLE))) AS BIGINT) AS norm_q,
      |       array_to_string(list_transform(emb, x ->
      |         CAST(CAST(floor(floor(x * 1000000.0)
      |           / sqrt(CAST(nullif(sumsq, 0) AS DOUBLE)) * 1000000.0) AS BIGINT)
      |           AS VARCHAR)), ',') AS unit_q
      |FROM s
      |ORDER BY vec_id""".stripMargin

  // ---- IVF-style coarse-quantizer ANN ---------------------------------------

  /** Number of inverted-file cells (coarse centroids). */
  val IvfCells = 8

  /** Deterministic pseudo-random centroid component in quantized space
    * (±0.5 after the 1e-6 quantization), same plan-time-literal scheme as
    * [[planeComponent]] — a stand-in for trained k-means centroids (training
    * is an offline job; the serving-path operator is what's built here). */
  def centroidComponent(k: Int, j: Int): Long =
    Math.floorMod(Hashing.hexHashLocal(s"ivf$k:$j"), 1000001L) - 500000L

  private def centroidLit(k: Int): Column =
    array((0 until MaxDim).map(j => lit(centroidComponent(k, j))): _*)

  private def centroidComponentSql(k: String, j: String): String =
    s"${Hashing.hexHashSql(s"'ivf' || CAST($k AS VARCHAR) || ':' || CAST($j AS VARCHAR)")}" +
      " % 1000001 - 500000"

  /** Per-vector exact-int squared distance to every centroid: (vec_id,
    * d0..d7), via posexplode + codegen'd hash agg — exact integer
    * distances, order-independent. Same scale shape as [[lshBucketsDf]]:
    * one shuffle of int rows, [[IvfCells]] primitive sums per vector. The
    * shared core of cell assignment (argmin) and multi-probe (top-nprobe
    * cells). Input `e` must carry (vec_id, emb). */
  def ivfDistAgg(e: DataFrame): DataFrame = {
    val checked = e.select(col("vec_id"),
      dimChecked(col("emb"), "ivfAssign").as("emb"))
    val rows = checked
      .select(col("vec_id"), posexplode(col("emb")))
      .select(col("vec_id"), col("pos"),
        floor(col("col") * lit(QuantScale)).as("xq"))
    val aggs = (0 until IvfCells).map { k =>
      val dkj = col("xq") - element_at(centroidLit(k), col("pos") + 1)
      sum(dkj * dkj).as(s"d$k")
    }
    rows.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** IVF cell assignment: cell = argmin_k of [[ivfDistAgg]]'s distances,
    * ties broken toward the lowest k (same order as the oracle's CASE
    * chain). */
  def ivfAssignDf(e: DataFrame): DataFrame = {
    val minD = least((0 until IvfCells).map(k => col(s"d$k")): _*)
    val cell = (0 until IvfCells).foldRight(lit(-1)) { (k, acc) =>
      when(col(s"d$k") === minD, lit(k)).otherwise(acc)
    }
    ivfDistAgg(e).select(col("vec_id"), cell.cast("int").as("cell"))
  }

  private def ivfDistSql(k: Int, emb: String): String = {
    val comp = centroidComponentSql(k.toString, "j - 1")
    val xq = s"CAST(floor(CAST($emb AS DOUBLE[])[j] * $QuantScale) AS BIGINT)"
    s"list_reduce(list_transform(generate_series(1, len(CAST($emb AS DOUBLE[]))), " +
      s"j -> ($xq - ($comp)) * ($xq - ($comp))), (x, y) -> x + y)"
  }

  /** DuckDB cell assignment: FROM-clause fragment computing (vec_id …, cell)
    * from `embeddings`-shaped rows — d0..d7 in a subquery, argmin CASE chain
    * in the same lowest-k tie order as the Spark side. */
  private def ivfCellsFromSql(extraCols: String): String = {
    val dists = (0 until IvfCells)
      .map(k => s"${ivfDistSql(k, "embedding")} AS d$k").mkString(",\n         ")
    val least = s"least(${(0 until IvfCells).map(k => s"d$k").mkString(", ")})"
    val cases = (0 until IvfCells)
      .map(k => s"WHEN d$k = m THEN $k").mkString(" ")
    s"""(SELECT vec_id$extraCols, CAST(CASE $cases END AS INT) AS cell
       |   FROM (SELECT vec_id$extraCols, $least AS m,
       |         ${(0 until IvfCells).map(k => s"d$k").mkString(", ")}
       |         FROM (SELECT vec_id$extraCols,
       |         $dists
       |         FROM embeddings)))""".stripMargin
  }

  /** Per-vector IVF cell assignment (oracle-checked, like [[lshBuckets]]). */
  def ivfCells(spark: SparkSession, d: String): DataFrame =
    ivfAssignDf(embDouble(spark, d).select(col("vec_id"), col("emb")))

  val ivfCellsSql: String =
    s"SELECT vec_id, cell FROM ${ivfCellsFromSql("")}"

  /** IVF probe: exact cosine top-k restricted to the query vector's cell —
    * the serving-path plan: the corpus is bucketed once (at 100 TB,
    * partitioned/clustered by cell on disk), a query probes only its own
    * cell(s), and the exact scoring touches a 1/[[IvfCells]] slice. The
    * one-row query side (embedding + cell) is broadcast. */
  def ivfTopK(spark: SparkSession, d: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    graft.plans.CosineSim.register(spark)
    val e = embDouble(spark, d)
    // materialized once: the query-side probe and the cell scan both read it
    // (a lazy plan would run the assignment aggregation twice)
    val withCell = e.join(ivfAssignDf(e.select(col("vec_id"), col("emb"))), Seq("vec_id"))
      .localCheckpoint()
    val q = withCell.where(col("vec_id") === queryId)
      .select(col("emb").as("q_emb"), col("cell").as("q_cell"))
    withCell.join(broadcast(q),
        col("cell") === col("q_cell") && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        cosineFast(col("emb"), col("q_emb")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  def ivfTopKSql(queryId: Long = 0L, k: Int = 10): String = {
    val cos = cosineSql("CAST(c.embedding AS DOUBLE[])", "CAST(q.embedding AS DOUBLE[])")
    s"""WITH cells AS (
       |  SELECT vec_id, label, embedding, cell
       |  FROM ${ivfCellsFromSql(", label, embedding")}
       |), q AS (SELECT embedding, cell FROM cells WHERE vec_id = $queryId)
       |SELECT c.vec_id, c.label, $cos AS cos_sim
       |FROM cells c, q
       |WHERE c.cell = q.cell AND c.vec_id <> $queryId
       |ORDER BY cos_sim DESC, c.vec_id LIMIT $k""".stripMargin
  }

  // ---- per-label centroid aggregation (IVF "training" complement) ------------

  /** Mean embedding per label, component-wise — the aggregation a k-means /
    * IVF training step runs every iteration. posexplode to (label, pos, x)
    * rows, ONE hash aggregation on the (label, pos) grid; sums run on the
    * exact 1e-6-quantized ints (order-independent ⇒ partitioning-proof and
    * oracle-exact), one double division per OUTPUT cell. Output stays long
    * rows (label, pos, centroid) — no array columns (driver canonicalizer).
    * Result unit: quantized (1e-6) space. */
  def labelCentroids(spark: SparkSession, d: String): DataFrame =
    embDouble(spark, d)
      .select(col("label"), posexplode(dimChecked(col("emb"), "labelCentroids")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        floor(col("col") * lit(QuantScale)).as("xq"))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("xq")).cast("double") / count(lit(1))).as("centroid_q"))
      .orderBy("label", "pos")

  val labelCentroidsSql: String =
    s"""SELECT label, CAST(s[2] AS BIGINT) - 1 AS pos,
       |       count(*) AS n_vecs,
       |       CAST(sum(CAST(floor(CAST(s[1] AS DOUBLE) * $QuantScale) AS BIGINT)) AS DOUBLE)
       |         / count(*) AS centroid_q
       |FROM (SELECT label, unnest(list_zip(CAST(embedding AS DOUBLE[]),
       |        generate_series(1, len(CAST(embedding AS DOUBLE[]))))) AS s
       |      FROM embeddings) t
       |GROUP BY label, pos
       |ORDER BY label, pos""".stripMargin

  // ---- k-means Lloyd iterations (the training loop behind IVF) --------------

  /** [[KmIters]] full Lloyd iterations of k-means (K = [[KmK]]) over the
    * quantized embeddings — the TRAINING loop whose serving-path twin is
    * the IVF suite (whose centroids are stand-in literals; this op is how
    * real ones are fit). Per iteration: assignment is a (pos)-join of the
    * exploded vectors against the K·dims centroid grid + one hash agg
    * (exact long squared distances, order-free) + a per-vector argmin
    * window; the update is one hash agg on the (cell, pos) grid with a
    * floor'd mean (exact: quantized sums < 2^53 survive the double
    * division bit-identically). The centroid frame is tiny (K·dims rows)
    * and broadcast every round; the exploded fact rows are localCheckpoint
    * pinned ONCE and re-scanned per iteration — the same
    * lineage-truncation discipline as [[graft.operators.Dedup.dupClusters]].
    * At 100 TB each iteration is one shuffle of (vec, cell, partial-sum)
    * rows; iterations are strictly sequential (inherent to Lloyd).
    *
    * Seeds are plan-deterministic [[graft.functions.Hashing]] pseudo-random
    * components, ±0.5 in quantized space — the same scheme as
    * [[centroidComponent]], so the oracle regenerates them exactly. */
  val KmK = 4
  val KmIters = 2

  def kmeansAssign(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = embDouble(spark, d)
      .select(col("vec_id"), posexplode(dimChecked(col("emb"), "kmeans")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        floor(col("col") * lit(QuantScale)).cast("long").as("xq"))
      .localCheckpoint()
    val seeds = rows.select(col("pos")).distinct()
      .crossJoin(spark.range(KmK).select(col("id").as("cell")))
      .select(col("cell"), col("pos"),
        (Hashing.hexHash(concat(lit("km"), col("cell").cast("string"),
          lit(":"), col("pos").cast("string"))) % 1000001L - 500000L).as("cq"))
    def assign(cent: DataFrame): DataFrame = {
      val diff = col("xq") - col("cq")
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cell"))
      rows.join(broadcast(cent), Seq("pos"))
        .groupBy(col("vec_id"), col("cell"))
        .agg(sum(diff * diff).as("dist"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("cell"), col("dist"))
    }
    def update(assigned: DataFrame): DataFrame =
      assigned.select(col("vec_id"), col("cell"))
        .join(rows, Seq("vec_id"))
        .groupBy(col("cell"), col("pos"))
        .agg(floor(sum(col("xq")).cast("double") / count(lit(1))).cast("long").as("cq"))
    val fin = (1 until KmIters).foldLeft(assign(seeds)) { (a, _) =>
      assign(update(a))
    }
    fin.orderBy("vec_id")
  }

  val kmeansAssignSql: String = {
    val seedCq = s"(${Hashing.hexHashSql("'km' || CAST(cell AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")} % 1000001) - 500000"
    s"""WITH rws AS (
       |  SELECT vec_id, CAST(s[2] AS BIGINT) - 1 AS pos,
       |         CAST(floor(CAST(s[1] AS DOUBLE) * $QuantScale) AS BIGINT) AS xq
       |  FROM (SELECT vec_id, unnest(list_zip(CAST(embedding AS DOUBLE[]),
       |          generate_series(1, len(CAST(embedding AS DOUBLE[]))))) AS s
       |        FROM embeddings) t
       |), seeds AS (
       |  SELECT cell, pos, $seedCq AS cq
       |  FROM (SELECT DISTINCT pos FROM rws), (SELECT CAST(i AS BIGINT) AS cell
       |                                        FROM range(0, $KmK) r(i))
       |), a1 AS (
       |  SELECT vec_id, cell, dist FROM (
       |    SELECT vec_id, cell, dist,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM (SELECT r.vec_id, c.cell,
       |                 CAST(sum((r.xq - c.cq) * (r.xq - c.cq)) AS BIGINT) AS dist
       |          FROM rws r JOIN seeds c ON r.pos = c.pos
       |          GROUP BY 1, 2)
       |  ) WHERE rn = 1
       |), c1 AS (
       |  SELECT a.cell, r.pos,
       |         CAST(floor(CAST(sum(r.xq) AS DOUBLE) / count(*)) AS BIGINT) AS cq
       |  FROM a1 a JOIN rws r ON a.vec_id = r.vec_id
       |  GROUP BY 1, 2
       |), a2 AS (
       |  SELECT vec_id, cell, dist FROM (
       |    SELECT vec_id, cell, dist,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM (SELECT r.vec_id, c.cell,
       |                 CAST(sum((r.xq - c.cq) * (r.xq - c.cq)) AS BIGINT) AS dist
       |          FROM rws r JOIN c1 c ON r.pos = c.pos
       |          GROUP BY 1, 2)
       |  ) WHERE rn = 1
       |)
       |SELECT vec_id, cell, dist FROM a2 ORDER BY vec_id""".stripMargin
  }

  // ---- product quantization (PQ) ANN -----------------------------------------
  // The third leg of the ANN stool (exact scan / IVF cell-probe / PQ
  // compressed-domain): vectors are encoded as [[PqM]] sub-space codebook
  // ids (8 bits here → a 64-dim float vector becomes 4 bytes), and queries
  // rank candidates by ASYMMETRIC DISTANCE (ADC) — the query's exact
  // distance to each centroid, looked up per stored code, never touching
  // the raw vectors. Codebooks are plan-time literals from the
  // cross-engine hash (the trained-offline stand-in, like IVF's
  // centroids); all distances are exact integers in quantized space, so
  // encode and ADC rank are bit-reproducible in the oracle.

  val PqM = 4
  val PqK = 8
  val PqSubDim = 16

  def pqComponent(m: Int, k: Int, j: Int): Long =
    Math.floorMod(Hashing.hexHashLocal(s"pq$m:$k:$j"), 1000001L) - 500000L

  private def pqLit(m: Int, k: Int): Column =
    array((0 until PqSubDim).map(j => lit(pqComponent(m, k, j))): _*)

  /** Per-vector exact-int squared distance to every (subspace, code)
    * centroid: (vec_id, d_0_0 … d_3_7). One posexplode + ONE codegen'd
    * hash agg computes all [[PqM]]·[[PqK]] sums — the same single-shuffle
    * shape as [[ivfDistAgg]], just a wider aggregate row. Dimensions
    * beyond PqM·PqSubDim would be ignored by the subspace mask; the
    * testdata is exactly 64-dim. */
  def pqDistAgg(e: DataFrame): DataFrame = {
    val checked = e.select(col("vec_id"), dimChecked(col("emb"), "pq").as("emb"))
    val rows = checked
      .select(col("vec_id"), posexplode(col("emb")))
      .select(col("vec_id"), col("pos"),
        floor(col("col") * lit(QuantScale)).as("xq"))
    val aggs = for { m <- 0 until PqM; k <- 0 until PqK } yield {
      val dkj = col("xq") - element_at(pqLit(m, k), pmod(col("pos"), lit(PqSubDim)) + 1)
      sum(when(expr(s"pos div $PqSubDim") === m, dkj * dkj).otherwise(lit(0L)))
        .as(s"d_${m}_$k")
    }
    rows.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Codes (per-subspace argmin, lowest-k ties) + total distortion from a
    * [[pqDistAgg]] frame. */
  private def pqCodesFromDists(dists: DataFrame): DataFrame = {
    val codeCols = (0 until PqM).map { m =>
      val minD = least((0 until PqK).map(k => col(s"d_${m}_$k")): _*)
      (0 until PqK).foldRight(lit(-1)) { (k, acc) =>
        when(col(s"d_${m}_$k") === minD, lit(k)).otherwise(acc)
      }.cast("int").as(s"code$m")
    }
    val distortion = (0 until PqM)
      .map(m => least((0 until PqK).map(k => col(s"d_${m}_$k")): _*))
      .reduce(_ + _)
    dists.select(col("vec_id") +: codeCols :+ distortion.as("distortion"): _*)
  }

  /** PQ encoding of the corpus (the write-path compression job). */
  def pqCodes(spark: SparkSession, d: String): DataFrame =
    pqCodesFromDists(pqDistAgg(embDouble(spark, d).select(col("vec_id"), col("emb"))))
      .orderBy("vec_id")

  private def pqDistSql(m: Int, k: Int, emb: String): String = {
    val comp = s"(${Hashing.hexHashSql(s"'pq$m:$k:' || CAST(j - 1 AS VARCHAR)")} % 1000001 - 500000)"
    val xq = s"CAST(floor(CAST($emb AS DOUBLE[])[${m * PqSubDim} + j] * $QuantScale) AS BIGINT)"
    s"list_reduce(list_transform(generate_series(1, $PqSubDim), " +
      s"j -> ($xq - $comp) * ($xq - $comp)), (x, y) -> x + y)"
  }

  private def pqDistsFromSql: String = {
    val cols = (for { m <- 0 until PqM; k <- 0 until PqK }
      yield s"${pqDistSql(m, k, "embedding")} AS d_${m}_$k").mkString(",\n         ")
    s"""dists AS (
       |  SELECT vec_id,
       |         $cols
       |  FROM embeddings
       |)""".stripMargin
  }

  private def pqCodesFromSql: String = {
    val mins = (0 until PqM)
      .map(m => s"least(${(0 until PqK).map(k => s"d_${m}_$k").mkString(", ")}) AS m$m")
      .mkString(", ")
    val codes = (0 until PqM).map { m =>
      val cases = (0 until PqK).map(k => s"WHEN d_${m}_$k = m$m THEN $k").mkString(" ")
      s"CAST(CASE $cases END AS INT) AS code$m"
    }.mkString(",\n         ")
    s"""codes AS (
       |  SELECT vec_id,
       |         $codes,
       |         CAST(${(0 until PqM).map(m => s"m$m").mkString(" + ")} AS BIGINT) AS distortion
       |  FROM (SELECT *, $mins FROM dists)
       |)""".stripMargin
  }

  val pqCodesSql: String =
    s"""WITH ${pqDistsFromSql},
       |${pqCodesFromSql}
       |SELECT vec_id, code0, code1, code2, code3, distortion
       |FROM codes ORDER BY vec_id""".stripMargin

  /** ADC top-k: rank the whole corpus against query [[pqTopK.queryId]] in
    * the COMPRESSED domain. The query's 32 centroid distances (its LUT)
    * come from a pushdown-pruned re-aggregation of just its own row (≤2
    * consumers → re-scan beats localCheckpoint, round-4 invariant 3) and
    * broadcast; each corpus row then costs [[PqM]] lookups — no raw
    * vectors move. The full-dim exact rerank of the ADC shortlist is
    * [[cosineTopK]]'s shape, composable downstream. */
  def pqTopK(spark: SparkSession, d: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = embDouble(spark, d)
    val codes = pqCodesFromDists(pqDistAgg(e.select(col("vec_id"), col("emb"))))
    val lut = pqDistAgg(e.where(col("vec_id") === queryId).select(col("vec_id"), col("emb")))
      .select((for { m <- 0 until PqM; kk <- 0 until PqK }
        yield col(s"d_${m}_$kk").as(s"lut_${m}_$kk")): _*)
    val adc = (0 until PqM).map { m =>
      (0 until PqK).foldRight(lit(0L)) { (kk, acc) =>
        when(col(s"code$m") === kk, col(s"lut_${m}_$kk")).otherwise(acc)
      }
    }.reduce(_ + _)
    codes.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(lut))
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("vec_id"), col("label"), adc.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id"))
      .limit(k)
  }

  def pqTopKSql(queryId: Long = 0L, k: Int = 10): String = {
    val adc = (0 until PqM).map { m =>
      val cases = (0 until PqK).map(kk => s"WHEN $kk THEN q.d_${m}_$kk").mkString(" ")
      s"(CASE c.code$m $cases END)"
    }.mkString(" + ")
    s"""WITH ${pqDistsFromSql},
       |${pqCodesFromSql},
       |qd AS (SELECT * FROM dists WHERE vec_id = $queryId)
       |SELECT c.vec_id, e.label, CAST($adc AS BIGINT) AS adc_dist
       |FROM codes c
       |CROSS JOIN qd q
       |JOIN embeddings e ON e.vec_id = c.vec_id
       |WHERE c.vec_id <> $queryId
       |ORDER BY adc_dist, c.vec_id LIMIT $k""".stripMargin
  }

  // ---- int8 symmetric quantization ------------------------------------------

  /** Int8 symmetric quantization of embeddings — the standard 4× memory
    * shrink before an ANN index is resident at 100 TB scale: code_i =
    * floor(127·e_i / amax), per-vector scale amax = max|e_i|. All
    * arithmetic runs in the exact-integer quantized space ([[l2Normalize]]
    * discipline): e_i → q_i = floor(e_i·1e6) exact longs, 127·q_i exact,
    * the single double division floors identically in both engines, and
    * the reconstruction-error sum Σ(127·q_i − code_i·amax) is an exact
    * long (each term is a floor-division remainder in [0, amax)). Zero
    * vectors yield NULL codes (nullif guard), not NaN. Map-only. */
  def embedQuant(spark: SparkSession, d: String): DataFrame = {
    val q = transform(col("embedding").cast("array<double>"),
      e => floor(e * lit(1000000.0)).cast("long"))
    val amaxD = nullif(col("amax"), lit(0L)).cast("double")
    val code = (x: org.apache.spark.sql.Column) =>
      floor((x * lit(127L)).cast("double") / amaxD).cast("long")
    embeddings(spark, d)
      .select(col("vec_id"), q.as("qarr"))
      .withColumn("amax",
        aggregate(col("qarr"), lit(0L), (a, x) => greatest(a, abs(x))))
      .select(
        col("vec_id"), col("amax"),
        coalesce(array_join(transform(col("qarr"),
          x => code(x).cast("string")), ","), lit("")).as("codes"),
        coalesce(aggregate(col("qarr"), lit(0L),
          (a, x) => a + (x * lit(127L) - code(x) * col("amax"))), lit(0L))
          .as("err_sum"))
      .orderBy("vec_id")
  }

  val embedQuantSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |         list_transform(CAST(embedding AS DOUBLE[]),
      |           x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qarr
      |  FROM embeddings
      |), s AS (
      |  SELECT vec_id, qarr,
      |         CAST(list_max(list_transform(qarr, x -> abs(x))) AS BIGINT) AS amax
      |  FROM q
      |)
      |SELECT vec_id, COALESCE(amax, 0) AS amax,
      |       COALESCE(array_to_string(list_transform(qarr, x ->
      |         CAST(CAST(floor(CAST(x * 127 AS DOUBLE)
      |           / CAST(nullif(amax, 0) AS DOUBLE)) AS BIGINT) AS VARCHAR)), ','),
      |         '') AS codes,
      |       COALESCE(CAST(list_sum(list_transform(qarr, x ->
      |         x * 127 - CAST(floor(CAST(x * 127 AS DOUBLE)
      |           / CAST(nullif(amax, 0) AS DOUBLE)) AS BIGINT) * amax)) AS BIGINT),
      |         0) AS err_sum
      |FROM s
      |ORDER BY vec_id""".stripMargin

  // ---- chunk → document mean pooling ----------------------------------------

  /** Mean-pool chunk embeddings into a document embedding — the retrieval
    * preprocessing step after long documents are split and embedded per
    * chunk. Chunk groups are derived deterministically (vec_id div 4 — 4
    * chunks per pooled doc). Physics: posexplode to (group, dim, q) rows,
    * ONE hash aggregation keyed (group, dim) with map-side combine (exact
    * long sums in quantized space), then per-group reassembly sorted by
    * dimension — the shape that scales to billions of chunks because the
    * wide row never shuffles, only (group, dim, long) triples. Mean =
    * floor(sum/n) in one double division (exact: |sum| < 2^53). */
  def embedPool(spark: SparkSession, d: String): DataFrame = {
    val q = transform(col("embedding").cast("array<double>"),
      e => floor(e * lit(1000000.0)).cast("long"))
    embeddings(spark, d)
      .select(expr("vec_id div 4").as("group_id"), posexplode(q).as(Seq("dim", "qv")))
      .groupBy(col("group_id"), col("dim"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .select(col("group_id"), col("dim"),
        floor(col("s").cast("double") / col("n").cast("double")).cast("long").as("m"),
        col("n"))
      .groupBy(col("group_id"))
      .agg(max(col("n")).as("n_chunks"),
        array_join(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          p => p.getField("m").cast("string")), ",").as("pooled_q"))
      .orderBy("group_id")
  }

  val embedPoolSql: String =
    """WITH q AS (
      |  SELECT vec_id // 4 AS group_id,
      |         list_transform(CAST(embedding AS DOUBLE[]),
      |           x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qarr
      |  FROM embeddings
      |), flat AS (
      |  SELECT group_id, i AS dim, qarr[i + 1] AS qv
      |  FROM q CROSS JOIN range(0, 4096) t(i)
      |  WHERE i < len(qarr)
      |), agg AS (
      |  SELECT group_id, dim,
      |         CAST(floor(CAST(sum(qv) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |           AS BIGINT) AS m,
      |         count(*) AS n
      |  FROM flat GROUP BY group_id, dim
      |)
      |SELECT group_id, CAST(max(n) AS BIGINT) AS n_chunks,
      |       string_agg(CAST(m AS VARCHAR), ',' ORDER BY dim) AS pooled_q
      |FROM agg GROUP BY group_id
      |ORDER BY group_id""".stripMargin

  // ---- kNN label classification ---------------------------------------------

  /** Majority-vote kNN over the embedding table: every 50th vector is the
    * holdout (its true label rides along for accuracy analysis), classified
    * by its K nearest candidates under exact cosine. The holdout side is
    * BROADCAST onto one pass over the candidate scan — the candidate table
    * never shuffles for the similarity; the per-query top-K and the vote
    * argmax are window passes over query-sized frames. Determinism:
    * cosines come from [[graft.plans.CosineSimExpr]] (bit-identical to the
    * oracle's sequential fold), neighbor ties break on vec_id, vote ties
    * on the smaller label. This is the exact-eval baseline; at 100 TB the
    * same vote stage composes over [[ivfTopK]]'s cell-probe candidates
    * instead of the full scan. */
  val KnnK = 5
  val KnnHoldout = 50

  def knnClassify(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.CosineSim.register(spark)
    val e = embDouble(spark, d)
    val q = e.where(col("vec_id") % KnnHoldout === 0)
      .select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("emb").as("q_emb"))
    val cand = e.where(col("vec_id") % KnnHoldout =!= 0)
    val sims = cand.crossJoin(broadcast(q))
      .select(col("q_id"), col("true_label"), col("vec_id"), col("label"),
        cosineFast(col("emb"), col("q_emb")).as("cs"))
    val byQ = Window.partitionBy("q_id").orderBy(col("cs").desc, col("vec_id"))
    val votes = sims.withColumn("rn", row_number().over(byQ))
      .where(col("rn") <= KnnK)
      .groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val byVote = Window.partitionBy("q_id")
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("vr", row_number().over(byVote))
      .where(col("vr") === 1)
      .select(col("q_id"), col("true_label"), col("label").as("pred_label"),
        col("votes"))
      .orderBy("q_id")
  }

  val knnClassifySql: String = {
    val cos = cosineSql("c.ce", "q.qe")
    s"""WITH q AS (
      |  SELECT vec_id AS q_id, label AS true_label,
      |         CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id % $KnnHoldout = 0
      |), c AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ce
      |  FROM embeddings WHERE vec_id % $KnnHoldout <> 0
      |), sims AS (
      |  SELECT q.q_id, q.true_label, c.vec_id, c.label, $cos AS cs
      |  FROM c CROSS JOIN q
      |), top AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |                               ORDER BY cs DESC, vec_id) AS rn
      |  FROM sims
      |), votes AS (
      |  SELECT q_id, true_label, label, count(*) AS votes
      |  FROM top WHERE rn <= $KnnK GROUP BY 1, 2, 3
      |), best AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |                               ORDER BY votes DESC, label) AS vr
      |  FROM votes
      |)
      |SELECT q_id, true_label, label AS pred_label,
      |       CAST(votes AS BIGINT) AS votes
      |FROM best WHERE vr = 1 ORDER BY q_id""".stripMargin
  }

  // ---- random signed projection (JL-style dimensionality reduction) --------

  val RpK = 8

  /** Johnson–Lindenstrauss-style random signed projection: a dim-D
    * embedding reduces to [[RpK]] exact-integer components
    * r_p = ⟨w_p, floor(x·1e6)⟩, reusing the SAME hash-derived plane
    * family as the LSH signature (plane p's weights are
    * `hexHash("p:j") % 1000 − 500` — plan-time literals, no RNG in the
    * plan). This is the dimensionality-reduction step ahead of ANN at
    * scale: 8 longs instead of D doubles flow through every downstream
    * shuffle, and the sign bits of these very components ARE the LSH
    * bucket, so projection and bucketing stay one consistent family.
    * Shape: posexplode → one codegen'd hash aggregation of K
    * primitive-long conditional sums (the [[lshBucketsDf]] scale form —
    * HOF dot products don't codegen); exact integers ⇒ hash-oracle-able
    * with no quantization grid. */
  def rpProject(spark: SparkSession, d: String): DataFrame = {
    val rows = embDouble(spark, d)
      .select(col("vec_id"), dimChecked(col("emb"), "rpProject").as("emb"))
      .select(col("vec_id"), posexplode(col("emb")))
      .select(col("vec_id"), col("pos"),
        floor(col("col") * lit(QuantScale)).as("xq"))
    val aggs = (0 until RpK).map(p =>
      sum(col("xq") * element_at(planeLit(p), col("pos") + 1))
        .cast("long").as(s"rp_$p"))
    rows.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
      .orderBy("vec_id")
  }

  val rpProjectSql: String = {
    val comps = (0 until RpK).map { p =>
      val comp = planeComponentSql(p.toString, "j - 1")
      s"""  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
         |    generate_series(1, len(CAST(embedding AS DOUBLE[]))),
         |    j -> CAST(floor(CAST(embedding AS DOUBLE[])[j] * $QuantScale) AS BIGINT)
         |           * ($comp))),
         |    (x, y) -> x + y) AS BIGINT) AS rp_$p""".stripMargin
    }.mkString(",\n")
    s"SELECT vec_id,\n$comps\nFROM embeddings\nORDER BY vec_id"
  }

  // ---- hybrid-retrieval reciprocal-rank fusion -------------------------------

  val RrfK = 60
  val RrfN = 50
  val RrfOut = 20

  /** Reciprocal-rank fusion of a lexical ranking (BM25 over documents) and
    * a semantic ranking (exact cosine vs the query vector) — the standard
    * hybrid-retrieval combiner: score = Σ 1/(RrfK + rank) over the lists
    * the id appears in. The testdata aligns vec_id with doc_id, so the two
    * lists fuse on one id space.
    *
    * Scale: each list is produced by its own scale-correct path (BM25 =
    * broadcast corpus stats over the scan; cosine = broadcast query +
    * TakeOrderedAndProject partial top-k), cut to a CONSTANT RrfN rows
    * before any ranking runs — the global rank only ever sees 50 rows, via
    * the two-pass [[ScaleTools.globalRank]] (so even the list ranking
    * plans with no unpartitioned window), and the fusion join is
    * constant-size. Ranks are total-ordered (score desc, id) so ties are
    * deterministic; the fused score is one two-term double sum in fixed
    * order, then 1e-9-floor-quantized. */
  def rrfFusion(spark: SparkSession, d: String): DataFrame = {
    val lex = ScaleTools.globalRank(
      TextAnalysis.bm25(spark, d)
        .orderBy(col("bm25_q").desc, col("doc_id")).limit(RrfN),
      Seq(col("bm25_q").desc, col("doc_id")), "ra")
      .select(col("doc_id"), col("ra"))
    val sem = ScaleTools.globalRank(
      cosineTopK(spark, d, 0L, RrfN),
      Seq(col("cos_sim").desc, col("vec_id")), "rb")
      .select(col("vec_id").as("doc_id"), col("rb"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("ra"), col("rb"),
        floor((coalesce(lit(1.0) / (lit(RrfK) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rb")), lit(0.0))) * lit(1e9))
          .as("rrf_q"))
      .orderBy(col("rrf_q").desc, col("doc_id"))
      .limit(RrfOut)
  }

  def rrfFusionSql: String = {
    val cos = cosineSql("CAST(e.embedding AS DOUBLE[])", "CAST(q.embedding AS DOUBLE[])")
    s"""WITH lex_full AS (
       |${TextAnalysis.bm25Sql}
       |), lexr AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY bm25_q DESC, doc_id) AS ra
       |  FROM lex_full QUALIFY ra <= $RrfN
       |), semr AS (
       |  SELECT vec_id AS doc_id,
       |         row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rb
       |  FROM (SELECT e.vec_id, $cos AS cos_sim
       |        FROM embeddings e,
       |             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
       |        WHERE e.vec_id <> 0)
       |  QUALIFY rb <= $RrfN
       |)
       |SELECT COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
       |       CAST(ra AS BIGINT) AS ra, CAST(rb AS BIGINT) AS rb,
       |       CAST(floor((COALESCE(1.0 / ($RrfK + ra), 0.0)
       |                   + COALESCE(1.0 / ($RrfK + rb), 0.0)) * 1e9) AS BIGINT)
       |         AS rrf_q
       |FROM lexr FULL JOIN semr ON lexr.doc_id = semr.doc_id
       |ORDER BY rrf_q DESC, doc_id LIMIT $RrfOut""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rrf"        -> ((s, d) => rrfFusion(s, d)),
    "q_rp_project" -> ((s, d) => rpProject(s, d)),
    "q_knn_classify" -> ((s, d) => knnClassify(s, d)),
    "q_embed_quant" -> ((s, d) => embedQuant(s, d)),
    "q_embed_pool"  -> ((s, d) => embedPool(s, d)),
    "q_pq_codes"        -> ((s, d) => pqCodes(s, d)),
    "q_pq_topk"         -> ((s, d) => pqTopK(s, d)),
    "q_kmeans"          -> ((s, d) => kmeansAssign(s, d)),
    "q_cosine_topk"     -> ((s, d) => cosineTopK(s, d)),
    "q_lsh_buckets"     -> ((s, d) => lshBuckets(s, d)),
    "q_ann_pairs"       -> ((s, d) => annPairs(s, d)),
    "q_dedup_embed"     -> ((s, d) => dedupEmbed(s, d)),
    "q_semdedup"        -> ((s, d) => semDedup(s, d)),
    "q_l2_normalize"    -> ((s, d) => l2Normalize(s, d)),
    "q_dedup_quality"   -> ((s, d) => dedupQuality(s, d)),
    "q_ivf_cells"       -> ((s, d) => ivfCells(s, d)),
    "q_ivf_topk"        -> ((s, d) => ivfTopK(s, d)),
    "q_ivf_probe3"      -> ((s, d) => ivfTopKProbe(s, d)),
    "q_ann_recall"      -> ((s, d) => ivfRecallEval(s, d)),
    "q_ann_sweep"       -> ((s, d) => ivfNprobeSweep(s, d)),
    "q_label_centroids" -> ((s, d) => labelCentroids(s, d)))

  def oracles: Map[String, String] = Map(
    "q_rrf"        -> rrfFusionSql,
    "q_rp_project" -> rpProjectSql,
    "q_knn_classify" -> knnClassifySql,
    "q_embed_quant" -> embedQuantSql,
    "q_embed_pool"  -> embedPoolSql,
    "q_pq_codes"        -> pqCodesSql,
    "q_pq_topk"         -> pqTopKSql(),
    "q_kmeans"          -> kmeansAssignSql,
    "q_cosine_topk"     -> cosineTopKSql(),
    "q_lsh_buckets"     -> lshBucketsSql,
    "q_ann_pairs"       -> annPairsSql(),
    "q_dedup_embed"     -> dedupEmbedSql(),
    "q_semdedup"        -> semDedupSql(),
    "q_l2_normalize"    -> l2NormalizeSql,
    "q_dedup_quality"   -> dedupQualitySql(),
    "q_ivf_cells"       -> ivfCellsSql,
    "q_ann_recall"      -> ivfRecallEvalSql(),
    "q_ann_sweep"       -> ivfNprobeSweepSql(),
    "q_ivf_topk"        -> ivfTopKSql(),
    "q_ivf_probe3"      -> ivfTopKProbeSql(),
    "q_label_centroids" -> labelCentroidsSql)
}
