package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale smoke: measure how the heavy-tail queries actually scale.
  *
  * `gen` synthesizes an sf1 dataset (10× sf0.1) under `target/scale_sf1`
  * by unioning 10 key-shifted replicas of every sf0.1 table — shifted so
  * JOIN fan-in and per-group sizes stay constant while group counts grow
  * 10× (how the real workload grows). The two content tables need more
  * than a key shift, or every replica would be a trivial duplicate and
  * the dedup queries would measure a different (pathological) workload:
  *
  *  - `documents`: replica r>0 maps every word w → w+suffix_r — a
  *    BIJECTIVE vocabulary rename. Intra-replica similarity structure
  *    (exact dups, near-dups, shingle df distribution) is preserved
  *    EXACTLY, so pair counts scale ~10× with the corpus; across
  *    replicas the vocabularies are disjoint, so no shingle ever
  *    matches (vocabulary grows with the corpus, Heaps-style). An
  *    earlier hash-sort permutation was rejected: sorting CANONICALIZES
  *    word order, turning bag-similar docs into sequence-near-dups and
  *    manufacturing a quadratic pair explosion that measures the
  *    synthesis, not the engine.
  *  - `embeddings`: replica r>0 applies a deterministic per-dimension
  *    sign flip — an orthogonal transform, so intra-replica geometry
  *    (neighborhoods, centroids) is preserved exactly while replicas
  *    are mutually uncorrelated.
  *
  * `run` times each heavy-tail query at sf0.1 and sf1 (same session,
  * min-of-2 like Bench, `toRdd.count()` materialization) and prints one
  * JSON line per query with the measured scaling exponent
  * log10(t_sf1 / t_sf0.1) — 1.0 = linear, <1 = sublinear (fixed overheads
  * amortizing), >1 = superlinear (a pair join or sort outgrowing the
  * input). Results are recorded in SCALING.md.
  */
object ScaleSmoke {

  /** Heavy tail per BENCH_r09_full.json, minus the multi-batch streaming
    * drives (their wall time is staged micro-batch machinery, not data
    * volume) — with two single-drive streaming representatives kept in. */
  val HeavyTail: Seq[String] = Seq(
    "q_span_cut", "q_dup_ngrams", "q_dup_spans", "q_img_dedup", "q_kcore",
    "q_winnow_pairs", "q_sssp", "q_neg_sample", "q_pagerank", "q_bfs",
    "q_bootstrap", "q_checksum_diff", "q_triangles", "q_ssjoin_prefix",
    "q_degree_dist", "q_dup_clusters", "q_minhash_pairs", "q_sql_q9",
    "q_sql_q21", "q_join_composite", "q_stream_daily", "q_stream_sessions")

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("run")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val dst = "target/scale_sf1"
    mode match {
      case "gen" => gen(spark, src, dst)
      case "run" => run(spark, src, dst,
        if (args.length > 1) args.drop(1).toSeq else HeavyTail)
      case other => sys.error(s"ScaleSmoke: unknown mode $other")
    }
    spark.stop()
  }

  private val Replicas = 10

  def gen(spark: SparkSession, src: String, dst: String): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // single FILE per table (matching the driver's layout — the streaming
    // drives glob for the literal file name `events.parquet`)
    def write(t: String, df: DataFrame): Unit = {
      val scratch = java.nio.file.Files.createTempDirectory(s"scale_gen_$t")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val listing = java.nio.file.Files.list(scratch)
      val part = try listing.filter(
          p => p.getFileName.toString.startsWith("part-")).findFirst()
        finally listing.close()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
      val target = java.nio.file.Paths.get(dst, s"$t.parquet")
      if (java.nio.file.Files.isDirectory(target)) {
        // stale dir from a previous run's layout: clear it
        val walk = java.nio.file.Files.walk(target)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      } else java.nio.file.Files.deleteIfExists(target)
      java.nio.file.Files.move(part.get(), target)
      println(s"[scale] wrote $t: ${spark.read.parquet(target.toString).count()} rows")
    }
    def shifted(t: String, keys: Seq[String])(extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val base = read(t)
      val spans = keys.map(k =>
        k -> (base.agg(max(col(k))).head.getLong(0) + 1L)).toMap
      (0 until Replicas).map { r =>
        val shiftedDf = keys.foldLeft(base) { case (d, k) =>
          d.withColumn(k, col(k) + lit(r.toLong * spans(k)))
        }
        extra(shiftedDf, r)
      }.reduce(_ unionAll _)
    }
    // dimensions stay fixed (as in TPC-H: region/nation never scale)
    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", shifted("customer", Seq("c_custkey"))())
    write("supplier", shifted("supplier", Seq("s_suppkey"))())
    write("part", shifted("part", Seq("p_partkey"))())
    write("orders", shifted("orders", Seq("o_orderkey", "o_custkey"))())
    write("lineitem", shifted("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey"))())
    write("events", shifted("events", Seq("event_id", "user_id"))())
    // documents: per-replica bijective vocabulary rename (w → w + tag_r)
    write("documents", shifted("documents", Seq("doc_id"))((d, r) =>
      if (r == 0) d
      else d.withColumn("text", concat_ws(" ", expr(
          s"""transform(split(text, ' '),
             |  w -> CASE WHEN w = '' THEN w ELSE concat(w, '${('p' + r - 1).toChar}') END)""".stripMargin)))
        .withColumn("n_chars", length(col("text")))))
    // embeddings: per-replica orthogonal sign flip per dimension
    write("embeddings", shifted("embeddings", Seq("vec_id"))((d, r) =>
      if (r == 0) d
      else d.withColumn("embedding", expr(
        s"""transform(embedding,
           |  (x, i) -> CASE WHEN pmod(xxhash64(i, ${r}L), 2) = 0
           |            THEN x ELSE -x END)""".stripMargin))))
  }

  def run(spark: SparkSession, small: String, big: String,
      queryNames: Seq[String]): Unit = {
    // warm the session so the first timed query is not JVM init
    spark.read.parquet(s"$small/region.parquet").count()
    val qs = SparkEntry.queries
    def timeOne(name: String, dir: String): (Double, Boolean) = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { qs(name)(spark, dir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[scale] $name @ $dir failed: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (runs.map(_._1).min, runs.forall(_._2))
    }
    val results = queryNames.map { n =>
      val (t01, ok1) = timeOne(n, small)
      val (t1, ok2) = timeOne(n, big)
      val exp = math.log10(t1 / t01)
      println(f"""{"query":"$n","sf01":$t01%.2f,"sf1":$t1%.2f,"exp":$exp%.2f,"ok":${ok1 && ok2}}""")
      (n, t01, t1, exp, ok1 && ok2)
    }
    val load =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim
      catch { case _: Throwable => "unavailable" }
    println(s"""{"metric":"scale_smoke","queries":${results.size},""" +
      s""""failed":${results.count(!_._5)},"loadavg":"$load"}""")
  }
}
