package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up session + codegen + file-index paths once so the first timed
    // query doesn't absorb JVM/session initialization
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    def loadavg: String =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim
      catch { case _: Throwable => "unavailable" }
    // SELF-CALIBRATION: fixed in-memory workloads (identical bytes every
    // round) timed on the same JVM/VM as the queries. Cross-round
    // comparisons normalize by the calib ratio first: two judges burned
    // sessions adjudicating VM drift that this number makes mechanical
    // (run A at calib 1.2 s vs run B at calib 1.8 s ⇒ divide B's
    // per-query times by 1.5 before calling anything a regression).
    // The calibrator itself must be LOW-VARIANCE or it mis-scales the
    // comparison it exists for (round-16 read 2.69 vs 1.56 for identical
    // code — min-of-2 with no warm-up let codegen+JIT compilation land
    // inside the timed window). So: one UNTIMED warm-up compiles each
    // shape, then min-of-5 timed runs, with every run recorded in the
    // artifact so variance is visible instead of argued about.
    //
    // ROUND-20: ONE calibration query proved insufficient — the r19→r20
    // same-code captures saw the shuffle shape alone halve (JIT/allocator
    // luck), and the single-number adjustment then invented 75 phantom
    // movers while the raw median sat at 1.007. Calibrate on a BASKET of
    // three heterogeneous shapes (shuffle-bound, scan-bound,
    // codegen/CPU-bound): genuine VM drift moves all three by the same
    // factor; a one-shape swing is calibrator noise, and the norm
    // artifact below refuses to adjust when the shapes disagree.
    def timedMin5(body: () => Unit): (Double, Seq[Double]) = {
      def once(): Double = {
        val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
      }
      once() // untimed: whole-stage codegen + JIT compile the shape
      val runs = Seq.fill(5)(once())
      (runs.min, runs)
    }
    import org.apache.spark.sql.functions._
    def calibShuffle(): Unit =
      spark.range(0, 8000000L, 1, 32)
        .select((col("id") * 2654435761L % 1000000L).as("k"), col("id"))
        .groupBy("k").agg(sum("id").as("s"), count(lit(1)).as("c"))
        .orderBy("k").queryExecution.toRdd.count()
    // scan shape: deterministic parquet written once per run (codec +
    // page-decode bound; independent of the round's testdata)
    val calibDir = java.nio.file.Files.createTempDirectory("graft_calib").toString
    spark.range(0, 6000000L, 1, 32)
      .select(col("id"), (col("id") * 2654435761L % 97L).as("k"),
        concat(lit("v"), col("id") % 1000).as("s"))
      .write.mode("overwrite").parquet(s"$calibDir/scan")
    def calibScan(): Unit =
      spark.read.parquet(s"$calibDir/scan")
        .select(sum(col("id") + col("k")).as("x"))
        .queryExecution.toRdd.count()
    // cpu shape: per-row hash chain, no shuffle, pure codegen loop
    // (xxhash64 + pmod keep every intermediate ANSI-overflow-safe)
    def calibCpu(): Unit =
      spark.range(0, 20000000L, 1, 32)
        .select(pmod(xxhash64(col("id")), lit(1000003L)).as("h"))
        .select(sum(when(col("h") < 300000L, col("h"))
          .otherwise(-col("h"))).as("x"))
        .queryExecution.toRdd.count()
    val loadStart = loadavg
    val (calib, calibRuns) = timedMin5(calibShuffle _)
    val (calibScanS, _) = timedMin5(calibScan _)
    val (calibCpuS, _) = timedMin5(calibCpu _)
    // deterministic name order so per-query timings are comparable across
    // rounds (Map iteration order would shift as queries are added)
    // SPARK_GRAFT_ONLY=q_a,q_b: time a subset (fast A/B loops); the
    // full-artifact write below is skipped for filtered runs so a probe
    // can never clobber the round's BENCH_full_last.json
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def timeAll(): Seq[(String, Double, Boolean)] = names.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output column; a plain df.count()
      // would let Catalyst prune map-only query work down to a row count
      // and undercount the operator's real cost
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // two full passes, min per query: single-run numbers on a shared VM
    // carry ±20-40% noise spikes; the min over repetitions estimates the
    // query's actual cost (standard repetition benching)
    val r1 = timeAll()
    val r2 = timeAll()
    val results = r1.zip(r2).map { case ((n, t1, ok1), (_, t2, ok2)) =>
      (n, math.min(t1, t2), ok1 && ok2)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a query that throws must not masquerade as a timing: its name goes to
    // "failed" so a broken query is visible in the bench artifact
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // end-of-run calibration: drift ACROSS the run (suite load, VM
    // neighbors) shows up as calib_end_s diverging from calib_s
    val calibEnd = {
      def once(): Double = {
        val t0 = System.nanoTime(); calibShuffle(); (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$failed,"runs":2,"sf":"$sfDir","calib_s":$calib,""" +
        // calibration methodology stamp — FROZEN since round 17 (one
        // untimed warm-up, then min-of-5 timed): cross-round calib_s
        // values are comparable iff this field matches. calib_basket
        // (round 20) adds the scan- and cpu-bound shapes, same
        // warmup+min5 discipline per shape.
        s""""calib_method":"warmup+min5",""" +
        s""""calib_runs":${calibRuns.map(c => f"$c%.3f").mkString("[", ",", "]")},""" +
        f""""calib_basket":{"shuffle":$calib%.4f,"scan":$calibScanS%.4f,""" +
        f""""cpu":$calibCpuS%.4f},""" +
        s""""calib_end_s":$calibEnd,""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadavg"}"""
    println(line)
    // Artifact hygiene: the one stdout line has been lost to pipe
    // truncation under VM load before, and bench numbers without load
    // context are uninterpretable — so ALWAYS persist the full per-query
    // JSON plus /proc/loadavg next to the repo (BENCH_full_last.json),
    // where a round snapshot commits it alongside the driver's artifact.
    if (only.isEmpty) try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_full_last.json"),
        s"""{"bench":$line,"loadavg":"$loadavg","nQueries":${results.size}}""" + "\n")
    } catch { case _: Throwable => () } // never fail the bench over the artifact
    // CROSS-ROUND NORMALIZATION (round-18 verdict #8, rebuilt round 20):
    // the ±10% VM noise band cost two judges adjudication time — emit the
    // comparison mechanically instead of hand-computing it in ROUND_NOTES.
    // Against the newest committed BENCH_r{N}_full.json (or the round
    // named by SPARK_GRAFT_BENCH_BASE): per-query ratios, their median
    // (raw AND calib-adjusted), and the movers.
    //
    // Hard lessons encoded here:
    //  * A mover must be a RAW mover — calibration may only EXCUSE a raw
    //    regression (VM got slower), never manufacture one (the r20 norm
    //    artifact reported 75 phantom movers from a calibrator swing while
    //    the raw median sat at 1.007).
    //  * The adjustment factor is the MEDIAN of the basket shapes' ratios
    //    when both captures carry the basket; if the shapes disagree
    //    beyond the ±10% noise band (spread > 1.15), or the factor
    //    contradicts the raw workload median by > 1.25× (300+ queries are
    //    a better common-mode estimator than any calibrator), the
    //    artifact sets calib_unstable and REFUSES to adjust.
    //  * Queries with non-positive baseline times are skipped (a 0 would
    //    mint Infinity ratios), and the chosen baseline goes to stderr.
    if (only.isEmpty) try {
      val dir = java.nio.file.Paths.get(".")
      val Rx = """BENCH_r(\d+)_full\.json""".r
      val listing = java.nio.file.Files.list(dir)
      val candidates =
        try listing.iterator().asScala
          .flatMap(p => p.getFileName.toString match {
            case Rx(n) => Some((n.toInt, p))
            case _     => None
          }).toSeq.sortBy(-_._1)
        finally listing.close()
      val prior = sys.env.get("SPARK_GRAFT_BENCH_BASE") match {
        case Some(r) => candidates.find(_._1 == r.toInt)
        case None    => candidates.headOption
      }
      prior.foreach { case (baseRound, basePath) =>
        System.err.println(s"[bench] normalizing against $basePath")
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val base = om.readTree(java.nio.file.Files.readString(basePath))
          .get("bench")
        val baseCalib = base.get("calib_s").asDouble()
        val baseBasket = Option(base.get("calib_basket")).map { b =>
          Seq("shuffle" -> b.get("shuffle").asDouble(),
            "scan" -> b.get("scan").asDouble(),
            "cpu" -> b.get("cpu").asDouble())
        }
        val curBasket = Seq("shuffle" -> calib, "scan" -> calibScanS,
          "cpu" -> calibCpuS)
        val baseQ = {
          val it = base.get("queries").fields()
          val m = scala.collection.mutable.Map.empty[String, Double]
          while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue.asDouble() }
          m.toMap
        }
        val curQ = results.collect { case (n, t, true) => (n, t) }.toMap
        def median(xs: Seq[Double]): Double =
          if (xs.isEmpty) Double.NaN
          else xs.sorted.apply(xs.size / 2)
        // adjustment factor: basket median when both sides have it
        // (and every shape time is positive), else the legacy calib_s ratio
        val shapeRatios = baseBasket.map { bb =>
          bb.zip(curBasket).collect {
            case ((_, b), (_, c)) if b > 0 && c > 0 => b / c
          }
        }.getOrElse(Seq.empty)
        val adj =
          if (shapeRatios.size == 3) median(shapeRatios)
          else if (baseCalib > 0 && calib > 0) baseCalib / calib
          else 1.0
        val common = curQ.keySet.intersect(baseQ.keySet).toSeq.sorted
          .filter(q => baseQ(q) > 0)
        if (common.isEmpty)
          // nothing comparable (disjoint query sets / all-zero baseline):
          // a NaN-median artifact would be invalid JSON — say so and skip
          System.err.println(
            s"[bench] no comparable queries vs $basePath — norm skipped")
        else {
        val ratios = common.map(q => (q, curQ(q) / baseQ(q)))
        val rawMedian = median(ratios.map(_._2))
        val basketSpread =
          if (shapeRatios.size == 3) shapeRatios.max / shapeRatios.min
          else Double.NaN
        // unstable ⇒ refuse adjustment: shapes disagree with each other,
        // OR the factor contradicts what the whole workload says about
        // common-mode drift (the 300+-query raw median is the better
        // estimator than ANY calibrator — a correlated basket swing must
        // not be trusted just because the shapes agree among themselves)
        // consistency check (ADVICE r20 medium, sign FIXED): adj is a
        // base/cur ratio while rawMedian is cur/base, so genuine
        // common-mode drift d gives adj = 1/d and rawMedian = d — their
        // LOG-SUM is ~0 when the calibrator and the workload agree. The
        // old `log(adj) - log(rawMedian)` read 2·|log d| under real drift
        // and tripped "unstable" for any drift over ~12%, refusing the
        // adjustment exactly when it was valid. A calibrator-only swing
        // (adj = 2, rawMedian = 1) still reads |log 2| > log 1.25.
        val unstable =
          (shapeRatios.size == 3 && basketSpread > 1.15) ||
            math.abs(math.log(adj) + math.log(rawMedian)) > math.log(1.25)
        val adjEff = if (unstable) 1.0 else adj
        // movers: RAW regression, >1s, and (when adjustment is trusted)
        // still a regression after dividing out common-mode VM drift
        val movers = ratios.filter { case (q, r) =>
          r > 1.25 && curQ(q) > 1.0 && r * adjEff > 1.25 }.sortBy(-_._2)
        def f(d: Double) = f"$d%.4f"
        val moversJson = movers.map { case (q, r) =>
          s"""{"q":"$q","prior_s":${f(baseQ(q))},"cur_s":${f(curQ(q))},""" +
            s""""ratio":${f(r)},"ratio_calib_adj":${f(r * adjEff)}}"""
        }.mkString("[", ",", "]")
        val added = curQ.keySet.diff(baseQ.keySet).toSeq.sorted
          .map("\"" + _ + "\"").mkString("[", ",", "]")
        val removed = baseQ.keySet.diff(curQ.keySet).toSeq.sorted
          .map("\"" + _ + "\"").mkString("[", ",", "]")
        val adjustedField =
          if (unstable) s""""median_ratio_calib_adjusted":null,"""
          else s""""median_ratio_calib_adjusted":${f(rawMedian * adj)},"""
        java.nio.file.Files.writeString(
          // a PINNED baseline (SPARK_GRAFT_BENCH_BASE) writes to a
          // dedicated name: the default r{base+1} naming would clobber a
          // committed historical BENCH_r{N}_norm.json when base is old
          java.nio.file.Paths.get(
            if (sys.env.contains("SPARK_GRAFT_BENCH_BASE"))
              s"BENCH_norm_vs_r${baseRound}_last.json"
            else s"BENCH_r${baseRound + 1}_norm.json"),
          s"""{"base_round":$baseRound,"base_calib_s":${f(baseCalib)},""" +
            s""""calib_s":${f(calib)},"calib_adjust":${f(adj)},""" +
            s""""calib_basket_ratios":${
              shapeRatios.map(f).mkString("[", ",", "]")},""" +
            s""""calib_basket_spread":${
              if (basketSpread.isNaN) "null" else f(basketSpread)},""" +
            s""""calib_unstable":$unstable,""" +
            s""""n_common":${common.size},""" +
            s""""median_ratio":${f(rawMedian)},""" +
            adjustedField +
            s""""movers_raw_gt_1.25x_and_1s":$moversJson,""" +
            s""""added":$added,"removed":$removed}""" + "\n")
        }
      }
    } catch { case _: Throwable => () } // advisory artifact only
    // the scan-calibration parquet is per-run scratch — delete it or
    // repeated bench loops accumulate ~100 MB per run in the temp fs
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val walk = Files.walk(Path.of(calibDir))
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
