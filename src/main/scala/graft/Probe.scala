package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage probe: time sub-plans of a query to find where the cost
  * is before optimizing (round-2 lesson: the slow stage is rarely the one
  * you'd guess — measure first). Not part of the library surface.
  *
  * Round-6 targets: native as-of join vs the union-window composition, and
  * the row_number()=1 dedup rewrite vs the window plan (toggled via
  * `spark.sql.optimizer.excludedRules`). Measured at sf0.1 (min of 3):
  * native inner as-of 0.79 s vs 2.96 s composition (3.7×), native left
  * 0.74 s vs 0.89 s; dedup rewrite 0.28 s vs 0.33 s windowed (~13% here —
  * the structural win, no sort either side of the exchange, grows with row
  * width and group skew).
  *
  * Round-7 target: heavy hitters sketch+recount vs naive full groupBy.
  * Local result INVERTS (naive 0.34 s beats sketch 0.60 s): a single-JVM
  * shuffle is a memory copy, so the sketch's avoided network shuffle
  * can't show locally while its second scan does. Kept because the
  * shuffle-bytes asymmetry (full corpus vs kilobytes) is what survives a
  * 1000-executor network; the probe documents the local inversion so
  * nobody "fixes" it backwards. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${ts.min}%8.3f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    time("asof:composition") { ops.AsOfJoin.eventToLastSignup(spark, d) }
    time("asof:native")      { ops.NativeAsOf.eventToLastSignupNative(spark, d) }
    time("asof:comp_left")   { ops.AsOfJoin.eventToLastSignupLeft(spark, d) }
    time("asof:native_left") { ops.NativeAsOf.eventToLastSignupNativeLeft(spark, d) }

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    def dedupDF(s: SparkSession) = {
      val e = Tables.events(s, d)
      e.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("user_id", "event_id", "event_type")
    }
    time("dedup:rewrite_on") { dedupDF(spark) }
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RowNumberDedupRule")
    time("dedup:rewrite_off") { dedupDF(spark) }
    spark.conf.unset("spark.sql.optimizer.excludedRules")

    // round-7: heavy hitters — MG-candidates+recount vs naive full groupBy.
    // The naive form shuffles EVERY token; the sketch form shuffles only
    // candidates. Same exact answer (OperatorsSpec proves it).
    time("hh:sketch_recount") { operators.TextAnalysis.heavyHitters(spark, d) }
    time("hh:naive_groupby") {
      val tokens = Tables.documents(spark, d)
        .select(explode(split(col("text"), " ")).as("token"))
      val n = tokens.count()
      tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * operators.TextAnalysis.HhK > lit(n))
        .orderBy("token")
    }

    // round-8: bounded-heap top-k per group vs the row_number window form.
    // The heap agg ships k rows per partition through the shuffle and never
    // sorts; the window form shuffles and sorts every group's full row set.
    // Measured at sf0.1 (min of 3): 0.58 s vs 0.54 s — parity, for the
    // same reason as the heavy-hitter probe: ~17-row groups and memory-copy
    // local shuffles hide the k-vs-group-size shuffle-byte asymmetry that
    // pays on a real network (and grows with group size and skew).
    time("topk:heap_agg") { ops.AnalyticOps.topkAgg(spark, d) }
    time("topk:window") {
      import org.apache.spark.sql.expressions.Window
      val w2 = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(spark, d)
        .withColumn("rk", row_number().over(w2).cast("long"))
        .where(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rk")
    }

    // round-8: state-store footprint of the chained stateful pipeline
    // (stream-stream interval join → day-window agg) at bench scale — the
    // per-operator rows/bytes that size executor memory for the streaming
    // family. Single-batch pass over the whole events file: this is the
    // WORST CASE for join state (nothing evicted below the watermark yet),
    // i.e. the peak a 1-day-delay deployment must provision for.
    // round-9 extension: the SAME pipeline under both state backends —
    // HDFS-backed (executor heap) vs RocksDB (off-heap/on-disk, the
    // backend that survives 100 TB state). Same rows, different memory
    // accounting: RocksDB's memoryUsedBytes reports block-cache+memtable,
    // and its state lives outside the JVM heap, which is the point.
    {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProvider = spark.conf.getOption(providerKey)
      def run(tag: String, provider: Option[String]): Unit = {
        provider match {
          case Some(p) => spark.conf.set(providerKey, p)
          case None    => spark.conf.unset(providerKey)
        }
        def src() = streaming.EventStream.srcEvents(spark, d)
        val views = src().where(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
          .withWatermark("view_ts", "1 day")
        val purchases = src().where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
          .withWatermark("p_ts", "1 day")
        val agg = views.join(purchases,
            col("v_user") === col("p_user") &&
              col("p_ts") > col("view_ts") &&
              col("p_ts") <= col("view_ts") + expr("interval 1 hour"))
          .groupBy(window(col("p_ts"), "1 day"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        val t0 = System.nanoTime()
        val q = agg.writeStream.outputMode("append")
          .format("memory").queryName(s"probe_state_$tag").start()
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        q.recentProgress.flatMap(p => Option(p.stateOperators)).flatten
          .filter(_.numRowsTotal > 0)
          .foreach { so =>
            println(f"[probe] state[$tag]:${so.operatorName}%-28s rows=${so.numRowsTotal}%9d mem=${so.memoryUsedBytes / 1024 / 1024}%5d MiB")
          }
        println(f"[probe] state[$tag]:join_agg_pipeline_wall $secs%8.3f s")
        q.stop()
      }
      run("hdfs", None)
      run("rocksdb", Some(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    spark.stop()
  }
}
