package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (excluded from queries): A/B the span-dedup trio's
  * shared-gram detection in ONE JVM (round-17 verdict #7).
  *
  *  A (baseline)  gram groupBy→countDistinct(doc_id)>1 then a second
  *                pos⋈shared join on gram — 2 logical passes over the
  *                positional grams (exchange reuse may share the
  *                physical shuffle).
  *  B (window)    ONE pass: `min(doc_id) over (partition by gram)` ≠
  *                `max(...)` IS "appears in ≥2 docs" — no join, no
  *                second aggregate; the gram shuffle happens exactly
  *                once and the dup flag rides on the same rows.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProbeR17"
  */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 5
    def grams: org.apache.spark.sql.Column = expr(
      s"CASE WHEN size(split(text, ' ')) >= $k THEN " +
        s"transform(sequence(1, size(split(text, ' ')) - ${k - 1}), " +
        s"i -> array_join(slice(split(text, ' '), i, $k), ' ')) " +
        s"ELSE slice(split(text, ' '), 1, 0) END")
    def pos: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), posexplode(grams))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        graft.functions.Hashing.hexHash(col("col")).as("gram"))

    def ngramsA: DataFrame = {
      val p = pos
      val shared = p.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") > 1).select(col("gram"), lit(1L).as("dup"))
      p.join(shared, Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_ngrams"),
          sum(when(col("dup").isNotNull, 1L).otherwise(0L)).as("n_dup_pos"),
          countDistinct(when(col("dup").isNotNull, col("gram")))
            .as("n_dup_distinct"))
    }
    def ngramsB: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("gram")
      val flagged = pos.withColumn("dup",
        min(col("doc_id")).over(w) =!= max(col("doc_id")).over(w))
      flagged.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_ngrams"),
          sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_pos"),
          countDistinct(when(col("dup"), col("gram"))).as("n_dup_distinct"))
    }
    def spansFrom(dupPos: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val prevMaxEnd = max(col("e"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      val flagged = dupPos
        .withColumn("is_new",
          when(prevMaxEnd.isNull || col("pos") > prevMaxEnd + 1, 1L)
            .otherwise(0L))
        .withColumn("island",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      flagged.groupBy(col("doc_id"), col("island"))
        .agg(min(col("pos")).as("s"), max(col("e")).as("e2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("e2") - col("s") + 1).as("covered_tokens"),
          max(col("e2") - col("s") + 1).as("max_span"))
    }
    def spansA: DataFrame = {
      val p = pos
      val shared = p.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") > 1).select("gram")
      spansFrom(p.join(shared, Seq("gram"))
        .select(col("doc_id"), col("pos"), (col("pos") + k - 1).as("e")))
    }
    def spansB: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("gram")
      spansFrom(pos
        .withColumn("dup",
          min(col("doc_id")).over(w) =!= max(col("doc_id")).over(w))
        .where(col("dup"))
        .select(col("doc_id"), col("pos"), (col("pos") + k - 1).as("e")))
    }

    def time(tag: String, f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag min=${ts.min}%.2f " +
        f"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def exchanges(tag: String, f: DataFrame): Unit = {
      val p = f.queryExecution.executedPlan.toString
      println(s"[probe] $tag exchanges=" +
        s"${"(?m)^\\s*\\+?- Exchange".r.findAllIn(p).size} " +
        s"reused=${"ReusedExchange".r.findAllIn(p).size}")
    }
    // equality first: both variants must agree exactly
    val a = ngramsA.orderBy("doc_id").collect().toSeq
    val b = ngramsB.orderBy("doc_id").collect().toSeq
    println(s"[probe] ngrams A==B: ${a == b} (${a.size} rows)")
    val sa = spansA.orderBy("doc_id").collect().toSeq
    val sb = spansB.orderBy("doc_id").collect().toSeq
    println(s"[probe] spans  A==B: ${sa == sb} (${sa.size} rows)")
    exchanges("ngramsA", ngramsA)
    exchanges("ngramsB", ngramsB)
    exchanges("spansA", spansA)
    exchanges("spansB", spansB)
    time("warm(ngramsA)", ngramsA)
    time("ngramsA", ngramsA)
    time("ngramsB", ngramsB)
    time("ngramsA2", ngramsA)
    time("ngramsB2", ngramsB)
    time("spansA", spansA)
    time("spansB", spansB)
    time("spansA2", spansA)
    time("spansB2", spansB)
    spark.stop()
  }
}
