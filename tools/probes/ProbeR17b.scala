package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B q_winnow_pairs' pair generation.
  *  A (baseline)  df-filter via agg+join, then a posting self-join on fp
  *                — the winnow chain (explode + per-doc window) feeds
  *                the plan up to 4x.
  *  B (bucketed)  ONE winnow pass: collect each fp's doc bucket
  *                (df <= 50 cap bounds it), expand the pairs with array
  *                HOFs, aggregate — the bucketed-candidate discipline
  *                the minhash/ANN paths already use.
  */
object ProbeR17b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.testdata") = sfDir
    def sel: DataFrame = graft.operators.Dedup
      .queries("q_winnow")(spark, sfDir)
      .select(col("doc_id"), col("fp")).distinct()
    val cap = 50
    val minShared = 3
    def pairsA: DataFrame = {
      val s0 = sel
      val keep = s0.groupBy(col("fp"))
        .agg(count(lit(1)).as("df"))
        .where(col("df") >= 2 && col("df") <= cap)
        .select("fp")
      val posting = s0.join(keep, Seq("fp"))
      posting.as("a").join(posting.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .orderBy("doc_a", "doc_b")
    }
    def pairsB: DataFrame = {
      sel.groupBy(col("fp"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .where(size(col("ds")).between(2, cap))
        .select(explode(expr(
          """flatten(transform(sequence(0, size(ds) - 2),
            |  i -> transform(slice(ds, i + 2, size(ds) - i - 1),
            |    b -> struct(ds[i] AS doc_a, b AS doc_b))))""".stripMargin))
          .as("p"))
        .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .orderBy("doc_a", "doc_b")
    }
    val a = pairsA.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = pairsB.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    println(s"[probe] winnowPairs A==B: ${a == b} (${a.size} rows)")
    def time(tag: String, f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag min=${ts.min}%.2f " +
        f"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def pairsC: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val wfp = Window.partitionBy("fp")
      sel.withColumn("df", count(lit(1)).over(wfp))
        .where(col("df").between(2, cap))
        .groupBy(col("fp"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .select(explode(expr(
          """flatten(transform(sequence(0, size(ds) - 2),
            |  i -> transform(slice(ds, i + 2, size(ds) - i - 1),
            |    b -> struct(ds[i] AS doc_a, b AS doc_b))))""".stripMargin))
          .as("p"))
        .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .orderBy("doc_a", "doc_b")
    }
    val c = pairsC.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    println(s"[probe] winnowPairs A==C: ${a == c} (${c.size} rows)")
    time("warm", pairsA)
    time("pairsA", pairsA)
    time("pairsB", pairsB)
    time("pairsC", pairsC)
    time("pairsA2", pairsA)
    time("pairsB2", pairsB)
    time("pairsC2", pairsC)
    spark.stop()
  }
}
