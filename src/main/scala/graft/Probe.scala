package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage probe: time sub-plans of a query to find where the cost
  * is before optimizing (round-2 lesson: the slow stage is rarely the one
  * you'd guess — measure first). Not part of the library surface.
  *
  * Round-4 target: q_tfidf_pairs checkpoint placement. Variants A/B'd in
  * ONE JVM (VM noise invariant — never compare across runs). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
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

    import org.apache.spark.sql.expressions.Window
    def tfidfVariant(pin: DataFrame => DataFrame): DataFrame = {
      val docs = Tables.documents(spark, d)
        .where(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
      val tf = pin(docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
      val nDocs = tf.select(countDistinct(col("doc_id")).as("n_docs"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .select(col("term"),
          floor(log(col("n_docs").cast("double") / col("df").cast("double")) * 1000)
            .cast("long").as("idf_q"))
      val w = pin(tf.join(broadcast(df), Seq("term"))
        .select(col("doc_id"), col("term"), (col("tf") * col("idf_q")).as("w")))
      val norms = w.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("norm2"))
      val dots = w.select(col("doc_id").as("doc_a"), col("term"), col("w").as("wa"))
        .join(w.select(col("doc_id").as("doc_b"), col("term"), col("w").as("wb")), Seq("term"))
        .where(col("doc_a") =!= col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(sum(col("wa") * col("wb")).as("dot"))
      val rankW = Window.partitionBy(col("doc_a")).orderBy(col("cos_q").desc, col("doc_b"))
      dots
        .join(broadcast(norms.select(col("doc_id").as("doc_a"), col("norm2").as("na"))), "doc_a")
        .join(broadcast(norms.select(col("doc_id").as("doc_b"), col("norm2").as("nb"))), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          floor(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))) *
            1000000).cast("long").as("cos_q"))
        .withColumn("rnk", row_number().over(rankW).cast("long"))
        .where(col("rnk") <= 3)
        .orderBy("doc_a", "rnk")
    }

    time("tfidf:current(ckpt32)") { operators.TextAnalysis.tfidfPairs(spark, d) }
    time("tfidf:coalesce4_ckpt") { tfidfVariant(df => df.coalesce(4).localCheckpoint()) }
    time("tfidf:no_pin") { tfidfVariant(identity) }
    time("tfidf:current#2") { operators.TextAnalysis.tfidfPairs(spark, d) }
    spark.stop()
  }
}
