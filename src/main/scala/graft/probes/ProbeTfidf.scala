package graft.probes

import org.apache.spark.sql.SparkSession

/** Round-21 probe for round-20 verdict "What's wrong #1": q_tfidf_pairs
  * moved 1.45x in r20's quiet capture with no code change (and
  * q_sql_q21/q5/q8 sat at 1.25-1.33x). The ProbeR20 discipline: 8-rep
  * blocks in ONE JVM (drift visible inside the block), runnable
  * unchanged on two commits back-to-back (git worktree) for the
  * cross-commit arm. Prints every rep so variance is data, not argument.
  */
object ProbeTfidf {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()
    val all = graft.SparkEntry.queries
    val qs = Seq("q_tfidf_pairs", "q_sql_q21", "q_sql_q5", "q_sql_q8")
    qs.foreach { q =>
      val reps = (1 to 8).map { _ =>
        val t0 = System.nanoTime()
        all(q)(spark, d).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val load = try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ")(0)
      catch { case _: Throwable => "?" }
      println(f"[probe] tfidf:$q%-14s min=${reps.min}%.3f med=${reps.sorted.apply(4)}%.3f " +
        f"max=${reps.max}%.3f load=$load reps=${reps.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
