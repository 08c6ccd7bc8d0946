package graft.probes

import org.apache.spark.sql.SparkSession

/** Count Spark jobs (scheduler round-trips) a query submits — the metric
  * the round-21 lazy-pin fusion moves. SPARK_GRAFT_ONLY names queries. */
object ProbeJobs {
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
    val counter = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      })
    val all = graft.SparkEntry.queries
    sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(",").map(_.trim)
      .filter(_.nonEmpty).foreach { q =>
        all.get(q).foreach { fn =>
          fn(spark, d).queryExecution.toRdd.count() // warm-up
          Thread.sleep(200)
          counter.set(0)
          val t0 = System.nanoTime()
          fn(spark, d).queryExecution.toRdd.count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let listener events drain
          println(f"[probe-jobs] $q%-18s jobs=${counter.get}%3d time=$dt%.3f s")
        }
      }
    spark.stop()
  }
}
