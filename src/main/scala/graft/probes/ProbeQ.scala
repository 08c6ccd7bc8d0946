package graft.probes

import org.apache.spark.sql.SparkSession

/** Generic one-JVM query timer: `SPARK_GRAFT_ONLY=q_a,q_b sbt "runMain
  * graft.probes.ProbeQ"` times each named query min-of-5 (1 untimed
  * warm-up) in a single JVM — the only A/B methodology that survives this
  * VM's load band (ROUND_NOTES; ProbeR20 discipline). Prints every rep.
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()
    val all = graft.SparkEntry.queries
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { q =>
      all.get(q) match {
        case None => println(s"[probeq] $q UNKNOWN")
        case Some(fn) =>
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, d).queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }
          once() // untimed warm-up (codegen/JIT)
          val ts = (1 to reps).map(_ => once())
          println(f"[probeq] $q%-22s min=${ts.min}%.3f " +
            f"reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
