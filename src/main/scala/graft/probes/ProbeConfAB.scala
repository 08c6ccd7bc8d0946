package graft.probes

import org.apache.spark.sql.SparkSession

/** One-JVM A/B of a RUNTIME SQL conf across named queries (guide §1:
  * measure first; §3.1: pick the join strategy deliberately). Alternates
  * conf=A / conf=B blocks within the same JVM so JIT/load drift hits both
  * arms equally; reports min per arm.
  *
  * SPARK_GRAFT_AB_CONF=key  SPARK_GRAFT_AB_A=v1  SPARK_GRAFT_AB_B=v2
  * SPARK_GRAFT_ONLY=q_a,q_b  sbt "runMain graft.probes.ProbeConfAB"
  */
object ProbeConfAB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val key = sys.env("SPARK_GRAFT_AB_CONF")
    val va = sys.env("SPARK_GRAFT_AB_A")
    val vb = sys.env("SPARK_GRAFT_AB_B")
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
        case None => println(s"[probeab] $q UNKNOWN")
        case Some(fn) =>
          def once(v: String): Double = {
            spark.conf.set(key, v)
            val t0 = System.nanoTime()
            fn(spark, d).queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }
          once(va); once(vb) // untimed warm-ups, both shapes
          val (as, bs) = (1 to reps).map(_ => (once(va), once(vb))).unzip
          println(f"[probeab] $q%-22s $key A=$va min=${as.min}%.3f " +
            f"B=$vb min=${bs.min}%.3f ratioB/A=${bs.min / as.min}%.3f " +
            f"repsA=${as.map(t => f"$t%.2f").mkString(",")} " +
            f"repsB=${bs.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
