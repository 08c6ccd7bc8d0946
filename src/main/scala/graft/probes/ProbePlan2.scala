package graft.probes

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the EXECUTED (AQE-final) plans of the shared graph bases. */
object ProbePlan2 {
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
    import graft.Tables._
    val pairs = orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.queryExecution.toRdd.count()
    println("=== pairs build (executed) ===")
    println(pairs.queryExecution.executedPlan.toString.take(4000))
    val su = lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s")).distinct()
    val pw = su.as("a").join(su.as("b"),
        col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
      .agg(count(lit(1)).as("w"))
    pw.queryExecution.toRdd.count()
    println("=== pair-weights (executed) ===")
    println(pw.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
