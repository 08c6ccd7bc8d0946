package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only skew probe (round 6): native as-of vs union-window composition
  * on a 90%-hot-key frame — evidence for the O(1)-merge-state claim. Both
  * forms concentrate the hot key in one task; the native merge holds ONE
  * candidate row while the window carry materializes a struct per row and
  * the rank machinery beside it. */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 4M left rows, 90% on key 0; 400k right rows, same skew
    val n = 4000000
    val left = spark.range(n).select(
      when(pmod(col("id"), lit(10)) < 9, 0L).otherwise(pmod(col("id"), lit(1000L))).as("k"),
      (col("id") * 7 % 1000000).as("t"),
      col("id").as("tag"))
      .localCheckpoint()
    val right = spark.range(n / 10).select(
      when(pmod(col("id"), lit(10)) < 9, 0L).otherwise(pmod(col("id"), lit(1000L))).as("k"),
      (col("id") * 13 % 1000000).as("t"),
      col("id").as("payload"))
      .groupBy("k", "t").agg(max("payload").as("payload"))
      .localCheckpoint()

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-22s ${ts.min}%7.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    time("skew_native") {
      ops.NativeAsOf.asOfNative(left, right, "k", "t", leftOuter = false) }
    time("skew_composition") {
      ops.AsOfJoin.asOf(left, right, "k", "t")
        .where(col("__asof_payload").isNotNull) }
    // answer parity on the skewed frame
    val a = ops.NativeAsOf.asOfNative(left, right, "k", "t", leftOuter = false)
      .select(col("tag"), col("asof_payload"))
    val b = ops.AsOfJoin.asOf(left, right, "k", "t")
      .where(col("__asof_payload").isNotNull)
      .select(col("tag"), col("__asof_payload").as("asof_payload"))
    println("[probe] skew diff = " + a.exceptAll(b).count() + " / " + b.exceptAll(a).count())
    spark.stop()
  }
}
