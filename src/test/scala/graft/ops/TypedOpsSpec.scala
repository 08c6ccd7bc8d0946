package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Typed cogroup semantics + plan shape at sf0.001 (exact values are
  * DuckDB-oracle-checked at sf0.01). */
class TypedOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("cogroup reconciliation matches the relational restatement row for row") {
    val typed = TypedOps.cogroupOrders(spark, d).collect()
    val relational = spark.read.parquet(s"$d/orders.parquet")
      .join(spark.read.parquet(s"$d/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderkey").as("orderkey"),
        col("o_orderstatus").as("status"), col("o_totalprice"))
      .agg(count(col("l_orderkey")).as("n_lines"),
        coalesce(sum(round(col("l_quantity")).cast("long")), lit(0L)).as("sum_qty"),
        coalesce(sum(round(col("l_extendedprice") * 100).cast("long")), lit(0L))
          .as("lines_total_cents"))
      .select(col("orderkey"), col("status"), col("n_lines"), col("sum_qty"),
        col("lines_total_cents"),
        (round(col("o_totalprice") * 100).cast("long") - col("lines_total_cents"))
          .as("delta_cents"))
      .orderBy("orderkey").collect()
    assert(typed.length === relational.length)
    typed.zip(relational).foreach { case (t, r) => assert(t === r) }
  }

  test("cogroup plans as one CoGroup exec with one shuffle per side") {
    val p = TypedOps.cogroupOrders(spark, d).queryExecution.executedPlan.toString
    assert(p.contains("CoGroup"))
    // one hash exchange per cogrouped side; the only other movement is the
    // presentation sort's range exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2)
    assert("Exchange rangepartitioning".r.findAllIn(p).length === 1)
  }
}
