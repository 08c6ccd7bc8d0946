package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Exact money sum as a typed `Aggregator` registered through the PUBLIC
  * udaf() API — the user-facing custom-aggregate surface (vs
  * [[graft.plans.JsonBagAgg]], which is the internal
  * TypedImperativeAggregate surface; the engine exercises both).
  *
  * Same numeric contract as [[Money]]: each value becomes exact integer
  * CENTS (BigDecimal HALF_UP — ties away from zero, Spark round()'s rule),
  * the buffer is one primitive long (mergeable, order-free, overflow-safe
  * to ~9e16 cents), and the double appears only at finish — one division
  * of an exact integer. Matches the DuckDB form
  * `CAST(sum(CAST(round(v*100) AS BIGINT)) AS DOUBLE) / 100.0`.
  */
object CentsSum extends Aggregator[Double, Long, Double] {

  override def zero: Long = 0L

  override def reduce(buf: Long, v: Double): Long =
    buf + java.math.BigDecimal.valueOf(v * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  override def merge(a: Long, b: Long): Long = a + b

  override def finish(cents: Long): Double = cents / 100.0

  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  def register(spark: SparkSession): Unit =
    spark.udf.register("cents_sum", org.apache.spark.sql.functions.udaf(CentsSum))

  /** DuckDB spelling of the same aggregation. */
  def sql(v: String): String =
    s"CAST(sum(CAST(round(($v)*100) AS BIGINT)) AS DOUBLE) / 100.0"
}
