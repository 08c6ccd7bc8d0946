package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Typed Dataset API surface: case-class encoders, groupByKey, and the
  * COGROUP operator — the per-key two-sided merge with arbitrary Scala
  * logic that `applyInPandas`-style users reach for when a join + agg
  * can't express the merge. Here the logic IS expressible relationally
  * (deliberately — that's what makes it oracle-checkable), so the query
  * doubles as a differential test of the typed path against the
  * Catalyst-planned SQL form.
  *
  * Scale: cogroup plans as one CoGroup exec over the two inputs
  * hash-partitioned and sorted on the key — exactly one shuffle per side,
  * the same movement a shuffle join would do, with O(group) memory per
  * key. Sums accumulate in exact integer cents inside the group function,
  * so iteration order (which Spark does not guarantee) cannot perturb the
  * result.
  */
case class OrderSide(o_orderkey: Long, o_orderstatus: String, o_totalprice: Double)
case class LineSide(l_orderkey: Long, l_quantity: Double, l_extendedprice: Double)
case class OrderMerge(orderkey: Long, status: String, n_lines: Long,
    sum_qty: Long, lines_total_cents: Long, delta_cents: Long)

object TypedOps {

  /** Per-order reconciliation via typed cogroup: line count, quantity sum,
    * line revenue in cents, and the gap between the order header total and
    * the sum of its lines. Orders with no lines keep a zero row (the right
    * iterator is just empty); orphan lines can't exist in this schema. */
  def cogroupOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val os = orders(spark, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[OrderSide]
    val ls = lineitem(spark, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .as[LineSide]
    os.groupByKey(_.o_orderkey)
      .cogroup(ls.groupByKey(_.l_orderkey)) { (k, as, bs) =>
        val aOpt = as.toList.headOption
        aOpt match {
          case None => Iterator.empty
          case Some(a) =>
            var n = 0L; var q = 0L; var tot = 0L
            bs.foreach { b =>
              n += 1L
              q += math.round(b.l_quantity)
              tot += math.round(b.l_extendedprice * 100)
            }
            Iterator(OrderMerge(k, a.o_orderstatus, n, q, tot,
              math.round(a.o_totalprice * 100) - tot))
        }
      }
      .toDF()
      .orderBy("orderkey")
  }

  val cogroupOrdersSql: String =
    """SELECT o.o_orderkey AS orderkey, o.o_orderstatus AS status,
      |       CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
      |       CAST(COALESCE(sum(CAST(round(l.l_quantity) AS BIGINT)), 0) AS BIGINT)
      |         AS sum_qty,
      |       CAST(COALESCE(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
      |            AS BIGINT) AS lines_total_cents,
      |       CAST(round(o.o_totalprice * 100) AS BIGINT)
      |         - CAST(COALESCE(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
      |                AS BIGINT) AS delta_cents
      |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY o.o_orderkey, o.o_orderstatus, o.o_totalprice
      |ORDER BY orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cogroup" -> (cogroupOrders _))

  val oracles: Map[String, String] = Map(
    "q_cogroup" -> cogroupOrdersSql)
}
