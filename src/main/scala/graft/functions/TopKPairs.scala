package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed `Aggregator` — the AGGREGATION form
  * of "top 3 per group".
  *
  * The window form (`row_number() OVER (PARTITION BY … ORDER BY …) <= k`,
  * q_window_top) shuffles EVERY row of the group to one task and sorts it;
  * this aggregator form is mergeable, so Spark runs it as a partial+final
  * hash aggregate: each map task reduces its slice of a group to ≤ k pairs
  * BEFORE the exchange, and the shuffle carries at most k·partitions rows
  * per group instead of the group's full row count. At 100 TB with hot keys
  * (one customer with 10⁸ orders), that is the difference between a skewed
  * sort and a balanced pre-aggregation — same answer, aggregation physics.
  *
  * Ordering is the exact total order (score DESC, key ASC) on integer
  * scores (callers pass exact cents — see [[Money.cents]]), so ties are
  * deterministic and the result is oracle-checkable. The buffer is a packed
  * long array [s₀,k₀,s₁,k₁,…] kept sorted and truncated to k pairs; merge
  * is an O(k log k) re-sort of ≤ 2k pairs (k is small by contract — a
  * production binary-merge would change constants, not semantics).
  */
class TopKPairs(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]]
    with Serializable {

  private def better(s1: Long, k1: Long, s2: Long, k2: Long): Boolean =
    s1 > s2 || (s1 == s2 && k1 < k2)

  private def keep(pairs: Array[Long]): Array[Long] = {
    val sorted = pairs.grouped(2).toArray
      .sortWith((p, q) => better(p(0), p(1), q(0), q(1)))
    sorted.take(k).flatten
  }

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: (Long, Long)): Array[Long] =
    keep(buf :+ v._1 :+ v._2)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    keep(a ++ b)

  override def finish(buf: Array[Long]): Seq[(Long, Long)] =
    buf.grouped(2).map(p => (p(0), p(1))).toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKPairs {
  /** The udaf()-wrapped column function: `topK(3)(scoreCents, key)` →
    * array<struct<_1: score, _2: key>> of the group's top k. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKPairs(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
