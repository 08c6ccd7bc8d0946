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
  * long array [s₀,k₀,s₁,k₁,…] kept sorted best-first and truncated to k
  * pairs. Round 21 (guide §1.2 step 2): `reduce` was a full
  * sort-and-retake per ROW (grouped/boxed/sortWith — ~5 allocations per
  * input row); it is now an O(k) ordered insert that allocates only when
  * the row actually enters the kept set, and `merge` is the linear merge
  * of two sorted buffers. TopKPairsSpec pins equivalence against the old
  * sort-based reference on randomized streams and merge splits.
  */
class TopKPairs(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]]
    with Serializable {

  private def better(s1: Long, k1: Long, s2: Long, k2: Long): Boolean =
    s1 > s2 || (s1 == s2 && k1 < k2)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: (Long, Long)): Array[Long] = {
    val n = buf.length / 2
    var i = 0
    while (i < n && better(buf(2 * i), buf(2 * i + 1), v._1, v._2)) i += 1
    if (i >= k) buf // saturated and worse than every kept pair: no alloc
    else {
      val m = math.min(n + 1, k)
      val out = new Array[Long](m * 2)
      System.arraycopy(buf, 0, out, 0, i * 2)
      out(2 * i) = v._1; out(2 * i + 1) = v._2
      System.arraycopy(buf, i * 2, out, i * 2 + 2, (m - i - 1) * 2)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val na = a.length / 2; val nb = b.length / 2
    val m = math.min(na + nb, k)
    val out = new Array[Long](m * 2)
    var ia = 0; var ib = 0; var o = 0
    while (o < m) {
      val takeA = ib >= nb ||
        (ia < na && better(a(2 * ia), a(2 * ia + 1), b(2 * ib), b(2 * ib + 1)))
      if (takeA) { out(2 * o) = a(2 * ia); out(2 * o + 1) = a(2 * ia + 1); ia += 1 }
      else { out(2 * o) = b(2 * ib); out(2 * o + 1) = b(2 * ib + 1); ib += 1 }
      o += 1
    }
    out
  }

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
