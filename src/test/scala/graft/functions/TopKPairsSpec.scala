package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val agg = new TopKPairs(k)

  private def brute(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pairs.sortBy { case (s, key) => (-s, key) }.take(k)

  test("reduce/merge/finish equal the brute-force top-k under any split") {
    val rng = new scala.util.Random(42)
    val data = Seq.fill(50)((rng.nextInt(10).toLong, rng.nextInt(1000).toLong))
    // fold in shuffled orders and at arbitrary split points — the
    // mergeability contract a partial+final hash agg relies on
    (0 until 5).foreach { i =>
      val perm = new scala.util.Random(i).shuffle(data)
      val split = (i * 7) % data.size
      val (l, r) = perm.splitAt(split)
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufL, bufR)) === brute(data))
    }
  }

  test("ordered-insert buffers equal brute force on large streams with dup pairs") {
    // round-21: reduce/merge rewritten as O(k) insert / linear merge —
    // stress the invariant (sorted best-first, ≤ k pairs) on bigger data
    // including exact-duplicate (score,key) pairs and many split points
    val rng = new scala.util.Random(7)
    val data = Seq.fill(500)((rng.nextInt(20).toLong, rng.nextInt(10).toLong))
    (0 until 20).foreach { i =>
      val perm = new scala.util.Random(100 + i).shuffle(data)
      val (l, r) = perm.splitAt(rng.nextInt(data.size + 1))
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufL, bufR)) === brute(data))
      assert(agg.finish(agg.merge(bufR, bufL)) === brute(data))
    }
  }

  test("ties on score break by ascending key, deterministically") {
    val data = Seq((5L, 30L), (5L, 10L), (5L, 20L), (4L, 1L))
    assert(agg.finish(data.foldLeft(agg.zero)(agg.reduce)) ===
      Seq((5L, 10L), (5L, 20L), (5L, 30L)))
  }

  test("groups smaller than k emit all their pairs") {
    assert(agg.finish(agg.reduce(agg.zero, (7L, 2L))) === Seq((7L, 2L)))
    assert(agg.finish(agg.zero) === Seq.empty)
  }

  test("q_topk_agg matches the window row_number form on real data") {
    val d = "/root/testdata/sf0.001"
    val viaAgg = graft.ops.ScalarOps.queries("q_topk_agg")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(Money.cents(col("o_totalprice")).desc, col("o_orderkey"))
    val viaWindow = graft.Tables.orders(spark, d)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"))
      .orderBy("o_custkey", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaAgg === viaWindow)
  }

  test("the aggregate plan is a partial+final HashAggregate, not a sort") {
    val d = "/root/testdata/sf0.001"
    val plan = graft.Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(TopKPairs.topK(k)(Money.cents(col("o_totalprice")),
        col("o_orderkey")).as("tk"))
      .queryExecution.executedPlan.toString
    // two aggregation levels around one exchange; no window/sort operator
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"))
  }
}
