package graft.ops

import graft.SparkSpec

/** Semantic invariants for the iterative graph analytics at sf0.001. */
class GraphOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("pagerank conserves rank mass up to integer floor loss and favors hub suppliers") {
    val rows = GraphOps.pageRank(spark, d).collect()
    val n = rows.length.toLong
    assert(n > 0)
    val total = rows.map(_.getAs[Long]("rank")).sum
    // each iteration floors once per edge contribution and once per node:
    // the loss is < (E + n) per iteration, tiny against n·1e6 mass
    assert(total <= n * GraphOps.PrScale)
    assert(total > (n * GraphOps.PrScale * 9) / 10,
      s"rank mass $total collapsed vs ${n * GraphOps.PrScale}")
    // bipartite structure: few suppliers serve many customers, so the
    // random walk concentrates on the supplier side
    val (supp, cust) = rows.partition(_.getAs[Long]("is_supplier") == 1L)
    assert(supp.nonEmpty && cust.nonEmpty)
    val avgS = supp.map(_.getAs[Long]("rank")).sum / supp.length
    val avgC = cust.map(_.getAs[Long]("rank")).sum / cust.length
    assert(avgS > avgC, s"supplier avg $avgS must exceed customer avg $avgC")
    rows.foreach(r => assert(r.getAs[Long]("rank") >= 150000L,
      "teleport term lower-bounds every rank"))
  }
}
