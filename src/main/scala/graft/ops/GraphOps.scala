package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Iterative graph analytics on the relational data: PageRank over the
  * customer↔supplier bipartite trade graph. Complements
  * [[graft.operators.Dedup.dupClusters]] (the other iterative algorithm)
  * with the other classic join-per-superstep shape: per iteration ONE
  * edge⋈rank hash join + ONE hash aggregation — exactly a Pregel
  * superstep expressed relationally, with no driver-side per-node state.
  *
  * Scale notes: the edge list shuffles once on src at build time and is
  * localCheckpoint-pinned (lineage truncation — each iteration re-reads
  * a materialized frame instead of growing a plan DAG); ranks are
  * node-sized, so at 100 TB of edges the join partitions by src and AQE
  * handles the power-law skew (or pre-salt the hubs — see
  * [[graft.operators.ScaleTools.saltedJoin]]).
  *
  * Cross-engine determinism: ranks are FIXED-POINT longs (1e6 = rank 1.0).
  * Per-edge contribution is integer floor division rank÷deg, the damping
  * step is (85·Σ)÷100 in integers, and the Σ is an order-free long sum —
  * no float enters the loop, so three unrolled iterations are exactly
  * reproducible in the oracle's CTE chain (all values positive: Spark
  * `div` truncation ≡ DuckDB `//` floor). Dangling nodes can't exist
  * (every node on a lineitem has both directions of its edge).
  */
object GraphOps {

  val PrIters = 3
  val PrScale = 1000000L

  def pageRank(spark: SparkSession, d: String): DataFrame = {
    // bipartite nodes share one id space: custkey → 2k, suppkey → 2k+1
    // pinned at the NARROWEST point (probed: 2.1 s vs 3.0 s for pinning the
    // doubled edge list): the distinct pair set is half the rows of the
    // bidirectional edges, and deriving edges from it per superstep is a
    // pinned scan + union + broadcast join — cheaper than materializing
    // edges⋈deg once. deg is pinned too: it feeds the edge build AND the
    // initial ranks (exchange reuse does not fire across fan-out branches)
    val pairs = orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
      .localCheckpoint()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val edgesD = edges.join(broadcast(deg), Seq("src"))
    val init = deg.select(col("src").as("node"), lit(PrScale).as("rank"))
    // ranks are node-sized (≪ edges); broadcast them explicitly rather than
    // relying on AQE's runtime demotion — on a billion-node graph drop this
    // hint and let the src-partitioned shuffle join carry the supersteps
    val fin = (1 to PrIters).foldLeft(init) { (ranks, _) =>
      edgesD.join(broadcast(ranks), edgesD("src") === ranks("node"))
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_sum"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * in_sum) div 100")).as("rank"))
    }
    fin.select(col("node"), (col("node") % 2).as("is_supplier"), col("rank"))
      .orderBy("node")
  }

  val pageRankSql: String = {
    val iter = (1 to PrIters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         150000 + (85 * CAST(sum(r.rank // e.deg) AS BIGINT)) // 100 AS rank
         |  FROM edges e JOIN $prev r ON e.src = r.node
         |  GROUP BY e.dst
         |)"""
    }.mkString(",\n")
    s"""WITH pairs AS (
      |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |), both_dirs AS (
      |  SELECT c AS src, s AS dst FROM pairs
      |  UNION ALL
      |  SELECT s AS src, c AS dst FROM pairs
      |), deg AS (
      |  SELECT src, count(*) AS deg FROM both_dirs GROUP BY src
      |), edges AS (
      |  SELECT b.src, b.dst, d.deg FROM both_dirs b JOIN deg d ON b.src = d.src
      |), r0 AS (
      |  SELECT src AS node, CAST($PrScale AS BIGINT) AS rank FROM deg
      |),
      |$iter
      |SELECT node, node % 2 AS is_supplier, CAST(rank AS BIGINT) AS rank
      |FROM r$PrIters
      |ORDER BY node""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (pageRank _))

  val oracles: Map[String, String] = Map(
    "q_pagerank" -> pageRankSql)
}
