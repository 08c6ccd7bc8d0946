package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Money

/** Relational parity operators — SURVEY §2.3/§2.4/§2.5/§2.7/§2.8 plus the
  * window-ranking extension (§2.6, README.md:28 wish list).
  *
  * Scale notes are per-query Scaladoc; the common theme: joins against
  * dimension tables are broadcast (no shuffle of the fact side), fact-fact
  * joins share one shuffle key, and aggregations are partial+final hash aggs.
  */
object RelationalOps {

  /** Exact revenue sum in integer units summed as primitive longs — see
    * [[graft.functions.Money]]: bit-exact across engines like the decimal
    * form, but codegen'd and overflow-safe at cluster scale. */
  private def revenueSum(price: org.apache.spark.sql.Column,
      discount: org.apache.spark.sql.Column) =
    Money.revenueSum(price, discount)

  private val revenueSumSql =
    Money.revenueSumSql("l_extendedprice", "l_discount")

  // --- J1: left outer equi-join, composite 2-column condition -------------
  // Mirror of tracks⋈bagged_artists on (played_at, track_id)
  // (reference: spark_jobs/playback_pipeline.py:278-287). Both conditions are
  // equalities, so Catalyst still plans a hash join on the composite key —
  // no nested-loop regression at scale.
  def joinComposite(spark: SparkSession, d: String): DataFrame = {
    val li = lineitem(spark, d)
    val o  = orders(spark, d)
    li.join(o,
        li("l_orderkey") === o("o_orderkey") &&
          year(li("l_shipdate")) === year(o("o_orderdate")), "left")
      .select(li("l_orderkey"), li("l_linenumber"), li("l_partkey"),
        li("l_shipdate"), o("o_orderdate"), o("o_orderstatus"))
  }

  val joinCompositeSql: String =
    """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_shipdate,
      |       o.o_orderdate, o.o_orderstatus
      |FROM lineitem l
      |LEFT JOIN orders o
      |  ON l.l_orderkey = o.o_orderkey
      | AND year(l.l_shipdate) = year(o.o_orderdate)""".stripMargin

  // --- J2: left anti join (incremental delta load) ------------------------
  // Mirror of delta_load_tracks (reference:
  // spark_jobs/playback_pipeline_curated.py:89-123): keep only rows whose
  // key is NOT already in the "warehouse". The anti-join replaces the
  // reference's collect()-to-driver IN-list — no driver round-trip, shuffles
  // on the join key only (SURVEY §4.3#4).
  def deltaAnti(spark: SparkSession, d: String): DataFrame = {
    val li = lineitem(spark, d)
    val existing = orders(spark, d)
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"))
    li.join(existing, Seq("l_orderkey"), "left_anti")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  }

  val deltaAntiSql: String =
    """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
      |FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_orderkey = l.l_orderkey
      |                    AND o.o_orderstatus = 'F')""".stripMargin

  // --- left semi join (EXISTS) --------------------------------------------
  def semiJoin(spark: SparkSession, d: String): DataFrame = {
    val c = customer(spark, d)
    val open = orders(spark, d).where(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    c.join(open, Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val semiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderstatus = 'O')""".stripMargin

  // --- inner join with explicit broadcast of the dimension side -----------
  // part is a dimension: broadcast it so the lineitem fact side never
  // shuffles — the 100 TB-safe plan (BroadcastHashJoin, fact streamed).
  def joinBroadcastAgg(spark: SparkSession, d: String): DataFrame = {
    val li = lineitem(spark, d)
    val p  = part(spark, d)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  val joinBroadcastAggSql: String =
    s"""SELECT p.p_brand,
      |       $revenueSumSql AS revenue,
      |       sum(l.l_quantity) AS sum_qty,
      |       count(*) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_brand
      |ORDER BY p.p_brand""".stripMargin

  // --- star join: fact → dims, revenue per region (TPC-H Q5 shape) --------
  // nation/region are broadcast (tiny); customer⋈orders⋈lineitem chain
  // shares keys so AQE/Catalyst plans at most two fact shuffles at scale.
  def starJoin(spark: SparkSession, d: String): DataFrame = {
    val li = lineitem(spark, d)
    val o  = orders(spark, d)
    val c  = customer(spark, d)
    val n  = nation(spark, d)
    val r  = region(spark, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  val starJoinSql: String =
    s"""SELECT r.r_name,
      |       $revenueSumSql AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name
      |ORDER BY r.r_name""".stripMargin

  // --- A2: dropDuplicates over all columns --------------------------------
  // (reference: drop_duplicates() ×6, spark_jobs/playback_pipeline.py:107
  // etc.) = group-by-all-columns hash agg; partial agg makes it shuffle-light
  // when duplicates are common.
  def dropDupAll(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .dropDuplicates()

  val dropDupAllSql: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"

  // --- set operations (union / intersect / except) ------------------------
  def unionAll(spark: SparkSession, d: String): DataFrame = {
    val o = orders(spark, d)
    val a = o.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val b = o.where(col("o_orderpriority") === "2-HIGH")
      .select(col("o_orderkey"), col("o_orderpriority"))
    a.union(b)
  }

  val unionAllSql: String =
    """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'""".stripMargin

  def intersectKeys(spark: SparkSession, d: String): DataFrame = {
    val o = orders(spark, d)
    o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
  }

  val intersectKeysSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  def exceptKeys(spark: SparkSession, d: String): DataFrame = {
    val c = customer(spark, d)
    val o = orders(spark, d)
    c.select(col("c_custkey"))
      .except(o.select(col("o_custkey").as("c_custkey")))
  }

  val exceptKeysSql: String =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders""".stripMargin

  // --- window ranking: top-3 orders per customer (README.md:28 extension) --
  def windowTopOrders(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, d)
      .withColumn("rn", row_number().over(w).cast("long")) // DuckDB row_number is int64
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  val windowTopOrdersSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3""".stripMargin

  // --- window running sum per customer ------------------------------------
  // Exact integer cents accumulate in a primitive long inside the frame
  // (per-customer partitions bound the accumulator far below overflow),
  // rounded-double dollars at the boundary: every per-row prefix sum is
  // exact, so engines agree on every row.
  def windowRunning(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, d)
      .withColumn("running_spend",
        Money.centsToDollars(sum(Money.cents(col("o_totalprice"))).over(w)))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("running_spend"))
  }

  val windowRunningSql: String =
    s"""SELECT o_custkey, o_orderkey, o_orderdate,
      |       ${Money.centsToDollarsSql(
             s"""sum(${Money.centsSql("o_totalprice")})
      |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")}
      |         AS running_spend
      |FROM orders""".stripMargin

  // --- window frames: first/last value + ntile -----------------------------
  // Explicit ROWS frames (running-first, forward-last) and equi-depth
  // quartile assignment — one shuffle by customer, shared by all four
  // window expressions (same partitioning + ordering ⇒ one Window exec).
  def windowFrames(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        first(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_price"),
        last(col("o_totalprice"))
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          .as("last_price"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  val windowFramesSql: String = {
    val ord = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    s"""SELECT o_custkey, o_orderkey, o_totalprice,
      |       first_value(o_totalprice) OVER ($ord
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
      |       last_value(o_totalprice) OVER ($ord
      |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_price,
      |       ntile(4) OVER ($ord) AS quartile
      |FROM orders""".stripMargin
  }

  // --- P7: isin filter (pushdown stand-in for the BigQuery IN-list scan) ---
  // (reference: spark_jobs/playback_pipeline_curated.py:103-107). Catalyst
  // pushes the In predicate into the parquet scan (PushedFilters).
  def filterIsin(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))

  val filterIsinSql: String =
    """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin

  // --- O1/O2: global sort + top-k ------------------------------------------
  // --- J2 at 100 TB: bloom-filter-pruned incremental delta -----------------
  // Same EXACT semantics as q_delta_anti (left-anti on the key), different
  // physics: a bloom filter over the existing keys is built once and
  // broadcast, the source is pruned map-side, and only the sliver the filter
  // can't rule out reaches the anti-join shuffle. On a daily-delta workload
  // where most source rows are new, this removes almost the entire source
  // shuffle (see [[graft.operators.ScaleTools.bloomDelta]]). The oracle is
  // the plain NOT-IN form — the filter must never change the answer.
  def bloomDeltaOrders(spark: SparkSession, d: String): DataFrame = {
    val src = orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    val existing = orders(spark, d)
      .where(col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      .select(col("o_orderkey"))
    graft.operators.ScaleTools.bloomDelta(src, "o_orderkey", existing, "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val bloomDeltaOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderkey NOT IN (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1995-07-01')
      |ORDER BY o_orderkey""".stripMargin

  // --- SQL frontend (spark.sql over registered views) -----------------------
  // The engine's other entry surface: the same Catalyst plans reached
  // through SQL text instead of the DataFrame API (the stand-in for the
  // reference's warehouse-SQL path, SURVEY §2.1 S4). TPC-H Q3 shape:
  // segment-filtered customer ⋈ orders ⋈ lineitem, grouped revenue, top 10.
  // The exact-cents aggregation is applied via the DataFrame API on top of
  // the parsed plan — the two surfaces compose into ONE optimized plan
  // (filters still push into all three scans).
  def sqlQ3(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        |       l.l_extendedprice, l.l_discount
        |FROM graft_customer c
        |JOIN graft_orders o ON c.c_custkey = o.o_custkey
        |JOIN graft_lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01'""".stripMargin)
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val sqlQ3Sql: String =
    s"""SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
      |       $revenueSumSql AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
      |ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
      |LIMIT 10""".stripMargin

  // --- SQL frontend, 6-table join (TPC-H Q5 shape) --------------------------
  // Local-supplier revenue per nation for one region-year: the join-order
  // stress test — six relations where Catalyst must broadcast the three
  // dimension tables (region→nation→customer/supplier chain) and shuffle
  // only the orders⋈lineitem spine. The c_nationkey = s_nationkey condition
  // makes it a genuine snowflake, not a chain.
  def sqlQ5(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT n.n_name, l.l_extendedprice, l.l_discount
        |FROM graft_customer c
        |JOIN graft_orders o   ON c.c_custkey = o.o_custkey
        |JOIN graft_lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN graft_supplier s ON l.l_suppkey = s.s_suppkey
        |                     AND c.c_nationkey = s.s_nationkey
        |JOIN graft_nation n   ON s.s_nationkey = n.n_nationkey
        |JOIN graft_region r   ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate <  TIMESTAMP '1997-01-01'""".stripMargin)
      .groupBy(col("n_name"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val sqlQ5Sql: String =
    s"""SELECT n.n_name,
      |       ${Money.revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue
      |FROM customer c
      |JOIN orders o   ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |             AND c.c_nationkey = s.s_nationkey
      |JOIN nation n   ON s.s_nationkey = n.n_nationkey
      |JOIN region r   ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // --- SQL frontend, correlated scalar subquery (TPC-H Q17 shape) -----------
  // Small-quantity revenue per brand: the WHERE clause compares each
  // lineitem against an aggregate over ITS OWN part's lineitems — a
  // correlated scalar subquery Catalyst must DECORRELATE into a per-part
  // aggregate joined back to the fact scan (two passes over lineitem, one
  // l_partkey shuffle each — never a per-row subquery execution). The avg
  // threshold is exact-deterministic: l_quantity is integral, so sum and
  // count are exact doubles and avg/0.2· are correctly-rounded identically
  // in both engines.
  def sqlQ17(spark: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "part").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT p.p_brand, l.l_extendedprice
        |FROM graft_lineitem l
        |JOIN graft_part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_quantity < 0.2 * (SELECT avg(l2.l_quantity)
        |                            FROM graft_lineitem l2
        |                            WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"),
        Money.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("p_brand")
  }

  val sqlQ17Sql: String =
    s"""SELECT p.p_brand, count(*) AS n_small,
      |       ${Money.moneySumSql("l.l_extendedprice")} AS sum_price
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_quantity < 0.2 * (SELECT avg(l2.l_quantity)
      |                            FROM lineitem l2
      |                            WHERE l2.l_partkey = p.p_partkey)
      |GROUP BY p.p_brand
      |ORDER BY p_brand""".stripMargin

  // --- SQL frontend, join-strategy hints ------------------------------------
  // The hint API surface: /*+ BROADCAST(c) */ forces the build side a user
  // would otherwise trust the optimizer (or AQE) to pick. Semantics are
  // UNCHANGED by construction — the oracle is the hint-free SQL — and the
  // plan audit pins the strategy (BroadcastHashJoin, never SMJ) so a
  // regression in hint resolution is caught structurally.
  def sqlHint(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT /*+ BROADCAST(c) */ c.c_mktsegment,
        |       o.o_totalprice
        |FROM graft_orders o JOIN graft_customer c ON o.o_custkey = c.c_custkey""".stripMargin)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        Money.moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  val sqlHintSql: String =
    s"""SELECT c.c_mktsegment, count(*) AS n_orders,
      |       ${Money.moneySumSql("o.o_totalprice")} AS sum_price
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // --- SQL frontend, correlated LATERAL subquery ----------------------------
  // Top-2 orders per customer via LATERAL (SELECT … ORDER BY … LIMIT 2):
  // Spark 4 plans the correlated limit as a per-key partial top-k
  // (LateralJoin → rewritten window/limit), never a per-customer query
  // execution. The oracle states the same result with a window row_number —
  // the semantics LATERAL+LIMIT must match.
  def sqlLateral(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM graft_customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)
  }

  val sqlLateralSql: String =
    """SELECT c_custkey, o_orderkey,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      |FROM (
      |  SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
      |         row_number() OVER (PARTITION BY c.c_custkey
      |           ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |)
      |WHERE rn <= 2
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  // --- SQL frontend, recursive CTE ------------------------------------------
  // WITH RECURSIVE (Spark 4's UnionLoop execution): a digit-prefix
  // hierarchy over customer keys (parent = key div 10, roots < 10) walked
  // root-to-leaf, rolled up per depth. Each recursion level is one
  // join+filter batch over the previous level's frontier — the same
  // frontier-expansion shape as Dedup.dupClusters' hand-rolled loop, but
  // executed by the engine's recursion operator. Integer division spells
  // div/Spark, ///DuckDB; all arithmetic exact.
  def sqlRecursive(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "customer")
      .createOrReplaceTempView("graft_customer")
    spark.sql(
      """WITH RECURSIVE h(k, depth) AS (
        |  SELECT c_custkey, 0 FROM graft_customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, h.depth + 1
        |  FROM graft_customer c JOIN h ON c.c_custkey div 10 = h.k
        |  WHERE c.c_custkey >= 10
        |)
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_nodes,
        |       CAST(sum(k) AS BIGINT) AS sum_keys
        |FROM h GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val sqlRecursiveSql: String =
    """WITH RECURSIVE h(k, depth) AS (
      |  SELECT c_custkey, 0 FROM customer WHERE c_custkey < 10
      |  UNION ALL
      |  SELECT c.c_custkey, h.depth + 1
      |  FROM customer c JOIN h ON c.c_custkey // 10 = h.k
      |  WHERE c.c_custkey >= 10
      |)
      |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_nodes,
      |       CAST(sum(k) AS BIGINT) AS sum_keys
      |FROM h GROUP BY depth ORDER BY depth""".stripMargin

  // --- null-safe equality join ----------------------------------------------
  // `<=>` (NULL <=> NULL is TRUE) is a distinct join operator, not sugar:
  // a plain equi-join DROPS null-keyed rows on both sides, a null-safe join
  // MATCHES them. Catalyst still recognizes <=> as an equi-join key, so this
  // plans as a hash join (broadcast here), never a nested loop. The
  // nullable key is constructed (nullif) so null↔null matches are real.
  def nullSafeJoin(spark: SparkSession, d: String): DataFrame = {
    val n = nation(spark, d)
      .select(col("n_nationkey"), col("n_name"),
        nullif(col("n_regionkey"), lit(2)).as("rk"))
    val r = region(spark, d)
      .select(col("r_name"), nullif(col("r_regionkey"), lit(2)).as("rk"))
    n.join(broadcast(r), n("rk") <=> r("rk"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey", "r_name")
  }

  val nullSafeJoinSql: String =
    """SELECT n.n_nationkey, n.n_name, r.r_name
      |FROM (SELECT n_nationkey, n_name, nullif(n_regionkey, 2) AS rk FROM nation) n
      |JOIN (SELECT r_name, nullif(r_regionkey, 2) AS rk FROM region) r
      |  ON n.rk IS NOT DISTINCT FROM r.rk
      |ORDER BY n_nationkey, r_name""".stripMargin

  // --- delete-before-insert upsert ------------------------------------------
  // The reference SHIPS this dead: delete_if_exists (BigQuery DELETE WHERE
  // played_at IN (...), then append) exists only in the ad-hoc curated job
  // with its call commented out (reference:
  // spark_jobs/adhoc/playback_pipeline_curated_adhoc.py:90-107,212-213).
  // Here it's live, expressed the engine way: target ANTI-JOIN batch keys
  // (the relational form of the DELETE — no driver-side IN-list round trip)
  // unioned with the incoming batch. Batch rows win on key collision; the
  // "batch" is the latest order per customer, so collisions are real.
  // Shuffle profile: one anti-join on the key + a union — same physics as
  // the J2 delta load, and the DELETE never mutates in place (lake-style
  // rewrite, idempotent on re-run).
  def upsert(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val target = orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lit("existing").as("row_src"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val batch = orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") * 2).as("o_totalprice"), // visibly-updated rows
        lit("upserted").as("row_src"))
    target.join(batch.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .unionByName(batch)
      .orderBy("o_orderkey")
  }

  val upsertSql: String =
    """WITH batch AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
      |         'upserted' AS row_src
      |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |        FROM orders) t
      |  WHERE rn = 1
      |)
      |SELECT o_orderkey, o_custkey, o_totalprice, 'existing' AS row_src
      |FROM orders
      |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
      |UNION ALL
      |SELECT * FROM batch
      |ORDER BY o_orderkey""".stripMargin

  // --- union under schema evolution -----------------------------------------
  // unionByName(allowMissingColumns): the lake-backfill reality where an old
  // partition predates a column. Name-based alignment (positional union
  // would silently mis-bind), absent columns null-fill. DuckDB's UNION ALL
  // BY NAME is the same operation.
  def unionEvolve(spark: SparkSession, d: String): DataFrame = {
    val oldRows = orders(spark, d)
      .where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_totalprice"), lit("old").as("src"))
    val newRows = orders(spark, d)
      .where(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
        lit("new").as("src"))
    oldRows.unionByName(newRows, allowMissingColumns = true)
      .orderBy("o_orderkey")
  }

  val unionEvolveSql: String =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_totalprice, 'old' AS src
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_totalprice, o_orderpriority, 'new' AS src
      |  FROM orders WHERE o_orderkey % 3 <> 0
      |)
      |ORDER BY o_orderkey""".stripMargin

  // --- cross join (dimension × dimension) ----------------------------------
  // The only safe cross join: both sides are bounded dimension tables, so
  // the product is bounded too (25 × 5 here) and Spark plans
  // BroadcastNestedLoopJoin with a tiny build side. A fact-side cross join
  // would be a scale bug, not an operator — never ship one.
  def crossJoinDims(spark: SparkSession, d: String): DataFrame =
    nation(spark, d).select(col("n_nationkey"), col("n_name"))
      .crossJoin(region(spark, d).select(col("r_regionkey"), col("r_name")))
      .orderBy("n_nationkey", "r_regionkey")

  val crossJoinDimsSql: String =
    """SELECT n_nationkey, n_name, r_regionkey, r_name
      |FROM nation CROSS JOIN region
      |ORDER BY n_nationkey, r_regionkey""".stripMargin

  // --- right outer join -----------------------------------------------------
  // Orders keep their row even when no qualifying lineitem exists (the
  // filter on the left side creates genuine misses). count(non-null col)
  // gives the 0-for-unmatched semantics both engines share. Same hash-join
  // physics as J1 with the preserved side swapped.
  def rightJoin(spark: SparkSession, d: String): DataFrame = {
    val bigLines = lineitem(spark, d)
      .where(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = orders(spark, d)
    bigLines.join(o, bigLines("l_orderkey") === o("o_orderkey"), "right")
      .groupBy(o("o_orderkey"))
      .agg(count(bigLines("l_orderkey")).as("n_big_lines"),
        sum(bigLines("l_quantity")).as("sum_big_qty"))
      .orderBy(o("o_orderkey"))
  }

  val rightJoinSql: String =
    """SELECT o.o_orderkey,
      |       count(l.l_orderkey) AS n_big_lines,
      |       sum(l.l_quantity) AS sum_big_qty
      |FROM (SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity >= 45) l
      |RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderkey
      |ORDER BY o.o_orderkey""".stripMargin

  // --- salted skew join (oracle-checked) ------------------------------------
  // The skew-mitigation shape from [[graft.operators.ScaleTools.saltedJoin]]
  // driven end-to-end: the big side gets a random-but-deterministic salt,
  // the small side is exploded across all salt values, and the join runs on
  // (key, salt) — splitting any hot key across `salts` reducers. The oracle
  // is the PLAIN join + aggregation: salting must never change the answer.
  def saltedJoinAgg(spark: SparkSession, d: String): DataFrame = {
    val li = lineitem(spark, d).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = orders(spark, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    graft.operators.ScaleTools.saltedJoin(li, o, "l_orderkey", salts = 4)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("o_orderstatus")
  }

  val saltedJoinAggSql: String =
    s"""SELECT o.o_orderstatus,
      |       count(*) AS n_lines,
      |       $revenueSumSql AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderstatus
      |ORDER BY o.o_orderstatus""".stripMargin

  // orderBy+limit plans as TakeOrderedAndProject — each partition keeps only
  // its local top-k, no global sort materialization: the scale-safe top-k.
  def topkOrders(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val topkOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin

  // --- O1: global ascending sort (reference sort("played_at"),
  // spark_jobs/playback_pipeline.py:310) — range-partitioned total sort.
  def globalSort(spark: SparkSession, d: String): DataFrame =
    customer(spark, d)
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  val globalSortSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_acctbal DESC, c_custkey""".stripMargin

  // --- P1/P2/P3: struct build, nested projection, drop ---------------------
  // (reference nested-field projection: spark_jobs/playback_pipeline.py:95-105;
  // testdata is flat, so build the struct first — Catalyst collapses the
  // round-trip, proving nested access costs nothing in the plan.)
  def nestedProj(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus"), col("o_totalprice"), col("o_orderdate")).as("o"))
      .select(col("o_orderkey"), col("o.o_orderstatus").as("status"),
        col("o.o_totalprice").as("total"))

  val nestedProjSql: String =
    "SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS total FROM orders"

  // --- SQL frontend, correlated EXISTS (TPC-H Q4 shape) ---------------------
  // Late-shipment order counts per priority: the EXISTS subquery correlates
  // on BOTH the join key and an order-local column (o_orderdate), and
  // Catalyst decorrelates it into ONE left-semi hash join on l_orderkey
  // with the date comparison as a join-side predicate — never a per-order
  // probe. Counts only, so cross-engine parity is trivial.
  def sqlQ4(spark: SparkSession, d: String): DataFrame = {
    Seq("orders", "lineitem").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM graft_orders o
        |WHERE EXISTS (SELECT 1 FROM graft_lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val sqlQ4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_late_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- SQL frontend, returned-item revenue top-k (TPC-H Q10 shape) ----------
  // Revenue lost to returns per customer, top 20: a 4-table join where the
  // selective l_returnflag filter pushes to the lineitem scan, nation
  // broadcasts, and the final ORDER BY + LIMIT plans as TakeOrderedAndProject
  // (per-partition top-k, no global sort). SQL states the join+filter; the
  // DataFrame tail holds the exact-integer revenue aggregation.
  def sqlQ10(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |       l.l_extendedprice, l.l_discount
        |FROM graft_customer c
        |JOIN graft_orders o   ON c.c_custkey = o.o_custkey
        |JOIN graft_lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN graft_nation n   ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'""".stripMargin)
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_returned"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val sqlQ10Sql: String =
    s"""SELECT c.c_custkey, c.c_name, n.n_name,
      |       ${Money.revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue,
      |       count(*) AS n_returned
      |FROM customer c
      |JOIN orders o   ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |JOIN nation n   ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // --- SQL frontend, nested semi-join chain (TPC-H Q20 shape) ---------------
  // Above-average suppliers of 'small%' parts: an IN subquery whose HAVING
  // threshold is ITSELF an uncorrelated scalar subquery over the same
  // filtered join. Catalyst plans the outer IN as a left-semi join and the
  // scalar as an independent one-row broadcast — two passes over the
  // filtered fact, zero per-row subquery execution. The threshold is
  // sum/count(distinct) of integral quantities: exact doubles, one
  // correctly-rounded division, identical both engines — and
  // scale-invariant (≈half the suppliers qualify at ANY sf, unlike a
  // fixed literal threshold).
  def sqlQ20(spark: SparkSession, d: String): DataFrame = {
    Seq("supplier", "lineitem", "part").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT s.s_suppkey, s.s_name
        |FROM graft_supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l.l_suppkey
        |  FROM graft_lineitem l JOIN graft_part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE 'small%'
        |  GROUP BY l.l_suppkey
        |  HAVING sum(l.l_quantity) > (
        |    SELECT sum(l2.l_quantity) / count(DISTINCT l2.l_suppkey)
        |    FROM graft_lineitem l2 JOIN graft_part p2 ON l2.l_partkey = p2.p_partkey
        |    WHERE p2.p_name LIKE 'small%'))
        |ORDER BY s_suppkey""".stripMargin)
  }

  val sqlQ20Sql: String =
    """SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT l.l_suppkey
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_name LIKE 'small%'
      |  GROUP BY l.l_suppkey
      |  HAVING sum(l.l_quantity) > (
      |    SELECT sum(l2.l_quantity) / count(DISTINCT l2.l_suppkey)
      |    FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey
      |    WHERE p2.p_name LIKE 'small%'))
      |ORDER BY s_suppkey""".stripMargin

  // --- SQL frontend, full pricing-summary report (TPC-H Q1 shape) -----------
  // The canonical scan-heavy report: one pass over lineitem, 6 exact
  // aggregates per (returnflag, linestatus) cell. All money aggregates run
  // in integer units (cents / cents×pct / cents×pct×pct — the charge term
  // price·(1−disc)·(1+tax) is exact in 10^-6-dollar units) through the
  // split-long accumulators, so the plan is a single partial+final hash agg
  // over ~6 groups — pure map-side combine, a few hundred bytes shuffled at
  // ANY scale. avg_qty is the one double division of two exact longs
  // (< 2^53), correctly rounded identically in both engines.
  def sqlQ1Full(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "lineitem")
      .createOrReplaceTempView("graft_lineitem")
    val chargeUnits = Money.cents(col("l_extendedprice")) *
      (lit(100L) - Money.cents(col("l_discount"))) *
      (lit(100L) + Money.cents(col("l_tax")))
    spark.sql(
      """SELECT l_returnflag, l_linestatus, l_quantity,
        |       l_extendedprice, l_discount, l_tax
        |FROM graft_lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'""".stripMargin)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        Money.moneySum(col("l_extendedprice")).as("sum_base"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc"),
        Money.exactUnitSum(chargeUnits, 6).as("sum_charge"),
        (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val sqlQ1FullSql: String = {
    val charge = s"${Money.centsSql("l_extendedprice")} * " +
      s"(100 - ${Money.centsSql("l_discount")}) * " +
      s"(100 + ${Money.centsSql("l_tax")})"
    s"""SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       ${Money.moneySumSql("l_extendedprice")} AS sum_base,
      |       $revenueSumSql AS sum_disc,
      |       ${Money.exactUnitSumSql(charge, 6)} AS sum_charge,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
      |       count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  // --- SQL frontend, forecasting-revenue-change scan (TPC-H Q6 shape) -------
  // The pure-scan aggregate: no join at all — three pushable predicates and
  // one exact product sum (price·discount in 10^-4-dollar units). The
  // whole query is a map-side partial agg over the pruned scan; the shuffle
  // is ONE row per partition. The discount BETWEEN bounds compare exact
  // 2-decimal doubles to the same parsed literals in both engines.
  def sqlQ6(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "lineitem")
      .createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT l_extendedprice, l_discount
        |FROM graft_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 24""".stripMargin)
      .agg(Money.exactUnitSum(
          Money.cents(col("l_extendedprice")) * Money.cents(col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val sqlQ6Sql: String = {
    val units = s"${Money.centsSql("l_extendedprice")} * ${Money.centsSql("l_discount")}"
    s"""SELECT ${Money.exactUnitSumSql(units, 4)} AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.04
      |  AND l_quantity < 24""".stripMargin
  }

  // --- SQL frontend, bidirectional nation-pair volume (TPC-H Q7 shape) ------
  // Shipping volume between two nations by direction and year: nation joins
  // twice under DIFFERENT roles (supplier side vs customer side), with a
  // disjunctive cross-role pair filter that only prunes AFTER both dims are
  // attached. Catalyst broadcasts both nation instances (separate aliases —
  // no self-join ambiguity through the SQL frontend) and the supplier dim,
  // so the only shuffle is the orders⋈lineitem spine; the date range pushes
  // to the lineitem scan.
  def sqlQ7(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |       l.l_extendedprice, l.l_discount
        |FROM graft_supplier s
        |JOIN graft_lineitem l ON s.s_suppkey = l.l_suppkey
        |JOIN graft_orders o   ON o.o_orderkey = l.l_orderkey
        |JOIN graft_customer c ON c.c_custkey = o.o_custkey
        |JOIN graft_nation n1  ON s.s_nationkey = n1.n_nationkey
        |JOIN graft_nation n2  ON c.c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate <  TIMESTAMP '1998-01-01'""".stripMargin)
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val sqlQ7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
      |       ${Money.revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue
      |FROM supplier s
      |JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      |JOIN orders o   ON o.o_orderkey = l.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      |JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // --- SQL frontend, order-count distribution (TPC-H Q13 shape) -------------
  // Customer distribution by order count: a LEFT OUTER join whose EXTRA
  // non-key predicate (priority filter) lives in the ON clause — rows that
  // fail it null out instead of dropping, so no-order customers survive to
  // the count(o_orderkey)=0 bucket. Two cascaded aggregations: the first
  // shuffles on c_custkey (the join can reuse that partitioning), the
  // second is a near-free re-agg over ≤ a few hundred distinct counts.
  def sqlQ13(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM graft_customer c
        |      LEFT OUTER JOIN graft_orders o
        |        ON c.c_custkey = o.o_custkey
        |       AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  val sqlQ13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |      FROM customer c
      |      LEFT OUTER JOIN orders o
      |        ON c.c_custkey = o.o_custkey
      |       AND o.o_orderpriority <> '1-URGENT'
      |      GROUP BY c.c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- SQL frontend, disjunctive multi-predicate join (TPC-H Q19 shape) -----
  // Three OR'd (brand × size-range × quantity-range) clauses spanning BOTH
  // join sides: Catalyst extracts the common p_partkey = l_partkey conjunct
  // as the hash-join key and — because each disjunct's part-only (and
  // lineitem-only) restriction is implied by the whole OR — pushes a derived
  // brand-OR filter into the part scan and a quantity-OR filter into the
  // lineitem scan, leaving only the cross-side residual on the join. One
  // broadcast join, both scans pruned, single-row exact-revenue output.
  def sqlQ19(spark: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "part").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT l.l_extendedprice, l.l_discount
        |FROM graft_lineitem l JOIN graft_part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin)
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val sqlQ19Sql: String =
    s"""SELECT ${Money.revenueSumSql("l.l_extendedprice", "l.l_discount")} AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
      |       AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
      |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --- SQL frontend, dormant high-balance customers (TPC-H Q22 shape) -------
  // Above-average-balance customers with no RECENT orders (the schema has no
  // phone country codes, so the reference's cntrycode grouping becomes
  // c_nationkey, and "never ordered" — empty on this data — becomes "not
  // ordered since 2000"). Two decorrelations in one query: the uncorrelated
  // scalar avg (one-row broadcast) and the NOT EXISTS (left-anti hash join
  // with the date filter pushed into the orders scan — at 100 TB the anti
  // side is only the recent slice, not order history). The avg threshold is
  // exact-integer cents summed then ONE double division, identical both
  // engines; per-row comparison stays in integer cents.
  def sqlQ22(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT c.c_nationkey, c.c_acctbal
        |FROM graft_customer c
        |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > (
        |        SELECT sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) / count(*)
        |        FROM graft_customer c2 WHERE c2.c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM graft_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')""".stripMargin)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        Money.moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  val sqlQ22Sql: String =
    s"""SELECT c.c_nationkey, count(*) AS numcust,
      |       ${Money.moneySumSql("c.c_acctbal")} AS totacctbal
      |FROM customer c
      |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > (
      |        SELECT sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) / count(*)
      |        FROM customer c2 WHERE c2.c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c.c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // --- SQL frontend, large-volume orders (TPC-H Q18 shape) -------------------
  // Orders whose total quantity exceeds a threshold: the IN subquery is a
  // grouped HAVING over the fact table — Catalyst plans it as one
  // l_orderkey aggregation semi-joined back to the orders⋈lineitem spine
  // (the aggregation and the spine share the l_orderkey partitioning).
  // Quantity sums are integral doubles (exact at any order). Threshold
  // chosen ~top-1% so the result is scale-covariant, not empty.
  def sqlQ18(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT c.c_name, o.o_orderkey, o.o_orderdate,
        |       CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
        |FROM graft_customer c
        |JOIN graft_orders o   ON c.c_custkey = o.o_custkey
        |JOIN graft_lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l2.l_orderkey FROM graft_lineitem l2
        |  GROUP BY l2.l_orderkey HAVING sum(l2.l_quantity) > 220)
        |GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin)
  }

  val sqlQ18Sql: String =
    """SELECT c.c_name, o.o_orderkey, o.o_orderdate,
      |       CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
      |FROM customer c
      |JOIN orders o   ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_orderkey IN (
      |  SELECT l2.l_orderkey FROM lineitem l2
      |  GROUP BY l2.l_orderkey HAVING sum(l2.l_quantity) > 220)
      |GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  // --- SQL frontend, sole-late-supplier orders (TPC-H Q21 shape) -------------
  // The double-correlation stress test: suppliers who shipped late
  // (> 90 days after order date) on orders where NO OTHER supplier was
  // late — a correlated EXISTS (another supplier participated) AND a
  // correlated NOT EXISTS (no other supplier late) against the same fact,
  // both correlated on the outer row's (orderkey, suppkey). Catalyst
  // decorrelates into one left-semi and one left-anti hash join on
  // l_orderkey — never per-row subqueries. (The narrow schema has no
  // receipt/commit dates; shipdate-vs-orderdate lateness keeps the shape.)
  def sqlQ21(spark: SparkSession, d: String): DataFrame = {
    Seq("supplier", "orders", "lineitem").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT s.s_name, count(*) AS numwait
        |FROM graft_supplier s
        |JOIN graft_lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN graft_orders o    ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL '90' DAY
        |  AND EXISTS (SELECT 1 FROM graft_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM graft_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL '90' DAY)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin)
  }

  val sqlQ21Sql: String =
    """SELECT s.s_name, count(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o    ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 25""".stripMargin

  // --- SQL frontend, promo revenue share (TPC-H Q14 shape) -------------------
  // A ratio of two conditional revenue sums over one month's scan. Both
  // sums run in exact integer units through ONE aggregation (the CASE
  // routes each row's units); the single output division is two exact
  // decimals-as-doubles divided once — identical both engines — and the
  // result is floor-quantized to ppm for a zero-tolerance hash match.
  def sqlQ14(spark: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "part").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    spark.sql(
      """SELECT p.p_type, l.l_extendedprice, l.l_discount
        |FROM graft_lineitem l JOIN graft_part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l.l_shipdate <  TIMESTAMP '1997-04-01'""".stripMargin)
      .agg(
        revenueSum(col("l_extendedprice"), col("l_discount")).as("total_rev"),
        Money.exactUnitSum(
          when(col("p_type") === "PROMO",
            Money.cents(col("l_extendedprice")) *
              (lit(100L) - Money.cents(col("l_discount")))).otherwise(lit(0L)),
          4).as("promo_rev"))
      .select(col("promo_rev"), col("total_rev"),
        floor(col("promo_rev") / col("total_rev") * 1000000).cast("long")
          .as("promo_share_ppm"))
  }

  val sqlQ14Sql: String = {
    val units = s"${Money.centsSql("l.l_extendedprice")} * " +
      s"(100 - ${Money.centsSql("l.l_discount")})"
    val promoUnits = s"CASE WHEN p.p_type = 'PROMO' THEN $units ELSE 0 END"
    s"""SELECT ${Money.exactUnitSumSql(promoUnits, 4)} AS promo_rev,
      |       ${Money.exactUnitSumSql(units, 4)} AS total_rev,
      |       CAST(floor(${Money.exactUnitSumSql(promoUnits, 4)}
      |         / ${Money.exactUnitSumSql(units, 4)} * 1000000) AS BIGINT)
      |         AS promo_share_ppm
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      |  AND l.l_shipdate <  TIMESTAMP '1997-04-01'""".stripMargin
  }

  // --- SQL frontend, top supplier by quarter revenue (TPC-H Q15 shape) -------
  // The view + uncorrelated MAX scalar subquery: the revenue aggregation is
  // stated ONCE as a named CTE used twice (outer scan + the max), and
  // Catalyst evaluates the scalar max as a one-row broadcast — the fact is
  // scanned twice but never re-shuffled per row. Exact-integer revenue
  // makes "= max" a safe equality (no float tolerance at the top).
  def sqlQ15(spark: SparkSession, d: String): DataFrame = {
    Seq("supplier", "lineitem").foreach(t =>
      graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    val revenueAgg = Money.revenueSum(col("l_extendedprice"), col("l_discount"))
    spark.sql(
      """SELECT l_suppkey, l_extendedprice, l_discount
        |FROM graft_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-04-01'""".stripMargin)
      .groupBy(col("l_suppkey"))
      .agg(revenueAgg.as("total_rev"))
      .createOrReplaceTempView("graft_revenue")
    spark.sql(
      """SELECT s.s_suppkey, s.s_name, r.total_rev
        |FROM graft_supplier s JOIN graft_revenue r ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_rev = (SELECT max(total_rev) FROM graft_revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  val sqlQ15Sql: String = {
    val rev = Money.revenueSumSql("l_extendedprice", "l_discount")
    s"""WITH revenue AS (
      |  SELECT l_suppkey, $rev AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s.s_suppkey, s.s_name, r.total_rev
      |FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
      |WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin
  }

  // --- SQL frontend, market share (TPC-H Q8 shape) ---------------------------
  // Nation market share inside a region by year: an 7-relation snowflake
  // where nation joins under two roles (customer's region membership vs
  // supplier's identity) and the share is a conditional/total revenue
  // ratio per year. Same exact-units + ppm-quantized ratio discipline as
  // Q14; dimensions broadcast, the orders⋈lineitem spine is the only
  // shuffle.
  def sqlQ8(spark: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => graft.Tables.table(spark, d, t).createOrReplaceTempView(s"graft_$t"))
    val units = Money.cents(col("l_extendedprice")) *
      (lit(100L) - Money.cents(col("l_discount")))
    spark.sql(
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |       n2.n_name AS supp_nation,
        |       l.l_extendedprice, l.l_discount
        |FROM graft_customer c
        |JOIN graft_orders o   ON c.c_custkey = o.o_custkey
        |JOIN graft_lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN graft_supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN graft_nation n1  ON c.c_nationkey = n1.n_nationkey
        |JOIN graft_nation n2  ON s.s_nationkey = n2.n_nationkey
        |JOIN graft_region r   ON n1.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'""".stripMargin)
      .groupBy(col("o_year"))
      .agg(
        Money.exactUnitSum(
          when(col("supp_nation") === "NATION_3", units).otherwise(lit(0L)), 4)
          .as("nation_rev"),
        Money.exactUnitSum(units, 4).as("total_rev"))
      .select(col("o_year"), col("nation_rev"), col("total_rev"),
        floor(col("nation_rev") / col("total_rev") * 1000000).cast("long")
          .as("mkt_share_ppm"))
      .orderBy("o_year")
  }

  val sqlQ8Sql: String = {
    val units = s"${Money.centsSql("l.l_extendedprice")} * " +
      s"(100 - ${Money.centsSql("l.l_discount")})"
    val natUnits = s"CASE WHEN n2.n_name = 'NATION_3' THEN $units ELSE 0 END"
    s"""SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
      |       ${Money.exactUnitSumSql(natUnits, 4)} AS nation_rev,
      |       ${Money.exactUnitSumSql(units, 4)} AS total_rev,
      |       CAST(floor(${Money.exactUnitSumSql(natUnits, 4)}
      |         / ${Money.exactUnitSumSql(units, 4)} * 1000000) AS BIGINT)
      |         AS mkt_share_ppm
      |FROM customer c
      |JOIN orders o   ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      |JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      |JOIN region r   ON n1.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin
  }

  // --- SQL frontend, PIVOT clause -------------------------------------------
  // The parser-level PIVOT surface (distinct from the DataFrame .pivot()
  // behind q_pivot): order value by status × priority, the five priority
  // arms becoming value columns. Plans as the same Expand-free single
  // hash aggregation the manual CASE form produces; the oracle IS that
  // CASE form. Sums stay NULL for an absent (status, priority) cell in
  // BOTH spellings — the reason the pivot aggregates one measure (a
  // PIVOT count(*) would yield NULL where the CASE form yields 0).
  /** SQL PIPE SYNTAX (Spark 4 `|>` operators): the linear
    * filter→aggregate→sort form of a priority rollup — each `|>` stage is
    * parser sugar over the same logical operators (the plan is identical
    * to the nested-SELECT spelling, so every Catalyst optimization applies
    * unchanged; this pins the parser surface, not new semantics). Exact
    * cents keep the aggregate integer; DuckDB's HUGEINT sum is cast back
    * to BIGINT in the oracle. */
  def sqlPipe(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "orders").createOrReplaceTempView("graft_orders")
    spark.sql(
      """TABLE graft_orders
        ||> WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        ||> AGGREGATE count(*) AS n_orders,
        |             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
        |   GROUP BY o_orderpriority
        ||> ORDER BY o_orderpriority""".stripMargin)
  }

  val sqlPipeSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS total_cents
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def sqlPivot(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "orders").createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT * FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM graft_orders
        |)
        |PIVOT (
        |  sum(cents)
        |  FOR o_orderpriority IN ('1-URGENT' AS urgent, '2-HIGH' AS high,
        |                          '3-MEDIUM' AS medium,
        |                          '4-NOT SPECIFIED' AS unspec, '5-LOW' AS low)
        |)
        |ORDER BY o_orderstatus""".stripMargin)
  }

  val sqlPivotSql: String = {
    def arm(p: String, alias: String) =
      s"""CAST(sum(CASE WHEN o_orderpriority = '$p'
         |           THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
         |    AS BIGINT) AS $alias""".stripMargin
    s"""SELECT o_orderstatus,
      |       ${arm("1-URGENT", "urgent")},
      |       ${arm("2-HIGH", "high")},
      |       ${arm("3-MEDIUM", "medium")},
      |       ${arm("4-NOT SPECIFIED", "unspec")},
      |       ${arm("5-LOW", "low")}
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
  }

  // --- declarative SQL function definitions ---------------------------------
  // The reference's custom logic lives in Python UDFs; the engine's native
  // answer is F9/F10-style Catalyst expressions (etl/Functions), but the
  // MIGRATION PATH most users take first is the declarative SQL UDF:
  // CREATE FUNCTION bodies inline into the plan at analysis (no serialized
  // closure, no codegen barrier — identical plans to writing the expression
  // by hand), so they scale exactly like the built-ins they compose.

  /** SQL scalar UDF via CREATE FUNCTION: exact net-revenue units
    * (cents × discount-percent, both exact integers) defined ONCE and
    * reused per row; the function body inlines, so the aggregation is
    * still a codegen'd long sum. */
  def sqlCreateFunc(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "lineitem")
      .createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net_units(p DOUBLE, disc DOUBLE)
        |RETURNS BIGINT
        |RETURN CAST(round(p * 100) AS BIGINT) *
        |       (100 - CAST(round(disc * 100) AS BIGINT))""".stripMargin)
    spark.sql(
      """SELECT l_returnflag, count(*) AS n_items,
        |       CAST(sum(graft_net_units(l_extendedprice, l_discount)) AS BIGINT)
        |         AS net_units
        |FROM graft_lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  val sqlCreateFuncSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |         AS BIGINT) AS net_units
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** SQL TABLE function via CREATE FUNCTION ... RETURNS TABLE: a
    * parameterized month spine, LEFT-joined so empty months survive with
    * zero counts (the gap-filling shape q_date_spine does with a derived
    * frame, here as a reusable declarative table function). */
  def sqlTableFunc(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "orders")
      .createOrReplaceTempView("graft_orders")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_month_spine(n INT)
        |RETURNS TABLE(mon INT)
        |RETURN SELECT explode(sequence(1, n)) AS mon""".stripMargin)
    spark.sql(
      """SELECT s.mon, count(o.o_orderkey) AS n_orders
        |FROM graft_month_spine(12) s
        |LEFT JOIN graft_orders o
        |  ON month(o.o_orderdate) = s.mon AND year(o.o_orderdate) = 1995
        |GROUP BY s.mon
        |ORDER BY s.mon""".stripMargin)
  }

  val sqlTableFuncSql: String =
    """SELECT CAST(s.mon AS INT) AS mon, count(o.o_orderkey) AS n_orders
      |FROM (SELECT unnest(range(1, 13)) AS mon) s
      |LEFT JOIN orders o
      |  ON month(o.o_orderdate) = s.mon AND year(o.o_orderdate) = 1995
      |GROUP BY s.mon
      |ORDER BY s.mon""".stripMargin

  /** GROUP BY ALL / ORDER BY ALL — the grouping key inferred from the
    * non-aggregate select items (oracle states them explicitly; both
    * engines define ALL the same way, this pins Spark's inference). */
  def sqlGroupAll(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "orders")
      .createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS total_cents
        |FROM graft_orders
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin)
  }

  val sqlGroupAllSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS total_cents
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY 1, 2, 3, 4""".stripMargin

  /** Lateral column aliases: each select item references the PREVIOUS
    * alias in the same list — the incremental-derivation style Python-UDF
    * pipelines use withColumn chains for; all-integer so the chain is
    * exact (oracle expands the chain textually). */
  def sqlLateralAlias(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "lineitem")
      .createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT l_orderkey, l_linenumber,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |       price_cents * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |         AS net_units,
        |       net_units div 100 AS net_cents,
        |       net_cents - price_cents AS delta_cents
        |FROM graft_lineitem
        |WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber, price_cents""".stripMargin)
  }

  val sqlLateralAliasSql: String = {
    val price = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    val net = s"$price * (100 - CAST(round(l_discount * 100) AS BIGINT))"
    s"""SELECT l_orderkey, l_linenumber,
      |       $price AS price_cents,
      |       $net AS net_units,
      |       $net // 100 AS net_cents,
      |       $net // 100 - $price AS delta_cents
      |FROM lineitem
      |WHERE l_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber, price_cents""".stripMargin
  }

  /** EXACT distinct counting via bitmap composition — the scale pattern
    * for exact COUNT(DISTINCT): per (group, 32k-bucket) bitmaps OR-merge
    * map-side (fixed-width byte arrays through the shuffle, never raw
    * values), then counts sum exactly. Unlike approx_count_distinct this
    * is exact, and unlike a raw distinct it never reshuffles the value
    * domain. */
  def sqlBitmap(spark: SparkSession, d: String): DataFrame = {
    graft.Tables.table(spark, d, "orders")
      .createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT o_orderpriority, CAST(sum(cnt) AS BIGINT) AS n_custs
        |FROM (
        |  SELECT o_orderpriority, bitmap_bucket_number(o_custkey) AS b,
        |         bitmap_count(bitmap_construct_agg(bitmap_bit_position(o_custkey)))
        |           AS cnt
        |  FROM graft_orders
        |  GROUP BY 1, 2)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val sqlBitmapSql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // === Derived TPC-H extension schema ======================================
  // The synthetic testdata carries no partsupp table and no l_shipmode /
  // l_receiptdate / l_commitdate lineitem columns, which blocked TPC-H
  // Q2/Q9/Q11/Q12/Q16. Derive them DETERMINISTICALLY from the tables it does
  // carry with pure integer arithmetic, restated verbatim in each oracle's
  // SQL — both engines compute the identical extension, so the hash gate
  // still proves the query semantics end to end. At cluster scale the
  // derivations are map-only over dimension tables (partsupp = 4 rows per
  // part) or fused into the lineitem scan (the three derived columns) —
  // they add no shuffle of their own.

  /** partsupp: 4 suppliers per part, keys/quantities/costs hash-derived.
    * ps_suppkey spreads over the whole supplier table modulo its size (the
    * size arrives as a broadcast 1-row aggregate, never a driver collect);
    * ps_supplycost_cents is an exact integer so every downstream aggregate
    * stays bit-exact across engines. */
  def partsuppDf(spark: SparkSession, d: String): DataFrame = {
    val sCnt = broadcast(supplier(spark, d).agg(count(lit(1)).as("s_cnt")))
    part(spark, d).select(col("p_partkey"))
      .crossJoin(sCnt)
      .withColumn("i", explode(sequence(lit(0L), lit(3L))))
      .select(
        col("p_partkey").as("ps_partkey"),
        pmod(col("p_partkey") + col("i") * 13L, col("s_cnt")).as("ps_suppkey"),
        (pmod(col("p_partkey") * 7L + col("i") * 11L, lit(9999L)) + 1L)
          .cast("int").as("ps_availqty"),
        (pmod(col("p_partkey") * 31L + col("i") * 17L, lit(100000L)) + 1L)
          .as("ps_supplycost_cents"))
  }

  /** The partsupp derivation as a SQL CTE body (DuckDB oracle side). */
  val partsuppSqlCte: String =
    """partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey + g.i * 13) % (SELECT count(*) FROM supplier)
      |           AS ps_suppkey,
      |         CAST((p_partkey * 7 + g.i * 11) % 9999 + 1 AS INTEGER)
      |           AS ps_availqty,
      |         (p_partkey * 31 + g.i * 17) % 100000 + 1 AS ps_supplycost_cents
      |  FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS g(i))""".stripMargin

  private val shipModes =
    Seq("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")

  /** lineitem extended with derived l_shipmode / l_receiptdate /
    * l_commitdate — all arithmetic on (l_orderkey, l_linenumber), so the
    * columns are a projection fused into the scan (no join, no shuffle). */
  def lineitemExt(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .withColumn("l_shipmode",
        element_at(array(shipModes.map(lit): _*),
          (pmod(col("l_orderkey") * 7L + col("l_linenumber"), lit(7L)) + 1L)
            .cast("int")))
      .withColumn("l_receiptdate",
        date_add(to_date(col("l_shipdate")),
          (pmod(col("l_orderkey") + col("l_linenumber"), lit(30L)) + 1L)
            .cast("int")))
      .withColumn("l_commitdate",
        date_add(to_date(col("l_shipdate")),
          (pmod(col("l_orderkey") * 3L + col("l_linenumber"), lit(61L)) - 30L)
            .cast("int")))

  /** The lineitem extension as a SQL CTE body (DuckDB oracle side). */
  val lineitemExtSqlCte: String =
    """lineitem_ext AS (
      |  SELECT l.*,
      |         list_extract(['AIR','FOB','MAIL','RAIL','REG AIR','SHIP','TRUCK'],
      |           CAST((l_orderkey * 7 + l_linenumber) % 7 + 1 AS INTEGER))
      |           AS l_shipmode,
      |         CAST(l_shipdate AS DATE)
      |           + CAST((l_orderkey + l_linenumber) % 30 + 1 AS INTEGER)
      |           AS l_receiptdate,
      |         CAST(l_shipdate AS DATE)
      |           + CAST((l_orderkey * 3 + l_linenumber) % 61 - 30 AS INTEGER)
      |           AS l_commitdate
      |  FROM lineitem l)""".stripMargin

  // --- TPC-H Q2: minimum-cost supplier per part in a region -----------------
  // The classic decorrelation: the spec's correlated MIN subquery becomes a
  // grouped MIN over the region-filtered partsupp joined back on
  // (part, min-cost) equality. All dims broadcast; the only shuffle is the
  // dimension-scale partsupp groupBy — nothing fact-sized moves. Exact
  // integer cents make the MIN-equality tie rule identical in both engines.
  def sqlQ2(spark: SparkSession, d: String): DataFrame = {
    val euroNations = nation(spark, d)
      .join(broadcast(region(spark, d).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val euroSupp = supplier(spark, d)
      .join(broadcast(euroNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val psEuro = partsuppDf(spark, d)
      .join(broadcast(euroSupp), col("ps_suppkey") === col("s_suppkey"))
    val minCost = psEuro.groupBy(col("ps_partkey"))
      .agg(min(col("ps_supplycost_cents")).as("min_cents"))
    val p = part(spark, d)
      .where(col("p_type") === "LARGE" && col("p_size") <= 25)
      .select(col("p_partkey"), col("p_brand"))
    psEuro.join(minCost, Seq("ps_partkey"))
      .where(col("ps_supplycost_cents") === col("min_cents"))
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_brand"),
        (col("ps_supplycost_cents").cast("double") / 100.0).as("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  val sqlQ2Sql: String =
    s"""WITH $partsuppSqlCte,
      |euro AS (
      |  SELECT ps_partkey, ps_suppkey, ps_supplycost_cents,
      |         s_name, s_acctbal, n_name
      |  FROM partsupp
      |  JOIN supplier ON s_suppkey = ps_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |mincost AS (
      |  SELECT ps_partkey, min(ps_supplycost_cents) AS min_cents
      |  FROM euro GROUP BY ps_partkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
      |       ps_supplycost_cents / 100.0 AS ps_supplycost
      |FROM euro
      |JOIN mincost USING (ps_partkey)
      |JOIN part ON p_partkey = ps_partkey
      |WHERE ps_supplycost_cents = min_cents
      |  AND p_type = 'LARGE' AND p_size <= 25
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  // --- TPC-H Q9: product-type profit by nation and year ---------------------
  // The biggest remaining join tree: lineitem ⋈ part(filtered, broadcast)
  // ⋈ partsupp (composite key; dimension-scale, AQE broadcasts it)
  // ⋈ supplier→nation (broadcast) ⋈ orders (the one fact-fact shuffle, on
  // l_orderkey). Profit units are 10^-4 dollars in pure long arithmetic:
  // price·(100−disc) − cost_cents·100·qty, summed exactly.
  def sqlQ9(spark: SparkSession, d: String): DataFrame = {
    val pRed = part(spark, d).where(col("p_name").like("%red%"))
      .select(col("p_partkey"))
    val sn = supplier(spark, d)
      .join(broadcast(nation(spark, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amountUnits =
      Money.cents(col("l_extendedprice")) *
        (lit(100L) - Money.cents(col("l_discount"))) -
        col("ps_supplycost_cents") * lit(100L) * col("l_quantity").cast("long")
    lineitem(spark, d)
      .join(broadcast(pRed), col("l_partkey") === col("p_partkey"))
      .join(partsuppDf(spark, d),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(orders(spark, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(Money.exactUnitSum(amountUnits, 4).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val sqlQ9Sql: String = {
    val amount = s"${Money.centsSql("l_extendedprice")} * " +
      s"(100 - ${Money.centsSql("l_discount")}) - " +
      "ps_supplycost_cents * 100 * CAST(l_quantity AS BIGINT)"
    s"""WITH $partsuppSqlCte
      |SELECT n_name AS nation,
      |       CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |       ${Money.exactUnitSumSql(amount, 4)} AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin
  }

  // --- TPC-H Q11: important stock in a nation group -------------------------
  // Grouped value per part vs a scalar global threshold: the total arrives
  // as a broadcast 1-row aggregate (Spark) / scalar subquery (DuckDB), and
  // the HAVING compares exact integer units cross-multiplied
  // (part_units · 2000 > total_units) — no fp fraction on either side.
  def sqlQ11(spark: SparkSession, d: String): DataFrame = {
    val nationNames =
      Seq("NATION_1", "NATION_7", "NATION_13", "NATION_19")
    val supp = supplier(spark, d)
      .join(broadcast(nation(spark, d)
          .where(col("n_name").isin(nationNames: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val byPart = partsuppDf(spark, d)
      .join(broadcast(supp), col("ps_suppkey") === col("s_suppkey"))
      .groupBy(col("ps_partkey"))
      .agg(sum(col("ps_supplycost_cents") * col("ps_availqty").cast("long"))
        .as("part_units"))
    val total = broadcast(byPart.agg(sum(col("part_units")).as("total_units")))
    byPart.crossJoin(total)
      .where(col("part_units") * 2000L > col("total_units"))
      .select(col("ps_partkey"),
        (col("part_units").cast("double") / 100.0).as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  val sqlQ11Sql: String =
    s"""WITH $partsuppSqlCte,
      |nat_ps AS (
      |  SELECT ps_partkey,
      |         ps_supplycost_cents * CAST(ps_availqty AS BIGINT) AS row_units
      |  FROM partsupp
      |  JOIN supplier ON ps_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_1', 'NATION_7', 'NATION_13', 'NATION_19')),
      |by_part AS (
      |  SELECT ps_partkey, CAST(sum(row_units) AS BIGINT) AS part_units
      |  FROM nat_ps GROUP BY ps_partkey)
      |SELECT ps_partkey, CAST(part_units AS DOUBLE) / 100.0 AS value
      |FROM by_part
      |WHERE part_units * 2000 >
      |  (SELECT CAST(sum(part_units) AS BIGINT) FROM by_part)
      |ORDER BY value DESC, ps_partkey""".stripMargin

  // --- TPC-H Q12: shipping modes and order priority -------------------------
  // The derived-column trio in action: mode/receipt/commit are computed in
  // the lineitem scan, the three date predicates prune before the single
  // orders⋈lineitem shuffle, and the priority split is a conditional count.
  def sqlQ12(spark: SparkSession, d: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitemExt(spark, d)
      .where(col("l_shipmode").isin("MAIL", "SHIP") &&
        col("l_commitdate") < col("l_receiptdate") &&
        to_date(col("l_shipdate")) < col("l_commitdate") &&
        col("l_receiptdate") >= lit("1997-01-01").cast("date") &&
        col("l_receiptdate") < lit("1998-01-01").cast("date"))
      .join(orders(spark, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_shipmode"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_shipmode"))
  }

  val sqlQ12Sql: String =
    s"""WITH $lineitemExtSqlCte
      |SELECT l_shipmode,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem_ext
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipmode IN ('MAIL', 'SHIP')
      |  AND l_commitdate < l_receiptdate
      |  AND CAST(l_shipdate AS DATE) < l_commitdate
      |  AND l_receiptdate >= DATE '1997-01-01'
      |  AND l_receiptdate < DATE '1998-01-01'
      |GROUP BY l_shipmode
      |ORDER BY l_shipmode""".stripMargin

  // --- TPC-H Q16: parts/supplier relationship -------------------------------
  // count(DISTINCT supplier) per part attribute group, minus an excluded
  // supplier set (the spec's complaints LIKE; the synthetic supplier table
  // has no comment column, so the stand-in predicate s_suppkey % 13 = 0 is
  // derived — same exclusion both engines). Anti-join broadcasts the tiny
  // excluded set; the distinct-count shuffles only partsupp.
  def sqlQ16(spark: SparkSession, d: String): DataFrame = {
    val complaints = supplier(spark, d)
      .where(pmod(col("s_suppkey"), lit(13L)) === 0L)
      .select(col("s_suppkey"))
    val p = part(spark, d)
      .where(col("p_brand") =!= "Brand#3" && col("p_type") =!= "SMALL" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    partsuppDf(spark, d)
      .join(broadcast(complaints), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val sqlQ16Sql: String =
    s"""WITH $partsuppSqlCte
      |SELECT p_brand, p_type, p_size,
      |       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp
      |JOIN part ON ps_partkey = p_partkey
      |WHERE p_brand <> 'Brand#3' AND p_type <> 'SMALL'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND ps_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_q2"          -> (sqlQ2 _),
    "q_sql_q9"          -> (sqlQ9 _),
    "q_sql_q11"         -> (sqlQ11 _),
    "q_sql_q12"         -> (sqlQ12 _),
    "q_sql_q16"         -> (sqlQ16 _),
    "q_sql_create_func"   -> (sqlCreateFunc _),
    "q_sql_table_func"    -> (sqlTableFunc _),
    "q_sql_group_all"     -> (sqlGroupAll _),
    "q_sql_lateral_alias" -> (sqlLateralAlias _),
    "q_sql_bitmap"        -> (sqlBitmap _),
    "q_sql_pivot"       -> (sqlPivot _),
    "q_sql_pipe"        -> (sqlPipe _),
    "q_join_composite"  -> (joinComposite _),
    "q_delta_anti"      -> (deltaAnti _),
    "q_bloom_delta"     -> (bloomDeltaOrders _),
    "q_cross_join"      -> (crossJoinDims _),
    "q_right_join"      -> (rightJoin _),
    "q_salted_join"     -> (saltedJoinAgg _),
    "q_semi_join"       -> (semiJoin _),
    "q_join_broadcast"  -> (joinBroadcastAgg _),
    "q_star_join"       -> (starJoin _),
    "q_dropdup_all"     -> (dropDupAll _),
    "q_union_all"       -> (unionAll _),
    "q_union_evolve"    -> (unionEvolve _),
    "q_upsert"          -> (upsert _),
    "q_nullsafe_join"   -> (nullSafeJoin _),
    "q_sql_q3"          -> (sqlQ3 _),
    "q_sql_q5"          -> (sqlQ5 _),
    "q_sql_q17"         -> (sqlQ17 _),
    "q_sql_q4"          -> (sqlQ4 _),
    "q_sql_q10"         -> (sqlQ10 _),
    "q_sql_q20"         -> (sqlQ20 _),
    "q_sql_q1full"      -> (sqlQ1Full _),
    "q_sql_q6"          -> (sqlQ6 _),
    "q_sql_q18"         -> (sqlQ18 _),
    "q_sql_q21"         -> (sqlQ21 _),
    "q_sql_q14"         -> (sqlQ14 _),
    "q_sql_q15"         -> (sqlQ15 _),
    "q_sql_q8"          -> (sqlQ8 _),
    "q_sql_q7"          -> (sqlQ7 _),
    "q_sql_q13"         -> (sqlQ13 _),
    "q_sql_q19"         -> (sqlQ19 _),
    "q_sql_q22"         -> (sqlQ22 _),
    "q_sql_lateral"     -> (sqlLateral _),
    "q_sql_hint"        -> (sqlHint _),
    "q_sql_recursive"   -> (sqlRecursive _),
    "q_intersect"       -> (intersectKeys _),
    "q_except"          -> (exceptKeys _),
    "q_window_top"      -> (windowTopOrders _),
    "q_window_running"  -> (windowRunning _),
    "q_window_frames"   -> (windowFrames _),
    "q_filter_isin"     -> (filterIsin _),
    "q_topk"            -> (topkOrders _),
    "q_sort"            -> (globalSort _),
    "q_nested_proj"     -> (nestedProj _))

  def oracles: Map[String, String] = Map(
    "q_sql_q2"            -> sqlQ2Sql,
    "q_sql_q9"            -> sqlQ9Sql,
    "q_sql_q11"           -> sqlQ11Sql,
    "q_sql_q12"           -> sqlQ12Sql,
    "q_sql_q16"           -> sqlQ16Sql,
    "q_sql_create_func"   -> sqlCreateFuncSql,
    "q_sql_table_func"    -> sqlTableFuncSql,
    "q_sql_group_all"     -> sqlGroupAllSql,
    "q_sql_lateral_alias" -> sqlLateralAliasSql,
    "q_sql_bitmap"        -> sqlBitmapSql,
    "q_sql_pivot"       -> sqlPivotSql,
    "q_sql_pipe"        -> sqlPipeSql,
    "q_join_composite"  -> joinCompositeSql,
    "q_delta_anti"      -> deltaAntiSql,
    "q_bloom_delta"     -> bloomDeltaOrdersSql,
    "q_cross_join"      -> crossJoinDimsSql,
    "q_right_join"      -> rightJoinSql,
    "q_salted_join"     -> saltedJoinAggSql,
    "q_semi_join"       -> semiJoinSql,
    "q_join_broadcast"  -> joinBroadcastAggSql,
    "q_star_join"       -> starJoinSql,
    "q_dropdup_all"     -> dropDupAllSql,
    "q_union_all"       -> unionAllSql,
    "q_union_evolve"    -> unionEvolveSql,
    "q_upsert"          -> upsertSql,
    "q_nullsafe_join"   -> nullSafeJoinSql,
    "q_sql_q3"          -> sqlQ3Sql,
    "q_sql_q5"          -> sqlQ5Sql,
    "q_sql_q17"         -> sqlQ17Sql,
    "q_sql_q4"          -> sqlQ4Sql,
    "q_sql_q10"         -> sqlQ10Sql,
    "q_sql_q20"         -> sqlQ20Sql,
    "q_sql_q1full"      -> sqlQ1FullSql,
    "q_sql_q6"          -> sqlQ6Sql,
    "q_sql_q18"         -> sqlQ18Sql,
    "q_sql_q21"         -> sqlQ21Sql,
    "q_sql_q14"         -> sqlQ14Sql,
    "q_sql_q15"         -> sqlQ15Sql,
    "q_sql_q8"          -> sqlQ8Sql,
    "q_sql_q7"          -> sqlQ7Sql,
    "q_sql_q13"         -> sqlQ13Sql,
    "q_sql_q19"         -> sqlQ19Sql,
    "q_sql_q22"         -> sqlQ22Sql,
    "q_sql_lateral"     -> sqlLateralSql,
    "q_sql_hint"        -> sqlHintSql,
    "q_sql_recursive"   -> sqlRecursiveSql,
    "q_intersect"       -> intersectKeysSql,
    "q_except"          -> exceptKeysSql,
    "q_window_top"      -> windowTopOrdersSql,
    "q_window_running"  -> windowRunningSql,
    "q_window_frames"   -> windowFramesSql,
    "q_filter_isin"     -> filterIsinSql,
    "q_topk"            -> topkOrdersSql,
    "q_sort"            -> globalSortSql,
    "q_nested_proj"     -> nestedProjSql)
}
