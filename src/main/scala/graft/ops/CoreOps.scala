package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Money

/** Core parity queries — the reference's flagship computation shape plus the
  * headline aggregation, expressed Spark-first over the synthetic tables.
  *
  * Each entry has a DuckDB oracle (ANSI SQL over the same parquet) with
  * column names aligned on both sides — the driver sorts columns by name
  * before hashing, so every computed column is aliased identically.
  */
object CoreOps {

  /** Flagship: the reference's end-to-end clean-zone computation shape
    * (spark_jobs/playback_pipeline.py:177-184,278-310):
    * re-nest a detail table into a JSON-string "bag" per key
    * (groupBy + collect_list(struct) + to_json), LEFT JOIN it back onto the
    * header table, project, dropDuplicates, global sort.
    *
    * Mapped onto testdata: orders = plays (header), lineitem = artists
    * (detail). The reference's `collect_list` is arrival-order
    * nondeterministic (SURVEY §7.4#1); we sort the struct array on the
    * unique (l_linenumber) prefix so the JSON is deterministic and
    * oracle-comparable.
    *
    * Scale: the aggregation and the join share the same key (orderkey), so
    * at cluster scale this is ONE shuffle of lineitem + one of orders onto
    * the join key; Catalyst plans SMJ / shuffled-hash with partial
    * aggregation map-side. No driver round-trips.
    */
  /** Compositional executable spec of the bag column (what the custom
    * aggregate must reproduce byte-for-byte — JsonBagSpec guards it). */
  def baggedItemsSpec: org.apache.spark.sql.Column =
    to_json(
      sort_array(collect_list(struct(
        col("l_linenumber").as("linenumber"),
        col("l_partkey").cast("string").as("partkey"),
        col("l_suppkey").cast("string").as("suppkey")))))

  def playbackFlatten(spark: SparkSession, d: String): DataFrame = {
    graft.plans.JsonBag.register(spark)
    val o  = orders(spark, d)
    val li = lineitem(spark, d)
    val bagged = li
      .groupBy(col("l_orderkey"))
      .agg(
        // custom TypedImperativeAggregate: one buffer, one sort at eval,
        // serialize straight to the JSON string (the compositional form
        // materializes the bag three times: collect_list → sort_array →
        // StructsToJson); byte-identical output
        expr("json_bag(l_linenumber, CAST(l_partkey AS STRING), CAST(l_suppkey AS STRING))")
          .as("bagged_items"),
        count(lit(1)).as("n_items"))
    o.join(bagged, o("o_orderkey") === bagged("l_orderkey"), "left")
      .select(
        o("o_orderkey"), o("o_custkey"), o("o_orderstatus"),
        o("o_totalprice"), o("o_orderdate"),
        bagged("bagged_items"), bagged("n_items"))
      // A2 dedup keyed on the row key, not all columns: o_orderkey is unique
      // post-join, so the output set is identical, but the dedup reuses the
      // join's orderkey partitioning (no exchange) instead of re-shuffling
      // every row by the hash of all 7 columns INCLUDING the JSON bag — at
      // scale that full-row shuffle is the dominant cost of the query
      .dropDuplicates("o_orderkey")
      .orderBy("o_orderkey")
  }

  val playbackFlattenSql: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
      |       o.o_orderdate, b.bagged_items, b.n_items
      |FROM orders o
      |LEFT JOIN (
      |  SELECT l_orderkey,
      |         to_json(list(struct_pack(
      |             linenumber := l_linenumber,
      |             partkey := CAST(l_partkey AS VARCHAR),
      |             suppkey := CAST(l_suppkey AS VARCHAR))
      |           ORDER BY l_linenumber, CAST(l_partkey AS VARCHAR),
      |                    CAST(l_suppkey AS VARCHAR))) AS bagged_items,
      |         count(*) AS n_items
      |  FROM lineitem GROUP BY l_orderkey) b
      |ON o.o_orderkey = b.l_orderkey
      |ORDER BY o.o_orderkey""".stripMargin

  /** Headline aggregation (TPC-H Q1 shape over lineitem). Money sums run on
    * exact integer units summed as primitive longs ([[Money]] — bit-exact
    * across engines like the decimal form, but whole-stage-codegen'd with
    * no per-row BigDecimal, and split-accumulated so nothing overflows at
    * cluster scale); avg stays double because l_quantity is integral-valued
    * (exact in fp).
    *
    * Scale: partial (map-side) + final hash aggregation on a low-cardinality
    * key — the canonical 100 TB-safe shape.
    */
  def q1Agg(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Money.moneySum(col("l_extendedprice")).as("sum_base_price"),
        Money.revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       ${Money.moneySumSql("l_extendedprice")} AS sum_base_price,
      |       ${Money.revenueSumSql("l_extendedprice", "l_discount")} AS sum_disc_price,
      |       avg(l_quantity) AS avg_qty,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_flatten" -> (playbackFlatten _),
    "q1_agg"    -> (q1Agg _))

  def oracles: Map[String, String] = Map(
    "q_flatten" -> playbackFlattenSql,
    "q1_agg"    -> q1AggSql)
}
