package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

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
  def playbackFlatten(spark: SparkSession, d: String): DataFrame = {
    val o  = orders(spark, d)
    val li = lineitem(spark, d)
    val bagged = li
      .groupBy(col("l_orderkey"))
      .agg(
        to_json(
          sort_array(collect_list(struct(
            col("l_linenumber").as("linenumber"),
            col("l_partkey").cast("string").as("partkey"),
            col("l_suppkey").cast("string").as("suppkey"))))
        ).as("bagged_items"),
        count(lit(1)).as("n_items"))
    o.join(bagged, o("o_orderkey") === bagged("l_orderkey"), "left")
      .select(
        o("o_orderkey"), o("o_custkey"), o("o_orderstatus"),
        o("o_totalprice"), o("o_orderdate"),
        bagged("bagged_items"), bagged("n_items"))
      .dropDuplicates()
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

  /** Headline aggregation (TPC-H Q1 shape over lineitem). Money sums go
    * through decimal(18,2) so Spark and DuckDB agree bit-for-bit regardless
    * of fp summation order; avg stays double because l_quantity is
    * integral-valued (exact in fp).
    *
    * Scale: partial (map-side) + final hash aggregation on a low-cardinality
    * key — the canonical 100 TB-safe shape.
    */
  def q1Agg(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_base_price"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))), 2)
          .cast("double").as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
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
