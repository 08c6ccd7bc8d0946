package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards that the custom TypedImperativeAggregate renders byte-for-byte
  * what `to_json(sort_array(collect_list(struct(...))))` renders — the
  * contract the q_flatten oracle assumes. */
class JsonBagSpec extends SparkSpec {
  import spark.implicits._

  test("json_bag equals the compositional to_json/sort_array/collect_list spec") {
    JsonBag.register(spark)
    val d = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, d)
    val viaAgg = li.groupBy(col("l_orderkey"))
      .agg(expr("json_bag(l_linenumber, CAST(l_partkey AS STRING), CAST(l_suppkey AS STRING))")
        .as("bag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaSpec = li.groupBy(col("l_orderkey"))
      .agg(graft.ops.CoreOps.baggedItemsSpec.as("bag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaAgg === viaSpec)
  }

  test("json_bag escapes JSON string content like to_json") {
    JsonBag.register(spark)
    val df = Seq(
      (1L, 1L, "a\"b", "c\\d"),
      (1L, 2L, "new\nline", "tab\there"),
      (2L, 1L, "plain", "x"),
      (3L, 1L, "back\bspace", "form\ffeed"),
      (3L, 2L, "ctl" + 1.toChar + "low" + 31.toChar, "mix\b\f\n"))
      .toDF("l_orderkey", "l_linenumber", "pk", "sk")
    val viaAgg = df.groupBy(col("l_orderkey"))
      .agg(expr("json_bag(l_linenumber, pk, sk)").as("bag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaSpec = df.groupBy(col("l_orderkey"))
      .agg(to_json(sort_array(collect_list(struct(
        col("l_linenumber").as("linenumber"),
        col("pk").as("partkey"),
        col("sk").as("suppkey"))))).as("bag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaAgg === viaSpec)
  }
}
