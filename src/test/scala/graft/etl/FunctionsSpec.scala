package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Semantics of the native F9/F10 replacements (SURVEY §2.9) — the exact
  * observable behavior of the reference's Python UDFs. Property tests use
  * plain ScalaCheck generators batched through one DataFrame pass.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("completeYear appends -12-31 to bare years only (F10)") {
    val got = Seq("1974", "2020-03-15", "", "19745", null)
      .toDF("s").select(Functions.completeYear(col("s")).as("r"))
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("1974-12-31", "2020-03-15", "", "19745", null))
  }

  test("completeYear property: non-4-length strings pass through unchanged") {
    val gen = Gen.alphaNumStr.suchThat(_.length != 4)
    val samples = Iterator.continually(gen.sample).flatten.take(100).toSeq
    val got = samples.toDF("s")
      .select(col("s"), Functions.completeYear(col("s")).as("r"))
      .collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0)))
  }

  test("valuesFromKey joins extracted values with comma-space (F9)") {
    val json =
      """[{"artist_name":"Solo Artist","artist_id":"ar1"},{"artist_name":"Guest Artist","artist_id":"ar2"}]"""
    val df = Seq(json).toDF("j").select(
      Functions.valuesFromKey(col("j"), "artist_name").as("names"),
      Functions.valuesFromKey(col("j"), "artist_id").as("ids"),
      Functions.valuesFromKey(col("j"), "missing").as("none"))
    val row = df.head
    assert(row.getString(0) === "Solo Artist, Guest Artist")
    assert(row.getString(1) === "ar1, ar2")
    assert(row.getString(2) === "")
  }

  test("durationSeconds/Minutes round to 2dp like the reference (F4/F5)") {
    val row = Seq(215000L).toDF("ms").select(
      Functions.durationSeconds(col("ms")).as("s"),
      Functions.durationMinutes(col("ms")).as("m")).head
    assert(row.getDouble(0) === 215.0)
    assert(row.getDouble(1) === 3.58)
  }
}
