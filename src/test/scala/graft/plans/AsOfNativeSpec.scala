package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{AsOfJoin, NativeAsOf}

/** The native as-of join operator (LogicalPlan + Strategy + Exec) against
  * the composition form and against hand-computed edge cases. Uses the
  * `experimental.extraStrategies` registration path (a plain session, no
  * extensions) — the strategy must work through both wirings. */
class AsOfNativeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("native inner as-of ≡ union-window composition") {
    val nat = NativeAsOf.eventToLastSignupNative(spark, d)
    val cmp = AsOfJoin.eventToLastSignup(spark, d)
    assert(nat.count() > 0)
    assert(nat.exceptAll(cmp).isEmpty && cmp.exceptAll(nat).isEmpty)
  }

  test("native left as-of ≡ composition; unmatched rows carry nulls") {
    val nat = NativeAsOf.eventToLastSignupNativeLeft(spark, d)
    val cmp = AsOfJoin.eventToLastSignupLeft(spark, d)
    assert(nat.exceptAll(cmp).isEmpty && cmp.exceptAll(nat).isEmpty)
    assert(nat.where(col("signup_id").isNull).count() > 0)
  }

  private def edgeFrames: (DataFrame, DataFrame) = {
    import spark.implicits._
    val left = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 10L, "l1"), (1L, 5L, "l2"), (2L, 7L, "l3"),
      (null, 1L, "l4"), (3L, null, "l5"))
      .toDF("k", "t", "ltag")
    val right = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 5L, "a"), (1L, 10L, "b"), (1L, 11L, "c"),
      (2L, 8L, "d"), (null, 0L, "e"), (2L, null, "f"))
      .toDF("k", "t", "v")
    (left, right)
  }

  test("boundary inclusive, greatest-prior wins, nulls never match (left)") {
    val (l, r) = edgeFrames
    val out = NativeAsOf.asOfNative(l, r, "k", "t", leftOuter = true)
      .select("ltag", "asof_v").as[(String, String)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.STRING))
      .collect().toMap
    assert(out == Map("l1" -> "b", "l2" -> "a", "l3" -> null,
      "l4" -> null, "l5" -> null))
  }

  test("inner variant drops unmatched; empty right keeps outer left-total") {
    val (l, r) = edgeFrames
    val inner = NativeAsOf.asOfNative(l, r, "k", "t", leftOuter = false)
    assert(inner.count() == 2)
    val emptyR = r.where(lit(false))
    assert(NativeAsOf.asOfNative(l, emptyR, "k", "t", leftOuter = false).count() == 0)
    val outer = NativeAsOf.asOfNative(l, emptyR, "k", "t", leftOuter = true)
    assert(outer.count() == 5 && outer.where(col("asof_v").isNotNull).count() == 0)
  }

  test("composite key: struct clustering matches per-key backward semantics") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L, "l1"), (1L, "b", 10L, "l2"), (2L, "a", 5L, "l3"))
      .toDF("k1", "k2", "t", "ltag")
    val right = Seq((1L, "a", 8L, "ra"), (1L, "b", 9L, "rb"),
      (1L, "a", 11L, "rx"), (2L, "b", 1L, "ry"))
      .toDF("k1", "k2", "t", "v")
    val out = NativeAsOf.asOfNativeKeys(left, right, Seq("k1", "k2"), "t",
        leftOuter = true)
      .select("ltag", "asof_v").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // (1,a)@10 → ra (8 ≤ 10; 11 too late); (1,b)@10 → rb; (2,a) → no (2,a) rows
    assert(out == Map("l1" -> "ra", "l2" -> "rb", "l3" -> null))
  }

  test("forward native as-of ≡ forward composition (earliest at-or-after)") {
    val nat = NativeAsOf.eventToNextSignupNative(spark, d)
    val cmp = AsOfJoin.eventToNextSignup(spark, d)
    assert(nat.count() > 0)
    assert(nat.exceptAll(cmp).isEmpty && cmp.exceptAll(nat).isEmpty)
  }

  test("bucketed inputs join with ZERO exchanges (SortMergeJoin contract)") {
    // both sides bucketed on the key: the operator's ClusteredDistribution
    // is satisfied from the table layout, EnsureRequirements inserts only
    // the cheap in-partition sorts — at 100 TB, an as-of join between
    // bucketed fact and feature history never shuffles at read time
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    graft.operators.ScaleTools.writeBucketed(
      ev.where(col("event_type") =!= "signup"), "asof_bkt_l", Seq("user_id"), 4)
    graft.operators.ScaleTools.writeBucketed(
      ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_id")),
      "asof_bkt_r", Seq("user_id"), 4)
    val out = NativeAsOf.asOfNative(
      spark.table("asof_bkt_l"), spark.table("asof_bkt_r"),
      "user_id", "ts", leftOuter = false)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("(?<!Broadcast)Exchange".r.findAllIn(plan).isEmpty, plan)
    assert(out.count() > 0)
  }

  test("plan: AsOfJoin node present, one exchange per side, no union") {
    // edge frames have no pre-aggregation, so the ONLY shuffles are the two
    // EnsureRequirements exchanges clustering each side on its key
    val (l, r) = edgeFrames
    val plan = NativeAsOf.asOfNative(l, r, "k", "t", leftOuter = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("(?<!Broadcast)Exchange".r.findAllIn(plan).length == 2, plan)
    assert(!plan.toLowerCase.contains("union"), plan)
  }
}
