package graft.functions

import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property checks for the integer-unit money layer: the fast split-long
  * aggregation must equal exact BigDecimal arithmetic on arbitrary
  * 2-decimal money values — this is the invariant every money oracle
  * (q1_agg, revenue, rollup, histogram, daily, streaming) rests on. */
class MoneySpec extends SparkSpec {
  import spark.implicits._

  private val money: Gen[Double] =
    Gen.chooseNum(0L, 20000000L).map(_ / 100.0) // 0.00 .. 200000.00
  private val pct: Gen[Double] =
    Gen.chooseNum(0L, 100L).map(_ / 100.0) // 0.00 .. 1.00

  test("cents() is the exact integer cents of any 2-decimal double") {
    Gen.listOfN(300, money).sample.get.foreach { x =>
      val viaCol = Seq(x).toDF("x").select(Money.cents(col("x"))).head.getLong(0)
      assert(viaCol === BigDecimal(x).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact, s"for $x")
    }
  }

  test("moneySum equals exact BigDecimal summation") {
    (1 to 3).foreach { _ =>
      val xs = Gen.listOfN(500, money).sample.get
      val got = xs.toDF("x").agg(Money.moneySum(col("x"))).head.getDouble(0)
      val exact = xs.map(BigDecimal(_)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got === exact)
    }
  }

  test("revenueSum equals exact BigDecimal Σ price·(1−disc) rounded to 2dp") {
    (1 to 3).foreach { _ =>
      val ps = Gen.listOfN(400, money).sample.get
      val ds = Gen.listOfN(400, pct).sample.get
      val rows = ps.zip(ds)
      val got = rows.toDF("p", "d")
        .agg(Money.revenueSum(col("p"), col("d"))).head.getDouble(0)
      val exact = rows.map { case (p, d) =>
        BigDecimal(p).setScale(2) * (BigDecimal(1) - BigDecimal(d).setScale(2))
      }.sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got === exact)
    }
  }

  test("CentsSum (public udaf Aggregator) agrees with Money.moneySum exactly") {
    CentsSum.register(spark)
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val both = ev.groupBy(col("event_type"))
      .agg(Money.moneySum(col("value")).as("a"), expr("cents_sum(value)").as("b"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r)
    }
  }
}
