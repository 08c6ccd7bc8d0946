package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money arithmetic on integer units — the fast AND scale-safe form.
  *
  * Money columns in the testdata (and in the reference's duration columns)
  * are 2-decimal doubles. Summing them as decimals is bit-exact across
  * engines but pays per-row BigDecimal aggregation; summing raw doubles is
  * fast but non-associative (order-dependent, so a distributed sum can't
  * hash-match a single-threaded oracle). This helper gets both properties:
  *
  *  1. per row, convert to exact integer units (cents, or cents×pct for
  *     discount products) — `round(x*100)` is exact because the stored
  *     doubles are exact 2-decimal values (verified over the testdata), and
  *     rounding a value within 1 ulp of an integer is engine-independent;
  *  2. split each per-row unit value into a dollar part and a sub-dollar
  *     remainder and sum BOTH AS PRIMITIVE LONGS — whole-stage-codegen'd
  *     partial+final hash aggregation, no decimal in the hot path. The
  *     split is what keeps the accumulators overflow-safe at cluster scale:
  *     a single long summing cents×pct units (≤1.05e9/row) overflows at
  *     ~9e9 rows per group, while the split parts (≤1.05e5 and ≤9999/row)
  *     hold to ~1e14 rows per group — beyond a 100 TB table;
  *  3. recombine in decimal only on the handful of OUTPUT groups, scaling
  *     by an exact decimal literal (multiplication, never division — both
  *     engines' decimal division scale rules differ, multiplication by
  *     10^-s is exact and identical).
  */
object Money {

  /** Exact integer cents of a 2-decimal money double. */
  def cents(x: Column): Column = round(x * 100).cast("long")

  /** DuckDB spelling of [[cents]]. */
  def centsSql(x: String): String = s"CAST(round(($x)*100) AS BIGINT)"

  /** Scale-safe exact SUM aggregate over per-row integer money units at
    * 10^-`scale` dollars, returned as round(·, 2) cast double (the
    * cross-engine boundary form). See object doc for the mechanism. */
  def exactUnitSum(units: Column, scale: Int): Column = {
    val m = math.pow(10, scale).toLong
    val rem = pmod(units, lit(m))
    // (units - rem) is an exact multiple of m and ≤ ~1e9, so the double
    // division is exact; cast truncates an integral value
    val hi = ((units - rem) / lit(m.toDouble)).cast("long")
    val total = sum(hi).cast("decimal(38,0)") * lit(m).cast("decimal(38,0)") +
      sum(rem).cast("decimal(38,0)")
    val unitDec = lit(java.math.BigDecimal.ONE.movePointLeft(scale))
      .cast(s"decimal(${scale + 1},$scale)")
    round(total * unitDec, 2).cast("double")
  }

  /** DuckDB spelling of [[exactUnitSum]] — no split needed there: DuckDB
    * sums BIGINT into INT128, which is already overflow-safe and exact. */
  def exactUnitSumSql(unitsExpr: String, scale: Int): String = {
    val one = "0." + ("0" * (scale - 1)) + "1"
    s"CAST(round(CAST(sum($unitsExpr) AS DECIMAL(38,0)) * " +
      s"CAST($one AS DECIMAL(${scale + 1},$scale)), 2) AS DOUBLE)"
  }

  /** Exact revenue sum — Σ price·(1−discount) in cents×pct units (10^-4
    * dollars): both factors are exact small ints, the product is exact, and
    * the aggregation is the split-long form. */
  def revenueSum(price: Column, discount: Column): Column =
    exactUnitSum(cents(price) * (lit(100L) - cents(discount)), 4)

  def revenueSumSql(price: String, discount: String): String =
    exactUnitSumSql(s"${centsSql(price)} * (100 - ${centsSql(discount)})", 4)

  /** Exact money sum — Σ price in cents. */
  def moneySum(price: Column): Column = exactUnitSum(cents(price), 2)

  def moneySumSql(price: String): String =
    exactUnitSumSql(centsSql(price), 2)

  /** Exact cents → rounded-double dollars, for already-summed cent totals
    * (e.g. window running sums, where the per-partition row count bounds the
    * long accumulator). Multiplication by an exact decimal literal — same
    * boundary form as [[exactUnitSum]]. */
  def centsToDollars(totalCents: Column): Column =
    round(totalCents.cast("decimal(38,0)") *
      lit(java.math.BigDecimal.ONE.movePointLeft(2)).cast("decimal(3,2)"), 2)
      .cast("double")

  def centsToDollarsSql(totalCents: String): String =
    s"CAST(round(CAST($totalCents AS DECIMAL(38,0)) * " +
      "CAST(0.01 AS DECIMAL(3,2)), 2) AS DOUBLE)"
}
