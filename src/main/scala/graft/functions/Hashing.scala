package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact hashing for the dedup/similarity operators.
  *
  * Spark's native xxhash64/hash have no DuckDB equivalent, so oracle-checked
  * queries use a 60-bit hash derived from md5 (identical in any engine):
  * the first 15 hex chars of md5, parsed base-16 → a non-negative long.
  *
  *   Spark:  conv(substring(md5(s), 1, 15), 16, 10) :: long
  *   DuckDB: CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)
  *
  * md5 is fine here: these are content fingerprints for dedup, not
  * cryptographic auth. For pure-Spark hot paths where no oracle is needed
  * (salting, repartitioning), prefer native xxhash64 — codegen'd and ~10×
  * cheaper; [[hash64]] below picks it for that use.
  */
object Hashing {

  /** 60-bit md5-derived hash, reproducible in DuckDB (see object doc).
    *
    * Round-21 optimization (guide §4 — per-row expression cost): computed
    * by the codegen'd [[graft.plans.HexHash60Expr]] instead of the
    * `conv(substring(md5(c), 1, 15), 16, 10)` chain. Value-identical
    * (HashingSpec proves chain ≡ native on randomized inputs); the chain
    * paid a hex-format allocation + substring + base-conversion digit
    * loop + string→long parse per row on top of the md5 itself. */
  def hexHash(c: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.plans.HexHash60Expr(
        org.apache.spark.sql.GraftSqlShim.expression(c)))

  /** The pre-round-21 expression-chain spelling of [[hexHash]] — kept as
    * the differential-test twin (HashingSpec asserts chain ≡ native). */
  def hexHashChain(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The DuckDB SQL spelling of [[hexHash]], for building oracle strings. */
  def hexHashSql(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 15) AS BIGINT)"

  /** Oracle-free fast path: native codegen'd xxhash64 (e.g. for salting). */
  def hash64(cols: Column*): Column = xxhash64(cols: _*)

  /** Mersenne-prime modulus for 31-bit hash arithmetic: products of two
    * 31-bit values stay inside a long, so affine seed families
    * `(a·h + b) mod P` never overflow. */
  val P31: Long = 2147483647L // 2^31 - 1

  /** 31-bit reduction of [[hexHash]] — the base hash for minhash families. */
  def smallHash(c: Column): Column = pmod(hexHash(c), lit(P31))

  def smallHashSql(expr: String): String = s"(${hexHashSql(expr)} % $P31)"

  /** Driver/executor-side evaluation of EXACTLY the same function as
    * [[hexHash]] — precomputes literal constants (minhash seeds, LSH
    * hyperplanes) at plan-build time, generates the paged source's rows,
    * and backs the catalog `hex_hash` function. Keep in sync with
    * hexHash: first 15 hex chars of md5, parsed base 16 — computed here
    * by bit-packing (the first 15 hex chars ARE the top 60 bits of the
    * digest), not by hex formatting: the obvious
    * `digest.map("%02x".format).mkString` spelling costs 16 boxed
    * String.format calls per hash and dominated whole queries when this
    * ran per-row. */
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def hexHashLocal(s: String): Long =
    hexHashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def hexHashBytes(b: Array[Byte]): Long = {
    val d = Md5.get().digest(b) // digest() resets the instance
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // 16 packed hex digits → drop the last = first 15, base 16
  }
}
