package graft

/** Guards the driver contract itself: `entry` must return rows (the
  * driver's smoke check) and every query name must have either an oracle
  * or a documented rows-only custom expression. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a query; rows-only set is exactly q_compress_signal") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o diff q}")
    // q_fast_fingerprint gained a DuckDB oracle (HUGEINT modular chain);
    // zlib has no SQL twin, so the compression signal stays rows-only
    assert((q diff o) === Set("q_compress_signal"),
      "rows-only queries must stay the no-SQL-equivalent custom expression")
  }
}
