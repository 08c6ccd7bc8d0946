package graft

/** Guards the driver contract itself: `entry` must return rows (the
  * driver's smoke check) and every query name must have either an oracle
  * or a documented rows-only custom expression. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a query; rows-only set is exactly the custom-expression pair") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o diff q}")
    assert((q diff o) === Set("q_fast_fingerprint", "q_compress_signal"),
      "rows-only queries must stay the two no-SQL-equivalent custom expressions")
  }
}
