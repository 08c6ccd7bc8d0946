package graft

/** Guards the driver contract itself: `entry` must return rows (the
  * driver's smoke check) and every query name must have either an oracle
  * or a documented rows-only custom expression. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a query; every query is oracle-checked") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o diff q}")
    // round 9 retired the last rows-only query: the compression signal is
    // now the hash-checkable dictionary-ratio proxy (the zlib expression
    // stays spec-pinned monotone against it). Any NEW rows-only query must
    // be a deliberate, documented no-SQL-equivalent custom expression —
    // and this guard updated with its name.
    assert((q diff o) === Set.empty,
      s"queries without oracles: ${q diff o}")
  }
}
