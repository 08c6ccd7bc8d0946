package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[JaroWinkler]] to the reference implementation family's values
  * (literals probed from the DuckDB build the oracle uses, 1e-12 tight)
  * and checks the codegen path agrees with direct evaluation. */
class JaroWinklerSpec extends SparkSpec {

  // (a, b, jaro_winkler) — covers: double transposition, integer-halved
  // odd transposition count, window clamp to 0, Winkler boost on/off
  // around the 0.7 threshold, prefix cap at 4, empty/degenerate inputs,
  // and case sensitivity.
  private val pinned = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("DWAYNE", "DUANE", 0.84),
    ("ABCDEF", "BCADEF", 0.9444444444444445),
    ("ABCD", "ACBD", 0.925),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("ABCDEF", "ABZZZZZZZZZZ", 0.5),
    ("ABCDE", "AXCYE", 0.76),
    ("aaaaaaaaab", "aaaaaaaaba", 0.98),
    ("Customer#000000001", "Customer#000000002", 0.9777777777777779),
    ("", "", 0.0),
    ("", "A", 0.0),
    ("A", "A", 1.0),
    ("AB", "BA", 0.0),
    ("abc", "ABC", 0.0))

  test("direct evaluation matches the pinned reference values exactly") {
    pinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.sim(a, b)
      assert(math.abs(got - want) < 1e-12, s"sim($a, $b) = $got, want $want")
      assert(got === JaroWinkler.sim(b, a), "symmetry")
    }
  }

  test("the registered SQL function agrees with direct evaluation through codegen") {
    JaroWinkler.register(spark)
    import spark.implicits._
    val df = pinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val viaSql = df.selectExpr("a", "b", "jaro_winkler(a, b) AS s").collect()
    viaSql.foreach { r =>
      assert(r.getAs[Double]("s") ===
        JaroWinkler.sim(r.getAs[String]("a"), r.getAs[String]("b")))
    }
    // null propagation
    val n = spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x') AS s")
      .collect().head
    assert(n.isNullAt(0))
  }
}
