package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Regression: Spark's default V2→V1 predicate bridge for SupportsDelete
  * is LOSSY — a DELETE whose condition contains an inconvertible node
  * (e.g. modulo arithmetic inside an OR) reached the v1 canDeleteWhere as
  * just the convertible disjunct, and the metadata path deleted the
  * WRONG row set (observed: `(id % 100 = 3 AND id < 400) OR id = 5`
  * arriving as `EqualTo(id,5)`). The table now overrides the V2 entry
  * points with a STRICT converter: any partial conversion refuses the
  * metadata path and the DELETE routes to the exact row-level delta
  * rewrite instead. */
class AuditDeletePredicateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_delp_${tag}_")
    val cat = s"graft_delp_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    cat
  }

  test("DELETE with a partially-convertible OR deletes exactly the right rows") {
    val cat = freshCat("or")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 7 FROM range(0, 400)")
    // modulo is inconvertible to a V1 filter; id = 5 converts — the lossy
    // bridge used to hand the metadata path ONLY the EqualTo leg
    spark.sql(
      s"DELETE FROM $cat.db.t WHERE (id % 100 = 3 AND id < 400) OR id = 5")
    val left = spark.sql(s"SELECT id FROM $cat.db.t").collect()
      .map(_.getLong(0)).toSet
    val expected = (0L until 400L)
      .filterNot(i => (i % 100 == 3 && i < 400) || i == 5).toSet
    assert(left === expected)
    assert(!left.contains(3L) && !left.contains(103L) && !left.contains(5L))
  }

  test("fully-convertible predicates still take the metadata path") {
    val cat = freshCat("meta")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(0, 100)")
    // convertible conjunction: driver-side rewrite, no delete vectors
    spark.sql(s"DELETE FROM $cat.db.t WHERE id >= 90 AND id < 95")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0) === 95L)
    val path = spark.conf.get(s"spark.sql.catalog.$cat.warehouse") +
      "/db/t"
    assert(AuditDeletes.count(path) === 0L,
      "the metadata path rewrites files in place — no delete vectors")
    // and the OR of two convertible legs converts strictly
    spark.sql(s"DELETE FROM $cat.db.t WHERE id = 0 OR id = 1")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0) === 93L)
    assert(AuditDeletes.count(path) === 0L)
  }

  test("strict converter refuses every partial conversion shape") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Or => V2Or, Predicate => V2P}
    def eq5 = new V2P("=", Array(Expressions.column("id"),
      Expressions.literal(5L)))
    def weird = new V2P("UNKNOWN_FN", Array(Expressions.column("id")))
    assert(AuditV2Filters.toV1(eq5).isDefined)
    assert(AuditV2Filters.toV1(weird).isEmpty)
    // one inconvertible node poisons the whole tree — both AND and OR
    assert(AuditV2Filters.toV1(new V2Or(eq5, weird)).isEmpty)
    assert(AuditV2Filters.toV1(new V2And(eq5, weird)).isEmpty)
    assert(AuditV2Filters.toV1(new V2Or(eq5, eq5)).isDefined)
  }
}
