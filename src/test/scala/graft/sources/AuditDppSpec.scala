package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** RUNTIME partition pruning on partitioned audit tables: a selective
  * join plants IN/= predicates over the partition column at execution,
  * and directories outside the value set are dropped before any file
  * opens — identity and bucket layouts both prune, answers never change. */
class AuditDppSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshTable(tag: String, partBy: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_dpp_${tag}_")
    val cat = s"graft_dpp_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(
      s"""CREATE TABLE $cat.db.f (id BIGINT, day BIGINT, v BIGINT)
         |USING audit PARTITIONED BY ($partBy)""".stripMargin)
    spark.sql(
      s"""INSERT INTO $cat.db.f
         |SELECT id, id % 10, id * 3 FROM range(0, 1000)""".stripMargin)
    cat
  }

  private def withAqeOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def runJoin(cat: String): Unit = {
    val dim = spark.range(0, 2).toDF("k")
      .select((col("k") * 4L).as("day")) // days 0, 4 → 2 of 10 dirs
      .where(col("day") >= 0L) // selective predicate licenses DPP
    val joined = spark.table(s"$cat.db.f").join(broadcast(dim), "day")
    val expected = (0L until 1000L).filter(i => i % 10 == 0 || i % 10 == 4)
      .map(_ * 3).sum
    assert(joined.agg(sum(col("v"))).head.getLong(0) === expected)
    val scans = joined.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      "expected a dynamicpruning runtime filter on the audit scan")
    // drive THIS plan (the agg above planned its own copy), then check
    // the native-path marker on its scan
    assert(joined.collect().length === 200)
    assert(scans.flatMap(_.scan match {
      case s: AuditScan => s.runtimeFilterApi
      case _            => None
    }).nonEmpty, "expected the runtime filter to have pruned directories")
  }

  test("identity-partitioned scans prune directories from a runtime join filter") {
    withAqeOff { runJoin(freshTable("ident", "day")) }
  }

  test("bucket-partitioned scans prune bucket dirs from a runtime join filter") {
    withAqeOff { runJoin(freshTable("bkt", "bucket(4, day)")) }
  }

  test("a scan that pruned away the partition column does not claim DPP") {
    // REGRESSION: Spark resolves filterAttributes against the scan's
    // PRUNED output and throws on a miss — a MERGE's delete branch
    // projects only the row id, so claiming the pruned-out partition
    // column crashed the whole DML statement
    val cat = freshTable("prune", "day")
    spark.sql(
      s"""MERGE INTO $cat.db.f t
         |USING (SELECT * FROM VALUES (3L), (5L) AS s(id)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.table(s"$cat.db.f").count() === 998L)
    // and a projection without the partition column still reads fine
    assert(spark.sql(s"SELECT sum(v) FROM $cat.db.f").head.getLong(0)
      === (0L until 1000L).filterNot(Seq(3L, 5L).contains).map(_ * 3).sum)
  }

  test("runtime pruning composes with static partition predicates") {
    withAqeOff {
      val cat = freshTable("mix", "day")
      val dim = spark.range(0, 3).toDF("k")
        .select((col("k") * 2L).as("day")).where(col("day") >= 0L)
      // static predicate day < 5 ∧ runtime {0,2,4} → dirs {0,2,4}
      val joined = spark.table(s"$cat.db.f").where(col("day") < 5)
        .join(broadcast(dim), "day")
      val expected = (0L until 1000L)
        .filter(i => Seq(0L, 2L, 4L).contains(i % 10)).map(_ * 3).sum
      assert(joined.agg(sum(col("v"))).head.getLong(0) === expected)
    }
  }
}
