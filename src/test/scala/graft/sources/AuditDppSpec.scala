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

  test("a selective MERGE runtime-prunes the target-side DML scan") {
    withAqeOff {
      val cat = freshTable("dml", "day")
      // the delta MERGE joins target RIGHT-OUTER source, so the source
      // side can never be the broadcast build — DPP must run its own
      // pruning subquery, which Spark only does when not restricted to
      // broadcast reuse (at 100 TB, one extra subquery over a small
      // source is noise next to opening every target directory)
      val prevReuse = spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      // capture the DML's EXECUTED plan (MERGE returns no DataFrame)
      val plans = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.execution.SparkPlan]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = plans.add(qe.executedPlan)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        // the source keeps a REAL selective Filter (a VALUES WHERE would
        // constant-fold away and nothing licenses DPP). DELETE-only:
        // an UPDATE branch adds the cardinality check's nondeterministic
        // __row_id projection, which blocks PhysicalOperation — and with
        // it any DPP — on the target side (Spark limitation, see
        // ROUND_NOTES r13)
        spark.sql(
          s"""MERGE INTO $cat.db.f t
             |USING (SELECT id, id % 10 AS day FROM range(0, 1010)
             |       WHERE id % 100 = 3) s
             |ON t.day = s.day AND t.id = s.id
             |WHEN MATCHED THEN DELETE""".stripMargin)
        // listener delivery is async; poll until the DML plan arrives
        val deadline = System.nanoTime + 10_000_000_000L
        while (plans.isEmpty && System.nanoTime < deadline) Thread.sleep(50)
        // the target read (the one that joined the source) carried a
        // dynamic-pruning runtime filter and it REACHED the audit scan
        val scans = plans.toArray(Array.empty[
          org.apache.spark.sql.execution.SparkPlan]).toSeq.flatMap(_.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        })
        assert(scans.exists(_.runtimeFilters.nonEmpty),
          s"no runtime filter on any DML scan:\n${plans.toArray.mkString("\n")}")
        assert(scans.flatMap(_.scan match {
          case s: AuditScan => s.runtimeFilterApi
          case _            => None
        }).nonEmpty, "runtime filter never reached the DML audit scan")
      } finally {
        spark.listenerManager.unregister(listener)
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
          prevReuse)
      }
      // semantics unchanged: ids 3,103,…,903 (day 3) deleted
      assert(spark.table(s"$cat.db.f").count() === 990L)
      assert(spark.table(s"$cat.db.f").where("id % 100 = 3").count() === 0L)
    }
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
