package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** `system.maintenance_apply` — the closing loop over the round-18
  * recommender (round-18 verdict #5 for round 19): execute the plan's
  * emitted CALLs (VACUUM strictly before OPTIMIZE, IN-list batched),
  * re-plan, repeat until every target reads "none". The worst-case
  * composite state a 100 TB operator faces — fragmented dirs + a
  * delete-vector backlog + a crashed fold — must converge in ONE
  * procedure call. */
class MaintenanceApplySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_ma_${tag}_")
    val cat = SparkSpec.uniqueCat(s"graft_ma_$tag")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  private def plan(cat: String, args: String = "")
      : Seq[(String, String)] =
    spark.sql(s"CALL $cat.system.maintenance_plan(table => 'db.t'$args)")
      .collect().map(r => (r.getString(0), r.getString(5))).toSeq

  private def apply0(cat: String, args: String = "")
      : Seq[(Int, String, String, String)] =
    spark.sql(s"CALL $cat.system.maintenance_apply(table => 'db.t'$args)")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq

  test("fragmented + backlogged + crashed-fold partitioned table " +
    "converges in ONE apply; VACUUM runs before OPTIMIZE; flagged " +
    "dirs batch into one IN-list call") {
    val (cat, wh) = freshCat("m")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 3 FROM range(90)")
    // fragment flags 0 and 2 (10 live files each)
    (0 until 9).foreach { i =>
      spark.sql(s"INSERT INTO $cat.db.t VALUES (${1000 + i}, 0)")
      spark.sql(s"INSERT INTO $cat.db.t VALUES (${2000 + i}, 2)")
    }
    // vector backlog everywhere, then turn flag=1's fold into a CRASHED
    // one (entries restored with pending intents — the mid-fold state)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 3")
    val d1 = wh.resolve("db").resolve("t").resolve("flag=1").toString
    val pre = AuditDeletes.entriesWithTs(d1)
    assert(pre.nonEmpty)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    AuditDeletes.replace(d1, pre, Map.empty, foldIntents = pre)
    // sanity: the composite state is what we think it is
    val before = plan(cat, ", vector_threshold => 2").toMap
    assert(before("flag=0") === "OPTIMIZE")
    assert(before("flag=1") === "VACUUM")
    assert(before("flag=2") === "OPTIMIZE")

    val rows = apply0(cat, ", vector_threshold => 2")
    // round 1: exactly one VACUUM (the crashed fold) then one batched
    // OPTIMIZE; VACUUM strictly first in execution order
    val r1 = rows.filter(_._1 == 1)
    assert(r1.map(_._3) === Seq("VACUUM", "OPTIMIZE"), rows)
    assert(r1.head._2 === "flag=1")
    assert(r1.head._4 ===
      s"CALL $cat.system.vacuum(table => 'db.t', " +
        "partition_filter => 'flag=1')")
    assert(r1(1)._2 === "2 dirs")
    assert(r1(1)._4 ===
      s"CALL $cat.system.optimize(table => 'db.t', " +
        "target_file_count => 1, partition_filter => 'flag IN (0,2)')")
    // converged on the re-plan
    val last = rows.last
    assert(last._3 === "none" && last._4.contains("converged"), rows)
    // the plan agrees, and not a row was lost: 90 + 18 inserted, ids
    // ending in 3 deleted (0-89: 9 of them; 1003 and 2003 too)
    assert(plan(cat, ", vector_threshold => 2").forall(_._2 === "none"))
    assert(spark.table(s"$cat.db.t").count() === (90 + 18 - 9 - 2).toLong)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE id % 10 = 3")
      .head().getLong(0) === 0L)
  }

  test("unpartitioned: backlog folds, fragmentation compacts, healthy " +
    "is a no-op one-row report") {
    val (cat, _) = freshCat("u")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    (0 until 9).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.t VALUES (${1000 + i}, 0)"))
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 3")
    val rows = apply0(cat, ", vector_threshold => 5")
    // VACUUM folds the 10 vectors, OPTIMIZE compacts, plan converges
    assert(rows.filter(_._1 == 1).map(_._3).toSet === Set("VACUUM"))
    assert(rows.exists(r => r._3 === "OPTIMIZE" && r._2 === "(table)"))
    assert(rows.last._3 === "none" && rows.last._4.contains("converged"))
    // 100 + 9 inserted; ids ending in 3 deleted (3,13,…,93 and 1003)
    assert(spark.table(s"$cat.db.t").count() === 98L)
    // a second apply is a pure no-op: one row, already converged
    val again = apply0(cat, ", vector_threshold => 5")
    assert(again === Seq((1, "(plan)", "none",
      "converged: every target healthy")))
  }
}
