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

  test("multi-level layout: flagged dirs sharing a prefix batch into " +
    "one 'day=d, region IN (…)' call; lone dirs go per-dir") {
    val (cat, _) = freshCat("ml")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, day BIGINT, " +
      "region BIGINT) USING audit PARTITIONED BY (day, region)")
    spark.sql(s"INSERT INTO $cat.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, id % 2, id % 3 FROM range(60)")
    // fragment (day=0,region=0), (day=0,region=1) — shared prefix —
    // and (day=1,region=2) — a loner
    (0 until 9).foreach { i =>
      spark.sql(s"INSERT INTO $cat.db.t VALUES (${1000 + i}, 0, 0)")
      spark.sql(s"INSERT INTO $cat.db.t VALUES (${2000 + i}, 0, 1)")
      spark.sql(s"INSERT INTO $cat.db.t VALUES (${3000 + i}, 1, 2)")
    }
    // the plan names the prefix batch
    val planRows = spark.sql(
      s"CALL $cat.system.maintenance_plan(table => 'db.t')").collect()
      .map(r => (r.getString(0), r.getString(5), r.getString(6)))
    val batchRow = planRows.filter(_._1 == "(batch)")
    assert(batchRow.length === 1, planRows.mkString("\n"))
    assert(batchRow.head._3.contains(
      "partition_filter => 'day=0,region IN (0,1)'"), batchRow.head)
    val rows = apply0(cat)
    val r1 = rows.filter(_._1 == 1)
    assert(r1.map(r => (r._2, r._3)) ===
      Seq(("2 dirs", "OPTIMIZE"), ("day=1/region=2", "OPTIMIZE")), rows)
    assert(r1.head._4.contains(
      "partition_filter => 'day=0,region IN (0,1)'"), r1.head)
    assert(r1(1)._4.contains(
      "partition_filter => 'day=1,region=2'"), r1(1))
    assert(rows.last._3 === "none" && rows.last._4.contains("converged"))
    assert(spark.table(s"$cat.db.t").count() === 87L)
  }

  test("bucket-level layout: dirs are not selector-addressable — apply " +
    "falls back to ONE whole-table call and still converges") {
    val (cat, _) = freshCat("b")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, k BIGINT) " +
      "USING audit PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, id FROM range(40)")
    // same k → same bucket dir: that one dir collects 10 live files
    (0 until 9).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.t VALUES (${1000 + i}, 77)"))
    // the plan flags fragmented bucket dirs WITHOUT a selector and says
    // why; apply must not emit a refusing partition_filter call
    val planRows = spark.sql(
      s"CALL $cat.system.maintenance_plan(table => 'db.t')").collect()
      .map(r => (r.getString(0), r.getString(5), r.getString(6)))
    assert(planRows.exists(r => r._2 == "OPTIMIZE" &&
      r._3.contains("whole-table")), planRows.mkString("\n"))
    assert(!planRows.exists(_._3.contains("partition_filter")),
      planRows.mkString("\n"))
    val rows = apply0(cat)
    val opt = rows.filter(_._3 == "OPTIMIZE")
    assert(opt.map(_._2) === Seq("(table)"), rows)
    assert(!opt.head._4.contains("partition_filter"), opt.head)
    assert(rows.last._3 === "none" && rows.last._4.contains("converged"))
    assert(spark.table(s"$cat.db.t").count() === 49L)
  }

  test("non-convergence inside max_rounds reports 'stuck' instead of " +
    "claiming success") {
    val (cat, _) = freshCat("s")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    (0 until 9).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.t VALUES (${1000 + i}, 0)"))
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 3")
    // needs two action rounds (VACUUM then OPTIMIZE) + a verify round;
    // max_rounds => 1 executes only the VACUUM
    val rows = apply0(cat, ", vector_threshold => 5, max_rounds => 1")
    assert(rows.map(_._3) === Seq("VACUUM", "stuck"), rows)
    assert(rows.last._4.contains("1 actionable"), rows.last)
    // a follow-up apply with room finishes the job
    val again = apply0(cat, ", vector_threshold => 5")
    assert(again.last._3 === "none" &&
      again.last._4.contains("converged"), again)
  }

  test("namespace wildcard 'db.*': plan lists every audit table " +
    "(non-audit catalog tables skipped), apply heals them all in one CALL") {
    val (cat, _) = freshCat("w")
    spark.sql(s"CREATE TABLE $cat.db.frag (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.frag SELECT id, id FROM range(50)")
    (0 until 9).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.frag VALUES (${1000 + i}, 0)"))
    spark.sql(s"CREATE TABLE $cat.db.ok (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.ok SELECT id FROM range(10)")
    // a non-audit catalog table in the same namespace: must be SKIPPED
    spark.sql(s"CREATE TABLE $cat.db.pg USING paged " +
      "OPTIONS (pages '2', pageSize '10')")
    val plan = spark.sql(
      s"CALL $cat.system.maintenance_plan(table => 'db.*')").collect()
      .map(r => (r.getString(0), r.getString(5))).toSeq
    assert(plan.toSet === Set(("db.frag:(table)", "OPTIMIZE"),
      ("db.ok:(table)", "none")), plan)
    val rows = spark.sql(
      s"CALL $cat.system.maintenance_apply(table => 'db.*')").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    assert(rows.exists(r => r._2 === "db.frag:(table)" &&
      r._3 === "OPTIMIZE" &&
      r._4 === s"CALL $cat.system.optimize(table => 'db.frag', " +
        "target_file_count => 1)"), rows)
    // both tables converge; the healthy one is a pure no-op report
    assert(rows.filter(_._3 === "none").map(_._2).toSet ===
      Set("db.frag:(plan)", "db.ok:(plan)"), rows)
    assert(spark.table(s"$cat.db.frag").count() === 59L)
    // re-plan: everything healthy
    assert(spark.sql(s"CALL $cat.system.maintenance_plan(table => 'db.*')")
      .collect().forall(_.getString(5) == "none"))
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

  test("wildcard apply heals tables CONCURRENTLY on the bounded pool " +
    "(observed overlap via the test seam); results stay table-ordered") {
    val (cat, _) = freshCat("cc")
    (1 to 3).foreach { i =>
      spark.sql(s"CREATE TABLE $cat.db.t$i (id BIGINT, v BIGINT) USING audit")
      (0 until 10).foreach(j => spark.sql(
        s"INSERT INTO $cat.db.t$i VALUES ($j, $j)"))
    }
    // two heals must be IN onTableApply at once: a 2-party barrier trips
    // only when a second worker arrives while the first still waits —
    // impossible on the old sequential loop (each would time out alone)
    @volatile var overlapped = false
    val gate = new java.util.concurrent.CyclicBarrier(2,
      () => overlapped = true)
    GraftProcedures.onTableApply = { _ =>
      if (!overlapped)
        try { gate.await(10, java.util.concurrent.TimeUnit.SECONDS); () }
        catch { case _: Exception => () }
    }
    try {
      val rows = spark.sql(
        s"CALL $cat.system.maintenance_apply(table => 'db.*')").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3))).toSeq
      assert(overlapped, "wildcard heals must overlap on the pool")
      // every table converged, rows reported in deterministic table order
      val planRows = rows.filter(_._2.endsWith(":(plan)"))
      assert(planRows.map(_._2) ===
        Seq("db.t1:(plan)", "db.t2:(plan)", "db.t3:(plan)"), rows)
      assert(planRows.forall(_._3 == "none"), rows)
      (1 to 3).foreach { i =>
        assert(spark.table(s"$cat.db.t$i").count() === 10L)
        assert(spark.sql(s"SELECT sum(id) FROM $cat.db.t$i")
          .head.getLong(0) === 45L)
      }
      // stuck reporting is unchanged by the pool: max_concurrency => 1
      // takes the sequential path and converges identically
      val seq1 = spark.sql(s"CALL $cat.system.maintenance_apply(" +
        "table => 'db.*', max_concurrency => 1)").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      assert(seq1 === Seq("db.t1:(plan)", "db.t2:(plan)", "db.t3:(plan)")
        .map((_, "none")), seq1)
    } finally GraftProcedures.onTableApply = _ => ()
  }

  test("byte-aware apply: small-file fragments under the file-count bar " +
    "compact only when small_file_bytes asks for it") {
    val (cat, _) = freshCat("by")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, id FROM range(400)")
    (0 until 5).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.t VALUES (${1000 + i}, 0)"))
    // 6 files ≤ default max_live_files=8: count-based apply is a no-op
    val plain = apply0(cat)
    assert(plain === Seq((1, "(plan)", "none",
      "converged: every target healthy")), plain)
    // byte-aware: the 5 single-row files are fragments → one OPTIMIZE
    val rows = apply0(cat, ", small_file_bytes => 500")
    assert(rows.exists(r => r._1 == 1 && r._3 == "OPTIMIZE"), rows)
    assert(rows.last._3 === "none" && rows.last._4.contains("converged"))
    assert(spark.table(s"$cat.db.t").count() === 405L)
  }
}
