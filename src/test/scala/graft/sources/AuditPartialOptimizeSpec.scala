package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PARTITION-FILTERED OPTIMIZE (`partition_filter => 'col=v'`): compact
  * only the matching directories — the operational shape at 100 TB,
  * where "compact yesterday's partition" must not rewrite the whole
  * table. Unselected directories keep their live entries, bases and
  * history untouched; every read/count/travel path already resolves
  * per directory. Mixed per-dir checkpoint epochs are a legitimate
  * state afterwards: RESTORE accepts any epoch at/after the newest
  * boundary (pure truncation) and names the mixed boundaries when
  * refusing earlier targets. */
class AuditPartialOptimizeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_pof_${tag}_")
    val cat = s"graft_pof_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("compacts only the selected partition; reads, counts, pruning " +
    "and travel stay exact on both sides") {
    val (cat, wh) = freshCat("sel")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    (0 until 3).foreach { w =>
      spark.sql(s"INSERT INTO $cat.db.t SELECT id + ${w * 100}, id % 2 " +
        "FROM range(100)")
    }
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 30 = 7") // both dirs
    val path = wh.resolve("db").resolve("t").toString
    val expected = spark.sql(
      s"SELECT id, flag FROM $cat.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val tPre = AuditPartition.listDirsByCols(path, Seq("flag"))
      .map { case (_, d) => AuditBase.maxVisibleTs(d.toString) }.max
    val d0 = wh.resolve("db/t/flag=0").toString
    val d1 = wh.resolve("db/t/flag=1").toString
    val live0Before = AuditBase.readManifest(d0).filterNot(_.folded)
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 2, partition_filter => 'flag=1')")
    // only flag=1 got a base; flag=0 keeps its live entries untouched
    assert(AuditBase.read(d0).isEmpty)
    assert(AuditBase.read(d1).isDefined)
    assert(AuditBase.readManifest(d0).filterNot(_.folded) === live0Before)
    assert(AuditBase.readManifest(d1).forall(_.folded))
    // content identical; metadata count and group count exact
    spark.catalog.refreshTable(s"$cat.db.t")
    val after = spark.sql(s"SELECT id, flag FROM $cat.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after === expected)
    val cnt = spark.sql(s"SELECT count(*) FROM $cat.db.t")
    assert(cnt.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(cnt.head.getLong(0) === expected.size.toLong)
    val g = spark.sql(
      s"SELECT flag, count(*) AS n FROM $cat.db.t GROUP BY flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g === expected.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
    // partition-pruned reads on both sides
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE flag = 0")
      .head.getLong(0) === expected.count(_._2 == 0L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE flag = 1")
      .head.getLong(0) === expected.count(_._2 == 1L))
    // commit-time travel still answers across the partial compaction
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tPre)").head.getLong(0)
      === expected.size.toLong)
    // a later FULL compaction converges the table
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 2)")
    assert(AuditBase.read(d0).isDefined)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
      === expected.size.toLong)
  }

  test("restore on mixed per-dir boundaries: truncation targets work, " +
    "earlier targets refuse naming the boundaries") {
    val (cat, wh) = freshCat("mix")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pof_mck")
    def wave(pages: Int): Unit = {
      val q = spark.readStream.format(classOf[PagedSource].getName)
        .option("pages", pages.toString).option("pageSize", "100")
        .option("pagesPerTrigger", "1")
        .load().selectExpr("id", "id % 2 AS flag")
        .writeStream.option("checkpointLocation", ckpt.toString)
        .outputMode("append").toTable(s"$cat.db.t")
      try q.processAllAvailable() finally q.stop()
    }
    sys.props("graft.audit.streamLeaseMs") = "1"
    try {
      wave(2) // epochs 0,1
      spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
        "partition_filter => 'flag=0')") // flag=0 through epoch 1
      wave(3) // epoch 2
      spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
        "partition_filter => 'flag=1')") // flag=1 through epoch 2
      val expected = spark.table(s"$cat.db.t").count()
      wave(4) // epoch 3 — the damage to undo
      // restore to epoch 2 (= max through): pure truncation, works
      spark.sql(s"CALL $cat.system.restore(table => 'db.t', version => 2)")
      spark.catalog.refreshTable(s"$cat.db.t")
      assert(spark.table(s"$cat.db.t").count() === expected)
      // an earlier target refuses, naming the mixed boundaries
      val ex = intercept[Exception](spark.sql(
        s"CALL $cat.system.restore(table => 'db.t', version => 1)").collect())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains("mixed boundaries")), ex.toString)
    } finally sys.props.remove("graft.audit.streamLeaseMs")
  }

  test("filter validation: unknown column, bucket column, no match, " +
    "unpartitioned table all refuse loudly") {
    val (cat, _) = freshCat("val")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 2 FROM range(20)")
    def refused(callArgs: String, what: String): Unit = {
      val ex = intercept[Exception](spark.sql(
        s"CALL $cat.system.optimize($callArgs)").collect())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains(what)), ex.toString)
    }
    refused("table => 'db.t', partition_filter => 'nope=1'",
      "not a partition column")
    refused("table => 'db.t', partition_filter => 'flag=7'",
      "matches no partition")
    spark.sql(s"CREATE TABLE $cat.db.b (id BIGINT, k BIGINT) " +
      "USING audit PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.db.b SELECT id, id FROM range(20)")
    refused("table => 'db.b', partition_filter => 'k=3'", "bucket column")
    spark.sql(s"CREATE TABLE $cat.db.u (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.u SELECT id FROM range(5)")
    refused("table => 'db.u', partition_filter => 'id=1'",
      "needs a partitioned table")
  }

  test("partition-filtered VACUUM folds and reclaims only the selected " +
    "directory") {
    val (cat, wh) = freshCat("vf")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 2 FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 5 = 3") // both dirs
    val d0 = wh.resolve("db/t/flag=0").toString
    val d1 = wh.resolve("db/t/flag=1").toString
    assert(AuditDeletes.entries(d0).size === 10)
    assert(AuditDeletes.entries(d1).size === 10)
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "partition_filter => 'flag=1')")
    val foldedOriginals1 = AuditBase.readManifest(d1)
      .filter(_.folded).map(_.file)
    assert(foldedOriginals1.nonEmpty)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      "partition_filter => 'flag=1')")
    // flag=1: vectors folded (absorbed by the base write? no — these
    // POST-compaction vectors target base-held rows and fold), folded
    // originals reclaimed
    assert(AuditDeletes.entries(d1).isEmpty)
    assert(AuditDeletes.foldedRows(d1) === 10L)
    assert(foldedOriginals1.forall(f =>
      !java.nio.file.Files.exists(wh.resolve("db/t/flag=1").resolve(f))))
    // flag=0: untouched — vectors positional, files on disk
    assert(AuditDeletes.entries(d0).size === 10)
    assert(AuditDeletes.foldedRows(d0) === 0L)
    assert(AuditBase.readManifest(d0).filterNot(_.folded).forall(e =>
      java.nio.file.Files.exists(wh.resolve("db/t/flag=0").resolve(e.file))))
    // counts exact on both sides
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
      === 80L)
    val g = spark.sql(
      s"SELECT flag, count(*) AS n FROM $cat.db.t GROUP BY flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g === Map(0L -> 40L, 1L -> 40L))
    // unpartitioned refusal
    spark.sql(s"CREATE TABLE $cat.db.u (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.u SELECT id FROM range(5)")
    val ex = intercept[Exception](spark.sql(
      s"CALL $cat.system.vacuum(table => 'db.u', " +
        "partition_filter => 'id=1')").collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("needs a partitioned table")), ex.toString)
  }

  test("range and IN selectors compact a multi-dir window in ONE call; " +
    "raced appends into unselected dirs proceed, into selected abort") {
    val (cat, wh) = freshCat("rng")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, day BIGINT) " +
      "USING audit PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 7 FROM range(140)")
    def based: Set[Long] = (0L to 6L).filter(d => AuditBase.read(
      wh.resolve(s"db/t/day=$d").toString).isDefined).toSet
    // bounded range, ONE call, with an append racing into day=6
    // (UNSELECTED): the compaction is none of its business — proceeds
    AuditMaintenance.afterCheckHook = Some(() => {
      AuditMaintenance.afterCheckHook = None
      spark.sql(s"INSERT INTO $cat.db.t VALUES (9000, 6)")
    })
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 2, partition_filter => " +
      "'day >= 3, day <= 5')")
    assert(based === Set(3L, 4L, 5L), s"range selected $based")
    assert(spark.table(s"$cat.db.t").count() === 141L)
    // IN-list with an append racing into day=0 (SELECTED, lands after
    // the staged tree was built): aborts loudly, nothing changed
    AuditMaintenance.afterStageHook = Some(() => {
      AuditMaintenance.afterStageHook = None
      spark.sql(s"INSERT INTO $cat.db.t VALUES (9001, 0)")
    })
    val ex = intercept[Exception](spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', " +
        "partition_filter => 'day IN (0,6)')").collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("concurrent append")), ex.toString)
    assert(based === Set(3L, 4L, 5L))
    // clean retry of the IN-list: exactly days 0 and 6 join
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "partition_filter => 'day IN (0,6)')")
    assert(based === Set(0L, 3L, 4L, 5L, 6L))
    assert(spark.table(s"$cat.db.t").count() === 142L)
    val g = spark.sql(
      s"SELECT day, count(*) AS n FROM $cat.db.t GROUP BY day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g === (0L to 6L).map(d =>
      (d, 20L + (if (d == 0L || d == 6L) 1L else 0L))).toMap)
    // partition-filtered VACUUM accepts the same selector forms
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 20 = 4")
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      "partition_filter => 'day <= 1')")
    val foldedDirs = (0L to 6L).filter(d => AuditDeletes.foldedRows(
      wh.resolve(s"db/t/day=$d").toString) > 0).toSet
    assert(foldedDirs.nonEmpty && foldedDirs.subsetOf(Set(0L, 1L)),
      s"VACUUM range selector folded outside the window: $foldedDirs")
  }

  test("multi-level layout: a range on the outer level conjoins with " +
    "an equality on the inner one") {
    val (cat, wh) = freshCat("ml")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, day BIGINT, " +
      "region STRING) USING audit PARTITIONED BY (day, region)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 4, " +
      "CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END FROM range(80)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1, partition_filter => " +
      "'day >= 1, day <= 2, region=eu')")
    val based = AuditPartition.listDirsByCols(path = wh.resolve("db/t")
        .toString, Seq("day", "region"))
      .collect { case (rel, d) if AuditBase.read(d.toString).isDefined => rel }
    // day∈{1,2} × region=eu — but eu rows are even ids, so day = id%4 of
    // an even id is 0 or 2: only day=2/region=eu exists AND matches
    assert(based === Seq("day=2/region=eu"), based)
    assert(spark.table(s"$cat.db.t").count() === 80L)
    val g = spark.sql(s"SELECT day, region, count(*) AS n FROM $cat.db.t " +
      "GROUP BY day, region ORDER BY day, region")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // parity couples the levels: even ids (eu) land on days 0/2, odd
    // (us) on 1/3 — four combos of 20 rows each
    assert(g.length === 4 && g.forall(_._3 === 20L), g.mkString(";"))
  }

  test("zorder_by composes with partition_filter: the selected window " +
    "is z-ordered (tight per-file bounds), others untouched") {
    val (cat, wh) = freshCat("zpf")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT, day BIGINT) " +
      "USING audit PARTITIONED BY (day)")
    // interleave ids so an unsorted file spans the full id range
    spark.sql(s"INSERT INTO $cat.db.t SELECT " +
      "CASE WHEN id % 2 = 0 THEN id ELSE 9999 - id END, id * 3, id % 4 " +
      "FROM range(2000)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 8, zorder_by => 'id,v', " +
      "partition_filter => 'day >= 2, day <= 3')")
    val based = (0L to 3L).filter(d => AuditBase.read(
      wh.resolve(s"db/t/day=$d").toString).isDefined)
    assert(based === Seq(2L, 3L))
    // z-order delivered: per-file id bounds in the compacted WINDOW are
    // tighter than the full range (an unsorted rewrite would leave
    // every file spanning ~0..9999). Range-partition boundary sampling
    // may split the 8 partitions unevenly across the two dirs, so
    // assert over the union of both selected dirs.
    val bounds = Seq(2L, 3L).flatMap { d =>
      AuditStats.read(wh.resolve(s"db/t/day=$d").toString).collect {
        case (f, st) if f.startsWith("base-") && st.ints.contains("id") =>
          st.ints("id")
      }
    }
    assert(bounds.size > 2, s"expected several base files, got $bounds")
    val widths = bounds.map { case (lo, hi) => hi - lo }
    assert(widths.min < 5000,
      s"z-order left every file spanning the full id range: $bounds")
    // correctness unchanged across the mixed state
    assert(spark.table(s"$cat.db.t").count() === 2000L)
    assert(spark.sql(s"SELECT sum(id) FROM $cat.db.t").head.getLong(0)
      === (0L until 2000L).map(i =>
        if (i % 2 == 0) i else 9999L - i).sum)
  }

  test("range selector on a STRING partition column orders like Spark " +
    "(UTF8 binary), and malformed entries refuse loudly") {
    val (cat, wh) = freshCat("str")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, day STRING) " +
      "USING audit PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, " +
      "concat('2024-01-0', CAST(id % 5 + 1 AS STRING)) FROM range(50)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "partition_filter => " +
      "'day >= 2024-01-02, day <= 2024-01-04')")
    val based = (1 to 5).map(d => s"2024-01-0$d").filter(d =>
      AuditBase.read(wh.resolve(s"db/t/day=$d").toString).isDefined)
    assert(based === Seq("2024-01-02", "2024-01-03", "2024-01-04"))
    assert(spark.table(s"$cat.db.t").count() === 50L)
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    val bad = intercept[Exception](spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', " +
        "partition_filter => 'day ~ x')").collect())
    assert(chain(bad).exists(t => t.getMessage != null &&
      t.getMessage.contains("is not")), bad.toString)
    val none = intercept[Exception](spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', " +
        "partition_filter => 'day > 2025-01-01')").collect())
    assert(chain(none).exists(t => t.getMessage != null &&
      t.getMessage.contains("matches no partition")), none.toString)
  }

  test("an append racing into the SELECTED partition aborts the " +
    "compaction; one into an unselected partition does not") {
    val (cat, wh) = freshCat("race")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 2 FROM range(100)")
    val path = wh.resolve("db").resolve("t").toString
    // raced insert into flag=0 while compacting flag=1: NOT aborted
    AuditMaintenance.afterCheckHook = Some(() => {
      AuditMaintenance.afterCheckHook = None
      spark.sql(s"INSERT INTO $cat.db.t VALUES (9000, 0)")
    })
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "partition_filter => 'flag=1')")
    assert(AuditBase.read(wh.resolve("db/t/flag=1").toString).isDefined)
    assert(spark.table(s"$cat.db.t").count() === 101L)
    // raced insert into the SELECTED dir: aborts, nothing changed
    AuditMaintenance.afterStageHook = Some(() => {
      AuditMaintenance.afterStageHook = None
      spark.sql(s"INSERT INTO $cat.db.t VALUES (9001, 0)")
    })
    val ex = intercept[Exception](spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', " +
        "partition_filter => 'flag=0')").collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("concurrent append")), ex.toString)
    assert(AuditBase.read(wh.resolve("db/t/flag=0").toString).isEmpty)
    assert(spark.table(s"$cat.db.t").count() === 102L)
  }
}
