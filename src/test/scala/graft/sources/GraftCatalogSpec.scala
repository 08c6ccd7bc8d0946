package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GraftCatalog (DSv2 TableCatalog): full SQL DDL/DML round trips over the
  * custom connectors, and `VERSION AS OF` time travel resolving through the
  * audit sink's `_EPOCHS` commit log. */
class GraftCatalogSpec extends SparkSpec {
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_wh")
  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh.toString)
  }

  test("paged DDL round trip: CREATE / SELECT with pushdown / SHOW / DROP") {
    init()
    spark.sql(
      "CREATE TABLE graft.db.plays USING paged OPTIONS (pages '4', pageSize '100')")
    assert(spark.sql("SELECT count(*) FROM graft.db.plays").head.getLong(0) === 400L)
    // the catalog table is the same connector: id pushdown still prunes
    val sliced = spark.sql(
      "SELECT count(*) FROM graft.db.plays WHERE id >= 150 AND id < 250")
    assert(sliced.head.getLong(0) === 100L)
    val tables = spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1))
    assert(tables.contains("plays"))
    spark.sql("DROP TABLE graft.db.plays")
    intercept[Exception](spark.sql("SELECT count(*) FROM graft.db.plays").collect())
  }

  test("audit DDL+DML round trip: CREATE / INSERT / append INSERT / SELECT / DROP") {
    init()
    spark.sql("CREATE TABLE graft.db.log (id BIGINT, msg STRING) USING audit")
    spark.sql("INSERT INTO graft.db.log VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT * FROM graft.db.log").count() === 2L)
    // a second INSERT must extend the manifest, not clobber the first commit
    spark.sql("INSERT INTO graft.db.log VALUES (3, 'c')")
    val rows = spark.sql("SELECT id, msg FROM graft.db.log ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql("DROP TABLE graft.db.log")
    assert(!new java.io.File(s"$wh/db/log").exists())
  }

  test("COUNT(*) is answered from the manifests without reading data files") {
    init()
    spark.sql("CREATE TABLE graft.db.cnt_t (id BIGINT, msg STRING) USING audit")
    spark.sql("INSERT INTO graft.db.cnt_t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val q = spark.sql("SELECT count(*) FROM graft.db.cnt_t")
    assert(q.queryExecution.executedPlan.toString.contains("AuditCountScan"),
      q.queryExecution.executedPlan.toString.take(1200))
    assert(q.head.getLong(0) === 3L)
    // counts stay exact through append, metadata delete, and rewrite delete
    spark.sql("INSERT INTO graft.db.cnt_t VALUES (4, 'd')")
    assert(spark.sql("SELECT count(*) FROM graft.db.cnt_t").head.getLong(0) === 4L)
    spark.sql("DELETE FROM graft.db.cnt_t WHERE id <= 1")
    assert(spark.sql("SELECT count(*) FROM graft.db.cnt_t").head.getLong(0) === 3L)
    spark.sql("DELETE FROM graft.db.cnt_t WHERE id % 2 = 0")
    assert(spark.sql("SELECT count(*) FROM graft.db.cnt_t").head.getLong(0) === 1L)
    // a residual WHERE blocks the pushdown — row-level count stays exact
    val filtered = spark.sql("SELECT count(*) FROM graft.db.cnt_t WHERE msg = 'c'")
    assert(!filtered.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(filtered.head.getLong(0) === 1L)
    // empty table: complete pushdown must still yield the 0 row
    spark.sql("TRUNCATE TABLE graft.db.cnt_t")
    assert(spark.sql("SELECT count(*) FROM graft.db.cnt_t").head.getLong(0) === 0L)
    spark.sql("DROP TABLE graft.db.cnt_t")
  }

  test("CTAS and REPLACE TABLE are atomic: failures leave no trace / the old table") {
    init()
    // a failing CTAS must not create the table (staged data discarded)
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft.db.atomic_t USING audit AS
          |SELECT CAST(id AS BIGINT) AS id,
          |       CAST(raise_error('boom') AS STRING) AS msg
          |FROM range(3)""".stripMargin)
    }
    intercept[Exception](
      spark.sql("SELECT count(*) FROM graft.db.atomic_t").collect())
    // successful CTAS publishes atomically
    spark.sql(
      """CREATE TABLE graft.db.atomic_t USING audit AS
        |SELECT CAST(id AS BIGINT) AS id FROM range(3)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.db.atomic_t")
      .head.getLong(0) === 3L)
    // a failing REPLACE leaves the OLD table fully intact
    intercept[Exception] {
      spark.sql(
        """REPLACE TABLE graft.db.atomic_t USING audit AS
          |SELECT CAST(raise_error('boom') AS BIGINT) AS id FROM range(9)""".stripMargin)
    }
    assert(spark.sql("SELECT count(*) FROM graft.db.atomic_t")
      .head.getLong(0) === 3L)
    // a successful REPLACE swaps data and schema in one step
    spark.sql(
      """REPLACE TABLE graft.db.atomic_t USING audit AS
        |SELECT CAST(id AS BIGINT) AS id, CAST(id AS DOUBLE) AS score
        |FROM range(5)""".stripMargin)
    val rows = spark.sql("SELECT id, score FROM graft.db.atomic_t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq === (0L until 5L).map(i => (i, i.toDouble)))
    // no staged litter left behind in the namespace dir
    val ns = java.nio.file.Paths.get(s"$wh/db")
    val listing = java.nio.file.Files.list(ns)
    val staged = try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .count(_.getFileName.toString.contains(".staged."))
    } finally listing.close()
    assert(staged === 0, "staging directories must not survive commit/abort")
    spark.sql("DROP TABLE graft.db.atomic_t")
  }

  test("ALTER TABLE ADD COLUMN evolves the schema; old rows read null") {
    init()
    spark.sql("CREATE TABLE graft.db.ev (id BIGINT, msg STRING) USING audit")
    spark.sql("INSERT INTO graft.db.ev VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.db.ev ADD COLUMN score DOUBLE")
    // rows committed under the old schema surface null for the new column
    val old = spark.sql("SELECT id, msg, score FROM graft.db.ev ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(old.toSeq === Seq((1L, "a", null), (2L, "b", null)))
    // new writes carry the full schema; reads mix both vintages
    spark.sql("INSERT INTO graft.db.ev VALUES (3, 'c', 1.5)")
    val mixed = spark.sql(
      "SELECT id, score FROM graft.db.ev WHERE score IS NOT NULL")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(mixed.toSeq === Seq((3L, 1.5)))
    // 3VL holds across vintages: score > 1 is UNKNOWN for old rows
    spark.sql("DELETE FROM graft.db.ev WHERE score > 1.0")
    assert(spark.sql("SELECT id FROM graft.db.ev ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // destructive changes stay loud errors
    intercept[Exception](spark.sql("ALTER TABLE graft.db.ev DROP COLUMN msg"))
    spark.sql("DROP TABLE graft.db.ev")
  }

  test("ALTER COLUMN: widening TYPE, nullability, comment, position") {
    init()
    spark.sql("CREATE TABLE graft.db.ac (x INT, y BIGINT, " +
      "z STRING NOT NULL) USING audit")
    spark.sql("INSERT INTO graft.db.ac VALUES (5, 50, 'a'), (7, 70, 'b')")
    // widening INT -> BIGINT: no rewrite, old literals re-parse
    spark.sql("ALTER TABLE graft.db.ac ALTER COLUMN x TYPE BIGINT")
    assert(spark.table("graft.db.ac").schema("x").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(spark.sql("SELECT sum(x) FROM graft.db.ac").head.getLong(0) === 12L)
    // values beyond INT range now insertable
    spark.sql("INSERT INTO graft.db.ac VALUES (3000000000, 1, 'c')")
    assert(spark.sql("SELECT max(x) FROM graft.db.ac").head.getLong(0)
      === 3000000000L)
    // filters over the widened column still skip via stats/blooms soundly
    assert(spark.sql("SELECT count(*) FROM graft.db.ac WHERE x = 5")
      .head.getLong(0) === 1L)
    // narrowing refused (Spark's analyzer up-cast rule fires first)
    val exN = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.ac ALTER COLUMN y TYPE INT"))
    assert(exN.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      exN.getMessage.contains("WIDENING"), exN.getMessage)
    // long -> double passes Spark's up-cast rule but is LOSSY past 2^53
    // — the catalog-side widening guard refuses it
    val exD = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.ac ALTER COLUMN y TYPE DOUBLE"))
    assert(exD.getMessage.contains("WIDENING"), exD.getMessage)
    // DROP NOT NULL relaxes; Spark's analyzer categorically refuses
    // tightening via SQL (the catalog-side validation stays for the
    // direct TableChange API)
    assert(!spark.table("graft.db.ac").schema("z").nullable)
    spark.sql("ALTER TABLE graft.db.ac ALTER COLUMN z DROP NOT NULL")
    assert(spark.table("graft.db.ac").schema("z").nullable)
    spark.sql("INSERT INTO graft.db.ac VALUES (1, 1, NULL)")
    val exNN = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.ac ALTER COLUMN z SET NOT NULL"))
    assert(exNN.getMessage.contains("non-nullable"), exNN.getMessage)
    // comment is pure metadata
    spark.sql("ALTER TABLE graft.db.ac ALTER COLUMN z COMMENT 'the label'")
    assert(spark.table("graft.db.ac").schema("z")
      .getComment().contains("the label"))
    // reorder is refused LOUDLY: schema order is the storage write order
    // (the single-pass parser reads keys in that order per vintage) —
    // silently nulling displaced columns would be corruption
    val exPos = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.ac ALTER COLUMN z FIRST"))
    assert(exPos.getMessage.contains("presentation order"), exPos.getMessage)
    assert(spark.sql("SELECT x, z FROM graft.db.ac WHERE x = 7")
      .head.toSeq === Seq(7L, "b"))
    spark.sql("DROP TABLE graft.db.ac")
  }

  test("CTAS and DESCRIBE work through the catalog") {
    init()
    spark.sql(
      """CREATE TABLE graft.db.ctas USING audit AS
        |SELECT CAST(id AS BIGINT) AS id, CAST(id * 2 AS DOUBLE) AS dbl
        |FROM range(5)""".stripMargin)
    val rows = spark.sql("SELECT id, dbl FROM graft.db.ctas ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === (0L until 5L).map(i => (i, i * 2.0)))
    val desc = spark.sql("DESCRIBE TABLE graft.db.ctas").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("id").contains("bigint") && desc.get("dbl").contains("double"))
    spark.sql("DROP TABLE graft.db.ctas")
  }

  test("TRUNCATE TABLE and INSERT OVERWRITE reset the committed set") {
    init()
    spark.sql("CREATE TABLE graft.db.trunc_t (id BIGINT) USING audit")
    spark.sql("INSERT INTO graft.db.trunc_t VALUES (1), (2), (3)")
    spark.sql("TRUNCATE TABLE graft.db.trunc_t")
    assert(spark.sql("SELECT count(*) FROM graft.db.trunc_t").head.getLong(0) === 0L)
    spark.sql("INSERT INTO graft.db.trunc_t VALUES (10), (11)")
    spark.sql("INSERT OVERWRITE graft.db.trunc_t VALUES (7)")
    assert(spark.sql("SELECT id FROM graft.db.trunc_t").collect()
      .map(_.getLong(0)).toSeq === Seq(7L))
    spark.sql("DROP TABLE graft.db.trunc_t")
  }

  test("DELETE FROM is copy-on-write and retroactive across versions") {
    init()
    spark.sql("CREATE TABLE graft.db.del_t (id BIGINT, msg STRING) USING audit")
    spark.sql(
      "INSERT INTO graft.db.del_t VALUES (1, 'a'), (2, 'b'), (3, NULL), (4, 'd')")
    // null msg must NOT match msg = 'x' (3-valued logic) — only id prunes
    spark.sql("DELETE FROM graft.db.del_t WHERE id < 2 OR msg = 'd'")
    val rows = spark.sql("SELECT id FROM graft.db.del_t ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    // a NULL in an IN list is UNKNOWN for non-matching rows, true for
    // matching ones — only id=2 goes
    spark.sql("DELETE FROM graft.db.del_t WHERE id IN (2, NULL)")
    assert(spark.sql("SELECT id FROM graft.db.del_t").collect()
      .map(_.getLong(0)).toSeq === Seq(3L))
    // manifest row counts were refreshed: a fresh read agrees
    assert(spark.sql("SELECT count(*) FROM graft.db.del_t").head.getLong(0) === 1L)
    spark.sql("DROP TABLE graft.db.del_t")

    // epoch-committed history: the delete rewrites every version
    spark.sql("CREATE TABLE graft.db.del_s (id BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_del_ckpt")
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "2").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"))
      .writeStream.format(classOf[JsonAuditSink].getName)
      .option("path", s"$wh/db/del_s")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.sql("DELETE FROM graft.db.del_s WHERE id >= 150")
    assert(spark.sql("SELECT count(*) FROM graft.db.del_s").head.getLong(0) === 150L)
    // retroactive hard delete: epoch 1's history lost its purged rows too,
    // epoch 0 (ids 0..99) is untouched
    assert(spark.sql("SELECT count(*) FROM graft.db.del_s VERSION AS OF 1")
      .head.getLong(0) === 150L)
    assert(spark.sql("SELECT count(*) FROM graft.db.del_s VERSION AS OF 0")
      .head.getLong(0) === 100L)
    // a predicate the metadata path can't translate falls through to the
    // row-level rewrite (copy-on-write) instead of failing
    spark.sql("DELETE FROM graft.db.del_s WHERE id % 2 = 0")
    assert(spark.sql("SELECT count(*) FROM graft.db.del_s").head.getLong(0) === 75L)
    spark.sql("DROP TABLE graft.db.del_s")
  }

  test("UPDATE and MERGE INTO rewrite through the row-level operation") {
    init()
    spark.sql("CREATE TABLE graft.db.mrg (id BIGINT, msg STRING) USING audit")
    spark.sql("INSERT INTO graft.db.mrg VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("UPDATE graft.db.mrg SET msg = 'x' WHERE id = 2")
    def state() = spark.sql("SELECT id, msg FROM graft.db.mrg ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state() === Seq((1L, "a"), (2L, "x"), (3L, "c")))
    spark.sql(
      """MERGE INTO graft.db.mrg t
        |USING (SELECT * FROM VALUES (2, 'B'), (4, 'D') AS s(id, msg)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.msg = s.msg
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state() === Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    spark.sql("DROP TABLE graft.db.mrg")
  }

  test("VERSION AS OF resolves through the epoch log via the catalog") {
    init()
    spark.sql("CREATE TABLE graft.db.events_tt (id BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cat_ckpt")
    // 4 streamed epochs land in the catalog table's data dir
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "4").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"))
      .writeStream.format(classOf[JsonAuditSink].getName)
      .option("path", s"$wh/db/events_tt")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT count(*) FROM graft.db.events_tt")
      .head.getLong(0) === 400L)
    assert(spark.sql("SELECT count(*) FROM graft.db.events_tt VERSION AS OF 1")
      .head.getLong(0) === 200L)
    assert(spark.sql("SELECT max(id) FROM graft.db.events_tt VERSION AS OF 0")
      .head.getLong(0) === 99L)
    // _epoch metadata column: every row knows its commit epoch
    val byEpoch = spark.sql(
      """SELECT _epoch, count(*) AS n, min(id) AS lo, max(id) AS hi
        |FROM graft.db.events_tt GROUP BY _epoch ORDER BY _epoch""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(byEpoch.toSeq === (0 to 3).map(e =>
      (e.toLong, 100L, e * 100L, e * 100L + 99L)))
    spark.sql("DROP TABLE graft.db.events_tt")
  }

  test("TIMESTAMP AS OF resolves commit times through the epoch log") {
    init()
    spark.sql("CREATE TABLE graft.db.events_ts (id BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cat_tsck")
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "3").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"))
      .writeStream.format(classOf[JsonAuditSink].getName)
      .option("path", s"$wh/db/events_ts")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val tsByEpoch = AuditScan.epochTimestamps(s"$wh/db/events_ts")
    assert(tsByEpoch.keySet === Set(0L, 1L, 2L),
      "every streamed epoch must record its commit time")
    // at (or after) the LAST commit time: the full table
    val tLast = tsByEpoch.values.max
    assert(spark.sql("SELECT count(*) FROM graft.db.events_ts " +
      s"TIMESTAMP AS OF timestamp_millis(${tLast + 1})").head.getLong(0)
      === 300L)
    // BEFORE the first commit: loud, never silently empty/latest
    val tFirst = tsByEpoch.values.min
    val ex = intercept[Exception](spark.sql(
      "SELECT count(*) FROM graft.db.events_ts " +
        s"TIMESTAMP AS OF timestamp_millis(${tFirst - 1000})").collect())
    assert(ex.getMessage.contains("no epoch committed"), ex.getMessage)
    // mid-stream resolution (only checkable when commit millis differ)
    if (tsByEpoch(0L) < tsByEpoch(1L))
      assert(spark.sql("SELECT count(*) FROM graft.db.events_ts " +
        s"TIMESTAMP AS OF timestamp_millis(${tsByEpoch(0L)})")
        .head.getLong(0) === 100L)
    // the DataFrame reader option routes through the same resolution
    val viaOption = spark.read
      .option("timestampAsOf", java.time.Instant.ofEpochMilli(tLast + 1)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString
        .replace('T', ' '))
      .table("graft.db.events_ts")
    assert(viaOption.count() === 300L)
    spark.sql("DROP TABLE graft.db.events_ts")

    // resolver unit check over a handcrafted epoch log: exact boundary
    // semantics independent of real commit timing
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_unit")
    java.nio.file.Files.write(dir.resolve("_EPOCHS"),
      ("""{"epoch":0,"files":1,"rows":10,"ts":1000}""" + "\n" +
        """{"epoch":1,"files":1,"rows":10,"ts":2000}""" + "\n" +
        """{"epoch":2,"files":1,"rows":10,"ts":2000}""" + "\n" +
        """{"epoch":3,"files":1,"rows":10,"ts":3500}""" + "\n")
        .getBytes("UTF-8"))
    assert(AuditScan.epochAt(dir.toString, 1000L) === 0L) // inclusive
    assert(AuditScan.epochAt(dir.toString, 1999L) === 0L)
    assert(AuditScan.epochAt(dir.toString, 2000L) === 2L) // ties → max epoch
    assert(AuditScan.epochAt(dir.toString, 9999L) === 3L)
    val ex2 = intercept[IllegalArgumentException](
      AuditScan.epochAt(dir.toString, 999L))
    assert(ex2.getMessage.contains("no epoch committed"))
    // a LEGACY log (no ts anywhere) refuses rather than guessing
    java.nio.file.Files.write(dir.resolve("_EPOCHS"),
      ("""{"epoch":0,"files":1,"rows":10}""" + "\n").getBytes("UTF-8"))
    val ex3 = intercept[IllegalArgumentException](
      AuditScan.epochAt(dir.toString, 99999L))
    assert(ex3.getMessage.contains("pre-ts"), ex3.getMessage)

    // PARTITIONED table: the streaming commit writes the same
    // table-level _EPOCHS log, so TIMESTAMP AS OF pins identically
    spark.sql("CREATE TABLE graft.db.events_tsp (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_cat_tsck2")
    val q2 = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "2").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"), (col("id") % 3).as("flag"))
      .writeStream.option("checkpointLocation", ckpt2.toString)
      .outputMode("append").toTable("graft.db.events_tsp")
    try q2.processAllAvailable() finally q2.stop()
    val pts = AuditScan.epochTimestamps(s"$wh/db/events_tsp")
    assert(pts.keySet === Set(0L, 1L))
    assert(spark.sql("SELECT count(*) FROM graft.db.events_tsp " +
      s"TIMESTAMP AS OF timestamp_millis(${pts.values.max + 1})")
      .head.getLong(0) === 200L)
    // pinned + partition-pruned composes
    assert(spark.sql("SELECT count(*) FROM graft.db.events_tsp " +
      s"TIMESTAMP AS OF timestamp_millis(${pts.values.max + 1}) " +
      "WHERE flag = 1").head.getLong(0) === 67L)
    spark.sql("DROP TABLE graft.db.events_tsp")
  }

  test("DELETE by INT-column predicate takes the metadata path without a cast crash") {
    init()
    spark.sql("CREATE TABLE graft.db.int_del (id INT, n BIGINT) USING audit")
    spark.sql("INSERT INTO graft.db.int_del VALUES (1, 10), (5, 50), (9, 90)")
    spark.sql("DELETE FROM graft.db.int_del WHERE id = 5")
    val rows = spark.sql("SELECT id, n FROM graft.db.int_del ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.toSeq === Seq((1, 10L), (9, 90L)))
    // range predicate on INT exercises the comparison path too
    spark.sql("DELETE FROM graft.db.int_del WHERE id > 3")
    assert(spark.sql("SELECT count(*) FROM graft.db.int_del").head.getLong(0) === 1L)
    spark.sql("DROP TABLE graft.db.int_del")
  }

  test("partitioned audit table: routing, pruned reads, metadata count, DML") {
    init()
    spark.sql(
      """CREATE TABLE graft.db.psales (flag STRING, qty BIGINT)
        |USING audit PARTITIONED BY (flag)""".stripMargin)
    spark.sql(
      "INSERT INTO graft.db.psales VALUES ('A', 1), ('B', 2), ('A', 3), ('C', 4)")
    // layout: one dir per value, each with its own manifest
    val dirs = new java.io.File(s"$wh/db/psales").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filterNot(Set("_staging", "_SEQ")) // staging may linger empty; _SEQ is the commit sequencer
      .sorted
    assert(dirs.toSeq === Seq("flag=A", "flag=B", "flag=C"))
    // OCC appends publish as per-dir txns; entries are visible either way
    assert(AuditPartition.manifestEntries(
      java.nio.file.Paths.get(s"$wh/db/psales/flag=A")).nonEmpty)
    // a partition-predicate read plans ONLY that partition's files
    val q = spark.sql("SELECT qty FROM graft.db.psales WHERE flag = 'A'")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val parts = scan.inputPartitions.collect { case p: AuditDirPartition => p }
    assert(parts.map(_.relDir) === Seq("flag=A"), scan.toString)
    assert(parts.flatMap(_.files).forall(_.contains("flag=A")))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    // partition-sliced COUNT(*) stays metadata-only
    val cnt = spark.sql("SELECT count(*) FROM graft.db.psales WHERE flag IN ('A','B')")
    assert(cnt.queryExecution.executedPlan.toString.contains("AuditCountScan"),
      cnt.queryExecution.executedPlan.toString.take(800))
    assert(cnt.head.getLong(0) === 3L)
    // metadata DELETE rewrites inside partition dirs, keeps counts exact
    spark.sql("DELETE FROM graft.db.psales WHERE qty = 3")
    assert(spark.sql("SELECT count(*) FROM graft.db.psales").head.getLong(0) === 3L)
    // the COW UPDATE must NOT lose unmatched partitions (its scan reads all)
    spark.sql("UPDATE graft.db.psales SET qty = qty * 10 WHERE flag = 'A'")
    val after = spark.sql("SELECT flag, qty FROM graft.db.psales ORDER BY flag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(after.toSeq === Seq(("A", 10L), ("B", 2L), ("C", 4L)))
    spark.sql("DROP TABLE graft.db.psales")
  }

  test("CTAS PARTITIONED BY publishes a partitioned table atomically") {
    init()
    spark.sql(
      """CREATE TABLE graft.db.pctas USING audit PARTITIONED BY (k)
        |AS SELECT id % 3 AS k, id AS v FROM range(9)""".stripMargin)
    val dirs = new java.io.File(s"$wh/db/pctas").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filterNot(Set("_staging", "_SEQ")).sorted
    assert(dirs.toSeq === Seq("k=0", "k=1", "k=2"))
    val pruned = spark.sql("SELECT sum(v) FROM graft.db.pctas WHERE k = 1")
    assert(pruned.head.getLong(0) === 1L + 4L + 7L)
    spark.sql("DROP TABLE graft.db.pctas")
  }

  test("storage-partitioned join: audit-to-audit on the partition key, zero exchanges") {
    init()
    spark.sql(
      """CREATE TABLE graft.db.spj_a (flag STRING, qty BIGINT)
        |USING audit PARTITIONED BY (flag)""".stripMargin)
    spark.sql(
      """CREATE TABLE graft.db.spj_b (flag STRING, price BIGINT)
        |USING audit PARTITIONED BY (flag)""".stripMargin)
    spark.sql(
      "INSERT INTO graft.db.spj_a VALUES ('A', 1), ('B', 2), ('C', 3), ('A', 4)")
    spark.sql(
      "INSERT INTO graft.db.spj_b VALUES ('A', 10), ('B', 20), ('C', 30)")
    val was = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val wasBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // force the shuffle-or-SPJ decision (broadcast would mask it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        """SELECT a.flag, a.qty, b.price FROM graft.db.spj_a a
          |JOIN graft.db.spj_b b ON a.flag = b.flag""".stripMargin)
      val rows = j.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.sorted.toSeq === Seq(("A", 1L, 10L), ("A", 4L, 10L),
        ("B", 2L, 20L), ("C", 3L, 30L)))
      // inspect only the FINAL adaptive plan (toString appends the initial
      // pre-AQE plan, which legitimately still shows ensure-requirements
      // exchanges that never ran)
      val full = j.queryExecution.executedPlan.toString
      val plan = full.split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), full.take(1500))
      assert(!plan.contains("Exchange"),
        "SPJ should elide both join-side exchanges:\n" + full.take(2500))
    } finally {
      was.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      wasBroadcast.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.sql("DROP TABLE graft.db.spj_a")
      spark.sql("DROP TABLE graft.db.spj_b")
    }
  }

  test("delta DML: MERGE/UPDATE/DELETE write only changed rows and preserve epoch lineage") {
    init()
    spark.sql("CREATE TABLE graft.db.dlt (id BIGINT, v BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dlt_ckpt")
    // 4 streamed epochs: ids 0..399, v = duration formula
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "4").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"), col("duration_ms").as("v"))
      .writeStream.format(classOf[JsonAuditSink].getName)
      .option("path", s"$wh/db/dlt")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val tdir = java.nio.file.Paths.get(s"$wh/db/dlt")
    def epochBytes(): Map[String, Long] = {
      val l = java.nio.file.Files.list(tdir)
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("part-e")).map(f =>
          (f, java.nio.file.Files.size(tdir.resolve(f)))).toMap
      finally l.close()
    }
    val before = epochBytes()
    val preMergeV1 = spark.sql(
      "SELECT sum(v), count(*) FROM graft.db.dlt VERSION AS OF 1").head
    // MERGE: one matched row becomes a delete-vector + appended row, one
    // unmatched row appends — committed epoch files must NOT be rewritten
    spark.sql(
      """MERGE INTO graft.db.dlt t
        |USING (SELECT * FROM VALUES (5L, 111L), (1000L, 222L) AS s(id, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(epochBytes() === before, "delta DML must not rewrite epoch files")
    assert(java.nio.file.Files.exists(tdir.resolve("_DELETES")))
    assert(spark.sql("SELECT count(*) FROM graft.db.dlt").head.getLong(0) === 401L)
    assert(spark.sql("SELECT v FROM graft.db.dlt WHERE id = 5").head.getLong(0) === 111L)
    assert(spark.sql("SELECT v FROM graft.db.dlt WHERE id = 1000").head.getLong(0) === 222L)
    // epoch lineage SURVIVES the merge: the pinned read is byte-identical
    assert(spark.sql(
      "SELECT sum(v), count(*) FROM graft.db.dlt VERSION AS OF 1").head === preMergeV1)
    // UPDATE takes the delta path too
    spark.sql("UPDATE graft.db.dlt SET v = 0 WHERE id = 7")
    assert(epochBytes() === before)
    assert(spark.sql("SELECT v FROM graft.db.dlt WHERE id = 7").head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM graft.db.dlt").head.getLong(0) === 401L)
    // a DELETE the metadata path can't translate routes through delta:
    // vectors grow, files stay, metadata count stays exact
    spark.sql("DELETE FROM graft.db.dlt WHERE id % 2 = 1 AND id < 400")
    assert(epochBytes() === before)
    val cnt = spark.sql("SELECT count(*) FROM graft.db.dlt")
    assert(cnt.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(cnt.head.getLong(0) === 201L)
    assert(spark.sql(
      "SELECT sum(v), count(*) FROM graft.db.dlt VERSION AS OF 1").head === preMergeV1)
    spark.sql("DROP TABLE graft.db.dlt")
  }

  test("change feed: replaying the streamed changelog reconstructs the table") {
    init()
    spark.sql("CREATE TABLE graft.db.cdf_t (id BIGINT, v BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_ckpt")
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "4").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"), col("duration_ms").as("v"))
      .writeStream.format(classOf[JsonAuditSink].getName)
      .option("path", s"$wh/db/cdf_t")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.sql(
      """MERGE INTO graft.db.cdf_t t
        |USING (SELECT * FROM VALUES (5L, 111L), (17L, 111L), (1000L, 222L)
        |       AS s(id, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("DELETE FROM graft.db.cdf_t WHERE id % 100 = 3 AND id < 400")
    val cdfSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_epoch",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_pos",
        org.apache.spark.sql.types.LongType)))
    // batch CDF: full history — 400 epoch inserts + 3 delta inserts,
    // 3 merge deletes (5, 17 updated = delete+insert) ... plus 4 modulo
    // deletes (3, 103, 203, 303); update of 5 and 17 = 2 deletes
    val batchCdf = spark.read.schema(cdfSchema)
      .format(classOf[JsonAuditSink].getName)
      .option("path", s"$wh/db/cdf_t").option("changeFeed", "true").load()
    val byType = batchCdf.groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byType === Map("insert" -> 403L, "delete" -> 6L))
    // epoch attribution: the 400 original inserts carry their epoch
    assert(batchCdf.where(col("_change_type") === "insert" &&
      col("_commit_epoch").isNotNull).count() === 400L)
    // STREAMED changelog, replayed keyed on (file, pos): equals the table
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_cdf_ckpt2")
    val state = scala.collection.mutable.Map.empty[(String, Long), (Long, Long)]
    val feed = spark.readStream.schema(cdfSchema)
      .format(classOf[JsonAuditSink].getName)
      .option("path", s"$wh/db/cdf_t").option("changeFeed", "true").load()
      .writeStream.option("checkpointLocation", ckpt2.toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          val key = (r.getString(4), r.getLong(5))
          if (r.getString(2) == "insert") state(key) = (r.getLong(0), r.getLong(1))
          else state.remove(key)
        }
      }.start()
    try feed.processAllAvailable() finally feed.stop()
    val replayed = state.values.toSeq.sorted
    val actual = spark.sql("SELECT id, v FROM graft.db.cdf_t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(replayed === actual)
    assert(actual.size === 397) // 400 + 1 insert - 4 deleted
    spark.sql("DROP TABLE graft.db.cdf_t")
  }

  test("metadata survives hostile property values (quotes, backslashes, schema token)") {
    init()
    spark.sql(
      """CREATE TABLE graft.db.props_t (id BIGINT) USING audit
        |TBLPROPERTIES ('note' = 'a "quoted" \\ value with "schema": inside')
        |""".stripMargin)
    spark.sql("INSERT INTO graft.db.props_t VALUES (7)")
    // the schema extraction must not be shifted by the hostile value
    assert(spark.sql("SELECT id FROM graft.db.props_t").head.getLong(0) === 7L)
    spark.sql("DROP TABLE graft.db.props_t")
  }
}
