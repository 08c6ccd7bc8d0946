package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Mixed-table TIMESTAMP AS OF: commit-time travel across streaming
  * epochs, OCC batch `_TXN` appends and delta-DML delete vectors — and
  * the LOUD refusals whenever part of the history cannot be placed on
  * the commit-time axis (silently excluding a vintage would misanswer
  * the audit question the feature exists for). The happy-path content
  * reconstruction is oracle-checked end to end by q_audit_travel_mixed;
  * this spec drives the boundary and refusal semantics. */
class AuditTravelMixedSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_tmix_${tag}_")
    val cat = s"graft_tmix_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("a travel instant between a batch append and now sees the append") {
    val (cat, wh) = freshCat("basic")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 10 FROM range(100)")
    Thread.sleep(5)
    val path = wh.resolve("db/t").toString
    val tAfterA = AuditBase.readManifest(path).flatMap(_.ts).max
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $cat.db.t SELECT id + 500, id FROM range(50)")
    // current state sees both appends; the pinned instant only the first
    assert(spark.table(s"$cat.db.t").count() === 150L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tAfterA)").head.getLong(0) === 100L)
    // travel BEFORE any commit is loud, not empty
    val ex = intercept[Exception](spark.sql(
      s"SELECT count(*) FROM $cat.db.t " +
        s"TIMESTAMP AS OF timestamp_millis(${tAfterA - 100000})").collect())
    assert(ex.getMessage.contains("no commit at or before"), ex.getMessage)
  }

  test("DML vectors resolve on the commit-time axis (pre/post UPDATE)") {
    val (cat, wh) = freshCat("dml")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    Thread.sleep(5)
    val path = wh.resolve("db/t").toString
    val tPre = AuditBase.readManifest(path).flatMap(_.ts).max
    Thread.sleep(5)
    spark.sql(s"UPDATE $cat.db.t SET v = 999 WHERE id % 10 = 3")
    Thread.sleep(5)
    val tPost = System.currentTimeMillis()
    // pre-DML instant: original values, no vectors applied, no
    // replacement rows — 100 rows, none with v=999
    val pre = spark.sql(s"SELECT count(*) AS n, sum(v) AS s FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tPre)").head
    assert(pre.getLong(0) === 100L && pre.getLong(1) === 4950L)
    // post-DML instant: the UPDATE's vectors and replacement rows appear
    // TOGETHER (one commit ts) — still 100 rows, 10 of them v=999
    val post = spark.sql(s"SELECT count(*) AS n, sum(v) AS s FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tPost)").head
    assert(post.getLong(0) === 100L)
    assert(post.getLong(1) === 4950L - (3 + 13 + 23 + 33 + 43 + 53 + 63 +
      73 + 83 + 93) + 10 * 999)
  }

  test("a compacted mixed table resolves commit-time travel by origin") {
    val (cat, wh) = freshCat("base")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    Thread.sleep(5)
    val path = wh.resolve("db/t").toString
    val tA = AuditBase.readManifest(path).flatMap(_.ts).max
    Thread.sleep(5)
    spark.sql(s"UPDATE $cat.db.t SET v = 999 WHERE id % 10 = 3")
    Thread.sleep(5)
    val tU = System.currentTimeMillis()
    // compact: batch entries (the original insert AND the UPDATE's
    // replacement file) fold into the base — their commit times survive
    // in the folded manifest tombstones; vectors stay, keyed by origin
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 2)")
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $cat.db.t SELECT id + 500, id FROM range(20)")
    // instant before the UPDATE: originals only, no vectors, no
    // replacement rows — all resolved FROM THE BASE by origin ts
    val pre = spark.sql(s"SELECT count(*) AS n, sum(v) AS s FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tA)").head
    assert(pre.getLong(0) === 100L && pre.getLong(1) === 4950L)
    // instant after the UPDATE, before compaction: updated state
    val upd = spark.sql(s"SELECT count(*) AS n, sum(v) AS s FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tU)").head
    assert(upd.getLong(0) === 100L)
    assert(upd.getLong(1) === 4950L - (3 to 93 by 10).sum + 10 * 999)
    // travel to now equals the current read (base + post-base append)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t TIMESTAMP AS OF " +
      s"timestamp_millis(${System.currentTimeMillis()})")
      .head.getLong(0) === 120L)
    assert(spark.table(s"$cat.db.t").count() === 120L)
  }

  test("partitioned mixed tables resolve commit-time travel per directory") {
    val (cat, wh) = freshCat("part")
    spark.sql(s"CREATE TABLE $cat.db.p (id BIGINT, flag BIGINT, v BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.p SELECT id, id % 3, id FROM range(90)")
    Thread.sleep(5)
    val path = wh.resolve("db/p").toString
    val t1 = AuditPartition.listDirsByCols(path, Seq("flag"))
      .flatMap { case (_, d) => AuditBase.readManifest(d.toString)
        .flatMap(_.ts) }.max
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $cat.db.p SELECT id + 500, id % 3, id " +
      "FROM range(30)")
    // partitioned delta DML after the pinned instant (vectors + moves)
    spark.sql(s"UPDATE $cat.db.p SET v = 999 WHERE id % 30 = 7 AND id < 90")
    assert(spark.table(s"$cat.db.p").count() === 120L)
    // the instant between the appends sees only the first
    val pinned = spark.sql(s"SELECT count(*) AS n, sum(v) AS s " +
      s"FROM $cat.db.p TIMESTAMP AS OF timestamp_millis($t1)").head
    assert(pinned.getLong(0) === 90L && pinned.getLong(1) === (0L until 90L).sum)
    // composes with static partition pruning
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.p " +
      s"TIMESTAMP AS OF timestamp_millis($t1) WHERE flag = 1")
      .head.getLong(0) === 30L)
  }

  test("partitioned mixed tables pull startingTimestamp CDC per directory") {
    val (cat, wh) = freshCat("pcdc")
    spark.sql(s"CREATE TABLE $cat.db.p (id BIGINT, flag BIGINT, v BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.p SELECT id, id % 3, id FROM range(90)")
    Thread.sleep(5)
    val path = wh.resolve("db/p").toString
    val t1 = AuditPartition.listDirsByCols(path, Seq("flag"))
      .flatMap { case (_, d) => AuditBase.readManifest(d.toString)
        .flatMap(_.ts) }.max + 1
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $cat.db.p SELECT id + 500, id % 3, id " +
      "FROM range(30)")
    spark.sql(s"UPDATE $cat.db.p SET v = 999 WHERE id % 30 = 7 AND id < 90")
    val cdfSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("flag",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_ts",
        org.apache.spark.sql.types.LongType)))
    val pull = spark.read.schema(cdfSchema)
      .format(classOf[JsonAuditSink].getName)
      .option("path", path).option("partitionby", "flag")
      .option("changeFeed", "true")
      .option("startingTimestamp", t1.toString).load()
    val byType = pull.groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // the pull sees ONLY the second append (30 inserts), the UPDATE's
    // replacements (ids 7,37,67 → 3 inserts) and its 3 deletes — the
    // first append's 90 rows are before the window, exactly once each
    assert(byType === Map("insert" -> 33L, "delete" -> 3L), byType.toString)
    // every event carries its commit ts (the puller's checkpoint)
    assert(pull.where(org.apache.spark.sql.functions
      .col("_commit_ts").isNull).count() === 0L)
  }

  test("startingTimestamp CDC pulls past an old base checkpoint") {
    val (cat, wh) = freshCat("cdcbase")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    Thread.sleep(5)
    val t1 = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $cat.db.t SELECT id + 500, id FROM range(20)")
    val path = wh.resolve("db/t").toString
    val cdfSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType)))
    def pull(since: Long) = spark.read.schema(cdfSchema)
      .format(classOf[JsonAuditSink].getName)
      .option("path", path).option("changeFeed", "true")
      .option("startingTimestamp", since.toString).load()
    // the fold is BEFORE the window: the pull sees only the new append
    assert(pull(t1).count() === 20L)
    // a window reaching INTO the fold resolves through the base by
    // origin — the folded tombstones retain the commit times, so the
    // full history pulls with non-null _commit_ts on every event
    val full = spark.read.schema(org.apache.spark.sql.types.StructType(
      cdfSchema.fields :+ org.apache.spark.sql.types.StructField(
        "_commit_ts", org.apache.spark.sql.types.LongType)))
      .format(classOf[JsonAuditSink].getName)
      .option("path", path).option("changeFeed", "true")
      .option("startingTimestamp", "0").load()
    assert(full.count() === 120L)
    assert(full.where(org.apache.spark.sql.functions
      .col("_commit_ts").isNull).count() === 0L)
  }

  test("startingEpoch on a MIXED table translates onto the commit-time " +
    "axis: changes at/after the epoch's commit instant, exactly once") {
    val (cat, wh) = freshCat("epochmix")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tm_emck")
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "2").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("id").as("v"))
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.t")
    try q.processAllAvailable() finally q.stop()
    // mixed history AFTER the epochs: a batch append and delta DML
    spark.sql(s"INSERT INTO $cat.db.t SELECT id + 500, id FROM range(20)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 100 = 3")
    val path = wh.resolve("db/t").toString
    val cdfSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType)))
    def pull(sinceEpoch: Long) = spark.read.schema(cdfSchema)
      .format(classOf[JsonAuditSink].getName)
      .option("path", path).option("changeFeed", "true")
      .option("startingEpoch", sinceEpoch.toString).load()
    // since epoch 1: epoch 1's 100 inserts + the batch 20 + 3 deletes
    // (ids 3, 103, 503 — all committed after epoch 1's instant)
    val byType = pull(1L).groupBy("_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byType === Map("insert" -> 120L, "delete" -> 3L), byType.toString)
    // since epoch 0: everything
    assert(pull(0L).count() === 223L)
    // beyond the epoch log: nothing (no commit at/after that epoch)
    assert(pull(99L).count() === 0L)
  }

  test("pre-commit-time batch history (no ts) refuses, not excludes") {
    val (cat, wh) = freshCat("legacy")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id FROM range(100)")
    val path = wh.resolve("db/t")
    // fold the txn into _MANIFEST, then strip the ts fields — simulating
    // a table written before commit-time stamping existed
    AuditBase.consolidate(path.toString)
    val mf = path.resolve("_MANIFEST")
    val stripped = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      .replaceAll(""","ts":\d+""", "")
    java.nio.file.Files.write(mf, stripped.getBytes("UTF-8"))
    val ex = intercept[Exception](spark.sql(
      s"SELECT count(*) FROM $cat.db.t " +
        s"TIMESTAMP AS OF timestamp_millis(${System.currentTimeMillis()})")
      .collect())
    assert(ex.getMessage.contains("carry no commit time"), ex.getMessage)
    // the current read is unaffected
    assert(spark.table(s"$cat.db.t").count() === 100L)
  }

  test("commit stamps are strictly monotonic across rapid-fire commits") {
    val (cat, wh) = freshCat("mono")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    // rapid-fire appends + DML: several commits can land inside one
    // wall-clock millisecond — their stamps must STILL be strictly
    // increasing in durability order, or the CDC max+1 checkpoint
    // could silently skip a commit forever
    (0 until 5).foreach(i =>
      spark.sql(s"INSERT INTO $cat.db.t VALUES ($i, $i)"))
    spark.sql(s"UPDATE $cat.db.t SET v = 99 WHERE id % 2 = 0")
    val path = wh.resolve("db/t").toString
    val ts = AuditBase.readManifest(path).flatMap(_.ts)
    assert(ts.length >= 6) // 5 appends + the UPDATE's replacement file(s)
    // non-decreasing in log order, strictly increasing ACROSS commits
    // (a multi-file statement legitimately shares ONE stamp)
    assert(ts.zip(ts.drop(1)).forall { case (a, b) => a <= b },
      s"manifest stamps must be non-decreasing, got $ts")
    assert(ts.distinct.length === 6,
      s"six commits must carry six distinct stamps, got $ts")
    val vecTs = AuditDeletes.entriesWithTs(path).flatMap(_._3)
    assert(vecTs.nonEmpty && vecTs.forall(_ == ts.max),
      "the UPDATE's vectors share its replacement file's stamp")
  }

  test("VERSION AS OF keeps the pure-epoch contract on mixed tables") {
    // version pins reconstruct epoch history only: batch appends and
    // vectors stay out — the commit-time axis is the mixed spelling
    val (cat, wh) = freshCat("vsn")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tmix_vsn_ckpt")
    val w = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "2").option("pageSize", "50")
      .option("pagesPerTrigger", "1")
      .load().selectExpr("id", "id AS v")
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.t")
    try w.processAllAvailable() finally w.stop()
    spark.sql(s"INSERT INTO $cat.db.t VALUES (9000, 1)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t VERSION AS OF 1")
      .head.getLong(0) === 100L) // epochs 0-1 only, no batch append
    val _ = wh
  }
}
