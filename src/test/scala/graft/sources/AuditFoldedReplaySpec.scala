package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Replay/fold interactions on compacted tables (round-17 hardening):
  *
  *  1. A live epoch manifest entry AT/UNDER a directory's base
  *     throughEpoch (a streaming-writer epoch replay racing a
  *     partitioned OPTIMIZE) must NOT double-count — the base already
  *     holds those rows by origin. Both the row scan and the
  *     metadata count/group-count paths filter `ep > baseThrough`.
  *  2. The partitioned streaming COMMIT itself refuses to republish an
  *     epoch whose rows are folded into the directory's base (crash
  *     between sink commit and checkpoint commit, OPTIMIZE, restart),
  *     and keeps the epoch's ORIGINAL log stamp — re-stamping would
  *     silently move folded base origins on the travel axis.
  *  3. The metadata MIN/MAX gate only trusts folds that carry a
  *     watermark: a watermark-less (pre-upgrade) fold blanked rows
  *     WITHOUT recomputing stats, so its superset bounds could claim a
  *     physically deleted row's value.
  *  4. The partitioned streaming change feed replays delete events
  *     whose origin file VACUUM reclaimed from the BASE by origin —
  *     the same delOnDisk/delGone split the batch scan has.
  */
class AuditFoldedReplaySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_frp_${tag}_")
    val cat = s"graft_frp_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  private def streamEpochs(cat: String, pages: Int,
      ckpt: java.nio.file.Path): Unit = {
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", pages.toString).option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().select(col("id"), (col("id") % 3).as("flag"))
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.t")
    try q.processAllAvailable() finally q.stop()
  }

  test("a live epoch entry under the base throughEpoch never " +
    "double-counts (scan, count pushdown, group count)") {
    val (cat, wh) = freshCat("dup")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_frp_dup_ck")
    streamEpochs(cat, 2, ckpt) // epochs 0,1 → ids 0..199
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    val path = wh.resolve("db").resolve("t").toString
    // inject the pre-fix crash artifact: re-add a LIVE manifest entry
    // for a folded epoch file (the replayed publication) in every dir
    AuditPartition.listDirsByCols(path, Seq("flag")).foreach {
      case (_, pdir) =>
        val all = AuditBase.readManifest(pdir.toString)
        val foldedEpoch = all.find(e =>
          e.folded && AuditScan.epochOf(e.file).isDefined).get
        assert(java.nio.file.Files.exists(pdir.resolve(foldedEpoch.file)),
          "folded originals stay on disk until VACUUM")
        AuditBase.writeManifest(pdir.toString,
          all :+ AuditBase.ManifestEntry(foldedEpoch.file,
            foldedEpoch.rows, folded = false))
    }
    // row scan: base rows only, no double-read of the duplicate file
    assert(spark.sql(s"SELECT sum(id) FROM $cat.db.t").head.getLong(0)
      === (0L until 200L).sum)
    // metadata count pushdown
    val cnt = spark.sql(s"SELECT count(*) FROM $cat.db.t")
    assert(cnt.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(cnt.head.getLong(0) === 200L)
    // metadata group count
    val g = spark.sql(
      s"SELECT flag, count(*) AS n FROM $cat.db.t GROUP BY flag")
    assert(g.queryExecution.executedPlan.toString.contains("AuditGroupCountScan"))
    assert(g.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      === Map(0L -> 67L, 1L -> 67L, 2L -> 66L))
    // partition-management metadata counts base rows too (a compacted
    // dir's rows live in the base, not the live manifest) and applies
    // the same duplicate-entry filter
    val tbl = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "t"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsPartitionManagement]
    val ident = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](0L))
    assert(tbl.loadPartitionMetadata(ident).get("rows") === "67")
  }

  test("epoch replay after a partitioned OPTIMIZE is absorbed by the " +
    "base: no duplicate rows, original epoch stamp kept") {
    val (cat, wh) = freshCat("rep")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_frp_rep_ck")
    streamEpochs(cat, 2, ckpt) // epochs 0,1 committed to sink AND checkpoint
    val path = wh.resolve("db").resolve("t").toString
    val stampsBefore = AuditScan.epochTimestamps(path)
    // crash window: the sink committed epoch 1 but the streaming
    // checkpoint did not — drop the checkpoint's commit marker
    val commit1 = ckpt.resolve("commits").resolve("1")
    assert(java.nio.file.Files.deleteIfExists(commit1))
    // ChecksumFs keeps a sibling .crc — drop it too or the replayed
    // commit's rename fails on the stale checksum
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve(".1.crc"))
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)") // folds epochs 0,1 into per-dir bases
    // restart the SAME query: Structured Streaming replays batch 1
    streamEpochs(cat, 2, ckpt)
    // the replay was absorbed: counts exact, no live epoch entries
    assert(spark.table(s"$cat.db.t").count() === 200L)
    assert(spark.sql(s"SELECT sum(id) FROM $cat.db.t").head.getLong(0)
      === (0L until 200L).sum)
    AuditPartition.listDirsByCols(path, Seq("flag")).foreach {
      case (rel, pdir) =>
        val through = AuditBase.read(pdir.toString).get.throughEpoch
        val liveUnder = AuditBase.readManifest(pdir.toString).filter(e =>
          !e.folded && AuditScan.epochOf(e.file).exists(_ <= through))
        assert(liveUnder.isEmpty,
          s"replayed live entries under base through in $rel: $liveUnder")
    }
    // the epoch's original commit stamp survived — folded base origins
    // keep their place on the TIMESTAMP AS OF axis
    assert(AuditScan.epochTimestamps(path) === stampsBefore)
  }

  test("PARTIALLY-folded epoch replay (partition-filtered OPTIMIZE) " +
    "keeps the original epoch stamp while republishing the live dirs") {
    val (cat, wh) = freshCat("mix")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_frp_mix_ck")
    streamEpochs(cat, 2, ckpt) // epochs 0,1
    val path = wh.resolve("db").resolve("t").toString
    val stampsBefore = AuditScan.epochTimestamps(path)
    // crash window: sink committed epoch 1, checkpoint did not
    assert(java.nio.file.Files.deleteIfExists(
      ckpt.resolve("commits").resolve("1")))
    java.nio.file.Files.deleteIfExists(
      ckpt.resolve("commits").resolve(".1.crc"))
    // compact ONLY flag=1: epoch 1 is folded there, live everywhere else
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1, partition_filter => 'flag=1')")
    // restart: epoch 1 replays MIXED — dropped in flag=1 (base holds
    // it), retracted + republished in flag=0 and flag=2 (files > 0).
    // The epoch line is rewritten, but its STAMP must not move: the
    // folded dir's base origins resolve their travel vintage through it
    streamEpochs(cat, 2, ckpt)
    assert(spark.table(s"$cat.db.t").count() === 200L)
    assert(spark.sql(s"SELECT sum(id) FROM $cat.db.t").head.getLong(0)
      === (0L until 200L).sum)
    assert(AuditScan.epochTimestamps(path) === stampsBefore)
    // the folded dir gained no live entries under its base through;
    // the live dirs republished theirs
    AuditPartition.listDirsByCols(path, Seq("flag")).foreach {
      case (rel, pdir) =>
        val liveE1 = AuditBase.readManifest(pdir.toString).filter(e =>
          !e.folded && AuditScan.epochOf(e.file).contains(1L))
        if (rel.startsWith("flag=1")) assert(liveE1.isEmpty,
          s"replayed live entries in the folded dir: $liveE1")
        else assert(liveE1.nonEmpty, s"missing republished epoch in $rel")
    }
    // travel at the original epoch-1 instant still sees both epochs
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t TIMESTAMP AS OF " +
      s"timestamp_millis(${stampsBefore(1L)})").head.getLong(0) === 200L)
  }

  test("UNPARTITIONED epoch replay after OPTIMIZE is absorbed by the " +
    "base: originals untouched, original epoch stamp kept") {
    val (cat, wh) = freshCat("rpu")
    spark.sql(s"CREATE TABLE $cat.db.u (id BIGINT, flag BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_frp_rpu_ck")
    def stream(): Unit = {
      val q = spark.readStream.format(classOf[PagedSource].getName)
        .option("pages", "2").option("pageSize", "100")
        .option("pagesPerTrigger", "1")
        .load().select(col("id"), (col("id") % 3).as("flag"))
        .writeStream.option("checkpointLocation", ckpt.toString)
        .outputMode("append").toTable(s"$cat.db.u")
      try q.processAllAvailable() finally q.stop()
    }
    stream() // epochs 0,1
    val path = wh.resolve("db").resolve("u").toString
    val stampsBefore = AuditScan.epochTimestamps(path)
    assert(java.nio.file.Files.deleteIfExists(
      ckpt.resolve("commits").resolve("1")))
    java.nio.file.Files.deleteIfExists(
      ckpt.resolve("commits").resolve(".1.crc"))
    spark.sql(s"CALL $cat.system.optimize(table => 'db.u', " +
      "target_file_count => 1)") // folds epochs 0,1 into the base
    // retained originals on disk before the replay
    val origs = AuditScan.epochFiles(path,
      AuditScan.committedEpochs(path).toSet).map(_._1).toSet
    stream() // replays epoch 1 against the compacted table
    assert(spark.table(s"$cat.db.u").count() === 200L)
    assert(spark.sql(s"SELECT sum(id) FROM $cat.db.u").head.getLong(0)
      === (0L until 200L).sum)
    // original files untouched (running tails resolve them), stamp kept
    assert(AuditScan.epochFiles(path,
      AuditScan.committedEpochs(path).toSet).map(_._1).toSet === origs)
    assert(AuditScan.epochTimestamps(path) === stampsBefore)
  }

  test("metadata MIN/MAX refuses a watermark-less (pre-upgrade) fold") {
    val (cat, wh) = freshCat("wm")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    // non-convertible predicate → delta (vector) path, extreme row 99 goes
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9")
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // stamped fold
    val path = wh.resolve("db").resolve("t").toString
    assert(AuditDeletes.foldedRows(path) === 10L)
    def maxQ = spark.sql(s"SELECT max(id) AS m FROM $cat.db.t")
    // stamped fold: stats were recomputed, the metadata claim is back
    assert(maxQ.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(maxQ.head.getLong(0) === 98L)
    // strip the watermark (simulate a pre-upgrade fold whose blanking
    // never recomputed stats) — the gate must fall back to a row scan
    val f = AuditDeletes.file(path)
    val stripped = java.nio.file.Files.readAllLines(f)
      .toArray.map(_.toString.replaceAll(""","ts":\d+""", ""))
    java.nio.file.Files.write(f,
      stripped.mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(AuditDeletes.foldWatermark(path).isEmpty)
    assert(!maxQ.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(maxQ.head.getLong(0) === 98L) // row scan stays exact

    // partitioned twin
    spark.sql(s"CREATE TABLE $cat.db.p (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.p SELECT id, id % 2 FROM range(100)")
    // ids 4,9,14,… — both parities, so BOTH flag dirs carry vectors
    spark.sql(s"DELETE FROM $cat.db.p WHERE id % 5 = 4")
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.p')")
    def pMaxQ = spark.sql(s"SELECT max(id) AS m FROM $cat.db.p")
    assert(pMaxQ.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(pMaxQ.head.getLong(0) === 98L)
    val leaf = wh.resolve("db").resolve("p").resolve("flag=0").toString
    val lf = AuditDeletes.file(leaf)
    val lStripped = java.nio.file.Files.readAllLines(lf)
      .toArray.map(_.toString.replaceAll(""","ts":\d+""", ""))
    java.nio.file.Files.write(lf,
      lStripped.mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(!pMaxQ.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(pMaxQ.head.getLong(0) === 98L)
  }

  test("streaming partitioned feed replays a delete of a base-held row " +
    "from the base after VACUUM reclaimed its origin file") {
    val (cat, wh) = freshCat("dv")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 2 FROM range(100)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // reclaim originals
    val path = wh.resolve("db").resolve("t").toString
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("flag", LongType), StructField("_change_type", StringType)))
    val stream = new AuditPartitionedCdfStream(path, schema,
      Seq(AuditPartition.Level("flag", LongType, None)))
    val consumed = stream.latestOffset()
    spark.sql(s"DELETE FROM $cat.db.t WHERE id IN (4, 7)")
    // the vectors now key origin files VACUUM removed from disk
    AuditPartition.listDirsByCols(path, Seq("flag")).foreach {
      case (_, pdir) =>
        AuditDeletes.entries(pdir.toString).foreach { case (f, _) =>
          assert(!java.nio.file.Files.exists(pdir.resolve(f)),
            s"expected reclaimed origin $f")
        }
    }
    val parts = stream.planInputPartitions(consumed, stream.latestOffset())
    val factory = stream.createReaderFactory()
    val events = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), row.getUTF8String(2).toString))
      }
      r.close(); buf
    }
    assert(events.count(_._2 == "insert") === 0)
    assert(events.filter(_._2 == "delete").map(_._1).toSet === Set(4L, 7L))
  }
}
