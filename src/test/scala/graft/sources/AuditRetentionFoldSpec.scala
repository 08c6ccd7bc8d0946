package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** RETENTION-AWARE vector folds + crash-safe fold intents (round 17).
  *
  * A VACUUM call that advertises a retention window (`older_than`, or
  * `retain_last` over an epoch history) folds ONLY vectors provably
  * older than the effective cutoff — so the fold watermark stays at or
  * under the advertised horizon and `TIMESTAMP AS OF` inside the window
  * never refuses because of routine maintenance. A bare VACUUM (no
  * retention parameters) folds everything, as always.
  *
  * Every fold writes a FOLD-INTENT marker to `_DELETES` before touching
  * any data file: a crash mid-blanking then (a) keeps refusing
  * pre-watermark travel instead of silently omitting half-blanked rows,
  * and (b) is completed exactly by the next VACUUM — including base
  * folds, whose blanked lines lose their origin keys and could never be
  * re-found without the intent.
  */
class AuditRetentionFoldSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_rf_${tag}_")
    val cat = s"graft_rf_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("older_than cutoff: in-window vectors stay positional, travel " +
    "inside the window answers, pre-watermark refuses") {
    val (cat, wh) = freshCat("ot")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    val path = wh.resolve("db").resolve("t").toString
    val tIns = AuditBase.maxVisibleTs(path)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 3") // old: 10 rows
    val tCut = AuditBase.maxVisibleTs(path) + 1L
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 7") // in-window
    val tNow = AuditBase.maxVisibleTs(path)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      s"older_than => timestamp_millis($tCut))")
    // only the pre-cutoff delete folded; the in-window one is intact
    assert(AuditDeletes.foldedRows(path) === 10L)
    assert(AuditDeletes.entries(path).size === 10)
    val wm = AuditDeletes.foldWatermark(path).get
    assert(wm < tCut, s"watermark $wm must stay under the cutoff $tCut")
    // travel at the cutoff: first delete applied, second not
    val atCut = spark.sql(s"SELECT count(*) AS n, sum(v) AS s FROM " +
      s"$cat.db.t TIMESTAMP AS OF timestamp_millis($tCut)").head
    assert(atCut.getLong(0) === 90L)
    // travel now: both applied
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tNow)").head.getLong(0) === 80L)
    // travel at the watermark itself answers (first delete applied)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($wm)").head.getLong(0) === 90L)
    // pre-watermark (the pre-delete instant) refuses, naming the fold
    val ex = intercept[Exception](spark.sql(s"SELECT count(*) FROM " +
      s"$cat.db.t TIMESTAMP AS OF timestamp_millis($tIns)").collect())
    assert(ex.getMessage.contains("watermark"), ex.getMessage)
  }

  test("retain_last window: vectors younger than the oldest retained " +
    "epoch survive the fold") {
    val (cat, wh) = freshCat("rl")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rf_rl_ck")
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "3").option("pageSize", "100")
      .option("pagesPerTrigger", "1")
      .load().selectExpr("id", "id % 3 AS flag")
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.t")
    try q.processAllAvailable() finally q.stop()
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    // post-compaction batch append + DML on it: BATCH-origin vectors
    // (the foldable kind) whose commit instants are YOUNGER than every
    // epoch — inside any retain_last window
    spark.sql(s"INSERT INTO $cat.db.t SELECT id + 10000, id % 3 " +
      "FROM range(10)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 2 = 0 AND id > 9999")
    val path = wh.resolve("db").resolve("t").toString
    val nVecs = AuditDeletes.entries(path).size
    assert(nVecs === 5)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      "retain_last => 2)")
    // the advertised window (newest 2 epochs) covers the DML commits:
    // nothing folds, travel inside the window keeps answering
    assert(AuditDeletes.foldedRows(path) === 0L)
    assert(AuditDeletes.entries(path).size === nVecs)
    val tNow = AuditBase.maxVisibleTs(path)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tNow)").head.getLong(0) === 305L)
    // a bare VACUUM advertises nothing — it folds, as always
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    assert(AuditDeletes.foldedRows(path) === nVecs.toLong)
    assert(AuditDeletes.entries(path).isEmpty)
  }

  test("retain_last window holds on a never-OPTIMIZEd table: only " +
    "vectors older than the oldest retained epoch's instant fold") {
    val (cat, wh) = freshCat("nb")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rf_nb_ck")
    def stream(pages: Int): Unit = {
      val q = spark.readStream.format(classOf[PagedSource].getName)
        .option("pages", pages.toString).option("pageSize", "100")
        .option("pagesPerTrigger", "1")
        .load().selectExpr("id", "id % 3 AS flag")
        .writeStream.option("checkpointLocation", ckpt.toString)
        .outputMode("append").toTable(s"$cat.db.t")
      try q.processAllAvailable() finally q.stop()
    }
    stream(1) // epoch 0
    // batch rows + an OLD delete wave, all BEFORE epochs 1,2 commit
    spark.sql(s"INSERT INTO $cat.db.t SELECT id + 10000, id % 3 " +
      "FROM range(20)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id > 9999 AND id % 4 = 0")
    val path = wh.resolve("db").resolve("t").toString
    val oldWave = AuditDeletes.entries(path).size
    assert(oldWave === 5)
    stream(3) // epochs 1,2
    // a YOUNG delete wave inside any retain_last => 2 window
    spark.sql(s"DELETE FROM $cat.db.t WHERE id > 9999 AND id % 4 = 1")
    val tMid = AuditScan.epochTimestamps(path)
      .maxBy(_._1)._2 // epoch 2's instant — inside the window
    // NO base checkpoint exists: the window must still constrain the
    // fold (through = newest committed epoch), or this call would fold
    // everything and refuse in-window TIMESTAMP AS OF
    assert(AuditBase.read(path).isEmpty)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      "retain_last => 2)")
    // only the pre-window wave folded; the in-window wave is intact
    assert(AuditDeletes.foldedRows(path) === oldWave.toLong)
    assert(AuditDeletes.entries(path).size === 5)
    val wm = AuditDeletes.foldWatermark(path).get
    val oldestRetained = AuditScan.epochTimestamps(path)(1L)
    assert(wm < oldestRetained,
      s"watermark $wm must stay under the retained horizon $oldestRetained")
    // travel inside the advertised window answers: old wave applied,
    // young wave not yet (tMid predates it)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($tMid)").head.getLong(0) === 315L)
    assert(spark.table(s"$cat.db.t").count() === 310L)
  }

  test("a crashed base fold leaves an intent: travel refuses loudly, " +
    "the next VACUUM completes the fold and restores stats") {
    val (cat, wh) = freshCat("cr")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)") // rows now base-held
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9") // drops max 99
    val path = wh.resolve("db").resolve("t").toString
    val pre = AuditDeletes.entriesWithTs(path)
    assert(pre.size === 10)
    val tIns = pre.flatMap(_._3).min - 1L
    // run the REAL fold to physically blank the base rows…
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    assert(AuditDeletes.foldedRows(path) === 10L)
    // …then reconstruct the crashed-mid-fold disk state: rows blanked,
    // positional twins + intents back, NO summaries (the exact state a
    // crash between blanking and the final replace leaves behind)
    AuditDeletes.replace(path, pre, Map.empty, foldIntents = pre)
    assert(AuditDeletes.foldedRows(path) === 10L) // intents count
    // current reads stay exact through the window
    assert(spark.table(s"$cat.db.t").count() === 90L)
    // pre-watermark travel refuses LOUDLY (never silently omits)
    val ex = intercept[Exception](spark.sql(s"SELECT count(*) FROM " +
      s"$cat.db.t TIMESTAMP AS OF timestamp_millis($tIns)").collect())
    assert(ex.getMessage.contains("watermark"), ex.getMessage)
    // MIN/MAX refuses while the fold is pending (positional vectors)
    def maxQ = spark.sql(s"SELECT max(id) AS m FROM $cat.db.t")
    assert(!maxQ.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(maxQ.head.getLong(0) === 98L)
    // the next VACUUM completes the crashed fold: the blanked rows'
    // keys are gone from the base file, but the intent proves them
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    assert(AuditDeletes.intents(path).isEmpty)
    assert(AuditDeletes.entries(path).isEmpty)
    assert(AuditDeletes.foldedRows(path) === 10L)
    assert(AuditDeletes.foldWatermark(path).isDefined)
    // stats recomputed: the metadata MIN/MAX claim is back and exact
    assert(maxQ.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(maxQ.head.getLong(0) === 98L)
    // travel at/after the watermark answers
    val wm = AuditDeletes.foldWatermark(path).get
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      s"TIMESTAMP AS OF timestamp_millis($wm)").head.getLong(0) === 90L)
  }

  test("a crashed batch-file fold heals the same way") {
    val (cat, wh) = freshCat("cb")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9")
    val path = wh.resolve("db").resolve("t").toString
    val pre = AuditDeletes.entriesWithTs(path)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // blanks rows
    AuditDeletes.replace(path, pre, Map.empty, foldIntents = pre)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // heals
    assert(AuditDeletes.intents(path).isEmpty)
    assert(AuditDeletes.entries(path).isEmpty)
    assert(AuditDeletes.foldedRows(path) === 10L)
    assert(spark.table(s"$cat.db.t").count() === 90L)
    def maxQ = spark.sql(s"SELECT max(id) AS m FROM $cat.db.t")
    assert(maxQ.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(maxQ.head.getLong(0) === 98L)
  }

  test("an intent key overrides the retention cutoff: recovery folds it " +
    "even when a later call's window would keep it") {
    val (cat, wh) = freshCat("ov")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 3")
    val path = wh.resolve("db").resolve("t").toString
    val pre = AuditDeletes.entriesWithTs(path)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // blanks rows
    AuditDeletes.replace(path, pre, Map.empty, foldIntents = pre)
    // recover with a cutoff BEFORE the entries' commits: blanking
    // already happened — the point of no return — so they must fold
    val cutBeforeAll = pre.flatMap(_._3).min - 5L
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      s"older_than => timestamp_millis($cutBeforeAll))")
    assert(AuditDeletes.intents(path).isEmpty)
    assert(AuditDeletes.entries(path).isEmpty)
    assert(AuditDeletes.foldedRows(path) === 10L)
    assert(spark.table(s"$cat.db.t").count() === 90L)
  }
}
