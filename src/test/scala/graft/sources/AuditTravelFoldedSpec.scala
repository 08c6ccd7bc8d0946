package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** POST-FOLD TIME TRAVEL: a VACUUM vector fold physically blanks the
  * folded deletes, which is the right answer for every instant at/after
  * the fold WATERMARK (the max folded-entry commit ts, stamped into the
  * fold summary) — `TIMESTAMP AS OF` proceeds there and refuses loudly
  * only for pre-watermark instants (whose state would need the blanked
  * rows back) and for pre-upgrade folds that carry no watermark. Routine
  * maintenance must not destroy time travel for the whole post-fold
  * future — the round-15 behavior this spec replaces refused forever. */
class AuditTravelFoldedSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_tf_${tag}_")
    val cat = s"graft_tf_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("unpartitioned: travel works at/after the fold watermark, " +
    "refuses before it") {
    val (cat, wh) = freshCat("u")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    val path = wh.resolve("db").resolve("t").toString
    Thread.sleep(4)
    // an instant BETWEEN the insert and the delete — state = all 100 rows
    val tPre = AuditBase.maxVisibleTs(path)
    Thread.sleep(4)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 3")
    val wm = AuditBase.maxVisibleTs(path) // = the fold watermark-to-be
    assert(tPre < wm)

    // travel at tPre works BEFORE the fold (sees the pre-delete state)...
    def nAt(ms: Long): Long = spark.sql(
      s"SELECT count(*) FROM $cat.db.t TIMESTAMP AS OF timestamp_millis($ms)")
      .collect()(0).getLong(0)
    assert(nAt(tPre) === 100L)
    assert(nAt(wm) === 90L)

    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    assert(AuditDeletes.foldedRows(path) === 10L)
    assert(AuditDeletes.foldWatermark(path) === Some(wm),
      "the fold summary must record the max folded-entry stamp")

    // ...and refuses AFTER the fold (the blanked rows cannot come back)
    val ex = intercept[Exception](nAt(tPre))
    assert(ex.getMessage.contains("watermark"), ex.getMessage)

    // at/after the watermark the fold resolves exactly
    assert(nAt(wm) === 90L)
    // post-fold DML keeps ts-filtering: an instant between the fold and
    // the second delete sees only the first
    Thread.sleep(4)
    val tMid = AuditBase.maxVisibleTs(path)
    Thread.sleep(4)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 7")
    val tEnd = AuditBase.maxVisibleTs(path)
    assert(nAt(tMid) === 90L)
    assert(nAt(tEnd) === 80L)

    // the monotonic floor survives the fold even when the fold emptied
    // the positional tail: maxVisibleTs still covers the watermark
    assert(AuditBase.maxVisibleTs(path) >= wm)
  }

  test("partitioned: per-directory folds gate travel by each dir's " +
    "watermark") {
    val (cat, wh) = freshCat("p")
    spark.sql(s"CREATE TABLE $cat.db.p (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.p SELECT id, id % 2 FROM range(100)")
    val path = wh.resolve("db").resolve("p").toString
    Thread.sleep(4)
    val tPre = Seq("flag=0", "flag=1").map(d => AuditBase.maxVisibleTs(
      java.nio.file.Paths.get(path).resolve(d).toString)).max
    Thread.sleep(4)
    spark.sql(s"DELETE FROM $cat.db.p WHERE id % 20 = 3") // 5 rows, flag=1
    val wm = Seq("flag=0", "flag=1").map(d => AuditBase.maxVisibleTs(
      java.nio.file.Paths.get(path).resolve(d).toString)).max
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.p')")
    val leaf1 = java.nio.file.Paths.get(path).resolve("flag=1").toString
    assert(AuditDeletes.foldedRows(leaf1) === 5L)
    assert(AuditDeletes.foldWatermark(leaf1).exists(_ <= wm))

    def nAt(ms: Long): Long = spark.sql(
      s"SELECT count(*) FROM $cat.db.p TIMESTAMP AS OF timestamp_millis($ms)")
      .collect()(0).getLong(0)
    // at/after the fold watermark: exact
    assert(nAt(wm) === 95L)
    // before it: loud refusal naming the partition
    val ex = intercept[Exception](nAt(tPre))
    assert(ex.getMessage.contains("watermark"), ex.getMessage)
    assert(ex.getMessage.contains("flag=1"), ex.getMessage)
  }

  test("travel composes with a BASE-vector fold on a partitioned " +
    "compacted table: exact at/after the watermark, loud before") {
    val (cat, wh) = freshCat("pbase")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 2 FROM range(100)")
    val path = wh.resolve("db").resolve("t").toString
    def dirMax: Long = AuditPartition.listDirsByCols(path, Seq("flag"))
      .map { case (_, d) => AuditBase.maxVisibleTs(d.toString) }.max
    Thread.sleep(4)
    val tPre = dirMax
    Thread.sleep(4)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 3") // 10 rows
    val wm = dirMax
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 2)")
    // travel works across the compaction BEFORE the vector fold,
    // including to the pre-delete instant (vectors ts-filter)
    def nAt(ms: Long): Long = spark.sql(
      s"SELECT count(*) FROM $cat.db.t TIMESTAMP AS OF timestamp_millis($ms)")
      .collect()(0).getLong(0)
    assert(nAt(tPre) === 100L)
    assert(nAt(wm) === 90L)
    // VACUUM folds the base-origin vectors (blanks base rows, stamps the
    // watermark): post-watermark travel stays exact, pre-watermark
    // instants now refuse — the blanked rows cannot come back
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()
    // ids ≡ 3 (mod 10) are all odd → every vector lives in flag=1
    val leaf = java.nio.file.Paths.get(path).resolve("flag=1").toString
    assert(AuditDeletes.entries(leaf).isEmpty &&
      AuditDeletes.foldedRows(leaf) === 10L)
    assert(nAt(wm) === 90L)
    assert(nAt(dirMax) === 90L)
    val ex = intercept[Exception](nAt(tPre))
    assert(ex.getMessage.contains("watermark"), ex.getMessage)
  }

  test("a fold of unstamped (pre-upgrade) vectors still refuses forever") {
    val (cat, wh) = freshCat("legacy")
    spark.sql(s"CREATE TABLE $cat.db.l (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.l SELECT id, id FROM range(10)")
    spark.sql(s"DELETE FROM $cat.db.l WHERE id % 10 = 3")
    val path = wh.resolve("db").resolve("l").toString
    // simulate a pre-upgrade fold: a summary line with NO ts
    val all = AuditDeletes.entriesWithTs(path)
    assert(all.nonEmpty, "the DELETE must leave positional vectors")
    AuditDeletes.replace(path, Nil,
      all.groupBy(_._1).map { case (f, ps) => (f, (ps.size.toLong, None)) })
    assert(AuditDeletes.foldWatermark(path) === None)
    val now = AuditBase.maxVisibleTs(path) + 10
    val ex = intercept[Exception](spark.sql(
      s"SELECT count(*) FROM $cat.db.l TIMESTAMP AS OF timestamp_millis($now)")
      .collect())
    assert(ex.getMessage.contains("pre-upgrade fold"), ex.getMessage)
  }
}
