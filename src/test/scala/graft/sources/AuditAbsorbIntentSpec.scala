package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Fold-absorption crash safety (round 18).
  *
  * Two crash hazards around OPTIMIZE × VACUUM folds, both fixed here:
  *
  *  1. OPTIMIZE over a crashed VACUUM's PENDING FOLD INTENTS must
  *     refuse: the intent rows may be blanked in some data files and
  *     live in others, so the compaction scan would bake exactly the
  *     already-blanked subset out of the base while their positional
  *     twin entries keep subtracting — a permanent double-count (the
  *     recovery fold would then summarize them UNabsorbed). The next
  *     VACUUM completes the crashed fold; OPTIMIZE afterwards is clean.
  *
  *  2. The base publish marks pre-compaction fold summaries ABSORBED as
  *     a separate metadata step after the `_BASE` pointer swap — a crash
  *     between the two used to leave a base that physically excludes the
  *     folded rows while the summaries kept subtracting. Now an
  *     ABSORB-INTENT marker (honored only once a base with exactly its
  *     snapshot instant exists) is written by the same atomic `_DELETES`
  *     replace that precedes the swap, so absorption and the base become
  *     effective together; the post-publish finalize (or any later fold
  *     rewrite) materializes it as explicit fields.
  */
class AuditAbsorbIntentSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_ai_${tag}_")
    val cat = s"graft_ai_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("OPTIMIZE refuses over pending fold intents; VACUUM heals, " +
    "then OPTIMIZE is clean and counts stay exact") {
    val (cat, wh) = freshCat("ref")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9")
    val path = wh.resolve("db").resolve("t").toString
    val pre = AuditDeletes.entriesWithTs(path)
    assert(pre.size === 10)
    // real fold blanks the rows, then reconstruct the crashed-mid-fold
    // state: rows blanked, positional twins + intents back, no summaries
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    AuditDeletes.replace(path, pre, Map.empty, foldIntents = pre)
    assert(AuditDeletes.intents(path).size === 10)
    val ex = intercept[Exception](spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', target_file_count => 1)"))
    assert(ex.getMessage.contains("pending fold intent"), ex.getMessage)
    assert(ex.getMessage.contains("Run VACUUM first"), ex.getMessage)
    // nothing was changed by the refusal
    assert(spark.table(s"$cat.db.t").count() === 90L)
    assert(AuditDeletes.intents(path).size === 10)
    // system.history SURFACES the crashed-fold state with its remedy
    val rec = spark.sql(s"CALL $cat.system.history(table => 'db.t')")
      .collect().filter(_.getString(0) == "recovery")
    assert(rec.length === 1, rec.mkString(";"))
    assert(rec.head.getString(4).contains("pending fold intent"))
    assert(rec.head.getString(4).contains("run VACUUM"))
    // heal, then compact
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    assert(AuditDeletes.intents(path).isEmpty)
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    assert(spark.table(s"$cat.db.t").count() === 90L)
    // the base physically excludes the folded rows → fully absorbed
    assert(AuditDeletes.count(path) === 0L)
    assert(AuditDeletes.absorbed(path).values.sum === 10L)
    assert(AuditDeletes.foldedRows(path) === 10L) // fold axis monotonic
  }

  test("partition-filtered OPTIMIZE: an intent in an UNSELECTED dir " +
    "does not block; selecting the intent dir refuses") {
    val (cat, wh) = freshCat("par")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 2 FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE flag = 1 AND id < 20")
    val path = wh.resolve("db").resolve("t").toString
    val d1 = AuditPartition.listDirsByCols(path, Seq("flag"))
      .collectFirst { case (rel, d) if rel.startsWith("flag=1") => d }.get
    val pre = AuditDeletes.entriesWithTs(d1.toString)
    assert(pre.size === 10)
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // blanks rows
    AuditDeletes.replace(d1.toString, pre, Map.empty, foldIntents = pre)
    // the healthy dir compacts fine around the crashed one
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1, partition_filter => 'flag=0')")
    assert(spark.table(s"$cat.db.t").count() === 90L)
    // selecting the intent dir — or compacting the whole table — refuses
    val ex1 = intercept[Exception](spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', " +
        "target_file_count => 1, partition_filter => 'flag=1')"))
    assert(ex1.getMessage.contains("pending fold intent"), ex1.getMessage)
    val ex2 = intercept[Exception](spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', target_file_count => 1)"))
    assert(ex2.getMessage.contains("pending fold intent"), ex2.getMessage)
    // heal and finish
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    assert(AuditDeletes.intents(d1.toString).isEmpty)
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1, partition_filter => 'flag=1')")
    assert(spark.table(s"$cat.db.t").count() === 90L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE flag = 1")
      .head.getLong(0) === 40L)
  }

  test("crash AFTER the base swap, before the absorb finalize: the " +
    "absorb-intent keeps counts exact; the next fold materializes it") {
    val (cat, wh) = freshCat("swp")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9")
    val path = wh.resolve("db").resolve("t").toString
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // folds 10
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    val baseTs = AuditBase.read(path).get.ts.get
    // reconstruct the pre-finalize disk state: summaries UNabsorbed +
    // the absorb-intent the publish wrote just before the `_BASE` swap
    AuditDeletes.replace(path, AuditDeletes.entriesWithTs(path),
      AuditDeletes.foldedWithTs(path), absorbIntent = Some(baseTs))
    assert(AuditDeletes.absorbIntentTs(path) === Some(baseTs))
    // the intent matches the live base → fully absorbed, no double-count
    assert(AuditDeletes.count(path) === 0L)
    assert(AuditDeletes.absorbed(path).values.sum === 10L)
    assert(spark.table(s"$cat.db.t").count() === 90L)
    // observable (though behaviorally invisible) in system.history
    val rec = spark.sql(s"CALL $cat.system.history(table => 'db.t')")
      .collect().filter(_.getString(0) == "recovery")
    assert(rec.length === 1 &&
      rec.head.getString(4).contains("absorb-intent"), rec.mkString(";"))
    // the next fold rewrite resolves the intent into explicit fields
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 8")
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    assert(AuditDeletes.absorbIntentTs(path) === None)
    assert(AuditDeletes.absorbed(path).values.sum === 10L)
    assert(AuditDeletes.foldedRows(path) === 20L)
    assert(AuditDeletes.count(path) === 10L) // only the new fold subtracts
    assert(spark.table(s"$cat.db.t").count() === 80L)
  }

  test("a bare VACUUM finalizes a lingering absorb-intent even when " +
    "nothing folds (the recovery row clears; counts stay exact)") {
    val (cat, wh) = freshCat("fin")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9")
    val path = wh.resolve("db").resolve("t").toString
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // folds 10
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    val baseTs = AuditBase.read(path).get.ts.get
    AuditDeletes.replace(path, AuditDeletes.entriesWithTs(path),
      AuditDeletes.foldedWithTs(path), absorbIntent = Some(baseTs))
    assert(AuditDeletes.absorbIntentTs(path) === Some(baseTs))
    // NO new deletes: this VACUUM has nothing to fold — round 18 left
    // the marker lingering here until the NEXT fold; round 19 finalizes
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    assert(AuditDeletes.absorbIntentTs(path) === None)
    assert(AuditDeletes.absorbed(path).values.sum === 10L)
    assert(AuditDeletes.count(path) === 0L)
    assert(spark.table(s"$cat.db.t").count() === 90L)
    assert(spark.sql(s"CALL $cat.system.history(table => 'db.t')")
      .collect().forall(_.getString(0) != "recovery"))
  }

  test("crash BEFORE the base swap: the stale absorb-intent grants " +
    "nothing, and the retried OPTIMIZE absorbs cleanly") {
    val (cat, wh) = freshCat("stl")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9")
    val path = wh.resolve("db").resolve("t").toString
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // folds 10
    assert(AuditDeletes.count(path) === 10L)
    // a publish that died before swapping `_BASE` in: its intent names a
    // snapshot instant no base will ever carry (instants are
    // sequencer-claimed, unique per attempt)
    AuditDeletes.replace(path, AuditDeletes.entriesWithTs(path),
      AuditDeletes.foldedWithTs(path), absorbIntent = Some(123456789L))
    assert(AuditDeletes.absorbIntentTs(path) === Some(123456789L))
    assert(AuditDeletes.count(path) === 10L) // nothing granted — no base
    assert(AuditDeletes.absorbed(path).isEmpty)
    assert(spark.table(s"$cat.db.t").count() === 90L)
    // the retried OPTIMIZE (new snapshot instant) absorbs and finalizes;
    // the stale marker is gone
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    assert(AuditDeletes.absorbIntentTs(path) === None)
    assert(AuditDeletes.count(path) === 0L)
    assert(AuditDeletes.absorbed(path).values.sum === 10L)
    assert(spark.table(s"$cat.db.t").count() === 90L)
  }

  test("PARTITIONED publish killed after the first dir's base swap: " +
    "that dir's absorb-intent holds, later dirs untouched, retry heals") {
    val (cat, wh) = freshCat("pks")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 3 FROM range(90)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9") // 9 vectors
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')") // folds them
    val path = wh.resolve("db").resolve("t").toString
    assert(spark.table(s"$cat.db.t").count() === 81L)
    // kill the partitioned OPTIMIZE right after the FIRST dir's _BASE
    // swap, before its absorb finalize and before any later dir
    sys.props("graft.audit.maintFailPoint") = "after-base-swap"
    val ex = intercept[Exception](
      try spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
        "target_file_count => 1)").collect()
      finally sys.props.remove("graft.audit.maintFailPoint"))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("injected failure")), ex.toString)
    val dirs = AuditPartition.listDirsByCols(path, Seq("flag"))
    val published = dirs.filter { case (_, d) =>
      AuditBase.read(d.toString).isDefined }
    assert(published.size === 1, s"exactly one dir published: $published")
    // the published dir's absorb-intent matches its live base → its
    // fold rows are absorbed; unpublished dirs keep explicit-only state
    published.foreach { case (_, d) =>
      val ts = AuditBase.read(d.toString).get.ts.get
      assert(AuditDeletes.absorbIntentTs(d.toString) === Some(ts))
      assert(AuditDeletes.count(d.toString) === 0L)
    }
    // counts exact across the mixed published/unpublished state
    spark.catalog.refreshTable(s"$cat.db.t")
    assert(spark.table(s"$cat.db.t").count() === 81L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
      === 81L)
    // retry compacts cleanly and finalizes everything
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)")
    dirs.foreach { case (rel, d) =>
      assert(AuditBase.read(d.toString).isDefined, s"$rel unpublished")
      assert(AuditDeletes.absorbIntentTs(d.toString) === None, rel)
      assert(AuditDeletes.count(d.toString) === 0L, rel)
    }
    assert(spark.table(s"$cat.db.t").count() === 81L)
    val g = spark.sql(
      s"SELECT flag, count(*) AS n FROM $cat.db.t GROUP BY flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g === Map(0L -> 27L, 1L -> 27L, 2L -> 27L))
  }

  test("a stale intent never shadows EXPLICIT absorption from an " +
    "earlier completed publish") {
    val (cat, wh) = freshCat("shd")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 9")
    val path = wh.resolve("db").resolve("t").toString
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
      "target_file_count => 1)") // absorbed=10, explicit
    // a LATER publish attempt crashed before its swap: markAbsorbPending
    // resolved the prior explicit absorption and added its own intent
    AuditDeletes.markAbsorbPending(path, 987654321L)
    assert(AuditDeletes.absorbIntentTs(path) === Some(987654321L))
    // the stale intent is inert, but the explicit fields it carried
    // through keep counting — no double-subtraction either way
    assert(AuditDeletes.count(path) === 0L)
    assert(AuditDeletes.absorbed(path).values.sum === 10L)
    assert(spark.table(s"$cat.db.t").count() === 90L)
  }
}
