package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** VACUUM vector retention: positional `_DELETES` entries targeting
  * BATCH-append files fold into the files as blank-line tombstones plus
  * one `{"file","folded":n}` summary — reads stop anti-joining an
  * ever-growing positional set while every count stays exact and time
  * travel is untouched (batch files never participate in pinned reads).
  * Epoch-file vectors are NOT folded: their rows remain observable at
  * retained `VERSION AS OF` epochs; OPTIMIZE is their fold path. */
class AuditVectorFoldSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_vf_${tag}_")
    val cat = s"graft_vf_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("partitioned: VACUUM folds batch-file vectors; reads and counts exact") {
    val (cat, wh) = freshCat("part")
    spark.sql(
      s"""CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT, v BIGINT)
         |USING audit PARTITIONED BY (flag)""".stripMargin)
    spark.sql(
      s"""INSERT INTO $cat.db.t
         |SELECT id, id % 3, id * 7 FROM range(0, 300)""".stripMargin)
    // delta DELETE (modulo predicate → row-level path, appends vectors)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 4")
    val dataDir = wh.resolve("db/t")
    val dirs = AuditPartition.listDirsByCols(dataDir.toString, Seq("flag"))
    val posBefore = dirs.map { case (_, d) =>
      AuditDeletes.entries(d.toString).size }.sum
    assert(posBefore === 30, "expected 30 positional vector entries")
    val before = spark.table(s"$cat.db.t").orderBy("id").collect().toSeq
    assert(before.size === 270)

    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")

    // positional entries folded to summaries; counts unchanged
    val posAfter = dirs.map { case (_, d) =>
      AuditDeletes.entries(d.toString).size }.sum
    assert(posAfter === 0, "positional entries must fold away")
    val foldedSum = dirs.map { case (_, d) =>
      AuditDeletes.folded(d.toString).values.sum }.sum
    assert(foldedSum === 30)
    dirs.foreach { case (_, d) =>
      assert(AuditDeletes.count(d.toString) ===
        AuditDeletes.folded(d.toString).values.sum)
    }
    // reads byte-identical; metadata COUNT(*) exact
    assert(spark.table(s"$cat.db.t").orderBy("id").collect().toSeq === before)
    val cnt = spark.sql(s"SELECT count(*) FROM $cat.db.t")
    assert(cnt.queryExecution.executedPlan.toString.contains("AuditCountScan"))
    assert(cnt.head.getLong(0) === 270L)
    // the data files contain blank-line tombstones at the dead positions
    val blanks = dirs.flatMap { case (_, d) =>
      AuditPartition.manifestEntries(d).flatMap { case (f, _) =>
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(d.resolve(f))).asScala
          .filter(_.isEmpty)
      }
    }
    assert(blanks.size === 30)
    // folding is idempotent: a second VACUUM is a no-op
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.t', " +
      "clean_orphans => true)")
    assert(spark.table(s"$cat.db.t").orderBy("id").collect().toSeq === before)
    // further DML keeps composing after the fold
    spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 5")
    assert(spark.table(s"$cat.db.t").count() === 240L)
  }

  test("unpartitioned: fold works and retained VERSION AS OF is unchanged") {
    val (cat, wh) = freshCat("flat")
    spark.sql(s"CREATE TABLE $cat.db.u (id BIGINT, v BIGINT) USING audit")
    // a streamed epoch (participates in time travel) …
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vf_ckpt")
    val q = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "1").option("pageSize", "50").load()
      .select(org.apache.spark.sql.functions.col("id"),
        (org.apache.spark.sql.functions.col("id") * 2).as("v"))
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.u")
    try q.processAllAvailable() finally q.stop()
    // … plus a batch append, then delta-delete rows from BOTH
    spark.sql(
      s"INSERT INTO $cat.db.u SELECT id, id * 2 FROM range(1000, 1050)")
    spark.sql(s"DELETE FROM $cat.db.u WHERE id % 10 = 7") // 10 rows
    val dataDir = wh.resolve("db/u").toString
    assert(AuditDeletes.entries(dataDir).size === 10)
    val pinnedBefore = spark.read
      .format(classOf[JsonAuditSink].getName)
      .schema("id BIGINT, v BIGINT").option("versionAsOf", "0")
      .load(dataDir).orderBy("id").collect().toSeq
    assert(pinnedBefore.size === 50) // pinned ignores vectors by contract

    spark.sql(s"CALL $cat.system.vacuum(table => 'db.u')")

    // only the BATCH file's 5 entries folded; the epoch file's 5 stay
    val keptEntries = AuditDeletes.entries(dataDir)
    assert(keptEntries.size === 5, keptEntries.toString)
    assert(keptEntries.forall(_._1.startsWith("part-e")))
    assert(AuditDeletes.folded(dataDir).values.sum === 5)
    assert(AuditDeletes.count(dataDir) === 10)
    // current reads exact; VERSION AS OF within retention unchanged
    assert(spark.table(s"$cat.db.u").count() === 90L)
    val pinnedAfter = spark.read
      .format(classOf[JsonAuditSink].getName)
      .schema("id BIGINT, v BIGINT").option("versionAsOf", "0")
      .load(dataDir).orderBy("id").collect().toSeq
    assert(pinnedAfter === pinnedBefore,
      "VACUUM vector fold must not change retained time travel")
  }

  test("a fresh change feed after the fold reflects the final state") {
    val (cat, wh) = freshCat("cdf")
    spark.sql(
      s"""CREATE TABLE $cat.db.c (id BIGINT, flag BIGINT)
         |USING audit PARTITIONED BY (flag)""".stripMargin)
    spark.sql(
      s"INSERT INTO $cat.db.c SELECT id, id % 2 FROM range(0, 100)")
    spark.sql(s"DELETE FROM $cat.db.c WHERE id % 10 = 3")
    spark.sql(s"CALL $cat.system.vacuum(table => 'db.c')")
    val feed = spark.read.format(classOf[JsonAuditSink].getName)
      .schema("id BIGINT, flag BIGINT, _change_type STRING")
      .option("changeFeed", "true").option("partitionby", "flag")
      .load(wh.resolve("db/c").toString).collect()
    // folded rows are gone from the files → 90 insert events, 0 deletes
    assert(feed.count(_.getString(2) == "insert") === 90)
    assert(feed.count(_.getString(2) == "delete") === 0)
  }
}
