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

  test("a fold under a live tail fails loudly even when lengths still fit") {
    // the silent-shift trap: the tail consumed 2 vector entries, 3 more
    // landed, then VACUUM folded the CONSUMED 2 — the log is now 3
    // entries long, >= the consumed offset 2, so a length-only guard
    // sees nothing while indices 2..5 silently became 0..3 (delete
    // events skipped or re-emitted). The fold-GENERATION axis makes any
    // fold past the checkpoint loud.
    import org.apache.spark.sql.types._
    val (cat, wh) = freshCat("live")
    spark.sql(s"CREATE TABLE $cat.db.l (id BIGINT, v BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.l SELECT id, id * 3 FROM range(0, 100)")
    spark.sql(s"DELETE FROM $cat.db.l WHERE id % 50 = 7") // 2 entries
    val path = wh.resolve("db/l").toString
    assert(AuditDeletes.entries(path).size === 2)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType), StructField("_change_type", StringType)))
    val stream = new AuditCdfStream(path, schema)
    val consumed = stream.latestOffset() // tail checkpointed here (d=2)
    spark.sql(s"DELETE FROM $cat.db.l WHERE id % 33 = 5") // 3 more
    assert(AuditDeletes.entries(path).size === 5)
    // fold the 2 CONSUMED entries only (what a VACUUM whose retention
    // window covers them does): log shrinks 5 → 3 positional + summary
    val all = AuditDeletes.entriesWithTs(path)
    val foldedAway = all.take(2)
    AuditDeletes.replace(path, all.drop(2),
      foldedAway.groupBy(_._1).map { case (f, ps) =>
        (f, (ps.size.toLong, ps.flatMap(_._3).maxOption)) })
    assert(AuditDeletes.entries(path).size === 3) // >= consumed 2: length guard blind
    val ex = intercept[IllegalArgumentException](
      stream.planInputPartitions(consumed, stream.latestOffset()))
    assert(ex.getMessage.contains("folded"), ex.getMessage)

    // same detector on the PARTITIONED feed
    spark.sql(s"CREATE TABLE $cat.db.p (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    spark.sql(s"INSERT INTO $cat.db.p SELECT id, id % 2 FROM range(0, 100)")
    spark.sql(s"DELETE FROM $cat.db.p WHERE id % 50 = 6") // 1 per dir
    val ppath = wh.resolve("db/p").toString
    val pschema = StructType(Seq(StructField("id", LongType),
      StructField("flag", LongType), StructField("_change_type", StringType)))
    val pstream = new AuditPartitionedCdfStream(ppath, pschema,
      Seq(AuditPartition.Level("flag", LongType, None)))
    val pconsumed = pstream.latestOffset()
    spark.sql(s"DELETE FROM $cat.db.p WHERE id % 25 = 3") // 2 more per dir
    val leaf = java.nio.file.Paths.get(ppath).resolve("flag=0").toString
    val lall = AuditDeletes.entriesWithTs(leaf)
    assert(lall.size >= 3)
    AuditDeletes.replace(leaf, lall.drop(1),
      lall.take(1).groupBy(_._1).map { case (f, ps) =>
        (f, (ps.size.toLong, ps.flatMap(_._3).maxOption)) })
    val pex = intercept[IllegalArgumentException](
      pstream.planInputPartitions(pconsumed, pstream.latestOffset()))
    assert(pex.getMessage.contains("folded"), pex.getMessage)
  }
}
