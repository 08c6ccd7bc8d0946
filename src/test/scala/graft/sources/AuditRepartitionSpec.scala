package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** `CALL system.repartition_table` — partition-spec evolution as a
  * staged sibling-tree rewrite + atomic swap: answers identical across
  * the layout change, the new layout prunes (static and runtime), the
  * identity allocator survives the swap, and live streaming writers /
  * renamed partition targets refuse loudly. */
class AuditRepartitionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def freshCat(tag: String): (String, java.nio.file.Path) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_rpt_${tag}_")
    val cat = s"graft_rpt_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("repartition day→region: identical answers, new dirs, pruned reads") {
    val (cat, wh) = freshCat("main")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, day BIGINT, " +
      "region BIGINT, v BIGINT) USING audit PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.t " +
      "SELECT id, id % 5, id % 3, id * 2 FROM range(300)")
    // DML history in the OLD layout (per-dir vectors + replacements)
    spark.sql(s"UPDATE $cat.db.t SET v = 111 WHERE id % 50 = 7")
    val before = spark.sql(
      s"SELECT id, day, region, v FROM $cat.db.t ORDER BY id").collect().toSeq
    val res = spark.sql(s"CALL $cat.system.repartition_table(" +
      "table => 'db.t', spec => 'region')").head
    assert(res.getInt(2) === 3 && res.getLong(3) === 300L)
    // answers identical across the layout change
    assert(spark.sql(s"SELECT id, day, region, v FROM $cat.db.t ORDER BY id")
      .collect().toSeq === before)
    // physically re-laid out by region
    val dirs = AuditPartition
      .listDirsByCols(wh.resolve("db/t").toString, Seq("region"))
    assert(dirs.map(_._1).toSet ===
      Set("region=0", "region=1", "region=2"))
    // static pruning on the NEW layout: only region=1's directory plans
    val pruned = spark.sql(s"SELECT count(*) FROM $cat.db.t WHERE region = 1")
    assert(pruned.head.getLong(0) === 100L)
    // runtime (DPP) pruning on the new layout
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dim = spark.range(0, 1).toDF("k")
        .select((col("k") + 2L).as("region")).where(col("region") >= 0L)
      val joined = spark.table(s"$cat.db.t").join(broadcast(dim), "region")
      assert(joined.count() === 100L)
      val scans = joined.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.exists(_.runtimeFilters.nonEmpty),
        "expected a dynamicpruning filter on the repartitioned scan")
      assert(joined.collect().length === 100)
      assert(scans.flatMap(_.scan match {
        case s: AuditScan => s.runtimeFilterApi
        case _            => None
      }).nonEmpty, "expected runtime directory pruning on the new layout")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("unpartitioned → partitioned; identity values survive, allocator too") {
    val (cat, _) = freshCat("ident")
    spark.sql(
      s"""CREATE TABLE $cat.db.i (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10
         |    INCREMENT BY 5),
         |  flag BIGINT, v STRING) USING audit""".stripMargin)
    spark.sql(s"INSERT INTO $cat.db.i (flag, v) " +
      "SELECT id % 3, concat('r', id) FROM range(60)")
    val before = spark.sql(s"SELECT v, id FROM $cat.db.i").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    spark.sql(s"CALL $cat.system.repartition_table(" +
      "table => 'db.i', spec => 'flag')")
    val after = spark.sql(s"SELECT v, id FROM $cat.db.i").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(after === before, "identity values must be scan-carried")
    // the allocator high-water mark moved with the swap: fresh inserts
    // must not reuse any existing value
    spark.sql(s"INSERT INTO $cat.db.i (flag, v) VALUES (1, 'fresh')")
    val ids = spark.sql(s"SELECT id FROM $cat.db.i").collect()
      .map(_.getLong(0))
    assert(ids.length === 61 && ids.distinct.length === 61,
      "post-repartition inserts must allocate FRESH identity values")
  }

  test("crash between dir swap and meta update self-heals on next load") {
    val (cat, _) = freshCat("heal")
    spark.sql(s"CREATE TABLE $cat.db.h (id BIGINT, day BIGINT, " +
      "region BIGINT) USING audit PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.h SELECT id, id % 5, id % 3 " +
      "FROM range(100)")
    val before = spark.sql(s"SELECT id, day, region FROM $cat.db.h " +
      "ORDER BY id").collect().toSeq
    spark.sql(s"CALL $cat.system.repartition_table(" +
      "table => 'db.h', spec => 'region')")
    // simulate the crash window: the dir swap landed (data is
    // region-partitioned, `_PARTSPEC` says so) but the catalog meta
    // update never happened — roll the stored spec back to the old one
    val catalog = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    catalog.updatePartitionSpec("db.h", "day")
    spark.catalog.refreshTable(s"$cat.db.h")
    // the next load reconciles the stored spec from the data dir's
    // replica instead of misreading the new layout through the old spec
    assert(spark.sql(s"SELECT id, day, region FROM $cat.db.h ORDER BY id")
      .collect().toSeq === before)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.h WHERE region = 1")
      .head.getLong(0) === 33L)
  }

  test("refusals: live streaming writer; renamed partition target") {
    val (cat, _) = freshCat("refuse")
    spark.sql(s"CREATE TABLE $cat.db.s (id BIGINT, flag BIGINT) USING audit")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rpt_sck")
    val w = spark.readStream.format(classOf[PagedSource].getName)
      .option("pages", "1").option("pageSize", "50")
      .load().select(col("id"), (col("id") % 2).as("flag"))
      .writeStream.option("checkpointLocation", ckpt.toString)
      .outputMode("append").toTable(s"$cat.db.s")
    try {
      w.processAllAvailable()
      // the writer lease is LIVE (query still running)
      val ex = intercept[Exception](spark.sql(
        s"CALL $cat.system.repartition_table(table => 'db.s', " +
          "spec => 'flag')"))
      assert(ex.getMessage.contains("streaming query"), ex.getMessage)
    } finally w.stop()

    spark.sql(s"CREATE TABLE $cat.db.r (id BIGINT, flag BIGINT) USING audit")
    spark.sql(s"INSERT INTO $cat.db.r VALUES (1, 0)")
    spark.sql(s"ALTER TABLE $cat.db.r RENAME COLUMN flag TO region")
    val ex2 = intercept[Exception](spark.sql(
      s"CALL $cat.system.repartition_table(table => 'db.r', " +
        "spec => 'region')"))
    assert(ex2.getMessage.contains("renamed"), ex2.getMessage)
  }
}
