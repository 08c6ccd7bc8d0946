package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the lakehouse layout operators at sf0.001
  * (exact values are DuckDB-oracle-checked at sf0.01; these assert the
  * properties that must hold at any scale). */
class LakeOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("scd2 runs partition each user's events; exactly one current run per user") {
    val runs = LakeOps.scd2Build(spark, d).collect()
    val byUser = runs.groupBy(_.getAs[Long]("user_id"))
    val eventCounts = graft.Tables.events(spark, d)
      .groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    byUser.foreach { case (u, rs) =>
      assert(rs.map(_.getAs[Long]("n_events")).sum === eventCounts(u))
      assert(rs.count(_.getAs[Long]("is_current") == 1L) === 1)
      // intervals chain: run k's valid_to is run k+1's valid_from
      val sorted = rs.sortBy(_.getAs[Long]("run_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.time.LocalDateTime]("valid_to") ===
            b.getAs[java.time.LocalDateTime]("valid_from"))
          // consecutive runs must differ in type (else they'd be one run)
          assert(a.getAs[String]("event_type") !== b.getAs[String]("event_type"))
        case _ =>
      }
    }
  }

  test("merged intervals are disjoint with a strict gap, and account for every event") {
    val merged = LakeOps.intervalMerge(spark, d).collect()
    val nEvents = graft.Tables.events(spark, d).count()
    assert(merged.map(_.getAs[Long]("n_merged")).sum === nEvents)
    merged.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("island"))
      sorted.foreach { r =>
        assert(!r.getAs[java.time.LocalDateTime]("merged_end")
          .isBefore(r.getAs[java.time.LocalDateTime]("merged_start")))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // islands are maximal: the next island starts strictly after
          // this one ends (touching intervals would have merged)
          assert(b.getAs[java.time.LocalDateTime]("merged_start")
            .isAfter(a.getAs[java.time.LocalDateTime]("merged_end")))
        case _ =>
      }
    }
  }

  test("zorder key is the exact Morton interleave and bins are its high bits") {
    def morton(x: Long, y: Long): Long =
      (0 until 10).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rows = LakeOps.zorderKeys(spark, d).collect()
    rows.foreach { r =>
      val z = r.getAs[Long]("zkey")
      assert(z === morton(r.getAs[Long]("x"), r.getAs[Long]("y")))
      assert(z >= 0L && z < (1L << 20))
      assert(r.getAs[Long]("file_bin") === (z >> 10))
    }
  }

  test("snapshot diff classifies exactly the constructed deletes/inserts/updates") {
    val diff = LakeOps.snapshotDiff(spark, d).collect()
    val byOp = diff.groupBy(_.getAs[String]("op")).view.mapValues(_.length).toMap
    val keys = graft.Tables.customer(spark, d).select("c_custkey").collect()
      .map(_.getLong(0))
    assert(byOp.getOrElse("D", 0) === keys.count(_ % 10 == 0))
    assert(byOp.getOrElse("I", 0) === keys.count(_ < 20))
    assert(byOp.getOrElse("U", 0) === keys.count(_ % 10 == 1))
    diff.filter(_.getAs[String]("op") == "U").foreach(r =>
      assert(r.getAs[Long]("new_cents") === r.getAs[Long]("old_cents") + 10000L))
  }

  test("column profile: null/distinct counts are bounded and row count is constant") {
    val rows = LakeOps.columnProfile(spark, d).collect()
    assert(rows.length === 4)
    val ns = rows.map(_.getAs[Long]("n_rows")).distinct
    assert(ns.length === 1, "every column sees the same row count")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_null") <= ns.head)
      assert(r.getAs[Long]("n_distinct") >= 1L &&
        r.getAs[Long]("n_distinct") <= ns.head)
      assert(r.getAs[String]("min_s") != null && r.getAs[String]("max_s") != null)
    }
  }

  test("range buckets are contiguous, ordered, and balanced to within one row") {
    val rows = LakeOps.rangeBounds(spark, d).collect().sortBy(_.getAs[Long]("bucket"))
    val counts = rows.map(_.getAs[Long]("n_rows"))
    assert(counts.sum === graft.Tables.orders(spark, d).count())
    assert(counts.max - counts.min <= 1, "ntile guarantees near-equal buckets")
    rows.foreach(r => assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents")))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"))
      case _ =>
    }
  }

  test("compaction hits the target file count and loses no rows") {
    def partFiles(p: java.nio.file.Path): Int = {
      val s = java.nio.file.Files.list(p)
      try s.filter(_.getFileName.toString.startsWith("part-")).count().toInt
      finally s.close()
    }
    val root = java.nio.file.Files.createTempDirectory("graft_compact")
    val small = root.resolve("small"); val compacted = root.resolve("big")
    val src = graft.Tables.orders(spark, d)
    // simulate per-batch append debris: 64 small files
    src.repartition(64).write.mode("overwrite").parquet(small.toString)
    assert(partFiles(small) === 64)
    val n = LakeOps.compact(spark, small.toString, compacted.toString, 4)
    assert(partFiles(compacted) === 4)
    assert(n === src.count())
    // content parity: same multiset of keys
    val a = spark.read.parquet(compacted.toString)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val b = src.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(a === b)
  }
}
