package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Optimistic concurrency for PARTITIONED audit appends: each partition
  * directory carries its own `_TXN` put-if-absent log (same discipline
  * and file format as the table-level one), so concurrent partitioned
  * INSERTs never read-modify-write a partition `_MANIFEST` — the exact
  * clobber the unpartitioned OCC work eliminated, now covered for the
  * date-partitioned-zones layout where concurrent daily backfills are
  * the natural multi-writer case. */
class AuditPartitionedOccSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("part", LongType)))

  private def tempDir() =
    java.nio.file.Files.createTempDirectory("graft_pocc_")

  /** Append [from, until) with part = id % nParts, through the
    * partition-routing writer. */
  private def append(dir: java.nio.file.Path, from: Long, until: Long,
      nParts: Int): Unit =
    spark.range(from, until).toDF("id")
      .withColumn("part", pmod(col("id"), lit(nParts.toLong)))
      .repartition(2)
      .write.format(classOf[JsonAuditSink].getName)
      .option("path", dir.toString)
      .option("partitionby", "part")
      .mode("append").save()

  private def read(dir: java.nio.file.Path) =
    spark.read.schema(schema).format(classOf[JsonAuditSink].getName)
      .option("path", dir.toString)
      .option("partitionby", "part").load()

  test("CONCURRENT partitioned appends: no commit loses rows in any partition") {
    val dir = tempDir()
    val nParts = 3
    val writers = 6
    val ranges = (0 until writers).map(i => (i * 1000L, i * 1000L + 1000L))
    // every writer touches EVERY partition (ids mod 3), so all six
    // commits contend on all three partition manifests simultaneously —
    // under the old read-modify-write per-dir manifest, racing commits
    // read the same prior entry list and the last writer orphans the
    // others' files
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = ranges.map { case (a, b) =>
      new Thread(() =>
        try append(dir, a, b, nParts)
        catch { case t: Throwable => failures.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty, failures.asScala.map(_.toString).mkString("\n"))
    assert(read(dir).count() === (writers * 1000).toLong)
    assert(read(dir).agg(countDistinct(col("id"))).head.getLong(0)
      === (writers * 1000).toLong)
    // per-partition totals are exact — no partition lost a slice
    val perPart = read(dir).groupBy("part").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0 until nParts).foreach { p =>
      val expected = (0L until writers * 1000L).count(_ % nParts == p).toLong
      assert(perPart(p.toLong) === expected, s"partition $p")
    }
    // each partition dir holds one txn per writer, versions contiguous
    AuditPartition.listDirsByCols(dir.toString, Seq("part")).foreach { case (tok, pdir) =>
      val txns = {
        val l = java.nio.file.Files.list(pdir.resolve("_TXN"))
        try l.iterator().asScala.map(_.getFileName.toString).toSeq
          .sortBy(_.stripSuffix(".json").toInt)
        finally l.close()
      }
      assert(txns === (1 to writers).map(v => s"$v.json"), s"part=$tok: $txns")
    }
  }

  test("partition txns consolidate into per-dir manifests; reads stable") {
    val dir = tempDir()
    append(dir, 0L, 300L, 3)
    append(dir, 300L, 600L, 3)
    val before = read(dir).collect().map(_.getLong(0)).sorted.toSeq
    AuditPartition.listDirsByCols(dir.toString, Seq("part")).foreach { case (_, pdir) =>
      AuditBase.consolidate(pdir.toString)
      // manifest carries everything, floor advanced, txn dir emptied
      assert(AuditBase.readTxnFloor(pdir.toString) === 2L)
      assert(AuditBase.readManifest(pdir.toString).nonEmpty)
      val left = {
        val td = pdir.resolve("_TXN")
        if (!java.nio.file.Files.isDirectory(td)) 0L
        else { val l = java.nio.file.Files.list(td); try l.count() finally l.close() }
      }
      assert(left === 0L)
    }
    assert(read(dir).collect().map(_.getLong(0)).sorted.toSeq === before)
    // a post-consolidation append publishes ABOVE the floor
    append(dir, 600L, 900L, 3)
    assert(read(dir).count() === 900L)
    AuditPartition.listDirsByCols(dir.toString, Seq("part")).foreach { case (tok, pdir) =>
      val vs = AuditBase.liveTxnVersions(pdir.toString)
      assert(vs === Seq(3L), s"part=$tok: $vs")
    }
  }

  test("pruned reads and metadata counts see unconsolidated partition txns") {
    val dir = tempDir()
    append(dir, 0L, 300L, 3)
    // partition-pruned scan over txn-only state
    val one = read(dir).filter(col("part") === 1L)
    assert(one.count() === 100L)
    // zone-map stats travel inside the txn: a selective id predicate
    // still skips (the bounds exist before any consolidation)
    assert(read(dir).filter(col("id") === 7L).count() === 1L)
    // streaming epochs and txn appends coexist: the epoch writer's
    // retraction path consolidates before its manifest rewrite
    val stats = AuditStats.read(
      AuditPartition.listDirsByCols(dir.toString, Seq("part")).head._2.toString)
    assert(stats.nonEmpty, "per-file stats must be visible pre-consolidation")
  }
}
