package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Format-integration coverage beyond the reference's JSON/CSV/parquet:
  * the built-in ORC columnar format round-trips with predicate pushdown
  * intact, and the `binaryFile` source feeds the multimodal decode
  * pipeline exactly as the in-memory fixture does — which is how a real
  * 100 TB image corpus (files on object storage) would enter the engine. */
class FormatIntegrationSpec extends SparkSpec {

  test("ORC round-trips lineitem exactly and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    li.write.mode("overwrite").orc(dir.toString)
    val back = spark.read.orc(dir.toString)
    assert(back.count() === li.count())
    // value-exact: same exact money total over the round trip
    val total = graft.functions.Money.moneySum(col("l_extendedprice"))
    assert(back.agg(total).head.getDouble(0) === li.agg(total).head.getDouble(0))
    // predicate pushdown reaches the ORC scan like the parquet scans
    val pruned = back.where(col("l_quantity") < 5.0 &&
      col("l_returnflag") === "R")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") &&
      scan.contains("LessThan(l_quantity,5.0)"), scan.take(1500))
    assert(pruned.count() ===
      li.where(col("l_quantity") < 5.0 && col("l_returnflag") === "R").count())
  }

  test("binaryFile source drives the real PNG decode pipeline file-identically") {
    import graft.operators.Multimodal
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binfiles")
    val ids = 0L until 40L
    ids.foreach { id =>
      java.nio.file.Files.write(dir.resolve(f"img_$id%05d.png"),
        Multimodal.encodePng(id))
    }
    // a stray non-image must be excluded by the glob, not crash the decode
    java.nio.file.Files.write(dir.resolve("notes.txt"), "x".getBytes)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir.toString)
    assert(bin.count() === ids.length.toLong)
    val recs = bin.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        val id = name.stripPrefix("img_").stripSuffix(".png").toLong
        Multimodal.MediaRecord(id, bytes, "image/png")
      }
    val viaFiles = recs
      .mapPartitions(it => it.grouped(Multimodal.BatchSize)
        .flatMap(Multimodal.decodeBatch))
      .collect().map(f => f.doc_id -> f).toMap
    assert(viaFiles.keySet === ids.toSet)
    // decoded features equal the generation formulas — the files went
    // through a REAL codec round trip (write → binaryFile → ImageIO)
    ids.foreach { id =>
      val f = viaFiles(id)
      assert(f.width === Multimodal.imgWidth(id).toLong)
      assert(f.height === Multimodal.imgHeight(id).toLong)
    }
  }
}
