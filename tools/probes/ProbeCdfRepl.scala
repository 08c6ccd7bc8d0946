package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Dev probe: dump the micro-batches the restarted CDF tail sees in the
  * q_cdf_replica shape, to verify the survivor fold inputs. */
object ProbeCdfRepl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("probe_qrep_wh")
    spark.conf.set("spark.sql.catalog.graft_probe",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_probe.warehouse", wh.toString)
    spark.sql("CREATE TABLE graft_probe.db.src (id BIGINT, v BIGINT) USING audit")
    spark.sql("CREATE TABLE graft_probe.db.rep (id BIGINT, v BIGINT) USING audit")
    val cdfSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_pos",
        org.apache.spark.sql.types.LongType)))
    val ckpt = java.nio.file.Files.createTempDirectory("probe_qrep_ckpt")
    def startTail() = spark.readStream.schema(cdfSchema)
      .format(classOf[JsonAuditSink].getName)
      .option("path", wh.resolve("db").resolve("src").toString)
      .option("changeFeed", "true").load()
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        println(s"=== batch $bid ===")
        batch.groupBy(col("_change_type")).count().show()
        batch.filter(col("id").isin(3L, 5L, 17L, 103L)).orderBy("id").show(50, false)
        ()
      }
      .start()
    val t1 = startTail()
    try {
      spark.sql(
        "INSERT INTO graft_probe.db.src SELECT id, id * 7 AS v FROM range(0, 400)")
      t1.processAllAvailable()
    } finally t1.stop()
    spark.sql(
      """MERGE INTO graft_probe.db.src t
        |USING (SELECT * FROM VALUES (5L, 111L), (17L, 111L), (1000L, 222L)
        |       AS s(id, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql(
      "DELETE FROM graft_probe.db.src WHERE (id % 100 = 3 AND id < 400) OR id = 5")
    val srcPath = wh.resolve("db").resolve("src").toString
    println("AFTER MERGE+DELETE (before tail2):")
    println("manifest: " + AuditBase.readManifest(srcPath))
    println("deletes: " + AuditDeletes.entries(srcPath))
    println("src count: " + spark.sql(
      "SELECT count(*) FROM graft_probe.db.src").head.getLong(0))
    println("src 3/5/17/1000: " + spark.sql(
      "SELECT * FROM graft_probe.db.src WHERE id IN (3,5,17,1000) ORDER BY id")
      .collect().mkString(", "))
    val t2 = startTail()
    try t2.processAllAvailable() finally t2.stop()
    println("manifest: " + AuditBase.readManifest(srcPath))
    println("deletes: " + AuditDeletes.entries(srcPath))
    println("epochs: " + AuditScan.committedEpochs(srcPath))
    println("ckpt offsets:")
    val odir = ckpt.resolve("offsets")
    if (java.nio.file.Files.isDirectory(odir)) {
      val l = java.nio.file.Files.list(odir)
      try l.iterator().forEachRemaining { f =>
        if (java.nio.file.Files.isRegularFile(f))
          println(f.getFileName + " -> " + new String(
            java.nio.file.Files.readAllBytes(f), "ISO-8859-1").take(300))
      } finally l.close()
    }
    spark.stop()
  }
}
