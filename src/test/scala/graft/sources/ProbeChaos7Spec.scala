package graft.sources

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ProbeChaos7Spec extends AnyFunSuite {
  private lazy val spark: SparkSession = SparkSpec.session
  test("replay pseed 7 verbose, no tail") {
    val seed = 7
    val wh = java.nio.file.Files.createTempDirectory(s"graft_pchaos_${seed}_")
    val cat = s"graft_pchaos_$seed"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val path = wh.resolve("db").resolve("t").toString
    val rnd = new scala.util.Random(seed)
    val model = mutable.Set.empty[Long]
    var nextId = 0L
    for (wave <- 1 to 5) {
      val nThreads = 1 + rnd.nextInt(2)
      val appendThreads = (0 until nThreads).map { _ =>
        val from = nextId; nextId += 90
        model ++= (from until from + 90)
        new Thread(() => spark.sql(
          s"INSERT INTO $cat.db.t SELECT id, id % 3 FROM " +
            s"range($from, ${from + 90})"))
      }
      val doMaint = rnd.nextInt(10) < 3
      val maintOpt = if (doMaint) rnd.nextBoolean() else false
      val maintThread: Option[Thread] =
        if (doMaint) Some(new Thread(() => {
          try {
            if (maintOpt)
              spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
                "target_file_count => 2)").collect()
            else
              spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()
          } catch { case t: Throwable =>
            println(s"WAVE $wave maint refused: ${t.getMessage.take(120)}") }
        })) else None
      println(s"WAVE $wave: $nThreads inserts, maint=$doMaint opt=$maintOpt")
      val threads = rnd.shuffle(appendThreads ++ maintThread.toSeq)
      threads.foreach(_.start())
      threads.foreach(_.join())
      if (wave == 3) {
        println(s"WAVE $wave: sequential OPTIMIZE")
        spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
          "target_file_count => 2)").collect()
      }
      if (wave == 5) {
        println(s"WAVE $wave: sequential VACUUM")
        try spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()
        catch { case t: Throwable =>
          println(s"VACUUM refused: ${t.getMessage.take(120)}") }
      }
      if (rnd.nextBoolean()) {
        val m = 7 + rnd.nextInt(7)
        val r = rnd.nextInt(m)
        println(s"WAVE $wave: DELETE %% $m = $r")
        spark.sql(s"DELETE FROM $cat.db.t WHERE id % $m = $r")
        model --= model.filter(_ % m == r)
      }
      spark.catalog.refreshTable(s"$cat.db.t")
      val cnt = spark.table(s"$cat.db.t").count()
      println(s"WAVE $wave: table=$cnt model=${model.size}")
      if (cnt != model.size) {
        val ids = spark.table(s"$cat.db.t").select("id")
          .collect().map(_.getLong(0)).toSet
        val missing = model.toSet -- ids
        val extra = ids -- model.toSet
        println(s"missing=${missing.toSeq.sorted.take(50)}")
        println(s"extra=${extra.toSeq.sorted.take(50)}")
        AuditPartition.listDirsByCols(path, Seq("flag")).foreach {
          case (rel, d) =>
            println(s"$rel: base=${AuditBase.read(d.toString)} " +
              s"live=${AuditBase.readManifest(d.toString).filterNot(_.folded).map(e => (e.file, e.rows))} " +
              s"dels=${AuditDeletes.count(d.toString)}")
        }
      }
    }
  }
}
