package graft.probes

import org.apache.spark.sql.SparkSession

/** Phase decomposition of q_audit_zorder (guide §1.1): CREATE+INSERT vs
  * OPTIMIZE(zorder) vs the final pruned SELECT. */
object ProbeAudit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe-audit] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val wh = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_probe_az_wh")
    spark.conf.set("spark.sql.catalog.graft_paz",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_paz.warehouse", wh.toString)
    graft.Tables.lineitem(spark, d).createOrReplaceTempView("probe_az_li")
    // sub-phase: the approxQuantile pass alone on the insert'd table shape
    val li = graft.Tables.lineitem(spark, d)
      .selectExpr("l_orderkey AS okey", "l_partkey AS pkey")
    (1 to 3).foreach { rep =>
      val bits = 10
      val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
      t("approxQuantile 1023pts e=0.001") {
        li.selectExpr("cast(okey as double) okey", "cast(pkey as double) pkey")
          .stat.approxQuantile(Array("okey", "pkey"), probs, 0.001)
      }
      t("approxQuantile 1023pts e=0.005") {
        li.selectExpr("cast(okey as double) okey", "cast(pkey as double) pkey")
          .stat.approxQuantile(Array("okey", "pkey"), probs, 0.005)
      }
      t("sample(0.05) e=0.005") {
        li.selectExpr("cast(okey as double) okey", "cast(pkey as double) pkey")
          .sample(0.05, 42L)
          .stat.approxQuantile(Array("okey", "pkey"), probs, 0.005)
      }
      t("sample(0.02) e=0.01") {
        li.selectExpr("cast(okey as double) okey", "cast(pkey as double) pkey")
          .sample(0.02, 42L)
          .stat.approxQuantile(Array("okey", "pkey"), probs, 0.01)
      }
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      t("drop") { spark.sql("DROP TABLE IF EXISTS graft_paz.db.zsales") }
      t("create") { spark.sql(
        """CREATE TABLE graft_paz.db.zsales (okey BIGINT, pkey BIGINT, qty BIGINT)
          |USING audit""".stripMargin) }
      t("insert 600k") { spark.sql(
        """INSERT INTO graft_paz.db.zsales
          |SELECT l_orderkey, l_partkey, CAST(l_quantity AS BIGINT)
          |FROM probe_az_li""".stripMargin) }
      t("optimize zorder") { spark.sql(
        "CALL graft_paz.system.optimize(table => 'db.zsales', " +
          "target_file_count => 16, zorder_by => 'okey,pkey')") }
      t("final select") { spark.sql(
        """SELECT okey % 10 AS g, count(*) AS n_rows,
          |       CAST(sum(qty) AS BIGINT) AS sum_qty,
          |       min(pkey) AS min_pkey, max(okey) AS max_okey
          |FROM graft_paz.db.zsales
          |WHERE okey >= 1000 AND okey < 3000 AND pkey >= 500 AND pkey < 1500
          |GROUP BY 1
          |ORDER BY g""".stripMargin).queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
