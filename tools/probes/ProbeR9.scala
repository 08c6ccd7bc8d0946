package graft

import org.apache.spark.sql.SparkSession

/** Dev-only feature probe for this round's candidates (deleted or kept as
  * dev scratch; not part of the library surface). */
object ProbeR9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def probe(name: String)(f: => Unit): Unit =
      try { f; println(s"[probe] OK  $name") }
      catch { case e: Throwable => println(s"[probe] ERR $name: ${e.getMessage.take(300)}") }

    probe("sql-scalar-udf") {
      spark.sql("CREATE TEMPORARY FUNCTION add_one(x INT) RETURNS INT RETURN x + 1")
      val r = spark.sql("SELECT add_one(41) AS v").collect()(0).getInt(0)
      println(s"  add_one(41) = $r")
    }
    probe("sql-table-udf") {
      spark.sql("CREATE TEMPORARY FUNCTION seqs(n INT) RETURNS TABLE(x INT) RETURN SELECT explode(sequence(1, n))")
      val r = spark.sql("SELECT * FROM seqs(3)").collect().map(_.getInt(0)).mkString(",")
      println(s"  seqs(3) = $r")
    }
    probe("bitmap-agg") {
      val r = spark.sql(
        """SELECT bitmap_count(bitmap_or_agg(bm)) AS nd FROM (
          |  SELECT bitmap_bucket_number(v) AS b,
          |         bitmap_construct_agg(bitmap_bit_position(v)) AS bm
          |  FROM (SELECT explode(array(1, 2, 2, 3, 40000, 40000)) AS v)
          |  GROUP BY 1)""".stripMargin).collect()(0)
      println(s"  distinct = $r")
    }
    probe("group-by-all-order-by-all-offset") {
      val r = spark.sql(
        """SELECT v % 3 AS g, count(*) AS c
          |FROM (SELECT explode(sequence(1, 10)) AS v)
          |GROUP BY ALL ORDER BY ALL LIMIT 2 OFFSET 1""".stripMargin).collect()
      println("  rows = " + r.mkString(";"))
    }
    probe("lateral-column-alias") {
      val r = spark.sql("SELECT 2 AS a, a * 3 AS b").collect()(0)
      println(s"  r = $r")
    }
    probe("regexp-sentence-split") {
      val r = spark.sql(
        """SELECT split('One two. Three four! Five? Six', '(?<=[.!?]) +') AS s""").collect()(0)
      println(s"  split = $r")
    }

    // one-JVM A/B: old full-dist-broadcast superstep vs the committed
    // delta-frontier superstep, same graph, min-of-2 each (the bench ran
    // under loadavg 2.6 — this is the controlled number)
    probe("sssp-superstep-ab") {
      import org.apache.spark.sql.functions._
      val d = args.headOption.getOrElse("/root/testdata/sf0.1")
      def build() = {
        val pairs = graft.Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(graft.Tables.lineitem(spark, d)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
          .distinct().localCheckpoint()
        pairs.select(col("c").as("src"), col("s").as("dst"))
          .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
          .withColumn("w", lit(1000L) +
            graft.functions.Hashing.hexHash(
              concat_ws(":", col("src"), col("dst"))) % 250L)
          .localCheckpoint()
      }
      val edges = build()
      val s0 = edges.agg(min(col("src"))).head.getLong(0)
      def seed() = spark.range(1)
        .select(lit(s0).as("node"), lit(0L).as("dist")).localCheckpoint()
      def oldStyle(): Long = {
        var dist = seed()
        for (_ <- 1 to 5) {
          val relaxed = edges.join(broadcast(dist), col("src") === col("node"))
            .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
          dist = dist.unionByName(relaxed)
            .groupBy(col("node")).agg(min(col("dist")).as("dist")).localCheckpoint()
        }
        dist.count()
      }
      def newStyle(): Long = {
        var dist = seed(); var frontier = dist
        for (_ <- 1 to 5) {
          val (nd, imp) = graft.ops.GraphOps.ssspStep(edges, dist, frontier)
          dist = nd; frontier = imp
        }
        dist.count()
      }
      def time(f: () => Long): Double = {
        val t0 = System.nanoTime(); val n = f()
        val s = (System.nanoTime() - t0) / 1e9
        assert(n == 1600L || n > 0); s
      }
      val o = math.min(time(oldStyle _), time(oldStyle _))
      val n = math.min(time(newStyle _), time(newStyle _))
      println(f"  old(full-dist broadcast) $o%.2f s  new(delta frontier) $n%.2f s")
    }
    spark.stop()
  }
}
