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
    spark.stop()
  }
}
