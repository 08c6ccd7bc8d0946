package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared one-session-per-suite base (UTC, small shuffle partitions). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  private val catSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Unique catalog name per call. Spark's CatalogManager caches the
    * plugin INSTANCE by name on first load — re-registering a used name
    * with a different warehouse conf silently keeps the old instance
    * (and its old warehouse), so a second `CREATE TABLE cat.db.t` sees
    * the FIRST run's table and fails TABLE_OR_VIEW_ALREADY_EXISTS.
    * Any test body that can run more than once per JVM (a suite re-run
    * nested under [[graft.sources.CommitPrimitives.withImpl]], a shared
    * chaos seed) must take its catalog name from here. */
  def uniqueCat(prefix: String): String =
    s"${prefix}_c${catSeq.incrementAndGet()}"

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
