package graft.sources

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CONTRACT SPEC for the five commit primitives ([[CommitPrimitives]])
  * — the compile-time port surface of the SCALING.md object-store
  * mapping. Two halves:
  *
  *  1. The PRIMITIVE CONTRACTS, driven against [[PosixCommitPrimitives]]
  *     under real thread races: put-if-absent admits exactly one winner,
  *     rename-claim admits one claimant per source, whole-file replace
  *     never exposes torn content.
  *
  *  2. The SEAM IS LOAD-BEARING: an instrumented decorator installed via
  *     [[CommitPrimitives.withImpl]] observes a real maintenance/commit
  *     composition (OCC batch appends, delta DML, VACUUM fold, OPTIMIZE,
  *     a streaming epoch) exercising ALL FIVE primitives — proving every
  *     race/chaos suite in this repo (AuditSeqSpec's 400 claimants,
  *     AuditMaintLockSpec, AuditOccSpec, AuditChaosSpec) drives its
  *     scenarios THROUGH the trait, so an object-store implementation
  *     inherits their coverage by swapping one value.
  */
class CommitPrimitivesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private def race(n: Int)(body: Int => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(n)
    (0 until n).foreach { i =>
      pool.execute { () =>
        start.await()
        try body(i) finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(60, TimeUnit.SECONDS), "racers timed out")
    pool.shutdown()
  }

  test("createMarker: exactly one creator wins among 32 racers") {
    val d = java.nio.file.Files.createTempDirectory("graft_cp_mark")
    val wins = new AtomicInteger(0)
    race(32) { _ =>
      try { CommitPrimitives.io.createMarker(d.resolve("M")); wins.incrementAndGet() }
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    assert(wins.get === 1)
  }

  test("linkIfAbsent: one publisher wins; the staged sources all remain") {
    val d = java.nio.file.Files.createTempDirectory("graft_cp_link")
    val srcs = (0 until 16).map { i =>
      val p = d.resolve(s"stage-$i")
      java.nio.file.Files.write(p, s"content-$i".getBytes("UTF-8"))
      p
    }
    val wins = new AtomicInteger(0)
    val winner = new AtomicInteger(-1)
    race(16) { i =>
      try {
        CommitPrimitives.io.linkIfAbsent(d.resolve("K"), srcs(i))
        wins.incrementAndGet(); winner.set(i)
      } catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    assert(wins.get === 1)
    // the published content is exactly the winner's staged bytes
    assert(new String(java.nio.file.Files.readAllBytes(d.resolve("K")),
      "UTF-8") === s"content-${winner.get}")
    srcs.foreach(p => assert(java.nio.file.Files.exists(p)))
  }

  test("renameClaim: one claimant per source; losers observe it gone") {
    val d = java.nio.file.Files.createTempDirectory("graft_cp_ren")
    java.nio.file.Files.write(d.resolve("cur"), "v".getBytes("UTF-8"))
    val wins = new AtomicInteger(0)
    val lostRace = new AtomicInteger(0)
    race(16) { i =>
      try {
        CommitPrimitives.io.renameClaim(d.resolve("cur"), d.resolve(s"t-$i"))
        wins.incrementAndGet()
      } catch {
        case _: java.nio.file.NoSuchFileException => lostRace.incrementAndGet()
        case _: java.nio.file.FileAlreadyExistsException => ()
      }
    }
    assert(wins.get === 1)
    assert(lostRace.get === 15)
    assert(!java.nio.file.Files.exists(d.resolve("cur")))
  }

  test("replace: concurrent readers never observe torn content") {
    val d = java.nio.file.Files.createTempDirectory("graft_cp_rep")
    val f = d.resolve("F")
    val a = ("A" * 8192 + "\n").getBytes("UTF-8")
    val b = ("B" * 8192 + "\n").getBytes("UTF-8")
    CommitPrimitives.io.replace(f, a)
    @volatile var torn: Option[String] = None
    @volatile var writing = true
    val reader = new Thread(() => {
      while (writing && torn.isEmpty) {
        val c = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        if (!(c.forall(ch => ch == 'A' || ch == '\n') && c.length == a.length) &&
            !(c.forall(ch => ch == 'B' || ch == '\n') && c.length == b.length))
          torn = Some(s"len=${c.length} head=${c.take(20)}")
      }
    })
    reader.start()
    (0 until 300).foreach(i => CommitPrimitives.io.replace(f,
      if (i % 2 == 0) b else a))
    writing = false
    reader.join(10000)
    assert(torn.isEmpty, s"torn read: $torn")
  }

  test("appendBounded: creates on first use, accumulates in order") {
    val d = java.nio.file.Files.createTempDirectory("graft_cp_app")
    val f = d.resolve("L")
    CommitPrimitives.io.appendBounded(f, "one\n".getBytes("UTF-8"))
    CommitPrimitives.io.appendBounded(f, "two\n".getBytes("UTF-8"))
    assert(java.nio.file.Files.readAllLines(f).toString === "[one, two]")
  }

  /** Counting decorator — behavior identical to the POSIX impl. */
  private final class Counting(under: CommitPrimitives)
      extends CommitPrimitives {
    val marks, links, claims, replaces, appends, publishes =
      new AtomicInteger(0)
    override def createMarker(t: java.nio.file.Path): Unit = {
      marks.incrementAndGet(); under.createMarker(t)
    }
    override def linkIfAbsent(t: java.nio.file.Path,
        s: java.nio.file.Path): Unit = {
      links.incrementAndGet(); under.linkIfAbsent(t, s)
    }
    override def renameClaim(s: java.nio.file.Path,
        t: java.nio.file.Path): Unit = {
      claims.incrementAndGet(); under.renameClaim(s, t)
    }
    override def replace(t: java.nio.file.Path,
        c: Array[Byte]): Unit = {
      replaces.incrementAndGet(); under.replace(t, c)
    }
    override def appendBounded(t: java.nio.file.Path,
        c: Array[Byte]): Unit = {
      appends.incrementAndGet(); under.appendBounded(t, c)
    }
    override def publishData(s: java.nio.file.Path,
        t: java.nio.file.Path, r: Boolean): Unit = {
      publishes.incrementAndGet(); under.publishData(s, t, r)
    }
  }

  test("the seam is load-bearing: a real commit/maintenance composition " +
    "exercises all five primitives through CommitPrimitives.io") {
    val counting = new Counting(PosixCommitPrimitives)
    CommitPrimitives.withImpl(counting) {
      val wh = java.nio.file.Files.createTempDirectory("graft_cp_seam")
      val cat = graft.SparkSpec.uniqueCat("graft_cp_seam")
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
      // OCC batch append: _SEQ stamp claim (createMarker/renameClaim) +
      // _TXN publish (linkIfAbsent) + stats (appendBounded)
      spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(100)")
      spark.sql(s"INSERT INTO $cat.db.t SELECT id + 100, id FROM range(10)")
      // delta DML: maintenance lease (linkIfAbsent) + vector append
      spark.sql(s"DELETE FROM $cat.db.t WHERE id % 10 = 3")
      // VACUUM fold + OPTIMIZE publish: whole-file replaces of
      // _DELETES/_MANIFEST/_BASE/_EPOCHS/_STATS
      spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
      spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
        "target_file_count => 1)")
      assert(spark.table(s"$cat.db.t").count() === 99L)
    }
    assert(counting.marks.get > 0, "createMarker never fired")
    assert(counting.links.get > 0, "linkIfAbsent never fired")
    assert(counting.claims.get > 0, "renameClaim never fired")
    assert(counting.replaces.get > 0, "replace never fired")
    assert(counting.appends.get > 0, "appendBounded never fired")
    assert(counting.publishes.get > 0, "publishData never fired")
  }
}
