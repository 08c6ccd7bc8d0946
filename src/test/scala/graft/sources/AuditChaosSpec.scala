package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CONCURRENCY CHAOS (round-17 verdict #6): the lock / sequencer /
  * fingerprint machinery is individually spec'd (AuditSeqSpec,
  * AuditSwapRaceSpec, AuditMaintLockSpec, AuditOccSpec) — this spec
  * drives seeded randomized COMPOSITIONS: concurrent OCC appends racing
  * OPTIMIZE / VACUUM, delta DML between waves, and a live change-feed
  * tail pulling THROUGHOUT, then asserts the global invariants:
  *
  *  - no acknowledged commit is ever lost (final content = the model);
  *  - commit stamps stay table-wide unique across append/DML commits
  *    (the root _SEQ sequencer's contract, observed on the data axes);
  *  - the tail is exactly-once-or-loud: within one uninterrupted
  *    accumulation no event is delivered twice, and any axis shift
  *    (vector fold) restarts it loudly rather than drifting;
  *  - metadata counts agree with the row scan after every wave.
  *
  * Seeds are FIXED so a failure reproduces; add the failing seed here
  * when one is found. */
class AuditChaosSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))
  private val cdfSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField("_change_type", StringType)))

  private def loudRestart(t: Throwable): Boolean = {
    val m = Option(t.getMessage).getOrElse("")
    m.contains("restart the feed") || m.contains("folded") ||
      m.contains("rewritten") ||
      Option(t.getCause).exists(loudRestart)
  }

  private[sources] def runSeed(seed: Int): Unit = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_chaos_${seed}_")
    val cat = graft.SparkSpec.uniqueCat(s"graft_chaos_$seed")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    val path = wh.resolve("db").resolve("t").toString
    val rnd = new scala.util.Random(seed)
    val model = mutable.Set.empty[Long]
    var nextId = 0L
    var nAppends = 0
    var nDeletes = 0

    def append(from: Long, until: Long): Unit =
      spark.range(from, until).selectExpr("id", "id * 3 AS v")
        .repartition(2)
        .write.format(classOf[JsonAuditSink].getName)
        .option("path", path).mode("append").save()

    // ---- the live tail: pulls in a loop on its own thread ----
    val stream = new AuditCdfStream(path, cdfSchema)
    val restarts = new java.util.concurrent.atomic.AtomicInteger(0)
    val dupSeen = new java.util.concurrent.atomic.AtomicReference[String](null)
    @volatile var tailStop = false
    val tailThread = new Thread(() => {
      var from = stream.initialOffset()
      var acc = mutable.Set.empty[(Long, String)]
      while (!tailStop) {
        try {
          val until = stream.latestOffset()
          val parts = stream.planInputPartitions(from, until)
          val factory = stream.createReaderFactory()
          // buffer the pull; merge only on FULL success — a mid-pull
          // failure retries the same offsets (Spark's own micro-batch
          // retry), so partial reads must not count as delivered
          val pull = mutable.ArrayBuffer.empty[(Long, String)]
          parts.foreach { p =>
            val r = factory.createReader(p)
            try while (r.next()) {
              val row = r.get()
              pull += ((row.getLong(0), row.getUTF8String(2).toString))
            } finally r.close()
          }
          pull.foreach { ev =>
            // exactly-once within one uninterrupted accumulation
            if (!acc.add(ev) && dupSeen.get() == null)
              dupSeen.set(s"duplicate event $ev (seed $seed)")
          }
          from = until
        } catch {
          case t: Throwable if loudRestart(t) =>
            // LOUD restart: re-consume from scratch — never drift
            restarts.incrementAndGet()
            from = stream.initialOffset()
            acc = mutable.Set.empty
          case _: Throwable =>
            // the pull raced a maintenance rewrite (e.g. a planned file
            // reclaimed mid-read); the buffered partial pull is
            // discarded and the same offsets retry next iteration
        }
        Thread.sleep(3)
      }
    })
    tailThread.start()

    // ---- chaos waves ----
    val maintErrors = mutable.Buffer.empty[String]
    for (_ <- 1 to 6) {
      val appendThreads = (0 until (1 + rnd.nextInt(3))).map { _ =>
        val from = nextId; nextId += 100
        model ++= (from until from + 100)
        nAppends += 1
        new Thread(() => append(from, from + 100))
      }
      val maintThread: Option[Thread] =
        if (rnd.nextInt(10) < 4) Some(new Thread(() => {
          try {
            if (rnd.nextBoolean())
              spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
                "target_file_count => 2)").collect()
            else
              spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()
          } catch {
            // benign contention: lease held by a racer, or VACUUM with
            // nothing to reclaim yet — the op is REFUSED, never partial
            case t: Throwable => maintErrors += Option(t.getMessage)
              .getOrElse(t.getClass.getName)
          }
        }))
        else None
      val threads = rnd.shuffle(appendThreads ++ maintThread.toSeq)
      threads.foreach(_.start())
      threads.foreach(_.join())
      // delta DML between waves (deterministic model update)
      if (rnd.nextBoolean()) {
        val m = 7 + rnd.nextInt(7)
        val r = rnd.nextInt(m)
        spark.sql(s"DELETE FROM $cat.db.t WHERE id % $m = $r")
        val doomed = model.filter(_ % m == r)
        if (doomed.nonEmpty) nDeletes += 1
        model --= doomed
      }
      // after every wave: scan and metadata count agree with the model
      spark.catalog.refreshTable(s"$cat.db.t")
      assert(spark.table(s"$cat.db.t").count() === model.size.toLong,
        s"row count diverged from the model (seed $seed)")
      val cnt = spark.sql(s"SELECT count(*) FROM $cat.db.t")
      assert(cnt.head.getLong(0) === model.size.toLong,
        s"metadata count diverged (seed $seed)")
    }
    tailStop = true
    tailThread.join()
    val dup = dupSeen.get()
    assert(dup == null, s"$dup")

    // ---- no lost acknowledged commit: content equals the model ----
    val ids = spark.table(s"$cat.db.t").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size === ids.distinct.size, s"duplicated rows (seed $seed)")
    assert(ids.toSet === model.toSet, s"content diverged (seed $seed)")

    // ---- sequencer uniqueness, observed on the data axes ----
    // every append commit stamps its manifest entries with ONE ts;
    // distinct batch-entry stamps == acknowledged append commits, and
    // no DML stamp ever collides with an append stamp
    val entryTs = AuditBase.readManifest(path).flatMap(_.ts)
    assert(entryTs.distinct.size === nAppends,
      s"append stamps not unique per commit (seed $seed): " +
        s"${entryTs.distinct.size} != $nAppends")
    val vecTs = AuditDeletes.entriesWithTs(path).flatMap(_._3)
    assert(vecTs.toSet.intersect(entryTs.toSet).isEmpty,
      s"a DML stamp collided with an append stamp (seed $seed)")

    // ---- final feed replay reconciles with the model ----
    // (a fresh tail over the final state: ids with an insert event and
    // no delete event are exactly the survivors; vector-folded deletes
    // blanked both their insert row and their positional entry)
    val fresh = new AuditCdfStream(path, cdfSchema)
    val parts = fresh.planInputPartitions(
      fresh.initialOffset(), fresh.latestOffset())
    val factory = fresh.createReaderFactory()
    val events = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = mutable.ArrayBuffer.empty[(Long, String)]
      try while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), row.getUTF8String(2).toString))
      } finally r.close()
      buf
    }
    val inserted = events.collect { case (i, "insert") => i }.toSet
    val deleted = events.collect { case (i, "delete") => i }.toSet
    assert((inserted -- deleted) === model.toSet,
      s"feed replay diverged from the model (seed $seed, " +
        s"restarts=${restarts.get()}, maint errors=$maintErrors)")
    info(s"seed $seed: ${model.size} survivors of ${nextId} appended, " +
      s"$nAppends appends, $nDeletes deletes, " +
      s"foldedRows=${AuditDeletes.foldedRows(path)}, " +
      s"base=${AuditBase.read(path).isDefined}, " +
      s"tail restarts=${restarts.get()}, " +
      s"maint refused=${maintErrors.size}")
  }

  /** PARTITIONED twin: catalog INSERT waves racing partitioned
    * OPTIMIZE/VACUUM (per-dir bases), delta DML, and a live PARTITIONED
    * feed tail. Same invariants; stamps additionally prove one shared
    * statement stamp across a partitioned INSERT's directories. */
  private[sources] def runSeedPartitioned(seed: Int, crash: Boolean = false): Unit = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_chaosp_${seed}_")
    val cat = graft.SparkSpec.uniqueCat(s"graft_chaosp_$seed")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, flag BIGINT) " +
      "USING audit PARTITIONED BY (flag)")
    val path = wh.resolve("db").resolve("t").toString
    val levels = Seq(AuditPartition.Level("flag",
      org.apache.spark.sql.types.LongType, None))
    val rnd = new scala.util.Random(seed)
    val model = mutable.Set.empty[Long]
    var nextId = 0L
    var nAppends = 0

    val pcdfSchema = StructType(Seq(
      StructField("id", LongType), StructField("flag", LongType),
      StructField("_change_type", StringType),
      StructField("_file", StringType)))
    val stream = new AuditPartitionedCdfStream(path, pcdfSchema, levels)
    val restarts = new java.util.concurrent.atomic.AtomicInteger(0)
    val dupSeen = new java.util.concurrent.atomic.AtomicReference[String](null)
    @volatile var tailStop = false
    val tailThread = new Thread(() => {
      var from = stream.initialOffset()
      var acc = mutable.Set.empty[(Long, String)]
      while (!tailStop) {
        try {
          val until = stream.latestOffset()
          val parts = stream.planInputPartitions(from, until)
          val factory = stream.createReaderFactory()
          // buffered pull — see the unpartitioned tail
          val pull = mutable.ArrayBuffer.empty[(Long, String)]
          parts.foreach { p =>
            val r = factory.createReader(p)
            try while (r.next()) {
              val row = r.get()
              pull += ((row.getLong(0), row.getUTF8String(2).toString))
            } finally r.close()
          }
          pull.foreach { ev =>
            if (!acc.add(ev) && dupSeen.get() == null)
              dupSeen.set(s"duplicate event $ev (pseed $seed)")
          }
          from = until
        } catch {
          case t: Throwable if loudRestart(t) =>
            restarts.incrementAndGet()
            from = stream.initialOffset()
            acc = mutable.Set.empty
          case _: Throwable => () // raced a rewrite mid-pull; the
            // buffered partial pull is discarded, same offsets retry
        }
        Thread.sleep(3)
      }
    })
    tailThread.start()

    val maintErrors = mutable.Buffer.empty[String]
    for (wave <- 1 to 5) {
      val appendThreads = (0 until (1 + rnd.nextInt(2))).map { _ =>
        val from = nextId; nextId += 90
        model ++= (from until from + 90)
        nAppends += 1
        new Thread(() => spark.sql(
          s"INSERT INTO $cat.db.t SELECT id, id % 3 FROM " +
            s"range($from, ${from + 90})"))
      }
      // random waves RACE a maintenance op against the inserts (a raced
      // compaction may legitimately abort — the swap-race defense)
      val maintThread: Option[Thread] =
        if (rnd.nextInt(10) < 3)
          Some(new Thread(() => {
          try {
            if (rnd.nextBoolean())
              spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
                "target_file_count => 2)").collect()
            else
              spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()
          } catch {
            case t: Throwable => maintErrors += Option(t.getMessage)
              .getOrElse(t.getClass.getName)
          }
        }))
        else None
      val threads = rnd.shuffle(appendThreads ++ maintThread.toSeq)
      threads.foreach(_.start())
      threads.foreach(_.join())
      // waves 3 and 5: compaction / reclamation AFTER the inserts land
      // (no abort-worthy race) but UNDER the live tail — every seed
      // exercises per-dir bases and the fold-stable tail axis; half the
      // time the compaction is PARTITION-FILTERED, leaving mixed per-dir
      // checkpoint boundaries for the rest of the run to stress
      if (wave == 3) {
        val filter =
          if (rnd.nextBoolean()) s", partition_filter => 'flag=${rnd.nextInt(3)}'"
          else ""
        spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
          s"target_file_count => 2$filter)").collect()
      }
      // crash variant, wave 2 (round-19 composition): kill a partitioned
      // OPTIMIZE right after the FIRST dir's `_BASE` swap — the mixed
      // published/unpublished state (one dir base + pending absorb-
      // intent, others untouched) must hold exact counts UNDER THE LIVE
      // TAIL and concurrent waves, and the retried OPTIMIZE must publish
      // and finalize every dir (the directed twin is
      // AuditAbsorbIntentSpec's static-state test)
      if (crash && wave == 2) {
        // modulus coprime with 3 so the delete (and hence the fold
        // summaries the intent rides on) hits EVERY flag dir — a
        // 3-sharing modulus concentrates deletes in one flag and the
        // first-published dir could legitimately carry no intent
        val m = Seq(5, 7, 8, 10, 11)(rnd.nextInt(5))
        val r = rnd.nextInt(m)
        spark.sql(s"DELETE FROM $cat.db.t WHERE id % $m = $r")
        model --= model.filter(_ % m == r)
        spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()
        sys.props("graft.audit.maintFailPoint") = "after-base-swap"
        val msg =
          try { spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
            "target_file_count => 2)").collect(); "no-failure" }
          catch { case t: Throwable => fullMsg(t) }
          finally sys.props.remove("graft.audit.maintFailPoint")
        assert(msg.contains("injected failure"),
          s"partitioned after-swap kill never fired (pseed $seed): $msg")
        val dirs = AuditPartition.listDirsByCols(path, Seq("flag"))
        assert(dirs.count { case (_, d) =>
          AuditDeletes.absorbIntentTs(d.toString).isDefined } >= 1,
          s"after-swap kill left no pending absorb-intent (pseed $seed)")
        spark.catalog.refreshTable(s"$cat.db.t")
        assert(spark.table(s"$cat.db.t").count() === model.size.toLong,
          s"count diverged through the mixed published state (pseed $seed)")
        // retry publishes the remaining dirs and finalizes every intent
        spark.sql(s"CALL $cat.system.optimize(table => 'db.t', " +
          "target_file_count => 2)").collect()
        dirs.foreach { case (rel, d) =>
          assert(AuditBase.read(d.toString).isDefined,
            s"$rel unpublished after the retry (pseed $seed)")
          assert(AuditDeletes.absorbIntentTs(d.toString) === None,
            s"$rel intent not finalized after the retry (pseed $seed)")
        }
      }
      // crash variant, wave 4: kill a VACUUM fold mid-way ACROSS the
      // partition dirs (the failpoint fires in the first dir with
      // foldable vectors; later dirs keep theirs positional — a
      // realistic partial-crash the per-dir recovery must heal), then
      // verify counts through the half-dead state and heal
      if (crash && wave == 4) {
        val m = 5 + rnd.nextInt(5)
        val r = rnd.nextInt(m)
        spark.sql(s"DELETE FROM $cat.db.t WHERE id % $m = $r")
        model --= model.filter(_ % m == r)
        sys.props("graft.audit.maintFailPoint") = "fold-intent"
        val msg =
          try { spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')")
            .collect(); "no-failure" }
          catch { case t: Throwable => fullMsg(t) }
          finally sys.props.remove("graft.audit.maintFailPoint")
        assert(msg.contains("injected failure"),
          s"partitioned fold kill never fired (pseed $seed): $msg")
        val dirsWithIntents = AuditPartition
          .listDirsByCols(path, Seq("flag"))
          .count { case (_, d) => AuditDeletes.intents(d.toString).nonEmpty }
        assert(dirsWithIntents >= 1,
          s"crashed partitioned fold left no intents (pseed $seed)")
        spark.catalog.refreshTable(s"$cat.db.t")
        assert(spark.table(s"$cat.db.t").count() === model.size.toLong,
          s"count diverged through the half-dead state (pseed $seed)")
        spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()
        AuditPartition.listDirsByCols(path, Seq("flag")).foreach {
          case (rel, d) => assert(AuditDeletes.intents(d.toString).isEmpty,
            s"healing VACUUM left intents in $rel (pseed $seed)")
        }
      }
      if (wave == 5)
        try spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()
        catch { case t: Throwable => maintErrors += Option(t.getMessage)
          .getOrElse(t.getClass.getName) }
      if (rnd.nextBoolean()) {
        val m = 7 + rnd.nextInt(7)
        val r = rnd.nextInt(m)
        spark.sql(s"DELETE FROM $cat.db.t WHERE id % $m = $r")
        model --= model.filter(_ % m == r)
      }
      spark.catalog.refreshTable(s"$cat.db.t")
      val waveCount = spark.table(s"$cat.db.t").count()
      if (waveCount != model.size.toLong) {
        val ids = spark.table(s"$cat.db.t").select("id")
          .collect().map(_.getLong(0)).toSet
        val missing = (model.toSet -- ids).toSeq.sorted
        val extra = (ids -- model.toSet).toSeq.sorted
        val dirs = AuditPartition.listDirsByCols(path, Seq("flag"))
          .map { case (rel, d) =>
            val phys = AuditBase.read(d.toString).toSeq
              .flatMap(_.files.map(_._1)).map { f =>
                val lines = java.nio.file.Files.readAllLines(d.resolve(f))
                (f, lines.size, lines.asScala.count(_.nonEmpty))
              }
            s"$rel base=${AuditBase.read(d.toString).map(b =>
              (b.throughEpoch, b.files.map(_._2).sum))} phys=$phys " +
              s"live=${AuditBase.readManifest(d.toString)
                .filterNot(_.folded).map(e => (e.file, e.rows))} " +
              s"dels=${AuditDeletes.count(d.toString)}"
          }.mkString("\n")
        fail(s"row count diverged (pseed $seed): table=$waveCount " +
          s"model=${model.size} missing=${missing.take(60)} " +
          s"extra=${extra.take(60)} maintErrors=$maintErrors\n$dirs")
      }
      // partition-pruned + metadata group count stay exact mid-chaos
      val g = spark.sql(
        s"SELECT flag, count(*) AS n FROM $cat.db.t GROUP BY flag")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(g === model.groupBy(_ % 3).view.mapValues(_.size.toLong).toMap
        .filter(_._2 > 0),
        s"group counts diverged (pseed $seed)")
    }
    tailStop = true
    tailThread.join()
    val dup = dupSeen.get()
    assert(dup == null, s"$dup")

    val ids = spark.table(s"$cat.db.t").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size === ids.distinct.size, s"duplicated rows (pseed $seed)")
    assert(ids.toSet === model.toSet, s"content diverged (pseed $seed)")

    // one statement stamp shared across a partitioned INSERT's dirs:
    // distinct batch stamps across ALL dirs == acknowledged INSERTs
    val allTs = AuditPartition.listDirsByCols(path, Seq("flag"))
      .flatMap { case (_, d) =>
        AuditBase.readManifest(d.toString).flatMap(_.ts) }
    assert(allTs.distinct.size === nAppends,
      s"partitioned statement stamps not shared/unique (pseed $seed): " +
        s"${allTs.distinct.size} != $nAppends")
    info(s"pseed $seed: ${model.size} survivors of $nextId appended, " +
      s"$nAppends inserts, tail restarts=${restarts.get()}, " +
      s"maint refused=${maintErrors.size}, " +
      s"bases=${AuditPartition.listDirsByCols(path, Seq("flag"))
        .count { case (_, d) => AuditBase.read(d.toString).isDefined }}")
  }

  /** CRASH-INJECTING chaos (round-18): the same composition, plus
    * seeded waves that KILL a maintenance op at a real failpoint — a
    * VACUUM fold after its intent write ("fold-intent"), after blanking
    * but before the summary replace ("fold-blanked"), and an OPTIMIZE
    * after the `_BASE` swap but before the absorb finalize
    * ("after-base-swap") — then LET THE RUN CONTINUE. The disk state is
    * the genuine mid-crash one (not a reconstruction); the invariants
    * must hold through it (counts stay exact, the live tail restarts
    * loudly, OPTIMIZE refuses over pending intents), and the healing
    * VACUUM must resolve it exactly. */
  private def fullMsg(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) {
      sb ++= Option(cur.getMessage).getOrElse(cur.getClass.getName)
      sb += ' '
      cur = cur.getCause
    }
    sb.toString
  }

  private[sources] def runSeedCrash(seed: Int): Unit = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_chaosc_${seed}_")
    val cat = graft.SparkSpec.uniqueCat(s"graft_chaosc_$seed")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING audit")
    val path = wh.resolve("db").resolve("t").toString
    val rnd = new scala.util.Random(seed)
    val model = mutable.Set.empty[Long]
    var nextId = 0L

    def append(from: Long, until: Long): Unit =
      spark.range(from, until).selectExpr("id", "id * 3 AS v")
        .repartition(2)
        .write.format(classOf[JsonAuditSink].getName)
        .option("path", path).mode("append").save()

    // live tail throughout, exactly as runSeed: loud-restart-or-exact
    val stream = new AuditCdfStream(path, cdfSchema)
    val restarts = new java.util.concurrent.atomic.AtomicInteger(0)
    val dupSeen = new java.util.concurrent.atomic.AtomicReference[String](null)
    @volatile var tailStop = false
    val tailThread = new Thread(() => {
      var from = stream.initialOffset()
      var acc = mutable.Set.empty[(Long, String)]
      while (!tailStop) {
        try {
          val until = stream.latestOffset()
          val parts = stream.planInputPartitions(from, until)
          val factory = stream.createReaderFactory()
          val pull = mutable.ArrayBuffer.empty[(Long, String)]
          parts.foreach { p =>
            val r = factory.createReader(p)
            try while (r.next()) {
              val row = r.get()
              pull += ((row.getLong(0), row.getUTF8String(2).toString))
            } finally r.close()
          }
          pull.foreach { ev =>
            if (!acc.add(ev) && dupSeen.get() == null)
              dupSeen.set(s"duplicate event $ev (cseed $seed)")
          }
          from = until
        } catch {
          case t: Throwable if loudRestart(t) =>
            restarts.incrementAndGet()
            from = stream.initialOffset()
            acc = mutable.Set.empty
          case _: Throwable => ()
        }
        Thread.sleep(3)
      }
    })
    tailThread.start()

    def crashedCall(sql: String, point: String): String = {
      sys.props("graft.audit.maintFailPoint") = point
      try { spark.sql(sql).collect(); "no-failure" }
      catch { case t: Throwable => fullMsg(t) }
      finally sys.props.remove("graft.audit.maintFailPoint")
    }
    def deleteSome(): Unit = {
      val m = 7 + rnd.nextInt(7)
      val r = rnd.nextInt(m)
      spark.sql(s"DELETE FROM $cat.db.t WHERE id % $m = $r")
      model --= model.filter(_ % m == r)
    }
    def heal(): Unit =
      spark.sql(s"CALL $cat.system.vacuum(table => 'db.t')").collect()

    var injected = 0
    for (wave <- 1 to 8) {
      val appendThreads = (0 until (1 + rnd.nextInt(2))).map { _ =>
        val from = nextId; nextId += 100
        model ++= (from until from + 100)
        new Thread(() => append(from, from + 100))
      }
      appendThreads.foreach(_.start())
      appendThreads.foreach(_.join())
      wave match {
        case 3 | 6 =>
          // CRASH WAVES — synchronous, so the kill point is
          // deterministic; wave 6 kills a fold, wave 3 kills the swap,
          // so every seed exercises BOTH crash kinds
          if (wave == 6) {
            // kill a VACUUM fold: fresh vectors guarantee the fold runs
            deleteSome()
            val point = if (rnd.nextBoolean()) "fold-intent" else "fold-blanked"
            val msg = crashedCall(
              s"CALL $cat.system.vacuum(table => 'db.t')", point)
            assert(msg.contains("injected failure"),
              s"fold kill never fired (cseed $seed, wave $wave): $msg")
            injected += 1
            assert(AuditDeletes.intents(path).nonEmpty,
              s"crashed fold left no intent (cseed $seed)")
            // the half-dead state refuses compaction LOUDLY
            val ref = crashedCall(s"CALL $cat.system.optimize(" +
              s"table => 'db.t', target_file_count => 2)", "none")
            assert(ref.contains("pending fold intent"),
              s"OPTIMIZE over a crashed fold did not refuse " +
                s"(cseed $seed): $ref")
          } else {
            // kill an OPTIMIZE after the _BASE swap: fold summaries
            // first (delete + clean vacuum), so the absorb window is
            // the live one the crash lands in
            deleteSome()
            heal()
            val msg = crashedCall(s"CALL $cat.system.optimize(" +
              s"table => 'db.t', target_file_count => 2)", "after-base-swap")
            assert(msg.contains("injected failure"),
              s"swap kill never fired (cseed $seed): $msg")
            injected += 1
            // the base IS published; the absorb-intent must be carrying
            // the absorption until something finalizes it
            assert(AuditDeletes.absorbIntentTs(path).isDefined,
              s"no absorb-intent after the swap kill (cseed $seed)")
          }
        case 4 | 7 =>
          // wave after a crash: HEAL under the live tail, then the
          // healed state must be exact
          heal()
          assert(AuditDeletes.intents(path).isEmpty,
            s"healing VACUUM left intents (cseed $seed)")
        case _ =>
          if (rnd.nextBoolean()) deleteSome()
      }
      spark.catalog.refreshTable(s"$cat.db.t")
      assert(spark.table(s"$cat.db.t").count() === model.size.toLong,
        s"row count diverged from the model (cseed $seed, wave $wave)")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head.getLong(0)
        === model.size.toLong,
        s"metadata count diverged (cseed $seed, wave $wave)")
    }
    assert(injected === 2, s"expected both crash waves to fire (cseed $seed)")
    tailStop = true
    tailThread.join()
    assert(dupSeen.get() == null, s"${dupSeen.get()}")

    // final state exact + a fresh feed replay reconciles
    val ids = spark.table(s"$cat.db.t").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size === ids.distinct.size, s"duplicated rows (cseed $seed)")
    assert(ids.toSet === model.toSet, s"content diverged (cseed $seed)")
    val fresh = new AuditCdfStream(path, cdfSchema)
    val parts = fresh.planInputPartitions(
      fresh.initialOffset(), fresh.latestOffset())
    val factory = fresh.createReaderFactory()
    val events = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = mutable.ArrayBuffer.empty[(Long, String)]
      try while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), row.getUTF8String(2).toString))
      } finally r.close()
      buf
    }
    val inserted = events.collect { case (i, "insert") => i }.toSet
    val deleted = events.collect { case (i, "delete") => i }.toSet
    assert((inserted -- deleted) === model.toSet,
      s"feed replay diverged after crash-and-heal (cseed $seed)")
    info(s"cseed $seed: ${model.size} survivors of $nextId appended, " +
      s"2 injected crashes healed, tail restarts=${restarts.get()}, " +
      s"foldedRows=${AuditDeletes.foldedRows(path)}")
  }

  /** Counting decorator over the POSIX primitives — identical behavior,
    * proves the chaos composition runs THROUGH the CommitPrimitives
    * seam (the object-store port surface inherits this suite's coverage
    * by swapping one value). */
  private final class CountingIo(under: CommitPrimitives)
      extends CommitPrimitives {
    val calls = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()
    private def tick(k: String): Unit =
      calls.computeIfAbsent(k, _ =>
        new java.util.concurrent.atomic.AtomicInteger(0)).incrementAndGet()
    override def createMarker(t: java.nio.file.Path): Unit = {
      tick("marker"); under.createMarker(t)
    }
    override def linkIfAbsent(t: java.nio.file.Path,
        s: java.nio.file.Path): Unit = {
      tick("link"); under.linkIfAbsent(t, s)
    }
    override def renameClaim(s: java.nio.file.Path,
        t: java.nio.file.Path): Unit = {
      tick("claim"); under.renameClaim(s, t)
    }
    override def replace(t: java.nio.file.Path, c: Array[Byte]): Unit = {
      tick("replace"); under.replace(t, c)
    }
    override def appendBounded(t: java.nio.file.Path,
        c: Array[Byte]): Unit = {
      tick("append"); under.appendBounded(t, c)
    }
    override def publishData(s: java.nio.file.Path,
        t: java.nio.file.Path, r: Boolean): Unit = {
      tick("publish"); under.publishData(s, t, r)
    }
  }

  // fixed seeds: reproducible; pin any future failing seed here
  // (seed 11 additionally runs through an instrumented CommitPrimitives
  // impl and asserts all six shapes fired under the composition)
  Seq(11, 29, 47, 83).foreach { seed =>
    test(s"chaos seed $seed: concurrent appends + maintenance + live " +
      "tail preserve every invariant") {
      if (seed == 11) {
        val counting = new CountingIo(PosixCommitPrimitives)
        CommitPrimitives.withImpl(counting)(runSeed(seed))
        Seq("marker", "link", "claim", "replace", "append",
          "publish").foreach { k =>
          assert(counting.calls.containsKey(k) &&
            counting.calls.get(k).get > 0,
            s"primitive '$k' never fired through the seam under chaos")
        }
        info(s"seam counts: " + counting.calls.asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=${v.get}" }.mkString(", "))
      } else runSeed(seed)
    }
  }
  Seq(7, 61).foreach { seed =>
    test(s"partitioned chaos seed $seed: concurrent INSERTs + per-dir " +
      "bases + live partitioned tail preserve every invariant") {
      runSeedPartitioned(seed)
    }
  }
  Seq(19, 73).foreach { seed =>
    test(s"crash chaos seed $seed: maintenance killed mid-fold and " +
      "mid-swap heals exactly under appends, DML and a live tail") {
      runSeedCrash(seed)
    }
  }
  test("partitioned crash chaos seed 37: a VACUUM fold killed mid-way " +
    "across dirs heals per-dir under INSERTs and a live tail") {
    runSeedPartitioned(37, crash = true)
  }
}
