package graft.sources

import java.nio.file.Path

/** OBJECT-STORE-SEMANTICS implementation of [[CommitPrimitives]] — the
  * executable form of SCALING.md's S3/GCS mapping, backed by the local
  * filesystem as the data plane but using ONLY operations an object
  * store offers:
  *
  *   - no cross-key atomic rename: [[renameClaim]] is copy-if-absent to
  *     the target (`PUT If-None-Match: *`) followed by a
  *     generation-guarded delete of the source — the CREATE is the
  *     commit point, and a crash between the two leaves BOTH keys
  *     (injectable via [[skipNextClaimDelete]]) which every consumer
  *     must treat as inert debris;
  *   - no hard links: [[linkIfAbsent]] copies the staged bytes under
  *     `If-None-Match: *`;
  *   - [[replace]] is a generation-guarded `PUT` (`If-Match` /
  *     `ifGenerationMatch`): the guard is read at entry, so a raced
  *     writer — which the contract forbids — trips a LOUD precondition
  *     failure instead of silently interleaving;
  *   - [[appendBounded]] is the ETag read-modify-write loop, retried on
  *     precondition failure ([[forceAppendPreconditionFailures]] makes
  *     the retry path run deterministically in tests);
  *   - [[publishData]] is a plain `PUT` at the final key (object stores
  *     have no server-side move — "staging" is the unreferenced final
  *     key until the metadata swap references it);
  *   - deletes can LAG ([[lagDeleteMs]]): a claimed source key stays
  *     visible to listings for a bounded window, emulating the
  *     stale-listing behavior the format's retry paths must tolerate.
  *
  * Semantic divergence from POSIX, by design (the honest contract —
  * see the trait Scaladoc): two claimants of the SAME source racing to
  * DIFFERENT targets can BOTH win (each target's `If-None-Match`
  * create is exclusive, so issued values stay unique); the losing
  * delete is a benign no-op. POSIX rename admits exactly one winner
  * per source. Every call site tolerates both behaviors — `_SEQ`
  * claims produce strictly-increasing unique stamps either way, and
  * the superseded value is debris that `maxIssued = max()` ignores.
  *
  * Generations (ETags) live in an in-process map keyed by normalized
  * path; the bytes live on the real filesystem so the rest of the
  * engine reads them unmodified. Per-key mutations serialize on a
  * per-key monitor — the stand-in for the store's per-key linearizable
  * metadata. Engine code that mutates files OUTSIDE the seam (staging
  * writes, raw deletes of debris) is re-synced lazily: a vanished file
  * resets its generation, an unseen file baselines at 1.
  */
private[sources] final class ObjectStoreCommitPrimitives(
    val lagDeleteMs: Long = 0L) extends CommitPrimitives {

  import java.nio.file.{Files, FileAlreadyExistsException, NoSuchFileException}

  /** Injected crash window: when > 0, that many subsequent renameClaim
    * calls commit the claim (the target create) but never delete the
    * source — the crash-between-copy-and-delete state. */
  val skipNextClaimDelete = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Injected contention: the next N appendBounded conditional PUTs
    * fail their precondition artificially, forcing the RMW retry. */
  val forceAppendPreconditionFailures =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Observability for specs: claims that committed without deleting
    * their source (crash injections that fired). */
  val claimCrashWindows = new java.util.concurrent.atomic.AtomicInteger(0)

  private val gens =
    new java.util.concurrent.ConcurrentHashMap[Path, java.lang.Long]()
  /** Keys CONSUMED as a claim source (deleted by [[renameClaim]]).
    * A claim TARGET may never be one of these: the `_SEQ` pointer
    * chain deletes each issued value when the next claim consumes it,
    * and a weakly-consistent local `readdir` can transiently miss the
    * whole live chain while still showing an older multi-winner stray —
    * `maxIssued` then REGRESSES and the next claim would re-create (=
    * RE-ISSUE) a consumed value. A strongly-consistent object-store
    * listing cannot regress past a completed create (the create
    * precedes the delete), so this set is the stand-in for that
    * consistency at the one boundary where it is load-bearing. Keys
    * re-created by any non-claim PUT (e.g. a released lock re-acquired
    * at the same key) are un-tombstoned — only claim-target creation
    * checks the set. */
  private val claimConsumed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[Path, Object]()
  private lazy val reaper = {
    val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      r => { val th = new Thread(r, "objstore-lagged-delete");
        th.setDaemon(true); th })
    t
  }

  private def norm(p: Path): Path = p.toAbsolutePath.normalize
  private def lockFor(p: Path): Object =
    keyLocks.computeIfAbsent(norm(p), _ => new Object)

  /** Current generation under the key's lock, re-synced to the data
    * plane: 0 = absent, >=1 = present. */
  private def currentGen(key: Path): Long = {
    val k = norm(key)
    val onDisk = Files.exists(k)
    val g = gens.get(k)
    if (!onDisk) { if (g != null) gens.remove(k); 0L }
    else if (g == null) { gens.put(k, 1L); 1L }
    else g.longValue()
  }

  /** Atomic per-key PUT of `bytes` (readers through the data plane see
    * old or new, never torn), bumping the generation. Caller holds the
    * key lock. */
  private def putNow(key: Path, bytes: Array[Byte]): Unit = {
    val k = norm(key)
    val tmp = k.resolveSibling(k.getFileName.toString +
      ".tmp-" + java.util.UUID.randomUUID.toString.take(8))
    Files.write(tmp, bytes)
    Files.move(tmp, k, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    gens.merge(k, 1L, (a, _) => a + 1L)
    claimConsumed.remove(k) // the key legitimately exists again
  }

  /** `PUT If-None-Match: *`. */
  private def putIfAbsent(key: Path, bytes: Array[Byte]): Unit =
    lockFor(key).synchronized {
      if (currentGen(key) != 0L)
        throw new FileAlreadyExistsException(key.toString)
      putNow(key, bytes)
    }

  /** `DELETE If-Match: <gen>` — false on precondition failure or
    * already-gone. */
  private def deleteIfGen(key: Path, gen: Long): Boolean =
    lockFor(key).synchronized {
      if (currentGen(key) != gen || gen == 0L) false
      else {
        Files.delete(norm(key)); gens.remove(norm(key))
        claimConsumed.add(norm(key))
        true
      }
    }

  override def createMarker(target: Path): Unit =
    putIfAbsent(target, Array.emptyByteArray)

  override def linkIfAbsent(target: Path, source: Path): Unit = {
    // read the staged bytes first: a vanished source is the caller's
    // lost race signal exactly as the POSIX hard link reports it
    val bytes =
      try Files.readAllBytes(source)
      catch { case e: NoSuchFileException => throw e }
    putIfAbsent(target, bytes)
  }

  override def renameClaim(source: Path, target: Path): Unit = {
    // 1. read source bytes + generation (the ETag the delete is
    //    guarded by); absent source = a racer already claimed it
    val (bytes, srcGen) = lockFor(source).synchronized {
      val g = currentGen(source)
      if (g == 0L) throw new NoSuchFileException(source.toString)
      (Files.readAllBytes(norm(source)), g)
    }
    // 2. the COMMIT POINT: exclusive create of the target. A target
    //    already consumed by an earlier claim is refused even though
    //    its file is gone — see [[claimConsumed]] (re-creating it
    //    would RE-ISSUE a spent `_SEQ` value after a listing
    //    regression; the caller's retry re-lists and converges on the
    //    true frontier)
    lockFor(target).synchronized {
      if (claimConsumed.contains(norm(target)))
        throw new FileAlreadyExistsException(target.toString)
      if (currentGen(target) != 0L)
        throw new FileAlreadyExistsException(target.toString)
      putNow(target, bytes)
    }
    // 3. guarded delete of the source — skippable (crash window) and
    //    laggable (stale listings); a failed precondition means a racer
    //    claimed the same source to another target, benign either way
    if (skipNextClaimDelete.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      claimCrashWindows.incrementAndGet()
    } else if (lagDeleteMs > 0L) {
      reaper.schedule(new Runnable {
        override def run(): Unit = deleteIfGen(source, srcGen)
      }, lagDeleteMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    } else {
      deleteIfGen(source, srcGen)
    }
  }

  override def replace(target: Path, content: Array[Byte]): Unit = {
    // generation-guarded PUT: single-writer by the caller's contract
    // (lease / table commit), so a precondition failure is a loud
    // contract violation, never a retry
    val expected = lockFor(target).synchronized(currentGen(target))
    lockFor(target).synchronized {
      val cur = currentGen(target)
      if (cur != expected)
        throw new IllegalStateException(
          s"object-store replace precondition failed at $target: " +
            s"generation $expected read at entry, $cur at PUT — a " +
            "concurrent writer violated the single-writer contract")
      putNow(target, content)
    }
  }

  override def appendBounded(target: Path, content: Array[Byte]): Unit = {
    // ETag read-modify-write, retried on precondition failure
    var attempts = 0
    while (attempts < 1000) {
      attempts += 1
      val (prior, gen) = lockFor(target).synchronized {
        val g = currentGen(target)
        (if (g == 0L) Array.emptyByteArray
         else Files.readAllBytes(norm(target)), g)
      }
      val merged = prior ++ content
      val ok = lockFor(target).synchronized {
        val forced = forceAppendPreconditionFailures
          .getAndUpdate(n => math.max(0, n - 1)) > 0
        if (forced || currentGen(target) != gen) false
        else { putNow(target, merged); true }
      }
      if (ok) return
    }
    throw new IllegalStateException(
      s"object-store appendBounded: 1000 precondition failures at $target")
  }

  override def publishData(source: Path, target: Path,
      replaceExisting: Boolean): Unit = {
    // plain PUT at the final key; the local staged copy is then
    // removed (on a real store there is no separate staged key)
    val bytes = Files.readAllBytes(source)
    lockFor(target).synchronized {
      if (!replaceExisting && currentGen(target) != 0L)
        throw new FileAlreadyExistsException(target.toString)
      putNow(target, bytes)
    }
    Files.deleteIfExists(source)
  }
}
