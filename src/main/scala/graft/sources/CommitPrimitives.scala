package graft.sources

import java.nio.file.Path

/** THE FIVE SINGLE-WINNER COMMIT PRIMITIVES the audit table format is
  * built on, plus the one non-commit data shape ([[publishData]]).
  * Every metadata mutation in the format funnels through one of the
  * five, and each needs exactly ONE guarantee — a single-winner
  * compare-and-swap on ONE key. This trait is the compile-time port
  * surface for the object-store mapping documented in SCALING.md
  * ("Round-17: the object-store mapping for the commit primitives"):
  * [[PosixCommitPrimitives]] is the local-filesystem implementation
  * (today's behavior, byte-for-byte),
  * [[graft.sources.ObjectStoreCommitPrimitives]] is an in-memory
  * implementation of the S3/GCS conditional-PUT forms stated there —
  * no primitive needs a cross-key atomic rename, a directory
  * transaction, or a server-side lock service.
  *
  * Error contract (what the format's race-resolution logic keys on —
  * an object-store impl must translate its precondition failures to
  * exactly these):
  *   - [[createMarker]]/[[linkIfAbsent]] throw
  *     [[java.nio.file.FileAlreadyExistsException]] iff the target
  *     exists: the loser's signal in every put-if-absent race.
  *   - [[renameClaim]] throws [[java.nio.file.NoSuchFileException]]
  *     when the source is gone (a racer claimed it first) — the ONE
  *     portable lost-race signal. What happens when the TARGET already
  *     exists is implementation-specific: POSIX rename(2) silently
  *     replaces it, while the object-store form (create-if-absent +
  *     guarded delete) throws `FileAlreadyExistsException`. Call
  *     sites therefore must not rely on target-exists detection —
  *     every one uses a fresh unique target (uuid tombstones,
  *     strictly-increasing `_SEQ` stamps) and catches BOTH exceptions
  *     as "lost the race".
  *   - [[replace]] and [[appendBounded]] do not race by contract —
  *     their callers hold the maintenance lease or the table commit —
  *     so any exception is a genuine I/O failure, not a lost race.
  */
private[sources] trait CommitPrimitives {

  /** PUT-IF-ABSENT of an EMPTY marker key — exactly one creator wins.
    * Call sites: `_SEQ` birth pointer + INIT marker (AuditSeq).
    * S3: `PUT If-None-Match: *`; GCS: `insert ifGenerationMatch=0`. */
  def createMarker(target: Path): Unit

  /** PUT-IF-ABSENT of content already staged at `source` — exactly one
    * publisher wins; the staged file stays (callers delete it). Call
    * sites: OCC `_TXN/<v>.json` commit links, stream-writer lock birth,
    * maintenance-lease claim, the lease steal's displaced-claim restore.
    * POSIX: hard link. S3: `PUT If-None-Match: *` of the staged bytes;
    * GCS: `insert ifGenerationMatch=0`. */
  def linkIfAbsent(target: Path, source: Path): Unit

  /** Single-key RENAME CAS: atomically claim `source` by moving it to
    * `target` — one claimant per source name; a lost race is observable
    * as the source gone. Call sites: `_SEQ` pointer claim
    * (AuditSeq.next), the maintenance lease's expired-claim retirement.
    * S3: copy-to-target `If-None-Match: *` then conditional delete of
    * the source guarded by its ETag — the create is the commit point; a
    * crash between the two leaves both keys and every consumer already
    * treats the stale one as inert debris (see SCALING.md). GCS:
    * `rewrite ifGenerationMatch=0` + `delete ifGenerationMatch`. */
  def renameClaim(source: Path, target: Path): Unit

  /** Atomic WHOLE-FILE REPLACE: readers see the old or the new content,
    * never a torn mix; single-writer comes from the caller's lease. Call
    * sites: every `_MANIFEST`/`_EPOCHS`/`_DELETES`/`_BASE`/`_STATS`
    * rewrite, lease renewals. S3: plain `PUT` is per-key atomic
    * (`If-Match: <etag>` upgrades to a true CAS); GCS: `PUT
    * ifGenerationMatch=<read generation>`. */
  def replace(target: Path, content: Array[Byte]): Unit

  /** BOUNDED APPEND (create if absent): serialized behind the DML
    * commit path by contract, and the object stays small — bounded by
    * FILE count (`_STATS`) or rewritten wholesale by VACUUM
    * (`_DELETES`). Call sites: AuditDeletes.append, AuditStats.append.
    * S3/GCS: read-modify-write guarded by ETag/generation, retried on
    * precondition failure. */
  def appendBounded(target: Path, content: Array[Byte]): Unit

  /** DATA-OBJECT PUBLISH — the sixth shape, and the only one that is
    * NOT a commit point: move a fully-written, never-again-mutated data
    * object from its staging name to its final name. Visibility comes
    * from the SUBSEQUENT metadata swap (`_TXN` link / `_MANIFEST` or
    * `_BASE` replace); a crash after publish leaves an unreferenced
    * object that VACUUM(clean_orphans) reclaims, so this needs no
    * atomicity ACROSS keys and no conditional semantics. Call sites:
    * every staged-batch publish (OCC append, overwrite, base write,
    * partitioned twins) and the fold/DELETE kept-line rewrites.
    * `replaceExisting` = true only on the re-publish paths — streaming
    * epoch replay (final names are epoch-deterministic; the epoch's
    * single owner may retry after a crash) and the lease-held fold
    * rewrite of an existing data file (single-writer under the
    * maintenance lease, readers see old or new whole file).
    * S3/GCS: there is no server-side move — the writer PUTs the bytes
    * directly at the final key ("staging" IS the unreferenced final
    * key until the metadata swap references it); per-key PUT is atomic,
    * which covers the `replaceExisting` rewrite case too. */
  def publishData(source: Path, target: Path,
      replaceExisting: Boolean = false): Unit
}

/** Local-filesystem implementation — the exact POSIX mechanisms the
  * format has always used, factored behind the seam. The race/chaos
  * suites (AuditSeqSpec's 400 concurrent claimants, AuditMaintLockSpec,
  * AuditOccSpec, AuditChaosSpec) all drive their scenarios through
  * these methods via [[CommitPrimitives.io]]. */
private[sources] object PosixCommitPrimitives extends CommitPrimitives {

  override def createMarker(target: Path): Unit =
    java.nio.file.Files.createFile(target)

  override def linkIfAbsent(target: Path, source: Path): Unit =
    java.nio.file.Files.createLink(target, source)

  override def renameClaim(source: Path, target: Path): Unit =
    java.nio.file.Files.move(source, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)

  override def replace(target: Path, content: Array[Byte]): Unit = {
    // commit-unique tmp name: replace() callers are single-writer per
    // key by contract, but DISTINCT keys in one dir may be rewritten
    // concurrently (e.g. a lease renewal racing a manifest rewrite) —
    // the random suffix keeps their staging from colliding. Crash debris
    // is swept by VACUUM(clean_orphans) with the other ".tmp-" patterns.
    val tmp = target.resolveSibling(target.getFileName.toString +
      ".tmp-" + java.util.UUID.randomUUID.toString.take(8))
    java.nio.file.Files.write(tmp, content)
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def appendBounded(target: Path, content: Array[Byte]): Unit =
    java.nio.file.Files.write(target, content,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  override def publishData(source: Path, target: Path,
      replaceExisting: Boolean): Unit =
    if (replaceExisting)
      java.nio.file.Files.move(source, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else
      java.nio.file.Files.move(source, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
}

private[sources] object CommitPrimitives {
  /** The active implementation — swap for an instrumented or
    * object-store impl; all call sites dispatch through here. */
  @volatile var io: CommitPrimitives = PosixCommitPrimitives

  /** Run `body` with `impl` installed (test helper — the contract spec
    * and the instrumented chaos pass use it). NOT safe under concurrent
    * suites that race the swap; the specs that use it run scenarios
    * whose tables no other suite touches. */
  def withImpl[T](impl: CommitPrimitives)(body: => T): T = {
    val prev = io
    io = impl
    try body finally io = prev
  }
}
