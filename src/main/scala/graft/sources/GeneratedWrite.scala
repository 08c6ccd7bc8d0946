package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BindReferences, Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, StructType}

/** Engine-side GENERATED / IDENTITY column materialization. Spark 4.1's
  * DSv2 surface parses `GENERATED ALWAYS AS (expr)` / `... AS IDENTITY`
  * and validates the expressions at CREATE time, but leaves computing
  * the values entirely to the connector (the Delta model). This module
  * is that connector half for the audit format:
  *
  *  - at write-BUILD time (driver) the generation expressions are
  *    parsed, analyzed against the table schema, cast to the column
  *    type, and BOUND positionally — the bound catalyst expressions ship
  *    to the tasks and evaluate per row (no per-row SQL, no UDF);
  *  - a GENERATED column is recomputed for every row; an EXPLICIT
  *    non-null value must agree with the expression or the write fails
  *    loudly (GENERATED ALWAYS semantics — never silently diverge);
  *  - an IDENTITY column assigns `start + step * k` with k unique
  *    table-wide: each commit RESERVES a block of 2^33 k-values from the
  *    `_IDENTITY` high-water-mark file (a short critical section under
  *    the maintenance lease — the reservation serializes, the writes
  *    stay concurrent), and within a commit task `pid` uses
  *    k = base + pid·2^20 + rowIndex. Crashed commits waste their block,
  *    exactly like every transactional identity allocator; values are
  *    unique and step-aligned, not dense.
  */
private[sources] object GeneratedWrite {

  /** One bound generated column: write-schema index + bound expression
    * (evaluates against the incoming row) in the column's type. */
  final case class Gen(idx: Int, expr: Expression)
  /** One identity column: write-schema index + spec. */
  final case class Id(idx: Int, start: Long, step: Long,
      allowExplicit: Boolean)

  final case class Specs(gens: Seq[Gen], ids: Seq[Id],
      fieldTypes: Array[DataType]) extends Serializable {
    def isEmpty: Boolean = gens.isEmpty && ids.isEmpty
  }

  /** Per-commit reserved k-block size (2^33) and per-task row capacity
    * (2^20 rows across up to 2^13 tasks). A 100 TB deployment would size
    * these up; the allocation SHAPE — reserve once per commit, assign
    * coordination-free within it — is the part that scales. A task that
    * outruns its slice (huge coalesced inputs) reserves a whole fresh
    * block via [[Reserver]] instead of failing.
    * TaskRows overridable via -Dgraft.audit.identityTaskRows for tests. */
  val Block: Long = 1L << 33
  def TaskRows: Long = sys.props.get("graft.audit.identityTaskRows")
    .map(_.toLong).getOrElse(1L << 20)

  /** Does the (current-named) table schema declare generated or identity
    * columns? */
  def hasAny(schema: StructType): Boolean =
    GeneratedColumn.hasGeneratedColumns(schema) ||
      IdentityColumn.hasIdentityColumns(schema)

  /** Driver-side: resolve + bind the table's generation expressions.
    * `schema` is the CURRENT-named table schema in field order — the
    * incoming rows (storage-named twin) share that order, so positional
    * binding is exact across renames. */
  def specsOf(spark: SparkSession, schema: StructType): Specs = {
    val attrs: Seq[Attribute] =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
        StructType(schema.fields.map(_.copy(metadata =
          org.apache.spark.sql.types.Metadata.empty))))
    val gens = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      GeneratedColumn.getGenerationExpression(f).map { sql =>
        val parsed = spark.sessionState.sqlParser.parseExpression(sql)
        val project = Project(Seq(Alias(parsed, f.name)()),
          LocalRelation(attrs))
        val analyzed = spark.sessionState.analyzer.executeAndCheck(
          project, new org.apache.spark.sql.catalyst.QueryPlanningTracker)
        val resolved = analyzed.asInstanceOf[Project]
          .projectList.head.asInstanceOf[Alias].child
        val typed =
          if (resolved.dataType == f.dataType) resolved
          else Cast(resolved, f.dataType)
        Gen(i, BindReferences.bindReference(typed, attrs))
      }
    }.toSeq
    val ids = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      IdentityColumn.getIdentityInfo(f).map(s =>
        Id(i, s.getStart, s.getStep, s.isAllowExplicitInsert))
    }.toSeq
    Specs(gens, ids, schema.fields.map(_.dataType))
  }

  // --- identity high-water mark (k-counter) ------------------------------

  private def hwmFile(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path).resolve("_IDENTITY")

  private def readHwm(path: String): Long = {
    val f = hwmFile(path)
    if (!java.nio.file.Files.exists(f)) 0L
    else new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim.toLong
  }

  /** Reserve one commit's k-block; returns its base. Serialized by the
    * maintenance lease (short critical section — only the reservation,
    * never the write itself). */
  def reserveBlock(path: String): Long =
    AuditMaintLock.withLease(path, "identity-alloc") {
      val base = readHwm(path)
      CommitPrimitives.io.replace(hwmFile(path),
        (base + Block).toString.getBytes("UTF-8"))
      base
    }

  /** Task-side escape hatch for the per-task identity row cap: when a
    * task exhausts its 2^20 sub-range of the commit block, it reserves a
    * WHOLE fresh block (2^33 k-values) for itself from the `_IDENTITY`
    * high-water mark — the same put-if-newer file op the driver's
    * per-commit reservation uses, so uniqueness holds across any mix of
    * driver- and task-side reservations. Ships only the path string. */
  final case class Reserver(path: String) extends Serializable {
    def reserve(): Long = reserveBlock(path)
  }

  /** Raise the high-water mark so the next allocated k is at least
    * `minNextK` (never lowers it). `CALL system.sync_identity`: a
    * GENERATED BY DEFAULT table that took explicit values above the
    * allocator's horizon would otherwise hand out those same values
    * later — the classic identity-collision drift every warehouse
    * solves with a sync procedure. */
  def syncHwm(path: String, minNextK: Long): Long =
    AuditMaintLock.withLease(path, "identity-sync") {
      val cur = readHwm(path)
      val next = math.max(cur, minNextK)
      if (next != cur)
        CommitPrimitives.io.replace(hwmFile(path),
          next.toString.getBytes("UTF-8"))
      next
    }

  /** Per-task row transform: recompute generated columns (validating
    * explicit values), assign identity values from the task's k-range.
    *
    * `validateExplicit = false` on the delta-DML path: an UPDATE row
    * arrives carrying the generated column's STALE pre-update value
    * (non-null and legitimately != the recomputed one), so the
    * GENERATED-ALWAYS divergence check would reject every UPDATE that
    * changes a referenced column. The delta path always recomputes —
    * the user cannot assign a GENERATED ALWAYS column through DML, so
    * there is no explicit value to validate. */
  final class Filler(specs: Specs, idBase: Long, partitionId: Int,
      validateExplicit: Boolean = true, reserver: Reserver = null,
      lazyAlloc: Boolean = false)
      extends Serializable {
    private var localIdx = 0L
    // absolute k-base and capacity of the task's CURRENT range: starts
    // as the 2^20 slice of the commit block, grows by whole fresh blocks
    // when a huge (coalesced) task outruns it. `lazyAlloc` (streaming)
    // starts EMPTY — the task reserves its own whole block on its first
    // identity row, so empty tasks reserve nothing and no driver-side
    // per-epoch coordination is needed.
    private var kBase =
      if (lazyAlloc) 0L else idBase + partitionId.toLong * TaskRows
    private var kCap = if (lazyAlloc) 0L else TaskRows
    require(specs.ids.isEmpty || lazyAlloc ||
      partitionId < (Block / TaskRows),
      s"audit identity: task $partitionId exceeds the per-commit task " +
        s"capacity ${Block / TaskRows}")

    def apply(row: InternalRow): InternalRow = apply(row, validateExplicit)

    /** `validate` overrides the constructor default per row: the delta
      * path validates INSERT rows (a MERGE-inserted explicit value obeys
      * GENERATED ALWAYS rules) but not UPDATE rows (which legitimately
      * carry stale generated values and scan-carried identity values). */
    def apply(row: InternalRow, validate: Boolean): InternalRow = {
      val n = specs.fieldTypes.length
      val vals = new Array[Any](n)
      var i = 0
      while (i < n) {
        vals(i) = if (row.isNullAt(i)) null else row.get(i, specs.fieldTypes(i))
        i += 1
      }
      specs.gens.foreach { g =>
        val computed = g.expr.eval(row)
        val arrived = vals(g.idx)
        if (validate && arrived != null && arrived != computed)
          throw new IllegalArgumentException(
            s"audit generated column: explicit value $arrived does not " +
              s"match the generation expression's $computed — GENERATED " +
              "ALWAYS columns cannot diverge from their expression")
        vals(g.idx) = computed
      }
      specs.ids.foreach { id =>
        val arrived = vals(id.idx)
        if (arrived != null) {
          // delta-UPDATE rows (validate = false): a non-null identity is
          // the row's EXISTING value carried through the UPDATE/MERGE
          // scan — keep it. Insert rows: explicit values need BY DEFAULT.
          if (validate && !id.allowExplicit)
            throw new IllegalArgumentException(
              "audit identity column: explicit INSERT is not allowed " +
                "(GENERATED ALWAYS AS IDENTITY) — omit the column")
        } else {
          if (localIdx >= kCap) {
            require(reserver != null,
              s"audit identity: task $partitionId exceeded its per-commit " +
                s"row capacity $kCap and no re-reservation path is wired")
            kBase = reserver.reserve()
            kCap = Block
            localIdx = 0L
          }
          val k = kBase + localIdx
          vals(id.idx) = id.start + id.step * k
        }
      }
      if (specs.ids.nonEmpty) localIdx += 1
      new GenericInternalRow(vals)
    }
  }

  /** Wrap a batch write so every task's rows pass through a [[Filler]]
    * before the underlying (routing) writer sees them. */
  final class FillingBatchWrite(delegate: BatchWrite, specs: Specs,
      idBase: Long, reserver: Reserver = null) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : DataWriterFactory = {
      val f = delegate.createBatchWriterFactory(info)
      new FillingWriterFactory(f, specs, idBase, reserver)
    }
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      delegate.commit(messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      delegate.abort(messages)
    override def useCommitCoordinator(): Boolean =
      delegate.useCommitCoordinator()
  }

  final class FillingWriterFactory(delegate: DataWriterFactory,
      specs: Specs, idBase: Long, reserver: Reserver = null)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long)
        : DataWriter[InternalRow] = {
      val d = delegate.createWriter(partitionId, taskId)
      val fill = new Filler(specs, idBase, partitionId,
        reserver = reserver)
      new DataWriter[InternalRow] {
        override def write(record: InternalRow): Unit = d.write(fill(record))
        override def commit(): WriterCommitMessage = d.commit()
        override def abort(): Unit = d.abort()
        override def close(): Unit = d.close()
      }
    }
  }

  /** Delta-write wrapper: generated columns recompute on INSERT and
    * UPDATE rows (an UPDATE that changes a referenced column must move
    * the generated value with it); identity columns keep a row's
    * existing value (scan-carried through UPDATE) and allocate fresh
    * values for MERGE-inserted rows from `idBase`, the per-commit block
    * the driver reserved at write-build time. */
  final class FillingDeltaBatchWrite(
      delegate: org.apache.spark.sql.connector.write.DeltaBatchWrite,
      specs: Specs, idBase: Long = 0L, reserver: Reserver = null)
      extends org.apache.spark.sql.connector.write.DeltaBatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.DeltaWriterFactory =
      // a named factory class, NOT a SAM lambda: a lambda defined in this
      // class body closes over the (non-serializable) enclosing
      // FillingDeltaBatchWrite and fails Task-not-serializable on every
      // UPDATE/MERGE — mirror the INSERT path's FillingWriterFactory.
      new FillingDeltaWriterFactory(
        delegate.createBatchWriterFactory(info), specs, idBase, reserver)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      delegate.commit(messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      delegate.abort(messages)
    override def useCommitCoordinator(): Boolean =
      delegate.useCommitCoordinator()
  }

  /** Streaming wrapper: GENERATED columns compute per row exactly like
    * the batch path (deterministic expressions — an epoch replay
    * recomputes identical values, preserving idempotent epochs).
    * IDENTITY columns allocate LAZILY task-side: each (task, epoch)
    * that actually writes an identity row reserves its own whole block
    * from the `_IDENTITY` high-water mark. A replayed epoch reserves
    * fresh blocks — its VALUES differ from the crashed attempt's, which
    * is sound because the replay atomically REPLACES the epoch's files
    * (uniqueness and step alignment hold across the whole history;
    * crashed attempts waste their blocks, like every transactional
    * identity allocator). */
  final class FillingStreamingWrite(
      delegate: org.apache.spark.sql.connector.write.streaming.StreamingWrite,
      specs: Specs, reserver: Reserver = null)
      extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
    require(specs.ids.isEmpty || reserver != null,
      "audit: identity columns need a streaming reservation path")
    override def createStreamingWriterFactory(info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
      new FillingStreamingWriterFactory(
        delegate.createStreamingWriterFactory(info), specs, reserver)
    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit =
      delegate.commit(epochId, messages)
    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit =
      delegate.abort(epochId, messages)
    override def useCommitCoordinator(): Boolean =
      delegate.useCommitCoordinator()
  }

  /** Named serializable factory (same Task-not-serializable trap as the
    * delta path — never a SAM lambda in the enclosing class body). */
  final class FillingStreamingWriterFactory(
      delegate: org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory,
      specs: Specs, reserver: Reserver = null)
      extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
        : DataWriter[InternalRow] = {
      val d = delegate.createWriter(partitionId, taskId, epochId)
      val fill = new Filler(specs, 0L, partitionId, reserver = reserver,
        lazyAlloc = specs.ids.nonEmpty)
      new DataWriter[InternalRow] {
        override def write(record: InternalRow): Unit = d.write(fill(record))
        override def commit(): WriterCommitMessage = d.commit()
        override def abort(): Unit = d.abort()
        override def close(): Unit = d.close()
      }
    }
  }

  /** Task-side factory for the delta path — only (delegate, specs) ship
    * to executors. INSERT rows validate explicit values (a MERGE insert
    * obeys the same GENERATED ALWAYS rules as INSERT INTO); UPDATE rows
    * arrive with stale generated values, so they recompute instead of
    * compare — and GENERATED ALWAYS AS IDENTITY columns are guarded by
    * the METADATA projection: the audit delta operations require one
    * `_orig_<col>` metadata attribute per locked identity column, so the
    * `meta` row carries each row's ORIGINAL identity value (metadata
    * columns are preserved-on-update, and unlike rowId attributes they
    * may be nullable). An UPDATE whose new value diverges from the
    * original is an explicit assignment to an identity column and is
    * rejected loudly — the reference behavior; Spark 4.1's analyzer has
    * no check of its own for this. */
  final class FillingDeltaWriterFactory(
      delegate: org.apache.spark.sql.connector.write.DeltaWriterFactory,
      specs: Specs, idBase: Long, reserver: Reserver = null)
      extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long)
        : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] = {
      val d = delegate.createWriter(partitionId, taskId)
      val fill = new Filler(specs, idBase, partitionId,
        validateExplicit = false, reserver = reserver)
      // GENERATED ALWAYS identity columns, in schema order — the same
      // order the operations declare their `_orig_<col>` metadata attrs,
      // so the `meta` row is exactly (orig₁, orig₂, …)
      val locked = specs.ids.filter(!_.allowExplicit)
      new org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
        override def insert(row: InternalRow): Unit =
          d.insert(fill(row, validate = true))
        override def update(meta: InternalRow, id: InternalRow,
            row: InternalRow): Unit = {
          var j = 0
          locked.foreach { lc =>
            val dt = specs.fieldTypes(lc.idx)
            val orig =
              if (meta == null || meta.numFields <= j || meta.isNullAt(j))
                null
              else meta.get(j, dt)
            val arrived = if (row.isNullAt(lc.idx)) null else row.get(lc.idx, dt)
            if (orig != null && arrived != orig)
              throw new IllegalArgumentException(
                s"audit identity column: UPDATE cannot assign a GENERATED " +
                  s"ALWAYS AS IDENTITY column (assigned $arrived, stored " +
                  s"$orig) — identity values are engine-managed")
            j += 1
          }
          d.update(meta, id, fill(row, validate = false))
        }
        override def delete(meta: InternalRow, id: InternalRow): Unit =
          d.delete(meta, id)
        override def commit(): WriterCommitMessage = d.commit()
        override def abort(): Unit = d.abort()
        override def close(): Unit = d.close()
      }
    }
  }
}
