package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of join — guide preference (c): a whole-operator
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, used where composition
  * has a real overhead.
  *
  * The composition form ([[graft.ops.AsOfJoin.asOf]]) unions both tagged
  * sides into ONE frame, shuffles the union by key, window-sorts it, and
  * carries the last right row forward — correct and one Exchange, but the
  * Exchange moves `|L| + |R|` rows padded to the union schema (every left
  * row carries null right-payload slots and vice versa), and the window
  * carry materializes a per-row struct column before the left rows are
  * filtered back out.
  *
  * This operator instead keeps the sides separate: each child is
  * hash-clustered on its OWN key and sorted `(key, ts)` — exactly what
  * `EnsureRequirements` already knows how to provide (and can satisfy for
  * free from bucketing or a reused exchange) — and a per-partition merge
  * walks the two sorted iterators once, remembering the most recent right
  * row per key. No union schema padding, no window operator, no carried
  * struct column, and each side's shuffle width is its own row width. At
  * 100 TB the right side is typically a small dimension-like history: it
  * shuffles at its own (narrow) width instead of being padded to the fact
  * schema.
  *
  * Semantics (backward as-of, boundary inclusive — same contract as the
  * composition and DuckDB's `ASOF JOIN`): for each left row, the right row
  * with the greatest `ts ≤` left `ts` within the same key. NULL keys or
  * timestamps never match on either side. `isLeftOuter` keeps unmatched
  * left rows with a null right payload; inner drops them.
  *
  * Registered through the PUBLIC extension-points API
  * ([[GraftExtensions]] → `injectPlannerStrategy`); the ops-layer wrapper
  * also idempotently adds the strategy to
  * `spark.experimental.extraStrategies` so a bare session works.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    isLeftOuter: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, outer) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children hash-clustered on their keys and sorted
  * `(key, ts)` ascending; one forward pass per partition.
  *
  * The merge keeps at most ONE buffered right row (the current best
  * candidate) plus a one-row lookahead — O(1) state, no per-key
  * materialization, so a hot key (10⁸ left rows) streams through without
  * memory growth. Right rows are consumed at most once per partition.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    isLeftOuter: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides clustered on their join key: EnsureRequirements inserts the
  // two hash Exchanges (or reuses child partitioning — bucketed inputs join
  // with ZERO shuffles, same as SortMergeJoin)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through in order, keyed by the left key
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightArity = right.output.size
    val outAttrs = output
    val leftOutput = left.output
    val rightOutput = right.output
    val outer = isLeftOuter

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val joinedRow = new JoinedRow
        val nullRight = new GenericInternalRow(rightArity)
        val project = UnsafeProjection.create(outAttrs, leftOutput ++ rightOutput)

        new Iterator[InternalRow] {
          // lookahead right row — copied because the upstream sorter reuses
          // its row object across next() calls
          private var rNext: InternalRow = _
          private var rNextKey: Any = _
          private var rNextTs: Any = _
          advanceRight()

          // best candidate so far for the CURRENT left key
          private var cand: InternalRow = null
          private var candKey: Any = null

          private var pending: InternalRow = null

          /** Pull the next non-null-keyed right row into the lookahead. */
          private def advanceRight(): Unit = {
            rNext = null
            while (rNext == null && rIter.hasNext) {
              val r = rIter.next()
              val k = rKeyB.eval(r)
              val t = rTsB.eval(r)
              if (k != null && t != null) {
                rNext = r.copy(); rNextKey = rKeyB.eval(rNext); rNextTs = rTsB.eval(rNext)
              }
            }
          }

          private def computeNext(): Unit = {
            pending = null
            while (pending == null && lIter.hasNext) {
              val l = lIter.next()
              val lk = lKeyB.eval(l)
              val lt = lTsB.eval(l)
              if (lk == null || lt == null) {
                if (outer) pending = project(joinedRow(l, nullRight))
              } else {
                // stale candidate from a previous key
                if (cand != null && keyOrd.compare(candKey, lk) != 0) cand = null
                // consume right rows usable now or never: key behind us is
                // dead (left keys only grow); equal key with ts ≤ lt is a
                // newer candidate (right sorted by ts, so later wins)
                var continue = rNext != null
                while (continue) {
                  val c = keyOrd.compare(rNextKey, lk)
                  if (c < 0) advanceRight()
                  else if (c == 0 && tsOrd.compare(rNextTs, lt) <= 0) {
                    cand = rNext; candKey = rNextKey
                    advanceRight()
                  } else continue = false
                  if (rNext == null) continue = false
                }
                if (cand != null) pending = project(joinedRow(l, cand))
                else if (outer) pending = project(joinedRow(l, nullRight))
              }
            }
          }

          override def hasNext: Boolean = {
            if (pending == null) computeNext()
            pending != null
          }

          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty iterator")
            val out = pending
            pending = null
            numOutputRows += 1
            out
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
