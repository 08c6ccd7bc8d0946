package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Engine-injected optimizer rule #2: `row_number() = 1` dedup windows
  * become a hash aggregate.
  *
  * The "keep the first row per key" idiom —
  *
  *   SELECT * FROM (SELECT …, row_number() OVER (PARTITION BY k ORDER BY o)
  *                  AS rn FROM t) WHERE rn = 1
  *
  * — plans as exchange + full `(k, o)` sort + Window + filter. Spark 4.1's
  * own `InferWindowGroupLimit` bounds the sort's OUTPUT (top-1 per key
  * survives each side of the exchange) but both sides still SORT and still
  * run the Window operator to compute a rank that the filter immediately
  * pins to 1. This rule removes the sort and the rank: the same semantics
  * is the whole-row argmin per key, which [[MinRowBy]] runs as an
  * `ObjectHashAggregate` — partial hash-argmin per map task (one surviving
  * row per key per task crosses the wire), final hash-argmin after, no sort
  * on either side, no rn column shuffled. On a 100 TB dedup with hot keys
  * that swaps a skewed sort for a balanced pre-aggregation — aggregation
  * physics, same answer.
  *
  * Fires only when the rewrite is exactly answer-preserving:
  *   - the Window computes ONLY the row_number (any other window output
  *     would be lost);
  *   - partition spec non-empty (an empty grouping would turn 0 input rows
  *     into 1 aggregate row) and deterministic;
  *   - every sort key is asc-nulls-first (struct ordering) or every key is
  *     desc-nulls-last (its exact reverse), deterministic, and orderable;
  *   - the filter pins rn to 1 (`rn = 1`, `1 = rn`, `rn <= 1`, `rn < 2` —
  *     rn is never < 1); other conjuncts stay as a residual Filter above.
  * Under order-spec ties both forms are nondeterministic in the same way
  * (arbitrary surviving row); the rewrite preserves the determinism
  * contract, not tie victims.
  */
object RowNumberDedupRule extends Rule[LogicalPlan] with PredicateHelper {

  /** The window expression, if it is exactly `row_number() OVER (...)`. */
  private def asRowNumber(ne: NamedExpression): Option[Alias] = ne match {
    case a @ Alias(WindowExpression(RowNumber(), WindowSpecDefinition(_, _,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) => Some(a)
    case _ => None
  }

  private def pinsToOne(e: Expression, rn: Attribute): Boolean = e match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case GreaterThanOrEqual(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case LessThan(a: Attribute, Literal(2, IntegerType)) => a.semanticEquals(rn)
    case GreaterThan(Literal(2, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case _ => false
  }

  private def uniformDirection(orderSpec: Seq[SortOrder]): Option[Boolean] =
    if (orderSpec.forall(o => o.direction == Ascending && o.nullOrdering == NullsFirst))
      Some(false) // natural struct ordering
    else if (orderSpec.forall(o => o.direction == Descending && o.nullOrdering == NullsLast))
      Some(true) // exact reverse of struct ordering
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, w: Window)
        if w.windowExpressions.size == 1 &&
          asRowNumber(w.windowExpressions.head).isDefined &&
          w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.deterministic) &&
          w.orderSpec.nonEmpty && w.orderSpec.forall(_.child.deterministic) &&
          w.orderSpec.forall(o => RowOrdering.isOrderable(o.child.dataType)) &&
          uniformDirection(w.orderSpec).isDefined && {
            val rn = asRowNumber(w.windowExpressions.head).get.toAttribute
            val conjuncts = splitConjunctivePredicates(cond)
            conjuncts.exists(pinsToOne(_, rn)) &&
              conjuncts.filterNot(pinsToOne(_, rn))
                .forall(c => !c.references.contains(rn))
          } =>
      val rnAlias = asRowNumber(w.windowExpressions.head).get
      val rn = rnAlias.toAttribute
      // if InferWindowGroupLimit already ran (rule injected post-hoc), its
      // top-1-per-key pruner is subsumed by the aggregate — and it would
      // reintroduce the sort the rewrite removes
      val child = w.child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      val reverse = uniformDirection(w.orderSpec).get
      // ord/value wrapped in structs: the struct itself is never NULL (so
      // MinRowBy's non-null-ordering contract holds) and struct ordering ≡
      // the lexicographic multi-key sort
      val ordStruct = CreateStruct(w.orderSpec.map(_.child))
      val valStruct = CreateStruct(child.output)
      val aggAlias =
        Alias(MinRowBy(valStruct, ordStruct, reverse).toAggregateExpression(), "_graft_minrow")()
      val aggregate = Aggregate(w.partitionSpec, Seq(aggAlias), child)
      // restore the original output schema UNDER THE ORIGINAL exprIds, so
      // everything above the filter re-resolves unchanged; rn is the
      // constant 1 on every surviving row by construction
      val restored = child.output.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(aggAlias.toAttribute, i, Some(a.name)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
      val rnOut = Alias(Literal(1, IntegerType), rn.name)(exprId = rn.exprId)
      val projected = Project(restored :+ rnOut, aggregate)
      val residual = splitConjunctivePredicates(cond).filterNot(pinsToOne(_, rn))
      if (residual.isEmpty) projected else Filter(residual.reduce(And), projected)
  }
}
