package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Engine-injected optimizer rule: BOUND Levenshtein predicates run the
  * banded DP.
  *
  * `levenshtein(a, b) <= k` evaluates the full O(|a|·|b|) matrix and only
  * then compares; the 3-arg threshold form `levenshtein(a, b, k)` runs the
  * banded O(k·min(|a|,|b|)) DP with early exit and returns −1 when the
  * distance exceeds k. The rewrite is exact:
  *
  *   d(a,b) ≤ k  ⟺  levenshtein(a,b,k) ≥ 0        (k ≥ 0)
  *   d(a,b) < k  ⟺  levenshtein(a,b,k−1) ≥ 0      (k ≥ 1)
  *
  * (null inputs: both forms yield null, and null-vs-0 comparisons stay
  * null — filter semantics unchanged.) This encodes the repo invariant
  * "always use the banded form when a bound exists" into the OPTIMIZER, so
  * ad-hoc SQL (`WHERE levenshtein(u, v) <= 2`) gets the banded plan the
  * hand-tuned operators (fuzzy_pairs, sorted_neighbors) already use — on a
  * 100 TB fuzzy-join the band is the difference between O(k·n) and
  * O(n²) per candidate pair.
  *
  * Registered through the PUBLIC extension points API
  * (`spark.sql.extensions` → [[GraftExtensions]]) — the engine's example
  * of guide-tier (c): injecting plan rules, not just expressions.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 0 => banded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 0 => banded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 1 => banded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 1 => banded(l, r, k - 1)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — wired into the
  * engine's Verify/Bench sessions; any user session opts in the same way.
  * Registers the engine's whole extension surface: two optimizer rules
  * ([[BandedLevenshteinRule]], [[RowNumberDedupRule]]) and the native
  * as-of join planner strategy ([[AsOfJoinStrategy]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BandedLevenshteinRule)
    ext.injectOptimizerRule(_ => RowNumberDedupRule)
    // per-session instance: the MV registry is scoped to the session the
    // optimizer belongs to (see MvRewriteRule's registry)
    ext.injectOptimizerRule(session => new MvRewriteRule(session))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // view DDL rewrites at PARSE time (ResolveSessionCatalog would refuse
    // it in the same analyzer pass that resolves the identifier), chained
    // around the as-of parser; SELECT-through-view resolves lazily below
    ext.injectParser((session, delegate) =>
      new graft.sources.GraftViewSqlParser(session, new AsOfSqlParser(delegate)))
    ext.injectResolutionRule(_ => AsOfJoinResolutionRule)
    ext.injectResolutionRule(session => graft.sources.GraftViewRules(session))
    ext.injectFunction(GraftExtensions.chunkTokensDescriptor)
    ext.injectFunction(GraftExtensions.argminRowDescriptor)
    ext.injectFunction(GraftExtensions.topkRowsDescriptor)
    ext.injectFunction(GraftExtensions.kmvSketchDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

  /** `chunk_tokens(text, width, stride[, delim])` — SQL surface for
    * [[ChunkTokensGen]] (usable in LATERAL VIEW / generator positions).
    * width/stride/delim must be literals: they shape the generator, not
    * per-row data. */
  private[plans] val chunkTokensDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"chunk_tokens: $what must be an integer literal, got $other")
    }
    def strLit(e: Expression): String = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"chunk_tokens: delim must be a string literal, got $other")
    }
    (FunctionIdentifier("chunk_tokens"),
      new ExpressionInfo(classOf[ChunkTokensGen].getCanonicalName, "chunk_tokens"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 3 || exprs.size == 4,
          "chunk_tokens(text, width, stride[, delim]) takes 3 or 4 arguments")
        val delim = if (exprs.size == 4) strLit(exprs(3)) else " "
        ChunkTokensGen(exprs.head, lit(exprs(1), "width"), lit(exprs(2), "stride"),
          delim)
      })
  }

  /** `argmin_row(value, ord)` — the [[MinRowBy]] hash argmin as a plain
    * SQL aggregate (the analyzer wraps a bare AggregateFunction): the row
    * struct with the smallest ord, no sort, mergeable. The user-facing
    * twin of what [[RowNumberDedupRule]] plans automatically; wrap sort
    * keys in `struct(...)` so ord is never NULL (field nulls compare
    * nulls-first, same as asc-nulls-first). */
  private[plans] val argminRowDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("argmin_row"),
      new ExpressionInfo(classOf[MinRowBy].getCanonicalName, "argmin_row"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "argmin_row(value, ord) takes 2 arguments")
        MinRowBy(exprs.head, exprs(1), reverse = false)
      })

  /** `topk_rows(value, ord, k)` — the [[TopKRows]] bounded heap top-k as a
    * plain SQL aggregate: the k rows with the smallest ord as an array in
    * rank order, hash-based and map-side mergeable (no per-group sort —
    * the generalization of [[argminRowDescriptor]] beyond k=1). k must be
    * an integer literal: it shapes the buffer, not per-row data. */
  private[plans] val topkRowsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("topk_rows"),
      new ExpressionInfo(classOf[TopKRows].getCanonicalName, "topk_rows"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 3, "topk_rows(value, ord, k) takes 3 arguments")
        val k = exprs(2) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_rows: k must be an integer literal, got $other")
        }
        TopKRows(exprs.head, exprs(1), k)
      })

  /** `kmv_sketch(hash, k)` — the [[KmvSketch]] k-minimum-values distinct
    * sketch as a plain SQL aggregate: the k smallest distinct BIGINT hash
    * values as an ascending array. Mergeable (≤ k longs per partition
    * cross the shuffle) and, over the repo's deterministic cross-engine
    * hash, bit-reproducible — the oracle-checkable alternative to
    * approx_count_distinct that also supports union/intersection
    * estimates by sketch algebra. k must be an integer literal: it shapes
    * the buffer, not per-row data. */
  private[plans] val kmvSketchDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getCanonicalName, "kmv_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "kmv_sketch(hash, k) takes 2 arguments")
        val k = exprs(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"kmv_sketch: k must be an integer literal, got $other")
        }
        KmvSketch(exprs.head, k)
      })
}
