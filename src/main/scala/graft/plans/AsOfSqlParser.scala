package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, CreateStruct, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL `ASOF JOIN` syntax for Spark — the parser-extension half of the
  * native as-of operator ([[AsOfJoinPlan]]/`AsOfJoinExec`).
  *
  * DuckDB ships `ASOF JOIN` as first-class SQL
  * (`FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= r.ts`); Spark has no
  * such syntax, so users of the reference's warehouse would lose those
  * queries in a migration. This delegating [[ParserInterface]] accepts
  * the SAME spelling: it rewrites `ASOF [INNER] JOIN` / `ASOF LEFT
  * [OUTER] JOIN` to a plain join, parses with Spark's own parser (full
  * select-list/CTE/WHERE/ORDER BY surface for free), and wraps the one
  * Join node in [[UnresolvedAsOfJoin]]; after the analyzer resolves
  * references, [[AsOfJoinResolutionRule]] splits the condition into
  * equality keys + the single backward time bound and lowers it onto
  * [[AsOfJoinPlan]] — the sorted-merge exec, NOT a union-window
  * emulation. The oracle for the SQL surface is DuckDB executing the
  * equivalent ASOF JOIN natively (q_sql_asof).
  *
  * Documented subset (checked with clear errors, never silent): exactly
  * one ASOF JOIN per statement; ordinary joins may appear alongside it,
  * in which case the ASOF right side must be a NAMED relation or alias
  * that appears as the right side of exactly one join (the marker that
  * ties the rewritten token back to its Join node — ambiguity is a hard
  * error, not a guess); condition = N equalities AND one `l.ts >= r.ts`
  * (or the mirrored `r.ts <= l.ts`); self-referential sides (shared
  * attribute ids) are rejected — the DataFrame API
  * (`NativeAsOf.asOfNative`) re-aliases and handles those. Statements
  * without the ASOF token delegate untouched, so the parser is a
  * zero-cost passthrough for everything else.
  */
class AsOfSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val AsofLeftRe = "(?i)\\bASOF\\s+LEFT\\s+(?:OUTER\\s+)?JOIN\\b".r
  private val AsofInnerRe = "(?i)\\bASOF\\s+(?:INNER\\s+)?JOIN\\b".r
  private val AsofRightNameRe =
    "(?i)\\bASOF\\s+(?:LEFT\\s+(?:OUTER\\s+)?|INNER\\s+)?JOIN\\s+([A-Za-z_][A-Za-z0-9_.]*)(?:\\s+(?:AS\\s+)?([A-Za-z_][A-Za-z0-9_]*))?".r

  override def parsePlan(sqlText: String): LogicalPlan = {
    val nLeft = AsofLeftRe.findAllIn(sqlText).length
    val withLeft = AsofLeftRe.replaceAllIn(sqlText, "LEFT JOIN")
    val nInner = AsofInnerRe.findAllIn(withLeft).length
    if (nLeft + nInner == 0) return delegate.parsePlan(sqlText)
    require(nLeft + nInner == 1,
      "graft ASOF JOIN SQL: exactly one ASOF JOIN per statement " +
        "(compose NativeAsOf.asOfNative for multi-asof plans)")
    val rewritten = AsofInnerRe.replaceAllIn(withLeft, "JOIN")
    val outer = nLeft == 1
    val parsed = delegate.parsePlan(rewritten)
    val joins = parsed.collect { case j: Join if j.condition.isDefined => j }
    val target: Join =
      if (joins.size == 1) joins.head
      else {
        // other joins present: the token's right-side relation name (and
        // optional alias) identifies WHICH join the user marked ASOF
        val m = AsofRightNameRe.findFirstMatchIn(sqlText).getOrElse(
          throw new IllegalArgumentException(
            "graft ASOF JOIN SQL: with other joins present the ASOF right " +
              "side must be a named relation or alias (subqueries: alias " +
              "them, or compose NativeAsOf.asOfNative)"))
        // an explicit alias binds uniquely in SQL — prefer it; fall back to
        // the relation name only when the ASOF side is unaliased
        val alias = Option(m.group(2)).filterNot(n =>
          n.equalsIgnoreCase("ON") || n.equalsIgnoreCase("USING"))
        val names = alias.map(a => Set(a.toLowerCase))
          .getOrElse(Set(m.group(1).split('.').last.toLowerCase))
        def rightNames(p: LogicalPlan): Set[String] = p match {
          case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(id, child) =>
            Set(id.name.toLowerCase) ++ rightNames(child)
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
            Set(u.multipartIdentifier.last.toLowerCase)
          case _ => Set.empty
        }
        val candidates = joins.filter(j => rightNames(j.right).intersect(names).nonEmpty)
        require(candidates.size == 1,
          s"graft ASOF JOIN SQL: the ASOF right side '${names.mkString("/")}' must " +
            s"identify exactly one join, matched ${candidates.size} " +
            "(alias the ASOF side uniquely)")
        candidates.head
      }
    var wrapped = 0
    val plan = parsed.transformUp {
      case j: Join if j eq target =>
        wrapped += 1
        UnresolvedAsOfJoin(j.left, j.right, j.condition.get, outer)
    }
    require(wrapped == 1,
      s"graft ASOF JOIN SQL: expected exactly one marked join, found $wrapped")
    plan
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Parser-produced placeholder: a join the user declared AS-OF, before
  * reference resolution has decided which side each condition column
  * belongs to. `resolved = false` holds the analyzer's parents back until
  * [[AsOfJoinResolutionRule]] replaces it. */
case class UnresolvedAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    condition: Expression,
    isLeftOuter: Boolean) extends BinaryNode {

  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    if (childrenResolved) left.output ++ right.output else Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[UnresolvedAsOfJoin]] onto [[AsOfJoinPlan]] once the analyzer
  * has resolved the condition against the children: equality conjuncts
  * become the (possibly struct-composite) join keys, the single `>=`
  * bound becomes the backward as-of time pair. Runs in the resolution
  * fixed point (injectResolutionRule). */
object AsOfJoinResolutionRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UnresolvedAsOfJoin(l, r, cond, outer)
        if u.childrenResolved && cond.resolved =>
      require(l.outputSet.intersect(r.outputSet).isEmpty,
        "graft ASOF JOIN SQL: the two sides share attribute ids " +
          "(self-referential input) — use NativeAsOf.asOfNative, which re-aliases")
      def split(e: Expression): Seq[Expression] = e match {
        case And(a, b) => split(a) ++ split(b)
        case x         => Seq(x)
      }
      def isL(e: Expression) = e.references.subsetOf(l.outputSet)
      def isR(e: Expression) = e.references.subsetOf(r.outputSet)
      val conjuncts = split(cond)
      val (eqs, rest) = conjuncts.partition {
        case EqualTo(a, b) => (isL(a) && isR(b)) || (isL(b) && isR(a))
        case _             => false
      }
      require(eqs.nonEmpty,
        "graft ASOF JOIN SQL: need at least one cross-side equality key")
      require(rest.size == 1,
        s"graft ASOF JOIN SQL: need exactly one time bound, got ${rest.size}: $rest")
      val (lts, rts) = rest.head match {
        case GreaterThanOrEqual(a, b) if isL(a) && isR(b) => (a, b)
        case LessThanOrEqual(a, b) if isR(a) && isL(b)    => (b, a)
        case other => throw new IllegalArgumentException(
          "graft ASOF JOIN SQL: time condition must be left.ts >= right.ts " +
            s"(backward as-of; forward = negate the time column), got $other")
      }
      val pairs = eqs.map { case EqualTo(a, b) =>
        if (isL(a)) (a, b) else (b, a)
      }
      val (lk, rk) =
        if (pairs.size == 1) (pairs.head._1, pairs.head._2)
        else (CreateStruct(pairs.map(_._1)), CreateStruct(pairs.map(_._2)))
      AsOfJoinPlan(l, r, lk, rk, lts, rts, outer)
  }
}
