package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** MATERIALIZED-VIEW QUERY REWRITING: an optimizer rule that answers
  * aggregate queries over a base table from a registered summary table
  * (the MV) with a compensating roll-up, when the rewrite is provably
  * exact.
  *
  * This closes the engine's MV loop: `q_partial_merge` proves the
  * rollup-table ALGEBRA (partial aggregates re-aggregate losslessly),
  * `q_cdf_mv` MAINTAINS a summary incrementally from the change feed —
  * this rule makes queries USE the summary automatically, the way
  * BigQuery/Snowflake/Databricks MV rewriting works. At 100 TB the win
  * is structural: a grouped aggregate over the fact table scans the
  * whole fact; the rewritten plan scans |group-combinations| rows. The
  * rewrite fires only when every leg is exact, so it is answer-invariant
  * by construction (and the spec A/Bs rewritten vs direct plans).
  *
  * Exactness conditions (all required, conservatively checked):
  *   - the aggregate's child is the registered base scan under only
  *     column-pruning Projects and Filters;
  *   - every Filter references ONLY MV grouping columns (such filters
  *     commute with the MV's GROUP BY, so applying them to the MV's
  *     group columns selects exactly the groups whose base rows pass);
  *   - every grouping expression is a bare MV grouping column (query
  *     grouping coarser-or-equal to the MV grain);
  *   - every aggregate is rollup-able over the MV's measures:
  *     count(*) → sum(cnt), sum(x) → sum(sum_x), min(x) → min(min_x),
  *     max(x) → max(max_x); no DISTINCT, no FILTER clauses. avg is
  *     deliberately not matched (rewrite to sum/count is a client-side
  *     decision about float association order — the engine only fires
  *     bit-exact rewrites).
  *
  * FRESHNESS is the registrant's contract (same as every MV engine):
  * register after materializing, unregister before mutating the base.
  * Registration is PER-SESSION state, not catalog metadata: the registry
  * is a weak map keyed on the owning [[SparkSession]], and each session's
  * optimizer carries its own rule instance (injected per session by
  * [[GraftExtensions]]), so an MV registered in one session can never
  * rewrite another session's queries — and a session's registrations die
  * with it.
  *
  * Output attributes keep the ORIGINAL names and exprIds (Alias with the
  * original exprId — round-6 invariant: downstream operators resolve
  * against those ids). The MV plan is re-read per rewrite so its
  * exprIds are fresh and cannot collide with the query's.
  */
final class MvRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {
  override val ruleName: String = "graft.plans.MvRewriteRule"
  override def apply(plan: LogicalPlan): LogicalPlan =
    MvRewriteRule.applyFor(session, plan)
}

object MvRewriteRule {

  /** One registered summary table. `sums`/`mins`/`maxs` map BASE column
    * name → MV measure column name; `cnt` is the MV's count(*) column. */
  final case class MvDef(
      basePath: String,
      groupCols: Seq[String],
      cnt: String,
      sums: Map[String, String],
      mins: Map[String, String],
      maxs: Map[String, String],
      // takes the session as a PARAMETER: a closure capturing the
      // session would make the WeakHashMap value reference its own key,
      // pinning discarded sessions forever (the map's weakness would be
      // purely decorative)
      mvPlan: SparkSession => LogicalPlan)

  // weak keys: a discarded session's registrations are GC-reclaimed
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Seq[MvDef]]())

  def register(session: SparkSession, mv: MvDef): Unit =
    registered.synchronized {
      val prior = Option(registered.get(session)).getOrElse(Seq.empty)
      registered.put(session,
        prior.filterNot(_.basePath == mv.basePath) :+ mv)
    }
  def unregister(session: SparkSession, basePath: String): Unit =
    registered.synchronized {
      val prior = Option(registered.get(session)).getOrElse(Seq.empty)
      registered.put(session, prior.filterNot(_.basePath == basePath))
    }
  def clear(): Unit = registered.synchronized { registered.clear() }

  /** TEST HOOK: live sessions in the registry (WeakHashMap expunges
    * stale entries on access — a dropped session must disappear). */
  private[plans] def registeredSessionCount: Int =
    registered.synchronized { registered.size }

  /** Build + write the summary table for `mv` from the base frame, so
    * the materialization and the rewrite share one definition (they
    * cannot drift). */
  def materialize(base: DataFrame, mv: MvDef, outDir: String): Unit = {
    val measures =
      Seq(count(lit(1)).as(mv.cnt)) ++
        mv.sums.map { case (src, m) => sum(col(src)).as(m) } ++
        mv.mins.map { case (src, m) => min(col(src)).as(m) } ++
        mv.maxs.map { case (src, m) => max(col(src)).as(m) }
    base.groupBy(mv.groupCols.map(col): _*)
      .agg(measures.head, measures.tail: _*)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Strip column-pruning Projects and collect Filters down to a base
    * scan; None when anything else intervenes. The scan may be a V1 file
    * relation (identified by its rootPaths) or a DSv2 relation
    * (identified by its table name — e.g. the audit format's
    * `graft_audit_sink(<path>)` — so MVs can summarize catalog tables,
    * not just parquet directories). */
  private def stripToScan(plan: LogicalPlan)
      : Option[(Seq[Expression], Seq[String])] = plan match {
    case l: LogicalRelation => Some((Seq.empty, scanIds(l)))
    case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      Some((Seq.empty, Seq(v2.table.name())))
    case Filter(cond, child) =>
      stripToScan(child).map { case (fs, ids) => (cond +: fs, ids) }
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      stripToScan(child)
    case _ => None
  }

  private def scanIds(l: LogicalRelation): Seq[String] = l.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _ => Seq.empty
  }

  /** Scheme-insensitive canonical form: `file:/x/y/`, `file:///x/y` and
    * `/x/y` all name the same local table. */
  private def canon(p: String): String =
    p.stripPrefix("file://").stripPrefix("file:").stripSuffix("/")

  /** EXACT scan-identity match. A substring/suffix test would let a
    * sibling table under the MV's directory (or any path merely
    * containing it) be silently answered from the summary — the match
    * must be path equality, or the DSv2 name form `<source>(<path>)`
    * whose wrapped path is equal. */
  private def scanMatches(id: String, basePath: String): Boolean = {
    val b = canon(basePath)
    canon(id) == b || {
      val i = id.indexOf('(')
      i >= 0 && id.endsWith(")") &&
        canon(id.substring(i + 1, id.length - 1)) == b
    }
  }

  private[plans] def applyFor(session: SparkSession,
      plan: LogicalPlan): LogicalPlan = {
    val mvs = Option(registered.get(session)).getOrElse(Seq.empty)
    if (mvs.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(ges, aes, child, _) =>
        stripToScan(child).flatMap { case (filters, ids) =>
          val mv = mvs.find(m => ids.exists(id => scanMatches(id, m.basePath)))
          mv.flatMap(m => rewrite(session, agg, ges, aes, filters, m))
        }.getOrElse(agg)
    }
  }

  private def rewrite(session: SparkSession, orig: Aggregate,
      ges: Seq[Expression], aes: Seq[NamedExpression],
      filters: Seq[Expression], mv: MvDef): Option[LogicalPlan] = {
    // fresh MV relation per rewrite: new exprIds, no collision possible
    val mvRel = mv.mvPlan(session)
    val mvAttr: Map[String, AttributeReference] =
      mvRel.output.map(a => a.name -> a.asInstanceOf[AttributeReference]).toMap
    val groupSet = mv.groupCols.toSet

    // every filter must reference only MV grouping columns
    val filterable = filters.forall(_.references.forall(a => groupSet(a.name)))
    // every grouping expression must be a bare MV grouping column
    val groupable = ges.forall {
      case a: AttributeReference => groupSet(a.name)
      case _ => false
    }
    if (!filterable || !groupable) return None

    def compensated(e: Expression): Option[Expression] = e match {
      case a: AttributeReference if groupSet(a.name) => Some(mvAttr(a.name))
      case AggregateExpression(fn, Complete, false, None, _) => fn match {
        case Count(Seq(Literal(v, _))) if v != null =>
          Some(Sum(mvAttr(mv.cnt)).toAggregateExpression())
        case Sum(a: AttributeReference, _) if mv.sums.contains(a.name) =>
          Some(Sum(mvAttr(mv.sums(a.name))).toAggregateExpression())
        case Min(a: AttributeReference) if mv.mins.contains(a.name) =>
          Some(Min(mvAttr(mv.mins(a.name))).toAggregateExpression())
        case Max(a: AttributeReference) if mv.maxs.contains(a.name) =>
          Some(Max(mvAttr(mv.maxs(a.name))).toAggregateExpression())
        case _ => None
      }
      case _ => None
    }

    val newAes: Option[Seq[NamedExpression]] = aes.foldLeft(
      Option(Vector.empty[NamedExpression])) {
      case (Some(acc), a: AttributeReference) if groupSet(a.name) =>
        // keep the ORIGINAL exprId: downstream resolves against it
        Some(acc :+ Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
      case (Some(acc), al @ Alias(childExpr, name)) =>
        compensated(childExpr).map(c =>
          acc :+ Alias(c, name)(exprId = al.exprId))
      case _ => None
    }

    newAes.map { aggExprs =>
      val newGes: Seq[Expression] = ges.map {
        case a: AttributeReference => mvAttr(a.name)
      }
      val mvFiltered = filters.foldRight(mvRel) { (cond, p) =>
        Filter(cond.transform {
          case a: AttributeReference => mvAttr(a.name)
        }, p)
      }
      val out = Aggregate(newGes, aggExprs, mvFiltered)
      // type sanity: a mismatch would corrupt downstream codegen — refuse
      if (out.output.map(_.dataType) == orig.output.map(_.dataType)) out
      else orig
    } match {
      case Some(p) if p ne orig => Some(p)
      case _ => None
    }
  }
}
