package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL surface for [[GraftCatalog]]'s views. Spark 4.1 ships the DSv2
  * `ViewCatalog` API but no command plumbing for non-session catalogs
  * (`ResolveSessionCatalog` refuses view DDL once the identifier
  * resolves) — engines provide their own, the Iceberg pattern. This rule
  * intercepts the UNRESOLVED command forms targeting a graft catalog and
  * rewrites them to runnable commands before the refusal can fire, and
  * resolves a SELECT over a stored view by parsing its stored SQL — the
  * standard lazy-view contract, so new base-table data is visible
  * through the view. Registered by [[graft.plans.GraftExtensions]]. */
final case class GraftViewRules(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViewRules.graftView

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // SELECT through a stored view: parse the stored SQL, re-apply the
    // declared column aliases, and alias the subtree under the view name
    case u @ UnresolvedRelation(parts, _, isStreaming) if !isStreaming =>
      graftView(spark, parts) match {
        case Some((g, id)) if g.viewExists(id) =>
          val v = g.loadView(id).asInstanceOf[GraftView]
          val parsed = spark.sessionState.sqlParser.parsePlan(v.sql)
          // resolve the stored SQL against the view's STORED resolution
          // context, not the reader's: relative table references are
          // qualified with the catalog/namespace captured at CREATE time
          // (the Iceberg ResolveViews pattern), so the view answers
          // identically from any session context
          val contexted = GraftViewRules.qualifyRelations(spark, parsed,
            v.catalog, v.namespace.toSeq)
          val aliased =
            if (v.aliases.isEmpty || v.aliases.sameElements(v.qcols)) contexted
            else Project(v.qcols.zip(v.aliases).toSeq.map { case (q, a) =>
              Alias(UnresolvedAttribute.quoted(q), a)()
            }, contexted)
          SubqueryAlias(parts.last, aliased)
        case _ => u
      }
  }
}

/** DDL half of the view surface, applied AT PARSE TIME (wrapped around
  * the session parser by [[graft.plans.GraftExtensions]]): Spark's
  * `ResolveSessionCatalog` refuses view DDL against a non-session
  * catalog in the same analyzer pass that resolves the identifier, so a
  * resolution rule can never win that race — the parser hook rewrites
  * the freshly parsed command nodes before the analyzer ever sees them. */
object GraftViewRules {

  /** Qualify RELATIVE table references of a view's freshly parsed SQL
    * against the view's stored resolution context, mirroring Spark's own
    * name resolution: a 1-part name gets the stored catalog+namespace, a
    * multi-part name whose head is NOT a registered catalog gets the
    * stored catalog prepended; fully-qualified names pass through.
    * Applied through subqueries — views routinely nest them.
    *
    * CTE references must NOT be qualified: `WITH x AS (...) SELECT …
    * FROM x` parses `x` as a 1-part UnresolvedRelation, and Spark's
    * CTESubstitution only substitutes 1-part names — qualifying `x` to
    * catalog.ns.x would resolve it to a real table (or fail). So
    * CTESubstitution is applied to the parsed plan FIRST (the Iceberg
    * ResolveViews pattern): it runs in the analyzer's Substitution
    * batch, which has already passed by the time this resolution rule
    * expands the view, so it must be re-driven here by hand. After
    * substitution every surviving UnresolvedRelation is a real table. */
  private[sources] def qualifyRelations(spark: SparkSession,
      plan: LogicalPlan, catalog: String, namespace: Seq[String])
      : LogicalPlan = {
    val cm = spark.sessionState.catalogManager
    def isCatalog(name: String): Boolean =
      try { cm.catalog(name); true } catch { case _: Exception => false }
    def qualify(parts: Seq[String]): Seq[String] =
      if (parts.length == 1) (catalog +: namespace) :+ parts.head
      else if (!isCatalog(parts.head)) catalog +: parts
      else parts
    val substituted =
      org.apache.spark.sql.catalyst.analysis.CTESubstitution.apply(plan)
    substituted.transformUpWithSubqueries {
      case u @ UnresolvedRelation(parts, _, false) =>
        u.copy(multipartIdentifier = qualify(parts))
    }
  }

  /** Resolve a (possibly relative) multipart name to a graft catalog +
    * identifier, mirroring Spark's own rules: a leading registered
    * catalog wins; otherwise the name is relative to the CURRENT catalog
    * (and, for a bare name, the current namespace). */
  private[sources] def graftView(spark: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    def asCatalog(n: String) =
      try Some(cm.catalog(n)) catch { case _: Exception => None }
    if (parts.length >= 2) asCatalog(parts.head) match {
      case Some(g: GraftCatalog) =>
        return Some((g, Identifier.of(parts.tail.init.toArray, parts.last)))
      case Some(_) => return None
      case None    => () // not a catalog → relative name, fall through
    }
    cm.currentCatalog match {
      case g: GraftCatalog =>
        val ns =
          if (parts.length >= 2) parts.init.toArray else cm.currentNamespace
        Some((g, Identifier.of(ns, parts.last)))
      case _ => None
    }
  }

  /** The parser wraps ALTER VIEW targets in UnresolvedView /
    * UnresolvedTableOrView nodes — extract the multipart name uniformly. */
  private object ViewTarget {
    def unapply(plan: LogicalPlan): Option[Seq[String]] = plan match {
      case v: org.apache.spark.sql.catalyst.analysis.UnresolvedView =>
        Some(v.multipartIdentifier)
      case tv: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
        Some(tv.multipartIdentifier)
      case _ => None
    }
  }

  def rewriteDdl(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case cv: CreateView =>
        cv.child match {
          case UnresolvedIdentifier(parts, _) =>
            graftView(spark, parts) match {
              case Some((g, id)) =>
                GraftCreateViewCommand(g, id,
                  cv.originalText.getOrElse(throw new IllegalArgumentException(
                    "graft views need the view's SQL text")),
                  cv.userSpecifiedColumns, cv.properties, cv.query,
                  cv.allowExisting, cv.replace)
              case None => cv
            }
          case _ => cv
        }

      case d: DropView =>
        d.child match {
          case UnresolvedIdentifier(parts, _) =>
            graftView(spark, parts) match {
              case Some((g, id)) => GraftDropViewCommand(g, id, d.ifExists)
              case None => d
            }
          case _ => d
        }

      case s: ShowViews =>
        s.child match {
          case UnresolvedNamespace(parts, _) if parts.nonEmpty =>
            graftView(spark, parts :+ "x") match { // pad: namespace-only probe
              case Some((g, _)) =>
                GraftShowViewsCommand(g, parts.tail, s.pattern, s.output)
              case None => s
            }
          case _ => s
        }

      // ALTER VIEW ... SET/UNSET TBLPROPERTIES — only claimed when the
      // target IS a stored graft view (tables keep their own path)
      case sv: SetViewProperties =>
        sv.child match {
          case ViewTarget(parts) =>
            graftView(spark, parts) match {
              case Some((g, id)) if g.viewExists(id) =>
                GraftAlterViewPropsCommand(g, id, sv.properties, Nil)
              case _ => sv
            }
          case _ => sv
        }
      case uv: UnsetViewProperties =>
        uv.child match {
          case ViewTarget(parts) =>
            graftView(spark, parts) match {
              case Some((g, id)) if g.viewExists(id) =>
                GraftAlterViewPropsCommand(g, id, Map.empty, uv.propertyKeys)
              case _ => uv
            }
          case _ => uv
        }

      // ALTER VIEW v AS <query>: redefinition keeps the existing
      // properties, recomputes schema/aliases from the new query
      case ava: AlterViewAs =>
        ava.child match {
          case ViewTarget(parts) =>
            graftView(spark, parts) match {
              case Some((g, id)) if g.viewExists(id) =>
                GraftAlterViewAsCommand(g, id, ava.originalText, ava.query)
              case _ => ava
            }
          case _ => ava
        }

      // SHOW TBLPROPERTIES over a stored view
      case stp: ShowTableProperties =>
        stp.table match {
          case ViewTarget(parts) =>
            graftView(spark, parts) match {
              case Some((g, id)) if g.viewExists(id) =>
                GraftShowViewPropsCommand(g, id, stp.propertyKey, stp.output)
              case _ => stp
            }
          case _ => stp
        }

      // ALTER VIEW old RENAME TO new (arrives as RenameTable with isView)
      case r: RenameTable if r.isView =>
        r.child match {
          case ViewTarget(parts) =>
            graftView(spark, parts) match {
              case Some((g, id)) if g.viewExists(id) =>
                GraftRenameViewCommand(g, id, r.newName)
              case _ => r
            }
          case _ => r
        }

      case other => other
    }
}

final case class GraftCreateViewCommand(catalog: GraftCatalog,
    ident: Identifier, sql: String,
    userCols: Seq[(String, Option[String])],
    props: Map[String, String], query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val analyzed = spark.sessionState.executePlan(query).analyzed
    val qcols = analyzed.schema.fieldNames
    require(userCols.isEmpty || userCols.length == qcols.length,
      s"graft view $ident: ${userCols.length} column aliases for " +
        s"${qcols.length} query columns")
    val aliases =
      if (userCols.isEmpty) qcols else userCols.map(_._1).toArray
    val comments: Array[String] =
      if (userCols.isEmpty) qcols.map(_ => null: String)
      else userCols.map(_._2.orNull).toArray
    val schema = StructType(analyzed.schema.fields.zip(aliases).map {
      case (f, a) => f.copy(name = a)
    })
    val exists = catalog.viewExists(ident)
    if (exists) {
      if (allowExisting && !replace) return Seq.empty
      if (!replace)
        throw new org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException(ident)
    }
    val cm = spark.sessionState.catalogManager
    val info = new ViewInfo(ident, sql,
      cm.currentCatalog.name(), cm.currentNamespace, schema,
      qcols, aliases, comments, props.asJava)
    // OR REPLACE over an existing view is ONE atomic sidecar write — no
    // drop+create window where a crash loses the view
    if (exists) catalog.replaceView(info) else catalog.createView(info)
    Seq.empty
  }
}

final case class GraftDropViewCommand(catalog: GraftCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

final case class GraftShowViewsCommand(catalog: GraftCatalog,
    namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val views = catalog.listViews(namespace: _*).toSeq.map(_.name())
    val kept = pattern.fold(views)(p =>
      org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(views, p))
    kept.sorted.map(n => Row(namespace.mkString("."), n, false))
  }
}

final case class GraftAlterViewPropsCommand(catalog: GraftCatalog,
    ident: Identifier, set: Map[String, String], unset: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.map(ViewChange.removeProperty)
    catalog.alterView(ident, changes: _*)
    Seq.empty
  }
}

final case class GraftAlterViewAsCommand(catalog: GraftCatalog,
    ident: Identifier, sql: String, query: LogicalPlan)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val prior = catalog.loadView(ident).asInstanceOf[GraftView]
    val analyzed = spark.sessionState.executePlan(query).analyzed
    val qcols = analyzed.schema.fieldNames
    // the declared column aliases/comments survive the redefinition when
    // the new query has the same arity (the columns the user NAMED are a
    // property of the view, not of one query revision); an arity change
    // resets them to the new query's own names
    val sameArity = prior.aliases.length == qcols.length
    val aliases = if (sameArity) prior.aliases else qcols
    val comments =
      if (sameArity) prior.comments else qcols.map(_ => null: String)
    val schema = StructType(analyzed.schema.fields.zip(aliases).map {
      case (f, a) => f.copy(name = a)
    })
    val cm = spark.sessionState.catalogManager
    // ONE atomic sidecar write: a crash mid-redefinition leaves the old
    // view intact, never a dropped-but-not-recreated gap
    catalog.replaceView(new ViewInfo(ident, sql,
      cm.currentCatalog.name(), cm.currentNamespace, schema,
      qcols, aliases, comments, prior.properties()))
    Seq.empty
  }
}

final case class GraftShowViewPropsCommand(catalog: GraftCatalog,
    ident: Identifier, propertyKey: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val props = catalog.loadView(ident).properties().asScala.toMap
    propertyKey match {
      case Some(k) => Seq(Row(k,
        props.getOrElse(k, s"View ${ident} does not have property: $k")))
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

final case class GraftRenameViewCommand(catalog: GraftCatalog,
    ident: Identifier, newName: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val newIdent =
      if (newName.length == 1) Identifier.of(ident.namespace(), newName.head)
      else Identifier.of(newName.init.toArray, newName.last)
    catalog.renameView(ident, newIdent)
    Seq.empty
  }
}

/** Session-parser wrapper applying [[GraftViewRules.rewriteDdl]] to every
  * freshly parsed statement (see the rewrite's scaladoc for why this
  * happens at parse time). Everything else delegates untouched. */
final class GraftViewSqlParser(spark: SparkSession,
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftViewRules.rewriteDdl(spark, delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}
