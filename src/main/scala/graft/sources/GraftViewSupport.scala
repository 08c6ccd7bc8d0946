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
          val aliased =
            if (v.aliases.isEmpty || v.aliases.sameElements(v.qcols)) parsed
            else Project(v.qcols.zip(v.aliases).toSeq.map { case (q, a) =>
              Alias(UnresolvedAttribute.quoted(q), a)()
            }, parsed)
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

  private[sources] def graftView(spark: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    if (parts.length < 2) None
    else try {
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case g: GraftCatalog =>
          Some((g, Identifier.of(parts.tail.init.toArray, parts.last)))
        case _ => None
      }
    } catch { case _: Exception => None }

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
    if (catalog.viewExists(ident)) {
      if (replace) catalog.dropView(ident)
      else if (allowExisting) return Seq.empty
      else throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    }
    val cm = spark.sessionState.catalogManager
    catalog.createView(new ViewInfo(ident, sql,
      cm.currentCatalog.name(), cm.currentNamespace, schema,
      qcols, aliases, comments, props.asJava))
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
    val cm = spark.sessionState.catalogManager
    catalog.dropView(ident)
    catalog.createView(new ViewInfo(ident, sql,
      cm.currentCatalog.name(), cm.currentNamespace, analyzed.schema,
      qcols, qcols, qcols.map(_ => null: String), prior.properties()))
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
