package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException,
  UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation,
  UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog,
  ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL surface over DSv2 view catalogs. Spark ships the [[ViewCatalog]]
  * SPI but wires NO SQL commands to it — `ResolveSessionCatalog`
  * refuses CREATE/SHOW/DROP VIEW on any non-session catalog with
  * MISSING_CATALOG_ABILITY (external engines wire their own rules, the
  * Iceberg runtime's view support being the public example). This rule
  * runs in the analyzer's HINT batch — before that refusal — and
  * lowers the parsed view statements onto the target catalog's
  * ViewCatalog face; relation references to view identifiers
  * substitute the stored view text, re-analyzed fresh so views stay
  * current with their base tables. Only EXPLICITLY catalog-qualified
  * names whose catalog implements [[ViewCatalog]] are touched —
  * session-catalog views, temp views, and other catalogs keep stock
  * behavior. */
case class ResolveGraftViews(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def viewCatalogOf(nameParts: Seq[String])
      : Option[(ViewCatalog, Identifier)] = {
    if (nameParts.length < 2) return None
    val cm = session.sessionState.catalogManager
    if (!cm.isCatalogRegistered(nameParts.head)) return None
    cm.catalog(nameParts.head) match {
      case vc: ViewCatalog =>
        Some((vc, Identifier.of(nameParts.tail.init.toArray, nameParts.last)))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // SELECT through a view: substitute the stored text, re-parsed.
      // Unqualified relation names INSIDE the text resolve under the
      // view's recorded default catalog + namespace (the spec's
      // resolution context); qualified names resolve as written.
      case u: UnresolvedRelation if !u.isStreaming &&
          viewCatalogOf(u.multipartIdentifier)
            .exists { case (vc, id) => vc.viewExists(id) } =>
        val (vc, ident) = viewCatalogOf(u.multipartIdentifier).get
        val v = vc.loadView(ident)
        val parsed = session.sessionState.sqlParser.parsePlan(v.query)
        val qualified = parsed.transformUp {
          case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
            r.copy(multipartIdentifier =
              (v.currentCatalog +: v.currentNamespace.toSeq) ++
                r.multipartIdentifier)
        }
        SubqueryAlias(u.multipartIdentifier.last, qualified)

      case cv: CreateView =>
        cv.child match {
          case UnresolvedIdentifier(parts, _) =>
            viewCatalogOf(parts) match {
              case Some((vc, ident)) =>
                val text = cv.originalText.getOrElse(
                  throw new IllegalArgumentException(
                    s"CREATE VIEW ${parts.mkString(".")}: no SQL text"))
                CreateGraftView(vc, parts.head, ident, text,
                  cv.properties ++
                    cv.comment.map(ViewCatalog.PROP_COMMENT -> _),
                  cv.allowExisting, cv.replace)
              case None => cv
            }
          case _ => cv
        }

      case dv: DropView =>
        dv.child match {
          case UnresolvedIdentifier(parts, _) =>
            viewCatalogOf(parts) match {
              case Some((vc, ident)) => DropGraftView(vc, ident, dv.ifExists)
              case None => dv
            }
          case _ => dv
        }

      case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, out)
          if parts.nonEmpty &&
            session.sessionState.catalogManager
              .isCatalogRegistered(parts.head) &&
            session.sessionState.catalogManager.catalog(parts.head)
              .isInstanceOf[ViewCatalog] =>
        val vc = session.sessionState.catalogManager.catalog(parts.head)
          .asInstanceOf[ViewCatalog]
        ShowGraftViews(vc, parts.tail, pattern, out)

      case sp: SetViewProperties =>
        sp.child match {
          case uv: UnresolvedView =>
            viewCatalogOf(uv.multipartIdentifier) match {
              case Some((vc, ident)) =>
                AlterGraftView(vc, ident,
                  sp.properties.toSeq.map { case (k, v) =>
                    ViewChange.setProperty(k, v) })
              case None => sp
            }
          case _ => sp
        }

      case up: UnsetViewProperties =>
        up.child match {
          case uv: UnresolvedView =>
            viewCatalogOf(uv.multipartIdentifier) match {
              case Some((vc, ident)) =>
                AlterGraftView(vc, ident,
                  up.propertyKeys.map(ViewChange.removeProperty))
              case None => up
            }
          case _ => up
        }

      case st: ShowTableProperties =>
        st.child match {
          case uv: org.apache.spark.sql.catalyst.analysis
              .UnresolvedTableOrView
              if viewCatalogOf(uv.multipartIdentifier)
                .exists { case (vc, id) => vc.viewExists(id) } =>
            val (vc, ident) = viewCatalogOf(uv.multipartIdentifier).get
            ShowGraftViewProperties(vc, ident, st.propertyKey, st.output)
          case _ => st
        }
    }
}

private[graft] case class CreateGraftView(vc: ViewCatalog,
    catalogName: String, ident: Identifier, sql: String,
    properties: Map[String, String], allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (vc.viewExists(ident)) {
      if (allowExisting) return Nil
      if (!replace) throw new ViewAlreadyExistsException(ident)
      vc.dropView(ident)
    }
    val cm = session.sessionState.catalogManager
    // the view text is analyzed once here: fails fast on bad SQL and
    // pins the schema the catalog records
    val schema = session.sql(sql).schema
    vc.createView(new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, Array.empty, Array.empty, Array.empty,
      properties.asJava))
    Nil
  }
}

private[graft] case class DropGraftView(vc: ViewCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!vc.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Nil
  }
}

private[graft] case class AlterGraftView(vc: ViewCatalog, ident: Identifier,
    changes: Seq[ViewChange]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    vc.alterView(ident, changes: _*)
    Nil
  }
}

private[graft] case class ShowGraftViews(vc: ViewCatalog, ns: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val re = pattern.map(p =>
      p.replace("*", ".*").replace("|", "|").r)
    vc.listViews(ns: _*).toSeq
      .filter(id => re.forall(_.matches(id.name())))
      .sortBy(_.name())
      .map(id => Row(id.namespace().mkString("."), id.name(), false))
  }
}

private[graft] case class ShowGraftViewProperties(vc: ViewCatalog,
    ident: Identifier, key: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val props = vc.loadView(ident).properties().asScala
    key match {
      case Some(k) => Seq(Row(k, props.getOrElse(k,
        s"View ${ident.name()} does not have property: $k")))
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}
