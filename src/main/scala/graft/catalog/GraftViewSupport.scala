package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SetViewProperties, ShowViews, SubqueryAlias, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL view support over the graft [[GraftCatalog ViewCatalog]] — the
  * engine's analogue of Iceberg's view extension rules. Stock Spark 4 has
  * NO end-to-end DSv2 view path: `ResolveSessionCatalog` refuses
  * CREATE/SHOW VIEW for any non-session catalog and relation resolution
  * never consults a `ViewCatalog`; the reference stack gets SQL views from
  * exactly this kind of session extension (Iceberg 1.9's view rules,
  * enabled by reference `main.tf:803`).
  *
  * [[GraftViewDdl]] runs in the analyzer's EARLY (hint-resolution) batch —
  * before `ResolveSessionCatalog` can see a resolved identifier and throw —
  * and turns CREATE / DROP / SHOW VIEW statements aimed at a graft catalog
  * into local commands against the catalog's view store.
  * [[GraftViewRead]] runs in the resolution batch and resolves a relation
  * that names a stored view into its re-parsed SQL text wrapped in a
  * `SubqueryAlias` — LATE BINDING: each read re-resolves against current
  * table state, so views track schema evolution and new snapshots, same as
  * Iceberg/Trino views. Views of views resolve through the fixed point.
  */
object GraftViewSupport {

  /** (catalog, view identifier) when `parts` names something inside a graft
    * catalog: explicit `cat.ns.name`, or `ns.name` under a current graft
    * catalog. */
  private[catalog] def target(spark: SparkSession, parts: Seq[String]):
      Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val (catName, rest) = parts match {
      case head +: tail if tail.nonEmpty && cm.isCatalogRegistered(head) => (head, tail)
      case _ => (cm.currentCatalog.name, parts)
    }
    if (rest.size < 2) return None // need at least namespace.name
    cm.catalog(catName) match {
      case g: GraftCatalog => Some((g, Identifier.of(rest.init.toArray, rest.last)))
      case _ => None
    }
  }
}

/** DDL interception (hint batch — see [[GraftViewSupport]]). */
case class GraftViewDdl(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViewSupport.target

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView =>
      cv.child match {
        case id: UnresolvedIdentifier =>
          target(spark, id.nameParts) match {
            case Some((cat, ident)) =>
              val text = cv.originalText.getOrElse(throw new IllegalArgumentException(
                "CREATE VIEW without SQL text is not supported for graft views"))
              GraftCreateViewCommand(cat, ident, text, cv.query,
                cv.allowExisting, cv.replace)
            case None => cv
          }
        case _ => cv
      }
    case dv: DropView =>
      dv.child match {
        case id: UnresolvedIdentifier =>
          target(spark, id.nameParts) match {
            case Some((cat, ident)) => GraftDropViewCommand(cat, ident, dv.ifExists)
            case None => dv
          }
        case _ => dv
      }
    case sp: SetViewProperties =>
      sp.child match {
        case uv: UnresolvedView =>
          target(spark, uv.multipartIdentifier) match {
            case Some((cat, ident)) =>
              GraftAlterViewPropsCommand(cat, ident, set = sp.properties, unset = Nil)
            case None => sp
          }
        case _ => sp
      }
    case up: UnsetViewProperties =>
      up.child match {
        case uv: UnresolvedView =>
          target(spark, uv.multipartIdentifier) match {
            case Some((cat, ident)) =>
              GraftAlterViewPropsCommand(cat, ident, set = Map.empty, unset = up.propertyKeys)
            case None => up
          }
        case _ => up
      }
    case sv: ShowViews =>
      sv.namespace match {
        case ns: UnresolvedNamespace =>
          // SHOW VIEWS IN cat.ns — reuse target() with a dummy leaf name
          target(spark, ns.multipartIdentifier :+ "?") match {
            case Some((cat, ident)) =>
              GraftShowViewsCommand(cat, ident.namespace().toSeq, sv.pattern, sv.output)
            case None => sv
          }
        case _ => sv
      }
    case other => other.mapChildren(apply)
  }
}

/** View READ resolution (resolution batch — see [[GraftViewSupport]]). */
case class GraftViewRead(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViewSupport.target

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      target(spark, u.multipartIdentifier) match {
        case Some((cat, ident)) if cat.viewExists(ident) =>
          val v = cat.loadView(ident)
          // CTESubstitution lives in the analyzer's Substitution batch,
          // which already ran by the time this resolution rule splices the
          // parsed body in — a WITH clause inside the view text would
          // otherwise never substitute (its refs would mis-resolve as
          // catalog tables). Run it on the fragment here; the resulting
          // CTERelationDef/Ref nodes resolve normally downstream.
          SubqueryAlias(ident.name(),
            org.apache.spark.sql.catalyst.analysis.CTESubstitution(
              applyViewContext(
                spark.sessionState.sqlParser.parsePlan(v.query),
                v.currentCatalog, v.currentNamespace)))
        case _ => u
      }
  }

  /** Qualify unresolved relations in a freshly parsed view body with the
    * catalog/namespace captured when the view was DEFINED (the Iceberg view
    * spec's `default-catalog` / `default-namespace`; what Spark's
    * session-catalog views persist as `viewCatalogAndNamespace`). Without
    * this, `FROM t` inside a view binds to the READER's current namespace —
    * not late binding but wrong binding, and the reason a foreign-created
    * spec view with unqualified references would fail to resolve. Names
    * that already lead with a registered catalog are left as written, and
    * CTE names defined inside the view body are never qualified (they are
    * not catalog objects). Runs on the just-parsed subtree, so plain
    * transform (not resolveOperators) is correct, and
    * `transformUpWithSubqueries` reaches relations inside scalar/EXISTS
    * subqueries too. */
  private def applyViewContext(body: LogicalPlan, defCat: String,
      defNs: Array[String]): LogicalPlan = {
    if (defCat.isEmpty && defNs.isEmpty) return body
    val cm = spark.sessionState.catalogManager
    val cteNames = body.collectWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map(_._1.toLowerCase(java.util.Locale.ROOT))
    }.flatten.toSet
    body.transformUpWithSubqueries {
      case u: UnresolvedRelation =>
        val parts = u.multipartIdentifier
        val qualified =
          if (parts.size == 1 && cteNames.contains(
            parts.head.toLowerCase(java.util.Locale.ROOT))) parts
          else if (parts.size > 1 && cm.isCatalogRegistered(parts.head)) parts
          else if (defCat.isEmpty) parts
          else if (parts.size == 1) (defCat +: defNs.toSeq) ++ parts
          else defCat +: parts
        if (qualified == parts) u else u.copy(multipartIdentifier = qualified)
    }
  }
}

case class GraftCreateViewCommand(cat: GraftCatalog, ident: Identifier,
    text: String, query: LogicalPlan, allowExisting: Boolean, replace: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val exists = cat.viewExists(ident)
    if (exists && allowExisting) return Nil
    if (exists && !replace)
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    // analyze the view body now to capture the schema at creation (the read
    // path still re-resolves the TEXT — the schema is metadata, not binding)
    val analyzed = spark.sessionState.executePlan(query).analyzed
    val cm = spark.sessionState.catalogManager
    val info = new ViewInfo(ident, text, cm.currentCatalog.name,
      cm.currentNamespace, analyzed.schema, analyzed.schema.fieldNames,
      Array.empty, Array.empty, java.util.Collections.emptyMap())
    // REPLACE of an existing view appends a view VERSION under the same
    // view-uuid (Iceberg view spec semantics) instead of drop-and-recreate
    if (exists) cat.replaceView(info) else cat.createView(info)
    Nil
  }
}

case class GraftDropViewCommand(cat: GraftCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

case class GraftAlterViewPropsCommand(cat: GraftCatalog, ident: Identifier,
    set: Map[String, String], unset: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
      unset.map(ViewChange.removeProperty)
    cat.alterView(ident, changes: _*)
    Nil
  }
}

case class GraftShowViewsCommand(cat: GraftCatalog, ns: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val re = pattern.map(p =>
      java.util.regex.Pattern.compile(p.replace("*", ".*"), java.util.regex.Pattern.CASE_INSENSITIVE))
    cat.listViews(ns: _*).toSeq
      .filter(id => re.forall(_.matcher(id.name()).matches()))
      .sortBy(_.name())
      .map(id => Row(ns.mkString("."), id.name(), false))
  }
}
