package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType
import graft.sources.{DeltaInterop, IcebergInterop, Merge}
import graft.sources.v2.ForeignRootTable

/** Plain SQL DML on raw FOREIGN roots — the reference notebooks write
  * `UPDATE t SET …` / `DELETE FROM t` / `MERGE INTO t USING …`
  * directly against their Delta/Iceberg tables (reference:
  * docker/spark-notebook/02_iceberg_demo.ipynb DML cells,
  * 03_delta_demo.ipynb MERGE); with this rule those statements run
  * verbatim against `cat.delta.`/root`` / `cat.iceberg.`/root``
  * identifiers, dispatching to the protocol-level interop writers
  * (the same code behind the `CALL cat.system.delta_update(…)`
  * procedures, which remain for programmatic string-based use).
  *
  * Mechanics: the catalog serves a [[ForeignRootTable]] for those
  * identifiers. It implements no row-level-write SPI, so Spark's own
  * RewriteDelete/Update/MergeTable rules (which match only
  * SupportsRowLevelOperations targets, inside the Resolution batch)
  * leave the resolved `DeleteFromTable`/`UpdateTable`/`MergeIntoTable`
  * nodes untouched — this POST-HOC rule then replaces them with a
  * driver command that invokes the interop writer. Resolved
  * target/source attribute references are rewritten back to the name
  * space the writers expect (bare names = target row,
  * [[Merge.source]]-prefixed = source row), so predicates and SET
  * expressions re-resolve inside the writer's own scan.
  *
  * Scale: the command itself is O(1) driver work; all data movement
  * happens inside deleteFromDelta/updateIceberg/mergeDeltaClauses etc.,
  * which carry their own distributed CoW/DV rewrite shapes (stats-
  * pruned detection scans, per-file rewrites — see their docs). */
case class ResolveForeignDml(spark: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  import org.apache.spark.sql.functions.{col, lit}

  private object ForeignTarget {
    def unapply(plan: LogicalPlan): Option[(ForeignRootTable, DataSourceV2Relation)] =
      EliminateSubqueryAliases(plan) match {
        case r: DataSourceV2Relation => r.table match {
          case t: ForeignRootTable => Some((t, r))
          case _ => None
        }
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(ForeignTarget(t, _), condition) if d.resolved =>
      val cond = toTargetColumn(condition)
      ForeignDmlCommand(s"DELETE FROM ${t.format} ${t.root}",
        resultName(t.format), s =>
          if (t.format == "delta") DeltaInterop.deleteFromDelta(s, t.root, cond)
          else IcebergInterop.deleteFromIceberg(s, t.root, cond))

    case u @ UpdateTable(ForeignTarget(t, _), assignments, condition)
        if u.resolved =>
      val cond = condition.map(toTargetColumn).getOrElse(lit(true))
      val set = assignments.map(a =>
        assignmentName(a, t) -> toTargetColumn(a.value)).toMap
      ForeignDmlCommand(s"UPDATE ${t.format} ${t.root}",
        resultName(t.format), s =>
          if (t.format == "delta") DeltaInterop.updateDelta(s, t.root, cond, set)
          else IcebergInterop.updateIceberg(s, t.root, cond, set))

    case m @ MergeIntoTable(ForeignTarget(t, rel), source, mergeCond,
        matchedActions, notMatchedActions, bySourceActions, withSchemaEvolution)
        if m.resolved =>
      refuseIf(withSchemaEvolution, t,
        "WITH SCHEMA EVOLUTION is not supported on raw foreign roots")
      translateMerge(t, rel, source, mergeCond,
        matchedActions, notMatchedActions, bySourceActions)
  }

  private def resultName(format: String): String =
    if (format == "delta") "version" else "snapshot_id"

  private def refuseIf(cond: Boolean, t: ForeignRootTable, what: String): Unit =
    if (cond) throw new UnsupportedOperationException(
      s"MERGE INTO ${t.name()}: $what — use " +
        s"CALL <cat>.system.${t.format}_merge(path, source, keys) or the " +
        "Scala/Python merge clause API for other shapes")

  /** Target-only expression (DELETE/UPDATE predicates, SET values):
    * resolved attribute references de-resolve to bare quoted names, so
    * the writer's own scan re-binds them against the foreign table. */
  private def toTargetColumn(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private def assignmentName(a: Assignment, t: ForeignRootTable): String =
    a.key match {
      case ar: AttributeReference => ar.name
      case other => throw new UnsupportedOperationException(
        s"UPDATE ${t.name()}: nested-field assignment " +
          s"'${other.sql}' is not supported on raw foreign roots")
    }

  /** MERGE translation into the [[Merge]] clause model shared by
    * mergeDeltaClauses / mergeIcebergClauses. Supported = the SQL
    * shapes whose semantics the clause model expresses exactly:
    * equality-join ON clauses (the keys), UPDATE SET with arbitrary
    * target/source expressions, DELETE, INSERT of full source rows
    * (`INSERT *` or a column list assigning every target column its
    * same-named source column), and NOT MATCHED BY SOURCE
    * UPDATE/DELETE. Anything else refuses with a pointer to the
    * procedure/clause APIs rather than computing something subtly
    * different. */
  private def translateMerge(t: ForeignRootTable, rel: DataSourceV2Relation,
      source: LogicalPlan, mergeCond: Expression,
      matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
      bySourceActions: Seq[MergeAction]): LogicalPlan = {
    val tOut = rel.outputSet
    val sOut = source.outputSet

    // keys: the ON clause must be a conjunction of same-named
    // target=source equalities — the writers join on column names
    val keys = splitConjunctivePredicates(mergeCond).map {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if tOut.contains(l) && sOut.contains(r) &&
            l.name.equalsIgnoreCase(r.name) => l.name
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if sOut.contains(l) && tOut.contains(r) &&
            l.name.equalsIgnoreCase(r.name) => r.name
      case other =>
        refuseIf(cond = true, t, s"ON clause conjunct '${other.sql}' — raw " +
          "foreign-root MERGE joins on same-named key equalities")
        "" // unreachable
    }

    /** Rewrite a clause expression into the writers' name space:
      * target attrs → bare names, source attrs → Merge.source names.
      * `srcBare` flips source attrs to bare names (NOT MATCHED
      * conditions see the source row unprefixed, per the clause
      * model). */
    def clauseExpr(e: Expression, srcBare: Boolean): Column =
      ColumnBridge.column(e.transform {
        case a: AttributeReference if tOut.contains(a) =>
          refuseIf(srcBare, t,
            s"NOT MATCHED condition references target column '${a.name}'")
          UnresolvedAttribute.quoted(a.name)
        case a: AttributeReference if sOut.contains(a) =>
          if (srcBare) UnresolvedAttribute.quoted(a.name)
          else ColumnBridge.expression(Merge.source(a.name))
      })

    /** Is this assignment `col <- same-named source column`? (the
      * `SET *` / `INSERT *` per-column shape) */
    def isIdentity(a: Assignment): Boolean = (a.key, a.value) match {
      case (k: AttributeReference, v: AttributeReference) =>
        sOut.contains(v) && k.name.equalsIgnoreCase(v.name)
      case _ => false
    }

    def updateSet(assignments: Seq[Assignment],
        bySource: Boolean): Map[String, Column] =
      assignments.flatMap { a =>
        val name = assignmentName(a, t)
        // key-column identity assignments (from SET *) are no-ops —
        // the ON equality already guarantees the value; non-identity
        // key assignments would MOVE a row across its match and refuse
        if (keys.exists(_.equalsIgnoreCase(name))) {
          refuseIf(!isIdentity(a), t,
            s"UPDATE assigns merge key '$name' a new value")
          None
        } else Some(name -> clauseExpr(a.value, srcBare = false))
      }.toMap

    val matched: Seq[Merge.MatchedClause] = matchedActions.map {
      case DeleteAction(c) =>
        Merge.MatchedDelete(c.map(clauseExpr(_, srcBare = false)))
      case UpdateAction(c, assigns, _) =>
        val cond = c.map(clauseExpr(_, srcBare = false))
        // full-identity SET (every assignment takes the same-named
        // source value) is the clause model's `SET *` (empty map)
        if (assigns.nonEmpty && assigns.forall(isIdentity))
          Merge.MatchedUpdate(cond, Map.empty)
        else Merge.MatchedUpdate(cond, updateSet(assigns, bySource = false))
      case other =>
        refuseIf(cond = true, t, s"WHEN MATCHED action $other"); null
    }

    val notMatched: Seq[Merge.NotMatchedInsert] = notMatchedActions.map {
      case InsertAction(c, assigns) =>
        refuseIf(!assigns.forall(isIdentity), t,
          "INSERT must take every column from the same-named source " +
            "column (INSERT * / a full aligned column list)")
        refuseIf(assigns.map(assignmentName(_, t).toLowerCase).toSet !=
            t.schema().fieldNames.map(_.toLowerCase).toSet, t,
          "INSERT must cover every target column")
        Merge.NotMatchedInsert(c.map(clauseExpr(_, srcBare = true)))
      case other =>
        refuseIf(cond = true, t, s"WHEN NOT MATCHED action $other"); null
    }

    val bySource: Seq[Merge.BySourceClause] = bySourceActions.map {
      case DeleteAction(c) =>
        Merge.BySourceDelete(c.map(clauseExpr(_, srcBare = false)))
      case UpdateAction(c, assigns, _) =>
        Merge.BySourceUpdate(c.map(clauseExpr(_, srcBare = false)),
          updateSet(assigns, bySource = true))
      case other =>
        refuseIf(cond = true, t, s"WHEN NOT MATCHED BY SOURCE action $other")
        null
    }

    // the writers take the source as a DataFrame carrying exactly the
    // table's columns; extra source columns project away, missing ones
    // refuse (they would silently null-fill inserts)
    val tableCols = t.schema().fieldNames.toSeq
    val srcCols = source.output.map(_.name)
    val missing = tableCols.filterNot(c =>
      srcCols.exists(_.equalsIgnoreCase(c)))
    refuseIf(missing.nonEmpty, t,
      s"source is missing target columns [${missing.mkString(", ")}]")
    val format = t.format
    val root = t.root
    ForeignDmlCommand(s"MERGE INTO $format $root", resultName(format), s => {
      val srcDf = ColumnBridge.ofRows(s, source)
        .select(tableCols.map(col): _*)
      if (format == "delta")
        DeltaInterop.mergeDeltaClauses(srcDf, root, keys,
          matched, notMatched, bySource)
      else
        IcebergInterop.mergeIcebergClauses(srcDf, root, keys,
          matched, notMatched, bySource)
    })
  }
}

/** Driver-side command wrapping one foreign-root DML dispatch; returns
  * the committed version / snapshot id (the same single-row shape the
  * `CALL` procedures return). */
case class ForeignDmlCommand(label: String, resultName: String,
    body: SparkSession => Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference(resultName, LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(body(sparkSession)))
  override def simpleString(maxFields: Int): String = s"ForeignDml $label"
}
