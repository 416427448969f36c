package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Clause model for foreign-table MERGE — the full
  * `MERGE INTO … WHEN [NOT] MATCHED [BY SOURCE] [AND cond] THEN …`
  * surface of [[DeltaInterop.mergeDeltaClauses]] and
  * [[IcebergInterop.mergeIcebergClauses]] (the reference notebooks'
  * conditional-merge shapes, e.g. 03_delta_demo.ipynb's
  * `WHEN MATCHED AND s.op = 'D' THEN DELETE`).
  *
  * Name resolution inside clause conditions and SET expressions:
  * bare column names are the TARGET row's (pre-merge) values; the
  * SOURCE row's values are reached through [[Merge.source]]. Clauses
  * of one family apply FIRST-MATCH-WINS in the order given, exactly
  * like SQL MERGE; a row matching no clause of its family carries
  * forward unchanged.
  *
  *  - [[Merge.MatchedUpdate]] — `WHEN MATCHED [AND cond] THEN UPDATE`;
  *    an empty `set` is `SET *` (every non-key column takes the source
  *    value), a non-empty one is a partial `SET col = expr, …`.
  *  - [[Merge.MatchedDelete]] — `WHEN MATCHED [AND cond] THEN DELETE`.
  *  - [[Merge.NotMatchedInsert]] — `WHEN NOT MATCHED [AND cond] THEN
  *    INSERT *`; the condition sees the SOURCE row under bare names.
  *  - [[Merge.BySourceUpdate]] / [[Merge.BySourceDelete]] —
  *    `WHEN NOT MATCHED BY SOURCE [AND cond] THEN …`; conditions see
  *    the TARGET row only (there is no source row).
  */
object Merge {

  /** Internal alias prefix source columns ride under in the merge
    * join. */
  private[sources] val SrcPrefix = "__src_"

  /** The SOURCE row's `name` column, for matched-clause conditions and
    * SET values (e.g. `Merge.source("qty") - col("qty")`). */
  def source(name: String): Column = col(SrcPrefix + name)

  sealed trait MatchedClause { def condition: Option[Column] }

  /** WHEN MATCHED [AND condition] THEN UPDATE SET … — empty `set` =
    * `SET *`. */
  final case class MatchedUpdate(condition: Option[Column] = None,
      set: Map[String, Column] = Map.empty) extends MatchedClause

  /** WHEN MATCHED [AND condition] THEN DELETE. */
  final case class MatchedDelete(condition: Option[Column] = None)
      extends MatchedClause

  /** WHEN NOT MATCHED [AND condition] THEN INSERT * — the condition
    * sees the source row under bare column names. */
  final case class NotMatchedInsert(condition: Option[Column] = None)

  sealed trait BySourceClause { def condition: Option[Column] }

  /** WHEN NOT MATCHED BY SOURCE [AND condition] THEN UPDATE SET … —
    * `set` must be explicit (there is no source row to take values
    * from). */
  final case class BySourceUpdate(condition: Option[Column],
      set: Map[String, Column]) extends BySourceClause

  /** WHEN NOT MATCHED BY SOURCE [AND condition] THEN DELETE — the
    * full-sync shape (target rows absent from the source go away). */
  final case class BySourceDelete(condition: Option[Column] = None)
      extends BySourceClause
}

/** Py4J-friendly constructors for the [[Merge]] clause model — scala
  * Options and Maps are awkward to build from Python, so each builder
  * takes a nullable condition Column and parallel name/value arrays.
  * The Python module's `merge_delta_clauses`/`merge_iceberg_clauses`
  * are thin wrappers over [[runDelta]]/[[runIceberg]]. */
object MergeBridge {
  private def opt(c: Column): Option[Column] = Option(c)
  private def setMap(names: Array[String],
      values: Array[AnyRef]): Map[String, Column] = {
    require(names.length == values.length,
      "SET names and values must align")
    names.zip(values.map(_.asInstanceOf[Column])).toMap
  }

  def matchedUpdate(condition: Column, setNames: Array[String],
      setValues: Array[AnyRef]): Merge.MatchedUpdate =
    Merge.MatchedUpdate(opt(condition), setMap(setNames, setValues))
  def matchedDelete(condition: Column): Merge.MatchedDelete =
    Merge.MatchedDelete(opt(condition))
  def notMatchedInsert(condition: Column): Merge.NotMatchedInsert =
    Merge.NotMatchedInsert(opt(condition))
  def bySourceUpdate(condition: Column, setNames: Array[String],
      setValues: Array[AnyRef]): Merge.BySourceUpdate =
    Merge.BySourceUpdate(opt(condition), setMap(setNames, setValues))
  def bySourceDelete(condition: Column): Merge.BySourceDelete =
    Merge.BySourceDelete(opt(condition))

  /** The SOURCE row's `name` column (Python: `merge_source("qty")`). */
  def source(name: String): Column = Merge.source(name)

  def runDelta(source: org.apache.spark.sql.DataFrame, path: String,
      keys: Array[String], matched: Array[AnyRef],
      notMatched: Array[AnyRef],
      notMatchedBySource: Array[AnyRef]): Long =
    DeltaInterop.mergeDeltaClauses(source, path, keys.toSeq,
      matched.toSeq.map(_.asInstanceOf[Merge.MatchedClause]),
      notMatched.toSeq.map(_.asInstanceOf[Merge.NotMatchedInsert]),
      notMatchedBySource.toSeq.map(_.asInstanceOf[Merge.BySourceClause]))

  def runIceberg(source: org.apache.spark.sql.DataFrame, path: String,
      keys: Array[String], matched: Array[AnyRef],
      notMatched: Array[AnyRef],
      notMatchedBySource: Array[AnyRef]): Long =
    IcebergInterop.mergeIcebergClauses(source, path, keys.toSeq,
      matched.toSeq.map(_.asInstanceOf[Merge.MatchedClause]),
      notMatched.toSeq.map(_.asInstanceOf[Merge.NotMatchedInsert]),
      notMatchedBySource.toSeq.map(_.asInstanceOf[Merge.BySourceClause]))
}
