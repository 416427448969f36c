package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dataset lineage extraction — the library-side analog of the
  * reference's OpenLineage → DataHub integration
  * (reference: docker/spark-notebook/05_datahub_lineage_demo.ipynb,
  * connector.py enable_lineage): derive which source tables feed a
  * derived DataFrame and record that as a metric event, instead of
  * attaching an external listener.
  */
object Lineage {

  /** Distinct source locations (parquet roots / DSv2 tables) feeding
    * `df`. Covers V1 file scans, DSv2 scans (BatchScanExec — including
    * this library's own GraftCatalog tables, which surface their table
    * identity via Scan.description), cached relations (the inputs of
    * the plan that BUILT the cache), and V1Scan adapters (the
    * rename-aware GraftSparkTable path compiles to an RDD scan whose
    * name carries the scan identity). */
  def inputsOf(df: DataFrame): Seq[String] = inputsOf(df.queryExecution)

  /** Same derivation over an already-executed QueryExecution — the form
    * [[OpenLineageListener]] uses, where there is no Dataset handle. */
  def inputsOf(qe: org.apache.spark.sql.execution.QueryExecution): Seq[String] = {
    val plan = qe.executedPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        // an EXECUTED adaptive plan materializes exchange subtrees as
        // QueryStageExec leaves (children = Nil) — descend into the
        // staged plan or every scan below an exchange is invisible
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
              fs.fileIndex.rootPaths.map(_.toString)
            case s => Seq(s.description())
          }
        case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scans(c.relation.cachedPlan)
        case other =>
          other.children.flatMap(scans) ++
            other.subqueries.flatMap(scans)
      }
    scans(plan).distinct.sorted
  }

  /** Leaf source relations of an ANALYZED logical plan. The physical
    * walk above misses sources whose execution is opaque to the plan
    * tree (LeafRunnableCommands hold their query as innerChildren, not
    * children) — the listener unions both derivations. */
  def logicalInputsOf(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation, SaveIntoDataSourceCommand}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    def walk(p: LogicalPlan): Seq[String] = p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case other => Seq(other.toString)
      }
      case d: DataSourceV2Relation => Seq(d.table.name)
      case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        Seq(h.tableMeta.qualifiedName)
      case s: SaveIntoDataSourceCommand => walk(s.query)
      case other =>
        other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
    }
    walk(plan).distinct.sorted
  }

  /** Output datasets of a write command's analyzed plan: V1 file
    * inserts, DSv1 saves, V2 write commands (append / overwrite /
    * replace — the shape every graft catalog write takes), and
    * CTAS into the session catalog. Empty for pure reads. */
  def outputsOf(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand
    import org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand
    import org.apache.spark.sql.execution.datasources.{InsertIntoHadoopFsRelationCommand, SaveIntoDataSourceCommand}
    plan.collect {
      case i: InsertIntoHadoopFsRelationCommand => Seq(i.outputPath.toString)
      case s: SaveIntoDataSourceCommand => s.options.get("path").toSeq
      case c: CreateDataSourceTableAsSelectCommand =>
        Seq(c.table.identifier.unquotedString)
      case w: V2WriteCommand => Seq(w.table.name)
    }.flatten.distinct.sorted
  }

  /** The written query inside an analyzed write command — the plan whose
    * output schema is what lands in the output dataset. None for pure
    * reads. */
  def writeQueryOf(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand
    import org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand
    import org.apache.spark.sql.execution.datasources.{InsertIntoHadoopFsRelationCommand, SaveIntoDataSourceCommand}
    plan.collectFirst {
      case i: InsertIntoHadoopFsRelationCommand => i.query
      case s: SaveIntoDataSourceCommand => s.query
      case c: CreateDataSourceTableAsSelectCommand => c.query
      case w: V2WriteCommand => w.query
    }
  }

  /** Dataset id of a leaf source relation (the same identities
    * [[logicalInputsOf]] reports), None for non-leaf/non-source nodes. */
  private def leafDatasetId(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Option[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.headOption.map(_.toString)
        case other => Some(other.toString)
      }
      case d: DataSourceV2Relation => Some(d.table.name)
      case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        Some(h.tableMeta.qualifiedName)
      case _ => None
    }
  }

  /** (dataset id → schema) for every leaf source relation of an
    * analyzed plan — feeds the OpenLineage `schema` dataset facet. */
  def inputSchemasOf(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      Map[String, org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.execution.datasources.SaveIntoDataSourceCommand
    def walk(p: LogicalPlan): Seq[(String, org.apache.spark.sql.types.StructType)] =
      leafDatasetId(p) match {
        case Some(id) =>
          Seq(id -> org.apache.spark.sql.types.StructType(
            p.output.map(a =>
              org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))))
        case None => p match {
          case s: SaveIntoDataSourceCommand => walk(s.query)
          case other =>
            other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
        }
      }
    walk(plan).toMap
  }

  /** Transitive column origins of an analyzed plan: for every output
    * attribute of `plan`, the set of (leaf dataset id, source column)
    * it derives from — the OpenLineage `columnLineage` facet's payload.
    *
    * Bottom-up fixpoint-free walk: leaves originate their own columns;
    * Alias-introducing nodes (Project/Aggregate/Window — any node, via
    * its expression list) attribute the alias to the union of origins
    * of every attribute its child expression references; Union merges
    * positionally; everything else passes attributes through by exprId.
    * Purely structural — never executes anything, safe inside a
    * listener callback. */
  def columnOriginsOf(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      Seq[(String, Seq[(String, String)])] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Union}
    type Origins = Map[ExprId, Set[(String, String)]]
    def merge(ms: Seq[Origins]): Origins =
      ms.flatten.groupMapReduce(_._1)(_._2)(_ ++ _)
    def walk(p: LogicalPlan): Origins = leafDatasetId(p) match {
      case Some(id) =>
        p.output.map(a => a.exprId -> Set(id -> a.name)).toMap
      case None => p match {
        case u: Union =>
          val childMaps = u.children.map(walk)
          val positional = u.output.zipWithIndex.map { case (a, i) =>
            a.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
              if (i < c.output.length) m.getOrElse(c.output(i).exprId, Set.empty)
              else Set.empty[(String, String)]
            }.toSet
          }.toMap
          merge(childMaps :+ positional)
        case other =>
          val childOrigins = merge(other.children.map(walk))
          val aliases = other.expressions.flatMap(_.collect { case a: Alias => a })
            .map { a =>
              a.exprId -> a.child.collect { case at: Attribute => at }
                .flatMap(at => childOrigins.getOrElse(at.exprId, Set.empty)).toSet
            }.toMap
          childOrigins ++ aliases
      }
    }
    val all = walk(plan)
    plan.output.map(a => a.name -> all.getOrElse(a.exprId, Set.empty).toSeq.sorted)
  }

  /** Log a lineage edge set (inputs → outputTable) to the activity log,
    * one record with the inputs in `extra`. */
  def record(logger: MetricsLogger, df: DataFrame, outputTable: String,
             layer: String, project: String, datasetYear: Int): String = {
    val inputs = inputsOf(df)
    logger.log(MetricRecord.build(
      layer, project, datasetYear,
      description = s"lineage: ${inputs.size} inputs -> $outputTable",
      value = inputs.size.toDouble, unit = "tables", function = "lineage",
      tableName = Some(outputTable),
      extra = inputs.zipWithIndex.map { case (p, i) => s"input_$i" -> p }.toMap))
  }

  /** Emit an OpenLineage-shaped run event into the activity log — the
    * reference's DataHub surface (05_datahub_lineage_demo.ipynb emits
    * OpenLineage RunEvents: run+job identity, input/output dataset
    * lists, producer). One record carries the whole event: job and run
    * identity, every input dataset (derived from the physical plan's
    * scans), and the output identifier. The `ol_*` columns ride the
    * activity log's schema evolution (MetricsLogger.append +
    * mergeSchema read), so metric records and lineage events share one
    * log, like the reference's single activity table. */
  def emitOpenLineage(logger: MetricsLogger, df: DataFrame, jobName: String,
                      outputId: String, layer: String, project: String,
                      datasetYear: Int, eventType: String = "COMPLETE"): String = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val inputs = inputsOf(df)
    val base = MetricRecord.build(
      layer, project, datasetYear,
      description = s"openlineage: $jobName -> $outputId",
      value = inputs.size.toDouble, unit = "datasets", function = "openlineage",
      jobName = Some(jobName), tableName = Some(outputId))
    logger.append(Seq(base).toDS().toDF()
      .withColumn("ol_event_type", lit(eventType))
      .withColumn("ol_job_namespace", lit("graft"))
      .withColumn("ol_job_name", lit(jobName))
      .withColumn("ol_run_id", lit(base.run_id))
      .withColumn("ol_inputs", typedLit(inputs))
      .withColumn("ol_outputs", typedLit(Seq(outputId)))
      .withColumn("ol_producer", lit("graft/lineage")))
    base.run_id
  }
}
