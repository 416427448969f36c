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

  /** Distinct source locations (parquet roots) feeding `df`. */
  def inputsOf(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
        case other =>
          other.children.flatMap(scans) ++
            other.subqueries.flatMap(scans)
      }
    scans(plan).distinct.sorted
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
}
