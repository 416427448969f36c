package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5_local_supplier(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Windowed.queries ++ Aggregations.queries ++
      JoinShapes.queries ++ TextDates.queries ++ Events.queries ++
      Quality.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ LakehouseOps.queries ++
      graft.streaming.Streams.queries ++ Multimodal.queries ++
      Pipeline.queries ++ SqlSurface.queries ++ Skew.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Windowed.oracles ++ Aggregations.oracles ++
      JoinShapes.oracles ++ TextDates.oracles ++ Events.oracles ++
      Quality.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ LakehouseOps.oracles ++
      graft.streaming.Streams.oracles ++ Multimodal.oracles ++
      Pipeline.oracles ++ SqlSurface.oracles ++ Skew.oracles
}
