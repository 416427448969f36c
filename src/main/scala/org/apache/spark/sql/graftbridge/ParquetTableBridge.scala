package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge into Spark's internal DSv2 parquet table.
  *
  * The graft SQL catalog delegates its read path to [[ParquetTable]] —
  * the same scan implementation `spark.read.parquet` plans through — so
  * catalog tables get the full native read stack for free: vectorized
  * parquet reader, filter pushdown, column pruning, partition discovery
  * and pruning across the snapshot's data directories. Only the class
  * construction needs `org.apache.spark.sql`-internal access, hence
  * this one-line bridge (the same pattern as [[ColumnBridge]]).
  */
object ParquetTableBridge {
  def scanBuilder(spark: SparkSession, name: String, paths: Seq[String],
                  schema: StructType, options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetTable(name, spark, options, paths, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options)

  /** Re-plan a streaming micro-batch Dataset as a BATCH DataFrame over
    * its already-planned physical rows — the V1 `Sink.addBatch`
    * contract (the ForeachBatchSink idiom): the sink must consume the
    * incremental execution's RDD, never re-analyze the streaming plan
    * as a fresh query. */
  def asBatchDF(data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = data.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      ds.queryExecution.toRdd, ds, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, node)
  }

  /** A native parquet DSv2 Write targeting `path` — the physical write
    * engine (executor-side writers + file commit protocol) for graft's
    * SQL row-level operations; the caller wraps its BatchWrite.commit
    * to land the table-format commit. */
  def parquetWrite(spark: SparkSession, path: String,
                   info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.Write =
    ParquetTable("graft-rewrite", spark, info.options(), Seq(path),
      Some(info.schema()), classOf[ParquetFileFormat])
      .newWriteBuilder(info).build()
}

/** Stats-skipping scan builder: intercepts the catalyst filter pushdown
  * (the file-source pushdown channel, [[SupportsPushDownCatalystFilters]])
  * to drop whole data directories whose min/max stats preclude any
  * match, then delegates the surviving paths to the native parquet scan
  * builder — which re-pushes the same filters for row-group pruning.
  * All filters are reported residual, so Spark keeps its own Filter
  * node: pruning is a pure I/O optimization, never a semantic change.
  *
  * `prune` maps the pushed conjuncts to the surviving directory paths
  * (the caller closes over its commit metadata + DirStats).
  */
class StatsPruningScanBuilder(
    spark: SparkSession, name: String, schema: StructType,
    options: CaseInsensitiveStringMap,
    prune: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => Seq[String])
  extends ScanBuilder
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private var filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil
  private var required: StructType = schema

  override def pushFilters(
      fs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    filters = fs
    fs // everything residual — correctness never depends on the skip
  }

  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): org.apache.spark.sql.connector.read.Scan = {
    val paths = prune(filters)
    val delegate = ParquetTable(name, spark, options, paths, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options)
    delegate.pushFilters(filters)
    delegate.pruneColumns(required)
    delegate.build()
  }
}
