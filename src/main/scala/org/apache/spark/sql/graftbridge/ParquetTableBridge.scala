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
}
