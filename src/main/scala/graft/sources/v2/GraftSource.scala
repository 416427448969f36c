package graft.sources.v2

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.GraftTable

/** Path-based DSv2 provider — the no-catalog entry point to GraftTable
  * for both batch and streaming reads:
  *
  * {{{
  *   spark.read.format("graft.sources.v2.GraftSource").load(path)
  *   spark.readStream.format("graft.sources.v2.GraftSource").load(path)
  * }}}
  *
  * Reuses [[GraftSparkTable]], so the stats-pruned native parquet scan,
  * the commit-log-tailing micro-batch stream (and its
  * `skipChangeCommits` option), and `versionAsOf` all behave exactly as
  * through the SQL catalog. */
class GraftSource extends TableProvider {
  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source needs a path: .load(<table root>)"))
    require(GraftTable.exists(SparkSession.active, p), s"no GraftTable at $p")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // the commit log records the schema — one small JSON read, never
    // the snapshot-read machinery (whose per-dir footer inference on
    // rename/transform tables is real I/O) just to take .schema
    val t = GraftTable.load(SparkSession.active, pathOf(options))
    t.commitAt(t.latestVersion()).schemaStruct
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = pathOf(options)
    val pinned = Option(options.get("versionasof")).map(_.toInt)
    new GraftSparkTable(SparkSession.active, path,
      Identifier.of(Array.empty, path), pinned)
  }

  override def supportsExternalMetadata(): Boolean = false
}
