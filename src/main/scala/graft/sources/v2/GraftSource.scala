package graft.sources.v2

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.GraftTable

/** Path-based DSv2 provider — the no-catalog entry point to GraftTable
  * for batch reads, streaming reads AND streaming writes:
  *
  * {{{
  *   spark.read.format("graft.sources.v2.GraftSource").load(path)
  *   spark.readStream.format("graft.sources.v2.GraftSource").load(path)
  *   df.writeStream.format("graft.sources.v2.GraftSource")
  *     .option("checkpointLocation", ckpt).start(path)
  * }}}
  *
  * Reads reuse [[GraftSparkTable]], so the stats-pruned native parquet
  * scan, the commit-log-tailing micro-batch stream (and its
  * `skipChangeCommits` option), and `versionAsOf` all behave exactly as
  * through the SQL catalog. The write side is [[GraftStreamingSink]]. */
class GraftSource extends TableProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {

  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val params = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = params.getOrElse("path", throw new IllegalArgumentException(
      "graft streaming sink needs a path: .start(<table root>)"))
    new GraftStreamingSink(SparkSession.active, path, partitionColumns,
      outputMode)
  }
  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source needs a path: .load(<table root>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = pathOf(options)
    // A missing table is legal here: before falling back to the V1
    // streaming sink, Spark probes the provider's table for
    // STREAMING_WRITE — and a sink target does not exist until batch 0
    // creates it. Reads of the placeholder still fail clearly (below).
    if (!GraftTable.exists(SparkSession.active, p)) return new StructType()
    // the commit log records the schema — one small JSON read, never
    // the snapshot-read machinery (whose per-dir footer inference on
    // rename/transform tables is real I/O) just to take .schema
    val t = GraftTable.load(SparkSession.active, p)
    t.commitAt(t.latestVersion()).schemaStruct
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = pathOf(options)
    if (!GraftTable.exists(SparkSession.active, path))
      // placeholder for the streaming-sink probe: no read/write
      // capabilities, so Spark takes the V1 sink path; any read
      // attempt surfaces the clear missing-table message
      return new Table {
        override def name(): String = s"graft:$path"
        override def schema(): StructType =
          throw new IllegalArgumentException(s"no GraftTable at $path")
        override def capabilities(): util.Set[TableCapability] =
          util.Collections.emptySet()
      }
    val pinned = Option(options.get("versionasof")).map(_.toInt)
    new GraftSparkTable(SparkSession.active, path,
      Identifier.of(Array.empty, path), pinned)
  }

  override def supportsExternalMetadata(): Boolean = false
}

/** Native streaming sink into a GraftTable — the Delta streaming-sink
  * analog (`writeStream.format(...).start(path)`; Delta's own sink is
  * the same V1 `Sink` shape). First batch creates the table (with the
  * writer's `partitionBy` columns, identity or transform specs); every
  * micro-batch then lands as ONE table commit stamped with the
  * streaming query id + batch id — `stream-append#<queryId>#<id>`
  * (Append mode) or `stream-complete#<queryId>#<id>` (Complete mode,
  * an overwrite) — so a batch replayed after a crash
  * between the table commit and the checkpoint write is detected in
  * the history and skipped: exactly-once end to end, the Delta
  * txn-app-id/version idiom. Update mode needs row-level merge
  * semantics the append-shaped sink cannot provide — refused loudly
  * (use foreachBatch + `GraftTable.merge`, the CDC composition h6
  * demonstrates).
  *
  * Scale shape: the data path is one distributed parquet write per
  * micro-batch (the same write `table.append` plans); the
  * exactly-once probe is one O(#commits) driver-side history read. */
class GraftStreamingSink(spark: SparkSession, path: String,
    partitionBy: Seq[String],
    outputMode: org.apache.spark.sql.streaming.OutputMode)
  extends org.apache.spark.sql.execution.streaming.Sink {

  import org.apache.spark.sql.streaming.OutputMode
  require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
    s"graft streaming sink supports Append and Complete output modes, got " +
      s"$outputMode — for Update-mode upserts use foreachBatch with " +
      "GraftTable.merge")

  override def name(): String = s"GraftSink[$path]"

  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = synchronized {
    import org.apache.spark.sql.functions.col
    val batch = org.apache.spark.sql.graftbridge.ParquetTableBridge.asBatchDF(data)
    // The marker carries the STREAMING QUERY ID (stable across restarts
    // from the same checkpoint, fresh for a new checkpoint — Spark sets
    // it as a local property on the stream thread; the Delta sink reads
    // it the same way for its txn appId). Without it, a NEW query
    // (reprocessing into an existing target after dropping its
    // checkpoint) would collide with a previous query's batch ids and
    // silently skip every batch. Legacy id-less markers are still
    // probed so pre-upgrade tables keep their replay protection.
    val queryId = Option(
      spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
    val kind =
      if (outputMode == OutputMode.Complete()) "stream-complete"
      else "stream-append"
    val marker = s"$kind#${queryId.map(q => s"$q#").getOrElse("")}$batchId"
    val legacyMarker = s"$kind#$batchId"
    // the CREATE commit carries the schema only (zero rows): every
    // batch's DATA — including batch 0's — lands under its own marker,
    // or a replay of batch 0 after a crash between the create-with-data
    // commit and the checkpoint write would double-append
    if (!GraftTable.exists(spark, path))
      GraftTable.create(spark, path, batch.limit(0), partitionBy): Unit
    val t = GraftTable.load(spark, path)
    // Legacy id-less markers are honored ONLY while the table carries no
    // query-scoped markers at all (a genuinely pre-upgrade sink target):
    // once any query has written scoped markers, a NEW query whose batch
    // ids happen to collide with old legacy markers must not silently
    // skip its batches — the exact data-loss mode the query id prevents.
    val streamOps = t.history().select("operation")
      .filter(col("operation").startsWith("stream-"))
      .collect().map(_.getString(0))
    if (streamOps.contains(marker)) return
    val anyScoped = streamOps.exists(op =>
      (op.startsWith("stream-append#") || op.startsWith("stream-complete#")) &&
        op.count(_ == '#') >= 2)
    if (!anyScoped && streamOps.contains(legacyMarker)) return
    if (outputMode == OutputMode.Complete()) t.overwriteBatch(marker, batch): Unit
    else t.appendBatch(marker, batch): Unit
  }
}
