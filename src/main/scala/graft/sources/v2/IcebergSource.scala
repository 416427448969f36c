package graft.sources.v2

import java.util

import org.apache.avro.generic.GenericRecord
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.graftbridge.ParquetTableBridge
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.IcebergInterop

/** FOREIGN (or mirrored) Iceberg tables as a Spark data source,
  * dependency-free — the streaming half of the Iceberg interop (the
  * reference's primary format: docker/spark-notebook/02_iceberg_demo
  * .ipynb; production pipelines tail such tables with
  * `spark.readStream`):
  *
  * {{{
  *   spark.read.format("graft.sources.v2.IcebergSource").load(path)   // = readIceberg
  *   spark.readStream.format("graft.sources.v2.IcebergSource")
  *     .option("skipChangeCommits", "true").load(path)                // tail snapshots
  * }}}
  *
  * Contract (the [[DeltaSource]] / graft-source shape over Iceberg
  * snapshots): offset = snapshot id, ordered by the metadata's
  * snapshots array (append-ordered by writers; the mirror appends one
  * per graft commit). Batch 0 is the complete snapshot at stream
  * start; every later batch is exactly the data files ADDED by the
  * `append`-operation snapshots in between — any other operation
  * (overwrite, delete, replace/compaction, or a snapshot carrying
  * delete manifests) fails loudly unless `skipChangeCommits=true`
  * skips that whole snapshot. Mid-stream schema changes refuse
  * non-retryably. Streaming scans read every declared column FROM the
  * data files (verified by a footer probe per batch) — tables whose
  * identity partition values live only in manifest metadata
  * (hive-migrated layouts) refuse toward batch `readIceberg`, which
  * implements the Column Projection rule. An expired start snapshot
  * (expire_snapshots outran the consumer) refuses with a restart
  * message.
  *
  * Scale shape: planning is O(#manifests + #files) driver-side
  * metadata per batch; the data path is the native vectorized parquet
  * reader over only the added files. */
class IcebergSource extends TableProvider
  with org.apache.spark.sql.sources.StreamSourceProvider {
  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "iceberg source needs a path: .load(<table root>)"))

  private def cdfOf(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("readChangeFeed")).exists(_.toBoolean)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = pathOf(options)
    val (_, md) = IcebergInterop.currentMetadata(spark, path)
    val base = IcebergInterop.fromIcebergStruct(
      IcebergInterop.currentSchemaNode(md, path), path)
    if (cdfOf(options)) IcebergSource.cdfSchema(base) else base
  }

  override def getTable(tableSchema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = pathOf(options)
    val cdf = cdfOf(options)
    new Table with SupportsRead {
      override def name(): String = s"iceberg:$path"
      override def schema(): StructType = tableSchema
      // changelog reads advertise NO micro-batch capability: streaming
      // CDF rides the V1 Source fallback below (the DeltaSource shape)
      override def capabilities(): util.Set[TableCapability] =
        if (cdf) util.EnumSet.of(TableCapability.BATCH_READ)
        else util.EnumSet.of(TableCapability.BATCH_READ,
          TableCapability.MICRO_BATCH_READ)
      override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = new V1Scan {
            override def readSchema(): StructType = tableSchema
            override def toMicroBatchStream(checkpointLocation: String)
                : MicroBatchStream =
              new IcebergMicroBatchStream(SparkSession.active, path,
                tableSchema, opts)
            override def toV1TableScan[T <: BaseRelation with TableScan](
                context: SQLContext): T =
              new BaseRelation with TableScan {
                override def sqlContext: SQLContext = context
                override def schema: StructType = readSchema()
                override def buildScan(): RDD[Row] =
                  if (!cdf)
                    IcebergInterop.readIceberg(SparkSession.active, path).rdd
                  else {
                    // batch changelog: startingSnapshotId (exclusive,
                    // required) .. endingSnapshotId (default current)
                    val from = Option(opts.get("startingsnapshotid"))
                      .getOrElse(throw new IllegalArgumentException(
                        "batch readChangeFeed needs startingSnapshotId " +
                          "(exclusive)")).toLong
                    val to = Option(opts.get("endingsnapshotid"))
                      .map(_.toLong)
                    IcebergInterop.readIcebergChangelog(
                      SparkSession.active, path, from, to).rdd
                  }
              }.asInstanceOf[T]
          }
        }
    }
  }

  // ---- V1 streaming fallback: changelog micro-batches (see
  // DeltaSource for why sourceSchema must answer for both modes) ----
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val params = parameters.map {
      case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v
    }
    val path = params.getOrElse("path", throw new IllegalArgumentException(
      "iceberg source needs a path: .load(<table root>)"))
    val spark = sqlContext.sparkSession
    val (_, md) = IcebergInterop.currentMetadata(spark, path)
    val base = IcebergInterop.fromIcebergStruct(
      IcebergInterop.currentSchemaNode(md, path), path)
    if (params.get("readchangefeed").exists(_.toBoolean))
      ("iceberg-cdf", IcebergSource.cdfSchema(base))
    else ("iceberg", base)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    require(parameters.exists { case (k, v) =>
      k.equalsIgnoreCase("readChangeFeed") && v.toBoolean
    }, "the V1 streaming path of IcebergSource serves only " +
      "readChangeFeed=true reads — plain streaming rides the " +
      "micro-batch scan")
    new IcebergCdfStreamSource(sqlContext.sparkSession, parameters)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object IcebergSource {
  /** The changelog read schema: table columns plus the change
    * metadata columns [[IcebergInterop.readIcebergChangelog]] tags. */
  private[v2] def cdfSchema(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_snapshot_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_change_ordinal",
        org.apache.spark.sql.types.IntegerType)))
}

/** Streaming CHANGELOG over an Iceberg table
  * (`option("readChangeFeed", "true")`) — the Iceberg twin of
  * [[DeltaCdfStreamSource]]: batch 0 is the complete snapshot at
  * stream start emitted as `insert` rows (ordinal 0), and every later
  * micro-batch is [[IcebergInterop.readIcebergChangelog]] over the
  * snapshots in between — appends as inserts, merge-on-read and
  * copy-on-write change snapshots DECODED into insert/delete rows
  * instead of refusing (compactions stay invisible).
  * `startingSnapshotId` (id, or "latest") skips batch 0 and streams
  * changes strictly after that snapshot. Offsets are snapshot ids
  * (durable in the checkpoint); an expired start refuses loudly with
  * a restart message, like the batch reader. */
class IcebergCdfStreamSource(spark: SparkSession,
    parameters: Map[String, String])
    extends org.apache.spark.sql.execution.streaming.Source {
  private val params =
    parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
  private val path = params.getOrElse("path",
    throw new IllegalArgumentException(
      "iceberg CDF source needs a path: .load(<table root>)"))

  /** The CURRENT branch head (main ref / current-snapshot-id) — after
    * a rollback the snapshots ARRAY still tails with abandoned
    * commits, which are not on the stream's branch. */
  private def headId(): Long = {
    val (_, md) = IcebergInterop.currentMetadata(spark, path)
    IcebergInterop.currentHeadId(md)
  }

  private val startingSnapshotId: Option[Long] =
    params.get("startingsnapshotid").map {
      case "latest" => headId()
      case v => v.toLong
    }

  override val schema: StructType = {
    val (_, md) = IcebergInterop.currentMetadata(spark, path)
    IcebergSource.cdfSchema(IcebergInterop.fromIcebergStruct(
      IcebergInterop.currentSchemaNode(md, path), path))
  }

  private def snapOf(
      o: org.apache.spark.sql.execution.streaming.Offset): Long =
    o.json.trim.toLong

  override def getOffset
      : Option[org.apache.spark.sql.execution.streaming.Offset] = {
    val latest = headId()
    if (latest < 0) None
    else if (startingSnapshotId.contains(latest)) None
    else Some(IcebergCdfOffset(latest))
  }

  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val endId = snapOf(end)
    val df = start.map(snapOf).orElse(startingSnapshotId) match {
      case Some(s) if s >= 0 && s != endId =>
        IcebergInterop.readIcebergChangelog(spark, path, s, Some(endId))
      case Some(s) if s >= 0 => // s == endId: nothing new
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case _ =>
        // batch 0 (fresh stream, or "latest" pinned on a then-empty
        // table): the complete snapshot at `end` as inserts
        IcebergInterop.readIcebergInternal(spark, path, Some(endId), None,
            withLineage = false)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_snapshot_id", lit(endId))
          .withColumn("_change_ordinal", lit(0))
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.asStreamingDataFrame(
      df.select(schema.fieldNames.map(col).toSeq: _*))
  }

  override def stop(): Unit = ()
}

/** V1 stream offset = Iceberg snapshot id (bare number JSON,
  * restart-safe through the checkpoint's SerializedOffset
  * round-trip). */
case class IcebergCdfOffset(snapshotId: Long)
    extends org.apache.spark.sql.execution.streaming.Offset {
  override def json: String = snapshotId.toString
}

/** Stream offset = Iceberg snapshot id (-1 = nothing processed). */
case class IcebergSnapshotOffset(snapshotId: Long) extends Offset {
  override def json: String = s"""{"snapshotId":$snapshotId}"""
}

object IcebergSnapshotOffset {
  private val V = "\"snapshotId\"\\s*:\\s*(-?\\d+)".r
  def fromJson(json: String): IcebergSnapshotOffset =
    IcebergSnapshotOffset(V.findFirstMatchIn(json).getOrElse(
      throw new IllegalArgumentException(s"bad iceberg offset: $json"))
      .group(1).toLong)
}

/** Micro-batch stream tailing an Iceberg table's snapshot history —
  * see [[IcebergSource]] for the contract. */
class IcebergMicroBatchStream(spark: SparkSession, path: String,
    schema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow: drain exactly the snapshots present at
    * start, in maxSnapshotsPerTrigger-bounded batches, then stop. */
  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(history().lastOption.getOrElse(-1L))

  import IcebergInterop.{currentMetadata, fieldOpt, longOf, readAvro, readBytes, refuse}

  private val skipChangeCommits =
    Option(options.get("skipchangecommits")).exists(_.toBoolean)
  private val maxSnapshotsPerTrigger =
    Option(options.get("maxsnapshotspertrigger")).map(_.toInt)
  /** Byte-based admission: cap each micro-batch by the admitted
    * snapshots' `added-files-size` summary bytes (the field every
    * Iceberg writer stamps), not their COUNT — skewed snapshot sizes
    * make a count-bounded catch-up batch arbitrarily large. At least
    * one snapshot always admits; composes with maxSnapshotsPerTrigger
    * (tighter wins) and AvailableNow. A snapshot missing the summary
    * field admits as 0 bytes (conservative toward progress). */
  private val maxBytesPerTrigger =
    Option(options.get("maxbytespertrigger")).map(_.toLong)

  /** snapshot id → added-files-size, from the metadata's snapshots
    * array (driver-side, already parsed for history()). */
  private def addedBytes(): Map[Long, Long] = {
    val (_, md) = currentMetadata(spark, path)
    if (!md.has("snapshots")) return Map.empty
    val it = md.get("snapshots").elements()
    val b = Map.newBuilder[Long, Long]
    while (it.hasNext) {
      val s = it.next()
      b += s.get("snapshot-id").asLong() ->
        s.path("summary").path("added-files-size").asLong(0L)
    }
    b.result()
  }

  /** Snapshot ids in history order: the CURRENT branch's ancestor
    * chain (oldest→newest), walked via parent-snapshot-id from the
    * main-ref / current head — never the raw snapshots array, whose
    * tail still carries commits abandoned by a rollback. Re-read per
    * call so the stream sees snapshots landed after it started. */
  private def history(): Seq[Long] = {
    val (_, md) = currentMetadata(spark, path)
    IcebergInterop.ancestorChainOf(md, IcebergInterop.currentHeadId(md))
  }

  /** `startingSnapshotId`: skip the initial snapshot scan and stream
    * appends AFTER this retained snapshot (exclusive) — the Iceberg
    * twin of Delta's startingVersion. "latest" = future appends only. */
  private val startingSnapshotId: Option[Long] =
    Option(options.get("startingsnapshotid")).map {
      case "latest" => history().lastOption.getOrElse(-1L)
      case v => v.toLong
    }

  override def initialOffset(): Offset =
    IcebergSnapshotOffset(startingSnapshotId.getOrElse(-1L))
  override def latestOffset(): Offset =
    IcebergSnapshotOffset(history().lastOption.getOrElse(-1L))
  override def reportLatestOffset(): Offset = latestOffset()
  override def deserializeOffset(json: String): Offset =
    IcebergSnapshotOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxSnapshotsPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  private def snapCap(limit: ReadLimit): Option[Int] = limit match {
    case f: ReadMaxFiles => Some(f.maxFiles)
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(snapCap).minOption
    case _: ReadAllAvailable => maxSnapshotsPerTrigger
    case _ => maxSnapshotsPerTrigger
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val hist0 = history()
    val hist = availableNowEnd match {
      case Some(end) if end >= 0 =>
        val i = hist0.indexOf(end)
        if (i >= 0) hist0.take(i + 1) else hist0
      case Some(_) => Nil
      case None => hist0
    }
    if (hist.isEmpty) return IcebergSnapshotOffset(-1L)
    val s = start.asInstanceOf[IcebergSnapshotOffset].snapshotId
    val startIdx = if (s >= 0) hist.indexOf(s) else -1
    if (s >= 0 && startIdx < 0) return IcebergSnapshotOffset(hist.last)
    val countIdx = snapCap(limit) match {
      case Some(n) if s >= 0 => math.min(hist.size - 1, startIdx + n)
      case _ => hist.size - 1
    }
    val endIdx = maxBytesPerTrigger match {
      // batch 0 (the initial snapshot state) stays indivisible; byte
      // admission governs the per-snapshot tail
      case Some(budget) if s >= 0 =>
        val bytes = addedBytes()
        var i = startIdx
        var acc = 0L
        var stop = false
        while (!stop && i < countIdx) {
          val b = bytes.getOrElse(hist(i + 1), 0L)
          if (i > startIdx && acc + b > budget) stop = true
          else { acc += b; i += 1; if (acc >= budget) stop = true }
        }
        i
      case _ => countIdx
    }
    IcebergSnapshotOffset(hist(endIdx))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IcebergSnapshotOffset].snapshotId
    val e = end.asInstanceOf[IcebergSnapshotOffset].snapshotId
    if (e == s || e < 0) return Array.empty
    val (fs, md) = currentMetadata(spark, path)
    if (md.path("format-version").asInt(1) > 3)
      refuse(path, "is format version 4+")
    // v3 streams like v2 (appends only; MoR states refuse at batch 0,
    // DV-writing snapshots are change snapshots) — except column
    // DEFAULT VALUES, which a fixed-schema scan would null-fill
    if (md.path("format-version").asInt(1) >= 3) {
      def hasDefault(node: com.fasterxml.jackson.databind.JsonNode): Boolean = {
        val fields = node.path("fields")
        fields.isArray && {
          val it = fields.elements()
          var found = false
          while (it.hasNext && !found) {
            val f = it.next()
            found = (f.has("initial-default") && !f.get("initial-default").isNull) ||
              (f.path("type").isObject && hasDefault(f.path("type")))
          }
          found
        }
      }
      val schemaNodes =
        (if (md.path("schemas").isArray) {
          val b = Seq.newBuilder[com.fasterxml.jackson.databind.JsonNode]
          val it = md.get("schemas").elements()
          while (it.hasNext) b += it.next()
          b.result()
        } else Nil) ++ Option(md.get("schema")).toSeq
      if (schemaNodes.exists(hasDefault))
        refuse(path, "declares Iceberg v3 column default values — a " +
          "fixed-schema stream would null-fill them")
    }
    def snapshotNode(id: Long) = {
      val it = md.get("snapshots").elements()
      var found: com.fasterxml.jackson.databind.JsonNode = null
      while (it.hasNext && found == null) {
        val n = it.next()
        if (n.get("snapshot-id").asLong() == id) found = n
      }
      if (found == null)
        throw new IllegalStateException(
          s"iceberg stream over $path: snapshot $id is no longer " +
            "retained (expire_snapshots outran this consumer) — restart " +
            "the stream from a fresh checkpoint")
      found
    }
    // manifest-list records of one snapshot: (content, manifest path,
    // manifest added_snapshot_id)
    def listRecords(snap: com.fasterxml.jackson.databind.JsonNode)
        : Seq[(Long, String, Long)] =
      readAvro(readBytes(fs, new HPath(
        snap.get("manifest-list").asText()))).map { r =>
        (fieldOpt(r, "content").map(longOf).getOrElse(0L),
          r.get("manifest_path").toString,
          fieldOpt(r, "added_snapshot_id").map(longOf).getOrElse(-1L))
      }
    def dataFileOf(e2: GenericRecord): GenericRecord =
      e2.get("data_file").asInstanceOf[GenericRecord]
    def checkParquet(df: GenericRecord): Unit = {
      val fmt = df.get("file_format").toString
      if (!fmt.equalsIgnoreCase("parquet")) refuse(path, s"has $fmt data files")
    }

    val files: Seq[String] =
      if (s < 0) {
        // batch 0: the complete file set of snapshot e
        val snap = snapshotNode(e)
        val recs = listRecords(snap)
        if (recs.exists(_._1 != 0L))
          throw new IllegalStateException(
            s"iceberg stream over $path: the table carries row-level " +
              "delete files — a merge-on-read state cannot stream " +
              "append-only; read it batch-side via readIceberg")
        recs.flatMap { case (_, mp, _) =>
          readAvro(readBytes(fs, new HPath(mp))).flatMap { e2 =>
            val df = dataFileOf(e2)
            checkParquet(df)
            if (longOf(e2.get("status")) == 2L) None
            else Some(df.get("file_path").toString)
          }
        }.distinct
      } else {
        val hist = history()
        val si = hist.indexOf(s)
        val ei = hist.indexOf(e)
        if (si < 0)
          throw new IllegalStateException(
            s"iceberg stream over $path: snapshot $s is no longer " +
              "retained (expire_snapshots outran this consumer) — restart " +
              "the stream from a fresh checkpoint")
        require(ei > si, s"iceberg stream over $path: end $e not after $s")
        hist.slice(si + 1, ei + 1).flatMap { id =>
          val snap = snapshotNode(id)
          // schema gate mirrors the graft source's restart-safe rule:
          // a snapshot whose schema ADDS columns the plan lacks refuses
          // (the fixed-schema scan would silently drop them; a
          // restarted stream plans with the widened schema and passes),
          // while a NARROWER snapshot schema is the pre-change history
          // a restarted stream replays while catching up — null-filled
          // like additive evolution, never a wedge
          if (snap.has("schema-id") && md.has("schemas")) {
            val sid = snap.get("schema-id").asInt()
            val snapCols = md.get("schemas").elements()
            var cols = Set.empty[String]
            while (snapCols.hasNext) {
              val sn = snapCols.next()
              if (sn.path("schema-id").asInt(-1) == sid) {
                val fit = sn.path("fields").elements()
                while (fit.hasNext) cols += fit.next().path("name").asText()
              }
            }
            val added = cols -- schema.fieldNames.toSet
            if (added.nonEmpty)
              throw new IllegalStateException(
                s"iceberg stream over $path: snapshot $id changes the " +
                  s"table schema (added ${added.toSeq.sorted.mkString(", ")}) " +
                  "— restart the stream to pick up the new schema")
          }
          val op = snap.path("summary").path("operation").asText("")
          val recs = listRecords(snap)
          // `replace` (Iceberg's compaction operation) and the graft
          // mirror's `compact`/`cluster` rewrite the same rows into new
          // files — invisible to a stream by Iceberg's own source
          // contract: skipped silently, never streamed, never a
          // failure. Anything else non-append is a row-level change.
          // Delete manifests CARRIED from older snapshots don't make an
          // append a change: position deletes reference files that
          // existed before, and equality deletes strike only LOWER data
          // sequence numbers — neither can touch this snapshot's added
          // rows. Only a delete manifest the snapshot itself ADDED does.
          val isRewrite = op == "replace" ||
            op.startsWith("compact") || op.startsWith("cluster")
          val isChange = !isRewrite &&
            (op != "append" ||
              recs.exists(r => r._1 != 0L && r._3 == id))
          if (isChange && !skipChangeCommits)
            throw new IllegalStateException(
              s"iceberg stream over $path: snapshot $id is operation " +
                s"'$op' — the source tails APPENDS; set read option " +
                "skipChangeCommits=true to skip change snapshots")
          if (isChange || isRewrite) Nil
          else recs.flatMap { case (content, mp, addedBy) =>
            // carried delete manifests contribute no streamed files
            // (and may hold non-parquet DV entries) — data only
            if (content != 0L) Nil
            else readAvro(readBytes(fs, new HPath(mp))).flatMap { e2 =>
              val df = dataFileOf(e2)
              checkParquet(df)
              val entrySnap = fieldOpt(e2, "snapshot_id").map(longOf)
                .getOrElse(addedBy)
              if (longOf(e2.get("status")) == 1L && entrySnap == id)
                Some(df.get("file_path").toString)
              else None
            }
          }.distinct
        }
      }
    if (files.isEmpty) return Array.empty
    // Footer probe (the batch reader's stable-columns rule): columns
    // present in EVERY retained schema version must come FROM the
    // files — identity partition values living only in manifest
    // metadata, or renames, would null-fill through this fixed-schema
    // scan. Columns ADDED by schema evolution are legitimately absent
    // from older files (a restarted stream's catch-up batch spans
    // them) and null-fill by name, matching Iceberg's by-id semantics.
    val stableCols: Seq[String] =
      if (!md.has("schemas")) schema.fieldNames.toSeq
      else {
        val perSchema = scala.collection.mutable.Buffer[Set[String]]()
        val sit = md.get("schemas").elements()
        while (sit.hasNext) {
          val sn = sit.next()
          var cols = Set.empty[String]
          val fit = sn.path("fields").elements()
          while (fit.hasNext) cols += fit.next().path("name").asText()
          perSchema += cols
        }
        schema.fieldNames.toSeq.filter(n => perSchema.forall(_.contains(n)))
      }
    val probe = spark.read.parquet(files.head).schema.fieldNames.toSet
    val missing = stableCols.filterNot(probe.contains)
    if (missing.nonEmpty) {
      // RENAMED tables whose files carry parquet FIELD IDS (real
      // Iceberg writers always stamp them) upgrade to id-resolution
      // (r16): the scan schema annotates each column's Iceberg field
      // id and Spark's parquet readers match by id — old-name files
      // read their real data positionally, exactly the batch reader's
      // rename rule. Id-less files (hive-migrated / graft exports)
      // keep the loud refusal toward readIceberg's name-mapping path.
      val conf = spark.sparkContext.hadoopConfiguration
      val allIdStamped = files.forall { f =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new HPath(f), conf))
        try {
          val sc = rdr.getFooter.getFileMetaData.getSchema
          (0 until sc.getFieldCount).forall(i => sc.getType(i).getId != null)
        } finally rdr.close()
      }
      if (!allIdStamped)
        throw new IllegalStateException(
          s"iceberg stream over $path: data files lack declared columns " +
            s"${missing.mkString(", ")} (identity partition values in " +
            "manifest metadata, or an id-less rename) — read this table " +
            "batch-side via readIceberg")
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      val b = scanBatch(files, IcebergInterop.annotateFieldIds(schema,
        IcebergInterop.currentSchemaNode(md, path)))
      currentBatch = b
      return b.planInputPartitions()
    }
    val b = scanBatch(files)
    currentBatch = b
    b.planInputPartitions()
  }

  private def scanBatch(files: Seq[String],
      scanSchema: StructType = schema): Batch =
    ParquetTableBridge.scanBuilder(spark, "iceberg-stream", files, scanSchema,
      options).build().toBatch

  // factory from the same per-batch scan (see DeltaMicroBatchStream)
  @volatile private var currentBatch: Batch = _
  override def createReaderFactory(): PartitionReaderFactory =
    (if (currentBatch != null) currentBatch else scanBatch(Nil))
      .createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
