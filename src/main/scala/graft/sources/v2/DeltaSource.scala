package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.graftbridge.ParquetTableBridge
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.DeltaInterop

/** FOREIGN Delta tables as a Spark data source, dependency-free — the
  * streaming half of the Delta interop (reference behavior:
  * docker/spark-notebook/03_delta_demo.ipynb drives Delta tables;
  * production pipelines tail them with `spark.readStream`):
  *
  * {{{
  *   spark.read.format("graft.sources.v2.DeltaSource").load(path)        // = readDelta
  *   spark.readStream.format("graft.sources.v2.DeltaSource")
  *     .option("skipChangeCommits", "true").load(path)                   // tail the log
  * }}}
  *
  * The stream follows the graft source's (and Delta's own source's)
  * contract: batch 0 is the complete snapshot at stream start, every
  * later batch is exactly the files ADDED by the commits between two
  * offsets (offset = Delta version, durable in the checkpoint), change
  * commits (removes, or adds carrying deletion vectors — a DV add IS a
  * row-level change) fail loudly unless `skipChangeCommits=true` skips
  * the whole commit, and mid-stream schema changes refuse non-retryably
  * — a restarted stream plans with the new schema. Partition columns
  * are recovered from the hive-style directory layout under one
  * explicit `basePath` (the universal Spark writer layout; adds whose
  * paths don't encode every partition column refuse). Streaming
  * requires a column-mapping-free table (the rename projection cannot
  * ride the native batch scan); batch reads of mapped tables go
  * through `DeltaInterop.readDelta`.
  *
  * Scale shape: planning is O(#commits + #files) driver-side metadata;
  * the data path is the native vectorized parquet batch reader over
  * only the added files. */
class DeltaSource extends TableProvider {
  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "delta source needs a path: .load(<table root>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val st = DeltaInterop.replaySnapshot(spark, pathOf(options), None)
    DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
  }

  override def getTable(tableSchema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = pathOf(options)
    new Table with org.apache.spark.sql.connector.catalog.SupportsRead {
      override def name(): String = s"delta:$path"
      override def schema(): StructType = tableSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ,
          TableCapability.MICRO_BATCH_READ)
      override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = new V1Scan {
            override def readSchema(): StructType = tableSchema
            override def toMicroBatchStream(checkpointLocation: String)
                : MicroBatchStream =
              new DeltaMicroBatchStream(SparkSession.active, path, tableSchema,
                opts)
            override def toV1TableScan[T <: BaseRelation with TableScan](
                context: SQLContext): T =
              new BaseRelation with TableScan {
                override def sqlContext: SQLContext = context
                override def schema: StructType = readSchema()
                override def buildScan(): RDD[Row] =
                  DeltaInterop.readDelta(SparkSession.active, path).rdd
              }.asInstanceOf[T]
          }
        }
    }
  }

  override def supportsExternalMetadata(): Boolean = false
}

/** Stream offset = Delta version. */
case class DeltaVersionOffset(version: Long) extends Offset {
  override def json: String = s"""{"version":$version}"""
}

object DeltaVersionOffset {
  private val V = "\"version\"\\s*:\\s*(-?\\d+)".r
  def fromJson(json: String): DeltaVersionOffset =
    DeltaVersionOffset(V.findFirstMatchIn(json).getOrElse(
      throw new IllegalArgumentException(s"bad delta offset: $json"))
      .group(1).toLong)
}

/** Micro-batch stream tailing a foreign Delta table's `_delta_log` —
  * the [[GraftMicroBatchStream]] shape over the Delta commit protocol.
  * See [[DeltaSource]] for the contract. */
class DeltaMicroBatchStream(spark: SparkSession, path: String,
    schema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl {

  private val skipChangeCommits =
    Option(options.get("skipchangecommits")).exists(_.toBoolean)
  private val maxCommitsPerTrigger =
    Option(options.get("maxcommitspertrigger")).map(_.toInt)

  private val root = new HPath(path)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logDir = new HPath(root, "_delta_log")

  private def latestVersion(): Long = {
    val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
    val jsons = names.collect { case n if n.matches("\\d{20}\\.json") =>
      n.dropRight(5).toLong }
    val cps = names.flatMap(n =>
      "(\\d{20})\\.checkpoint.*\\.parquet".r.findFirstMatchIn(n)
        .map(_.group(1).toLong))
    (jsons ++ cps).maxOption.getOrElse(
      throw new IllegalArgumentException(s"empty Delta log at $path"))
  }

  override def initialOffset(): Offset = DeltaVersionOffset(-1L)
  override def latestOffset(): Offset = DeltaVersionOffset(latestVersion())
  override def reportLatestOffset(): Offset = DeltaVersionOffset(latestVersion())
  override def deserializeOffset(json: String): Offset =
    DeltaVersionOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxCommitsPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  private def commitCap(limit: ReadLimit): Option[Int] = limit match {
    case f: ReadMaxFiles => Some(f.maxFiles)
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(commitCap).minOption
    case _: ReadAllAvailable => maxCommitsPerTrigger
    case _ => maxCommitsPerTrigger
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val latest = latestVersion()
    val s = start.asInstanceOf[DeltaVersionOffset].version
    commitCap(limit) match {
      case Some(n) if s >= 0 => DeltaVersionOffset(math.min(latest, s + n))
      case _ => DeltaVersionOffset(latest)
    }
  }

  /** Every partition column must be path-encoded (`…/col=value/…`) for
    * the hive-dir recovery to reconstruct it. */
  private def checkPartitionEncoding(partCols: Seq[String],
                                     file: String): Unit =
    partCols.foreach { pc =>
      if (!file.contains(s"/$pc="))
        throw new IllegalStateException(
          s"delta stream over $path: data file $file does not encode " +
            s"partition column '$pc' in its path — the stream recovers " +
            "partition values from the hive directory layout; read this " +
            "table batch-side via DeltaInterop.readDelta")
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DeltaVersionOffset].version
    val e = end.asInstanceOf[DeltaVersionOffset].version
    if (e <= s) return Array.empty
    val files: Seq[String] =
      if (s < 0) {
        // batch 0: the complete snapshot at version e — deterministic
        // on checkpoint recovery because the version pins the state
        val st = DeltaInterop.replaySnapshot(spark, path, Some(e))
        if (st.colMapMode != "none")
          throw new IllegalStateException(
            s"delta stream over $path: table uses column mapping — the " +
              "physical-name rename cannot ride the streaming scan; read " +
              "it batch-side via DeltaInterop.readDelta")
        st.active.foreach { case (p, (_, dv)) =>
          if (dv.isDefined)
            throw new IllegalStateException(
              s"delta stream over $path: file $p carries a deletion " +
                "vector at stream start — a DV'd snapshot cannot stream " +
                "append-only; compact the table or read it batch-side")
        }
        partColsAt(e) = st.partCols
        st.active.map { case (p, _) =>
          val f = DeltaInterop.resolveFile(root, p)
          checkPartitionEncoding(st.partCols, f)
          f
        }
      } else {
        // partition columns IN EFFECT at each commit being replayed —
        // a checkpoint-restart catching up across a partition-layout
        // change must validate old commits' files against the OLD
        // layout, not the latest snapshot's
        var pcNow = partColsOf(s)
        val out = (s + 1 to e).flatMap { v =>
        val commitPath = new HPath(logDir, f"$v%020d.json")
        if (!fs.exists(commitPath))
          throw new IllegalStateException(
            s"delta stream over $path: commit $v is no longer retained " +
              "(log cleanup outran this consumer) — restart the stream " +
              "from a fresh checkpoint")
        val a = DeltaInterop.parseCommitText(path,
          readText(commitPath))
        a.meta.foreach { case (sj, pc, mode) =>
          pcNow = pc
          if (mode != "none")
            throw new IllegalStateException(
              s"delta stream over $path: commit $v enables column " +
                "mapping — restart batch-side")
          // schema gate mirrors the graft source's restart-safe rule:
          // a commit ADDING columns the plan lacks refuses (the fixed-
          // schema scan would silently drop them; a restarted stream
          // plans with the widened schema and passes), while NARROWER
          // metaData is the pre-change history a restarted stream
          // replays while catching up — null-filled like additive
          // evolution, never a wedge
          val newCols = DataType.fromJson(sj).asInstanceOf[StructType]
            .fieldNames.toSet
          val added = newCols -- schema.fieldNames.toSet
          if (added.nonEmpty)
            throw new IllegalStateException(
              s"delta stream over $path: commit $v changes the table " +
                s"schema (added ${added.toSeq.sorted.mkString(", ")}) — " +
                "restart the stream to pick up the new schema")
        }
        // the Delta source contract: dataChange=false actions
        // (compaction/optimize rewrites) are INVISIBLE to streams —
        // only dataChange removes / DV'd adds make a change commit
        val isChange =
          a.removeActions.exists(_._2) ||
            a.addActions.exists(ad => ad.dataChange && ad.dv.isDefined)
        if (isChange && !skipChangeCommits)
          throw new IllegalStateException(
            s"delta stream over $path: commit $v removes or rewrites " +
              "data (dataChange removes or deletion vectors) — the source " +
              "tails APPENDS; set read option skipChangeCommits=true to " +
              "skip change commits")
        if (isChange) Nil
        else a.addActions.filter(_.dataChange).map { ad =>
          val f = DeltaInterop.resolveFile(root, ad.path)
          checkPartitionEncoding(pcNow, f)
          f
        }
        }
        partColsAt(e) = pcNow
        out
      }
    if (files.isEmpty) Array.empty
    else {
      val b = scanBatch(files)
      currentBatch = b
      b.planInputPartitions()
    }
  }

  // partition columns BY VERSION: seeded by one log replay per
  // (re)start, then advanced incrementally from each commit's metaData
  // as batches process — each trigger's start version hits the cache
  // entry the previous trigger stored
  private val partColsAt = scala.collection.mutable.Map[Long, Seq[String]]()
  private def partColsOf(v: Long): Seq[String] =
    partColsAt.getOrElseUpdate(v,
      DeltaInterop.replaySnapshot(spark, path, Some(v)).partCols)

  private def readText(p: HPath): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def scanBatch(files: Seq[String]): Batch = {
    // basePath pins hive partition inference to the table root across
    // arbitrary file subsets. Copy via asCaseSensitiveMap — the
    // Map-interface copy of a CaseInsensitiveStringMap yields
    // LOWERCASED keys, and the file index looks "basePath" up
    // case-sensitively (a lowercased key silently disables inference
    // and null-fills every partition column).
    val m = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    m.put("basePath", path)
    ParquetTableBridge.scanBuilder(spark, "delta-stream", files, schema,
      new CaseInsensitiveStringMap(m)).build().toBatch
  }

  // The factory must come from the SAME per-batch scan as the planned
  // partitions: a factory built over an empty file index would carry an
  // empty partition schema and silently null-fill every hive-recovered
  // partition column (unlike the graft source, which only streams
  // unpartitioned tables and can share one file-less factory).
  @volatile private var currentBatch: Batch = _
  override def createReaderFactory(): PartitionReaderFactory =
    if (currentBatch != null) currentBatch.createReaderFactory()
    else {
      // unreachable under MicroBatchExecution's call order (plan, then
      // factory); if a future engine inverts it, an empty-index
      // factory would null-fill hive partition columns — fail loudly
      // for partitioned tables instead
      val pcs = DeltaInterop.replaySnapshot(spark, path, None).partCols
      if (pcs.nonEmpty)
        throw new IllegalStateException(
          s"delta stream over $path: createReaderFactory called before " +
            "planInputPartitions on a partitioned table — an empty-index " +
            "factory would null-fill the hive-recovered partition columns")
      scanBatch(Nil).createReaderFactory()
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
