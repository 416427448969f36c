package graft.sources.v2

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.graftbridge.ParquetTableBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.GraftTable

/** Stream offset = table commit version (total-ordered, durable,
  * human-readable in the checkpoint). */
case class GraftOffset(version: Int) extends Offset {
  override def json: String = s"""{"version":$version}"""
}

object GraftOffset {
  private val V = "\"version\"\\s*:\\s*(-?\\d+)".r
  def fromJson(json: String): GraftOffset =
    GraftOffset(V.findFirstMatchIn(json).getOrElse(
      throw new IllegalArgumentException(s"bad graft offset: $json")).group(1).toInt)
}

/** Micro-batch streaming source tailing a GraftTable's commit log — the
  * Delta streaming-source analog (`spark.readStream.table("cat.db.t")`):
  *
  *  - The FIRST batch is the table's current snapshot (every live
  *    directory at stream start), so a new consumer begins from a
  *    complete state.
  *  - Every later batch is exactly the directories ADDED by the commits
  *    between the two offsets — appends stream through incrementally,
  *    with cost proportional to the new data, never the table.
  *  - A commit that REMOVES live directories (overwrite, delete, merge,
  *    compact — a change, not an append) fails the stream loudly, like
  *    Delta's source without `skipChangeCommits`; with read option
  *    `skipChangeCommits=true` the WHOLE change commit is skipped
  *    (its added directories are rewrites of existing rows, so
  *    streaming them would duplicate) and only pure-append commits
  *    stream. Consumers that need rewritten rows read
  *    `readChangesBetween` batch-side — the CDF contract.
  *
  * Offsets are commit versions, so checkpoint recovery replans the same
  * directory sets deterministically (directories are immutable).
  * Restart after vacuum of a not-yet-committed range fails on the
  * missing files rather than silently skipping — retention must outlive
  * consumer lag, the same contract as any log-compacted source.
  *
  * Scale shape: planning is O(#commits + #dirs) driver-side metadata;
  * the data path is the native vectorized parquet batch reader over the
  * added directories only.
  */
class GraftMicroBatchStream(spark: SparkSession, path: String,
    schema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow: drain exactly the commits present at start,
    * in maxCommitsPerTrigger-bounded batches, then stop. */
  @volatile private var availableNowEnd: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(table.latestVersion())

  private val skipChangeCommits =
    Option(options.get("skipchangecommits")).exists(_.toBoolean)

  /** Admission control: at most this many COMMITS per micro-batch
    * (read option `maxCommitsPerTrigger`). Commit granularity is the
    * natural rate unit for a log-tailing source — each commit's added
    * directories are one writer batch — and it bounds a catch-up
    * consumer's batch size after downtime instead of replaying the
    * whole backlog in one giant batch. */
  private val maxCommitsPerTrigger =
    Option(options.get("maxcommitspertrigger")).map(_.toInt)
  /** Byte-based admission: cap each micro-batch by the admitted
    * commits' added-directory bytes — commit COUNT is a poor rate unit
    * when writer batch sizes are skewed (a count-bounded catch-up can
    * still be arbitrarily large). At least one commit always admits;
    * composes with maxCommitsPerTrigger (tighter wins) and
    * AvailableNow's pinned drain end. */
  private val maxBytesPerTrigger =
    Option(options.get("maxbytespertrigger")).map(_.toLong)

  /** Bytes a commit ADDED: its live dirs minus the predecessor's, file
    * sizes statted driver-side (O(files in admitted commits), the same
    * listing the scan itself is about to do). */
  private def commitBytes(t: GraftTable, v: Int): Long = {
    val prev = if (v == 0) Set.empty[String]
      else t.commitAt(v - 1).liveDirs.toSet
    val added = t.commitAt(v).liveDirs.filterNot(prev)
    val fs = new HPath(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    added.map { d =>
      val dir = new HPath(new HPath(path), d)
      if (fs.exists(dir))
        fs.listStatus(dir).filter(_.isFile).map(_.getLen).sum
      else 0L
    }.sum
  }

  // re-load per call: a stream outlives any single snapshot, so the
  // latest offset must see commits landed after the stream started
  private def table: GraftTable = GraftTable.load(spark, path)

  override def initialOffset(): Offset = GraftOffset(-1)

  override def latestOffset(): Offset = GraftOffset(table.latestVersion())

  // Commits are this source's admission unit; ReadLimit has no
  // maxCommits flavor, so maxFiles carries the commit cap (one commit =
  // one writer batch of files — the closest unit Spark models).
  override def getDefaultReadLimit: ReadLimit =
    maxCommitsPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** The commit cap implied by the ReadLimit the ENGINE passed — Spark
    * may hand back something other than our default (AvailableNow
    * wraps, composites compose), so honor it rather than re-deriving
    * from the option; the option is only the fallback for
    * allAvailable. A composite takes the tightest file cap it holds. */
  private def commitCap(limit: ReadLimit): Option[Int] = limit match {
    case f: ReadMaxFiles => Some(f.maxFiles)
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(commitCap).minOption
    case _: ReadAllAvailable => maxCommitsPerTrigger
    case _ => maxCommitsPerTrigger // rows/bytes caps don't map to commits
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val t = table
    val latest = availableNowEnd
      .map(e => math.min(e, t.latestVersion()))
      .getOrElse(t.latestVersion())
    val s = start.asInstanceOf[GraftOffset].version
    val countEnd = commitCap(limit) match {
      // the initial snapshot (start = -1 → first real offset) is one
      // indivisible batch regardless of the limit
      case Some(n) if s >= 0 => math.min(latest, s + n)
      case _ => latest
    }
    val end = maxBytesPerTrigger match {
      case Some(budget) if s >= 0 =>
        var e = s
        var acc = 0L
        var stop = false
        while (!stop && e < countEnd) {
          val b = commitBytes(t, e + 1)
          if (e > s && acc + b > budget) stop = true
          else { acc += b; e += 1; if (acc >= budget) stop = true }
        }
        e
      case _ => countEnd
    }
    GraftOffset(end)
  }

  override def reportLatestOffset(): Offset = GraftOffset(table.latestVersion())

  override def deserializeOffset(json: String): Offset = GraftOffset.fromJson(json)

  private def scanBatch(dirs: Seq[String]): Batch =
    ParquetTableBridge.scanBuilder(spark, s"graft-stream",
      dirs.map(d => new HPath(new HPath(path), d).toString), schema, options)
      .build().toBatch

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].version
    val e = end.asInstanceOf[GraftOffset].version
    if (e <= s) return Array.empty
    val t = table
    val dirs =
      if (s < 0) t.commitAt(e).liveDirs // initial snapshot
      else
        // per COMMIT, not a net diff over the span: a net diff would
        // misread a change commit's rewritten output directory as an
        // append (duplicating its surviving rows), and would miss the
        // distinction between an append later rewritten and a pure
        // rewrite
        (s + 1 to e).flatMap { v =>
          val commit = t.commitAt(v)
          // A RENAME COLUMN landing mid-stream would make every later
          // directory's physical column names diverge from the schema
          // this stream was planned with — the fixed-schema scan would
          // read the renamed column as silent nulls. Schema changes
          // require a stream restart (the Delta source contract for
          // column-mapping changes); fail loudly, never null-fill.
          // skipChangeCommits does NOT cover metadata changes.
          if (commit.renames.nonEmpty)
            throw new IllegalStateException(
              s"graft stream over $path: commit $v renames columns " +
                s"(${commit.renames.map { case (o, nn) => s"$o->$nn" }.mkString(", ")}) — " +
                "restart the stream to pick up the new schema")
          // Same contract for ADD COLUMN / schema-merge appends (the
          // Delta source's additive-schema-change behavior): the stream
          // was planned with a fixed schema, so later appends carrying
          // columns the PLAN LACKS would stream with those columns
          // silently dropped — fail non-retryably; a restarted stream
          // plans with the widened schema. Commits NARROWER than the
          // plan are allowed: they are the pre-change history a
          // RESTARTED stream replays while catching up, and the
          // fixed-schema scan null-fills them exactly like Delta's
          // additive evolution (strict equality here would wedge every
          // restart whose replayed batch spans the schema change). A
          // commit that DROPS columns relative to its predecessor is a
          // non-additive change and refuses in both directions.
          val commitCols = commit.schemaStruct.fieldNames
            .filterNot(_.startsWith("__p_")).toSet
          val plannedCols =
            schema.fieldNames.filterNot(_.startsWith("__p_")).toSet
          val prevCols = t.commitAt(v - 1).schemaStruct.fieldNames
            .filterNot(_.startsWith("__p_")).toSet
          if (commitCols.nonEmpty && (commitCols -- plannedCols).nonEmpty)
            throw new IllegalStateException(
              s"graft stream over $path: commit $v changes the table schema " +
                s"(added ${(commitCols -- plannedCols).toSeq.sorted.mkString(", ")}) " +
                "— restart the stream to pick up the new schema")
          if (commitCols.nonEmpty && prevCols.nonEmpty &&
              (prevCols -- commitCols).nonEmpty)
            throw new IllegalStateException(
              s"graft stream over $path: commit $v changes the table schema " +
                s"(dropped ${(prevCols -- commitCols).toSeq.sorted.mkString(", ")}) " +
                "— a non-additive schema change; a fixed-schema stream " +
                "cannot continue across it")
          val prev = t.commitAt(v - 1).liveDirs
          val cur = commit.liveDirs
          val removed = prev.filterNot(cur.toSet)
          val added = cur.filterNot(prev.toSet)
          if (removed.isEmpty) added
          else if (skipChangeCommits) Nil
          else throw new IllegalStateException(
            s"graft stream over $path: commit $v removes or rewrites data " +
              s"directories (${removed.mkString(", ")}) — the source tails " +
              "APPENDS; set read option skipChangeCommits=true to skip " +
              "change commits, or consume changes batch-side via " +
              "readChangesBetween")
        }
    if (dirs.isEmpty) Array.empty else scanBatch(dirs).planInputPartitions()
  }

  // the factory binds schema + conf, not files — partitions carry
  // their own file lists, so ONE factory (built over an empty file
  // index, no table metadata touched) serves every micro-batch
  private lazy val readerFactory: PartitionReaderFactory =
    scanBatch(Nil).createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
