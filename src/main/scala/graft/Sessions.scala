package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the graft engine.
  *
  * Local mode is a stand-in for a real cluster: shuffle-partition count and
  * AQE settings are chosen so the same plans scale to many executors
  * (runtime coalescing + skew splitting instead of hand-tuned counts).
  */
object Sessions {
  /** Fork-free local filesystem (see [[graft.sources.NioLocalFS]]):
    * without libhadoop, stock Hadoop forks a `stat`/`chmod` process
    * per getFileStatus/create/mkdirs — measured at ~2,300 forks for
    * one lifecycle query. java.nio replacements, identical semantics.
    * Harmless (and inert for perf) on clusters that ship libhadoop. */
  val localFsConfs: Seq[(String, String)] = Seq(
    "spark.hadoop.fs.file.impl" -> "graft.sources.NioLocalFileSystem",
    "spark.hadoop.fs.AbstractFileSystem.file.impl" -> "graft.sources.NioLocalFs")
  // NOTE on timestamps: the SESSION keeps Spark's INT96 parquet default
  // — Verify dumps query results with it and the external oracle's
  // reader treats INT96 as tz-naive (a TIMESTAMP_MICROS dump reads
  // back tz-aware and breaks the comparator). Graft-INTERNAL table
  // writes (GraftTable data dirs, Delta/Iceberg interop files) go
  // through StatsWriteBridge, which forces INT64 micros per write —
  // spec-conformant interop files with usable footer statistics —
  // without touching the session default.

  def local(appName: String = "graft", cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = localFsConfs.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)){ case (b, (k, v)) => b.config(k, v) }
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // ObjectHashAggregate (the operator behind every
      // TypedImperativeAggregate: TopKAgg, MinHashAgg, ThetaSketchAgg)
      // falls back to SORT-based aggregation past this many in-memory
      // groups. The stock 128 is calibrated for unbounded per-group
      // state (collect_list); graft's typed aggregates carry bounded
      // buffers (k-heaps, 128-long signatures, <=32 KiB sketches), so
      // the fallback only adds a full sort of the candidate stream —
      // measured 3x on the sf1 kNN self-join (20k groups). 128k groups
      // x <=32 KiB is still executor-safe.
      //
      // CAVEAT — the threshold is session-wide, so collect_list
      // aggregations share it. The big ones are bounded by
      // construction (d5/s6 cell blocks cap at
      // spark.graft.ann.maxBlockRows rows per group); the per-document
      // shingle arrays (Dedup.shingleArrays / GraftOps.shingleArrs)
      // are bounded by document length — at 128k groups x a 500-token
      // doc's ~12 KiB array that is ~1.6 GiB per task, fine here, but
      // a corpus of multi-MB documents should lower this via
      // SPARK_GRAFT_AGG_FALLBACK (or trim documents first, which every
      // published pipeline does before shingling).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AGG_FALLBACK", "131072"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.ConfSources.disableTracking(spark.sparkContext.hadoopConfiguration)
    spark
  }
}
