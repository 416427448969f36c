package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the lakehouse's base tables (one parquet file per table).
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown:
  * filters and column pruning reach the parquet scan (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  *
  * Mirrors the table surface of the reference lakehouse
  * (reference: docker/spark-notebook/05_datahub_lineage_demo.ipynb,
  * 06_pipeline_metrics_demo.ipynb — customers/orders star schema).
  */
object Tables {
  /** Session-scoped DataFrame-HANDLE cache: `spark.read.parquet`
    * re-infers the file schema on every call (a ~25–70 ms footer job
    * at analysis time), and a 156-query bench loads each base table
    * hundreds of times. Reusing the resolved handle reuses the
    * analyzed relation — pure plan reuse, no data is cached or
    * persisted; every action still computes from the parquet input.
    * Keyed per session (a new session must re-resolve: conf like
    * nanosAsLong can differ), bounded LRU. */
  private val dfCache: java.util.Map[(String, String), DataFrame] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, String), DataFrame](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, String), DataFrame]): Boolean =
          size() > 64
      })

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val k = (graft.operators.Dedup.sessionId(spark), s"$dir/$name.parquet")
    val hit = dfCache.get(k)
    if (hit != null) hit
    else {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      dfCache.put(k, df)
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts normalized to session-zoned TimestampType (micro
    * precision), ADAPTIVELY: the physical layout of the generated
    * parquet has changed across environments (TIMESTAMP(NANOS) →
    * TIMESTAMP(MICROS)), so the loader branches on the dtype Spark
    * actually infers instead of hard-coding a unit:
    *
    *  - `LongType`: the legacy TIMESTAMP(NANOS) layout, surfaced as
    *    raw INT64 epoch-nanos via `nanosAsLong` — floor-convert to µs
    *    with integer DIV, not `/` (double division is lossy above
    *    2^53, and epoch-nanos are ~1.7e18).
    *  - `TimestampNTZType`: TIMESTAMP(MICROS, isAdjustedToUTC=false) —
    *    cast to TimestampType; graft sessions pin
    *    spark.sql.session.timeZone=UTC so the cast reinterprets the
    *    wall-clock value with identical micros (and matches the DuckDB
    *    oracle, which reads the same column as a naive timestamp).
    *  - `TimestampType`: already the target type — pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // must be set BEFORE the read so a nanos file loads at all;
    // harmless no-op for micros files
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    normalizeTs(raw, raw.schema("ts").dataType)
  }

  /** Shared ts-normalization for batch and streaming event reads (the
    * streaming source mirrors the batch decision so the two paths can
    * never drift by a unit — see StreamingSpec's batch≡stream ts-parity
    * case). */
  private[graft] def normalizeTs(df: DataFrame,
                                 dt: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    dt match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet-inferred type $other — " +
          "expected INT64 nanos (LongType), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `documents`, round-robined up to the session parallelism when the
    * scan provides fewer partitions. Map work BEFORE a query's first
    * exchange runs at scan parallelism, and a single parquet file with
    * one row group cannot split — so heavy per-document passes
    * (shingling, signatures, BPE) over a small-file corpus would run on
    * 1-2 cores no matter the cluster. Only the heavy paths use this:
    * scan-side projection operators (t1/t12/t13/t14…) stay on the bare
    * scan so their zero-Exchange plans hold. At real corpus scale the
    * scan already exceeds the parallelism and this is a no-op. */
  def documentsSpread(s: SparkSession, d: String): DataFrame = {
    val raw = documents(s, d)
    val n = s.sessionState.conf.numShufflePartitions
    if (raw.rdd.getNumPartitions < n) raw.repartition(n) else raw
  }

  /** Broadcast hint gated on the optimizer's size estimate. Constant-size
    * dims (region/nation) can be hinted unconditionally, but relations
    * that grow with the corpus (supplier, customer — and above all the
    * dedup cluster/drop maps, which are O(corpus) on a dup-heavy web
    * corpus) must not be force-broadcast: at a 100 TB scale factor the
    * hint would push a multi-GB relation to every executor and trip
    * Spark's 8 GB broadcast hard limit. Below the cap the hint is free;
    * above it, planning is left to cost-based selection / AQE (which can
    * still pick a broadcast from RUNTIME sizes — the gate only removes
    * the unconditional hint). `spark.graft.broadcast.maxBytes`
    * overrides the cap session-wide (0 disables hinting entirely —
    * used by PlanAuditSpec to prove the degraded plan is a sane
    * shuffle join, and by operators whose inputs are known-large). */
  def broadcastIfSmall(df: DataFrame, maxBytes: Long = 64L << 20): DataFrame = {
    val cap = df.sparkSession.conf.getOption("spark.graft.broadcast.maxBytes")
      .map(_.toLong).getOrElse(maxBytes)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= cap) broadcast(df) else df
  }
}
