package graft.metrics

import java.sql.Timestamp
import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline metrics logging — the Scala-Spark re-expression of the
  * reference's dst_metrics module
  * (reference: modules/dst_metrics/core.py build_record,
  * spark_logger.py METRICS_SCHEMA/SparkMetricsLogger,
  * context.py SparkMetricContext, utils.py helpers).
  *
  * Records append to a parquet activity log. At scale each append is one
  * tiny file per job (driver-side, single row) — readers compact via
  * normal parquet directory reads; the schema is fixed so appends never
  * conflict.
  */
final case class MetricRecord(
  event_timestamp: Timestamp,
  run_id: String,
  layer: String,
  project: String,
  dataset_year: Int,
  description: String,
  metric_value: Double,
  metric_unit: String,
  metric_function: String,
  job_name: Option[String],
  extra: Map[String, String],
  status: Option[String],
  duration_ms: Option[Long],
  table_name: Option[String],
  source_path: Option[String],
)

object MetricRecord {
  def build(
    layer: String, project: String, datasetYear: Int, description: String,
    value: Double, unit: String, function: String,
    jobName: Option[String] = None, extra: Map[String, String] = Map.empty,
    runId: Option[String] = None, status: Option[String] = None,
    durationMs: Option[Long] = None, tableName: Option[String] = None,
    sourcePath: Option[String] = None,
    now: () => Long = () => System.currentTimeMillis(),
  ): MetricRecord = MetricRecord(
    new Timestamp(now()), runId.getOrElse(UUID.randomUUID().toString),
    layer, project, datasetYear, description, value, unit, function,
    jobName, extra, status, durationMs, tableName, sourcePath)
}

/** Push-based metric export: every record logged through
  * [[MetricsLogger.log]] is ALSO offered to each configured sink — the
  * hook a deployment uses to forward pipeline metrics to an external
  * backend (the reference emits its lineage/metrics to DataHub:
  * docker/spark-notebook/05_datahub_lineage_demo.ipynb; a sink
  * implementation would POST the record to such an endpoint).
  * Implementations need a public no-arg constructor; register via
  * `spark.graft.metrics.sinks` = comma-separated class names. Sink
  * failures are contained (logged, never propagated) — metric export
  * is best-effort and must not fail the job that emitted it. */
trait MetricSink {
  def emit(rec: MetricRecord): Unit
}

/** Built-in sink: one log4j INFO line per record (the zero-dependency
  * "external backend" — log shippers pick it up). */
class LogMetricSink extends MetricSink {
  private val logger = org.apache.logging.log4j.LogManager.getLogger(getClass)
  override def emit(rec: MetricRecord): Unit =
    logger.info(s"graft-metric run=${rec.run_id} layer=${rec.layer} " +
      s"project=${rec.project} desc=${rec.description} " +
      s"value=${rec.metric_value} unit=${rec.metric_unit}")
}

/** JSON string escaping shared by every wire-shaped emitter here. */
private[metrics] object MetricsJson {
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  }
}

/** Buffered best-effort HTTP delivery shared by [[HttpMetricSink]] and
  * [[OpenLineageListener]]: offer() enqueues into a bounded buffer and
  * returns immediately; one daemon thread drains it and POSTs. A down
  * endpoint, slow responses, or buffer overflow DROP payloads with a
  * warning — delivery never fails, blocks, or slows the caller.
  * `flush()` waits until every buffered payload has been attempted. */
private[metrics] final class AsyncHttpPoster(label: String) {
  private val log = org.apache.logging.log4j.LogManager.getLogger(getClass)
  private val queue = new java.util.concurrent
    .LinkedBlockingQueue[(java.net.URI, Long, String)](4096)
  /** queued + in-flight payloads (flush waits on this, not just the queue) */
  private val pending = new java.util.concurrent.atomic.AtomicLong(0)
  private val droppedCount = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var workerStarted = false

  def offer(endpoint: java.net.URI, timeoutMs: Long, json: String): Unit = {
    ensureWorker()
    pending.incrementAndGet()
    if (!queue.offer((endpoint, timeoutMs, json))) {
      pending.decrementAndGet()
      if (droppedCount.incrementAndGet() % 100 == 1)
        log.warn(s"$label buffer full — dropped " +
          s"${droppedCount.get()} payloads so far (endpoint $endpoint)")
    }
  }

  /** Wait until every buffered payload has been attempted (delivered or
    * dropped). Returns false on deadline. */
  def flush(timeoutMs: Long = 10000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (pending.get() > 0 && System.nanoTime() < deadline) Thread.sleep(10)
    pending.get() == 0
  }

  private def ensureWorker(): Unit = if (!workerStarted) synchronized {
    if (!workerStarted) {
      val t = new Thread(() => drainLoop(), s"graft-$label-poster")
      t.setDaemon(true)
      t.start()
      workerStarted = true
    }
  }

  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5)).build()

  private def drainLoop(): Unit = while (true) {
    val (endpoint, timeoutMs, json) = queue.take()
    try post(endpoint, timeoutMs, json)
    catch {
      case scala.util.control.NonFatal(e) =>
        if (droppedCount.incrementAndGet() % 100 == 1)
          log.warn(s"$label delivery to $endpoint failed " +
            s"(${droppedCount.get()} drops so far): $e")
    } finally pending.decrementAndGet(): Unit
  }

  private def post(endpoint: java.net.URI, timeoutMs: Long, json: String): Unit = {
    val req = java.net.http.HttpRequest.newBuilder(endpoint)
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(json))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.discarding())
    if (resp.statusCode() >= 400)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()}")
  }
}

/** HTTP push sink: POSTs one OpenLineage-shaped RunEvent per metric
  * record to a configurable endpoint — the reference forwards its
  * pipeline metrics/lineage to DataHub over HTTP
  * (docker/spark-notebook/connector.py enable_lineage,
  * 05_datahub_lineage_demo.ipynb).
  *
  * Config (resolved from the ACTIVE session on the first emit, i.e. on
  * the logging thread — the delivery thread never touches the session):
  *  - `spark.graft.metrics.http.endpoint`  — POST target URL. Unset =
  *    the sink disables itself with one warning (never fails the job).
  *  - `spark.graft.metrics.http.timeoutMs` — per-request timeout
  *    (default 2000).
  *
  * Delivery rides [[AsyncHttpPoster]]'s best-effort contract: a down
  * endpoint or buffer overflow drops records with a warning — metric
  * export never fails the job that emitted the metric. */
class HttpMetricSink extends MetricSink {
  import HttpMetricSink._
  private val log = org.apache.logging.log4j.LogManager.getLogger(getClass)
  // null = not yet resolved; Some/None after first emit
  @volatile private var config: Option[Config] = null

  override def emit(rec: MetricRecord): Unit = resolveConfig().foreach { c =>
    poster.offer(c.endpoint, c.timeoutMs, eventJson(rec))
  }

  /** Wait until every buffered record has been attempted (delivered or
    * dropped). Returns false on deadline. */
  def flush(timeoutMs: Long = 10000): Boolean = poster.flush(timeoutMs)

  private def resolveConfig(): Option[Config] = {
    var c = config
    if (c == null) {
      c = try {
        val conf = SparkSession.active.conf
        conf.getOption("spark.graft.metrics.http.endpoint") match {
          case Some(url) => Some(Config(java.net.URI.create(url),
            conf.getOption("spark.graft.metrics.http.timeoutMs")
              .map(_.toLong).getOrElse(2000L)))
          case None =>
            log.warn("HttpMetricSink registered but " +
              "spark.graft.metrics.http.endpoint is unset — sink disabled")
            None
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          log.warn(s"HttpMetricSink config resolution failed: $e"); None
      }
      config = c
      if (c.isDefined) instances.add(this): Unit
    }
    c
  }

  /** OpenLineage RunEvent shape (run/job identity + the metric as a run
    * facet) — the same record shape Lineage.emitOpenLineage writes to
    * the activity log, serialized for the wire. */
  private def eventJson(r: MetricRecord): String = {
    import MetricsJson.esc
    val v = if (java.lang.Double.isFinite(r.metric_value)) r.metric_value.toString
            else "\"" + r.metric_value + "\""
    val eventType = if (r.status.contains("failure")) "FAIL" else "COMPLETE"
    val iso = java.time.Instant.ofEpochMilli(r.event_timestamp.getTime).toString
    s"""{"eventType":"$eventType","eventTime":"$iso",""" +
      s""""producer":"graft/metrics",""" +
      s""""run":{"runId":"${esc(r.run_id)}","facets":{"graftMetric":{""" +
      s""""layer":"${esc(r.layer)}","project":"${esc(r.project)}",""" +
      s""""description":"${esc(r.description)}","value":$v,""" +
      s""""unit":"${esc(r.metric_unit)}",""" +
      s""""function":"${esc(r.metric_function)}"}}},""" +
      s""""job":{"namespace":"graft",""" +
      s""""name":"${esc(r.job_name.getOrElse(r.metric_function))}"}}"""
  }
}

object HttpMetricSink {
  private final case class Config(endpoint: java.net.URI, timeoutMs: Long)
  private val poster = new AsyncHttpPoster("HttpMetricSink")
  private val instances =
    java.util.concurrent.ConcurrentHashMap.newKeySet[HttpMetricSink]()
  /** Drain every live HTTP sink (MetricsLogger constructs sinks
    * internally, so shutdown hooks and tests flush through here). */
  def flushAll(timeoutMs: Long = 10000): Boolean = {
    val it = instances.iterator()
    var ok = true
    while (it.hasNext) ok &= it.next().flush(timeoutMs)
    ok
  }
}

/** Appends metric records to a parquet activity log (reference appends
  * to a Delta table at s3a://polaris/metrics/activity_log).
  *
  * The log schema EVOLVES (reference: spark_logger.py
  * _ensure_schema_evolution): a batch may carry columns the existing
  * log has never seen — parquet appends are file-granular so the write
  * always succeeds, and `readAll` merges footers so old records surface
  * the new columns as nulls through one scan. */
class MetricsLogger(spark: SparkSession, val tablePath: String) {
  private val sinks: Seq[MetricSink] =
    spark.conf.getOption("spark.graft.metrics.sinks")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .flatMap(MetricsLogger.sinkFor)

  def log(rec: MetricRecord): String = {
    import spark.implicits._
    append(Seq(rec).toDS().toDF())
    sinks.foreach { s =>
      try s.emit(rec)
      catch {
        case scala.util.control.NonFatal(e) =>
          org.apache.logging.log4j.LogManager.getLogger(getClass)
            .warn(s"metric sink ${s.getClass.getName} failed: $e")
      }
    }
    rec.run_id
  }

  /** Gateway-friendly logging entry (Scala Options and default args do
    * not synthesize across py4j — the Python module calls this): null
    * means unset for every trailing field. Returns the run id. */
  def logRecord(layer: String, project: String, datasetYear: Int,
                description: String, value: Double, unit: String,
                function: String, jobName: String, runId: String,
                status: String, durationMs: java.lang.Long,
                tableName: String, sourcePath: String): String =
    log(MetricRecord.build(layer, project, datasetYear, description, value,
      unit, function, Option(jobName), runId = Option(runId),
      status = Option(status),
      durationMs = Option(durationMs).map(_.longValue()),
      tableName = Option(tableName), sourcePath = Option(sourcePath)))

  /** Append a record batch whose schema may be a superset of the log's
    * current schema (new columns evolve the log). */
  def append(df: DataFrame): Unit =
    df.write.mode("append").parquet(tablePath)

  def readAll(): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath)
}

object MetricsLogger {
  /** ONE sink instance per class per JVM: sinks own daemon threads and
    * HTTP clients, and notebook workloads construct a fresh
    * MetricsLogger per run — a per-logger instance would accumulate an
    * un-stoppable thread + client + registry entry per run, unbounded.
    * A class that fails to load is cached as absent (it will not
    * appear on the classpath mid-session). */
  private val sinkCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[MetricSink]]()

  private[metrics] def sinkFor(cls: String): Option[MetricSink] =
    sinkCache.computeIfAbsent(cls, c =>
      try Some(Class.forName(c).getDeclaredConstructor()
        .newInstance().asInstanceOf[MetricSink])
      catch {
        case scala.util.control.NonFatal(e) =>
          org.apache.logging.log4j.LogManager.getLogger(getClass)
            .warn(s"metric sink $c failed to load: $e"); None
      })
}

/** Context-managed job metrics: one shared run_id, automatic completion
  * record with status + duration on close (reference: context.py). */
class MetricContext(
  spark: SparkSession, tablePath: String,
  layer: String, project: String, datasetYear: Int, description: String,
  jobName: Option[String] = None,
) extends AutoCloseable {
  val runId: String = UUID.randomUUID().toString
  val logger = new MetricsLogger(spark, tablePath)
  private val start = System.currentTimeMillis()
  private var failed: Option[Throwable] = None

  def logMetric(description: String, value: Double, unit: String,
                function: String, jobName: Option[String] = None,
                tableName: Option[String] = None,
                sourcePath: Option[String] = None): String =
    logger.log(MetricRecord.build(layer, project, datasetYear, description,
      value, unit, function, jobName.orElse(this.jobName),
      runId = Some(runId), tableName = tableName, sourcePath = sourcePath))

  /** Run a body, recording failure status if it throws (mirrors the
    * Python context manager's __exit__): exactly one completion record
    * lands whether the body succeeds or throws. */
  def run[T](body: => T): T =
    try { val r = body; close(); r }
    catch { case t: Throwable => failed = Some(t); close(); throw t }

  /** Idempotent: standard AutoCloseable usage (`Using.resource`,
    * try-with-resources) closes again after run() already has — a
    * second call must not double-count the completion. */
  override def close(): Unit = if (!closed) {
    closed = true
    val status = if (failed.isEmpty) "success" else "failure"
    logger.log(MetricRecord.build(layer, project, datasetYear, description,
      1.0, "job", "completion", jobName, runId = Some(runId),
      status = Some(status),
      durationMs = Some(System.currentTimeMillis() - start))): Unit
  }
  private var closed = false
}

/** DataFrame metric helpers (reference: utils.py). */
object MetricUtils {
  def dfCount(df: DataFrame): Long = df.count()

  def dfAvg(df: DataFrame, column: String): Double = {
    val r = df.agg(avg(col(column))).collect()
    if (r.nonEmpty && !r(0).isNullAt(0)) r(0).getDouble(0) else 0.0
  }

  def dfErrorCount(df: DataFrame, errorColumn: String = "is_error"): Long =
    if (df.columns.contains(errorColumn))
      df.filter(col(errorColumn) === true).count()
    else 0L

  def countFiles(path: String): Int = {
    val f = new java.io.File(path)
    // listFiles() is null for a regular file or an I/O error — count
    // a plain file as 1 (it exists), not an NPE
    Option(f.listFiles()) match {
      case Some(children) => children.count(!_.getName.startsWith("."))
      case None => if (f.isFile) 1 else 0
    }
  }
}
