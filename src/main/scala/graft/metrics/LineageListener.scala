package graft.metrics

import java.util.UUID
import scala.util.control.NonFatal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Automatic OpenLineage capture — zero user code per query, the graft
  * analog of the reference attaching openlineage-spark as a listener
  * (reference: docker/spark-notebook/connector.py:136-144 wires
  * `spark.openlineage.transport.url` + OpenLineageSparkListener when
  * `enable_lineage=True`; scripts/download-jars.sh:96 ships the agent
  * jar; 05_datahub_lineage_demo.ipynb demos the DataHub surface).
  *
  * Registered once per session (via [[OpenLineageListener.enable]] or
  * the stock `spark.sql.queryExecutionListeners` static conf), the
  * listener derives each executed query's input datasets (physical scan
  * walk ∪ analyzed-plan leaves — [[Lineage.inputsOf]] /
  * [[Lineage.logicalInputsOf]]) and output datasets
  * ([[Lineage.outputsOf]]: V1 file inserts, DSv1 saves, V2 write
  * commands, CTAS), and POSTs one OpenLineage RunEvent per execution to
  * `spark.graft.lineage.endpoint`.
  *
  * Conf (all runtime, read per event — a notebook can repoint the
  * endpoint mid-session):
  *  - `spark.graft.lineage.endpoint`      — POST target. Unset = the
  *    listener is a no-op (registration is safe session-wide).
  *  - `spark.graft.lineage.namespace`     — job + default dataset
  *    namespace (default "graft"; the reference uses "spark-k8s-hub").
  *  - `spark.graft.lineage.parentJobName` — job-name prefix (default:
  *    the Spark app name, whitespace → '_'), mirroring
  *    `spark.openlineage.parentJobName`.
  *  - `spark.graft.lineage.timeoutMs`     — per-POST timeout (2000).
  *
  * Scale + safety: the callback does NO Spark work (plan walking and a
  * bounded-queue enqueue only — delivery is [[AsyncHttpPoster]]'s
  * daemon thread), so a down lineage backend can never fail, block, or
  * slow a query; every derivation is wrapped so a plan shape this walk
  * has never seen degrades to fewer facets, not an error. Queries that
  * touch no named dataset (pure literals / local relations) are
  * skipped as noise. */
class OpenLineageListener extends QueryExecutionListener {
  private val log = org.apache.logging.log4j.LogManager.getLogger(getClass)

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    handle(funcName, qe, durationNs / 1000000L, failed = false)

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    handle(funcName, qe, 0L, failed = true)

  private def handle(funcName: String, qe: QueryExecution,
                     durationMs: Long, failed: Boolean): Unit =
    try {
      val conf = qe.sparkSession.conf
      conf.getOption("spark.graft.lineage.endpoint").foreach { url =>
        val namespace =
          conf.getOption("spark.graft.lineage.namespace").getOrElse("graft")
        val timeoutMs = conf.getOption("spark.graft.lineage.timeoutMs")
          .map(_.toLong).getOrElse(2000L)
        // Each derivation guarded independently: onFailure can carry a
        // plan that never analyzed (no executedPlan to walk).
        val outputs = scala.util.Try(Lineage.outputsOf(qe.analyzed)).getOrElse(Nil)
        val inputs =
          (scala.util.Try(Lineage.inputsOf(qe)).getOrElse(Nil) ++
            scala.util.Try(Lineage.logicalInputsOf(qe.analyzed)).getOrElse(Nil))
            .distinct.sorted.filterNot(outputs.contains)
        if (inputs.nonEmpty || outputs.nonEmpty) {
          val parent = conf.getOption("spark.graft.lineage.parentJobName")
            .getOrElse(qe.sparkSession.sparkContext.appName.trim
              .replaceAll("\\s+", "_"))
          // schema + columnLineage dataset facets (what DataHub renders
          // as column-level lineage): input schemas come from the leaf
          // relations, the output schema and per-column attribution
          // from the write command's query. Each independently guarded
          // — an unknown plan shape degrades to fewer facets.
          val inputSchemas = scala.util.Try(
            Lineage.inputSchemasOf(qe.analyzed).map { case (id, st) =>
              id -> st.fields.toSeq.map(f => f.name -> f.dataType.catalogString)
            }).getOrElse(Map.empty[String, Seq[(String, String)]])
          val writeQuery =
            scala.util.Try(Lineage.writeQueryOf(qe.analyzed)).toOption.flatten
          val outputSchema = writeQuery.map(q => scala.util.Try(
            q.output.map(a => a.name -> a.dataType.catalogString).toSeq)
            .getOrElse(Seq.empty)).getOrElse(Seq.empty)
          val colLineage = writeQuery.map(q => scala.util.Try(
            Lineage.columnOriginsOf(q).filter(_._2.nonEmpty))
            .getOrElse(Seq.empty)).getOrElse(Seq.empty)
          val json = OpenLineageListener.runEvent(
            if (failed) "FAIL" else "COMPLETE",
            jobName = s"$parent.$funcName", namespace = namespace,
            inputs = inputs, outputs = outputs, durationMs = durationMs,
            inputSchemas = inputSchemas, outputSchema = outputSchema,
            columnLineage = colLineage)
          OpenLineageListener.poster.offer(
            java.net.URI.create(url), timeoutMs, json)
        }
      }
    } catch {
      case NonFatal(e) =>
        log.warn(s"lineage capture for '$funcName' failed (the query is " +
          s"unaffected): $e")
    }
}

/** Streaming twin of [[OpenLineageListener]]: Structured Streaming
  * queries never fire QueryExecutionListener, so automatic capture
  * registers this StreamingQueryListener alongside it (one `enable`
  * wires both). One OpenLineage run per streaming query — the
  * OpenLineage runId IS the streaming runId, so all of a query's
  * events correlate: START at query start, RUNNING once per progress
  * batch carrying the batch's source/sink descriptions as
  * input/output datasets plus the batch duration, COMPLETE (or FAIL
  * with the exception present) at termination. Same endpoint confs,
  * same bounded-queue async delivery, same no-op-when-unset and
  * never-fail-the-query contract as the batch listener. */
class OpenLineageStreamingListener(session: SparkSession)
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  private val log = org.apache.logging.log4j.LogManager.getLogger(getClass)

  // WEAK session handle: this listener is the VALUE of the registry's
  // weak-KEYED map (OpenLineageListener.registered) — a strong session
  // field here would make the value reach the key and defeat weak
  // collection, pinning every enabled-then-discarded session forever.
  // A collected session has no live streams, so a cleared ref = no-op.
  private val sessionRef =
    new java.lang.ref.WeakReference[SparkSession](session)

  private def post(eventType: String, runId: java.util.UUID, name: String,
                   inputs: Seq[String], outputs: Seq[String],
                   durationMs: Long): Unit =
    try {
      val session = sessionRef.get()
      if (session == null) return
      val conf = session.conf
      conf.getOption("spark.graft.lineage.endpoint").foreach { url =>
        val namespace =
          conf.getOption("spark.graft.lineage.namespace").getOrElse("graft")
        val timeoutMs = conf.getOption("spark.graft.lineage.timeoutMs")
          .map(_.toLong).getOrElse(2000L)
        val parent = conf.getOption("spark.graft.lineage.parentJobName")
          .getOrElse(session.sparkContext.appName.trim.replaceAll("\\s+", "_"))
        val json = OpenLineageListener.runEvent(eventType,
          jobName = s"$parent.$name", namespace = namespace,
          inputs = inputs, outputs = outputs, durationMs = durationMs,
          runId = runId.toString)
        OpenLineageListener.poster.offer(
          java.net.URI.create(url), timeoutMs, json)
      }
    } catch {
      case NonFatal(e) =>
        log.warn(s"streaming lineage capture for '$name' failed (the " +
          s"query is unaffected): $e")
    }

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    post("START", e.runId,
      Option(e.name).getOrElse(s"stream_${e.id}"), Nil, Nil, 0L)

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    post("RUNNING", p.runId, Option(p.name).getOrElse(s"stream_${p.id}"),
      p.sources.toSeq.map(s =>
        OpenLineageStreamingListener.datasetOf(s.description)),
      Option(p.sink).map(s =>
        OpenLineageStreamingListener.datasetOf(s.description)).toSeq,
      p.batchDuration)
  }

  // QueryTerminatedEvent carries no name: terminal events use the
  // stable stream_<id> job name; the shared runId still ties them to
  // the named START/RUNNING run.
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    post(if (e.exception.isDefined) "FAIL" else "COMPLETE", e.runId,
      s"stream_${e.id}", Nil, Nil, 0L)
}

object OpenLineageStreamingListener {
  /** Source/sink descriptions name their dataset in brackets —
    * `FileStreamSource[file:/data/in]`, `FileSink[/data/out]` — so the
    * bracket payload is the dataset id; descriptions without one (e.g.
    * `MemorySink`) pass through whole. */
  private[metrics] def datasetOf(description: String): String = {
    val m = """\[(.+)\]""".r.findFirstMatchIn(description)
    m.map(_.group(1)).getOrElse(description)
  }
}

object OpenLineageListener {
  private[metrics] val poster = new AsyncHttpPoster("OpenLineageListener")

  /** Register automatic lineage on `spark` — the `enable_lineage=True`
    * UX (reference connector.py:136-144) as one call. Pass null to keep
    * a conf's existing/default value; returns the listener so callers
    * can `spark.listenerManager.unregister` it. Idempotent per session:
    * a second enable repoints the confs without stacking a duplicate
    * listener. */
  def enable(spark: SparkSession, endpoint: String,
             namespace: String): OpenLineageListener = {
    if (endpoint != null) spark.conf.set("spark.graft.lineage.endpoint", endpoint)
    if (namespace != null) spark.conf.set("spark.graft.lineage.namespace", namespace)
    registered.computeIfAbsent(spark, s => {
      val l = new OpenLineageListener
      s.listenerManager.register(l)
      // streaming queries never fire QueryExecutionListener — wire the
      // streaming twin in the same call so enable covers both engines
      val sl = new OpenLineageStreamingListener(s)
      s.streams.addListener(sl)
      (l, sl)
    })._1
  }

  def enable(spark: SparkSession): OpenLineageListener =
    enable(spark, null, null)

  /** Deregister and forget this session's listeners (tests, teardown). */
  def disable(spark: SparkSession): Unit = {
    val pair = registered.remove(spark)
    if (pair != null) {
      spark.listenerManager.unregister(pair._1)
      spark.streams.removeListener(pair._2)
    }
  }

  /** Wait until every captured event has been POSTed or dropped. */
  def flushAll(timeoutMs: Long = 10000): Boolean = poster.flush(timeoutMs)

  // Weak keys: a discarded session must not pin its listener (the
  // listener itself is held by the session's listener bus anyway).
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      (OpenLineageListener, OpenLineageStreamingListener)]())

  /** One OpenLineage RunEvent: run/job identity, input/output datasets
    * with `schema` and (outputs) `columnLineage` facets, duration.
    * Dataset ids that look like URIs split into
    * (scheme[://authority], path) per the OpenLineage file-dataset
    * naming convention; catalog identifiers keep the job namespace.
    *
    * @param inputSchemas  dataset id → (column, catalog type) — emitted
    *   as the spec's `schema` dataset facet on matching inputs
    * @param outputSchema  the written query's (column, catalog type)
    *   list — the `schema` facet on every output dataset
    * @param columnLineage output column → originating (dataset id,
    *   column) pairs — the `columnLineage` facet on outputs */
  private[metrics] def runEvent(eventType: String, jobName: String,
                                namespace: String, inputs: Seq[String],
                                outputs: Seq[String],
                                durationMs: Long,
                                runId: String = null,
                                inputSchemas: Map[String, Seq[(String, String)]] = Map.empty,
                                outputSchema: Seq[(String, String)] = Seq.empty,
                                columnLineage: Seq[(String, Seq[(String, String)])] = Seq.empty): String = {
    import MetricsJson.esc
    def schemaFacet(fields: Seq[(String, String)]): String =
      s""""schema":{"_producer":"graft/lineage",""" +
        s""""_schemaURL":"https://openlineage.io/spec/facets/1-1-1/SchemaDatasetFacet.json",""" +
        s""""fields":[${fields.map { case (n, t) =>
          s"""{"name":"${esc(n)}","type":"${esc(t)}"}""" }.mkString(",")}]}"""
    def columnLineageFacet(cols: Seq[(String, Seq[(String, String)])]): String =
      s""""columnLineage":{"_producer":"graft/lineage",""" +
        s""""_schemaURL":"https://openlineage.io/spec/facets/1-2-0/ColumnLineageDatasetFacet.json",""" +
        s""""fields":{${cols.map { case (out, origins) =>
          val fs = origins.map { case (dsId, col) =>
            val (ons, oname) = splitDataset(dsId, namespace)
            s"""{"namespace":"${esc(ons)}","name":"${esc(oname)}","field":"${esc(col)}"}"""
          }.mkString(",")
          s""""${esc(out)}":{"inputFields":[$fs]}"""
        }.mkString(",")}}}"""
    def ds(id: String, isOutput: Boolean): String = {
      val (ns, name) = splitDataset(id, namespace)
      val schema = if (isOutput) outputSchema
        else inputSchemas.getOrElse(id, Seq.empty)
      val facets =
        (if (schema.nonEmpty) Seq(schemaFacet(schema)) else Nil) ++
        (if (isOutput && columnLineage.nonEmpty)
          Seq(columnLineageFacet(columnLineage)) else Nil)
      val facetJson =
        if (facets.isEmpty) "" else s""","facets":{${facets.mkString(",")}}"""
      s"""{"namespace":"${esc(ns)}","name":"${esc(name)}"$facetJson}"""
    }
    val iso = java.time.Instant.now().toString
    // batch executions are one-event runs (fresh id); streaming passes
    // its stable per-query runId so START/RUNNING/COMPLETE correlate
    val rid = if (runId == null) UUID.randomUUID().toString else runId
    s"""{"eventType":"$eventType","eventTime":"$iso",""" +
      s""""producer":"graft/lineage",""" +
      s""""schemaURL":"https://openlineage.io/spec/1-0-5/OpenLineage.json",""" +
      s""""run":{"runId":"$rid","facets":{""" +
      s""""graftExecution":{"durationMs":$durationMs}}},""" +
      s""""job":{"namespace":"${esc(namespace)}","name":"${esc(jobName)}"},""" +
      s""""inputs":[${inputs.map(ds(_, isOutput = false)).mkString(",")}],""" +
      s""""outputs":[${outputs.map(ds(_, isOutput = true)).mkString(",")}]}"""
  }

  private[metrics] def splitDataset(id: String,
                                    default: String): (String, String) =
    try {
      val u = java.net.URI.create(id)
      val scheme = u.getScheme
      if (scheme == null) (default, id)
      else {
        val auth = Option(u.getAuthority).filter(_.nonEmpty)
        val ns = auth.map(a => s"$scheme://$a").getOrElse(scheme)
        val path = Option(u.getPath).filter(_.nonEmpty).getOrElse(id)
        (ns, path)
      }
    } catch { case NonFatal(_) => (default, id) }
}
