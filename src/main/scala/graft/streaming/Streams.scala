package graft.streaming

import java.util.UUID
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.functions.Exact
import graft.operators.Relational
import graft.sources.Tables

/** §H Structured Streaming over the events table.
  *
  * The parquet events directory drives a real streaming query
  * (readStream → transform → memory sink, drained synchronously with
  * processAllAvailable) so the streaming path itself is what's
  * verified — h1's result must equal the batch tumbling-window oracle.
  *
  * Scale notes: in production these run with file/Kafka sources and
  * checkpointed sinks; the aggregations are keyed on (window,
  * event_type) / event_id / user_id, all shuffle-partitioned, and the
  * watermark bounds state size. Nothing here is driver-resident.
  */
object Streams {

  /** events schema for the streaming reader (file sources need an
    * explicit schema). The ts field's physical type is NOT hard-coded:
    * the batch reader's footer inference decides it (INT64 nanos →
    * LongType, TIMESTAMP(MICROS) → TimestampNTZType), and the stream
    * declares the same type plus the same normalization, so batch and
    * stream can never drift by a unit — the silent-1000×-compression
    * failure mode this replaced. */
  private def rawSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // probe the batch footer for the physical ts type (metadata-only,
    // no data read; handle cached per session), then mirror
    // Tables.events' normalization exactly
    val tsType = Tables.load(s, dir, "events").schema("ts").dataType
    // the streaming file source wants a directory; select the single
    // events file with a glob filter
    val raw = s.readStream.schema(rawSchema(tsType))
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    Tables.normalizeTs(raw, tsType)
      .withColumn("ts", date_trunc("second", col("ts")))
  }

  /** Batch≡stream ts-parity probe (spec hook): the event-time range as
    * seen by the STREAMING reader. Any unit drift between the stream
    * schema and the batch loader (the failure mode that silently
    * compressed event time 1000× when the testdata's physical ts type
    * changed) shows up here as a range mismatch against the batch
    * read's min/max. */
  private[graft] def streamTsRange(s: SparkSession, dir: String)
      : (java.sql.Timestamp, java.sql.Timestamp) = {
    val r = drain(s, OutputMode.Complete()) { s2 =>
      eventStream(s2, dir).agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    }.collect()(0)
    (r.getTimestamp(0), r.getTimestamp(1))
  }

  /** Run a streaming aggregate to completion against the finite input
    * and return the sink table. RocksDB state store: the default
    * HDFS-backed provider snapshots every partition's full state map
    * per batch — with join/dedup state in the 100k-row range that
    * dominates wall-time; RocksDB writes incrementally. */
  private def drain(parent: SparkSession, mode: OutputMode,
                    defaultStateParts: Int = -1)
                   (mk: SparkSession => DataFrame): DataFrame = {
    // Conf that shapes the streaming query runs on a CLONED session,
    // never the caller's. The state-store partition count is locked into
    // the checkpoint from spark.sql.shuffle.partitions at query start
    // (Structured Streaming has no per-query knob for it), and each
    // partition opens its own store instance (×4 for a stream-stream
    // join) whose open/snapshot overhead dominates wall time at micro
    // scale — so benches cap it. Mutating the shared session for that
    // would leak a shrunken value into concurrent queries mid-flight;
    // newSession() shares the SparkContext (so the memory-sink table
    // stays readable) with isolated SQL conf. The confs that shape this
    // query are copied over from the parent explicitly.
    val s = parent.newSession()
    s.conf.set("spark.sql.session.timeZone",
      parent.conf.get("spark.sql.session.timeZone"))
    s.conf.set("spark.sql.shuffle.partitions",
      parent.conf.get("spark.sql.shuffle.partitions"))
    // RocksDB by default: the HDFS-backed provider snapshots every
    // partition's full state map per batch — with join/dedup state in
    // the 100k-row range that dominates wall-time; RocksDB writes
    // incrementally. Overridable for A/B (spark.graft.streaming.
    // stateProvider=hdfs) since the trade inverts for tiny state.
    if (!parent.conf.getOption("spark.graft.streaming.stateProvider")
        .contains("hdfs"))
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Skip the trailing NO-DATA micro-batch Spark runs after the last
    // data batch to advance the watermark: for these finite drains it
    // exists only to evict state that the query teardown is about to
    // drop anyway, and in Complete mode it RECOMPUTES the whole
    // aggregation and rewrites the sink — a full duplicate pass per
    // query. No drained query's OUTPUT depends on it: the h-family
    // emits eagerly (Complete-mode aggs re-emit per data batch; inner
    // stream-stream joins and dropDuplicates emit on arrival), which
    // the batch≡stream specs and the driver oracle pin.
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    parent.conf.getOption("spark.graft.streaming.statePartitions") match {
      case Some(p) => s.conf.set("spark.sql.shuffle.partitions", p)
      case None if defaultStateParts > 0 =>
        // per-query floor for queries whose streaming STATE is tiny
        // (e.g. h9's per-flagged-doc counts): each state partition
        // opens its own RocksDB instance per batch, so 32 stores for a
        // handful of keys is pure open/snapshot overhead. Map-side
        // parallelism is unaffected — the heavy phases repartition
        // explicitly.
        s.conf.set("spark.sql.shuffle.partitions", defaultStateParts.toString)
      case None =>
    }
    val name = "graft_sink_" + UUID.randomUUID().toString.replace("-", "")
    // Input rows are totalled by a listener, NOT q.recentProgress — that
    // is a ring buffer capped at numRecentProgressUpdates (default 100),
    // so a drain taking >100 micro-batches with its input arriving early
    // would have its early batches rotated out and trip the guard
    // spuriously. The listener sees every progress event; this session
    // runs exactly one query, so no id filtering is needed.
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0)
    val terminated = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        inputRows.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        terminated.countDown()
    }
    s.streams.addListener(listener)
    val delivered =
      try {
        val q = mk(s).writeStream.outputMode(mode).format("memory").queryName(name).start()
        q.processAllAvailable()
        q.stop()
        // the listener bus is async but ordered: the terminated event is
        // delivered after every progress event of this query, so once it
        // lands the accumulated total is complete
        terminated.await(60, java.util.concurrent.TimeUnit.SECONDS)
      } finally s.streams.removeListener(listener)
    // A finite test/bench input that yields ZERO rows means the source
    // matched nothing (e.g. the driver renamed events.parquet and the
    // pathGlobFilter silently selected an empty file set) — that must
    // crash loudly, not return an empty green-looking result. A stalled
    // listener bus makes the count indeterminate — distinguish that
    // from a genuine zero, never report the wrong one.
    if (inputRows.get == 0)
      throw new IllegalStateException(
        if (delivered)
          "streaming source read 0 input rows — source glob matched no data " +
            "(environment drift?); refusing to return an empty result"
        else
          "listener bus did not deliver streaming progress within 60s — " +
            "input-row count indeterminate; refusing to return a result")
    s.table(name)
  }

  /** h1: watermarked tumbling-window aggregation — must equal the batch
    * e1 result (same oracle SQL shape). */
  val h1_stream_window: Relational.Q = (s, dir) => {
    import s.implicits._
    drain(s, OutputMode.Complete()) { s2 =>
      eventStream(s2, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
             Exact.moneySum($"value").as("total_value"))
        .select($"window.start".as("hour_start"), $"event_type",
          $"n_events", $"total_value")
    }.orderBy($"hour_start", $"event_type")
  }

  val h1_sql: String =
    s"""SELECT date_trunc('hour', date_trunc('second', ts)) AS hour_start,
       | event_type, COUNT(*) AS n_events,
       | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** h2: streaming dedup — the input is the stream unioned with itself
    * (every event duplicated), dropDuplicates on (event_id, ts)
    * restores exact-once, and the per-type counts equal the batch
    * counts. The event-time column MUST be part of the dedup subset:
    * Spark only evicts dropDuplicates state for key combinations whose
    * subset includes the watermarked column, so dedup on event_id
    * alone would hold one state row per event FOREVER — an unbounded
    * state leak on a real at-least-once source. (event_id, ts) is the
    * exact-duplicate-redelivery shape; for redeliveries whose arrival
    * ts may differ, use dropDuplicatesWithinWatermark (the h10
    * pattern). */
  val h2_stream_dedup: Relational.Q = (s, dir) => {
    import s.implicits._
    drain(s, OutputMode.Complete()) { s2 =>
      eventStream(s2, dir).unionByName(eventStream(s2, dir))
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id", "ts")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"))
    }.orderBy($"event_type")
  }

  val h2_sql: String =
    """SELECT event_type, COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              n_events: Int)

  /** h3: custom stateful sessionization with flatMapGroupsWithState —
    * emits a session record when a 30-minute gap closes it. Covered by
    * StreamingSpec (unbounded tail sessions never emit on a finite
    * stream, so no batch oracle). */
  def h3_stream_sessionize(s: SparkSession, dir: String): Dataset[SessionOut] = {
    import s.implicits._
    drain(s, OutputMode.Append()) { s2 =>
      eventStream(s2, dir).as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
          sessionFn)
        .toDF()
    }.as[SessionOut]
  }

  private[streaming] def sessionFn(
      userId: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val gapMs = 30 * 60 * 1000L
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(st) if t - st.last <= gapMs =>
          cur = Some(st.copy(last = t, n = st.n + 1))
        case Some(st) =>
          closed += SessionOut(userId, new java.sql.Timestamp(st.start), st.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach(state.update)
    closed.iterator
  }

  /** h4: checkpointed continuous ingest into a GraftTable — the
    * streaming counterpart of the reference's bronze-layer loaders:
    * readStream → the NATIVE graft streaming sink
    * (`writeStream.format(GraftSource).start(path)`, the Delta-sink
    * analog) — each micro-batch lands as one `stream-append#<batchId>`
    * table commit, and a batch replayed after a crash is detected in
    * the history and skipped (exactly-once, the Delta txn-marker
    * idiom; sink mechanics spec'd in CatalogSpec). The query result is
    * the per-type rollup read back FROM the ingested table; the oracle
    * recomputes it from the raw events. */
  val h4_stream_ingest: Relational.Q = (s, dir) => {
    import s.implicits._
    val target = graft.TempRoots.create("graft_ingest_").toString + "/t"
    val checkpoint = graft.TempRoots.create("graft_ingest_ckpt_").toString
    val q = eventStream(s, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .writeStream
      .format("graft.sources.v2.GraftSource")
      .option("checkpointLocation", checkpoint)
      .start(target)
    q.processAllAvailable()
    q.stop()
    graft.sources.GraftTable.load(s, target).read()
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), Exact.moneySum($"value").as("total_value"))
      .orderBy($"event_type")
  }

  val h4_sql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** h5: stream-stream interval join — each 'view' joined to the same
    * user's 'purchase' events landing within 60 s after it, both sides
    * watermarked so join state is bounded (the production shape for
    * click-attribution at scale). The joined pairs drain to the sink
    * and roll up in batch; the oracle recomputes the same interval join
    * relationally. */
  val h5_stream_join: Relational.Q = (s, dir) => {
    import s.implicits._
    drain(s, OutputMode.Append()) { s2 =>
      // one source, self-joined: both sides share the stream scan
      val ev = eventStream(s2, dir)
      val views = ev
        .filter($"event_type" === "view")
        .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id"))
        .withWatermark("view_ts", "1 hour")
      val purchases = ev
        .filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
        .withWatermark("p_ts", "1 hour")
      views.join(purchases,
        $"user_id" === $"p_user" &&
          $"p_ts" > $"view_ts" && $"p_ts" <= $"view_ts" + expr("INTERVAL 60 SECONDS"))
        .select($"user_id", $"view_id", $"p_id")
    }.groupBy($"user_id").agg(count(lit(1)).as("n_attributed"))
      .orderBy($"user_id")
  }

  val h5_sql: String =
    """SELECT v.user_id, COUNT(*) AS n_attributed
      |FROM (SELECT user_id, date_trunc('second', ts) AS view_ts FROM events
      |      WHERE event_type = 'view') v
      |JOIN (SELECT user_id AS p_user, date_trunc('second', ts) AS p_ts FROM events
      |      WHERE event_type = 'purchase') p
      |  ON v.user_id = p.p_user
      | AND p.p_ts > v.view_ts AND p.p_ts <= v.view_ts + INTERVAL 60 SECOND
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin

  /** h6: continuous CDC upsert — the streaming "latest state per
    * entity" silver table: each micro-batch reduces to its last event
    * per user (window over the batch, bounded state) and MERGEs into a
    * GraftTable keyed on user_id. The production shape for change-data
    * feeds: upsert-by-key into a versioned table, one merge commit per
    * batch; the table's directory-granular copy-on-write keeps the
    * rewrite proportional to the touched key range, not the table. The
    * result read back is exactly "latest event per user", which the
    * oracle recomputes relationally. */
  val h6_stream_cdc_merge: Relational.Q = (s, dir) => {
    import s.implicits._
    val target = graft.TempRoots.create("graft_cdc_").toString + "/t"
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value")
    // pre-created empty target: every batch takes the MERGE path
    val schema = Tables.events(s, dir).select(cols.map(col): _*).schema
    graft.sources.GraftTable.create(s, target, s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    val q = eventStream(s, dir)
      .select(cols.map(col): _*)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        graft.sources.GraftTable.load(s, target)
          .merge(latest, Seq("user_id")): Unit
      }
      .start()
    q.processAllAvailable()
    q.stop()
    graft.sources.GraftTable.load(s, target).read()
      .select(cols.map(col): _*)
      .orderBy($"user_id")
  }

  val h6_sql: String =
    """SELECT user_id, ts, event_id, event_type, value FROM (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM (SELECT user_id, date_trunc('second', ts) AS ts, event_id,
      |          event_type, value FROM events) e) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** h7: watermarked SLIDING-window aggregation (1 h windows every
    * 15 min — each event feeds 4 overlapping window states). The
    * sliding assignment is the same scan-side expand as batch e10;
    * state size is windows-in-watermark × groups, bounded by the
    * watermark horizon like any windowed agg. Must equal the batch
    * sliding-window result. */
  val h7_stream_sliding: Relational.Q = (s, dir) => {
    import s.implicits._
    drain(s, OutputMode.Complete()) { s2 =>
      eventStream(s2, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"),
             Exact.moneySum($"value").as("total_value"))
        .select($"window.start".as("window_start"), $"n_events", $"total_value")
    }.orderBy($"window_start")
  }

  val h7_sql: String =
    """WITH w AS (
      |  SELECT make_timestamp(CAST((floor(epoch(date_trunc('second', ts))/900)*900
      |           - k*900)*1000000 AS BIGINT)) AS window_start, value
      |  FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) ks)
      |SELECT window_start, COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  /** h8: NATIVE session windows — `session_window(ts, gap)` instead of
    * the lag/cumsum composition (e2) or hand-rolled state
    * (h3/flatMapGroupsWithState): the engine merges each event's
    * [ts, ts+gap) window with overlapping ones and expires sessions
    * once the watermark passes their end, so state is bounded by OPEN
    * sessions only. Two events exactly `gap` apart do NOT merge
    * (half-open windows) — the oracle breaks on `diff >= gap` to
    * match. */
  val h8_stream_session: Relational.Q = (s, dir) => {
    import s.implicits._
    drain(s, OutputMode.Complete()) { s2 =>
      eventStream(s2, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"session_window.start".as("session_start"), $"user_id", $"n_events")
    }.orderBy($"user_id", $"session_start")
  }

  val h8_sql: String =
    """WITH e AS (SELECT user_id, date_trunc('second', ts) AS ts FROM events),
      |x AS (SELECT user_id, ts,
      |        CASE WHEN lag(ts) OVER w IS NULL
      |               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |             THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts,
      |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM x)
      |SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Streaming read of the documents table. The explicit schema the
    * file source demands comes from the BATCH reader's footer
    * inference — never hard-coded physical types, so a regenerated
    * documents.parquet with different physical widths cannot silently
    * desync the stream from the batch view (the failure class the
    * events ts drift exposed). */
  private def docStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(Tables.documents(s, dir).schema)
      // (documents handle is session-cached in Tables.load)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)

  /** h9: STREAM-STATIC decontamination — continuously arriving training
    * documents probed against a fixed benchmark corpus. The static side
    * is the p8 Bloom bitset (built once batch-side, fixed bytes at any
    * benchmark size) riding the streaming plan as a literal, so every
    * micro-batch filters scan-side with no stream-static join state at
    * all; the only streaming state is the per-doc count aggregate.
    * This is the production shape for "filter the firehose against a
    * reference set": reference updates swap in a new literal/broadcast,
    * stream state stays bounded. Rows-only driver check; equality with
    * batch p8 is spec-asserted. */
  val h9_stream_decontam: Relational.Q = (s, dir) => {
    import s.implicits._
    val n = s.conf.getOption("spark.graft.text.contamNgram")
      .map(_.toInt).getOrElse(13)
    val mBits = s.conf.getOption("spark.graft.text.bloomBits")
      .map(_.toInt).getOrElse(1 << 20)
    val kHashes = 5
    // spread guard: the benchmark-side shingle+hash pass is the heavy
    // batch stage here, and a single-file corpus scans as 1-2 tasks
    val bloomBytes = graft.sources.Tables.documentsSpread(s, dir)
      .filter($"source" === "src0")
      .select(explode(graft.functions.TextFunctions.shinglesOfTokens(
        graft.functions.TextFunctions.tokens($"text"), n)).as("g"))
      .agg(graft.functions.Bloom.bloom(xxhash64($"g"), mBits, kHashes).as("b"))
      .first().getAs[Array[Byte]]("b")
    // the only streaming state is the per-flagged-doc count: floor the
    // state-partition width so RocksDB instance open/snapshot overhead
    // never dominates at micro scale (map parallelism is repartitioned
    // explicitly below)
    drain(s, OutputMode.Complete(), defaultStateParts = 8) { s2 =>
      docStream(s2, dir)
        .filter($"source" =!= "src0")
        // the file stream source yields ONE partition per input file —
        // without this exchange the whole 13-gram explode+probe (the
        // heavy map phase) runs on a single core per file
        .repartition(s2.sparkContext.defaultParallelism)
        .select($"doc_id", explode(graft.functions.TextFunctions.shinglesOfTokens(
          graft.functions.TextFunctions.tokens($"text"), n)).as("g"))
        .select($"doc_id", xxhash64($"g").as("h"))
        .filter(graft.functions.Bloom.might_contain(lit(bloomBytes), $"h", kHashes))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_flagged_ngrams"))
    }.orderBy($"doc_id")
  }

  /** h10: STREAM-STATIC near-duplicate flagging — continuously arriving
    * documents (sources src18/src19, the d9 delta) checked for SimHash
    * near-duplicates of a FIXED base corpus at ingest time. The static
    * side is the base corpus's quarter-block signature index, built
    * once batch-side and persisted across micro-batches; the stream
    * side computes each arriving doc's 64-bit signature STATELESSLY in
    * the scan projection ([[graft.functions.SimHashAgg.simhashOfTokens]]
    * — no streaming aggregate, so no per-batch shuffle state), then a
    * stream-static equi-join on (blk_id, blk) yields candidates and the
    * exact hamming filter confirms. The only streaming state is the
    * pair dedup (a pair matching on several quarters). At 100 TB the
    * block index is a maintained table and the probe is the same
    * equi-join; index updates swap in a new static side. Rows-only
    * driver check; equality with the batch twin is spec-asserted. */
  val h10_stream_neardup: Relational.Q = (s, dir) => {
    import s.implicits._
    // the hot-bucket cap (spark.graft.dedup.maxBandBucket) applies to
    // the STATIC index side — an over-cap quarter value never enters
    // the stream-static join, bounding per-batch candidate fan-out
    val baseBlocks = graft.operators.Dedup.capBuckets(
      graft.operators.Dedup
        .simHashBlocks(graft.operators.Dedup.simHashSignatures(
          graft.sources.Tables.documents(s, dir)
            .filter(!$"source".isin("src18", "src19")),
          "doc_id", "text")),
      Seq("blk_id", "blk"))
      .select($"doc_id".as("doc_a"), $"sig".as("sig_a"), $"blk_id", $"blk")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // streaming state here is only the pair dedup — same tiny-state
      // floor as h9
      drain(s, OutputMode.Append(), defaultStateParts = 8) { s2 =>
        val probe = docStream(s2, dir)
          .filter($"source".isin("src18", "src19"))
          .repartition(s2.sparkContext.defaultParallelism)
          .select($"doc_id",
            graft.functions.SimHashAgg.simhashOfTokens(
              graft.functions.TextFunctions.tokens($"text")).as("sig"))
        graft.operators.Dedup.simHashBlocks(probe)
          .select($"doc_id".as("doc_b"), $"sig".as("sig_b"), $"blk_id", $"blk",
            // ingest-time watermark BOUNDS the pair-dedup state (the
            // only streaming state): a pair matching several quarters
            // in one window dedups exactly; beyond the window the
            // flagging is at-least-once — the right trade for an
            // unbounded crawl (state would otherwise grow one entry
            // per ever-flagged pair, forever)
            current_timestamp().as("ingest_ts"))
          .withWatermark("ingest_ts", "1 hour")
          .join(baseBlocks, Seq("blk_id", "blk"))
          .select($"doc_a", $"doc_b", $"ingest_ts",
            bit_count($"sig_a".bitwiseXOR($"sig_b")).as("hamming"))
          .filter($"hamming" <= 3)
          .dropDuplicatesWithinWatermark("doc_a", "doc_b")
          .select($"doc_a", $"doc_b", $"hamming")
      }.orderBy($"doc_a", $"doc_b")
    } finally baseBlocks.unpersist(false)
  }

  val queries: Map[String, Relational.Q] = Map(
    "h10_stream_neardup" -> h10_stream_neardup,
    "h9_stream_decontam" -> h9_stream_decontam,
    "h8_stream_session" -> h8_stream_session,
    "h7_stream_sliding" -> h7_stream_sliding,
    "h1_stream_window" -> h1_stream_window,
    "h2_stream_dedup" -> h2_stream_dedup,
    "h4_stream_ingest" -> h4_stream_ingest,
    "h5_stream_join" -> h5_stream_join,
    "h6_stream_cdc_merge" -> h6_stream_cdc_merge,
  )

  val oracles: Map[String, String] = Map(
    "h8_stream_session" -> h8_sql,
    "h7_stream_sliding" -> h7_sql,
    "h1_stream_window" -> h1_sql,
    "h2_stream_dedup" -> h2_sql,
    "h4_stream_ingest" -> h4_sql,
    "h5_stream_join" -> h5_sql,
    "h6_stream_cdc_merge" -> h6_sql,
  )
}
