package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.functions.Exact.{sql => S}
import graft.sources.Tables

/** §B event-stream analytics (batch form; streaming variants in
  * graft.streaming). Covers the reference's time-partitioned event
  * tables (reference: k8s demo `days(ts)` partitioning,
  * 03_delta_demo.ipynb event tables) plus the time-series operators a
  * lakehouse needs: tumbling windows, sessionization, as-of joins,
  * funnels, top-k.
  *
  * Scale notes: every operator shuffles once on (user_id) or the window
  * bucket; sessionization and as-of are window-function formulations
  * (sort within partition) rather than self-joins, so cost is
  * O(n log n_per_key) with no quadratic blowup.
  *
  * Timestamps are truncated to seconds at scan: the source parquet
  * carries nanosecond precision, which Spark truncates to µs while other
  * engines keep ns — sub-second truncation makes every downstream value
  * representation-independent.
  */
object Events {

  private def events(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir).withColumn("ts", date_trunc("second", $"ts"))
  }
  private val eventsSql =
    "(SELECT event_id, date_trunc('second', ts) AS ts, user_id, event_type, value FROM events)"

  /** e1: tumbling 1-hour window aggregation — the batch twin of the
    * Structured Streaming query in graft.streaming. */
  val e1_tumbling_window: Relational.Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
           Exact.moneySum($"value").as("total_value"))
      .select($"window.start".as("hour_start"), $"event_type", $"n_events", $"total_value")
      .orderBy($"hour_start", $"event_type")
  }

  val e1_sql: String =
    s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
       | COUNT(*) AS n_events, ${S.moneySum("value")} AS total_value
       |FROM $eventsSql e
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** e2: gap-based sessionization (30-min inactivity closes a session).
    * lag → new-session flag → running sum = session id; one shuffle on
    * user_id, one sort per user. */
  val e2_sessionize: Relational.Q = (s, dir) => {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sess = events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
             unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           min($"ts").as("session_start"),
           max($"ts").as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  val e2_sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM $eventsSql e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, ts,
       |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       | MIN(ts) AS session_start, MAX(ts) AS session_end
       |FROM numbered GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** e3: as-of join — each event matched to the user's most recent
    * 'purchase' at-or-before it. Formulated as union + last_value
    * (ignore-nulls) over a per-user time sort: one shuffle, no range
    * self-join. DuckDB verifies with its native ASOF JOIN. */
  val e3_asof_join: Relational.Q = (s, dir) => {
    import s.implicits._
    val ev = events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
    // Tag purchases with ord=0 so that at equal timestamps the purchase
    // sorts before the event row and is visible to it (ASOF inclusive).
    val left = ev.select($"event_id", $"user_id", $"ts",
      lit(null).cast("timestamp").as("p_ts"), lit(1).as("ord"))
    val right = purchases.select(lit(null).cast("long").as("event_id"),
      $"user_id", $"p_ts".as("ts"), $"p_ts", lit(0).as("ord"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("last_purchase_ts", last($"p_ts", ignoreNulls = true).over(w))
      .filter($"event_id".isNotNull)
      .select($"event_id", $"user_id", $"ts", $"last_purchase_ts")
      .orderBy($"event_id")
  }

  val e3_sql: String =
    s"""SELECT e.event_id, e.user_id, e.ts, p.p_ts AS last_purchase_ts
       |FROM $eventsSql e
       |ASOF LEFT JOIN (
       |  SELECT user_id AS p_user, ts AS p_ts FROM $eventsSql x
       |  WHERE event_type = 'purchase') p
       |  ON e.user_id = p.p_user AND p.p_ts <= e.ts
       |ORDER BY e.event_id""".stripMargin

  /** e6: the same as-of semantics as e3, but through the CUSTOM PHYSICAL
    * OPERATOR (graft.plans.AsOfJoin: logical node → strategy → sort-merge
    * exec). Verified against DuckDB's native ASOF JOIN — and e3 — so the
    * custom plan's merge logic is oracle-checked end to end. */
  val e6_asof_custom: Relational.Q = (s, dir) => {
    import s.implicits._
    val ev = events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    graft.plans.AsOf.leftJoin(
      ev.select($"event_id", $"user_id", $"ts"), purchases,
      leftKey = "user_id", rightKey = "p_user",
      leftTime = "ts", rightTime = "p_ts")
      .select($"event_id", $"user_id", $"ts", $"p_ts".as("last_purchase_ts"))
      .orderBy($"event_id")
  }

  /** e4: ordered conversion funnel view→click→purchase: strict
    * first-occurrence ordering per user, aggregated to stage counts. */
  val e4_funnel: Relational.Q = (s, dir) => {
    import s.implicits._
    val firsts = events(s, dir)
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts")).as("t_view"),
           min(when($"event_type" === "click", $"ts")).as("t_click"),
           min(when($"event_type" === "purchase", $"ts")).as("t_purchase"))
    firsts.agg(
      sum(when($"t_view".isNotNull, 1L).otherwise(0L)).as("stage_view"),
      sum(when($"t_view" < $"t_click", 1L).otherwise(0L)).as("stage_click"),
      sum(when($"t_view" < $"t_click" && $"t_click" < $"t_purchase", 1L)
        .otherwise(0L)).as("stage_purchase"))
  }

  val e4_sql: String =
    s"""SELECT
       | CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_view,
       | CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
       | CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
       |FROM (
       |  SELECT user_id,
       |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
       |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
       |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
       |  FROM $eventsSql e GROUP BY user_id) t""".stripMargin

  /** e7: range join via time-bucket banding — pairs of events by the
    * same user where the second falls within 60s after the first,
    * rolled up by event-type transition. A naive range join is a
    * per-user cross product; banding probes exactly the two buckets
    * that can contain matches, so the join is equi on (user, bucket)
    * and scales like a hash join. The oracle runs the plain inequality
    * join — identical results. */
  val e7_range_join: Relational.Q = (s, dir) => {
    import s.implicits._
    val ev = events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp($"ts").as("sec"))
    val probe = ev
      .withColumn("bucket", explode(array($"sec".divide(60).cast("long"),
        $"sec".divide(60).cast("long") + 1)))
      .select($"user_id", $"sec".as("sec_a"), $"event_type".as("type_a"),
        $"event_id".as("id_a"), $"bucket")
    val build = ev
      .select($"user_id", $"sec".as("sec_b"), $"event_type".as("type_b"),
        ($"sec".divide(60)).cast("long").as("bucket"))
    probe.join(build, Seq("user_id", "bucket"))
      .filter($"sec_b" > $"sec_a" && $"sec_b" <= $"sec_a" + 60)
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy($"type_a", $"type_b")
  }

  val e7_sql: String =
    s"""SELECT a.event_type AS type_a, b.event_type AS type_b,
       | COUNT(*) AS n_transitions
       |FROM (SELECT user_id, event_type, epoch(ts) AS sec FROM $eventsSql e1) a
       | JOIN (SELECT user_id, event_type, epoch(ts) AS sec FROM $eventsSql e2) b
       |  ON a.user_id = b.user_id AND b.sec > a.sec AND b.sec <= a.sec + 60
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** e5: global top-k most active users (deterministic tie-break). */
  val e5_topk_users: Relational.Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
           Exact.moneySum($"value").as("total_value"))
      .orderBy($"n_events".desc, $"user_id")
      .limit(10)
  }

  val e5_sql: String =
    s"""SELECT user_id, COUNT(*) AS n_events, ${S.moneySum("value")} AS total_value
       |FROM $eventsSql e GROUP BY user_id
       |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin

  /** e8: semi-structured props — extract the JSON payload's `k` field
    * and profile it per event type. `from_json` with an explicit schema
    * parses once per row scan-side (schema-on-read; no shuffle added —
    * the agg is the usual partial-agg exchange). A malformed payload
    * yields NULL and is excluded by the n_k count, mirroring
    * `json_extract`'s NULL semantics in the oracle. */
  val e8_json_props: Relational.Q = (s, dir) => {
    import s.implicits._
    val k = from_json($"props", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType))))("k")
    Tables.events(s, dir)
      .select($"event_type", k.as("k"))
      .groupBy($"event_type")
      .agg(count($"k").as("n_k"),
           sum($"k").cast("bigint").as("sum_k"),
           min($"k").as("min_k"),
           max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val e8_sql: String =
    """SELECT event_type, COUNT(k) AS n_k, CAST(SUM(k) AS BIGINT) AS sum_k,
      | MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** e9: cohort retention — users are cohorted by the week of their
    * first event (integer weeks since the corpus epoch, engine-
    * independent day arithmetic — no locale-sensitive week truncation),
    * then each (cohort, week-offset) cell counts how many of that
    * cohort's users were active that week. The standard product-
    * analytics retention matrix.
    *
    * Scale shape: first-touch is a min-aggregate on user_id (uniform
    * key, map-side combined); activity is a distinct (user, week)
    * projection; the cohort join is keyed on user_id — both sides
    * shuffle once on the same key and the matrix itself is
    * weeks² ≈ tiny. */
  val e9_cohort_retention: Relational.Q = (s, dir) => {
    import s.implicits._
    val epoch = to_date(lit("2024-01-01"))
    // floor, not cast: cast truncates toward zero, so pre-epoch days
    // -3 and +3 would collide in week 0 — the DuckDB oracle FLOORs.
    val wk = floor(datediff(to_date($"ts"), epoch) / 7).cast("long")
    val e = events(s, dir).select($"user_id", wk.as("week"))
    val cohorts = e.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    val active = e.distinct()
    active.join(cohorts, "user_id")
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_active"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val e9_sql: String =
    s"""WITH e AS (
       |  SELECT user_id,
       |    CAST(FLOOR(date_diff('day', DATE '2024-01-01',
       |      CAST(date_trunc('second', ts) AS DATE)) / 7) AS BIGINT) AS week
       |  FROM events),
       |cohorts AS (SELECT user_id, MIN(week) AS cohort_week
       |            FROM e GROUP BY user_id),
       |active AS (SELECT DISTINCT user_id, week FROM e)
       |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       | COUNT(DISTINCT a.user_id) AS n_active
       |FROM active a JOIN cohorts c USING (user_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** e10: sliding (hopping) window — 1-hour windows advancing every
    * 15 minutes, so each event contributes to exactly 4 overlapping
    * windows. Spark's native `window(ts, len, slide)` expands the
    * assignment scan-side (a 4-row generate, epoch-aligned starts);
    * the aggregation shuffles once on the window key like any tumbling
    * agg — the overlap factor multiplies map-side rows, never
    * reducer count. The oracle reproduces the epoch-aligned window
    * arithmetic with integer second math. */
  val e10_sliding_window: Relational.Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct($"user_id").as("n_users"))
      .select($"window.start".as("window_start"), $"n_events", $"n_users")
      .orderBy($"window_start")
  }

  val e10_sql: String =
    """WITH w AS (
      |  SELECT make_timestamp(CAST((floor(epoch(date_trunc('second', ts))/900)*900
      |           - k*900)*1000000 AS BIGINT)) AS window_start, user_id
      |  FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) ks)
      |SELECT window_start, COUNT(*) AS n_events,
      | COUNT(DISTINCT user_id) AS n_users
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  /** e11: time-series gap fill + forward fill — resample each user's
    * activity to a dense hourly grid between their first and last
    * event, filling silent hours with zero events and carrying the
    * last observed hourly revenue forward (the standard
    * resample/ffill primitive for downstream feature windows).
    *
    * Scale shape: the hourly pre-aggregate is one shuffle on
    * (user, hour); the dense grid is generated scan-side per user with
    * `sequence()` (rows ∝ users × their own span — no global
    * calendar cross join); fill is a left join co-keyed with the grid
    * plus one ordered window per user. Sums are decimal-exact before
    * the double surface, so the forward-filled values are
    * bit-identical cross-engine. */
  val e11_gap_fill: Relational.Q = (s, dir) => {
    import s.implicits._
    val hourly = events(s, dir)
      .filter($"user_id" < 10)
      .groupBy($"user_id", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n_events"),
           Exact.moneySum($"value").as("hour_value"))
    val grid = hourly.groupBy($"user_id")
      .agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id",
        explode(sequence($"h0", $"h1", expr("INTERVAL 1 HOUR"))).as("h"))
    val byUser = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select($"user_id", $"h",
        coalesce($"n_events", lit(0L)).as("n_events"),
        last($"hour_value", ignoreNulls = true).over(byUser).as("ffill_value"))
      .orderBy($"user_id", $"h")
  }

  val e11_sql: String =
    s"""WITH hourly AS (
       |  SELECT user_id, date_trunc('hour', date_trunc('second', ts)) AS h,
       |   COUNT(*) AS n_events, ${S.moneySum("value")} AS hour_value
       |  FROM events WHERE user_id < 10 GROUP BY 1, 2),
       |grid AS (
       |  SELECT user_id, UNNEST(generate_series(MIN(h), MAX(h),
       |    INTERVAL 1 HOUR)) AS h
       |  FROM hourly GROUP BY user_id)
       |SELECT g.user_id AS user_id, g.h AS h,
       | COALESCE(hy.n_events, 0) AS n_events,
       | last_value(hy.hour_value IGNORE NULLS) OVER (
       |   PARTITION BY g.user_id ORDER BY g.h
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
       |FROM grid g LEFT JOIN hourly hy
       |  ON g.user_id = hy.user_id AND g.h = hy.h
       |ORDER BY user_id, h""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "e11_gap_fill" -> e11_gap_fill,
    "e10_sliding_window" -> e10_sliding_window,
    "e9_cohort_retention" -> e9_cohort_retention,
    "e8_json_props" -> e8_json_props,
    "e1_tumbling_window" -> e1_tumbling_window,
    "e2_sessionize" -> e2_sessionize,
    "e3_asof_join" -> e3_asof_join,
    "e4_funnel" -> e4_funnel,
    "e5_topk_users" -> e5_topk_users,
    "e6_asof_custom" -> e6_asof_custom,
    "e7_range_join" -> e7_range_join,
  )

  val oracles: Map[String, String] = Map(
    "e11_gap_fill" -> e11_sql,
    "e10_sliding_window" -> e10_sql,
    "e9_cohort_retention" -> e9_sql,
    "e8_json_props" -> e8_sql,
    "e6_asof_custom" -> e3_sql,
    "e7_range_join" -> e7_sql,
    "e1_tumbling_window" -> e1_sql,
    "e2_sessionize" -> e2_sql,
    "e3_asof_join" -> e3_sql,
    "e4_funnel" -> e4_sql,
    "e5_topk_users" -> e5_sql,
  )
}
