package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.functions.Exact.{sql => S}
import graft.sources.Tables

/** §A advanced aggregation shapes: grouping sets, multi-distinct, pivot,
  * conditional aggregation, reproducible statistics.
  *
  * Scale notes: ROLLUP uses Spark's Expand (one shuffle, grouping-id
  * tagged rows); count(distinct) pairs expand + two-phase agg — both
  * partial-aggregate before the shuffle. The stats profile computes
  * variance from exact decimal power sums so the result is identical
  * under any partitioning (a raw stddev over doubles is not).
  */
object Aggregations {

  /** q9: ROLLUP (region, nation) revenue hierarchy. nation/region joins
    * are broadcast; NULL subtotal rows come from Spark's native expand. */
  val q9_rollup: Relational.Q = (s, dir) => {
    import s.implicits._
    val geo = broadcast(Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey"))
    Tables.customer(s, dir)
      .join(geo, $"c_nationkey" === $"n_nationkey")
      .join(Tables.orders(s, dir), $"o_custkey" === $"c_custkey")
      .rollup($"r_name", $"n_name")
      .agg(Exact.moneySum($"o_totalprice").as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val q9_sql: String =
    s"""SELECT r_name, n_name, ${S.moneySum("o_totalprice")} AS revenue,
       | COUNT(*) AS n_orders
       |FROM customer
       | JOIN nation ON c_nationkey = n_nationkey
       | JOIN region ON n_regionkey = r_regionkey
       | JOIN orders ON o_custkey = c_custkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** q10: multi-distinct aggregation per group. */
  val q10_distinct_agg: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_suppkey").as("n_suppliers"),
           countDistinct($"l_partkey").as("n_parts"),
           countDistinct($"l_orderkey").as("n_orders"),
           count(lit(1)).as("n_lines"))
      .orderBy($"l_returnflag")
  }

  val q10_sql: String =
    """SELECT l_returnflag,
      | COUNT(DISTINCT l_suppkey) AS n_suppliers,
      | COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_orderkey) AS n_orders,
      | COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q11: pivot order revenue status×priority into a wide table. Uses
    * Spark's native pivot with explicit value list (no extra pass to
    * discover values), columns renamed to SQL-safe aliases. */
  val q11_pivot: Relational.Q = (s, dir) => {
    import s.implicits._
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val aliases = Seq("urgent", "high", "medium", "not_specified", "low")
    val p = Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .pivot("o_orderpriority", prios)
      .agg(Exact.moneySum($"o_totalprice"))
    prios.zip(aliases).foldLeft(p) { case (df, (v, a)) => df.withColumnRenamed(v, a) }
      .orderBy($"o_orderstatus")
  }

  val q11_sql: String = {
    val cases = Seq(
      "1-URGENT" -> "urgent", "2-HIGH" -> "high", "3-MEDIUM" -> "medium",
      "4-NOT SPECIFIED" -> "not_specified", "5-LOW" -> "low",
    ).map { case (v, a) =>
      s"CAST(SUM(CASE WHEN o_orderpriority = '$v' THEN ${S.dec4("o_totalprice")} END) AS DOUBLE) AS $a"
    }.mkString(",\n ")
    s"""SELECT o_orderstatus,
       | $cases
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  }

  /** q12: conditional (filtered) aggregation — CASE WHEN inside agg. */
  val q12_conditional_agg: Relational.Q = (s, dir) => {
    import s.implicits._
    val high = $"o_totalprice" > 300000
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
           sum(when(high, 1L).otherwise(0L)).as("n_high_value"),
           sum(when(high, Exact.dec4($"o_totalprice"))).cast("double").as("high_value_revenue"),
           (sum(when(high, 1L).otherwise(0L)).cast("double") / count(lit(1))).as("high_share"))
      .orderBy($"o_orderstatus")
  }

  val q12_sql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       | CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
       | CAST(SUM(CASE WHEN o_totalprice > 300000 THEN ${S.dec4("o_totalprice")} END) AS DOUBLE) AS high_value_revenue,
       | CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS high_share
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q20: reproducible numeric profiling. Variance/stddev via exact
    * decimal power sums surfaced as (exactly representable) doubles, so
    * the same bits fall out of any engine / any partitioning — Spark's
    * built-in stddev over doubles is association-order-dependent and
    * cannot be oracle-checked exactly. */
  val q20_stats_profile: Relational.Q = (s, dir) => {
    import s.implicits._
    val x = Exact.dec2($"l_quantity")
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
           min($"l_quantity").as("min_qty"),
           max($"l_quantity").as("max_qty"),
           sum(x).cast("double").as("s1"),
           sum(x * x).cast("double").as("s2"))
      .select($"l_returnflag", $"n", $"min_qty", $"max_qty",
        ($"s1" / $"n").as("avg_qty"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - lit(1))).as("std_qty"))
      .orderBy($"l_returnflag")
  }

  val q20_sql: String = {
    val x = S.dec2("l_quantity")
    s"""SELECT l_returnflag, n, min_qty, max_qty, s1/n AS avg_qty,
       | SQRT((s2 - s1*s1/n)/(n-1)) AS std_qty
       |FROM (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |   MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       |   CAST(SUM($x) AS DOUBLE) AS s1,
       |   CAST(SUM($x * $x) AS DOUBLE) AS s2
       |  FROM lineitem GROUP BY l_returnflag) t
       |ORDER BY l_returnflag""".stripMargin
  }

  /** q21: exact percentiles/median — Spark's `percentile` and DuckDB's
    * `quantile_cont` share the linear-interpolation definition and match
    * bit-for-bit (verified empirically, including interpolated values). */
  val q21_percentiles: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("qty_p50"),
           expr("percentile(l_quantity, 0.9)").as("qty_p90"),
           expr("percentile(l_extendedprice, 0.25)").as("price_p25"),
           median($"l_extendedprice").as("price_median"))
      .orderBy($"l_returnflag")
  }

  val q21_sql: String =
    """SELECT l_returnflag,
      | quantile_cont(l_quantity, 0.5) AS qty_p50,
      | quantile_cont(l_quantity, 0.9) AS qty_p90,
      | quantile_cont(l_extendedprice, 0.25) AS price_p25,
      | median(l_extendedprice) AS price_median
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q22: collection aggregate — distinct part types per brand as a
    * canonical (sorted, comma-joined) string so the result is order-
    * stable across engines. */
  val q22_collect: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.part(s, dir)
      .groupBy($"p_brand".as("brand"))
      .agg(array_join(sort_array(collect_set($"p_type")), ",").as("types_sorted"),
           countDistinct($"p_type").as("n_types"))
      .orderBy($"brand")
  }

  val q22_sql: String =
    """SELECT p_brand AS brand,
      | array_to_string(list_sort(list(DISTINCT p_type)), ',') AS types_sorted,
      | COUNT(DISTINCT p_type) AS n_types
      |FROM part GROUP BY p_brand ORDER BY brand""".stripMargin

  /** a1: HLL-sketch approximate distinct counts — the cardinality
    * estimator for 100 TB profiling where exact distinct is a full
    * shuffle. Engine-specific sketch values ⇒ rows-only driver check;
    * AggregationsSpec bounds the error against the exact count. */
  val a1_approx_distinct: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
           approx_count_distinct($"l_orderkey").as("approx_orders"))
      .orderBy($"l_returnflag")
  }

  /** a2: single-pass approximate quantiles — the sketch that replaces
    * q21's exact per-group sort at 100 TB (KLL/GK-style mergeable
    * summaries; error bounded by the accuracy knob, 1/10000 here).
    * Engine-specific sketch values ⇒ rows-only driver check;
    * AggregationsSpec bounds the error against exact percentiles. */
  val a2_approx_quantiles: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("apx_p50"),
           expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("apx_p90"))
      .orderBy($"l_returnflag")
  }

  /** a3: count-min-sketch heavy hitters — the mergeable frequency
    * sketch for 100 TB token accounting: one CMS aggregate (eps=0.001,
    * δ=0.01 → a few hundred KB regardless of corpus size) replaces the
    * vocabulary-sized exact groupBy when only heavy hitters matter.
    *
    * Candidate generation never runs a full-vocabulary exact aggregate
    * (that pass is precisely what the CMS exists to avoid): each
    * partition maintains a capacity-bounded Misra-Gries summary (8×
    * candidates counters — NOT the partition's whole vocabulary) and
    * emits only its top `HeavyHitterCandidatesPerPartition`; any token
    * whose partition share exceeds 1/(capacity+1) is guaranteed into
    * that partition's summary, and Zipfian text puts the global top-20
    * far above that bar. Only the bounded candidate lists ever
    * shuffle; the vocabulary never does — and never sits whole in any
    * executor's heap either.
    * (mapPartitions is the honest tool here — a groupBy(pid, token)
    * formulation would shuffle every partition's full distinct-token
    * set.) Candidates then get exact counts from a FILTERED aggregate
    * (≤ candidates×partitions distinct keys) and are probed against
    * the sketch so the CMS guarantee is visible in the output:
    * cms_n ≥ exact_n always, overshoot ≤ ε·N w.h.p. Sketch bytes,
    * candidate set, and the top-20 list are bounded driver collects
    * (metadata-sized, documented contract). Engine-specific sketch ⇒
    * rows-only driver check; AggregationsSpec asserts the sandwich
    * bound and that the candidate pass reproduces the exact top-20. */
  val a3_cms_heavy_hitters: Relational.Q = (s, dir) => {
    import s.implicits._
    val tok = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
    heavyHittersOn(tok, k = 20)
  }

  /** Shared CMS-heavy-hitter core (the a3 shape), also the engine of
    * [[graft.api.GraftOps.heavyHitters]]: one fixed-size mergeable
    * count-min sketch + per-partition candidate heaps + exact counts
    * for the bounded candidate set only. `tok` must carry a single
    * string column `token`; returns top-`k` (token, exact_n, cms_n)
    * by exact count. The three passes over `tok` (sketch, candidates,
    * exact counts) share one persisted projection — persisted HERE in
    * the shared core so both callers get it, and freed before
    * returning (every action happens inside this call; the result is
    * a locally-backed top-k). */
  private[graft] def heavyHittersOn(tok0: DataFrame, k: Int,
      eps: Double = 0.001,
      candidatesPerPart: Int = HeavyHitterCandidatesPerPartition): DataFrame = {
    val s = tok0.sparkSession
    import s.implicits._
    val tok = tok0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: a failed action must not strand the projection in
    // executor storage
    try {
      val sketchBytes = tok
        .agg(count_min_sketch($"token", lit(eps), lit(0.99d), lit(42)).as("s"))
        .head().getAs[Array[Byte]]("s")
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
      val cand = heavyHitterCandidates(tok, candidatesPerPart)
      val top = tok.join(broadcast(cand), Seq("token"))
        .groupBy($"token").agg(count(lit(1)).as("exact_n"))
        .orderBy($"exact_n".desc, $"token").limit(k).collect()
        .map(r => (r.getString(0), r.getLong(1), cms.estimateCount(r.getString(0))))
      top.toSeq.toDF("token", "exact_n", "cms_n")
        .orderBy($"exact_n".desc, $"token")
    } finally tok.unpersist(false)
  }

  private[graft] val HeavyHitterCandidatesPerPartition = 160

  /** Per-partition heavy-hitter candidate tokens (see a3's scaladoc):
    * a partition-local Misra-Gries summary with capacity 8·N (BOUNDED
    * state — at most 8·N counters live at any moment regardless of the
    * partition's vocabulary, so a 100 TB partition with tens of
    * millions of distinct tokens costs the same executor memory as a
    * toy one), top-N of the summary emitted per partition, union
    * deduplicated. The returned relation is bounded by N ×
    * numPartitions rows.
    *
    * Recall guarantee (Misra-Gries): with capacity C = 8·N, any token
    * whose share of some partition exceeds 1/(C+1) survives that
    * partition's summary with estimate ≥ true − mₚ/(C+1); Zipfian text
    * puts every realistic global top-k far above that bar in every
    * partition. Adversarially clustered inputs (each partition locally
    * dominated by different values) can still hide a globally-hot
    * value: raise N, or pre-repartition by the value column (then
    * every value's full count is partition-local and the union of
    * partition top-Ns contains the exact global top-N). */
  private[graft] def heavyHitterCandidates(tok: DataFrame,
      n: Int = HeavyHitterCandidatesPerPartition): DataFrame = {
    val s = tok.sparkSession
    import s.implicits._
    val cap = 8 * n
    tok.select(col("token")).as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m.update(t, c + 1L)
          case None if m.size < cap => m.update(t, 1L)
          case None =>
            // summary full: decrement every counter, evict zeros
            // (amortized O(1)/item — each decrement cancels one prior
            // increment, so total decrement work ≤ total items)
            val keys = m.keysIterator.toArray
            var i = 0
            while (i < keys.length) {
              val k = keys(i); val c = m(k)
              if (c == 1L) m.remove(k) else m.update(k, c - 1L)
              i += 1
            }
        }
      }
      m.toSeq.sortBy { case (t, c) => (-c, t) }.take(n).map(_._1).iterator
    }.toDF("token").distinct()
  }

  /** a4: HLL sketch UNION — the "sketch table" pattern for incremental
    * distinct counts at 100 TB: per-day DataSketches HLL sketches of
    * the user set are materialized once (what an incremental pipeline
    * stores alongside each partition), and weekly/total distinct-user
    * estimates re-aggregate the STORED sketches alone — `hll_union_agg`
    * never touches raw events again, so rollups over any horizon cost
    * O(#sketches), not O(#events). (a1's approx_count_distinct answers
    * one grain; the sketch column answers every grain above it.)
    * Engine-specific sketch ⇒ rows-only driver check; the weekly
    * estimate is error-bounded against exact distincts in
    * RelationalSpec. */
  val a4_sketch_union: Relational.Q = (s, dir) => {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select(to_date($"ts").as("day"), $"user_id")
      .groupBy($"day")
      .agg(hll_sketch_agg($"user_id").as("sk"))
    daily
      // floor matches the oracle's FLOOR for pre-epoch days (cast
      // truncates toward zero and would collide weeks -1 and 0)
      .groupBy(floor(datediff($"day", to_date(lit("2024-01-01"))) / 7)
        .cast("long").as("week"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"),
           count(lit(1)).as("n_days"))
      .orderBy($"week")
  }

  /** a5: theta-sketch distinct-user OVERLAP between event types — the
    * set operation HLL cannot do: theta sketches (KMV) support
    * intersection with bounded error, so "how many users did both X
    * and Y" costs one sketch per type + O(k) per pair instead of a
    * self-join of the event log. One pass over events builds a ≤4096-
    * hash sketch per type ([[graft.functions.ThetaSketchAgg]] — the
    * shuffle carries one ≤32 KiB buffer per type, never user ids); the
    * pairwise intersections run on the collected sketches
    * (#types² × k — metadata-sized, same contract as a3's candidate
    * collect). Sketch bytes are compact-ordered DataSketches v1, the
    * same blobs the Puffin statistics path publishes. Engine-specific
    * estimates ⇒ rows-only driver check; AggregationsSpec asserts the
    * exact-mode estimates equal exact distinct overlaps and bounds the
    * estimating-mode error on a >k synthetic set. */
  val a5_theta_overlap: Relational.Q = (s, dir) =>
    graft.api.GraftOps.distinctOverlap(
      Tables.events(s, dir), "event_type", "user_id")
      .toDF("type_a", "type_b", "est_users_a", "est_users_b", "est_users_both")

  /** q23: CUBE — all grouping-set combinations of (status, priority). */
  val q23_cube: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           Exact.moneySum($"o_totalprice").as("revenue"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val q23_sql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       | ${S.moneySum("o_totalprice")} AS revenue
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** q24: INTERSECT — customers active in both 1996 and 2000. */
  val q24_intersect: Relational.Q = (s, dir) => {
    import s.implicits._
    def active(y: Int) = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
              $"o_orderdate" < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select($"o_custkey")
    active(1996).intersect(active(2000)).orderBy($"o_custkey")
  }

  val q24_sql: String =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |INTERSECT
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2001-01-01'
      |ORDER BY o_custkey""".stripMargin

  /** q25: EXCEPT — customers active in 1996 but gone by 2000 (churn). */
  val q25_except: Relational.Q = (s, dir) => {
    import s.implicits._
    def active(y: Int) = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
              $"o_orderdate" < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select($"o_custkey")
    active(1996).except(active(2000)).orderBy($"o_custkey")
  }

  val q25_sql: String =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |EXCEPT
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2001-01-01'
      |ORDER BY o_custkey""".stripMargin

  /** q27: explicit GROUPING SETS — the general form behind ROLLUP/CUBE
    * (reference notebooks use hierarchical rollups; arbitrary set lists
    * are the superset a warehouse user expects). One Expand + one
    * shuffle, same cost shape as q9/q23. `grouping()` flags distinguish
    * subtotal rows from genuine NULL group values engine-portably. */
  val q27_grouping_sets: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"),
            Seq($"o_orderstatus"), Seq($"o_orderpriority")),
        $"o_orderstatus", $"o_orderpriority")
      .agg(grouping($"o_orderstatus").cast("int").as("g_status"),
           grouping($"o_orderpriority").cast("int").as("g_priority"),
           count(lit(1)).as("n_orders"),
           Exact.moneySum($"o_totalprice").as("revenue"))
      .orderBy($"g_status", $"g_priority",
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val q27_sql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       | CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       | CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       | COUNT(*) AS n_orders, ${S.moneySum("o_totalprice")} AS revenue
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
       |                        (o_orderstatus), (o_orderpriority))
       |ORDER BY g_status, g_priority,
       | o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** q28: explode / lateral-view — corpus-wide token frequency top-20.
    * The flat-map (explode) runs scan-side inside codegen; the count is
    * a partial-agg shuffle on the token, then a global top-k sort of
    * the tiny aggregated relation. Both engines split on a literal
    * single space and drop empties, so tokenization is identical. */
  val q28_explode: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(20)
  }

  val q28_sql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |WHERE length(token) > 0
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** q29: UNPIVOT (melt) — q11's inverse: the wide per-row measures of
    * a filtered lineitem slice unpivot to (key, measure, val) long
    * form via the native `Dataset.unpivot` (an Expand node: scan-side
    * row expansion, no shuffle except the presentation sort). The
    * oracle uses the portable UNION ALL formulation. */
  val q29_unpivot: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate".between("1994-01-01", "1994-01-31"))
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        "measure", "val")
      .orderBy($"l_orderkey", $"l_linenumber", $"measure")
  }

  val q29_sql: String = {
    def arm(m: String) =
      s"""SELECT l_orderkey, l_linenumber, '$m' AS measure, $m AS val
         |FROM lineitem
         |WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1994-01-31'""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(arm).mkString("", "\nUNION ALL\n", "\nORDER BY l_orderkey, l_linenumber, measure")
  }

  val queries: Map[String, Relational.Q] = Map(
    "q29_unpivot" -> q29_unpivot,
    "q27_grouping_sets" -> q27_grouping_sets,
    "q28_explode" -> q28_explode,
    "q23_cube" -> q23_cube,
    "q24_intersect" -> q24_intersect,
    "q25_except" -> q25_except,
    "q21_percentiles" -> q21_percentiles,
    "q22_collect" -> q22_collect,
    "a1_approx_distinct" -> a1_approx_distinct,
    "a4_sketch_union" -> a4_sketch_union,
    "a2_approx_quantiles" -> a2_approx_quantiles,
    "a3_cms_heavy_hitters" -> a3_cms_heavy_hitters,
    "a5_theta_overlap" -> a5_theta_overlap,
    "q9_rollup" -> q9_rollup,
    "q10_distinct_agg" -> q10_distinct_agg,
    "q11_pivot" -> q11_pivot,
    "q12_conditional_agg" -> q12_conditional_agg,
    "q20_stats_profile" -> q20_stats_profile,
  )

  val oracles: Map[String, String] = Map(
    "q29_unpivot" -> q29_sql,
    "q27_grouping_sets" -> q27_sql,
    "q28_explode" -> q28_sql,
    "q23_cube" -> q23_sql,
    "q24_intersect" -> q24_sql,
    "q25_except" -> q25_sql,
    "q21_percentiles" -> q21_sql,
    "q22_collect" -> q22_sql,
    "q9_rollup" -> q9_sql,
    "q10_distinct_agg" -> q10_sql,
    "q11_pivot" -> q11_sql,
    "q12_conditional_agg" -> q12_sql,
    "q20_stats_profile" -> q20_sql,
  )
}
