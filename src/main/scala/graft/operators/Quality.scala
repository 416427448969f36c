package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.functions.Exact.{sql => S}
import graft.sources.Tables

/** §C data-quality / medallion operators — the reference's silver-layer
  * cleaning and gold-layer business tables
  * (reference: docker/spark-notebook/06_pipeline_metrics_demo.ipynb:
  * null counting, dropDuplicates, fillna, join+agg gold summary;
  * 05_datahub_lineage_demo.ipynb: customer_summary).
  *
  * The synthetic base tables are clean, so the "bronze" view injects
  * deterministic dirt (NULLIF-style) — the cleaning operators then have
  * real work that the oracle reproduces exactly.
  */
object Quality {

  /** Bronze customers with deterministic quality issues: name missing on
    * every 97th key, negative balances treated as unknown. */
  private def bronzeCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .withColumn("name", when($"c_custkey" % 97 =!= 0, $"c_name"))
      .withColumn("acctbal", when($"c_acctbal" >= 0, $"c_acctbal"))
  }
  private val bronzeSql =
    """(SELECT c_custkey, c_nationkey, c_mktsegment,
      |   CASE WHEN c_custkey % 97 <> 0 THEN c_name END AS name,
      |   CASE WHEN c_acctbal >= 0 THEN c_acctbal END AS acctbal
      | FROM customer)""".stripMargin

  /** c1: per-column null profile of the bronze layer — single row of
    * counts, computed in one pass (one aggregate, no per-column jobs). */
  val c1_null_profile: Relational.Q = (s, dir) => {
    import s.implicits._
    val b = bronzeCustomers(s, dir)
    b.agg(
      count(lit(1)).as("n_rows"),
      sum(when($"name".isNull, 1L).otherwise(0L)).as("null_name"),
      sum(when($"acctbal".isNull, 1L).otherwise(0L)).as("null_acctbal"),
      sum(when($"c_mktsegment".isNull, 1L).otherwise(0L)).as("null_mktsegment"))
  }

  val c1_sql: String =
    s"""SELECT COUNT(*) AS n_rows,
       | CAST(SUM(CASE WHEN name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_name,
       | CAST(SUM(CASE WHEN acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_acctbal,
       | CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_mktsegment
       |FROM $bronzeSql b""".stripMargin

  /** c2: deterministic dedup — keep exactly one row per l_orderkey.
    * `dropDuplicates` keeps an arbitrary row, which is nondeterministic
    * under shuffling; the reproducible form picks the minimum under a
    * TOTAL order (linenumber alone is not unique in this data — every
    * output column is in the order). Expressed as `min(struct(…))` —
    * struct comparison IS that lexicographic order — rather than a
    * row_number window: the aggregate gets map-side partial combine, so
    * the shuffle carries one candidate row per key instead of sorting
    * every duplicate through the exchange. */
  val c2_dedup_key: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(min(struct($"l_linenumber", $"l_partkey", $"l_quantity")).as("f"))
      .select($"l_orderkey", $"f.l_partkey", $"f.l_linenumber", $"f.l_quantity")
      .orderBy($"l_orderkey")
  }

  val c2_sql: String =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |        ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
      |      FROM lineitem) t
      |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin

  /** c3: silver cleaning — fillna defaults over the bronze view
    * (reference fills name/email/city/age defaults the same way). */
  val c3_clean_fillna: Relational.Q = (s, dir) => {
    import s.implicits._
    bronzeCustomers(s, dir)
      .na.fill(Map("name" -> "Unknown", "acctbal" -> 0.0))
      .select($"c_custkey", $"name", $"acctbal", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val c3_sql: String =
    s"""SELECT c_custkey, COALESCE(name, 'Unknown') AS name,
       | COALESCE(acctbal, 0.0) AS acctbal, c_mktsegment
       |FROM $bronzeSql b ORDER BY c_custkey""".stripMargin

  /** c4: error-rate monitoring per day (df_error_count analog —
    * reference: modules/dst_metrics/utils.py df_error_count). */
  val c4_error_rate: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n_events"),
           sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"))
      .withColumn("error_rate", $"n_errors".cast("double") / $"n_events")
      .orderBy($"day")
  }

  val c4_sql: String =
    """SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_events,
      | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
      | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS error_rate
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** c5: gold customer summary — the reference's flagship derived table
    * (filter completed → groupBy → count/sum/avg/max → join attrs). */
  val c5_medallion_gold: Relational.Q = (s, dir) => {
    import s.implicits._
    val summary = Tables.orders(s, dir)
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("total_orders"),
           Exact.moneySum($"o_totalprice").as("total_spent"),
           Exact.moneyAvg($"o_totalprice").as("avg_order_value"),
           max($"o_orderdate").as("last_order_date"))
    summary
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"c_mktsegment",
        $"total_orders", $"total_spent", $"avg_order_value", $"last_order_date")
      .orderBy($"c_custkey")
  }

  val c5_sql: String =
    s"""SELECT c_custkey, c_name, c_mktsegment,
       | COUNT(*) AS total_orders,
       | ${S.moneySum("o_totalprice")} AS total_spent,
       | ${S.moneyAvg("o_totalprice")} AS avg_order_value,
       | MAX(o_orderdate) AS last_order_date
       |FROM orders JOIN customer ON c_custkey = o_custkey
       |WHERE o_orderstatus = 'F'
       |GROUP BY c_custkey, c_name, c_mktsegment
       |ORDER BY c_custkey""".stripMargin

  /** c6: statistical outlier detection — orders whose total price sits
    * more than 3 sigma from their priority group's mean. The synthetic
    * prices are uniform (max natural |z| = sqrt(3)), so the bronze view
    * injects a deterministic 10× data-entry error on every 499th key —
    * the dirt-then-detect pattern this module uses throughout — and the
    * detector must recover exactly those rows. Group moments come from
    * exact decimal power sums (the q20 technique, bit-identical
    * cross-engine); the 5-row stats table broadcasts back onto the fact
    * scan, so the whole detector is one aggregation plus one map-side
    * join at any scale. */
  val c6_outlier_zscore: Relational.Q = (s, dir) => {
    import s.implicits._
    val price = when($"o_orderkey" % 499 === 0, $"o_totalprice" * 10)
      .otherwise($"o_totalprice")
    val bronze = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderpriority", price.as("price"))
    val x = Exact.dec2($"price")
    val stats = bronze
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
           sum(x).cast("double").as("s1"),
           sum(x * x).cast("double").as("s2"))
      .select($"o_orderpriority",
        ($"s1" / $"n").as("mean_price"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - lit(1))).as("std_price"))
    val z = ($"price" - $"mean_price") / $"std_price"
    bronze
      .join(broadcast(stats), "o_orderpriority")
      .withColumn("z", z)
      .filter(abs($"z") > 3.0)
      .select($"o_orderkey", $"o_orderpriority", $"price",
        round($"z", 6).as("z"))
      .orderBy($"o_orderkey")
  }

  val c6_sql: String = {
    val x = S.dec2("price")
    s"""WITH bronze AS (
       |  SELECT o_orderkey, o_orderpriority,
       |   CASE WHEN o_orderkey % 499 = 0 THEN o_totalprice * 10
       |        ELSE o_totalprice END AS price
       |  FROM orders),
       |st AS (
       |  SELECT o_orderpriority, s1/n AS mean_price,
       |   SQRT((s2 - s1*s1/n)/(n-1)) AS std_price
       |  FROM (SELECT o_orderpriority, COUNT(*) AS n,
       |          CAST(SUM($x) AS DOUBLE) AS s1,
       |          CAST(SUM($x * $x) AS DOUBLE) AS s2
       |        FROM bronze GROUP BY o_orderpriority) t)
       |SELECT o_orderkey, b.o_orderpriority, price,
       | ROUND((price - mean_price)/std_price, 6) AS z
       |FROM bronze b JOIN st ON b.o_orderpriority = st.o_orderpriority
       |WHERE ABS((price - mean_price)/std_price) > 3.0
       |ORDER BY o_orderkey""".stripMargin
  }

  /** c7: fixed-width histogram profiling — the distribution sketch a
    * quality dashboard draws per column. Bin assignment is scan-side
    * integer arithmetic (exact in double for these magnitudes), the
    * aggregation is one partial-agg shuffle on (group, bin) — the
    * 100 TB profile costs the same as any groupBy-count. */
  val c7_histogram: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_returnflag",
        floor(($"l_quantity" - 1) / 5).cast("int").as("bin"))
      .groupBy($"l_returnflag", $"bin")
      .agg(count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"bin")
  }

  val c7_sql: String =
    """SELECT l_returnflag, CAST(FLOOR((l_quantity - 1) / 5) AS INTEGER) AS bin,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, bin""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "c7_histogram" -> c7_histogram,
    "c1_null_profile" -> c1_null_profile,
    "c2_dedup_key" -> c2_dedup_key,
    "c3_clean_fillna" -> c3_clean_fillna,
    "c4_error_rate" -> c4_error_rate,
    "c5_medallion_gold" -> c5_medallion_gold,
    "c6_outlier_zscore" -> c6_outlier_zscore,
  )

  val oracles: Map[String, String] = Map(
    "c7_histogram" -> c7_sql,
    "c1_null_profile" -> c1_sql,
    "c2_dedup_key" -> c2_sql,
    "c3_clean_fillna" -> c3_sql,
    "c4_error_rate" -> c4_sql,
    "c5_medallion_gold" -> c5_sql,
    "c6_outlier_zscore" -> c6_sql,
  )
}
