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
    * under shuffling; a rank-filter over a TOTAL order is the
    * reproducible (and still single-shuffle) form. (linenumber alone is
    * not unique in this data — every output column is in the sort.) */
  val c2_dedup_key: Relational.Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_linenumber", $"l_partkey", $"l_quantity")
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_orderkey", $"l_partkey", $"l_linenumber", $"l_quantity")
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

  val queries: Map[String, Relational.Q] = Map(
    "c1_null_profile" -> c1_null_profile,
    "c2_dedup_key" -> c2_dedup_key,
    "c3_clean_fillna" -> c3_clean_fillna,
    "c4_error_rate" -> c4_error_rate,
    "c5_medallion_gold" -> c5_medallion_gold,
  )

  val oracles: Map[String, String] = Map(
    "c1_null_profile" -> c1_sql,
    "c2_dedup_key" -> c2_sql,
    "c3_clean_fillna" -> c3_sql,
    "c4_error_rate" -> c4_sql,
    "c5_medallion_gold" -> c5_sql,
  )
}
