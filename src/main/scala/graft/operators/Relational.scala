package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.functions.Exact.{sql => S}
import graft.sources.Tables

/** §A Relational core — the lakehouse analytics surface.
  *
  * Re-expresses the reference's query patterns (filter→join→groupBy→agg→
  * derived tables; reference: docker/spark-notebook/05_datahub_lineage_demo
  * .ipynb cells 5–6, 06_pipeline_metrics_demo.ipynb gold layer) as
  * declarative DataFrame plans over the TPC-H-shaped star schema.
  *
  * Scale notes (100 TB):
  *  - region/nation/supplier are broadcast — never shuffled.
  *  - fact-fact joins (lineitem×orders) shuffle on the join key only after
  *    filters are pushed to the scan.
  *  - all aggregates are partial-aggregation friendly (no UDAFs in the hot
  *    path); money math is decimal-exact (see [[graft.functions.Exact]]) so
  *    results are partitioning-independent.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** q1: pricing summary — groupBy multi-aggregate over the largest fact
    * table. Scan-side filter pushes to parquet; map-side partial agg means
    * shuffle carries ≤ (#groups × #partitions) rows. */
  val q1_pricing_summary: Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("2000-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(Exact.dec2($"l_quantity")).cast("double").as("sum_qty"),
        Exact.moneySum($"l_extendedprice").as("sum_base_price"),
        Exact.surface(sum(Exact.discPrice($"l_extendedprice", $"l_discount"))).as("sum_disc_price"),
        Exact.surface(sum(Exact.charge($"l_extendedprice", $"l_discount", $"l_tax"))).as("sum_charge"),
        (sum(Exact.dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        Exact.moneyAvg($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1_sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | CAST(SUM(${S.dec2("l_quantity")}) AS DOUBLE) AS sum_qty,
       | ${S.moneySum("l_extendedprice")} AS sum_base_price,
       | ${S.surface(s"SUM(${S.discPrice("l_extendedprice", "l_discount")})")} AS sum_disc_price,
       | ${S.surface(s"SUM(${S.charge("l_extendedprice", "l_discount", "l_tax")})")} AS sum_charge,
       | CAST(SUM(${S.dec2("l_quantity")}) AS DOUBLE)/COUNT(*) AS avg_qty,
       | ${S.moneyAvg("l_extendedprice")} AS avg_price,
       | COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2: top-N revenue customers. Shuffles orders once on o_custkey;
    * customer side joined post-aggregation so the join input is ≤ #customers
    * rows. Deterministic top-N via (revenue DESC, key ASC). */
  val q2_revenue_topn: Q = (s, dir) => {
    import s.implicits._
    val perCust = Tables.orders(s, dir)
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_custkey")
      .agg(Exact.moneySum($"o_totalprice").as("revenue"),
           count(lit(1)).as("n_orders"))
    perCust
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"revenue", $"n_orders")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(10)
  }

  val q2_sql: String =
    s"""SELECT c_custkey, c_name, ${S.moneySum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
       |FROM orders JOIN customer ON c_custkey = o_custkey
       |WHERE o_orderstatus = 'F'
       |GROUP BY c_custkey, c_name
       |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin

  /** q3: shipping priority — 3-way join with selective dimension filter.
    * The customer filter prunes before the join; lineitem filter pushes to
    * scan. */
  val q3_shipping_priority: Q = (s, dir) => {
    import s.implicits._
    val cut = lit("1998-07-01").cast("timestamp")
    val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, dir).filter($"o_orderdate" < cut)
    val l = Tables.lineitem(s, dir).filter($"l_shipdate" > cut)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(Exact.surface(sum(Exact.discPrice($"l_extendedprice", $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3_sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       | ${S.surface(s"SUM(${S.discPrice("l_extendedprice", "l_discount")})")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-07-01'
       |  AND l_shipdate  > TIMESTAMP '1998-07-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q4: EXISTS as a left-semi join — no duplication, no distinct needed;
    * the semi join short-circuits per key. */
  val q4_order_priority: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-10-01").cast("timestamp"))
    val bigLines = Tables.lineitem(s, dir).filter($"l_quantity" > 45)
    o.join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4_sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q5: 6-way star join. region/nation are broadcast unconditionally
    * (constant-size dims at any scale factor: 5 / 25 rows); supplier
    * GROWS with the scale factor, so its hint is gated on the
    * optimizer's size estimate ([[Tables.broadcastIfSmall]]) — at a
    * 100 TB SF it shuffles instead of forcing a multi-GB broadcast. */
  val q5_local_supplier: Q = (s, dir) => {
    import s.implicits._
    val asia = broadcast(
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
              $"n_regionkey" === $"r_regionkey"))
      .select($"n_nationkey", $"n_name")
    val sup = Tables.broadcastIfSmall(
      Tables.supplier(s, dir).join(asia, $"s_nationkey" === $"n_nationkey"))
      .select($"s_suppkey", $"s_nationkey", $"n_name")
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(s, dir)
    Tables.lineitem(s, dir)
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .groupBy($"n_name")
      .agg(Exact.surface(sum(Exact.discPrice($"l_extendedprice", $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  // explicit join order: comma-join syntax made Catalyst (no stats) plan
  // a late cartesian — 10× slower when this same text runs through
  // spark.sql (SqlSurface). DuckDB is order-insensitive either way.
  val q5_sql: String =
    s"""SELECT n_name,
       | ${S.surface(s"SUM(${S.discPrice("l_extendedprice", "l_discount")})")} AS revenue
       |FROM lineitem
       | JOIN supplier ON l_suppkey = s_suppkey
       | JOIN nation ON s_nationkey = n_nationkey
       | JOIN region ON n_regionkey = r_regionkey
       | JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate <  TIMESTAMP '1997-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** q6: pure scan-aggregate; every predicate pushes into the parquet
    * reader, so at scale this reads only matching row groups. */
  val q6_forecast_revenue: Q = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("2000-01-01").cast("timestamp") &&
              $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(Exact.surface(sum(Exact.dec4($"l_extendedprice") * Exact.frac4($"l_discount")))
             .as("revenue"),
           count(lit(1)).as("n_lines"))
  }

  val q6_sql: String =
    s"""SELECT ${S.surface(s"SUM(${S.dec4("l_extendedprice")} * ${S.frac4("l_discount")})")} AS revenue,
       | COUNT(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1999-01-01'
       |  AND l_shipdate <  TIMESTAMP '2000-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> q1_pricing_summary,
    "q2_revenue_topn" -> q2_revenue_topn,
    "q3_shipping_priority" -> q3_shipping_priority,
    "q4_order_priority" -> q4_order_priority,
    "q5_local_supplier" -> q5_local_supplier,
    "q6_forecast_revenue" -> q6_forecast_revenue,
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1_sql,
    "q2_revenue_topn" -> q2_sql,
    "q3_shipping_priority" -> q3_sql,
    "q4_order_priority" -> q4_sql,
    "q5_local_supplier" -> q5_sql,
    "q6_forecast_revenue" -> q6_sql,
  )
}
