package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.functions.Exact.{sql => S}
import graft.sources.Tables

/** §A join shapes beyond plain inner joins: outer-with-count, anti,
  * union-dedup, scalar-subquery filters, per-group-average subquery.
  *
  * Scale notes: every shape here shuffles each fact input at most once on
  * its join key; subquery thresholds are computed as single-row or
  * per-key aggregates and re-joined (broadcast when tiny), never
  * collected to the driver.
  */
object JoinShapes {

  /** q13: order-count distribution over customers (left outer join keeps
    * zero-order customers; count(o_orderkey) skips NULLs). */
  val q13_outer_join_count: Relational.Q = (s, dir) => {
    import s.implicits._
    val perCust = Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter($"o_orderpriority" =!= "1-URGENT"),
            $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13_sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q14: NOT EXISTS as a left-anti join — customers with no urgent
    * order, profiled by market segment. */
  val q14_anti_join: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT"),
            $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           Exact.moneySum($"c_acctbal").as("total_balance"))
      .orderBy($"c_mktsegment")
  }

  val q14_sql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
       | ${S.moneySum("c_acctbal")} AS total_balance
       |FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT')
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q15: UNION with cross-branch dedup — high-balance customers plus
    * customers holding a very large order. Spark: union + distinct
    * (single shuffle on the key). */
  val q15_union_dedup: Relational.Q = (s, dir) => {
    import s.implicits._
    val a = Tables.customer(s, dir)
      .filter($"c_acctbal" > 9000).select($"c_custkey")
    val b = Tables.orders(s, dir)
      .filter($"o_totalprice" > 450000).select($"o_custkey".as("c_custkey"))
    a.union(b).distinct().orderBy($"c_custkey")
  }

  val q15_sql: String =
    """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      |UNION
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
      |ORDER BY c_custkey""".stripMargin

  /** q16: segments whose revenue exceeds the all-segment mean. The
    * threshold is formed without division (5·seg > total) over exact
    * decimals, and the global total comes from a scalar aggregate over
    * the 5 grouped rows, re-attached via a broadcast cross join — no
    * single-partition window, no driver collect. */
  val q16_having_subquery: Relational.Q = (s, dir) => {
    import s.implicits._
    val perSeg = Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey")
      .groupBy($"c_mktsegment")
      .agg(sum(Exact.dec4($"o_totalprice")).as("rev_dec"))
    val totals = perSeg.agg(
      count(lit(1)).as("n_segments"),
      sum($"rev_dec").as("total"))
    perSeg
      .crossJoin(broadcast(totals))
      .filter($"rev_dec" * $"n_segments" > $"total")
      .select($"c_mktsegment", $"rev_dec".cast("double").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  val q16_sql: String =
    s"""SELECT c_mktsegment, CAST(rev_dec AS DOUBLE) AS revenue
       |FROM (
       |  SELECT c_mktsegment, SUM(${S.dec4("o_totalprice")}) AS rev_dec,
       |    COUNT(*) OVER () AS n_segments,
       |    SUM(SUM(${S.dec4("o_totalprice")})) OVER () AS total
       |  FROM customer JOIN orders ON c_custkey = o_custkey
       |  GROUP BY c_mktsegment) t
       |WHERE rev_dec * n_segments > total
       |ORDER BY c_mktsegment""".stripMargin

  /** q17: small-quantity revenue for one brand (per-part average
    * subquery, TPC-H Q17 shape). The brand filter prunes part before a
    * broadcast join; per-part averages are computed once and re-joined
    * instead of a correlated per-row subquery. */
  val q17_avg_subquery: Relational.Q = (s, dir) => {
    import s.implicits._
    val brandParts = broadcast(
      Tables.part(s, dir).filter($"p_brand" === "Brand#3").select($"p_partkey"))
    val li = Tables.lineitem(s, dir)
    val branded = li.join(brandParts, $"l_partkey" === $"p_partkey")
    val perPart = branded.groupBy($"l_partkey".as("ap_partkey"))
      .agg((sum(Exact.dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
    branded
      .join(perPart, $"l_partkey" === $"ap_partkey")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((sum(Exact.dec4($"l_extendedprice")).cast("double") / lit(7.0)).as("avg_yearly"),
           count(lit(1)).as("n_lines"))
  }

  val q17_sql: String =
    s"""SELECT CAST(SUM(${S.dec4("l_extendedprice")}) AS DOUBLE)/7.0 AS avg_yearly,
       | COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE p_brand = 'Brand#3'
       |  AND l_quantity < (
       |    SELECT CAST(0.2 AS DOUBLE) * (CAST(SUM(${S.dec2("l2.l_quantity")}) AS DOUBLE)/COUNT(*))
       |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "q13_outer_join_count" -> q13_outer_join_count,
    "q14_anti_join" -> q14_anti_join,
    "q15_union_dedup" -> q15_union_dedup,
    "q16_having_subquery" -> q16_having_subquery,
    "q17_avg_subquery" -> q17_avg_subquery,
  )

  val oracles: Map[String, String] = Map(
    "q13_outer_join_count" -> q13_sql,
    "q14_anti_join" -> q14_sql,
    "q15_union_dedup" -> q15_sql,
    "q16_having_subquery" -> q16_sql,
    "q17_avg_subquery" -> q17_sql,
  )
}
