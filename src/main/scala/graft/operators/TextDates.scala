package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.functions.Exact.{sql => S}
import graft.sources.Tables

/** §A string-predicate and calendar operators. All expressions are
  * codegen'd builtins (no UDFs) and evaluate scan-side, so at scale the
  * filters run inside the parquet-reading stage with zero extra passes. */
object TextDates {

  /** q18: LIKE / regexp predicates + string projection ops. */
  val q18_string_ops: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.part(s, dir)
      .filter($"p_name".rlike("gear|bolt") || $"p_name".like("%wid%"))
      .select($"p_partkey", $"p_name",
        upper($"p_name").as("name_upper"),
        length($"p_name").as("name_len"),
        regexp_replace($"p_name", " ", "_").as("name_snake"))
      .orderBy($"p_partkey")
  }

  val q18_sql: String =
    """SELECT p_partkey, p_name,
      | UPPER(p_name) AS name_upper,
      | LENGTH(p_name) AS name_len,
      | REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake
      |FROM part
      |WHERE regexp_matches(p_name, 'gear|bolt') OR p_name LIKE '%wid%'
      |ORDER BY p_partkey""".stripMargin

  /** q19: monthly revenue time series via date_trunc — the canonical
    * calendar rollup (reference computes daily partitions via Iceberg
    * `days(ts)`; same bucketing family). */
  val q19_date_ops: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(count(lit(1)).as("n_orders"),
           Exact.moneySum($"o_totalprice").as("revenue"))
      .orderBy($"month")
  }

  val q19_sql: String =
    s"""SELECT date_trunc('month', o_orderdate) AS month,
       | COUNT(*) AS n_orders,
       | ${S.moneySum("o_totalprice")} AS revenue
       |FROM orders
       |GROUP BY date_trunc('month', o_orderdate)
       |ORDER BY month""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "q18_string_ops" -> q18_string_ops,
    "q19_date_ops" -> q19_date_ops,
  )

  val oracles: Map[String, String] = Map(
    "q18_string_ops" -> q18_sql,
    "q19_date_ops" -> q19_sql,
  )
}
