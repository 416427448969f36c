package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** SQL-surface parity — the reference's users write `spark.sql(...)`
  * (reference: all demo notebooks drive Iceberg/Delta through SQL).
  * These queries register the base tables as temp views and execute the
  * SAME ANSI SQL text that the DuckDB oracle runs — one string, two
  * engines, identical results. That is the strongest possible dialect-
  * parity statement and exercises Spark's SQL parser → Catalyst path
  * (vs the DataFrame DSL used elsewhere).
  */
object SqlSurface {

  private val ViewTables =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  private def registerViews(s: SparkSession, dir: String): Unit =
    ViewTables.foreach { t =>
      Tables.load(s, dir, t).createOrReplaceTempView(t)
    }

  private def runSql(sql: String): Relational.Q = (s, dir) => {
    registerViews(s, dir)
    s.sql(sql)
  }

  // identical SQL text runs on Spark and DuckDB
  val queries: Map[String, Relational.Q] = Map(
    "sql1_pricing" -> runSql(Relational.q1_sql),
    "sql2_star_join" -> runSql(Relational.q5_sql),
    "sql3_window" -> runSql(Windowed.q7_sql),
  )

  val oracles: Map[String, String] = Map(
    "sql1_pricing" -> Relational.q1_sql,
    "sql2_star_join" -> Relational.q5_sql,
    "sql3_window" -> Windowed.q7_sql,
  )
}
