package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.functions.Exact.{sql => S}
import graft.sources.Tables

/** §A window operators.
  *
  * Scale notes: window functions shuffle once on the partition key; the
  * per-partition sort is the dominant cost. Partition keys here
  * (l_suppkey) have bounded cardinality per key, so no single task
  * explodes; for skewed keys at 100 TB AQE skew-splitting would kick in
  * only for joins, so key-salting would be the fallback (not needed for
  * supplier-sized groups).
  */
object Windowed {

  /** q7: row_number + running sum per supplier. The ordering key
    * (shipdate, orderkey, linenumber) is a total order, so results are
    * fully deterministic — never window-order on a non-unique key. */
  val q7_window_running: Relational.Q = (s, dir) => {
    import s.implicits._
    // (orderkey, linenumber) is not unique in this data — quantity joins
    // the sort so tied rows are interchangeable in the output.
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        row_number().over(w).as("rn"),
        sum(Exact.dec2($"l_quantity")).over(wRun).cast("double").as("running_qty"))
  }

  val q7_sql: String =
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       | ROW_NUMBER() OVER w AS rn,
       | CAST(SUM(${S.dec2("l_quantity")}) OVER (PARTITION BY l_suppkey
       |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '2001-01-01'
       |WINDOW w AS (PARTITION BY l_suppkey
       |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)""".stripMargin

  /** q8: top-3 parts per brand by retail price; rank computed once per
    * brand partition, filter prunes before any further work. */
  val q8_topk_per_group: Relational.Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"p_brand")
      .orderBy($"p_retailprice".desc, $"p_partkey")
    Tables.part(s, dir)
      .select($"p_brand", $"p_partkey", $"p_name", $"p_retailprice",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 3)
  }

  val q8_sql: String =
    """SELECT * FROM (
      |  SELECT p_brand, p_partkey, p_name, p_retailprice,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY p_retailprice DESC, p_partkey) AS rn
      |  FROM part) t
      |WHERE rn <= 3""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "q7_window_running" -> q7_window_running,
    "q8_topk_per_group" -> q8_topk_per_group,
  )

  val oracles: Map[String, String] = Map(
    "q7_window_running" -> q7_sql,
    "q8_topk_per_group" -> q8_sql,
  )
}
