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

  /** q26: RANGE-framed window — trailing 7-day revenue per customer.
    * The frame is value-based (orders within 6 days before the current
    * order's day), not row-based: tied days share one frame, so the
    * result is deterministic with no tie-breaker needed. Ordering is on
    * an integer day number; both engines frame identically and the
    * decimal-exact sum makes the values bit-identical. */
  val q26_window_range: Relational.Q = (s, dir) => {
    import s.implicits._
    val day = datediff($"o_orderdate".cast("date"),
      lit("1992-01-01").cast("date")).cast("long")
    val w = Window.partitionBy($"o_custkey").orderBy($"day")
      .rangeBetween(-6, Window.currentRow)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", day.as("day"))
      .withColumn("wk_revenue",
        sum(Exact.dec2($"o_totalprice")).over(w).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"wk_revenue")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q26_sql: String =
    s"""SELECT o_custkey, o_orderkey, o_orderdate,
       | CAST(SUM(${S.dec2("o_totalprice")}) OVER (PARTITION BY o_custkey
       |   ORDER BY date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
       |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS wk_revenue
       |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "q7_window_running" -> q7_window_running,
    "q8_topk_per_group" -> q8_topk_per_group,
    "q26_window_range" -> q26_window_range,
  )

  val oracles: Map[String, String] = Map(
    "q7_window_running" -> q7_sql,
    "q8_topk_per_group" -> q8_sql,
    "q26_window_range" -> q26_sql,
  )
}
