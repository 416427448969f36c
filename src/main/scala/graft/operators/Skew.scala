package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.functions.Exact.{sql => S}
import graft.sources.Tables

/** Skew-resilient joins by key salting.
  *
  * When one join key carries a disproportionate share of rows, hash
  * partitioning sends all of them to one task. Salting splits each hot
  * key into `salts` sub-keys: the skewed side gets a deterministic salt
  * derived from its own row, the other side is replicated once per salt
  * value. Result is row-identical to the plain join (verified by the
  * oracle, which computes the unsalted join). AQE's skew-join handles
  * sort-merge cases at runtime; explicit salting is the portable form
  * that also covers aggregations and pre-AQE engines.
  */
object Skew {

  /** Inner equi-join of `skewed` and `small` on `key`, salted `salts`
    * ways. `saltSource` must be deterministic per row (any column(s) of
    * the skewed side). `small` MUST be a bounded (dimension-scale)
    * relation: it is replicated once per salt value, so replicating a
    * fact table here would push `salts`× the fact through the shuffle —
    * exactly backwards at 100 TB. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val l = skewed.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val r = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** sk1: salted fact⋈dim revenue rollup — lineitem (the fact, whose
    * hot supplier keys are the skew risk) is salted; supplier (the dim,
    * 1e-4 of the fact's rows) is the replicated side, so the shuffle
    * carries the fact exactly once and 8× a bounded dim. Must equal the
    * plain join exactly (salting is a physical rewrite, not a semantic
    * one — verified by the unsalted oracle). */
  val sk1_salted_join: Relational.Q = (s, dir) => {
    import s.implicits._
    val joined = saltedJoin(
      Tables.lineitem(s, dir),
      Tables.supplier(s, dir).withColumnRenamed("s_suppkey", "l_suppkey"),
      key = "l_suppkey",
      saltSource = struct($"l_orderkey", $"l_linenumber"), salts = 8)
    joined
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
           Exact.surface(sum(Exact.discPrice($"l_extendedprice", $"l_discount")))
             .as("revenue"))
      .orderBy($"s_nationkey")
  }

  val sk1_sql: String =
    s"""SELECT s_nationkey, COUNT(*) AS n_lines,
       | ${S.surface(s"SUM(${S.discPrice("l_extendedprice", "l_discount")})")} AS revenue
       |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "sk1_salted_join" -> sk1_salted_join,
  )

  val oracles: Map[String, String] = Map(
    "sk1_salted_join" -> sk1_sql,
  )
}
