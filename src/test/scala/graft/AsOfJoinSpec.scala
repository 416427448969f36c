package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOf

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("custom physical as-of join equals the window-composed form") {
    val custom = SparkEntry.queries("e6_asof_custom")(spark, sf).collect()
    val composed = SparkEntry.queries("e3_asof_join")(spark, sf).collect()
    assert(custom.length == composed.length && custom.nonEmpty)
    assert(custom.map(_.toSeq).toSeq == composed.map(_.toSeq).toSeq)
  }

  test("as-of join on a hand-built case: inclusive match, null miss, key isolation") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "x"), (1L, 18L, "y"), (3L, 1L, "z"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.leftJoin(left, right, "k", "rk", "t", "rt")
      .select($"tag", $"rtag").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSet
    // a: matches x at equal time (inclusive); b: y (latest <= 20);
    // c: no key-2 right rows → null; key 3 on right never leaks
    assert(got == Set(("a", "x"), ("b", "y"), ("c", null)))
  }

  test("string keys: saved match key survives the right-cursor advance") {
    import spark.implicits._
    // regression: lastMatchKey was a UTF8String VIEW into the reused
    // projection buffer — advancing the right cursor overwrote it with
    // the NEXT key ("b"), so the valid ("a",5) match was discarded.
    // One partition forces both keys through one cursor.
    val left = Seq(("a", 10L, "L1"), ("b", 10L, "L2"))
      .toDF("k", "t", "tag").repartition(1)
    val right = Seq(("a", 5L, "ra"), ("b", 1L, "rb"))
      .toDF("rk", "rt", "rtag").repartition(1)
    val got = AsOf.leftJoin(left, right, "k", "rk", "t", "rt")
      .select($"tag", $"rtag").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("L1", "ra"), ("L2", "rb")), got.toString)
  }

  test("null keys and times never match and never crash the orderings") {
    import spark.implicits._
    val left = Seq((Some(1L), Some(10L), "ok"), (None, Some(10L), "nullkey"),
      (Some(1L), None, "nulltime")).toDF("k", "t", "tag")
    val right = Seq((Some(1L), Some(5L), "r1"), (None, Some(1L), "rnullk"),
      (Some(1L), None, "rnullt")).toDF("rk", "rt", "rtag")
    val got = AsOf.leftJoin(left, right, "k", "rk", "t", "rt")
      .select($"tag", $"rtag").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSet
    // only the fully non-null pair joins; null-key/time rows on either
    // side neither match nor throw (DuckDB ASOF parity)
    assert(got == Set(("ok", "r1"), ("nullkey", null), ("nulltime", null)),
      got.toString)
  }

  test("physical plan has one shuffle per side and sorted merge") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L)).toDF("rk", "rt")
    val df = AsOf.leftJoin(left, right, "k", "rk", "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly 2 shuffles:\n$plan")
  }
}
