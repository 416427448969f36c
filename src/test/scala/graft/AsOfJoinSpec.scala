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
