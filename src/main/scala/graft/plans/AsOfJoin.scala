package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.catalyst.expressions.Ascending
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.SparkSession

/** AS-OF JOIN as a first-class operator: logical node + planner strategy
  * + physical sort-merge execution.
  *
  * Semantics (left as-of): every left row is paired with the single
  * right row having the greatest `rightTime <= leftTime` within the same
  * key group, or nulls when none exists — DuckDB's `ASOF LEFT JOIN`, the
  * reference point the oracle checks against.
  *
  * Scale design: the physical node requires both children clustered on
  * the key and sorted by (key, time) — Catalyst inserts the exchanges
  * and sorts, exactly one shuffle per side — and then streams both
  * sides through a per-partition merge with O(1) state (the last
  * matching right row). No buffering of groups, no range self-join: at
  * 100 TB this is the same cost shape as a sort-merge join.
  *
  * This is the (c) tier of the extension hierarchy (compose built-ins →
  * custom Expression → custom plan); the window-composed form in
  * operators.Events.e3 is the (a) tier of the same semantics, and the
  * two are asserted equal in AsOfJoinSpec.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  // right side is nullable: unmatched left rows pair with nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }

  /** Idempotently register on an existing session (works without
    * SparkSessionExtensions wiring, e.g. inside the driver's session). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
  }
}

/** User-facing API for the custom operator. */
object AsOf {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Left as-of join: `left` rows keep the latest `right` row with
    * rightTime <= leftTime per key (nulls when none). Columns are named
    * (genuine UnresolvedAttributes — Spark 4 Column objects carry
    * ColumnNode wrappers that only builtin operators unwrap) and the
    * analyzer resolves them against the child plans; use distinct names
    * across the two sides. */
  def leftJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    AsOfStrategy.register(spark)
    ColumnBridge.ofRows(spark, AsOfJoin(
      ColumnBridge.logicalPlan(left), ColumnBridge.logicalPlan(right),
      UnresolvedAttribute(leftKey), UnresolvedAttribute(rightKey),
      UnresolvedAttribute(leftTime), UnresolvedAttribute(rightTime)))
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = leftKey; val rk = rightKey; val lt = leftTime; val rt = rightTime
    val rightWidth = right.output.size
    val keyOrd = PhysicalDataType.ordering(lk.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = PhysicalDataType.ordering(lt.dataType)
      .asInstanceOf[Ordering[Any]]
    val leftSchema = left.output
    val rightSchema = right.output
    val outSchema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(Seq(lk), leftSchema)
      val ltProj = UnsafeProjection.create(Seq(lt), leftSchema)
      val rkProj = UnsafeProjection.create(Seq(rk), rightSchema)
      val rtProj = UnsafeProjection.create(Seq(rt), rightSchema)
      val outProj = UnsafeProjection.create(outSchema, outSchema)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow

      // Projected values may be VIEWS into the projection's reused
      // buffer (UTF8String for string keys) — anything that must
      // outlive the next projection call gets copied on save.
      def copyVal(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case a: Array[Byte] => a.clone()
        case o => o
      }

      // buffered right side: current head + the last row that matched
      // the current left key at-or-before the current left time.
      // NULL-key/time right rows can never match under SQL comparison
      // semantics (and would NPE the primitive orderings) — skipped.
      var rHead: InternalRow = null
      var rHeadKey: Any = null
      var rHeadTime: Any = null
      def advanceRight(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rkProj(r).get(0, rk.dataType)
          val t = rtProj(r).get(0, rt.dataType)
          if (k != null && t != null) {
            rHead = r.copy(); rHeadKey = k; rHeadTime = t
          }
        }
      }
      advanceRight()

      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      lIter.map { lRow =>
        val key = lkProj(lRow).get(0, lk.dataType)
        val time = ltProj(lRow).get(0, lt.dataType)
        if (key == null || time == null) {
          // a NULL left key/time matches nothing (DuckDB ASOF parity);
          // the remembered match is untouched — the right cursor holds
          // its position for the sorted rows that follow
          outProj(joined(lRow, nullRight))
        } else {
          // drop the remembered match when the key group changes
          if (lastMatch != null && keyOrd.compare(lastMatchKey, key) != 0) {
            lastMatch = null
          }
          // consume right rows with (key, time) <= (left key, left time)
          var continue = rHead != null
          while (continue) {
            val c = keyOrd.compare(rHeadKey, key)
            if (c < 0) advanceRight()
            else if (c == 0 && timeOrd.compare(rHeadTime, time) <= 0) {
              // copy: rHeadKey views rkProj's buffer, which the next
              // advanceRight() overwrites — an uncopied save would
              // silently mutate into the NEXT right row's key and
              // discard valid matches (string keys only; primitives
              // are by-value)
              lastMatch = rHead; lastMatchKey = copyVal(rHeadKey)
              advanceRight()
            } else continue = false
            if (rHead == null) continue = false
          }
          val r = if (lastMatch != null && keyOrd.compare(lastMatchKey, key) == 0)
            lastMatch else nullRight
          outProj(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
