package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native dot product over two double arrays.
  *
  * The composable form (`zip_with` + `aggregate`) evaluates a lambda per
  * element with boxing — ~50× slower than a primitive loop on a 12M-pair
  * similarity join. This expression generates a direct loop over the
  * underlying ArrayData, stays inside whole-stage codegen, and sums
  * left-to-right in index order — the exact summation order the DuckDB
  * oracle uses, so results stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // Each side may be array<double> or array<float>: floats widen to
  // double per element BEFORE the multiply, which is exact (every
  // float is exactly representable as a double), so a float-shipped
  // vector dots bit-identically to its double-cast twin — the property
  // that lets the d5 shuffle carry half the bytes. Dispatch is static
  // per side (resolved at planning), not per row.
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.dot($a, ${isFloat(left)}, $b, ${isFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fraction of positions where two long arrays agree — the unbiased
  * MinHash similarity estimate. Native loop for the same reason as
  * [[DotProduct]]: candidate-pair filtering evaluates this millions of
  * times and lambda-based forms fall off the fast path. */
case class ArrayEqFraction(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayEqFraction.eqFraction(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayEqFraction.eqFraction($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqFraction =
    copy(left = newLeft, right = newRight)
}

object ArrayEqFraction {
  def eqFraction(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  def array_eq_fraction(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayEqFraction(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Intersection size of two SORTED string arrays by linear merge —
  * O(|A|+|B|) with zero allocation. The builtin
  * `size(array_intersect(…))` builds a hash set and materializes the
  * intersection array per row; the Jaccard verify evaluates this once
  * per candidate pair, so the merge loop keeps the verify stage inside
  * whole-stage codegen with no per-row garbage. Inputs MUST be sorted
  * ascending (sort_array) — the binary UTF8String order both
  * `sort_array` and this comparison use. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def count(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

object DotProduct {
  /** Sequential (index-order) sum — called from interpreted and
    * generated paths. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Type-dispatched entry point (from interpreted and generated
    * code): either side may hold float elements, widened exactly. The
    * flags are compile-time constants in generated code, so the JIT
    * sees four monomorphic loops. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    if (!aFloat && !bFloat) return dot(a, b)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    if (aFloat && bFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else if (aFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    }
    acc
  }

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
