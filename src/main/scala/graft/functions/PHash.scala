package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** aHash-style 64-bit perceptual signature of a payload string (m5's
  * core; reference behavior: media near-dup over opaque payloads).
  *
  * Bit-identical to the composed-builtin pipeline it replaced — and to
  * the DuckDB oracle:
  * `v_i = ascii(substring(t, CAST(i * length(t) DIV 64 AS INT) + 1, 1))`
  * for i in 0..63 (Spark's `ascii` is `codePointAt(0)` of the first
  * character), `sv = Σ v_i`, `bit_k = v_k * 64 > sv` (integer-exact
  * mean test), `h = Σ bit_k << k`.
  *
  * A native expression rather than the `transform`/`aggregate`
  * higher-order-function formulation because HOF lambdas don't codegen
  * AND optimizer project-collapsing can inline the intermediate arrays
  * into every lambda reference — interpreted evaluation then re-walks
  * the string O(64³) times per row (observed as a 300 s broadcast
  * timeout at sf0.1 with AQE off). Here: ONE forward codepoint walk
  * per row, O(len), inside whole-stage codegen — the shape that
  * survives a 100 TB scan. */
case class PHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phash64 requires string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    PHash64.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PHash64.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

object PHash64 {

  /** One-pass signature. Empty strings hash to 0L — callers filter
    * `length >= 1` (the mean test is meaningless on no samples); the
    * value exists only for totality. Sample positions `i*n/64` are
    * non-decreasing, so a single forward walk over the codepoints
    * assigns every sample. */
  def hash(s: UTF8String): Long = {
    val n = s.numChars()
    if (n == 0) return 0L
    val js = s.toString
    val v = new Array[Long](64)
    var sum = 0L
    var i = 0 // next sample to assign
    var ci = 0 // current codepoint index
    var off = 0 // java-char offset of that codepoint
    val len = js.length
    while (i < 64 && off < len) {
      val cp = js.codePointAt(off)
      while (i < 64 && (i.toLong * n / 64).toInt == ci) {
        v(i) = cp; sum += cp; i += 1
      }
      off += Character.charCount(cp)
      ci += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) {
      if (v(k) * 64 > sum) h |= 1L << k
      k += 1
    }
    h
  }

  /** Column API: the 64-bit perceptual signature of a string column. */
  def phash64(c: Column): Column =
    ColumnBridge.column(PHash64(ColumnBridge.expression(c)))
}
