package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a document fingerprint as a native Catalyst expression.
  *
  * A custom `Expression` (not a UDF) so it participates in whole-stage
  * codegen: the generated loop runs directly over the UTF-8 bytes of the
  * UnsafeRow string with no boxing or serialization. Used for §F
  * document fingerprinting and as a stable content key for exact dedup
  * at scale (cheaper than sha256 when cryptographic strength isn't
  * needed).
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fingerprint64 requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Fingerprint64.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** FNV-1a over raw bytes; called from both interpreted and generated
    * code paths. */
  def hash(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def fingerprint64(c: Column): Column =
    ColumnBridge.column(Fingerprint64(ColumnBridge.expression(c)))
}
