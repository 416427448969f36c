package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed length of a string/binary payload — the
  * compression-ratio quality signal (t12): near-duplicate boilerplate
  * and template spam compress far below normal prose, while encoded
  * blobs / gibberish barely compress at all, so `deflated/raw` bands
  * documents the way the published large-corpus curation pipelines use
  * entropy-style filters.
  *
  * A native expression (JDK zlib, level 6, raw/nowrap stream) so the
  * signal is a codegen'd scan-side projection — one pass per row, no
  * UDF serialization, no shuffle at any scale. The Deflater is
  * ThreadLocal-reused: the native zlib allocation happens once per
  * executor thread, not once per row.
  *
  * Determinism: byte-stable for a given JDK's zlib at the fixed level;
  * not defined cross-library, so t12 is a rows-only query (no DuckDB
  * oracle — DuckDB exposes no deflate), spec'd behaviorally instead. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires string or binary, got $other")
  }
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => Compress.deflateLen(input.asInstanceOf[UTF8String].getBytes)
    case _ => Compress.deflateLen(input.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Compress.deflateLen($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Compress.deflateLen($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object Compress {

  private val LEVEL = 6

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(LEVEL, /* nowrap = */ true)
  }

  /** Deflated byte length of `bytes` (raw stream, level 6). Called from
    * both interpreted and generated code. */
  def deflateLen(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column API: deflate-compressed length of a string/binary column. */
  def deflate_len(c: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(c)))
}
