package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonicalization step every LLM text-cleaning pipeline runs before
  * dedup/fingerprinting (decomposed sequences like `e` + U+0301 and
  * composed `é` must hash identically or near-dup detection silently
  * fragments). Spark ships no normalizer builtin; a Scala UDF here
  * would break whole-stage codegen on the hottest full-text scan, so
  * this is the DeflateLen/PHash64 pattern: one shared JVM kernel
  * called from both interpreted and generated code, with an
  * already-normalized fast path that returns the INPUT buffer
  * (zero-copy — ASCII corpora never allocate). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    // Pure-ASCII is definitionally NFC (every ASCII code point is its
    // own canonical composition) — detect it on the raw UTF-8 buffer
    // BEFORE any toString, so ASCII corpora truly never allocate: the
    // previous fast path still paid a full String copy just to ask
    // isNormalized.
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
