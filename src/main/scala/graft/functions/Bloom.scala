package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom filter over 64-bit hashes as ONE mergeable typed aggregate plus
  * a codegen'd membership probe — the bounded-memory membership
  * structure for corpus-scale decontamination: the benchmark side
  * reduces to a FIXED number of bits (config, ~hundreds of KB)
  * regardless of how many n-grams the benchmark suite holds, where the
  * exact-hash-set form (p7) grows 8 bytes per distinct gram.
  *
  * Bit placement is Kirsch–Mitzenmacher double hashing (h₁ + i·h₂ over
  * k probes) — the standard construction, preserving the classic
  * false-positive bound (1 − e^(−kn/m))^k with only two 32-bit halves
  * of the input hash. No false negatives by construction.
  *
  * update/merge follow the two-phase partial-aggregation contract, so
  * the builder is map-side combined: each task OR-folds its slice into
  * one local bitset and the shuffle carries one m-bit buffer per task,
  * never the gram stream.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits % 64 == 0, "numBits must be a multiple of 64")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
}

/** Membership probe: true iff all k probe bits for the hash are set.
  * A native expression (with doGenCode) so the scan-side probe of every
  * training gram stays inside whole-stage codegen — the hot path of the
  * decontamination filter. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (binary, bigint), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(bloom: Any, h: Any): Any =
    Bloom.mightContain(bloom.asInstanceOf[Array[Byte]],
      h.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.Bloom.mightContain($b, $h, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object Bloom {

  /** Probe index i for hash h: Kirsch–Mitzenmacher h₁ + i·h₂ with h₂
    * forced odd. Shared bit math for set (builder, long-array view) and
    * mightContain (probe, serialized-bytes view). */
  @inline private def bitIndex(h: Long, i: Int, numBits: Int): Int = {
    val h1 = h
    val h2 = (h >>> 32) | 1L
    (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
  }

  def set(bits: Array[Long], h: Long, k: Int): Unit = {
    val m = bits.length * 64
    var i = 0
    while (i < k) {
      val idx = bitIndex(h, i, m)
      bits(idx >> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  /** Called from both interpreted and generated code. Bytes are the
    * big-endian serialization of the long-array bitset (BloomAgg.eval),
    * so bit j of word w lives in byte w*8 + (7 - (j>>3 & 7)). */
  def mightContain(bytes: Array[Byte], h: Long, k: Int): Boolean = {
    val m = bytes.length * 8
    var i = 0
    while (i < k) {
      val idx = bitIndex(h, i, m)
      val byteIdx = (idx >> 6) * 8 + 7 - ((idx >> 3) & 7)
      if ((bytes(byteIdx) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Column API: build the m-bit Bloom filter of a long-hash column. */
  def bloom(h: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(h), numBits, numHashes)
        .toAggregateExpression())

  /** Column API: probe a serialized Bloom filter. */
  def might_contain(bloom: Column, h: Column, numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(h), numHashes))
}
