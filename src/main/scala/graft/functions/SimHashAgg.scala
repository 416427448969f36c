package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** 64-bit SimHash signature as a single typed aggregate.
  *
  * The composable form (64 separate `sum(when(bit_j, 1).otherwise(-1))`
  * aggregate columns) generates code past the JIT/codegen method-size
  * limits and falls off the fast path — the same cliff MinHash hit with
  * 128 min() columns (see [[MinHashAgg]]). This aggregate keeps the 64
  * bit-counters in one primitive long array, updates them in a tight
  * loop per input hash, and folds the final sign vector into the long
  * signature at eval. Update/merge follow the standard two-phase
  * contract, so map-side partial aggregation applies and the shuffle
  * carries one 64-long buffer per document.
  *
  * Semantics are identical to the composed form: counter j accumulates
  * +1 when bit j of the input hash is set, −1 otherwise; signature bit
  * j is set iff the counter is positive.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (((h >>> j) & 1L) * 2L) - 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
}

object SimHashAgg {
  /** Column API: 64-bit simhash signature of a hashed-token column. */
  def simhash(h: Column): Column =
    ColumnBridge.column(SimHashAgg(ColumnBridge.expression(h)).toAggregateExpression())

  /** Stateless per-ROW twin of the aggregate: the 64-bit signature of
    * a token ARRAY column, computed with higher-order functions in one
    * projection. No aggregation state — it runs scan-side inside a
    * streaming micro-batch (the h10 ingest path), where a grouped
    * typed aggregate would force a stateful shuffle per batch. Bit
    * semantics are identical to [[SimHashAgg]] (counter j: +1 when bit
    * j of xxhash64(token) is set, −1 otherwise, over the DISTINCT
    * token set; signature bit j set iff counter > 0) — spec-pinned
    * equal to the aggregate on the benchmark corpus. */
  def simhashOfTokens(toks: Column): Column = {
    import org.apache.spark.sql.functions._
    val hs = transform(array_distinct(toks), t => xxhash64(t))
    val counters = aggregate(hs, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)), i =>
          call_function("shiftrightunsigned", h, i)
            .bitwiseAND(lit(1L)) * lit(2L) - lit(1L)),
        (a, b) => a + b))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)), (c, i) =>
        when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (a, b) => a.bitwiseOR(b))
  }
}
