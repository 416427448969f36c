package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** MinHash signature as a single typed aggregate.
  *
  * The composable form (128 separate `min(pmod(h*a+b, p))` aggregate
  * columns) generates code past the JIT/codegen method-size limits and
  * falls back to slow paths. This aggregate keeps the whole signature in
  * one primitive long array and updates all permutations in a tight
  * loop per input row — one aggregation operator, map-side partial
  * aggregation included (update/merge are the standard two-phase
  * contract, so the shuffle carries one 128-long buffer per doc).
  *
  * Permutations are h ↦ (a·h + b) mod p over p = 2³¹−1 (Carter–Wegman);
  * inputs are expected already reduced mod p.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = MinHashAgg.P
  // coefficients are deterministic in (seed, numPerms) so partial
  // aggregates on different executors agree
  @transient private lazy val coeffs: Array[(Long, Long)] =
    MinHashAgg.coefficients(numPerms, seed)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < numPerms) {
        val (a, b) = coeffs(k)
        val perm = (a * h + b) % P
        if (perm < buf(k)) buf(k) = perm
        k += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numPerms) {
      if (other(k) < buf(k)) buf(k) = other(k)
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
}

object MinHashAgg {
  val P: Long = 2147483647L

  def coefficients(numPerms: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPerms)((1L + rnd.nextInt((P - 1).toInt),
      rnd.nextInt(P.toInt).toLong))
  }

  /** Column API: minhash signature (array of numPerms longs) of a
    * pre-hashed (mod-p long) column. */
  def minhash(h: Column, numPerms: Int, seed: Long): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(h), numPerms, seed)
        .toAggregateExpression())
}
