package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bounded top-k as ONE typed aggregate: keeps the k best (id, score)
  * pairs — score descending, id ascending on ties — per group.
  *
  * The window-rank formulation (`row_number() over (partition by q)`)
  * shuffles EVERY scored row to the query's reducer before ranking: at
  * 1 B corpus vectors × 20 queries that is 2×10¹⁰ rows through 20
  * reducers. This aggregate does the cut map-side: each partition
  * reduces its slice to a k-sized buffer (the standard
  * TypedImperativeAggregate partial/merge contract), so the exchange
  * carries (groups × partitions × k) buffer rows — independent of
  * corpus size. The buffer stays sorted; inserts against a full buffer
  * reject non-qualifying rows in O(1) via the current worst.
  */
case class TopKAgg(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Double)]] {

  override def createAggregationBuffer(): ArrayBuffer[(Long, Double)] =
    new ArrayBuffer[(Long, Double)](k + 1)

  // true iff (idA, scA) ranks strictly better than (idB, scB)
  @inline private def beats(idA: Long, scA: Double, idB: Long, scB: Double): Boolean =
    scA > scB || (scA == scB && idA < idB)

  private def insert(buf: ArrayBuffer[(Long, Double)], id: Long, sc: Double): Unit = {
    // NaN beats nothing and nothing beats NaN, so an unguarded NaN
    // score (0/0 cosine of a zero-norm vector) would fall through the
    // position loop to index 0 and rank as the BEST neighbor — exclude
    // it like SQL ORDER BY excludes unknowns from a top-k semantics
    if (sc.isNaN) return
    if (buf.length == k) {
      val (wid, wsc) = buf(k - 1)
      if (!beats(id, sc, wid, wsc)) return
    }
    var i = 0
    while (i < buf.length && beats(buf(i)._1, buf(i)._2, id, sc)) i += 1
    // idempotent on exact duplicates: multi-probe candidate generation
    // (IVF m×nprobe cell overlap) re-scores the same pair with the same
    // deterministic double — the duplicate lands adjacent in the sorted
    // buffer and is rejected here, so no dropDuplicates shuffle is
    // needed upstream
    if (i < buf.length && buf(i)._1 == id && buf(i)._2 == sc) return
    buf.insert(i, (id, sc))
    if (buf.length > k) buf.remove(k)
  }

  override def update(buf: ArrayBuffer[(Long, Double)], input: InternalRow): ArrayBuffer[(Long, Double)] = {
    val id = idExpr.eval(input)
    val sc = scoreExpr.eval(input)
    if (id != null && sc != null)
      insert(buf, id.asInstanceOf[Long], sc.asInstanceOf[Double])
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Double)], other: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    other.foreach { case (id, sc) => insert(buf, id, sc) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Double)]): Any =
    new GenericArrayData(buf.map { case (id, sc) =>
      InternalRow(id, sc)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (id, sc) => bb.putLong(id); bb.putDouble(sc) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Double)](k + 1)
    (0 until n).foreach(_ => buf += ((bb.getLong, bb.getDouble)))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(idExpr = c(0), scoreExpr = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
}

object TopKAgg {
  /** Column API: array of the k best (neighbor_id, cosine) structs in
    * rank order (score desc, id asc on ties). */
  def topk(id: Column, score: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(id), ColumnBridge.expression(score), k)
        .toAggregateExpression())
}
