package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg's `bucket[N]` partition transform, per the PUBLIC Iceberg
  * table spec (Appendix B "32-bit Hash Requirements"): murmur3_x86_32
  * (seed 0) over a type-specific byte encoding, then
  * `(hash & Int.MaxValue) % N`.
  *
  *  - int / long / date / timestamp hash their 8-byte LITTLE-endian
  *    long value (int widened first — so `bucket(34:int)` ==
  *    `bucket(34:long)`, as the spec requires for type promotion);
  *  - string hashes its UTF-8 bytes;
  *  - decimal hashes the minimal two's-complement BIG-endian bytes of
  *    its unscaled value;
  *  - binary hashes its raw bytes.
  *
  * graft's own `bucket(n, col)` layout hashes with xxhash64 (Spark's
  * codegen'd native hash — the fast default); `mbucket(n, col)` uses
  * THIS transform so [[graft.sources.IcebergInterop.mirrorToIceberg]]
  * can declare a real `bucket[n]` partition field that foreign Iceberg
  * engines prune correctly (the xxhash64 layout must omit the field —
  * a declared-but-differently-hashed bucket would mis-prune).
  *
  * A native codegen expression: the transform rides the write-side
  * projection inside whole-stage codegen, one hash per row, no UDF. */
case class IcebergBucket(numBuckets: Int, child: Expression)
    extends UnaryExpression {
  require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | StringType |
         BinaryType | _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket supports int/long/date/timestamp/string/decimal/binary, got $other")
  }
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      IcebergHash.bucketLong(input.asInstanceOf[Int].toLong, numBuckets)
    case LongType | TimestampType =>
      IcebergHash.bucketLong(input.asInstanceOf[Long], numBuckets)
    case StringType =>
      IcebergHash.bucketBytes(input.asInstanceOf[UTF8String].getBytes, numBuckets)
    case BinaryType =>
      IcebergHash.bucketBytes(input.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType =>
      IcebergHash.bucketBytes(input.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.unscaledValue().toByteArray, numBuckets)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = "graft.functions.IcebergHash"
    child.dataType match {
      case IntegerType | DateType =>
        defineCodeGen(ctx, ev, c => s"$h.bucketLong((long) $c, $numBuckets)")
      case LongType | TimestampType =>
        defineCodeGen(ctx, ev, c => s"$h.bucketLong($c, $numBuckets)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$h.bucketBytes($c.getBytes(), $numBuckets)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"$h.bucketBytes($c, $numBuckets)")
      case _: DecimalType =>
        defineCodeGen(ctx, ev, c =>
          s"$h.bucketBytes($c.toJavaBigDecimal().unscaledValue().toByteArray(), $numBuckets)")
    }
  }
  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

object IcebergHash {

  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  /** murmur3_x86_32, seed 0 — the published algorithm, byte-stream
    * little-endian blocks. */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    var h = 0
    var i = 0
    while (i + 4 <= len) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val tail = len & 3
    if (tail == 3) k ^= (data(i + 2) & 0xff) << 16
    if (tail >= 2) k ^= (data(i + 1) & 0xff) << 8
    if (tail >= 1) {
      k ^= data(i) & 0xff
      k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
      h ^= k
    }
    h ^= len
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Long input hashes its 8-byte little-endian encoding (Iceberg spec:
    * ints widen to long first so bucket values agree across promotions). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b)
  }

  def bucketLong(v: Long, n: Int): Int = ((hashLong(v) & Int.MaxValue) % n)

  def bucketBytes(b: Array[Byte], n: Int): Int = ((hashBytes(b) & Int.MaxValue) % n)

  /** Column API: Iceberg `bucket[n]` ordinal of a column. */
  def iceberg_bucket(n: Int, c: Column): Column =
    ColumnBridge.column(IcebergBucket(n, ColumnBridge.expression(c)))
}
