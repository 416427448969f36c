package graft.functions

/** Dependency-free Theta sketch in the Apache DataSketches
  * `apache-datasketches-theta-v1` serialized form (the blob type the
  * Iceberg spec's Puffin statistics files carry for per-column NDV).
  *
  * The shapes implemented are the public format's compact ORDERED
  * sketch images (datasketches.apache.org memory layouts):
  *
  *  - empty: 1 preamble long (preLongs=1, serVer=3, family=3,
  *    flags EMPTY|COMPACT|ORDERED|READONLY, seed hash)
  *  - exact mode (≤ k retained): 2 preamble longs (retained count +
  *    p=1.0) followed by the sorted retained hashes; theta implied 1.0
  *  - estimating mode: 3 preamble longs (the third is thetaLong)
  *    followed by the k smallest hashes; estimate = k / (theta/MAX)
  *
  * Values hash through MurmurHash3 x64-128 with the DataSketches
  * default seed 9001 (longs as 8 little-endian bytes, strings as
  * UTF-8, doubles canonicalized via `+0.0` then their LE long bits —
  * the library's own update rules), keeping the low 63 bits of h1.
  * Correctness here is round-trip + estimate-accuracy; byte layout
  * follows the published format so stock readers can decode.
  */
private[graft] object ThetaSketch {

  val DefaultNominal = 4096
  val DefaultSeed = 9001L
  private val MaxThetaLong = Long.MaxValue

  // ---------------------------------------------- murmur3 x64 128

  /** MurmurHash3 x64 128 (public algorithm), returning (h1, h2). */
  def murmur128(data: Array[Byte], seed: Long): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    val nblocks = data.length / 16
    def getLong(i: Int): Long = {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (data(i + j) & 0xffL); j -= 1 }
      v
    }
    var b = 0
    while (b < nblocks) {
      var k1 = getLong(b * 16)
      var k2 = getLong(b * 16 + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2
      h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1
      h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }
    var k1 = 0L
    var k2 = 0L
    val tail = nblocks * 16
    val rem = data.length & 15
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 = (k2 << 8) | (data(tail + j) & 0xffL); j -= 1 }
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 = (k1 << 8) | (data(tail + j) & 0xffL); j -= 1 }
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length.toLong
    h2 ^= data.length.toLong
    h1 += h2; h2 += h1
    def fmix(v0: Long): Long = {
      var v = v0
      v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
      v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
      v ^= v >>> 33
      v
    }
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  /** A value's theta hash: low 63 bits of h1 (the DataSketches update
    * rule — `>>> 1` keeps hashes in [0, 2^63)). */
  def hashBytes(data: Array[Byte], seed: Long = DefaultSeed): Long =
    murmur128(data, seed)._1 >>> 1

  def hashLong(v: Long, seed: Long = DefaultSeed): Long = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b, seed)
  }

  def hashString(s: String, seed: Long = DefaultSeed): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  def hashDouble(d: Double, seed: Long = DefaultSeed): Long =
    hashLong(java.lang.Double.doubleToLongBits(d + 0.0), seed)

  // Explicit-arity entry points for GENERATED code (Java call sites
  // cannot pass Scala default arguments); UTF8String avoids a
  // String re-copy on the hot path.
  def hashLongDefault(v: Long): Long = hashLong(v)
  def hashDoubleDefault(d: Double): Long = hashDouble(d)
  def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long =
    hashBytes(s.getBytes)

  /** Seed hash (the preamble's 16-bit check): murmur of the seed's
    * 8 LE bytes with seed 0, low 16 bits, must be non-zero. */
  def seedHash(seed: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((seed >>> (8 * i)) & 0xff).toByte; i += 1 }
    val h = (murmur128(b, 0L)._1 & 0xffffL).toInt
    require(h != 0, s"seed $seed hashes to 0 — pick another seed")
    h
  }

  // -------------------------------------------------- sketch model

  /** A compact ordered theta sketch: the retained hashes (sorted,
    * all < thetaLong) and the theta. */
  final case class Sketch(thetaLong: Long, hashes: Array[Long],
      seed: Long = DefaultSeed) {
    def estimate: Double =
      if (thetaLong == MaxThetaLong) hashes.length.toDouble
      else hashes.length.toDouble * MaxThetaLong.toDouble / thetaLong.toDouble
  }

  /** Build a sketch from raw theta hashes (deduplicated here):
    * exact up to `nominal` distinct, then KMV-style estimating with
    * theta = the (nominal+1)-th smallest hash. */
  def fromHashes(hashes: Iterable[Long],
      nominal: Int = DefaultNominal, seed: Long = DefaultSeed): Sketch = {
    val distinct = hashes.toArray.distinct.sorted
    if (distinct.length <= nominal)
      Sketch(MaxThetaLong, distinct, seed)
    else {
      val theta = distinct(nominal)
      Sketch(theta, distinct.take(nominal), seed)
    }
  }

  // ----------------------------------------------------- serialize

  /** The `apache-datasketches-theta-v1` blob bytes (compact ordered
    * image, little-endian). */
  def serialize(s: Sketch): Array[Byte] = {
    val empty = s.hashes.isEmpty && s.thetaLong == MaxThetaLong
    val exact = s.thetaLong == MaxThetaLong
    val preLongs = if (empty) 1 else if (exact) 2 else 3
    val bb = java.nio.ByteBuffer
      .allocate(preLongs * 8 + s.hashes.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(preLongs.toByte)
    bb.put(3.toByte) // serVer
    bb.put(3.toByte) // family: COMPACT
    bb.put(0.toByte) // lgNomLongs unused in compact images
    // flags: READONLY(2) | EMPTY(4) | COMPACT(8) | ORDERED(16)
    bb.put(((if (empty) 4 else 0) | 2 | 8 | 16).toByte)
    bb.put(0.toByte)
    bb.putShort(seedHash(s.seed).toShort)
    if (!empty) {
      bb.putInt(s.hashes.length)
      bb.putFloat(1.0f) // p
      if (!exact) bb.putLong(s.thetaLong)
      s.hashes.foreach(bb.putLong)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte],
      seed: Long = DefaultSeed): Sketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val preLongs = bb.get() & 0xff
    val serVer = bb.get() & 0xff
    require(serVer == 3, s"theta sketch serVer $serVer, expected 3")
    bb.get() // family
    bb.get()
    val flags = bb.get() & 0xff
    bb.get()
    val sh = bb.getShort() & 0xffff
    require(sh == seedHash(seed),
      s"theta sketch seed hash $sh does not match seed $seed")
    if ((flags & 4) != 0 || preLongs == 1)
      return Sketch(MaxThetaLong, Array.empty, seed)
    val count = bb.getInt()
    bb.getFloat()
    val theta = if (preLongs >= 3) bb.getLong() else MaxThetaLong
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) { hs(i) = bb.getLong(); i += 1 }
    Sketch(theta, hs, seed)
  }
}

/** Codegen theta-hash of a column value (long / string / double after
  * the caller's cast) — the per-row kernel of
  * [[graft.sources.IcebergInterop.writeIcebergStatistics]]'s
  * distinct-hash pass. A Scala UDF here would put a per-row closure +
  * catalyst↔scala conversion on every value of every eligible column
  * of a wide table; this stays inside whole-stage codegen. */
case class ThetaHash(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_hash takes bigint/string/double (cast first), got $other")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => ThetaSketch.hashLong(input.asInstanceOf[Long])
    case StringType =>
      ThetaSketch.hashUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    case DoubleType => ThetaSketch.hashDouble(input.asInstanceOf[Double])
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case LongType =>
        s"${ev.value} = graft.functions.ThetaSketch.hashLongDefault($c);"
      case StringType =>
        s"${ev.value} = graft.functions.ThetaSketch.hashUtf8($c);"
      case DoubleType =>
        s"${ev.value} = graft.functions.ThetaSketch.hashDoubleDefault($c);"
      case other => throw new IllegalStateException(s"unreachable: $other")
    })

  override protected def withNewChildInternal(newChild: Expression): ThetaHash =
    copy(child = newChild)
}

/** One-pass bounded theta-sketch build as a typed aggregate (KMV /
  * QuickSelect): the buffer is the ≤`nominal` smallest DISTINCT theta
  * hashes seen plus the running theta, so partial aggregates are
  * map-side (the shuffle carries one ≤32 KiB buffer per group, never
  * the raw values) and merge is the standard theta union. Input is a
  * pre-hashed long column (apply [[ThetaHash]] scan-side — it stays in
  * whole-stage codegen); eval emits the compact-ordered
  * `apache-datasketches-theta-v1` blob, so the result is directly
  * interchangeable with the Puffin statistics path and any
  * DataSketches reader. Unlike HLL (a1/a4), theta sketches support set
  * INTERSECTION with bounded error — the capability a5 exercises. */
case class ThetaSketchAgg(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    nominal: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[ThetaSketchAgg.Buf] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types.{BinaryType, DataType}
  import ThetaSketchAgg.Buf

  override def createAggregationBuffer(): Buf =
    new Buf(Long.MaxValue, new java.util.TreeSet[java.lang.Long]())

  private def insert(buf: Buf, h: Long): Unit =
    if (h < buf.theta && buf.set.add(h) && buf.set.size > nominal) {
      // (nominal+1)-th smallest seen becomes the new exclusive theta
      val largest = buf.set.pollLast()
      buf.theta = largest
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    if (other.theta < buf.theta) {
      buf.theta = other.theta
      // theta tightened: retained hashes at or above it are dead
      val it = buf.set.tailSet(other.theta, true).iterator()
      while (it.hasNext) { it.next(); it.remove() }
    }
    val it = other.set.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: Buf): Any = {
    val hs = new Array[Long](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { hs(i) = it.next(); i += 1 }
    ThetaSketch.serialize(ThetaSketch.Sketch(buf.theta, hs))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.set.size * 8)
    bb.putLong(buf.theta)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val theta = bb.getLong
    val set = new java.util.TreeSet[java.lang.Long]()
    while (bb.hasRemaining) set.add(bb.getLong)
    new Buf(theta, set)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
}

object ThetaSketchAgg {
  /** theta + retained distinct hashes (all < theta), ordered. */
  final class Buf(var theta: Long, val set: java.util.TreeSet[java.lang.Long])

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Codegen theta hash of a bigint/string/double column. */
  def theta_hash(c: Column): Column =
    ColumnBridge.column(ThetaHash(ColumnBridge.expression(c)))

  /** Aggregate a pre-hashed long column into a serialized theta
    * sketch (compact-ordered DataSketches v1 bytes). */
  def theta_sketch(h: Column, nominal: Int = ThetaSketch.DefaultNominal): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(h), nominal)
        .toAggregateExpression())

  /** Intersection estimate of two sketches (driver-side, on the
    * deserialized compact images): theta = min, retained = common
    * hashes below it, estimate = |retained| / theta-fraction. */
  def intersect(a: ThetaSketch.Sketch, b: ThetaSketch.Sketch): ThetaSketch.Sketch = {
    val theta = math.min(a.thetaLong, b.thetaLong)
    val bs = b.hashes.toSet
    val common = a.hashes.filter(h => h < theta && bs.contains(h))
    ThetaSketch.Sketch(theta, common, a.seed)
  }
}
