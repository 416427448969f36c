package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Dependency-free codec for the PUFFIN file format (the public Puffin
  * spec at iceberg.apache.org/puffin-spec/), scoped to what Iceberg v3
  * deletion vectors need:
  *
  * {{{
  * Magic | blob… | Magic | footerJson | payloadSize(4 LE) | flags(4) | Magic
  * }}}
  *
  * Each `deletion-vector-v1` blob is framed per the Iceberg v3 spec —
  * a 4-byte big-endian length of magic+vector, the 4-byte magic
  * `D1 D3 39 64`, the vector as a portable 64-bit RoaringBitmap, and a
  * 4-byte big-endian CRC-32 of magic+vector. That is bit-for-bit the
  * serialization Delta Lake deletion vectors use (v3 adopted it for
  * UniForm sharing), so [[DeletionVectors.serialize]]/
  * [[DeletionVectors.deserialize]] are the vector codec here too.
  * Manifest entries reference a blob by `content_offset` (the length
  * prefix) and `content_size_in_bytes` (the whole blob).
  */
private[graft] object Puffin {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  private def crc32(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue.toInt
  }

  /** One DV blob's bytes: BE length of magic+vector, then the
    * Delta-framed serialized bitmap (which itself starts with the
    * `D1 D3 39 64` magic), then the BE CRC-32 of magic+vector. */
  private[sources] def dvBlobBytes(data: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + data.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    bb.putInt(data.length)
    bb.put(data)
    bb.putInt(crc32(data))
    bb.array()
  }

  /** A written DV blob's manifest coordinates. */
  final case class DvBlob(referencedDataFile: String, offset: Long,
      sizeInBytes: Long, cardinality: Long)

  /** Write ONE Puffin file holding a `deletion-vector-v1` blob per
    * referenced data file (sorted for determinism), with the
    * spec-required footer naming each blob's `referenced-data-file` and
    * `cardinality`. Returns each blob's manifest coordinates. */
  def writeDvFile(conf: Configuration, p: HPath,
      dvs: Seq[(String, Seq[Long])], snapshotId: Long,
      sequenceNumber: Long): Seq[DvBlob] =
    writeDvFileData(conf, p,
      dvs.map { case (ref, ps) =>
        (ref, DeletionVectors.serialize(ps), ps.distinct.size.toLong) },
      snapshotId, sequenceNumber)

  /** [[writeDvFile]] from already-serialized bitmaps (the executor-
    * built merge output: (referenced data file, magic+vector bytes,
    * cardinality)). */
  def writeDvFileData(conf: Configuration, p: HPath,
      dvs: Seq[(String, Array[Byte], Long)], snapshotId: Long,
      sequenceNumber: Long): Seq[DvBlob] = {
    require(dvs.nonEmpty, "writeDvFile needs at least one deletion vector")
    require(dvs.map(_._1).distinct.size == dvs.size,
      "at most one deletion vector per data file")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val blobs = dvs.sortBy(_._1).map { case (ref, data, card) =>
      val offset = out.size().toLong
      val bytes = dvBlobBytes(data)
      out.write(bytes)
      (ref, offset, bytes.length.toLong, card)
    }
    def jsonEscape(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val footerJson = blobs.map { case (ref, off, len, card) =>
      s"""{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":$snapshotId,"sequence-number":$sequenceNumber,""" +
        s""""offset":$off,"length":$len,"properties":{""" +
        s""""referenced-data-file":"${jsonEscape(ref)}",""" +
        s""""cardinality":"$card"}}"""
    }.mkString("""{"blobs":[""", ",", """],"properties":{"created-by":"graft"}}""")
    out.write(Magic)
    val payload = footerJson.getBytes(StandardCharsets.UTF_8)
    out.write(payload)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.putInt(0) // flags: footer payload uncompressed
    out.write(tail.array())
    out.write(Magic)
    val fs = p.getFileSystem(conf)
    val os = fs.create(p, false)
    try os.write(out.toByteArray) finally os.close()
    blobs.map { case (ref, off, len, card) => DvBlob(ref, off, len, card) }
  }

  /** One generic statistics blob for [[writeStatsFile]] (e.g.
    * `apache-datasketches-theta-v1` NDV sketches). */
  final case class StatsBlob(blobType: String, fields: Seq[Int],
      snapshotId: Long, sequenceNumber: Long, data: Array[Byte],
      properties: Map[String, String])

  /** A written blob's coordinates + the file/footer sizes the
    * metadata `statistics` entry needs. */
  final case class StatsFile(fileSizeInBytes: Long,
      footerSizeInBytes: Long,
      blobs: Seq[(StatsBlob, Long, Long)]) // (blob, offset, length)

  /** Write a Puffin STATISTICS file: one uncompressed blob per entry,
    * raw bytes (generic blobs carry no DV framing), the spec's footer
    * naming each blob's type/fields/snapshot/sequence/properties. */
  def writeStatsFile(conf: Configuration, p: HPath,
      blobs: Seq[StatsBlob]): StatsFile = {
    require(blobs.nonEmpty, "writeStatsFile needs at least one blob")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val placed = blobs.map { b =>
      val off = out.size().toLong
      out.write(b.data)
      (b, off, b.data.length.toLong)
    }
    def jsonEscape(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val footerJson = placed.map { case (b, off, len) =>
      val props = b.properties.toSeq.sortBy(_._1).map { case (k, v) =>
        s""""${jsonEscape(k)}":"${jsonEscape(v)}"""" }.mkString(",")
      s"""{"type":"${jsonEscape(b.blobType)}","fields":[${
        b.fields.mkString(",")}],""" +
        s""""snapshot-id":${b.snapshotId},""" +
        s""""sequence-number":${b.sequenceNumber},""" +
        s""""offset":$off,"length":$len,"properties":{$props}}"""
    }.mkString("""{"blobs":[""", ",",
      """],"properties":{"created-by":"graft"}}""")
    out.write(Magic)
    val payload = footerJson.getBytes(StandardCharsets.UTF_8)
    out.write(payload)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.putInt(0)
    out.write(tail.array())
    out.write(Magic)
    val bytes = out.toByteArray
    val fs = p.getFileSystem(conf)
    val os = fs.create(p, false)
    try os.write(bytes) finally os.close()
    StatsFile(bytes.length.toLong,
      (4 + payload.length + 4 + 4 + 4).toLong, placed)
  }

  /** Read a generic blob's raw bytes by footer coordinates. */
  def readBlob(conf: Configuration, puffinPath: String, offset: Long,
      sizeInBytes: Long): Array[Byte] = {
    val p = new HPath(puffinPath)
    val fs = p.getFileSystem(conf)
    require(sizeInBytes >= 0 && sizeInBytes <= Int.MaxValue,
      s"absurd blob size $sizeInBytes in $puffinPath")
    val bytes = new Array[Byte](sizeInBytes.toInt)
    val in = fs.open(p)
    try { in.seek(offset); in.readFully(bytes) } finally in.close()
    bytes
  }

  /** Parse a Puffin file's FOOTER: each blob's (type, fields, offset,
    * length, properties). The spec's tail is
    * `payloadSize(4 LE) | flags(4) | Magic`, the payload JSON sits
    * just before it, preceded by its own Magic. */
  def readFooter(conf: Configuration, puffinPath: String)
      : Seq[(String, Seq[Int], Long, Long, Map[String, String])] = {
    val p = new HPath(puffinPath)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len >= 20, s"$puffinPath is too small to be a Puffin file")
    val in = fs.open(p)
    try {
      val tail = new Array[Byte](12)
      in.seek(len - 12); in.readFully(tail)
      val bb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt(0)
      require(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(tail, 8, 12), Magic),
        s"$puffinPath: bad trailing magic")
      require(payloadSize >= 2 && payloadSize <= len - 20,
        s"$puffinPath: absurd footer payload size $payloadSize")
      val payload = new Array[Byte](payloadSize)
      in.seek(len - 12 - payloadSize); in.readFully(payload)
      val magicCheck = new Array[Byte](4)
      in.seek(len - 12 - payloadSize - 4); in.readFully(magicCheck)
      require(java.util.Arrays.equals(magicCheck, Magic),
        s"$puffinPath: bad footer magic")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(payload)
      val out = Seq.newBuilder[(String, Seq[Int], Long, Long,
        Map[String, String])]
      val it = root.path("blobs").elements()
      while (it.hasNext) {
        val b = it.next()
        val fields = {
          val fb = Seq.newBuilder[Int]
          val fit = b.path("fields").elements()
          while (fit.hasNext) fb += fit.next().asInt()
          fb.result()
        }
        val props = {
          val pb = Map.newBuilder[String, String]
          val pit = b.path("properties").fields()
          while (pit.hasNext) {
            val e = pit.next(); pb += e.getKey -> e.getValue.asText()
          }
          pb.result()
        }
        out += ((b.path("type").asText(), fields,
          b.path("offset").asLong(), b.path("length").asLong(), props))
      }
      out.result()
    } finally in.close()
  }

  /** Read one DV blob by its manifest coordinates, verifying the
    * length framing and CRC — a torn DV read would silently resurrect
    * deleted rows, so any mismatch refuses loudly. */
  def readDvBlob(conf: Configuration, puffinPath: String, offset: Long,
      sizeInBytes: Long): DeletionVectors.Roaring64 =
    DeletionVectors.deserialize(
      readDvBlobData(conf, puffinPath, offset, sizeInBytes))

  /** [[readDvBlob]]'s verified SERIALIZED form (magic + vector bytes),
    * for bitmap-level merges that never decode on the driver. */
  def readDvBlobData(conf: Configuration, puffinPath: String, offset: Long,
      sizeInBytes: Long): Array[Byte] = {
    val p = new HPath(puffinPath)
    val fs = p.getFileSystem(conf)
    require(sizeInBytes >= 12 && sizeInBytes <= Int.MaxValue,
      s"absurd deletion-vector blob size $sizeInBytes in $puffinPath")
    val bytes = new Array[Byte](sizeInBytes.toInt)
    val in = fs.open(p)
    try { in.seek(offset); in.readFully(bytes) } finally in.close()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val len = bb.getInt(0)
    require(len == sizeInBytes - 8,
      s"deletion-vector blob at $puffinPath offset $offset declares " +
        s"$len vector bytes but the manifest says $sizeInBytes total " +
        "(expected vector + 8 framing bytes)")
    val data = java.util.Arrays.copyOfRange(bytes, 4, 4 + len)
    val storedCrc = bb.getInt(4 + len)
    require(crc32(data) == storedCrc,
      s"deletion-vector blob at $puffinPath offset $offset fails its " +
        "CRC-32 check")
    data
  }
}
