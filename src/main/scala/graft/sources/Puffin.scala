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
