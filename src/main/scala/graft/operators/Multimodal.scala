package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fingerprint64
import graft.sources.Tables

/** §I multimodal column plumbing.
  *
  * Media (image/audio/video) travel as opaque `binary` columns with
  * typed metadata alongside — the Spark-side contract of a multimodal
  * pipeline. The decode step itself is STUBBED with a deterministic
  * fake (no media libraries in this environment): `fakeDecode` derives
  * "dimensions" from a content fingerprint. Everything around it —
  * schema, binary handling, per-partition batched processing, output
  * shape — is real and verified.
  *
  * Scale notes: decode-style work is per-row and embarrassingly
  * parallel; `m2` batches it per partition (the JVM analog of
  * mapInPandas batches) so a real decoder would amortize model/library
  * init once per partition, not per row.
  */
object Multimodal {

  /** m1: binary payload + metadata extraction, fully oracle-checked on
    * the byte-level operations (length, header bytes). */
  val m1_binary_meta: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .select($"doc_id",
        octet_length($"payload").as("payload_bytes"),
        hex(substring($"payload", 1, 4)).as("header_hex"),
        (octet_length($"payload") > 0).as("is_valid"))
      .orderBy($"doc_id")
  }

  val m1_sql: String =
    """SELECT doc_id,
      | octet_length(encode(text)) AS payload_bytes,
      | hex(substring(text, 1, 4)) AS header_hex,
      | octet_length(encode(text)) > 0 AS is_valid
      |FROM documents ORDER BY doc_id""".stripMargin

  final case class Blob(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                                 n_bytes: Int, feature: Array[Float])

  /** Deterministic fake decode — stands in for an image decoder.
    * Derives stable pseudo-dimensions and a 4-dim feature vector from
    * the payload fingerprint. */
  private[operators] def fakeDecode(b: Blob): MediaFeatures = {
    val fp = Fingerprint64.hash(b.payload)
    val w = 64 + java.lang.Long.remainderUnsigned(fp, 1024).toInt
    val h = 64 + java.lang.Long.remainderUnsigned(fp >>> 11, 1024).toInt
    val feat = Array.tabulate(4)(i =>
      (java.lang.Long.remainderUnsigned(fp >>> (i * 8), 1000).toInt / 1000.0f))
    MediaFeatures(b.doc_id, w, h, b.payload.length, feat)
  }

  /** m2: per-partition batched feature extraction over binary payloads
    * (typed Dataset + mapPartitions — decoder init happens once per
    * partition). */
  def m2_feature_batch(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions { blobs =>
        // a real decoder would be constructed HERE, once per partition
        blobs.map(fakeDecode)
      }
  }

  /** queries() wrapper for m2 — deterministic, rows-only driver check
    * (feature derivation uses fingerprint64, not expressible in SQL).
    * The float feature vector is surfaced as a scalar string: the
    * driver's pandas normalization can't hash an array<float> column
    * (round-1 harness error), and feature components are k/1000 by
    * construction, so scaling by 1000 round-trips exactly. */
  val m2_query: Relational.Q = (s, dir) => {
    import s.implicits._
    m2_feature_batch(s, dir).toDF()
      .select($"doc_id", $"width", $"height", $"n_bytes",
        concat_ws(",",
          transform($"feature", x => round(x * 1000).cast("int"))).as("feature_ids"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, Relational.Q] = Map(
    "m1_binary_meta" -> m1_binary_meta,
    "m2_feature_batch" -> m2_query,
  )

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" -> m1_sql,
  )
}
