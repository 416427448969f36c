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

  /** m3: frame sampling from a "video" payload — the temporal-sampling
    * plumbing of a video pipeline (decode stays stubbed; the chunking,
    * stride selection, and per-frame extraction are the real Spark-side
    * work and are byte-exact, so this one IS oracle-checkable). The
    * payload splits into fixed 256-byte "frames"; at most 8 frames are
    * sampled uniformly (stride = ⌈n/8⌉ — the standard uniform temporal
    * sampling a video feature extractor applies before decoding). Pure
    * scan-side projection + explode: no shuffle except the presentation
    * sort; a real decoder slots in per sampled frame, paying decode
    * cost on 8 frames instead of the full stream. */
  val m3_frame_sample: Relational.Q = (s, dir) => {
    import s.implicits._
    val fs = 256; val maxF = 8
    Tables.documents(s, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .filter(octet_length($"payload") > 0)
      .withColumn("n_frames",
        expr(s"CAST((octet_length(payload) + ${fs - 1}) DIV $fs AS INT)"))
      .withColumn("stride",
        greatest(lit(1), expr(s"CAST((n_frames + ${maxF - 1}) DIV $maxF AS INT)")))
      .withColumn("frame_idx", explode(sequence(lit(0), $"n_frames" - 1, $"stride")))
      .select($"doc_id", $"frame_idx",
        octet_length(expr(s"substring(payload, frame_idx * $fs + 1, $fs)"))
          .as("frame_bytes"),
        hex(expr(s"substring(substring(payload, frame_idx * $fs + 1, $fs), 1, 4)"))
          .as("frame_header"))
      .orderBy($"doc_id", $"frame_idx")
  }

  // DuckDB has no substring over BLOB, so the oracle slices the VARCHAR
  // — byte-exact because the corpus is ASCII (octet_length == length,
  // the same equivalence m1's header check already relies on), and
  // hex(VARCHAR) hex-encodes the string's bytes like Spark's
  // hex(BINARY).
  val m3_sql: String =
    """WITH f AS (SELECT doc_id, text AS payload,
      |        CAST((octet_length(encode(text)) + 255) // 256 AS INT) AS n_frames
      |      FROM documents WHERE octet_length(encode(text)) > 0),
      |sampled AS (SELECT doc_id, payload, UNNEST(generate_series(0,
      |        n_frames - 1, greatest(1, (n_frames + 7) // 8))) AS frame_idx
      |      FROM f)
      |SELECT doc_id, frame_idx,
      |  octet_length(encode(substring(payload, frame_idx * 256 + 1, 256))) AS frame_bytes,
      |  hex(substring(substring(payload, frame_idx * 256 + 1, 256), 1, 4)) AS frame_header
      |FROM sampled ORDER BY doc_id, frame_idx""".stripMargin

  /** m4: chunk-level binary dedup — payloads split into fixed 256-byte
    * chunks, each chunk content-hashed; payload pairs sharing ≥ 3
    * distinct chunk hashes are storage-dedup candidates (the block-
    * level dedup a media lake runs: shared chunks are stored once).
    * One shuffle keyed on chunk hash; candidate volume is bounded by
    * per-chunk payload lists like d2's shingle join (a hot-chunk df
    * cap is the documented skew valve there). Fixed-size chunking is
    * byte-shift-sensitive — content-defined chunking (rolling-hash
    * boundaries, same plumbing) is the production upgrade and slots
    * into the same chunk-hash relation. md5 makes the chunk hash
    * engine-portable for the oracle. */
  val m4_chunk_dedup: Relational.Q = (s, dir) => {
    import s.implicits._
    val cs = 256
    val chunks = Tables.documents(s, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .filter(octet_length($"payload") > 0)
      .withColumn("n_chunks",
        expr(s"CAST((octet_length(payload) + ${cs - 1}) DIV $cs AS INT)"))
      .withColumn("ci", explode(sequence(lit(0), $"n_chunks" - 1)))
      .select($"doc_id",
        md5(expr(s"substring(payload, ci * $cs + 1, $cs)")).as("h"))
      .distinct()
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_chunks"))
      .filter($"n_shared_chunks" >= 3)
      .orderBy($"doc_a", $"doc_b")
  }

  val m4_sql: String =
    """WITH c AS (
      |  SELECT DISTINCT doc_id,
      |    md5(substring(payload, ci * 256 + 1, 256)) AS h
      |  FROM (SELECT doc_id, text AS payload, UNNEST(generate_series(0,
      |          CAST((octet_length(encode(text)) + 255) // 256 AS INT) - 1)) AS ci
      |        FROM documents WHERE octet_length(encode(text)) > 0) t)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      | COUNT(*) AS n_shared_chunks
      |FROM c a JOIN c b ON a.h = b.h AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING COUNT(*) >= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** m5: perceptual-hash near-dup over media payloads — the media twin
    * of d4's SimHash: an aHash-style 64-bit signature (downsample to 64
    * cells, threshold by the mean — the decode step stays stubbed per
    * the m1/m2 contract, so a cell is a stride-sampled payload
    * codepoint; a real image decoder replaces the cell extraction with
    * 8×8 grayscale and NOTHING downstream changes), quarter-block
    * banding for candidates (hamming ≤ 3 ⇒ ≥ 1 of the 4 16-bit blocks
    * equal — the same pigeonhole guarantee d4 uses), exact hamming
    * confirm via bit_count(xor).
    *
    * Thresholding is integer-exact (`v·64 > Σv` instead of a double
    * mean), so the signature — and therefore the oracle — is
    * bit-identical across engines. Scale shape: signatures are a pure
    * scan-side projection; the only shuffle keys on (block index,
    * block value) with bounded bucket width — never an all-pairs
    * join. */
  val m5_phash_neardup: Relational.Q = (s, dir) =>
    phashPairsOn(Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b"))

  /** The m5 core over an arbitrary DataFrame (public twin:
    * `GraftOps.phashPairs`). `maxHamming` must stay ≤ 3 — the
    * quarter-block pigeonhole guarantees full recall only there.
    * Output: (doc_a, doc_b, hamming). */
  def phashPairsOn(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, maxHamming: Int): org.apache.spark.sql.DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "quarter blocking guarantees recall only for hamming <= 3")
    // signature via the native one-pass PHash64 expression (see its
    // Scaladoc: the HOF formulation melts down under project-collapse
    // in interpreted evaluation); block j is bits [16j, 16j+16) of the
    // 64-bit hash — bit-identical to summing bits[16j+i] << i
    val sig = docs
      .select(col(idCol).as("__id"), col(textCol).as("__t"))
      .filter(length(col("__t")) >= 1)
      .withColumn("h", graft.functions.PHash64.phash64(col("__t")))
      .select(col("__id") +: (0 until 4).map(j =>
        expr(s"shiftrightunsigned(h, ${j * 16}) & 65535").as(s"b$j")): _*)
    // pHash bands have a FIXED 16-bit key space, so bucket occupancy —
    // and the candidate join — grows linearly-then-quadratically with
    // the corpus (measured r16: 80× candidate pairs at 10× docs).
    // Unlike the shingle-keyed joins (whose key space grows with the
    // corpus), this band join therefore caps hot buckets BY DEFAULT:
    // spark.graft.phash.maxBandBucket (default 1024; generic
    // spark.graft.dedup.maxBandBucket honored when set) — wider
    // identical-quarter clusters are boilerplate mass exact dedup
    // collapses, the d4-documented recall trade.
    val conf = docs.sparkSession.conf
    val cap = conf.getOption("spark.graft.phash.maxBandBucket")
      .orElse(conf.getOption("spark.graft.dedup.maxBandBucket"))
      .map(_.toLong).getOrElse(1024L)
    val blocks = graft.operators.Dedup.capBucketsAt(
      sig.select(col("__id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("blk", "bv"))),
      Seq("blk", "bv"), cap)
    val cand = blocks.as("x")
      .join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("doc_a"), col("y.__id").as("doc_b"))
      .distinct()
    cand
      .join(sig.select(col("__id").as("doc_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), Seq("doc_a"))
      .join(sig.select(col("__id").as("doc_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), Seq("doc_b"))
      .withColumn("hamming", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
  }

  val m5_sql: String =
    """WITH v AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 64), i ->
      |      CAST(ascii(substring(text, CAST(i * length(text) // 64 AS INT) + 1, 1)) AS BIGINT)) AS v
      |  FROM documents WHERE length(text) >= 1),
      |b AS (SELECT doc_id, list_transform(v, x ->
      |        CASE WHEN x * 64 > list_sum(v) THEN 1 ELSE 0 END) AS bits
      |      FROM v),
      |sigb AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(range(0,16), i -> bits[CAST(i + 1 AS INT)]  * (1::BIGINT << i))) AS b0,
      |    list_sum(list_transform(range(0,16), i -> bits[CAST(i + 17 AS INT)] * (1::BIGINT << i))) AS b1,
      |    list_sum(list_transform(range(0,16), i -> bits[CAST(i + 33 AS INT)] * (1::BIGINT << i))) AS b2,
      |    list_sum(list_transform(range(0,16), i -> bits[CAST(i + 49 AS INT)] * (1::BIGINT << i))) AS b3
      |  FROM b),
      |blocks AS (
      |  SELECT doc_id, 0 AS blk, b0 AS bv FROM sigb
      |  UNION ALL SELECT doc_id, 1, b1 FROM sigb
      |  UNION ALL SELECT doc_id, 2, b2 FROM sigb
      |  UNION ALL SELECT doc_id, 3, b3 FROM sigb),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM blocks x JOIN blocks y
      |    ON x.blk = y.blk AND x.bv = y.bv AND x.doc_id < y.doc_id)
      |SELECT c.doc_a, c.doc_b,
      |  CAST(bit_count(xor(a.b0, bb.b0)) + bit_count(xor(a.b1, bb.b1)) +
      |       bit_count(xor(a.b2, bb.b2)) + bit_count(xor(a.b3, bb.b3)) AS INT) AS hamming
      |FROM cand c
      |JOIN sigb a ON c.doc_a = a.doc_id
      |JOIN sigb bb ON c.doc_b = bb.doc_id
      |WHERE bit_count(xor(a.b0, bb.b0)) + bit_count(xor(a.b1, bb.b1)) +
      |      bit_count(xor(a.b2, bb.b2)) + bit_count(xor(a.b3, bb.b3)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "m5_phash_neardup" -> m5_phash_neardup,
    "m4_chunk_dedup" -> m4_chunk_dedup,
    "m1_binary_meta" -> m1_binary_meta,
    "m2_feature_batch" -> m2_query,
    "m3_frame_sample" -> m3_frame_sample,
  )

  val oracles: Map[String, String] = Map(
    "m5_phash_neardup" -> m5_sql,
    "m4_chunk_dedup" -> m4_sql,
    "m1_binary_meta" -> m1_sql,
    "m3_frame_sample" -> m3_sql,
  )
}
