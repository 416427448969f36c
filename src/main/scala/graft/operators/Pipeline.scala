package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** §J end-to-end training-data pipeline operators — the composition
  * layer a 100 TB curation job is actually made of: sequence packing,
  * multi-stage curation (language → quality → dedup), and benchmark-
  * contamination detection.
  *
  * Scale notes: packing windows are partitioned per language (the unit
  * a packing stream owns) — no global ordering anywhere. Curation is a
  * conjunction of scan-side predicates plus one anti-join against the
  * (tiny) duplicate list. Contamination joins the corpus against the
  * benchmark's shingle set, which is broadcast-sized by construction.
  */
object Pipeline {

  /** p1: offset packing (concat-then-chunk): documents are laid out
    * per-language in doc_id order; each doc's token offset is a running
    * sum and its bin is offset / ctx_len. This is the standard
    * chunked-concatenation layout for LLM pretraining batches. */
  val p1_sequence_pack: Relational.Q = (s, dir) => {
    import s.implicits._
    val ctx = 2048
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        size(TextFunctions.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("token_offset", sum($"n_tokens").over(w) - $"n_tokens")
      .withColumn("bin_id", ($"token_offset" / ctx).cast("long"))
      .orderBy($"lang", $"doc_id")
  }

  val p1_sql: String =
    """SELECT doc_id, lang, n_tokens,
      | CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS token_offset,
      | CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 2048) AS BIGINT) AS bin_id
      |FROM (SELECT doc_id, lang,
      |        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |      FROM documents) t
      |WINDOW w AS (PARTITION BY lang ORDER BY doc_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY lang, doc_id""".stripMargin

  /** p2: multi-stage curation — keep documents that (1) are labeled a
    * kept language, (2) clear the quality score, (3) are within token
    * bounds, and (4) are not the duplicate side of a near-dup pair
    * (J ≥ 0.8 ⇒ drop the higher doc_id). The final shape of every
    * LLM-corpus cleaning job. */
  val p2_curation_pipeline: Relational.Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // near-dup losers at J >= 0.8 via the MinHash+LSH path (d3): it
    // computes exactly the J >= 0.8 pairs (exact-Jaccard-verified
    // candidates, miss probability ~1e-7) at a fraction of the full
    // prefix-join cost of d2 — the right engine for a curation
    // pipeline that only needs the high-similarity tier.
    val dupLosers = Dedup.d3_minhash_lsh(s, dir)
      .select($"doc_b".as("doc_id"))
    docs
      .filter($"lang".isin("en", "es", "fr", "de"))
      .withColumn("n_tokens", size(TextFunctions.tokens($"text")))
      .withColumn("quality", TextFunctions.qualityScore($"text"))
      .filter($"quality" >= 0.5 && $"n_tokens".between(20, 5000))
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"n_tokens", round($"quality", 6).as("quality"))
      .orderBy($"doc_id")
  }

  val p2_sql: String = {
    val T = "string_split_regex(trim(text), '\\s+')"
    val sw = s"CAST(len(list_filter($T, x -> x IN ('the','a','of','and','in','to','is'))) AS DOUBLE)/greatest(len($T), 1)"
    val mtl = s"CAST(list_sum(list_transform($T, x -> CAST(length(x) AS BIGINT))) AS DOUBLE)/greatest(len($T), 1)"
    val punct = s"CAST(length(text) - length(regexp_replace(text, '[.,!?;:''\"()-]', '', 'g')) AS DOUBLE)/greatest(length(text), 1)"
    val quality = s"least($sw*4.0, 1.0)*0.4 + (CASE WHEN $mtl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)*0.4 + (1.0 - least($punct*5.0, 1.0))*0.2"
    s"""WITH dup_losers AS (
       |  SELECT doc_b AS doc_id FROM (${Dedup.d2_sql.replace("ORDER BY doc_a, doc_b", "")}) p
       |  WHERE jaccard >= 0.8)
       |SELECT doc_id, lang, len($T) AS n_tokens, ROUND($quality, 6) AS quality
       |FROM documents
       |WHERE lang IN ('en','es','fr','de')
       |  AND $quality >= 0.5
       |  AND len($T) BETWEEN 20 AND 5000
       |  AND doc_id NOT IN (SELECT doc_id FROM dup_losers)
       |ORDER BY doc_id""".stripMargin
  }

  /** p3: benchmark-contamination detection — training docs (everything
    * outside source src0) sharing ≥ 5 distinct 3-shingles with any
    * benchmark doc (source src0). The benchmark shingle set is the
    * broadcast side at any corpus scale. */
  val p3_contamination: Relational.Q = (s, dir) => {
    import s.implicits._
    val sh = Tables.documentsSpread(s, dir)
      .select($"doc_id", $"source", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", $"source",
        explode(TextFunctions.shinglesOfTokens($"toks")).as("s"))
    val bench = sh.filter($"source" === "src0")
      .select($"doc_id".as("bench_id"), $"s")
    val train = sh.filter($"source" =!= "src0")
      .select($"doc_id".as("train_id"), $"s")
    train.join(broadcast(bench), "s")
      .groupBy($"train_id", $"bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= 5)
      .orderBy($"train_id", $"bench_id")
  }

  val p3_sql: String =
    """WITH sh AS (
      |  SELECT doc_id, source, UNNEST(list_distinct(
      |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |     for i in generate_series(1, greatest(len(t)-2, 0))])) AS s
      |  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
      |        FROM documents) tok)
      |SELECT a.doc_id AS train_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
      |FROM sh a JOIN sh b ON a.s = b.s
      |WHERE a.source <> 'src0' AND b.source = 'src0'
      |GROUP BY 1, 2 HAVING COUNT(*) >= 5
      |ORDER BY train_id, bench_id""".stripMargin

  /** Engine-independent deterministic [0,100) bucket for a document:
    * first 6 hex digits of md5(doc_id) mod 100. md5 of the same string
    * is identical in every engine, so sampling decisions are
    * reproducible across Spark, DuckDB, or any future runner — the
    * property corpus-mixing configs need (re-running the pipeline on a
    * grown corpus keeps previously-sampled docs sampled). */
  private def hashBucket(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 6), 16, 10).cast("long") % 100
  private def bucketSql(c: String) =
    s"CAST(concat('0x', substring(md5(CAST($c AS VARCHAR)), 1, 6)) AS BIGINT) % 100"

  /** p4: weighted corpus mixing — each source is down-sampled to its
    * mixture weight (src0 100%, src1 50%, src2 25%, everything else
    * 10%) by deterministic hash bucket. The standard "data mixing"
    * stage of an LLM pretraining pipeline: pure scan-side predicate,
    * no shuffle except the presentation sort, trivially 100 TB-safe. */
  val p4_mixture_sample: Relational.Q = (s, dir) => {
    import s.implicits._
    val pct = when($"source" === "src0", 100L)
      .when($"source" === "src1", 50L)
      .when($"source" === "src2", 25L)
      .otherwise(10L)
    Tables.documents(s, dir)
      .select($"doc_id", $"source", hashBucket($"doc_id").as("bucket"), pct.as("pct"))
      .filter($"bucket" < $"pct")
      .select($"doc_id", $"source", $"bucket")
      .orderBy($"doc_id")
  }

  val p4_sql: String =
    s"""SELECT doc_id, source, bucket FROM (
       |  SELECT doc_id, source, ${bucketSql("doc_id")} AS bucket,
       |    CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
       |                WHEN 'src2' THEN 25 ELSE 10 END AS pct
       |  FROM documents) t
       |WHERE bucket < pct ORDER BY doc_id""".stripMargin

  /** p5: stratified exact-N sample — the K lowest hash buckets per
    * language (deterministic total order: bucket, then doc_id), the
    * shape of per-language eval/val splits. One shuffle on the stratum
    * key; the window's top-K filter keeps per-stratum state bounded. */
  val p5_stratified_sample: Relational.Q = (s, dir) => {
    import s.implicits._
    val k = 20
    val w = Window.partitionBy($"lang")
      .orderBy($"bucket", $"doc_id")
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", hashBucket($"doc_id").as("bucket"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"doc_id", $"lang", $"rn".cast("long").as("rn"))
      .orderBy($"lang", $"rn")
  }

  val p5_sql: String =
    s"""SELECT doc_id, lang, rn FROM (
       |  SELECT doc_id, lang, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY lang ORDER BY ${bucketSql("doc_id")}, doc_id) AS BIGINT) AS rn
       |  FROM documents) t
       |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin

  /** p6: APPLY the near-dup clustering — the deduplicated corpus.
    * d1/d2/d3/d7 find duplicates; this is the step that actually drops
    * them: every doc keeps its row unless it sits in a J≥0.8 cluster
    * and is not the cluster's canonical (minimum-id) representative.
    * The drop relation is size-gated, not force-broadcast: "only docs
    * with a near-dup" is data-dependent — a web-scale corpus runs
    * 30–50% near-duplicates, making the drop list O(corpus). Below the
    * gate the corpus side streams through a broadcast anti-join; above
    * it the plan degrades gracefully to a doc_id shuffle anti-join
    * (AQE can still promote from runtime sizes). */
  val p6_dedup_apply: Relational.Q = (s, dir) => {
    import s.implicits._
    val drop = Dedup.d7_dedup_clusters(s, dir)
      .filter($"doc_id" =!= $"cluster_rep")
      .select($"doc_id")
    Tables.documents(s, dir)
      .join(Tables.broadcastIfSmall(drop), Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  val p6_sql: String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id NOT IN (
       |  SELECT doc_id FROM (${graft.operators.Dedup.d7_sql
            .replace("ORDER BY doc_id", "")}) c
       |  WHERE doc_id <> cluster_rep)
       |ORDER BY doc_id""".stripMargin

  /** p7: 13-gram exact-match decontamination — the GPT-3/PaLM-style
    * benchmark-overlap rule (stricter than p3's shared-3-shingle
    * heuristic): a training doc is contaminated if ANY of its 13-grams
    * appears verbatim in the benchmark set (source src0). Grams are
    * reduced to 64-bit hashes scan-side, so the benchmark side is a
    * hash SET (8 bytes/gram — a benchmark suite is millions of grams,
    * ~tens of MB broadcast at any corpus scale) and training grams
    * never shuffle: the probe is a map-side broadcast join, the only
    * exchange is the per-doc count aggregation. n is a config
    * (spark.graft.text.contamNgram); the count is over distinct grams
    * per doc (shinglesOfTokens de-duplicates within a doc), so the
    * string-keyed oracle agrees exactly (64-bit collisions aside). */
  val p7_decontam_ngram: Relational.Q = (s, dir) => {
    import s.implicits._
    val n = s.conf.getOption("spark.graft.text.contamNgram")
      .map(_.toInt).getOrElse(13)
    val g = Tables.documentsSpread(s, dir)
      .select($"doc_id", $"source", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", $"source",
        explode(TextFunctions.shinglesOfTokens($"toks", n)).as("g"))
      .select($"doc_id", $"source", xxhash64($"g").as("h"))
    val bench = g.filter($"source" === "src0").select($"h").distinct()
    g.filter($"source" =!= "src0")
      .join(broadcast(bench), "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_contam_ngrams"))
      .orderBy($"doc_id")
  }

  val p7_sql: String = {
    val terms = (0 until 13).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    val ws = "\\s+"
    s"""WITH tok AS (SELECT doc_id, source,
       |       string_split_regex(trim(text), '$ws') AS t FROM documents),
       |g AS (SELECT doc_id, source, UNNEST(list_distinct(
       |   [$terms for i in generate_series(1, greatest(len(t)-12, 0))])) AS g
       |  FROM tok),
       |bench AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
       |SELECT doc_id, COUNT(*) AS n_contam_ngrams
       |FROM g JOIN bench USING (g) WHERE source <> 'src0'
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** p8: Bloom-filter decontamination — p7's membership test with the
    * benchmark side reduced to a FIXED-size bitset instead of a hash
    * set that grows 8 bytes per distinct gram: one mergeable
    * [[graft.functions.BloomAgg]] (map-side OR-combined; the shuffle
    * carries one m-bit buffer per task, never the gram stream), probed
    * scan-side by a codegen'd expression after a 1-row broadcast. At a
    * real benchmark-suite scale (hundreds of millions of grams) the
    * exact set is GBs; the Bloom stays at its configured bits
    * (default 2²⁰ ≈ 128 KB) and admits false positives at the classic
    * (1 − e^(−kn/m))^k rate — flagged-gram counts are an UPPER bound,
    * never an undercount (no false negatives by construction; asserted
    * against exact p7 in TextDedupSpec). Rows-only driver check
    * (engine-specific hashing). */
  val p8_bloom_decontam: Relational.Q = (s, dir) => {
    import s.implicits._
    val n = s.conf.getOption("spark.graft.text.contamNgram")
      .map(_.toInt).getOrElse(13)
    val mBits = s.conf.getOption("spark.graft.text.bloomBits")
      .map(_.toInt).getOrElse(1 << 20)
    val kHashes = 5
    val g = Tables.documentsSpread(s, dir)
      .select($"doc_id", $"source", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", $"source",
        explode(TextFunctions.shinglesOfTokens($"toks", n)).as("g"))
      .select($"doc_id", $"source", xxhash64($"g").as("h"))
    bloomDecontamOn(
      g.filter($"source" =!= "src0").select($"doc_id", $"h"),
      g.filter($"source" === "src0").select($"h"),
      "doc_id", mBits, kHashes)
      .orderBy($"doc_id")
  }

  /** Shared Bloom-decontamination core (the p8 shape), also the engine
    * of [[graft.api.GraftOps.bloomDecontamination]]: the benchmark
    * side reduces to ONE fixed-size mergeable bitset, probed scan-side
    * as a codegen'd plan literal.
    *
    * The bloom is built DISTRIBUTED (map-side OR-combined partials);
    * the single m-bit result is collected once (bounded: numBits/8
    * bytes, the same contract as the trained quantizer models) and
    * baked into the probe as a plan literal. A literal binary is
    * referenced ONCE by the generated code, where a broadcast-joined
    * bloom column is re-copied out of the unsafe row for every probed
    * gram (a 128 KB memcpy per row); the literal probe also needs no
    * join at all, so the filter stays inside the scan's codegen stage.
    * `trainGrams` carries (idCol, h); `benchGrams` carries (h). */
  private[graft] def bloomDecontamOn(trainGrams: org.apache.spark.sql.DataFrame,
      benchGrams: org.apache.spark.sql.DataFrame, idCol: String,
      numBits: Int, numHashes: Int): org.apache.spark.sql.DataFrame = {
    val bloomBytes = benchGrams
      .agg(graft.functions.Bloom.bloom(col("h"), numBits, numHashes).as("bloom"))
      .first().getAs[Array[Byte]]("bloom")
    trainGrams
      .filter(graft.functions.Bloom.might_contain(lit(bloomBytes), col("h"), numHashes))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_flagged_ngrams"))
  }

  /** p9: balanced shard EXPORT — the last step of a curation pipeline:
    * lay the corpus out as N deterministic shards (webdataset /
    * Megatron-style) for the training loader. shard = md5(doc_id) mod N
    * is a pure scan-side projection — no global sort, no window, so the
    * assignment parallelizes embarrassingly and balances in expectation
    * at any corpus size (a row_number()-based packer would serialize
    * through one window partition). The write repartitions ON the shard
    * key so each shard is written contiguously and `partitionBy` makes
    * per-shard reads partition-pruned downstream; at 100 TB the
    * repartition key becomes (shard, writer-subsplit) so each shard
    * gets many writer tasks — the layout contract is identical. The
    * returned manifest is recomputed FROM THE WRITTEN FILES, so the
    * oracle gate (which recomputes from the source table) also proves
    * the write round-trip lost and duplicated nothing. */
  val p9_shard_export: Relational.Q = (s, dir) => {
    import s.implicits._
    val n = 16
    val shard = (conv(substring(md5($"doc_id".cast("string")), 1, 6), 16, 10)
      .cast("long") % n).as("shard")
    val root = graft.TempRoots.create("graft_shards_").toString + "/docs"
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"source", $"text", shard,
        size(TextFunctions.tokens($"text")).cast("long").as("n_tokens"))
      .repartition(n, $"shard")
      .write.partitionBy("shard").parquet(root)
    s.read.parquet(root)
      .groupBy($"shard".cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
      .orderBy($"shard")
  }

  val p9_sql: String =
    """SELECT shard, COUNT(*) AS n_docs,
      | CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      | MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM (SELECT doc_id,
      |        CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 16 AS BIGINT) AS shard,
      |        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |      FROM documents) t
      |GROUP BY shard ORDER BY shard""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "p9_shard_export" -> p9_shard_export,
    "p8_bloom_decontam" -> p8_bloom_decontam,
    "p7_decontam_ngram" -> p7_decontam_ngram,
    "p6_dedup_apply" -> p6_dedup_apply,
    "p1_sequence_pack" -> p1_sequence_pack,
    "p2_curation_pipeline" -> p2_curation_pipeline,
    "p3_contamination" -> p3_contamination,
    "p4_mixture_sample" -> p4_mixture_sample,
    "p5_stratified_sample" -> p5_stratified_sample,
  )

  val oracles: Map[String, String] = Map(
    "p9_shard_export" -> p9_sql,
    "p7_decontam_ngram" -> p7_sql,
    "p6_dedup_apply" -> p6_sql,
    "p1_sequence_pack" -> p1_sql,
    "p2_curation_pipeline" -> p2_sql,
    "p3_contamination" -> p3_sql,
    "p4_mixture_sample" -> p4_sql,
    "p5_stratified_sample" -> p5_sql,
  )
}
