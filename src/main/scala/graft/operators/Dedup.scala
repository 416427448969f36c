package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** §D document deduplication — exact, n-gram Jaccard, MinHash+LSH,
  * SimHash.
  *
  * Scale design (100 TB corpus):
  *  - exact dedup: one groupBy on a 256-bit content hash — a single
  *    shuffle whose keys are uniformly distributed by construction.
  *  - jaccard: shuffle on shingle; the candidate space is bounded by
  *    per-shingle document lists, never an n² cross join. Hot shingles
  *    (boilerplate) are the skew risk — at scale, drop shingles with
  *    document-frequency above a cap (they carry no discriminating
  *    signal); the cap is a config, not applied at test SFs.
  *  - minhash: signatures are one pass (explode → 128 min-aggregates →
  *    one row per doc); banding shuffles (band_id, band_hash) so
  *    candidate generation is linear in bucket sizes. Candidates are
  *    then verified with exact Jaccard — the output contains no false
  *    positives, and band parameters (32 bands × 4 rows) put false-
  *    negative probability at ~1e-7 for J ≥ 0.8.
  *  - simhash: 64-bit signature per doc; near-dup candidates blocked on
  *    16-bit signature quarters (any hamming ≤ 3 pair must agree on at
  *    least one quarter), then exact hamming filter.
  */
object Dedup {

  /** Unique id per live SparkSession for cache keys — identity hash
    * codes are NOT unique, so a new session colliding with a GC'd one
    * could inherit cache entries bound to a stopped SparkContext. Weak
    * keys let dead sessions' ids (and hence their map entries' reach-
    * ability from new lookups) disappear with the session. */
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private[graft] def sessionId(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  /** Session-scoped relation cache: d2, d3, and the pipeline compositions
    * that embed them (p2) all need the same shingle / signature relations.
    * Without sharing, every query invocation re-persists its own copy —
    * the tokenize+shingle+minhash pass runs once per query instead of
    * once per session, and cached copies accumulate for the session's
    * lifetime. Keyed by (session id, data dir).
    *
    * Bounded by BYTES, not entries: the map is access-ordered and
    * eviction drops least-recently-used relations (unpersisting them)
    * until the MATERIALIZED footprint — read from each cached plan's
    * `CachedRDDBuilder.sizeInBytesStats` accumulator, i.e. real bytes,
    * not a plan estimate — fits `spark.graft.cache.maxBytes` (default
    * half the cluster's storage capacity). An entry cap (64) backstops
    * unmaterialized relations, which report 0 bytes until first use.
    * Entry-count-only bounding let the combined footprint grow
    * unbounded in bytes: on a storage-memory-sized heap whichever
    * query ran while storage was full paid eviction+recompute thrash
    * (observed as 10×+ run-to-run swings in the d-family on identical
    * code). A relation that was externally unpersisted (e.g.
    * catalog.clearCache) is re-persisted on next use. */
  private[graft] val relCache: java.util.Map[String, DataFrame] =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, /*accessOrder=*/ true)

  /** Actual materialized bytes (memory + disk are both charged against
    * the same storage region) behind a cached DataFrame; 0 until the
    * relation is first computed. */
  private def cachedBytes(df: DataFrame): Long =
    try df.queryExecution.withCachedData.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cacheBuilder.sizeInBytesStats.value.longValue
    }.sum
    catch { case scala.util.control.NonFatal(_) => 0L }

  private def cacheMaxBytes(s: SparkSession): Long =
    s.conf.getOption("spark.graft.cache.maxBytes").map(_.toLong).getOrElse {
      // half of the aggregate block-manager storage capacity: big
      // enough that one family's working set stays resident, small
      // enough that the cache can never starve execution memory or
      // other persists (stream-static sides, user caches)
      val cap = s.sparkContext.getExecutorMemoryStatus.values.map(_._1).sum
      math.max(cap / 2, 256L << 20)
    }

  /** Evict least-recently-used entries (never `keep`, the one just
    * touched) until both the byte budget and the entry cap hold.
    * Unpersist is non-blocking — freed blocks disappear asynchronously,
    * which is fine because accounting is per-entry, not via storage
    * polling. */
  private def evictOverBudget(s: SparkSession, keep: String): Unit =
    relCache.synchronized {
      val maxEntries = 64
      if (relCache.size <= 1) return
      import scala.jdk.CollectionConverters._
      // snapshot in access order (eldest first) via the ITERATOR — a
      // Set.map would re-hash into arbitrary order and evict random
      // entries instead of the LRU; sizes read off the snapshot, never
      // via get(), so iteration order stays untouched
      val snapshot = relCache.entrySet().iterator().asScala
        .map(e => (e.getKey, e.getValue, cachedBytes(e.getValue))).toList
      var total = snapshot.map(_._3).sum
      val budget = cacheMaxBytes(s)
      var n = snapshot.size
      snapshot.foreach { case (k, df, bytes) =>
        if ((total > budget || n > maxEntries) && k != keep) {
          relCache.remove(k)
          total -= bytes
          n -= 1
          // eviction must unpersist what it drops: clearing the map
          // entry alone strands the blocks in executor storage (the
          // cache held the only reference) — a slow leak for a
          // long-lived session
          df.unpersist(false)
        }
      }
    }

  private[graft] def cachedRel(s: SparkSession, dir: String, key: String)
                              (build: => DataFrame): DataFrame = {
    val k = s"${sessionId(s)}:$dir:$key"
    // Never build while holding the cache lock: builds are reentrant
    // (pairs08 → minhashSigs → shingles all go through this cache) and
    // may run long; get → build unlocked → put-if-absent is race-safe
    // (a concurrent duplicate build wastes one lazy plan, nothing
    // else). The lock itself is reentrant, so even a build that DID
    // re-enter the synchronized block could not deadlock.
    var df = relCache.synchronized(relCache.get(k))
    if (df == null) {
      val built = build
      df = relCache.synchronized {
        val prev = relCache.get(k)
        if (prev != null) prev else { relCache.put(k, built); built }
      }
    }
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    evictOverBudget(s, keep = k)
    // NOT eagerly materialized: d2's two broadcast subtrees do race to
    // compute an unmaterialized cache concurrently, but an A/B at
    // sf0.1 measured the eager count() variant SLOWER overall (the
    // extra materialization jobs cost more than the overlapped double
    // compute — the branches run in parallel on idle cores anyway).
    df
  }

  /** Exploded (doc_id, shingle) pairs, persisted once per session: both
    * dedup operators reference this relation from multiple join branches,
    * and Spark does not share common subplans across branches — without
    * persistence the tokenize+shingle pass recomputes once per branch.
    * Tokens are materialized in their own projection before shingling
    * (see TextFunctions.shinglesOfTokens). */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    cachedRel(s, dir, "shingles") {
      import s.implicits._
      Tables.documentsSpread(s, dir)
        .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
        .select($"doc_id", explode(TextFunctions.shinglesOfTokens($"toks")).as("s"))
    }

  /** Per-document sorted shingle arrays (with set size) — the verify-side
    * representation: candidate pairs fetch two arrays by doc_id (one
    * shuffle each) and intersect scan-side, instead of re-joining the
    * exploded shingle relation per pair. */
  private def shingleArrays(s: SparkSession, dir: String): DataFrame =
    cachedRel(s, dir, "shingleArrays") {
      shingleSets(s, dir).groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("s"))).as("arr"),
          count(lit(1)).as("n"))
    }

  private val ShingleSql =
    """(SELECT doc_id, UNNEST(list_distinct(
      |   [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |    for i in generate_series(1, greatest(len(t)-2, 0))])) AS s
      | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |       FROM documents) tok)""".stripMargin

  private def jaccardSql(threshold: Double): String =
    s"""WITH sh AS (SELECT * FROM $ShingleSql shs),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       | ROUND(CAST(i AS DOUBLE)/(x.n + y.n - i), 6) AS jaccard
       |FROM inter JOIN sizes x ON doc_a = x.doc_id
       |           JOIN sizes y ON doc_b = y.doc_id
       |WHERE CAST(i AS DOUBLE)/(x.n + y.n - i) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Exact-Jaccard verification over candidate pairs, shared by d2
    * (prefix-filtered candidates) and d3 (LSH candidates): each pair
    * fetches the two documents' sorted shingle arrays (two equi-joins on
    * doc_id) and intersects them scan-side (array_intersect hashes the
    * smaller side — O(|A|+|B|) per pair, codegen'd). Strictly fewer
    * shuffles than re-joining the exploded shingle relation per pair and
    * group-counting matches; shuffle volume is candidates × doc shingles
    * either way. */
  private def exactJaccardPairs(s: SparkSession, dir: String,
                                threshold: Double,
                                candidates: DataFrame): DataFrame = {
    val arrs = shingleArrays(s, dir)
    val i = graft.functions.SortedIntersectCount
      .sorted_intersect_count(col("arr_a"), col("arr_b"))
    val j = i.cast("double") / (col("na") + col("nb") - i)
    candidates
      .join(arrs.select(col("doc_id").as("doc_a"), col("arr").as("arr_a"),
        col("n").as("na")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("arr").as("arr_b"),
        col("n").as("nb")), "doc_b")
      .filter(j >= threshold)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d1: exact dedup via content hash — emits every content group with
    * its representative (min doc_id) and copy count; groups with
    * n_copies > 1 are the duplicates to drop. */
  val d1_dedup_exact: Relational.Q = (s, dir) => {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(sha2($"text", 256).as("content_hash"))
      .agg(min($"doc_id").as("rep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"content_hash")
  }

  val d1_sql: String =
    """SELECT sha256(text) AS content_hash, MIN(doc_id) AS rep_doc_id,
      | COUNT(*) AS n_copies
      |FROM documents GROUP BY sha256(text) ORDER BY content_hash""".stripMargin

  /** d6: canonicalized exact dedup — hash after lowercasing, stripping
    * non-alphanumerics and collapsing whitespace. Catches the
    * trivially-reformatted duplicates byte-exact dedup misses (case,
    * punctuation, spacing) while staying a single uniform-key shuffle;
    * the standard first normalization pass of an LLM dedup pipeline.
    * The regexes are engine-portable (no class escapes), so the DuckDB
    * oracle reproduces the canonical form exactly. */
  val d6_dedup_canonical: Relational.Q = (s, dir) => {
    import s.implicits._
    val canon = trim(regexp_replace(
      regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(s, dir)
      .groupBy(sha2(canon, 256).as("canon_hash"))
      .agg(min($"doc_id").as("rep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"canon_hash")
  }

  val d6_sql: String =
    """SELECT sha256(trim(regexp_replace(regexp_replace(lower(text),
      |         '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canon_hash,
      | MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY canon_hash""".stripMargin

  /** PPJoin-style prefix filtering (lossless): under a global shingle
    * order, two sets with J ≥ t must share a shingle within their first
    * |S| − ⌈t·|S|⌉ + 1 elements. Ordering rare-shingles-first keeps hot
    * (boilerplate) shingles out of prefixes, so the candidate join is a
    * small fraction of the full Σdf² shingle join — the standard exact
    * set-similarity algorithm at corpus scale. Candidates then pass the
    * full intersection verify, so the result is exactly the J ≥ t
    * pairs.
    *
    * POSITIONAL filter (r15, lossless): a shared shingle at sorted
    * positions (i, j) bounds the overlap — commons before it number at
    * most min(i−1, j−1) on either side, commons after at most
    * min(|A|−i, |B|−j) — so the pair's TIGHTEST bound over its prefix
    * matches must still reach the required overlap
    * α = t/(1+t)·(|A|+|B|) or the intersection verify (the dominant
    * cost: it fetches both full shingle arrays) provably cannot pass.
    * The dedup aggregate the candidates needed anyway carries the
    * bound for free. */
  private[graft] def positionalPruned(joined: DataFrame,
      t: Double): DataFrame = {
    import org.apache.spark.sql.functions.{min => fmin, max => fmax}
    val bound = least(col("a.rk") - 1, col("b.rk") - 1) + lit(1) +
      least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))
    joined
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(fmin(bound).as("__ub"),
        fmax(col("a.n")).as("__na"), fmax(col("b.n")).as("__nb"))
      // float guard: −1e-9 keeps an exactly-on-the-boundary pair
      // (never drops a true positive to ulp noise)
      .filter(col("__ub").cast("double") >=
        lit(t / (1 + t)) * (col("__na") + col("__nb")) - lit(1e-9))
      .select(col("doc_a"), col("doc_b"))
  }

  private[graft] def prefixCandidates(sh: DataFrame, t: Double,
      sessionKey: Option[(SparkSession, String)] = None): DataFrame = {
    val prefixes = prefixesOf(sh, t, sessionKey)
    positionalPruned(
      prefixes.as("a")
        .join(prefixes.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
            // PPJoin length filter (lossless): J >= t forces
            // t·max(|A|,|B|) <= min(|A|,|B|) — prune size-mismatched
            // pairs before the (much costlier) intersection verify
            least(col("a.n"), col("b.n")) >=
              ceil(lit(t) * greatest(col("a.n"), col("b.n")))),
      t)
  }

  /** PPJoin prefix construction shared by [[prefixCandidates]] (full
    * self-join) and [[incrementalCandidates]] (delta probe): per-doc
    * rare-first shingle prefixes of length |S| − ⌈t·|S|⌉ + 1 under the
    * global (df, shingle) order. Output: (doc_id, s, n), materialized
    * once — via the session [[relCache]] when `sessionKey` names the
    * catalog (session, dir) scope (d2 and d9 then SHARE the prefix
    * index across invocations in a session, the persisted-index shape
    * of production incremental dedup), else via an eager
    * localCheckpoint (the caller-supplied-`sh` API path, where an
    * identity-keyed cache entry could never be hit again nor freed). */
  private def prefixesOf(sh: DataFrame, t: Double,
      sessionKey: Option[(SparkSession, String)] = None): DataFrame =
    sessionKey match {
      case Some((s, dir)) => cachedRel(s, dir, s"prefixes:$t")(prefixesPlan(sh, t))
      case None => prefixesPlan(sh, t).localCheckpoint()
    }

  private def prefixesPlan(sh: DataFrame, t: Double): DataFrame = {
    // Document frequency per shingle via groupBy+join — NOT a window over
    // the full exploded relation (count() over (partition by s) sort-
    // shuffles every (doc, shingle) row and serializes hot-shingle
    // partitions; the aggregate is map-side-combined and tiny).
    val spark = sh.sparkSession
    val maxDf = spark.conf.getOption("spark.graft.dedup.maxShingleDf")
      .map(_.toLong).getOrElse(Long.MaxValue)
    // Hot-shingle cap (config, off by default): boilerplate shingles with
    // df above the cap carry no discriminating signal and dominate the
    // candidate join at corpus scale; dropping them is the standard
    // (slightly lossy) trade documented in the scale notes above.
    val dfRel = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val rareFirst = byDoc.orderBy(col("df"), col("s"))
    // The candidate join references prefixes twice and Spark
    // re-evaluates the window pipeline per branch otherwise — hence
    // prefixesOf materializes this plan exactly once (relCache persist
    // or localCheckpoint, per the caller path).
    sh.join(dfRel, "s")
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("rk", row_number().over(rareFirst))
      .filter(col("rk") <= col("n") - ceil(lit(t) * col("n")) + 1)
      // df = 1 shingles occupy prefix slots (they rank first) but can
      // never match another document — drop them after rank selection.
      .filter(col("df") >= 2)
      // rk = the shingle's position in the FULL sorted set (computed
      // before the prefix cut), feeding the positional filter
      .select(col("doc_id"), col("s"), col("n"), col("rk"))
  }

  /** Incremental near-dup candidates: pairs where the RIGHT side is a
    * newly-arrived delta doc and the left side is any doc (base or a
    * lower-id delta doc). The candidate join probes the full prefix
    * index with the DELTA prefixes only, so candidate volume scales
    * with |delta|, not |corpus|² — the daily-ingest shape: at 100 TB
    * the base prefix index is a persisted table maintained across
    * runs, and each batch pays only its own probe. `deltaIds` carries
    * one column `doc_id`. Output: (doc_a, doc_b) with doc_b ∈ delta. */
  private[graft] def incrementalCandidates(sh: DataFrame, deltaIds: DataFrame,
      t: Double, sessionKey: Option[(SparkSession, String)] = None): DataFrame = {
    val prefixes = prefixesOf(sh, t, sessionKey)
    // only the probe-TARGET side needs the delta flag (for pair
    // orientation); the probe side is a plain semi-join
    val flagged = prefixes.join(
        deltaIds.select(col("doc_id"), lit(true).as("__delta")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("s"), col("n"), col("rk"),
        coalesce(col("__delta"), lit(false)).as("is_delta"))
    val deltaPrefixes = prefixes
      .join(deltaIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
    positionalPruned(
      flagged.as("a")
        .join(deltaPrefixes.as("b"),
          col("a.s") === col("b.s") &&
            // orientation: base docs pair with any delta doc; two delta
            // docs orient by id (each unordered pair emitted once)
            (!col("a.is_delta") && col("a.doc_id") =!= col("b.doc_id") ||
              col("a.doc_id") < col("b.doc_id")) &&
            least(col("a.n"), col("b.n")) >=
              ceil(lit(t) * greatest(col("a.n"), col("b.n")))),
      t)
  }

  /** d2: exact n-gram (3-shingle) Jaccard near-dup pairs at J ≥ 0.5,
    * found via prefix-filtered candidates + full-intersection verify. */
  val d2_ngram_jaccard: Relational.Q = (s, dir) =>
    exactJaccardPairs(s, dir, 0.5,
      prefixCandidates(shingleSets(s, dir), 0.5, Some((s, dir))))

  val d2_sql: String = jaccardSql(0.5)

  /** d9: INCREMENTAL dedup — the daily-ingest composition: treat
    * sources src18/src19 as a newly-arrived batch and find every
    * delta doc that near-duplicates (J ≥ 0.5) a base-corpus doc or a
    * lower-id delta doc, WITHOUT re-deduping the base against itself.
    * Candidate generation probes the prefix index with delta prefixes
    * only (see [[incrementalCandidates]]) — at 100 TB the base index
    * persists across runs and each batch pays |delta|-proportional
    * work, the property that makes continuous-crawl dedup tractable.
    * Output: (doc_a, doc_b, jaccard) with doc_b ∈ delta. */
  val d9_dedup_incremental: Relational.Q = (s, dir) => {
    import s.implicits._
    val deltaIds = Tables.documents(s, dir)
      .filter($"source".isin("src18", "src19"))
      .select($"doc_id")
    val cand = incrementalCandidates(shingleSets(s, dir), deltaIds, 0.5,
      Some((s, dir)))
    exactJaccardPairs(s, dir, 0.5, cand)
      .orderBy($"doc_a", $"doc_b")
  }

  val d9_sql: String =
    s"""WITH sh AS (SELECT * FROM $ShingleSql shs),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |delta AS (SELECT doc_id FROM documents WHERE source IN ('src18','src19')),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s
       |  WHERE b.doc_id IN (SELECT doc_id FROM delta)
       |    AND (a.doc_id NOT IN (SELECT doc_id FROM delta) OR a.doc_id < b.doc_id)
       |    AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       | ROUND(CAST(i AS DOUBLE)/(x.n + y.n - i), 6) AS jaccard
       |FROM inter JOIN sizes x ON doc_a = x.doc_id
       |           JOIN sizes y ON doc_b = y.doc_id
       |WHERE CAST(i AS DOUBLE)/(x.n + y.n - i) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d10: EXACT SUBSTRING-span dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): per document, flag
    * the token positions covered by any W-token window that occurs
    * VERBATIM in another document. Whole-document near-dup (d2/d3)
    * misses long copied passages inside otherwise-distinct pages —
    * licenses, boilerplate, quotations — and span dedup is the
    * standard complement in LLM pipelines (the reference corpus-prep
    * notebooks dedup whole docs only; this is the beyond-the-reference
    * training-data operator).
    *
    * Scale shape: each window ships as its 64-bit xxhash (8 bytes, not
    * W tokens of text — a 20× shuffle-volume cut at W=20), the
    * duplicated-window set is one uniform hash-keyed aggregate, and
    * per-document coverage is a scan-side sorted-interval merge over
    * collected window starts (bounded by document length). No step
    * holds more than a document's windows in memory. Window width is
    * `spark.graft.dedup.windowTokens` (default 20; Lee et al. use 50
    * at web scale). The oracle recomputes the same spans over RAW gram
    * strings — equal unless two distinct grams collide in xxhash64
    * (p ≈ n²/2⁶⁴, negligible).
    *
    * Output: (doc_id, n_windows, n_dup_windows, dup_token_frac) where
    * dup_token_frac = fraction of the document's tokens covered by at
    * least one cross-document duplicated window. */
  val d10_substring_spans: Relational.Q = (s, dir) => {
    import s.implicits._
    val w = s.conf.getOption("spark.graft.dedup.windowTokens")
      .map(_.toInt).getOrElse(20)
    substringSpansOn(Tables.documentsSpread(s, dir), "doc_id", "text", w)
      .orderBy($"doc_id")
  }

  /** The d10 core over any (idCol, textCol) corpus — also the engine
    * of [[graft.api.GraftOps.substringSpans]]. */
  private[graft] def substringSpansOn(docs: DataFrame, idCol: String,
      textCol: String, w: Int): DataFrame = {
    require(w >= 2, s"window must be at least 2 tokens, got $w")
    val toksDf = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    // (doc, window-start, 64-bit window hash); CASE guards sequence's
    // start>stop auto-negative-step (sequence(1,0) = [1,0], not empty)
    val winsExpr = expr(
      s"""CASE WHEN size(toks) >= $w
         | THEN transform(sequence(1, size(toks) - ${w - 1}),
         |      i -> xxhash64(array_join(slice(toks, i, $w), ' ')))
         | ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)
    val wins = toksDf.select(col("doc_id"),
      posexplode(winsExpr).as(Seq("pos", "h")))
    val dup = wins.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    // union length of the flagged [pos, pos+w) intervals: sorted
    // starts s₁<…<s_k cover Σ min(w, s_{i+1}−s_i) + w tokens
    val ss = array_sort(col("starts"))
    val gaps = zip_with(
      slice(ss, lit(1), size(ss) - 1), slice(ss, lit(2), size(ss) - 1),
      (a, b) => least(lit(w), b - a))
    val covered = aggregate(gaps, lit(0), (acc, x) => acc + x) + lit(w)
    val flagged = wins.join(dup, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"),
        collect_list(col("pos")).as("starts"))
      .select(col("doc_id"), col("n_dup_windows"), covered.as("covered"))
    toksDf
      .select(col("doc_id"), size(col("toks")).as("n_toks"),
        greatest(size(col("toks")) - (w - 1), lit(0)).as("n_windows"))
      .join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        round(coalesce(col("covered"), lit(0)).cast("double") /
          greatest(col("n_toks"), lit(1)), 6).as("dup_token_frac"))
  }

  val d10_sql: String =
    """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |             FROM documents),
      |wins AS (
      |  SELECT doc_id, UNNEST([{'pos': i - 1,
      |                          'gram': array_to_string(t[i:i+19], ' ')}
      |                         for i in generate_series(1, greatest(len(t) - 19, 0))],
      |                        recursive := true)
      |  FROM tok),
      |dup AS (SELECT gram FROM wins GROUP BY gram
      |        HAVING COUNT(DISTINCT doc_id) >= 2),
      |agg AS (SELECT doc_id, COUNT(*) AS n_dup_windows,
      |               list_sort(list(pos)) AS ss
      |        FROM wins JOIN dup USING (gram) GROUP BY doc_id),
      |cov AS (SELECT doc_id, n_dup_windows,
      |               coalesce(list_sum([least(20, ss[i+1] - ss[i])
      |                 for i in generate_series(1, len(ss) - 1)]), 0) + 20 AS covered
      |        FROM agg)
      |SELECT t.doc_id, greatest(len(t.t) - 19, 0) AS n_windows,
      |       coalesce(c.n_dup_windows, 0) AS n_dup_windows,
      |       ROUND(CAST(coalesce(c.covered, 0) AS DOUBLE)
      |             / greatest(len(t.t), 1), 6) AS dup_token_frac
      |FROM tok t LEFT JOIN cov c USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** d3: MinHash + banded LSH candidates, verified with exact Jaccard
    * at J ≥ 0.8. The oracle recomputes exact J ≥ 0.8 pairs — equality
    * holds unless LSH misses a pair (p ≈ 1e-7 per pair at these band
    * parameters). The 128-permutation signature is one typed aggregate
    * ([[graft.functions.MinHashAgg]]) — 128 separate min() columns blow
    * past codegen method limits and fall off the fast path. */
  /** 128-permutation MinHash signatures, persisted once per session
    * (d3 and the p2 curation pipeline share them). */
  private def minhashSigs(s: SparkSession, dir: String): DataFrame =
    cachedRel(s, dir, "minhashSigs") { minhashSigsOf(shingleSets(s, dir)) }

  /** 128-permutation MinHash signatures of an exploded (doc_id, s)
    * shingle relation — shared by the catalog [[minhashSigs]] and
    * [[graft.api.GraftOps.minhashPairs]]. */
  private[graft] def minhashSigsOf(sh: DataFrame): DataFrame = sh
    .withColumn("h", pmod(xxhash64(col("s")), lit(graft.functions.MinHashAgg.P)))
    .groupBy(col("doc_id"))
    .agg(graft.functions.MinHashAgg.minhash(col("h"), 128, seed = 42).as("sig"))

  /** Banded-LSH candidate pairs over a (doc_id, sig) relation (32
    * bands × 4 rows), prefiltered by signature eq-fraction — the
    * candidate half of the d3 shape, shared with
    * [[graft.api.GraftOps.minhashPairs]] so the two paths cannot
    * drift.
    *
    * Signature-overlap prefilter: on low-diversity corpora 4-row bands
    * emit large numbers of weak collisions; the eq-fraction of the full
    * 128-signature estimates J unbiasedly, so a threshold−0.2 cut
    * discards weak pairs for pennies before the exact-verify join. The
    * signature table grows with the corpus (one 128-long row per
    * document — ~1 TB at 1B docs), so it is NOT broadcast: a shuffle
    * join on doc_id is the scale-safe shape; AQE may still choose
    * broadcast at small SFs from observed sizes. */
  private[graft] def minhashCandidates(sigs: DataFrame,
      threshold: Double): DataFrame = {
    val bandCols = (0 until 32).map { bnd =>
      xxhash64((0 until 4).map(r => element_at(col("sig"), bnd * 4 + r + 1)): _*)
    }
    val bands = capBuckets(
      sigs.select(col("doc_id"),
        posexplode(array(bandCols: _*)).as(Seq("band_id", "band_hash"))),
      Seq("band_id", "band_hash"))
    val rawCand = bands.as("l")
      .join(bands.as("r"),
        col("l.band_id") === col("r.band_id") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    rawCand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .filter(graft.functions.ArrayEqFraction
        .array_eq_fraction(col("sig_a"), col("sig_b")) >=
          math.max(0.0, threshold - 0.2))
      .select(col("doc_a"), col("doc_b"))
  }

  /** Cached J ≥ 0.8 pair list: d3's own result, also the input of the
    * cluster pass (d7) and the curation pipeline (p2) — pairs are tiny
    * relative to the corpus, so keeping them is the obvious reuse. */
  val d3_minhash_lsh: Relational.Q = (s, dir) => cachedRel(s, dir, "pairs08") {
    exactJaccardPairs(s, dir, 0.8,
      minhashCandidates(minhashSigs(s, dir), 0.8))
  }

  val d3_sql: String = jaccardSql(0.8)

  /** d4: 64-bit SimHash near-dup pairs (hamming ≤ 3), blocked on 16-bit
    * signature quarters. The signature is ONE typed aggregate
    * ([[graft.functions.SimHashAgg]]) — 64 separate sum() columns blow
    * past codegen method limits, the same cliff MinHash hit. No SQL
    * oracle (engine-specific 64-bit hashing); exactness is covered by
    * DedupSpec. */
  val d4_simhash: Relational.Q = (s, dir) => {
    import s.implicits._
    val signed = cachedRel(s, dir, "simhashSigs") {
      simHashSignatures(Tables.documentsSpread(s, dir), "doc_id", "text")
    }
    simHashBlockPairs(signed, maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Per-document 64-bit SimHash signatures over the distinct-token
    * set (Charikar 2002) — shared by d4 and
    * [[graft.api.GraftOps.simHashPairs]]. Output: (doc_id, sig). */
  private[graft] def simHashSignatures(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = docs
    .select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
    .withColumn("h", xxhash64(col("tok")))
    .groupBy(col("doc_id"))
    .agg(graft.functions.SimHashAgg.simhash(col("h")).as("sig"))

  /** The 16-bit quarter-block explode over (doc_id, sig) signatures —
    * THE blocking scheme (shared by d4, the public API, h10's stream
    * probe, and their specs; widening it for hamming > 3 happens here
    * once). Output: (doc_id, sig, blk_id, blk). */
  private[graft] def simHashBlocks(signed: DataFrame): DataFrame =
    signed.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("sig"), k * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("blk_id", "blk")))

  /** Hot-bucket guardrail for banded candidate self-joins (d3 bands,
    * d4/h10 SimHash quarters, m5 pHash quarters) — the companion of
    * d2's `maxShingleDf`. A pathological corpus (millions of
    * tiny/near-identical docs sharing one block value, e.g. quarter
    * b0 = 0) makes a single band bucket quadratic in the candidate
    * join; AQE skew-split rebalances the work but cannot bound the
    * pair EXPLOSION itself. With `spark.graft.dedup.maxBandBucket`
    * set, bucket values wider than the cap are dropped before the
    * self-join, bounding per-bucket candidates at cap² — the
    * documented recall trade: a pair is missed only if EVERY band it
    * agrees on is over-cap, i.e. the pair sits inside a ≥cap-wide
    * near-identical cluster, exactly the rows exact dedup (d1) already
    * collapses. Off by default (no extra aggregation in the plan);
    * when on, the width count is one map-side-combined agg on the
    * existing shuffle keys. */
  private[graft] def capBuckets(blocks: DataFrame, keys: Seq[String]): DataFrame =
    capBucketsAt(blocks, keys,
      blocks.sparkSession.conf.getOption("spark.graft.dedup.maxBandBucket")
        .map(_.toLong).getOrElse(Long.MaxValue))

  /** [[capBuckets]] with an explicit effective cap — the pHash path
    * passes a NON-OFF default (r16): its 16-bit quarter bands have a
    * FIXED key space (4 × 65536), so candidate volume grows
    * quadratically with corpus size (measured: 80× candidate pairs at
    * 10× docs, sf0.1→sf1) and an uncapped band join cannot survive
    * web scale. Buckets wider than the cap drop entirely — the
    * documented recall trade: a >cap-wide identical-quarter cluster
    * is boilerplate/near-identical mass that exact dedup (d1/d6)
    * collapses anyway. */
  private[graft] def capBucketsAt(blocks: DataFrame, keys: Seq[String],
      cap: Long): DataFrame = {
    if (cap == Long.MaxValue) blocks
    else {
      require(cap >= 2, s"band-bucket cap must be >= 2, got $cap")
      val hot = blocks.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__bucket_width"))
        .filter(col("__bucket_width") > cap)
        .select(keys.map(col): _*)
      // over-cap buckets are FEW by construction (each holds >cap
      // rows) — broadcast the anti-join so the block relation never
      // shuffles on the bucket keys just to subtract them
      blocks.join(org.apache.spark.sql.functions.broadcast(hot),
        keys, "left_anti")
    }
  }

  /** Candidate generation + exact hamming filter over (doc_id, sig)
    * signatures: block on 16-bit signature quarters (pigeonhole — any
    * hamming ≤ 3 pair agrees on at least one quarter), shuffle on
    * quarter blocks only, never an all-pairs join. Output:
    * (doc_a, doc_b, hamming). */
  private[graft] def simHashBlockPairs(signed: DataFrame,
      maxHamming: Int): DataFrame = {
    val blocks = capBuckets(simHashBlocks(signed), Seq("blk_id", "blk"))
    blocks.as("l")
      .join(blocks.as("r"),
        col("l.blk_id") === col("r.blk_id") && col("l.blk") === col("r.blk") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** d7: near-dup CLUSTERS — connected components over the J ≥ 0.8 pair
    * graph (d3), each doc labeled with its component's minimum doc_id as
    * the canonical representative. Pairs alone under-merge (A~B, B~C
    * but not A~C); dropping "all but one per component" is the standard
    * final dedup step.
    *
    * Algorithm: hash-min label propagation (the Pregel/large-star
    * shape): every vertex starts as its own label; each round takes the
    * min of its neighbors' labels; converged when the global label sum
    * stops falling (a monotone integer — one cheap agg per round, no
    * row-level diff join). Rounds = component diameter; near-dup
    * components are shallow (duplicates of a common source), so a
    * handful of shuffles on the edge list — each linear in |E| —
    * finishes the 100 TB case. The driver loop holds only two scalars
    * per round (Pregel-style iteration control, not data collection). */
  val d7_dedup_clusters: Relational.Q = (s, dir) => {
    import s.implicits._
    val pairs = d3_minhash_lsh(s, dir).select($"doc_a", $"doc_b")
    val comp = connectedComponents(s, pairs)
      .select(col("v").as("doc_id"), col("label").as("cluster_rep"))
    val sizes = comp.groupBy($"cluster_rep").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "cluster_rep")
      .select($"doc_id", $"cluster_rep", $"cluster_size")
      .orderBy($"doc_id")
  }

  /** Connected components over an undirected pair list (columns: two
    * vertex ids) via hash-min label propagation — shared by d7 (Jaccard
    * pair graph) and d8_semdedup (embedding near-dup graph). Returns
    * (v, label) for every vertex that appears in a pair; label is the
    * component's minimum vertex id. See d7's scaladoc for the
    * convergence/scale argument. */
  private[graft] def connectedComponents(
      s: SparkSession, pairs: DataFrame): DataFrame = {
    import s.implicits._
    val ab = pairs.toDF("pa", "pb")
    val edges = ab
      .union(ab.select($"pb", $"pa"))
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Iteration shuffles sized by the EDGE list (duplicate pairs are a
    // sliver of the corpus): with AQE off a 32-way shuffle per round on
    // a small graph is pure scheduling overhead; on a cluster AQE makes
    // the same call at runtime. ~2M edges per partition.
    // Loop-shuffle sizing is done by explicitly hash-partitioning the
    // loop relations on their join keys — NEVER by mutating
    // spark.sql.shuffle.partitions, which is session-global state that
    // concurrent queries on the same session would inherit mid-flight.
    // With edges pre-partitioned on dst and labels kept partitioned on v
    // at the same width, the per-round join is co-partitioned (no
    // exchange on either side); only the tiny post-aggregation relation
    // rides a default-width shuffle.
    val nEdges = edges.count()
    // a duplicate-free corpus is a normal outcome, not an error: no
    // edges → no labeled vertices (the sum-based convergence probe
    // below would NPE on a null sum over zero rows)
    if (nEdges == 0L) {
      edges.unpersist()
      return ab.select($"pa".as("v"), $"pa".as("label")).limit(0)
    }
    val loopParts = math.max(1L, math.min(
      s.conf.get("spark.sql.shuffle.partitions").toLong,
      nEdges / 2000000L + 1)).toInt
    val edgesByDst = edges.repartition(loopParts, $"dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Convergence probe: labels only DECREASE (least of self and
    // neighbor min), so the label sum strictly drops until fixpoint —
    // equality ⟺ converged. Summed as decimal(38,0), NOT long: a
    // handful of snowflake-scale (~1e18) vertex ids overflows a long
    // sum, which is an ArithmeticException under ANSI mode (on by
    // default in Spark 4) and a silent wrap otherwise.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum($"label".cast("decimal(38,0)"))).first().getDecimal(0)
    var labels: DataFrame = null
    // try/finally: a task failure or cancellation mid-loop must not
    // strand the persisted loop relations in executor storage (the
    // caller holds no reference to free them)
    try {
      // Every loop relation is an EAGER localCheckpoint, not a persist:
      // each round's plan references the previous round's labels
      // multiple times (the nbr-min join + the left join, and the jump
      // phase self-joins), so without lineage truncation the logical
      // tree DOUBLES per round — analysis alone goes exponential and
      // OOMs the driver after ~12 rounds. Checkpointing stores the
      // round's partitions (MEMORY_AND_DISK, spillable) and restarts
      // the plan from a LogicalRDD, keeping every round's analysis
      // O(1). This also makes the returned labels safe to hand out:
      // callers consume a flat scan, not a loop lineage.
      //
      // Superseded rounds are unpersisted EXPLICITLY (via the
      // LogicalRDD's backing rdd) as soon as the next round has
      // materialized from them — waiting for driver GC + the context
      // cleaner would pin up to jumpAfter+~63 full label-table copies
      // in storage on exactly the deep graphs the jump phase targets.
      // Only the FINAL labels stay resident for the caller.
      def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
        df.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }
      def release(df: DataFrame): Unit =
        backingRdd(df).foreach(_.unpersist(false))
      labels = edgesByDst.select($"src".as("v")).distinct()
        .select($"v", $"v".as("label"))
        .repartition(loopParts, $"v")
        .localCheckpoint(true)
      var prevSum = labelSum(labels)
      var converged = false
      var round = 0
      // Hash-min alone needs rounds ∝ component DIAMETER — fine for
      // near-dup cluster graphs (dense blobs, d ≈ 2–4), pathological
      // for chain-shaped components (a 10k-link chain = 10k rounds,
      // each a full pass). Past `jumpAfter` rounds the loop adds a
      // POINTER-JUMPING step per round (label ← label(label), the
      // shortcutting half of two-phase CC algorithms): remaining chain
      // depth at least halves per round, so total rounds are bounded by
      // jumpAfter + O(log diameter) ≤ ~jumpAfter+63 on ANY graph.
      // Jumping never changes the fixpoint (labels still only decrease,
      // floored by the component min; at the hash-min fixpoint the jump
      // is the identity), so the sum probe stays a valid convergence
      // test. Not enabled from round 0 because the extra self-join
      // (with its two exchanges) costs more than it saves on the
      // shallow graphs that dominate in practice.
      val jumpAfter = s.conf.getOption("spark.graft.cc.jumpAfter")
        .map(_.toInt).getOrElse(10)
      while (!converged) {
        val nbrMin = edgesByDst.join(labels, edgesByDst("dst") === labels("v"))
          .groupBy($"src").agg(min($"label").as("nbr_min"))
        val afterMin = labels.as("l")
          .join(nbrMin.as("p"), col("l.v") === col("p.src"), "left")
          .select(col("l.v").as("v"),
            least(col("l.label"), coalesce(col("p.nbr_min"), col("l.label"))).as("label"))
          .repartition(loopParts, $"v")
          .localCheckpoint(true)
        val next =
          if (round < jumpAfter) afterMin
          else {
            val jumped = afterMin.as("l")
              .join(afterMin.select($"v".as("jv"), $"label".as("jl")).as("j"),
                col("l.label") === col("jv"), "left")
              .select(col("l.v").as("v"),
                least(col("l.label"), coalesce(col("jl"), col("l.label"))).as("label"))
              .repartition(loopParts, $"v")
              .localCheckpoint(true)
            release(afterMin) // jumped is materialized; afterMin is dead
            jumped
          }
        val nextSum = labelSum(next)
        release(labels) // next is materialized; the old round is dead
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        round += 1
      }
      labels
    } finally {
      edgesByDst.unpersist()
      edges.unpersist()
    }
  }

  val d7_sql: String =
    s"""WITH RECURSIVE
       |p AS (SELECT doc_a, doc_b FROM (${jaccardSql(0.8).replace("ORDER BY doc_a, doc_b", "")}) jp),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM p
       |          UNION SELECT doc_b, doc_a FROM p),
       |reach(v, r) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT reach.v, e.b FROM reach JOIN edges e ON e.a = reach.r),
       |comp AS (SELECT v AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY v)
       |SELECT doc_id, cluster_rep, cluster_size
       |FROM comp JOIN (SELECT cluster_rep, COUNT(*) AS cluster_size
       |                FROM comp GROUP BY cluster_rep) sz USING (cluster_rep)
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Relational.Q] = Map(
    "d1_dedup_exact" -> d1_dedup_exact,
    "d2_ngram_jaccard" -> d2_ngram_jaccard,
    "d3_minhash_lsh" -> d3_minhash_lsh,
    "d4_simhash" -> d4_simhash,
    "d6_dedup_canonical" -> d6_dedup_canonical,
    "d7_dedup_clusters" -> d7_dedup_clusters,
    "d9_dedup_incremental" -> d9_dedup_incremental,
    "d10_substring_spans" -> d10_substring_spans,
  )

  val oracles: Map[String, String] = Map(
    "d1_dedup_exact" -> d1_sql,
    "d2_ngram_jaccard" -> d2_sql,
    "d3_minhash_lsh" -> d3_sql,
    "d6_dedup_canonical" -> d6_sql,
    "d7_dedup_clusters" -> d7_sql,
    "d9_dedup_incremental" -> d9_sql,
    "d10_substring_spans" -> d10_sql,
  )
}
