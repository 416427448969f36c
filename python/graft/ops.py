"""Pythonic wrappers over the Scala public API `graft.api.GraftOps`.

Each function takes/returns pyspark DataFrames and delegates through the
JVM gateway; Scala default arguments do not synthesize across py4j, so
every wrapper passes its full argument list explicitly (defaults here
mirror the Scala ones). Results are row-identical to the Scala surface —
the ApiSpec suite pins each entry point against its catalog query twin.
"""
from pyspark.sql import DataFrame


def _ops(df):
    return df.sparkSession._jvm.graft.api.GraftOps


def _wrap(jdf, like_df):
    return DataFrame(jdf, like_df.sparkSession)


def _to_seq(df, values):
    return df.sparkSession._jvm.PythonUtils.toSeq(list(values))


# ---------------------------------------------------------------- dedup

def exact_dedupe(docs, id_col, text_col):
    """Keep one representative per byte-identical text (content-hash groupBy)."""
    return _wrap(_ops(docs).exactDedupe(docs._jdf, id_col, text_col), docs)


def canonical_dedupe(docs, id_col, text_col):
    """Exact dedup after canonicalization (lowercase, strip punctuation,
    collapse whitespace)."""
    return _wrap(_ops(docs).canonicalDedupe(docs._jdf, id_col, text_col), docs)


def jaccard_pairs(docs, id_col, text_col, threshold=0.5):
    """Exact n-gram-shingle Jaccard near-duplicate pairs via prefix-filtered
    PPJoin (no all-pairs comparison)."""
    return _wrap(_ops(docs).jaccardPairs(
        docs._jdf, id_col, text_col, float(threshold)), docs)


def minhash_pairs(docs, id_col, text_col, threshold=0.8):
    """Banded MinHash-LSH candidates confirmed at exact Jaccard >= threshold."""
    return _wrap(_ops(docs).minhashPairs(
        docs._jdf, id_col, text_col, float(threshold)), docs)


def simhash_pairs(docs, id_col, text_col, max_hamming=3):
    """64-bit SimHash near-duplicate pairs at hamming distance <= max_hamming
    (quarter-block candidate generation)."""
    return _wrap(_ops(docs).simHashPairs(
        docs._jdf, id_col, text_col, int(max_hamming)), docs)


def incremental_dedupe(base, delta, id_col, text_col, threshold=0.5,
                       check_disjoint=True):
    """Dedup a newly-arrived batch against the base corpus + itself without
    re-deduping the base (|delta|-proportional candidate work)."""
    return _wrap(_ops(base).incrementalDedupe(
        base._jdf, delta._jdf, id_col, text_col, float(threshold),
        bool(check_disjoint)), base)


def build_dedup_index(docs, id_col, text_col, threshold, index_root):
    """Persist a DURABLE near-dup index (shingles + frozen-df order +
    prefixes as versioned GraftTables) so later sessions dedup deltas in
    |delta|-proportional work via incremental_dedupe_indexed."""
    _ops(docs).buildDedupIndex(
        docs._jdf, id_col, text_col, float(threshold), index_root)


def extend_dedup_index(spark, index_root, delta, id_col, text_col):
    """Fold a deduped delta INTO the durable index (shingles + prefixes
    under the index's frozen order) so tomorrow's batch probes base+today."""
    _ops(delta).extendDedupIndex(
        spark._jsparkSession, index_root, delta._jdf, id_col, text_col)


def incremental_dedupe_indexed(spark, index_root, delta, id_col, text_col,
                               check_disjoint=True):
    """Dedup a newly-arrived batch against a build_dedup_index root from
    ANY session (threshold comes from the index manifest)."""
    return _wrap(_ops(delta).incrementalDedupe(
        spark._jsparkSession, index_root, delta._jdf, id_col, text_col,
        bool(check_disjoint)), delta)


def substring_spans(docs, id_col, text_col, window_tokens=20):
    """Exact substring-span dedup (Lee et al. 2022): per-doc token spans
    covered by any window_tokens-token window occurring verbatim elsewhere."""
    return _wrap(_ops(docs).substringSpans(
        docs._jdf, id_col, text_col, int(window_tokens)), docs)


def near_dup_clusters(pairs, a_col, b_col):
    """Connected components over a near-dup pair graph (hash-min label
    propagation): doc_id -> (cluster representative, cluster size)."""
    return _wrap(_ops(pairs).nearDupClusters(pairs._jdf, a_col, b_col), pairs)


def apply_dedup(docs, id_col, clusters):
    """Drop all but each cluster's canonical representative (the final
    corpus-dedup step; broadcast below the size gate, shuffle above)."""
    return _wrap(_ops(docs).applyDedup(docs._jdf, id_col, clusters._jdf), docs)


def sem_dedup(emb, id_col, vec_col, threshold=0.45, cells=16):
    """SemDeDup (Abbas et al. 2023): connected components of the embedding
    cosine >= threshold graph, min-id representative per cluster."""
    return _wrap(_ops(emb).semDedup(
        emb._jdf, id_col, vec_col, float(threshold), int(cells)), emb)


# ------------------------------------------------------- similarity

def knn_join(emb, id_col, vec_col, top_k=5, cells=16):
    """Approximate k-NN self-join: top_k cosine neighbors for every vector
    (IVF-cell equi-join + per-vector top-k heap)."""
    return _wrap(_ops(emb).knnJoin(
        emb._jdf, id_col, vec_col, int(top_k), int(cells)), emb)


# ---------------------------------------------------- decontamination

def ngram_contamination(train, bench, id_col, text_col, n=13):
    """Benchmark-contamination detection: training docs sharing any exact
    n-gram with the benchmark (broadcast 64-bit gram hash set)."""
    return _wrap(_ops(train).ngramContamination(
        train._jdf, bench._jdf, id_col, text_col, int(n)), train)


def bloom_decontamination(train, bench, id_col, text_col, n=13,
                          num_bits=1 << 20, num_hashes=5):
    """Fixed-memory Bloom variant of ngram_contamination (~num_bits/8 bytes
    at ANY benchmark size; no false negatives)."""
    return _wrap(_ops(train).bloomDecontamination(
        train._jdf, bench._jdf, id_col, text_col, int(n), int(num_bits),
        int(num_hashes)), train)


# ------------------------------------------------------ text analysis

def curation_signals(docs, id_col, text_col):
    """One-scan curation feature vector per doc: token counts, quality
    ratios, language guess, Gopher repetition fractions."""
    return _wrap(_ops(docs).curationSignals(docs._jdf, id_col, text_col), docs)


def pii_scrub(docs, text_col):
    """Redact email/phone patterns; adds match counts and the scrubbed text."""
    return _wrap(_ops(docs).piiScrub(docs._jdf, text_col), docs)


def unicode_clean(docs, text_col):
    """Unicode text cleaning: NFC-normalize (decomposed accents fold
    into composed form so dedup/fingerprints don't fragment), strip
    control characters, collapse whitespace runs, trim. Replaces
    text_col in place; scan-side, no shuffle."""
    return _wrap(_ops(docs).unicodeClean(docs._jdf, text_col), docs)


def gopher_signals(docs, id_col, text_col, stopwords=None):
    """Gopher quality-filter signals (Rae et al. 2021) per document:
    word-count/mean-word-length bands, symbol ratio, bullet/ellipsis
    line fractions, alphabetic-word fraction, stop-word hits, and the
    conjunction `kept` verdict. Scan-side, no shuffle; the stop list is
    language/corpus-tunable (default: Gopher's English eight)."""
    return _wrap(_ops(docs).gopherSignals(
        docs._jdf, id_col, text_col, _to_seq(docs, stopwords or [])), docs)


def shard_assign(df, id_col, num_shards=16):
    """Deterministic balanced shard assignment for training export:
    adds `shard` = md5(id) mod num_shards — reproducible across engines
    and corpus growth, no global sort; write via
    .repartition('shard').write.partitionBy('shard')."""
    return _wrap(_ops(df).shardAssign(df._jdf, id_col, int(num_shards)), df)


def distinct_overlap(df, key_col, value_col, nominal=4096):
    """Pairwise distinct-value overlap between groups via theta
    sketches (the set intersection HLL cannot do): exact below
    `nominal` distincts per key, ~1/sqrt(nominal) relative error
    above."""
    return _wrap(_ops(df).distinctOverlap(
        df._jdf, key_col, value_col, int(nominal)), df)


def bm25_search(docs, id_col, text_col, terms, top_n=20, k1=1.2, b=0.75):
    """BM25 keyword search: top_n docs for the term list (scan-side term
    frequencies, no inverted index)."""
    if not terms:
        raise ValueError("bm25_search needs at least one term")
    return _wrap(_ops(docs).bm25Search(
        docs._jdf, id_col, text_col, _to_seq(docs, terms), int(top_n),
        float(k1), float(b)), docs)


def heavy_hitters(df, value_col, k=20, eps=0.001):
    """Top-k most frequent values with count-min-sketch bounds
    (Misra-Gries-bounded candidate generation — no full-vocabulary state)."""
    o = _ops(df)
    # $default$N is 1-based: candidatesPerPart is the 5th parameter
    cpp = getattr(o, "heavyHitters$default$5")()
    return _wrap(o.heavyHitters(df._jdf, value_col, int(k), float(eps), cpp), df)


def lm_score(docs, id_col, text_col):
    """Bigram language-model quality score per doc (CCNet-style
    perplexity filter trained on the corpus itself): mean bigram log
    probability under an add-one-smoothed bigram LM."""
    return _wrap(_ops(docs).lmScore(docs._jdf, id_col, text_col), docs)


def compression_signals(docs, id_col, text_col):
    """Compression-ratio quality signal per doc: deflate the text and
    band deflate_bytes/raw_bytes to [0.25, 0.95] — below is
    boilerplate/template spam, above is high-entropy junk."""
    return _wrap(_ops(docs).compressionSignals(docs._jdf, id_col, text_col), docs)


def phash_pairs(docs, id_col, payload_col, max_hamming=3):
    """Perceptual-hash near-dup pairs over media payloads (aHash-style
    64-bit signature, quarter-block banding, exact hamming confirm)."""
    return _wrap(_ops(docs).phashPairs(
        docs._jdf, id_col, payload_col, int(max_hamming)), docs)


def bpe_merges(docs, text_col, merges=10):
    """Train a BPE merge table over the corpus (incremental pair-count
    maintenance; corpus scanned once)."""
    return _wrap(_ops(docs).bpeMerges(docs._jdf, text_col, int(merges)), docs)


def bpe_encode(docs, id_col, text_col, merges):
    """Encode every document with a learned merge table (broadcast model,
    zero shuffles)."""
    return _wrap(_ops(docs).bpeEncode(
        docs._jdf, id_col, text_col, merges._jdf), docs)


# -------------------------------------------------------- time series

def gap_fill(events, key_col, ts_col, val_col, step_hours=1,
             decimal_sum=True):
    """Dense per-key time grid with zero-filled counts and forward-filled
    values (step-granular bucketing; coarse grids roll up)."""
    return _wrap(_ops(events).gapFill(
        events._jdf, key_col, ts_col, val_col, int(step_hours),
        bool(decimal_sum)), events)
