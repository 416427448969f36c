package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** §F text-analysis column helpers.
  *
  * Everything is built from codegen'd built-in expressions (split /
  * transform / filter / aggregate) — no Scala UDFs — so whole-stage
  * codegen spans the full text pipeline and the work runs scan-side with
  * zero extra shuffles at any scale.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word k-shingles (distinct) from a MATERIALIZED token-array column,
    * the unit for Jaccard/MinHash dedup. The token array must be a plain
    * column reference (project `tokens(text)` first): inlining the split
    * here would re-evaluate it for every element_at — measured 5× slower
    * on the shingle pass. Guarded for docs shorter than k tokens —
    * sequence(1, 0) would flip its step sign and emit bogus indices. */
  def shinglesOfTokens(t: Column, k: Int = 3): Column =
    when(size(t) >= k,
      array_distinct(
        transform(
          sequence(lit(1), size(t) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(t, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Convenience single-expression form (fine for one-shot projections;
    * hot paths should materialize tokens first — see shinglesOfTokens). */
  def shingles(text: Column, k: Int = 3): Column = shinglesOfTokens(tokens(text), k)

  /** BPE-ish token count: alpha runs, digit runs, and single other
    * non-space chars — the shape of byte-pair pre-tokenization. */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  private val Stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Fraction of tokens that are stopwords (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, x => x.isin(Stopwords: _*))).cast("double") /
      greatest(size(t), lit(1))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:'\"()-]", "")))
      .cast("double") / greatest(length(text), lit(1))

  /** Mean token length — degenerate values flag boilerplate/garbage. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      greatest(size(t), lit(1))
  }

  /** Composite quality score in [0,1]: rewards stopword presence (real
    * prose) and sane token lengths, penalizes punctuation soup. */
  def qualityScore(text: Column): Column = {
    val sw = stopwordRatio(text)
    val mtl = meanTokenLen(text)
    val punct = punctRatio(text)
    val swTerm = least(sw * 4.0, lit(1.0))
    val lenTerm = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctTerm = lit(1.0) - least(punct * 5.0, lit(1.0))
    (swTerm * 0.4 + lenTerm * 0.4 + punctTerm * 0.2)
  }

  /** Language markers: tiny disjoint stopword sets per language. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "una", "es"),
    "de" -> Seq("der", "und", "nicht", "ist"),
    "fr" -> Seq("le", "les", "une", "est"),
    "zh" -> Seq("的", "是", "不", "了"),
  )

  /** Marker-hit count for one language. Space-delimited languages
    * match markers as whole tokens; zh counts marker CHARACTERS as
    * substrings — CJK text has no whitespace word boundaries, so a
    * token-equality probe can never fire on real Chinese (tokens()
    * returns long unsegmented runs) and the zh entry would be dead.
    * The substring count is the length-difference identity
    * (len(t) − len(replace(t, m))) per single-char marker — exact,
    * scan-side, and expressible identically in the DuckDB oracle. */
  def langHits(text: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    if (lang == "zh")
      markers.map(m =>
        length(text) - length(replace(text, lit(m), lit("")))).reduce(_ + _)
    else
      size(filter(tokens(text), x => x.isin(markers: _*)))
  }

  /** Heuristic language ID: argmax of marker hits, 'und' when no hits;
    * deterministic preference order on ties (list order above). */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (l, _) => l -> langHits(text, l) }
    val top = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und")) { case ((l, h), elseCol) =>
      when(top > 0 && h === top, lit(l)).otherwise(elseCol)
    }
  }
}
