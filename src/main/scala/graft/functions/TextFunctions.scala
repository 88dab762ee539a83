package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All are built from
  * `org.apache.spark.sql.functions` (codegen'd, whole-stage-compatible) — no
  * Scala UDFs in the hot path, so a 100 TB scan stays inside
  * WholeStageCodegen with filters pushed to the parquet reader.
  */
object TextFunctions {

  /** Whitespace-token count (the "token counting" baseline). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish subword count: words + digits + punctuation counted separately,
    * approximating a byte-pair tokenizer's granularity without a vocab.
    * For real merge-table tokenization use [[bpeTokenCount]].
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** TRUE subword (BPE) token count under a merge table — the unit training
    * pipelines budget, pack, and mix in (whitespace counts drift 1.3–1.5×
    * vs BPE on English, far worse on CJK). Backed by the one-pass
    * [[BpeTokenCount]] kernel; the table defaults to the committed
    * [[BpeVocab.Fixture]].
    */
  def bpeTokenCount(text: Column,
      merges: Seq[(String, String)] = BpeVocab.Fixture): Column =
    BpeVocab.bpeTokenCount(text, merges)

  /** Full BPE token stream of a document (see [[BpeTokens]]). */
  def bpeTokens(text: Column,
      merges: Seq[(String, String)] = BpeVocab.Fixture): Column =
    BpeVocab.bpeTokens(text, merges)

  /** Distinct-token ratio — low values indicate repetitive/boilerplate text. */
  def distinctTokenRatio(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) > 0, size(array_distinct(toks)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Punctuation-character ratio over total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0,
      regexp_count(text, lit("\\S")).cast("double") / n).otherwise(lit(0.0))
  }

  /** English stopword hit-rate among tokens — a quality / language signal. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are")

  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hits = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Composite heuristic quality score in [0,1]: rewards reasonable length,
    * lexical diversity, and modest punctuation (Gopher/C4-style filters,
    * arXiv:2112.11446 §A; all thresholds are heuristic).
    *
    * Callers on a hot path should pre-materialize the token array and use
    * [[qualityScoreFromToks]] — Catalyst re-evaluates the split per
    * reference otherwise.
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromToks(text, split(trim(text), "\\s+"))

  /** Same formula with the token array supplied as a (materialized) column. */
  def qualityScoreFromToks(text: Column, toks: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val divScore = when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks)).otherwise(lit(0.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    round((lenScore * 0.4 + divScore * 0.4 + punctPenalty * 0.2), 6)
  }

  /** Stopword-profile language ID over a fixed marker table. Scores each
    * language by marker-token hit count; returns the argmax or "und" when no
    * marker hits. A character-n-gram model would need a trained table; the
    * marker approach is the classic stopword-profile heuristic (Cavnar &
    * Trenkle 1994 reduced to its word-level special case) and is fully
    * codegen'd (no UDF).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "dans", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreFromToks(split(lower(trim(text)), "\\s+"), markers)

  def langScoreFromToks(lowerToks: Column, markers: Seq[String]): Column =
    size(filter(lowerToks, t => t.isin(markers.map(lit): _*)))

  /** Predicted language code (argmax of marker scores; ties broken by
    * language code ascending for determinism; all-zero -> "und").
    * Backed by the one-pass [[LangIdExpr]] kernel; [[langIdFromToks]] is the
    * composable reference formulation it is spec-proven equal to.
    */
  def langId(text: Column): Column = LangIdExpr.langId(text)

  def langIdFromToks(lowerToks: Column): Column = {
    val langs = LangMarkers.toSeq.sortBy(_._1)
    // struct max = lexicographic (score, antiRank): highest score wins, ties
    // go to the alphabetically-first language (highest antiRank).
    val scored = langs.zipWithIndex.map { case ((lang, m), i) =>
      struct(
        langScoreFromToks(lowerToks, m).as("score"),
        lit(langs.size - i).as("antiRank"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Normalized-content fingerprint: lowercase, strip non-alphanumerics,
    * md5 — the exact-dup key that survives formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(to_binary(regexp_replace(lower(text), "[^a-z0-9]", ""), lit("utf-8")))

  /** Word n-gram shingles (n>=1): for n=1 the distinct token set. Backed by
    * the one-pass [[WordShingles]] kernel (the composable
    * transform/element_at formulation re-splits the text per window
    * position — Catalyst has no let-binding).
    */
  def shingles(text: Column, n: Int): Column = WordShingles.shingles(text, n)

  /** Every n-gram OCCURRENCE (multiset, document order) — the frequency
    * view [[shingles]]'s distinct-set semantics can't provide; what PMI /
    * collocation statistics count.
    */
  def shinglesAll(text: Column, n: Int): Column =
    WordShingles.shinglesAll(text, n)
}
