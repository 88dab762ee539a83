package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Round-6 training-corpus pipeline operators: PII redaction, duplicated-line
  * quality metrics, corpus-trained bigram-LM scoring, sliding-window context
  * chunking, incremental (delta-vs-index) dedup, and per-stratum token-budget
  * selection. All are built from `org.apache.spark.sql.functions` (codegen'd,
  * no UDFs), and every shape is chosen for the 100 TB case: map-only where
  * possible, partial-aggregated shuffles where not, and never an
  * unpartitioned window or driver-side loop over corpus-sized data.
  *
  * (The reference pipeline stops at per-doc stats — tool_call_agent.py:131-141
  * — these are the corpus-prep stages a production pretraining pipeline adds
  * on top; cf. C4/Gopher/RefinedWeb, arXiv:2112.11446 §A, arXiv:2306.01116.)
  */
object TextPipeline {

  // ---------------------------------------------------------------------
  // PII redaction (C4-style scrubbing)
  // ---------------------------------------------------------------------

  /** Email / US-phone / IPv4 patterns, written in the common subset of Java
    * regex and RE2 so the DuckDB oracle replays them verbatim.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact PII in `text`: emails, then IPv4 addresses, then phone numbers
    * (email first — its character class overlaps the dotted/digit patterns;
    * the later patterns cannot match inside the placeholders). Map-only and
    * fully codegen'd: three `regexp_replace` over one projection, so a
    * 100 TB scan stays a single WholeStageCodegen stage with column pruning
    * at the reader.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Pattern, "<IP>")
    regexp_replace(i, PhonePattern, "<PHONE>")
  }

  /** Per-row PII hit counts on the ORIGINAL text (the audit trail a
    * compliance pipeline keeps next to the redaction).
    *
    * Overlap semantics: counts are per-pattern matches against the raw
    * text, NOT redactions performed — an IPv4 embedded in an email domain
    * (`a@10.1.2.3.com`) increments `n_ips` although [[redactPii]] consumes
    * it as part of `<EMAIL>`. Audit counts can therefore exceed the number
    * of placeholder substitutions; pipelines needing count == redactions
    * should count each pattern on the progressively-redacted text instead.
    */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailPattern)),
      regexp_count(text, lit(PhonePattern)),
      regexp_count(text, lit(Ipv4Pattern)))

  // ---------------------------------------------------------------------
  // URL / domain filtering (C4-style source blocklist)
  // ---------------------------------------------------------------------

  /** First URL host in `text`, or null when the document carries no URL.
    * Pattern again in the Java-regex/RE2 common subset.
    */
  val UrlHostPattern = "https?://([A-Za-z0-9.-]+)"

  def extractDomain(text: Column): Column =
    nullif(regexp_extract(text, UrlHostPattern, 1), lit(""))

  /** URL part extraction pattern shared with the DuckDB oracle: scheme,
    * authority, path, query (fragment falls out — no group reaches '#').
    * RE2-safe (no backrefs/lookaround), so Java regex and DuckDB agree.
    */
  val UrlPartsPattern: String =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\\?([^#]*))?"

  /** Query parameters stripped by [[canonicalizeUrl]] — tracking noise
    * that fragments crawl dedup (same page, millions of distinct URLs).
    */
  val TrackingParamPattern: String = "^(utm_[a-z]+|fbclid|gclid)="

  /** Canonicalize a URL for crawl-level dedup (the WET/CC-style URL
    * normalizer): lowercase scheme+host, drop the fragment, drop the
    * scheme's default port (:80 http / :443 https), drop tracking
    * parameters, SORT the surviving query parameters (param order is
    * transport noise), empty path → "/". Path case is preserved (paths
    * are case-sensitive). Non-URL strings pass through unchanged.
    *
    * Map-only — pure string/array expressions, whole-stage-codegen'd, no
    * UDF; every step (regexp_extract / filter / array_sort / array_join)
    * has an identically-behaved DuckDB twin, so canonical equality is
    * oracle-checkable cross-engine.
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, UrlPartsPattern, 1))
    val auth = lower(regexp_extract(u, UrlPartsPattern, 2))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val path0 = regexp_extract(u, UrlPartsPattern, 3)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q0 = regexp_extract(u, UrlPartsPattern, 4)
    val params = filter(split(q0, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val qs = array_join(array_sort(params), "&")
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, path,
        when(qs === "", lit("")).otherwise(concat(lit("?"), qs))))
  }

  /** C4's source filter: drop documents whose URL domain is blocklisted;
    * documents without a URL pass through. Map-only for a literal
    * blocklist (the common case — blocklists are KBs); for a blocklist
    * TABLE, anti-join `docs` against it on the domain column instead (AQE
    * broadcasts the small side).
    */
  def domainFilter(docs: DataFrame, textCol: String,
                   blocklist: Seq[String]): DataFrame = {
    val d = extractDomain(col(textCol))
    docs.withColumn("domain", d)
      .where(col("domain").isNull || !col("domain").isin(blocklist.map(lit): _*))
  }

  // ---------------------------------------------------------------------
  // Benchmark n-gram decontamination (the dc1 semantics as a reusable op)
  // ---------------------------------------------------------------------

  /** Ids of corpus docs sharing at least `minShared` distinct word
    * `n`-grams with ANY benchmark doc — the GPT-3-style eval-leakage
    * filter (dc1's semantics factored out for pipeline composition). The
    * bench side collapses to its DISTINCT gram set and broadcasts (eval
    * suites are small against a 100 TB corpus); the corpus gram stream is
    * map-only explode + broadcast-join, and only matching grams reach the
    * per-doc count. For bench gram sets too big to broadcast exactly, the
    * dc2 Bloom-prefilter shape applies — this operator is the exact path.
    */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 5,
      minShared: Long = 1L): DataFrame = {
    val bg = bench
      .select(explode(TextFunctions.shingles(col(benchTextCol), n)).as("__ngram"))
      .distinct()
    docs.select(col(idCol),
        explode(TextFunctions.shingles(col(textCol), n)).as("__ngram"))
      .join(broadcast(bg), Seq("__ngram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__ngram")).as("__shared"))
      .where(col("__shared") >= minShared)
      .select(col(idCol))
  }

  // ---------------------------------------------------------------------
  // Duplicated-line fraction (RefinedWeb / Gopher repetition filter)
  // ---------------------------------------------------------------------

  /** Split `text` into fixed `width`-token "lines" (deterministic chunking —
    * the synthetic corpus has no newlines; real corpora would split on
    * `\n`). Returns the array-of-lines column.
    */
  def tokenLines(text: Column, width: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val nLines = ((size(toks) + lit(width - 1)) / lit(width)).cast("int")
    transform(sequence(lit(0), nLines - lit(1)),
      i => concat_ws(" ", slice(toks, i * width + 1, lit(width))))
  }

  /** Per-document duplicated-line statistics: the fraction of a doc's lines
    * that also occur in at least one OTHER document (RefinedWeb's
    * "duplicated lines" metric, arXiv:2306.01116 §4.2, applied corpus-wide
    * rather than per-page).
    *
    * Shape at scale: map-only explode → one partial-aggregated groupBy(line)
    * for cross-doc frequencies → join back on `line` (co-partitioned with
    * the groupBy, so Catalyst reuses the exchange) → one groupBy(doc). The
    * corpus is shuffled on the line hash, never self-joined; a boilerplate
    * line shared by millions of docs is ONE aggregate row fanned back by
    * the join, not a quadratic pair set.
    */
  def dupLineStats(docs: DataFrame, idCol: String, textCol: String,
                   lineWidth: Int = 10, gate: Double = 0.3): DataFrame = {
    val id = col(idCol)
    val lines = docs.select(id,
        explode(tokenLines(col(textCol), lineWidth)).as("__line"))
    val freq = lines.groupBy(col("__line"))
      .agg(count_distinct(id).as("__ndocs"))
    lines.join(freq, "__line")
      .groupBy(id)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__ndocs") >= 2, 1L).otherwise(0L)).as("n_dup_lines"))
      .select(id, col("n_lines"),
        round(col("n_dup_lines").cast("double") /
          col("n_lines").cast("double"), 6).as("dup_line_frac"))
      .withColumn("line_dup_flag", col("dup_line_frac") > gate)
  }

  /** Corpus-wide duplicate-line REWRITE (C4's "discard all but one of any
    * three-sentence span occurring more than once", arXiv:1910.10683 §2.2,
    * applied to token-lines): every line occurring ≥ 2 times in the corpus
    * is removed EVERYWHERE except its canonical — minimum (doc, position)
    * — occurrence, and each document's text is reassembled from its kept
    * lines in order. The canonical owner is a pure min, so the rewrite is
    * deterministic and partition-order-free.
    *
    * Shape at scale: the [[dupLineStats]] skeleton — explode + ONE
    * line-keyed partial-aggregated groupBy carrying (count, min(doc,pos))
    * + join back co-partitioned with that aggregate's exchange + one
    * groupBy(doc) to reassemble. The reassembly collect_list is
    * per-DOCUMENT (bounded by doc length), never corpus-wide; no window
    * over the full line stream (an aggregate needs no per-partition sort).
    */
  def dedupLinesRewrite(docs: DataFrame, idCol: String, textCol: String,
                        lineWidth: Int = 10): DataFrame = {
    val id = col(idCol)
    val lines = docs.select(id,
      posexplode(tokenLines(col(textCol), lineWidth)).as(Seq("__pos", "__line")))
    val freq = lines.groupBy(col("__line")).agg(
      count(lit(1)).as("__n"),
      min(struct(id.as("d"), col("__pos").as("p"))).as("__c"))
    val keep = col("__n") === 1 ||
      (col("__c.d") === id && col("__c.p") === col("__pos"))
    lines.join(freq, "__line")
      .groupBy(id)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(keep, 0L).otherwise(1L)).as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(keep, struct(col("__pos"), col("__line"))))),
          s => s.getField("__line"))).as("clean_text"))
      .select(id, col("clean_text"), col("n_lines"), col("n_removed"))
  }

  /** Per-document duplicated-SPAN statistics — the shuffle-bounded
    * fixed-width variant of exact substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): every OVERLAPPING `k`-token window is a span; a
    * span occurring ≥ 2 times ANYWHERE in the corpus (any document,
    * including the same one twice) is duplicated; each doc reports its
    * duplicated-position count and fraction.
    *
    * Distinct from [[dupLineStats]]: lines are non-overlapping chunks
    * counting cross-DOC sharing only; spans are overlapping windows
    * counting total occurrence multiplicity — the repeated-substring
    * signal suffix arrays give single-node engines, recovered here with
    * one explode + one span-keyed partial-aggregated groupBy + one join
    * back co-partitioned with that groupBy's exchange + one groupBy(doc).
    * No suffix sort, no self-join: a boilerplate span shared by millions
    * of docs is ONE aggregate row fanned back by the join.
    */
  def dupSpanStats(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 6): DataFrame = {
    val id = col(idCol)
    val nPos = size(col("__toks")) - lit(k - 1)
    // sequence(1, n) REVERSES for n < 1 (auto step -1) — short docs must
    // hit the empty-array branch, not emit phantom spans
    val spans = docs.select(id, split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(id, explode(
        when(nPos >= 1, transform(sequence(lit(1), nPos),
          i => concat_ws(" ", slice(col("__toks"), i, lit(k)))))
          .otherwise(array().cast("array<string>"))).as("__span"))
    val freq = spans.groupBy(col("__span")).agg(count(lit(1)).as("__nocc"))
    spans.join(freq, "__span")
      .groupBy(id)
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__nocc") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(id, col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast("double") /
          col("n_spans").cast("double"), 6).as("dup_span_frac"))
  }

  /** Corpus-wide duplicated-SPAN REWRITE — the actual Lee-et-al. removal
    * ("remove all but one occurrence of any duplicated substring",
    * arXiv:2107.06499 §4) over [[dupSpanStats]]'s overlapping fixed-width
    * spans: every k-token span occurring ≥ 2 times ANYWHERE in the corpus
    * keeps only its canonical minimum-(doc, pos) occurrence; every OTHER
    * occurrence marks its k token positions, and a token is dropped iff
    * covered by AT LEAST ONE marked window (interval-union overlap
    * resolution — a pure predicate per position, so the rewrite is
    * deterministic and partition-order-free; no greedy scan state). The
    * canonical occurrence itself survives unless a DIFFERENT duplicated
    * span's non-canonical window covers its tokens. `clean_text` is the
    * surviving tokens in order; a whole-document duplicate reassembles to
    * ''. Fixed-width note: the k−1 tokens after a duplicated region's last
    * full window sit only in straddling (unique) spans and survive — the
    * documented approximation of windowed vs suffix-array substring dedup.
    *
    * Shape at scale: the [[dupSpanStats]] skeleton (explode + ONE
    * span-keyed partial-aggregated groupBy carrying (count, min(doc,pos))
    * + join back co-partitioned with that exchange), then the removal set
    * explodes k positions per NON-CANONICAL occurrence only — volume ∝
    * duplicated text, not corpus — and survivors come from one
    * (doc, pos)-keyed anti-join (multiplicity-tolerant, so no distinct
    * shuffle on the removal set). Reassembly collect_list is per-DOCUMENT,
    * bounded by doc length; no window over the token stream, no self-join,
    * no suffix sort. The reference is silent here (pandas stats only,
    * `tool_call_agent.py:131-141`); [[dedupLinesRewrite]] is the
    * non-overlapping-chunk variant.
    *
    * EXECUTION CONTRACT (the [[Dedup.minhashLsh]] contract): eager — the
    * token projection feeds FOUR consumers (span stream twice, the token
    * stream, the per-doc stats), so it is cached and the corpus parquet
    * is scanned ONCE; the result is materialized, the projection cache
    * released, and the returned (cached) frame is caller-owned.
    */
  def dedupSpansRewrite(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 6): DataFrame = {
    val id = col(idCol)
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val toksDf = docs.select(id, split(trim(col(textCol)), "\\s+").as("__toks"))
      .persist(mad)
    val nPos = size(col("__toks")) - lit(k - 1)
    // sequence(1, n) REVERSES for n < 1 — short docs must hit the
    // empty-array branch (same guard as dupSpanStats)
    val spans = toksDf.select(id, explode(
        when(nPos >= 1, transform(sequence(lit(1), nPos),
          i => struct(i.as("__pos"),
            concat_ws(" ", slice(col("__toks"), i, lit(k))).as("__span"))))
          .otherwise(array().cast("array<struct<__pos:int,__span:string>>")))
        .as("__s"))
      .select(id, col("__s.__pos").as("__pos"), col("__s.__span").as("__span"))
    val freq = spans.groupBy(col("__span")).agg(
      count(lit(1)).as("__n"),
      min(struct(id.as("d"), col("__pos").as("p"))).as("__c"))
    val rmPos = spans.join(freq, "__span")
      .where(col("__n") >= 2 &&
        !(col("__c.d") === id && col("__c.p") === col("__pos")))
      .select(id.as("__rid"),
        explode(sequence(col("__pos"), col("__pos") + lit(k - 1))).as("__rm"))
    val toks = toksDf
      .select(id, posexplode(col("__toks")).as(Seq("__p0", "__tok")))
      .select(id, (col("__p0") + 1).as("__tpos"), col("__tok"))
    val kept = toks.join(rmPos,
      id === col("__rid") && col("__tpos") === col("__rm"), "left_anti")
    val reasm = kept.groupBy(id).agg(
      count(lit(1)).as("__nkept"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("__tpos"), col("__tok")))),
        s => s.getField("__tok"))).as("clean_text"))
    val out = toksDf
      .select(id, size(col("__toks")).cast("long").as("n_tokens"))
      .join(reasm, Seq(idCol), "left")
      .select(id, coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__nkept"), lit(0L))).as("n_removed"))
      .persist(mad)
    out.count()
    toksDf.unpersist(blocking = false)
    out
  }

  /** Gopher-style repetition-free document quality gates (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1 — the heuristic family alongside [[t7]]'s
    * repetition gates): mean word length within [3, 10] characters,
    * symbol-to-word ratio ('#' and '…' spam) at most 0.1, at least 80% of
    * words containing an alphabetic character, and at least
    * `minStopwords` of the canonical eight function words (the, be, to,
    * of, and, that, have, with) present — Gopher requires 2; corpora with
    * constrained vocabularies pass 1.
    *
    * Portability: every ratio is ONE IEEE division of exact integer
    * counts ('…' counted via length-difference division, no regex
    * backtracking; rounded copies are for reporting — the gates compare
    * the unrounded quotients identically in any engine). Map-only: one
    * narrow projection, no shuffle, no explode — the whole gate family
    * fuses into the scan.
    */
  def gopherGates(docs: DataFrame, idCol: String, textCol: String,
                  minStopwords: Int = 2): DataFrame = {
    val id = col(idCol)
    val df = docs.select(id, col(textCol).as("__t"),
      split(trim(col(textCol)), "\\s+").as("__toks"))
    val nWords = size(col("__toks")).cast("long")
    val nChars = length(array_join(col("__toks"), "")).cast("long")
    val nSymbols = (length(col("__t")) - length(translate(col("__t"), "#", "")))
      .cast("long") +
      expr("CAST((length(__t) - length(replace(__t, '...'))) div 3 AS BIGINT)")
    val nAlpha = size(filter(col("__toks"), w => w.rlike("[a-zA-Z]"))).cast("long")
    val nSw = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(s => array_contains(col("__toks"), s).cast("long")).reduce(_ + _)
    val mwl = nChars.cast("double") / nWords.cast("double")
    val symr = nSymbols.cast("double") / nWords.cast("double")
    val alpf = nAlpha.cast("double") / nWords.cast("double")
    df.select(id, nWords.as("n_words"),
      round(mwl, 6).as("mean_word_len"),
      round(symr, 6).as("symbol_ratio"),
      round(alpf, 6).as("alpha_frac"),
      nSw.as("n_stopwords"),
      (mwl.between(3.0, 10.0) && symr <= 0.1 && alpf >= 0.8 &&
        nSw >= minStopwords).as("keep"))
  }

  /** Domain data selection by contrastive bigram models — the Moore–Lewis
    * cross-entropy-difference criterion (ACL 2010) that DSIR (Xie et al.
    * 2023, arXiv:2302.03169) scales up with hashed n-gram importance
    * weights: score every document under a TARGET-domain Laplace bigram
    * model and under the RAW-corpus model; documents whose target score
    * beats their raw score are the in-domain selection.
    *
    * Portability: both models use [[bigramLmScore]]'s quantized-long
    * arithmetic (each p is one correctly-rounded IEEE division of exact
    * integers, quantized to floor(p·1e9+0.5) and summed as longs), and the
    * selection flag compares the two integer sums directly — the output
    * carries NO floating point at all, so any engine replays it
    * bit-for-bit. Unseen bigrams/heads under the target model coalesce to
    * count 0 (Laplace keeps p positive).
    *
    * Shape at scale: ONE cached bigram projection of the corpus feeds the
    * target counts (filtered), the raw counts, and the scoring stream; the
    * count tables join back co-partitioned with their own groupBy
    * exchanges; both vocab sizes are 1-row broadcasts. Nothing self-joins.
    *
    * EXECUTION CONTRACT (the minhashLsh contract): eager; intermediates
    * released; the returned frame is cached and caller-owned.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val toksDf = docs.select(col(idCol).as("__id"), targetPred.as("__tgt"),
        split(trim(col(textCol)), "\\s+").as("__toks"))
      .persist(mad)
    val z = arrays_zip(
      slice(col("__toks"), lit(1), size(col("__toks")) - 1),
      slice(col("__toks"), lit(2), size(col("__toks")) - 1))
    val b = toksDf
      .select(col("__id"), col("__tgt"), explode(z).as("__z"))
      .select(col("__id"), col("__tgt"), col("__z").getField("0").as("__w1"),
        concat(col("__z").getField("0"), lit(" "),
          col("__z").getField("1")).as("__bg"))
      .persist(mad)
    def model(stream: DataFrame): (DataFrame, DataFrame) = {
      val c2 = stream.groupBy(col("__w1"), col("__bg"))
        .agg(count(lit(1)).as("__c2"))
      val c1 = c2.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1"))
      (c2, c1) // bg determines w1 (its prefix) — c2 is distinct by __bg
    }
    val (tc2, tc1) = model(b.where(col("__tgt")))
    val (rc2, rc1) = model(b)
    def vocabOf(df: DataFrame, name: String): DataFrame =
      df.select(explode(col("__toks")).as("__tok"))
        .agg(count_distinct(col("__tok")).as(name))
    val tv = vocabOf(toksDf.where(col("__tgt")), "__tv")
    val rv = vocabOf(toksDf, "__rv")
    val pT = (coalesce(col("__tc2"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("__tc1"), lit(0L)) + col("__tv")).cast("double")
    val pR = (col("__rc2") + lit(1L)).cast("double") /
      (col("__rc1") + col("__rv")).cast("double")
    // Fuse the four model lookups into ONE per-bigram score table before
    // the corpus-sized stream sees any of them: every join below is
    // vocabulary-sized (distinct bigrams / distinct first-words), the
    // quantized per-bigram scores are precomputed once per DISTINCT
    // bigram, and the occurrence stream `b` — the only corpus-sized frame
    // — pays exactly one hash join instead of four shuffle joins. Values
    // are unchanged (same counts, same smoothing, same quantization), so
    // the oracle replay and hashes do not move.
    val lut = rc2.withColumnRenamed("__c2", "__rc2")
      .join(tc2.select(col("__bg"), col("__c2").as("__tc2")), Seq("__bg"), "left")
      .join(rc1.withColumnRenamed("__c1", "__rc1"), Seq("__w1"))
      .join(tc1.withColumnRenamed("__c1", "__tc1"), Seq("__w1"), "left")
      .crossJoin(broadcast(tv)).crossJoin(broadcast(rv))
      .select(col("__bg"),
        floor(pT * lit(1e9) + lit(0.5)).cast("long").as("__qt"),
        floor(pR * lit(1e9) + lit(0.5)).cast("long").as("__qr"))
    val result = b.select(col("__id"), col("__bg"))
      .join(lut, Seq("__bg"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__qt")).as("q_target"), sum(col("__qr")).as("q_raw"))
      .select(col("__id").as(idCol), col("n_bigrams"),
        col("q_target"), col("q_raw"),
        (col("q_target") > col("q_raw")).as("selected"))
      .persist(mad)
    result.count()
    b.unpersist(blocking = false)
    toksDf.unpersist(blocking = false)
    result
  }

  // ---------------------------------------------------------------------
  // Corpus-trained bigram LM quality score
  // ---------------------------------------------------------------------

  /** Laplace-smoothed bigram-LM score per document, trained on the corpus
    * itself (the KenLM-perplexity quality filter of CCNet/RedPajama reduced
    * to an in-engine bigram model): for every adjacent token pair, p =
    * (C(w1 w2) + 1) / (C(w1 ·) + V); the doc score is the mean p.
    *
    * Portability: each p is one IEEE division of exact integers (correctly
    * rounded, so bit-identical in any engine); the MEAN is made
    * order-independent by quantizing p to an integer q = floor(p·1e9 + 0.5)
    * and summing exact longs (the lsum trick) — an arithmetic mean rather
    * than the classic log-perplexity because `ln` is NOT bit-portable
    * across libm implementations while integer sums are.
    *
    * Shape at scale: ONE scan of the text column — the token-array
    * projection is persisted first (the minhashLsh shingle-materialization
    * pattern) and both the model build and the scoring stream derive from
    * it; the head counts C(w1 ·) are an aggregate OF the bigram counts
    * (distinct-bigram-sized input, not the raw stream); V (vocab size) is a
    * 1-row broadcast. The corpus never self-joins, and the scoring join is
    * co-partitioned with the model's own groupBy exchange.
    *
    * EXECUTION CONTRACT (not lazy — the minhashLsh contract): runs eagerly,
    * releases the token-projection cache before returning, and returns the
    * per-doc result CACHED; the caller owns the returned frame's lifecycle
    * and should `.unpersist()` it when done.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val toksDf = docs.select(id, split(trim(col(textCol)), "\\s+").as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (w1, "w1 w2") pairs; tokens contain no whitespace by construction of
    // the split, so the joined-string bigram key is collision-free
    val z = arrays_zip(
      slice(col("__toks"), lit(1), size(col("__toks")) - 1),
      slice(col("__toks"), lit(2), size(col("__toks")) - 1))
    val bg = toksDf
      .select(id, explode(z).as("__z"))
      .select(id, col("__z").getField("0").as("__w1"),
        concat(col("__z").getField("0"), lit(" "),
          col("__z").getField("1")).as("__bg"))
    val c2 = bg.groupBy(col("__w1"), col("__bg")).agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1"))
    val vocab = toksDf.select(explode(col("__toks")).as("__tok"))
      .agg(count_distinct(col("__tok")).as("__v"))
    val p = (col("__c2") + lit(1L)).cast("double") /
      (col("__c1") + col("__v")).cast("double")
    val result = bg.drop("__w1")
      .join(c2, "__bg")
      .join(c1, "__w1")
      .crossJoin(broadcast(vocab))
      .select(id, floor(p * lit(1e9) + lit(0.5)).cast("long").as("__q"))
      .groupBy(id)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__q")).as("__sq"))
      .select(id, col("n_bigrams"),
        (col("__sq").cast("double") / col("n_bigrams").cast("double") /
          lit(1e9)).as("lm_score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    toksDf.unpersist()
    result
  }

  // ---------------------------------------------------------------------
  // Sliding-window context chunking
  // ---------------------------------------------------------------------

  /** Split each document into `window`-token chunks every `stride` tokens
    * (the context-window chunking step before tokenized training shards;
    * overlap = window − stride keeps boundary context). Pure map-only
    * explode: output size is bounded by n/stride chunks per doc, no shuffle,
    * no state — the one corpus-prep stage that is embarrassingly parallel
    * and should stay that way.
    *
    * Emits (id, chunk_idx, n_chunk_tokens, chunk_fp) where chunk_fp is the
    * md5 of the chunk's space-joined tokens (the downstream shard key).
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"window=$window stride=$stride")
    val id = col(idCol)
    val toksDf = docs.select(id, split(trim(col(textCol)), "\\s+").as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // k = 0 .. ceil(n/stride)-1: every token is covered, the final (short)
    // chunk keeps the tail
    val nChunks = ((col("__n") + lit(stride - 1)) / lit(stride)).cast("int")
    val chunk = transform(sequence(lit(0), nChunks - lit(1)), k =>
      struct(
        k.cast("long").as("chunk_idx"),
        least(lit(window), col("__n") - k * stride).cast("long")
          .as("n_chunk_tokens"),
        md5(encode(concat_ws(" ", slice(col("__toks"), k * stride + 1, lit(window))),
          "utf-8")).as("chunk_fp")))
    toksDf.select(id, explode(chunk).as("__c"))
      .select(id, col("__c.chunk_idx"), col("__c.n_chunk_tokens"),
        col("__c.chunk_fp"))
  }

  // ---------------------------------------------------------------------
  // Incremental (delta-vs-index) exact dedup
  // ---------------------------------------------------------------------

  /** Dedup a NEW batch of documents against an existing corpus fingerprint
    * index without ever rescanning the corpus text: anti-join the batch's
    * normalized-content fingerprints against the index, then keep the
    * min-id survivor per fingerprint within the batch itself.
    *
    * This is how exact dedup actually runs in production: the 100 TB corpus
    * is fingerprinted ONCE into an index table; each incremental crawl
    * batch (GBs against TBs) pays one anti-join — AQE broadcasts the batch
    * side when small, and the index side is pre-bucketed by `fp` in a real
    * deployment so the join is exchange-free on the big side.
    *
    * `index` needs only an `fp` column (fingerprints, e.g. from a previous
    * [[fingerprints]] run); returns the surviving (id, fp) rows of `batch`.
    */
  def incrementalDedup(batch: DataFrame, idCol: String, textCol: String,
                       index: DataFrame): DataFrame = {
    val fps = fingerprints(batch, idCol, textCol)
    fps.join(index.select(col("fp")), Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("fp"))
  }

  /** (id, fp) projection — the corpus fingerprint index builder. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))

  // ---------------------------------------------------------------------
  // Per-stratum token-budget selection
  // ---------------------------------------------------------------------

  /** Select documents per stratum (e.g. language) in reproducible hash
    * order until a token budget is reached — the domain-mixture trimming
    * step that fits each source into its sampling quota (cf. The Pile /
    * DoReMi mixture weights turned into hard token budgets).
    *
    * Keeps a doc iff the running token count BEFORE it is under `budget`
    * (so the budget is exceeded by at most one doc, and the selection is a
    * prefix of the hash order — stable under corpus growth).
    *
    * Scale shape: a plain `Window.partitionBy(stratum).orderBy(hash)` puts
    * an entire stratum in ONE task — with 5 languages over 100 TB that is
    * a 20 TB task. Instead the running sum is the sp3/sq1 two-level
    * decomposition *within each stratum*: the chunk key is the hash's own
    * leading hex byte (256 even, order-aligned sub-chunks per stratum), so
    * per-(stratum, chunk) totals + one tiny offset window + bounded
    * within-chunk windows replay the exact per-stratum prefix sum.
    */
  def tokenBudgetSelect(docs: DataFrame, stratumCol: String, idCol: String,
                        tokCol: String, budget: Long,
                        saltPrefix: String = "mix2:"): DataFrame = {
    val id = col(idCol)
    val h = md5(concat(lit(saltPrefix), id.cast("string")))
    val withH = docs.select(col(stratumCol), id, col(tokCol), h.as("__h"))
      .withColumn("__chunk", conv(substring(col("__h"), 1, 2), 16, 10).cast("long"))
    val totals = withH.groupBy(col(stratumCol), col("__chunk"))
      .agg(sum(col(tokCol)).as("__ctot"))
    // ≤256 rows per stratum — the one unpartitioned-by-chunk window, by design
    val wChunks = Window.partitionBy(col(stratumCol)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__ctot")).over(wChunks), lit(0L)))
      .select(col(stratumCol), col("__chunk"), col("__off"))
    val wIn = Window.partitionBy(col(stratumCol), col("__chunk"))
      .orderBy(col("__h"), id)
      .rowsBetween(Window.unboundedPreceding, -1)
    withH.join(broadcast(offsets), Seq(stratumCol, "__chunk"))
      .withColumn("cum_before",
        col("__off") + coalesce(sum(col(tokCol)).over(wIn), lit(0L)))
      .where(col("cum_before") < budget)
      .select(col(stratumCol), id, col(tokCol), col("cum_before"))
  }

  // ---------------------------------------------------------------------
  // Temperature-resampled domain mixture (α = 0.5)
  // ---------------------------------------------------------------------

  /** Allocate a sampling `budget` across domains proportional to
    * size^α with α = 0.5 — the multilingual/multi-domain temperature
    * resampling that upweights small domains relative to raw proportions
    * (α=1 is natural sampling, α=0 uniform; √size is the standard middle).
    *
    * Determinism/portability: √ is the ONE libm function IEEE 754 requires
    * correctly rounded, so `sqrt(size)` is bit-identical everywhere; it is
    * then quantized to a BIGINT weight (floor(√s·10⁶+0.5)) and every later
    * step — proportional floor share `budget·w div Σw`, largest-remainder
    * top-up ordered (remainder DESC, stratum ASC) — is exact integer
    * arithmetic. Allocations sum to exactly `budget` and replay bit-for-bit
    * in any engine.
    *
    * Scale shape: one map-side-combined groupBy collapses the corpus to one
    * row per domain; everything after runs on that tiny frame (domains
    * number in the hundreds), so the windows are trivially small. Weighing
    * by a SIZE column (chars/tokens) rather than doc count is the common
    * production choice; pass `lit(1L)` as `sizeCol` for doc-count weights.
    */
  def temperatureMixture(docs: DataFrame, stratumCol: String,
      sizeCol: Column, budget: Long): DataFrame = {
    // The per-domain frame feeds THREE consumers (the total, the shares,
    // the leftover) — localCheckpoint materializes the corpus groupBy
    // once, so the corpus is scanned once, not once per consumer; the
    // frame is domain-count-sized (hundreds of rows), so the checkpoint
    // is free and its blocks live only as long as the returned plan.
    val sizes = docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(sizeCol).cast("long").as("stratum_size"))
      .withColumn("q_weight",
        floor(sqrt(col("stratum_size").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long"))
      .localCheckpoint()
    val tot = sizes.agg(sum(col("q_weight")).as("__tot"))
    // budget·q_weight can reach ~1e13·budget (q_weight ≈ √bytes·1e6 at
    // 100 TB), far past Long range — widen to DECIMAL(38,0) for the product
    // so shares stay exact instead of silently wrapping in non-ANSI mode.
    // `div` (IntegralDivide) returns BIGINT for decimal operands, and the
    // remainder is < Σq_weight, so both results fit back in longs.
    val shares = sizes.crossJoin(broadcast(tot))
      .withColumn("__prod",
        lit(budget).cast("decimal(38,0)") * col("q_weight").cast("decimal(38,0)"))
      .withColumn("__base", expr("__prod div __tot"))
      .withColumn("__rem", (col("__prod") % col("__tot")).cast("long"))
    val leftover = shares.agg((lit(budget) - sum(col("__base"))).as("__left"))
    val wRem = Window.orderBy(col("__rem").desc, col(stratumCol).asc)
    shares.withColumn("__rk", row_number().over(wRem))
      .crossJoin(broadcast(leftover))
      .withColumn("alloc",
        col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .select(col(stratumCol), col("n_docs"), col("stratum_size"),
        col("q_weight"), col("alloc"))
  }

  /** Temperature mixture with a MAX-EPOCHS cap — the data-constrained-
    * scaling allocator (Muennighoff et al. 2023, arXiv:2305.16264: repeat
    * data at most ~4 epochs; D4 practice): each domain's ideal share is
    * proportional to [[temperatureMixture]]'s √size weight, but no domain
    * may be allocated more than `maxEpochs`·size tokens. The exact
    * water-fill has a CLOSED FORM — no iteration: sort domains by
    * cap/weight ratio ascending; a domain is capped iff
    * cap·W_suffix ≤ (B − C_prefix)·w (all integer cross-products in
    * DECIMAL(38,0) — exact at 100 TB weights); the uncapped remainder is
    * distributed by the mix3 floor-share + largest-remainder rule, so
    * allocations sum to EXACTLY the budget whenever budget ≤ Σcap (beyond
    * that everything caps and the shortfall is visible as Σalloc < B).
    * `budget < 0` means "the corpus's own token count" — reallocate one
    * epoch's worth across domains under the temperature, never repeating
    * any domain past `maxEpochs`.
    *
    * Scale shape: one map-side-combined groupBy collapses the corpus to a
    * per-domain frame; every window after that runs on that tiny frame
    * (domains number in the hundreds). Deterministic: ratio ties break on
    * the stratum, remainder ties likewise.
    */
  def repeatCapMixture(docs: DataFrame, stratumCol: String, sizeCol: Column,
      maxEpochs: Int = 4, budget: Long = -1L): DataFrame = {
    val dec = "decimal(38,0)"
    // localCheckpoint: one corpus scan feeds all downstream consumers of
    // the per-domain frame (total, water-fill windows, remainder agg) —
    // same rationale as temperatureMixture
    val sizes = docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(sizeCol).cast("long").as("stratum_size"))
      .withColumn("q_weight",
        floor(sqrt(col("stratum_size").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long"))
      .withColumn("cap", (lit(maxEpochs.toLong) * col("stratum_size")).cast("long"))
      .localCheckpoint()
    val tot = sizes.agg(sum(col("stratum_size")).cast("long").as("__tot"))
    val wOrd = Window.orderBy(col("r"), col(stratumCol))
    val s = sizes.crossJoin(broadcast(tot))
      .withColumn("__b",
        when(lit(budget) >= 0, lit(budget)).otherwise(col("__tot")).cast("long"))
      .withColumn("r", col("cap").cast("double") / col("q_weight").cast("double"))
      .withColumn("c_before", coalesce(sum(col("cap"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("w_from", sum(col("q_weight"))
        .over(wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("ok", col("cap").cast(dec) * col("w_from").cast(dec) <=
        (col("__b").cast(dec) - col("c_before").cast(dec)) * col("q_weight").cast(dec))
      .withColumn("bad_upto", sum(when(col("ok"), 0L).otherwise(1L))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("capped", col("ok") && col("bad_upto") === 0L)
    val agg = s.agg(
      coalesce(sum(when(col("capped"), col("cap"))), lit(0L)).as("__ck"),
      coalesce(sum(when(!col("capped"), col("q_weight"))), lit(0L)).as("__wr"))
    val sh = s.crossJoin(broadcast(agg))
      .withColumn("__remt", col("__b").cast(dec) - col("__ck").cast(dec))
      .withColumn("base", when(col("capped"), col("cap"))
        .otherwise(expr(
          "(__remt * CAST(q_weight AS decimal(38,0))) div CAST(__wr AS decimal(38,0))")))
      .withColumn("remv", when(col("capped"), lit(0L))
        .otherwise(((col("__remt") * col("q_weight").cast(dec)) %
          col("__wr").cast(dec)).cast("long")))
    val lt = sh.agg((max(col("__b")) - max(col("__ck")) -
      coalesce(sum(when(!col("capped"), col("base"))), lit(0L))).as("__left"))
    val wRk = Window.partitionBy(col("capped"))
      .orderBy(col("remv").desc, col(stratumCol))
    sh.crossJoin(broadcast(lt))
      .withColumn("__rk", row_number().over(wRk))
      .withColumn("alloc", when(col("capped"), col("cap"))
        .otherwise(col("base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L)))
      .select(col(stratumCol), col("n_docs"), col("stratum_size"),
        col("q_weight"), col("cap"), col("capped"), col("alloc"))
  }

  // ---------------------------------------------------------------------
  // CCNet-style quality buckets (head / middle / tail)
  // ---------------------------------------------------------------------

  /** Partition the scored corpus into `nBuckets` equal-size quality tiers by
    * [[bigramLmScore]] — CCNet's head/middle/tail split (best-scoring third
    * kept, middle optionally, tail dropped), with the corpus-trained LM
    * standing in for CCNet's wiki-trained KenLM.
    *
    * Bucket semantics are EXACTLY SQL `ntile(nBuckets) OVER (ORDER BY
    * lm_score DESC, id)`, but computed without the single-task global
    * window: the global rank comes from a two-level decomposition (chunk =
    * the score quantized to 10⁻⁵ — monotone in score, so chunk order aligns
    * with score order; per-chunk counts → one tiny offset window → bounded
    * within-chunk `row_number`), then `bucket = (rank−1)·n_buckets div n + 1`
    * — the closed form of ntile's first-buckets-get-the-remainder fill
    * (property-tested against ntile in TextPipelineSpec).
    */
  def qualityBuckets(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 3): DataFrame = {
    val id = col(idCol)
    val scored = bigramLmScore(docs, idCol, textCol)
      .select(id, col("lm_score"))
      .withColumn("__chunk", floor(col("lm_score") * lit(1e5)).cast("long"))
    val counts = scored.groupBy(col("__chunk")).agg(count(lit(1)).as("__cn"))
    // score DESC ⇒ chunk DESC: the offset window runs over the quantized
    // score buckets (≲10⁵ rows whatever the corpus size), not the corpus
    val wChunks = Window.orderBy(col("__chunk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cn")).over(wChunks), lit(0L)))
      .select(col("__chunk"), col("__off"))
    val n = scored.agg(count(lit(1)).as("__n"))
    val wIn = Window.partitionBy(col("__chunk"))
      .orderBy(col("lm_score").desc, id.asc)
    val labels = (1 to nBuckets).map {
      case 1 => "head"
      case b if b == nBuckets => "tail"
      case _ => "middle"
    }
    scored.join(broadcast(offsets), Seq("__chunk"))
      .withColumn("__rank", col("__off") + row_number().over(wIn).cast("long"))
      .crossJoin(broadcast(n))
      .withColumn("__b", expr(s"((__rank - 1) * $nBuckets) div __n") + lit(1L))
      .select(id, col("lm_score"),
        element_at(array(labels.map(lit): _*), col("__b").cast("int")).as("bucket"))
  }

  /** Sentence segmentation: one row per sentence — runs of
    * non-terminators plus their trailing `.!?` terminators, matched with
    * a single RE2-compatible `regexp_extract_all` pass (NO lookbehind, so
    * the identical pattern runs in any engine), trimmed, empties dropped.
    * `sent_idx` is the pre-filter match position (deterministic, gaps
    * where an empty match was dropped). Map-only explode; the unit step
    * before sentence-bounded chunking, alignment, or per-sentence
    * filtering.
    */
  def sentences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        posexplode(regexp_extract_all(col(textCol),
          lit("[^.!?]+[.!?]*"), lit(0))).as(Seq("sent_idx", "__raw")))
      .withColumn("sentence", trim(col("__raw")))
      .where(col("sentence") =!= "")
      .select(col(idCol), col("sent_idx").cast("long").as("sent_idx"),
        col("sentence"),
        graft.functions.TextFunctions.tokenCount(col("sentence"))
          .cast("long").as("n_tokens"))

  /** Flesch reading-ease per document, from three codegen'd regex counts
    * in ONE map-only pass: words (`\S+` runs), sentences (`[.!?]+` runs,
    * floored at 1), syllables (vowel-group runs — the standard public
    * approximation). Score = `206.835 − 1.015·(W/S) − 84.6·(Y/W)`, a
    * fixed IEEE sequence on exact integer counts, 6dp-quantized;
    * wordless docs score null. Higher = easier; the classic readability
    * gate next to t2's quality score.
    */
  /** The [[readability]] score as a bare column over raw text — for use
    * as a PIPELINE GATE ([[graft.plans.CorpusPipeline.Config.minFlesch]])
    * where the count columns aren't wanted. Same formula, same counts,
    * same quantization; null when the text has no words.
    */
  def fleschScore(text: Column): Column = {
    val words = TextFunctions.tokenCount(text).cast("long")
    val sents = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
      .cast("long")
    val sylls = regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
    when(words > 0,
      floor((lit(206.835) -
        lit(1.015) * (words.cast("double") / sents.cast("double")) -
        lit(84.6) * (sylls.cast("double") / words.cast("double"))) *
        lit(1e6) + lit(0.5)) / lit(1e6))
  }

  def readability(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = TextFunctions.tokenCount(col(textCol)).cast("long")
    val sents = greatest(regexp_count(col(textCol), lit("[.!?]+")), lit(1))
      .cast("long")
    val sylls = regexp_count(lower(col(textCol)), lit("[aeiouy]+"))
      .cast("long")
    docs.select(col(idCol), words.as("n_words"), sents.as("n_sentences"),
        sylls.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          floor((lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double"))) * lit(1e6) + lit(0.5)) /
            lit(1e6)))
  }

  /** Corpus-wide bigram collocations: adjacent word pairs ranked by a
    * RATIONAL PMI lift — `count(ab)·W² / (B·count(a)·count(b))` (W = total
    * tokens, B = total bigrams), the log-free order-preserving form of
    * pointwise mutual information (the tt1 ratio-over-log convention;
    * Church & Hanks 1990 is the public source for PMI collocations).
    * Values > 1 mean the pair co-occurs more than token frequencies
    * predict — multiword expressions, named entities, templates.
    *
    * Scale shape: two map-only explodes of the corpus (tokens via one
    * regex pass, bigram occurrences via the one-pass [[graft.functions
    * .WordShinglesAll]] kernel — no per-window re-split), two
    * map-side-combined groupBys, totals as broadcast 1-row frames, and a
    * final top-k (TakeOrdered, no global sort). The unigram join-back
    * touches only pairs that survived `minCount`.
    *
    * Determinism: both lift products are exact in DECIMAL(38,0) with one
    * double cast each and a single IEEE division, 6dp-quantized; ties
    * break by (w1, w2). Magnitude bound: W ≤ 1e12 keeps c_ab·W² inside
    * DECIMAL(38,0) for c_ab ≤ 1e12.
    */
  def collocations(docs: DataFrame, textCol: String, minCount: Long = 3L,
      topK: Int = 20): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val toks = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val totalToks = toks.agg(count(lit(1)).as("__w"))
    val bg = docs.select(
      explode(TextFunctions.shinglesAll(col(textCol), 2)).as("bigram"))
    val totalBg = bg.agg(count(lit(1)).as("__b"))
    val pairs = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
      .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      .withColumn("w2", element_at(split(col("bigram"), " "), 2))
    val liftNum = (dec(col("n_ab")) * dec(col("__w")) * dec(col("__w")))
      .cast("double")
    val liftDen = (dec(col("__b")) * dec(col("n_a")) * dec(col("n_b")))
      .cast("double")
    pairs
      .join(uni.select(col("tok").as("w1"), col("n_tok").as("n_a")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("n_tok").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(totalToks))
      .crossJoin(broadcast(totalBg))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        (floor(liftNum / liftDen * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("pmi_lift"))
      .orderBy(col("pmi_lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
