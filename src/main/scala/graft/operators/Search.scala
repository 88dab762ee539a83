package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over a document corpus — BM25 (Robertson &
  * Sparck Jones probabilistic relevance framework, the Okapi form).
  *
  * The plan is the inverted-index shape without materializing an index:
  * only the POSTING LISTS OF THE QUERY TERMS are ever aggregated (the
  * token explode is filtered to the query vocabulary before any shuffle),
  * document lengths come from a map-only projection (`size(split(...))`,
  * no tokens shuffled for it), and corpus statistics (N, avgdl, per-term
  * df) are 1-row/|Q|-row broadcast aggregates. Scoring is a broadcast
  * join onto the tiny tf frame; the final top-k is TakeOrdered, not a
  * global sort. Cost at 100 TB: two scans of the text column and
  * shuffles proportional to documents-containing-query-terms, never to
  * the corpus token count.
  *
  * Scoring arithmetic: per-term scores use the RATIONAL idf
  * `(N - df + 0.5) / (df + 0.5)` (the classic BM25 idf without the ln —
  * the engine's transcendental-free oracle convention, same trade as
  * tt1's tf*N/df), and per-document totals are 6dp-quantized exact sums,
  * so results are bit-reproducible across engines and shuffle orders.
  * `classicLnIdf = true` restores the textbook `ln` form for
  * analysis-side use (rank-tested in the spec, excluded from oracle
  * contracts).
  */
object Search {

  /** Whitespace tokens of trimmed text — the corpus-wide convention
    * (tt1/t1): no case folding, no stemming; normalize upstream if wanted.
    */
  def tokens(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** BM25 top-`k` documents for `queryTerms`: `(idCol, score)`, ranked by
    * score descending with id as the deterministic tie-break.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      classicLnIdf: Boolean = false): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val spark = docs.sparkSession
    import spark.implicits._

    // map-only doc-length projection — tokens are counted, not shuffled
    val lens = docs.select(col(idCol), size(tokens(col(textCol))).as("dl"))
    // exact avgdl: integer token total / doc count, one division
    val stats = lens.agg(count(lit(1L)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1L))).as("avgdl"))

    // the inverted-index trick: filter to the query vocabulary BEFORE the
    // tf aggregation, so the shuffle carries only matching postings
    val qt = queryTerms.distinct
    val toks = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(col("term").isin(qt: _*))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1L)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1L)).as("df"))

    val idf: Column =
      if (classicLnIdf)
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
      else (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfn = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val perTerm = tf
      .join(broadcast(dft), "term")
      // matching-docs-sized equi-join; AQE broadcasts when tf is small
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), (idf * tfn).as("s"))

    // exact 6dp-quantized per-doc total (shuffle-order independent)
    perTerm.groupBy(col(idCol))
      .agg((sum(floor(col("s") * lit(1e6) + lit(0.5))).cast("double") / lit(1e6))
        .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
