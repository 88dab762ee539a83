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

  /** A materialized inverted index: full postings (term → doc, tf), doc
    * lengths, and the two corpus scalars. [[bm25TopK]] re-derives all of
    * this per query — right for one-off searches; a serving workload
    * builds the index ONCE (two corpus scans) and pays only
    * postings-of-the-query-terms per query afterwards. `n`/`sumDl` are
    * exact integers so `avgdl` reconstructs as the identical IEEE
    * division on save/load.
    */
  final case class TermIndex private[Search] (
      postings: DataFrame /* (term, id, tf) */,
      lens: DataFrame /* (id, dl) */,
      n: Long, sumDl: Long) {
    def avgdl: Double = sumDl.toDouble / n
    def close(): Unit = {
      postings.unpersist(blocking = false)
      lens.unpersist(blocking = false)
    }

    /** Persist through the durable-index lineage layout (epoch dir +
      * sidecar written last — the LshIndex/SemIndex/PqModel discipline).
      * Postings repartition on `term` so a query's posting-list read is
      * partition-local, and the scalars travel in the sidecar as exact
      * integers.
      */
    def save(path: String): String = {
      val spark = postings.sparkSession
      val dir = graft.operators.IndexStore.nextEpochDir(spark, path)
      postings.repartition(col("term"))
        .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/postings")
      lens.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/lens")
      graft.operators.IndexStore.writeSidecar(spark, dir,
        s"""{"kind":"bm25","n":$n,"sumDl":$sumDl}""")
      dir
    }
  }

  /** Build the inverted index: one token-explode scan for postings, one
    * map-only scan for lengths, one 1-row aggregate for the scalars.
    */
  def buildTermIndex(docs: DataFrame, idCol: String,
      textCol: String): TermIndex = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val postings = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col("id")).agg(count(lit(1L)).as("tf"))
      .persist(mad)
    val lens = docs
      .select(col(idCol).as("id"), size(tokens(col(textCol))).as("dl"))
      .persist(mad)
    val r = lens.agg(count(lit(1L)).as("n"), sum(col("dl")).as("s"))
      .collect()(0)
    TermIndex(postings, lens, r.getLong(0), r.getLong(1))
  }

  /** Reload the newest complete epoch of a [[TermIndex.save]] lineage. */
  def loadTermIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): TermIndex = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val (dirs, meta) =
      graft.operators.IndexStore.snapshotAndDeltas(spark, path, "bm25")
    val postings = spark.read.parquet(s"${dirs.head}/postings").persist(mad)
    val lens = spark.read.parquet(s"${dirs.head}/lens").persist(mad)
    TermIndex(postings, lens,
      graft.operators.IndexStore.jsonInt(meta, "n").toLong,
      graft.operators.IndexStore.jsonLong(meta, "sumDl"))
  }

  /** BM25 top-k THROUGH a prebuilt [[TermIndex]] — identical scoring
    * arithmetic to [[bm25TopK]] (bit-equal results on the same corpus),
    * but per-query cost is the query terms' posting lists (a pushed-down
    * `term IN (...)` filter on the postings table), a matching-docs join
    * for lengths, and the TakeOrdered top-k. No token explode, no corpus
    * scan.
    */
  def bm25TopKIndexed(index: TermIndex, queryTerms: Seq[String],
      topK: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val qt = queryTerms.distinct
    val tf = index.postings.where(col("term").isin(qt: _*))
    val dft = tf.groupBy(col("term")).agg(count(lit(1L)).as("df"))
    val idf = (lit(index.n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfn = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(index.avgdl)))
    tf.join(broadcast(dft), "term")
      .join(index.lens, "id")
      .select(col("id"), (idf * tfn).as("s"))
      .groupBy(col("id"))
      .agg((sum(floor(col("s") * lit(1e6) + lit(0.5))).cast("double") / lit(1e6))
        .as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

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
