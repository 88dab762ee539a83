package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set against the
  *    full corpus; one scan, no shuffle of the corpus, a per-query top-k via
  *    window rank. The baseline and the correctness oracle.
  *  - [[lshTopK]] — approximate, the 100 TB path: random-hyperplane LSH with
  *    multi-probe (hamming-adjacent buckets), so each query only touches its
  *    probe buckets. Corpus is bucketed once (reusable across query batches);
  *    candidate scoring shuffles candidates, not the corpus.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * @param corpus  (idCol, vecCol) table — may be arbitrarily large
    * @param queries small query table (same column names); broadcast
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k; excludes
    * self-matches; deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .join(q, col("query_id") =!= col("neighbor_id")) // cross w/ self filter
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Bucket a corpus once for reuse across many query batches. */
  def bucketize(corpus: DataFrame, idCol: String, vecCol: String,
      lshBits: Int = 12, seed: Int = 42): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
      hyperplaneBucket(col(vecCol), lshBits, seed).as("bucket"))

  /** Approximate top-k: probe the query's own bucket plus all buckets at
    * Hamming distance 1 (multi-probe LSH, Lv et al. VLDB'07) — recall
    * degrades gracefully instead of falling off a cliff at bucket borders.
    */
  def lshTopK(
      bucketedCorpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      lshBits: Int = 12,
      seed: Int = 42): DataFrame = {
    val probes = array((0 to lshBits).map { i =>
      // i = 0: exact bucket; i >= 1: flip bit (i-1)
      if (i == 0) col("qbucket")
      else col("qbucket").bitwiseXOR(shiftleft(lit(1L), i - 1))
    }: _*)
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
          hyperplaneBucket(col(vecCol), lshBits, seed).as("qbucket"))
        .select(col("query_id"), col("qvec"), explode(probes).as("bucket")))
    val scored = bucketedCorpus
      .join(q, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("cosine"))
      .groupBy(col("query_id"), col("neighbor_id")) // same pair via 2 probes
      .agg(max(col("cosine")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF-style coarse quantization: per-label (or computed-cluster) centroid
    * table via array-average aggregation — posexplode + per-(cluster,dim)
    * mean + re-assemble. One shuffle on (cluster, dim).
    */
  def centroids(df: DataFrame, clusterCol: String, vecCol: String): DataFrame =
    df.select(col(clusterCol).as("cluster"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg(avg(col("v")).as("mean_v"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean_v")))).as("pairs"))
      .select(col("cluster"), transform(col("pairs"), p => p.getField("mean_v")).as("centroid"))
}
