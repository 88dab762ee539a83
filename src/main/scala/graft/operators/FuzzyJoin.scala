package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy join (entity resolution) without an all-pairs
  * comparison.
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al., "Fast
  * Similarity Search in Large Dictionaries", 2007): every string emits the
  * set of variants reachable by deleting up to `maxDist` characters. If
  * `levenshtein(s, t) <= k` then some alignment of s and t edits at most k
  * positions, and deleting the edited positions from each side leaves the
  * SAME string — so s and t share at least one (<=k)-deletion variant.
  * The neighborhood is therefore a **lossless** blocking key: every true
  * match lands in some shared bucket, and the exact `levenshtein` verify
  * drops the false candidates. No LSH-style recall loss, unlike d2/d3.
  *
  * Scale shape (100 TB lens): the explode factor is C(len, <=k) per row
  * (len+1 variants at k=1) — map-only generation, one shuffle on the
  * variant key, and all candidate pairs are bucket-local via
  * [[Dedup.boundedBucketPairs]], which also carries the hot-bucket guard:
  * a pathological bucket (millions of identical strings) degrades to
  * O(n·repFactor) candidates with an audit instead of an O(n^2) join. The
  * verify is Spark's codegen'd `levenshtein` on candidates only.
  *
  * The reference has no fuzzy matching (its cleaning ops canonicalize via
  * exact dictionary maps, `tool_call_agent.py` C11); this is the scale
  * path a wrangler needs when the dictionary is unknown.
  */
object FuzzyJoin {

  /** All strings reachable from `c` by deleting up to `maxDist` characters
    * (including `c` itself), distinct. Supported `maxDist`: 1 or 2 — the
    * neighborhood is C(len, k)-sized, so k>2 explodes faster than PassJoin
    * segment schemes would; cap it rather than invite a 1000x blow-up.
    *
    * Built from higher-order functions over `sequence()` — a per-row loop,
    * but one that stays inside Tungsten rows (no Scala UDF, no
    * serialization off the codegen path).
    */
  def deletionVariants(c: Column, maxDist: Int): Column = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion neighborhood supports maxDist 1 or 2, got $maxDist")
    // delete 0-based position i
    def del1(s: Column, i: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s)))
    // delete 0-based positions i < j in one pass (j removed "first" so the
    // offsets below are over the original string)
    def del2(s: Column, i: Column, j: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + lit(2), j - i - lit(1)),
        s.substr(j + lit(2), length(s)))

    // sequence(a, b) with a > b runs DESCENDING in Spark, so short strings
    // must gate each tier explicitly rather than rely on an empty range
    val noVariants = array().cast("array<string>")
    val self = array(c)
    val singles = when(length(c) >= 1,
      transform(sequence(lit(0), length(c) - lit(1)), i => del1(c, i)))
      .otherwise(noVariants)
    val vs =
      if (maxDist == 1) concat(self, singles)
      else {
        val doubles = when(length(c) >= 2,
          flatten(transform(sequence(lit(0), length(c) - lit(2)),
            i => transform(sequence(i + lit(1), length(c) - lit(1)),
              j => del2(c, i, j)))))
          .otherwise(noVariants)
        concat(self, singles, doubles)
      }
    // deletions collide (e.g. deleting either 'a' of "aa") — dedup so a
    // pair shares each distinct variant once
    array_distinct(vs)
  }

  /** All pairs within `df` with `levenshtein(str_a, str_b) <= maxDist`,
    * as `(id_a, id_b, str_a, str_b, dist)` with `id_a < id_b`. Exact
    * (lossless blocking + exact verify) up to the hot-bucket guard, whose
    * effect is observable via [[fuzzySelfJoinAudited]].
    */
  def fuzzySelfJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      repFactor: Int = Dedup.DefaultRepFactor): DataFrame =
    fuzzySelfJoinAudited(df, idCol, strCol, maxDist, maxBucket, repFactor)._1

  /** [[fuzzySelfJoin]] plus the [[Dedup.SkewAudit]] over variant buckets. */
  def fuzzySelfJoinAudited(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      repFactor: Int = Dedup.DefaultRepFactor): (DataFrame, Dedup.SkewAudit) = {
    val blocked = df
      .select(col(idCol), col(strCol))
      .withColumn("__v", explode(deletionVariants(col(strCol), maxDist)))
    val audit = Dedup.bucketSkewAudit(blocked, Seq("__v"), maxBucket)
    val candidates = Dedup.boundedBucketPairs(
        blocked, idCol, bucketCols = Seq("__v"), carryCols = Seq(strCol),
        maxBucket = maxBucket, repFactor = repFactor)
      // a pair shares one bucket per aligned deletion set — dedup before
      // paying the verify
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col(s"${strCol}_a")).as("str_a"),
        first(col(s"${strCol}_b")).as("str_b"))
    val verified = candidates
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .where(col("dist") <= maxDist)
    (verified, audit)
  }

  /** Two-table variant: rows of `left` matched to rows of `right` within
    * `maxDist` edits, `(left_id, right_id, left_str, right_str, dist)`.
    * Same lossless blocking; the bucket join keys left-variants against
    * right-variants, so candidate volume is bucket-local on both sides.
    */
  def fuzzyJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int): DataFrame = {
    val l = left.select(col(leftId).as("left_id"), col(leftStr).as("left_str"))
      .withColumn("__v", explode(deletionVariants(col("left_str"), maxDist)))
    val r = right.select(col(rightId).as("right_id"), col(rightStr).as("right_str"))
      .withColumn("__v", explode(deletionVariants(col("right_str"), maxDist)))
    l.join(r, "__v")
      .groupBy(col("left_id"), col("right_id"))
      .agg(first(col("left_str")).as("left_str"),
        first(col("right_str")).as("right_str"))
      .withColumn("dist", levenshtein(col("left_str"), col("right_str")))
      .where(col("dist") <= maxDist)
  }
}
