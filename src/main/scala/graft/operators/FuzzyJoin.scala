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

  /** Jaro-Winkler self-join: all pairs sharing a `prefixLen`-character
    * blocking key whose JW similarity (6dp-quantized, the house
    * convention) reaches `minSim` — as `(id_a, id_b, str_a, str_b, sim)`
    * with `id_a < id_b`. The record-linkage comparator for real names,
    * where [[fuzzySelfJoin]]'s edit-distance contract is too coarse (a
    * one-char typo in a 5-char name and in a 30-char name are the same
    * distance but very different evidence).
    *
    * Blocking is EXACT-PREFIX buckets — principled for JW specifically:
    * the Winkler term rewards shared prefixes, so the high-similarity
    * pairs a threshold ≥ ~0.9 admits overwhelmingly agree on their first
    * characters; pairs that diverge inside the prefix score low anyway.
    * The contract is therefore "prefix-blocked JW join" (the standard
    * Splink/FEBRL blocking-rule shape), NOT a lossless all-pairs JW scan
    * — and the oracle replays the same prefix-equality join, so the
    * contract is pinned, not hidden.
    *
    * Scale shape (100 TB lens): one shuffle on the prefix key, pairs
    * bucket-local via [[Dedup.boundedBucketPairs]] with the hot-bucket
    * guard (a mega-prefix degrades to O(n·repFactor) with an audit, not
    * O(n²)); the verify is the codegen'd [[graft.functions.JaroWinkler]]
    * kernel on candidates only. The threshold compares the QUANTIZED
    * value so the admit/reject decision is engine-stable.
    */
  def jwSelfJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      prefixLen: Int = 4,
      minSim: Double = 0.9,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      repFactor: Int = Dedup.DefaultRepFactor): DataFrame = {
    require(prefixLen >= 1 && minSim >= 0.0 && minSim <= 1.0)
    val blocked = df
      .select(col(idCol), col(strCol))
      .withColumn("__pfx", substring(col(strCol), 1, prefixLen))
    val candidates = Dedup.boundedBucketPairs(
      blocked, idCol, bucketCols = Seq("__pfx"), carryCols = Seq(strCol),
      maxBucket = maxBucket, repFactor = repFactor)
      // on the hot-bucket path boundedBucketPairs can emit the same
      // ordered (id_a, id_b) twice (representative-representative pairs
      // seen from both join directions) — dedup before the verify so the
      // one-row-per-pair contract holds, mirroring fuzzySelfJoin
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col(s"${strCol}_a")).as(s"${strCol}_a"),
        first(col(s"${strCol}_b")).as(s"${strCol}_b"))
    candidates
      .withColumn("sim",
        floor(graft.functions.JaroWinkler.jaroWinkler(
          col(s"${strCol}_a"), col(s"${strCol}_b")) * lit(1e6) + lit(0.5))
          / lit(1e6))
      .where(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"),
        col(s"${strCol}_a").as("str_a"), col(s"${strCol}_b").as("str_b"),
        col("sim"))
  }

  /** Entity resolution end to end: fuzzy pairs → connected components →
    * canonical representative. Pairwise edit-distance matching alone
    * under-merges (a chain a~b~c where (a,c) is 2 edits apart is ONE
    * entity but never pairs directly); closing the match graph assigns
    * every transitively-connected record the same entity id — the
    * min record id in its cluster, i.e. a deterministic canonical
    * survivor (the [[Dedup]] min-id convention).
    *
    * Output: one row per input record, `(idCol, strCol, entity_id,
    * cluster_size)`; unmatched records are their own entity of size 1.
    *
    * Scale shape: edges via the lossless deletion-neighborhood blocking
    * (never all-pairs, hot-bucket-guarded), clustering via the
    * O(diameter)-round distributed min-label propagation
    * ([[Dedup.connectedComponents]]) — match-graph diameters are small
    * (typo clusters are stars around a base form), so rounds stay low.
    */
  def resolveEntities(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 1): DataFrame = {
    val pairs = fuzzySelfJoin(df, idCol, strCol, maxDist)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val labeled = df.select(col(idCol), col(strCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col(strCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
    val sizes = labeled.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "entity_id")
      .select(col(idCol), col(strCol), col("entity_id"), col("cluster_size"))
  }

  // ---------------------------------------------------- incremental index
  /** Deletion-variant index for INCREMENTAL fuzzy dedup — the
    * edit-distance member of the rolling-crawl index family
    * ([[Dedup.LshIndex]] lexical, [[Dedup.SemIndex]] semantic,
    * fingerprints exact): short near-identical strings (titles, names,
    * normalized URLs) that a crawl re-submits with typo-level variation.
    * The index stores each string's ≤`maxDist`-deletion variants as
    * hashed buckets; blocking stays LOSSLESS under hashing (equal
    * variants hash equally — collisions only ADD candidates, and the
    * exact levenshtein verify drops them), while the stored key is a
    * fixed 8 bytes regardless of string length.
    *
    * Cost model (100 TB lens): probing a batch touches only buckets the
    * batch's own variants hash into — batch·(len+1) lookups against a
    * bucket-local join, never a scan of the indexed corpus; the
    * hot-bucket guard caps template-family buckets at `repFactor`
    * representatives. Durability follows the house epoch+sidecar lineage:
    * [[FuzzyIndex.save]] snapshots, [[FuzzyIndex.append]] with
    * `checkpointTo` logs batch-sized deltas, [[loadFuzzyIndex]] replays
    * snapshot+deltas, [[Dedup.vacuumLineage]] bounds the log.
    */
  final case class FuzzyIndex private[operators] (
      strs: DataFrame,      // (sid, str)
      variants: DataFrame,  // (id, band, bucket) — band fixed 0
      maxDist: Int) {
    def close(): Unit = {
      strs.unpersist(blocking = false)
      variants.unpersist(blocking = false)
    }

    /** Fold a batch into the index ([[Dedup.LshIndex.append]] contract):
      * one scan of the BATCH strings; the existing index is unioned,
      * never recomputed; with `checkpointTo`, the delta also lands as the
      * lineage's next epoch first. Returns a new handle owning the
      * refreshed caches — `index = index.append(...)` is the usage.
      */
    def append(batch: DataFrame, idCol: String, strCol: String,
        checkpointTo: Option[String] = None): FuzzyIndex = {
      val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val nStrs = batch.select(col(idCol).as("sid"), col(strCol).as("str"))
        .persist(mad)
      val nVar = variantBuckets(batch, idCol, strCol, maxDist)
      checkpointTo.foreach { path =>
        val dir = IndexStore.nextEpochDir(strs.sparkSession, path)
        nStrs.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
          .parquet(s"$dir/strs")
        nVar.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
          .parquet(s"$dir/variants")
        IndexStore.writeSidecar(strs.sparkSession, dir,
          s"""{"kind":"fuzzy","delta":true,"maxDist":$maxDist}""")
      }
      val strs2 = strs.unionAll(nStrs).persist(mad)
      val var2 = variants.unionAll(nVar).persist(mad)
      var2.count()
      strs2.count()
      nStrs.unpersist(blocking = false)
      strs.unpersist(blocking = false)
      variants.unpersist(blocking = false)
      FuzzyIndex(strs2, var2, maxDist)
    }

    /** Persist durably under the next `epoch=N` of `path` (sidecar last,
      * so a torn save is skipped on load; epochs never overwritten — the
      * [[Dedup.LshIndex.save]] discipline). Returns the epoch dir.
      */
    def save(path: String): String = {
      val dir = IndexStore.nextEpochDir(strs.sparkSession, path)
      strs.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/strs")
      variants.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/variants")
      IndexStore.writeSidecar(strs.sparkSession, dir,
        s"""{"kind":"fuzzy","maxDist":$maxDist}""")
      dir
    }
  }

  /** (id, band=0, bucket=hash(variant)) rows — the shared blocking step of
    * [[buildFuzzyIndex]], [[FuzzyIndex.append]] and
    * [[incrementalFuzzyDedup]]'s batch side.
    */
  private def variantBuckets(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(deletionVariants(col(strCol), maxDist)).as("__v"))
      .select(col("id"), lit(0).as("band"), xxhash64(col("__v")).as("bucket"))

  def buildFuzzyIndex(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1): FuzzyIndex = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val strs = df.select(col(idCol).as("sid"), col(strCol).as("str"))
      .persist(mad)
    val variants = variantBuckets(df, idCol, strCol, maxDist).persist(mad)
    variants.count()
    strs.count()
    FuzzyIndex(strs, variants, maxDist)
  }

  /** Reload a [[FuzzyIndex.save]] lineage: newest complete snapshot +
    * all later complete deltas, persisted and materialized exactly as
    * [[buildFuzzyIndex]] leaves them — probes against a reloaded index
    * reproduce the in-session index bit-for-bit.
    */
  def loadFuzzyIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): FuzzyIndex = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val (dirs, meta) = IndexStore.snapshotAndDeltas(spark, path, "fuzzy")
    val strs = dirs.map(d => spark.read.parquet(s"$d/strs"))
      .reduce(_ unionAll _).persist(mad)
    val variants = dirs.map(d => spark.read.parquet(s"$d/variants"))
      .reduce(_ unionAll _).persist(mad)
    variants.count()
    strs.count()
    FuzzyIndex(strs, variants, IndexStore.jsonInt(meta, "maxDist"))
  }

  /** Fuzzy-dedup a NEW batch against a persisted [[FuzzyIndex]] plus
    * itself — the [[Dedup.incrementalNearDup]] contract, edit-distance
    * edition: indexed strings are never rescanned; batch cost tracks
    * batch size and bucket collisions only. Output: one row per verified
    * relation that would DROP a batch row under greedy keep-first —
    * `(batch_id, match_id, dist, match_in_index)`; batch-vs-index keeps
    * the index row, within-batch keeps the smaller id (batch_id is the
    * larger). A resubmitted known id pairs only with OTHER rows (self
    * pairs excluded), so resubmission is a drop against the index copy,
    * not a phantom self-match. Runs eagerly; batch caches released; the
    * (small) match set returns cached, caller-owned.
    */
  def incrementalFuzzyDedup(
      batch: DataFrame,
      idCol: String,
      strCol: String,
      index: FuzzyIndex,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      repFactor: Int = Dedup.DefaultRepFactor): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bStrs = batch.select(col(idCol).as("sid"), col(strCol).as("str"))
      .persist(mad)
    val bVar = variantBuckets(batch, idCol, strCol, index.maxDist)
      .persist(mad)

    // batch -> index: guarded bucket probe, exact verify on colliders only
    val idxMatches = Dedup.boundedProbeCandidates(bVar, index.variants,
        maxBucket, repFactor)
      .where(col("batch_id") =!= col("index_id"))
      .join(bStrs.as("sa"), col("batch_id") === col("sa.sid"))
      .join(index.strs.as("sb"), col("index_id") === col("sb.sid"))
      .select(col("batch_id"), col("index_id").as("match_id"),
        levenshtein(col("sa.str"), col("sb.str")).as("dist"),
        lit(true).as("match_in_index"))
      .where(col("dist") <= index.maxDist)

    // within-batch: guarded self-join over the same buckets; larger id drops
    val blocked = batch.select(col(idCol), col(strCol))
      .withColumn("__v", explode(deletionVariants(col(strCol), index.maxDist)))
      .select(col(idCol), col(strCol), lit(0).as("band"),
        xxhash64(col("__v")).as("bucket"))
    val batchMatches = Dedup.boundedBucketPairs(blocked, idCol,
        bucketCols = Seq("band", "bucket"), carryCols = Seq(strCol),
        maxBucket = maxBucket, repFactor = repFactor)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col(s"${strCol}_a")).as("str_a"),
        first(col(s"${strCol}_b")).as("str_b"))
      .select(col("id_b").as("batch_id"), col("id_a").as("match_id"),
        levenshtein(col("str_a"), col("str_b")).as("dist"),
        lit(false).as("match_in_index"))
      .where(col("dist") <= index.maxDist)

    val out = idxMatches.unionAll(batchMatches).persist(mad)
    out.count()
    bVar.unpersist(blocking = false)
    bStrs.unpersist(blocking = false)
    out
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
