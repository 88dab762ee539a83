package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is shuffle-bounded by design —
  *  - exact dedup shuffles once on the fingerprint (map-side combined);
  *  - MinHash/SimHash candidate generation shuffles on LSH *buckets*, never
  *    all-pairs; verification joins only within buckets;
  *  - embedding near-dup buckets by random-hyperplane LSH, so the self-join
  *    is per-bucket, not N².
  * All hashing is deterministic (xxhash64 with fixed seeds), so results are
  * reproducible across runs and cluster sizes.
  */
object Dedup {

  /** Default hot-bucket guard settings for the LSH family (MinHash, SimHash,
    * hyperplane). Ordinary corpora never populate a single (band, bucket)
    * anywhere near `DefaultMaxBucket`; a real 100 TB crawl does — boilerplate
    * template families (near-identical but NOT byte-identical, so exact
    * dedup upstream doesn't collapse them) pile 10⁵–10⁶ ids into one bucket
    * and an unguarded within-bucket self-join goes quadratic on that key.
    */
  val DefaultMaxBucket: Int = 4096
  val DefaultRepFactor: Int = 8

  /** Per-run skew audit emitted by the `*Audited` variants. */
  final case class SkewAudit(oversizedBuckets: Long, maxBucketSize: Long)

  /** Candidate pairs from a bucketed frame with a hot-bucket guard.
    *
    * Buckets with ≤ `maxBucket` members self-join all-pairs (exact candidate
    * enumeration, unchanged semantics). An OVERSIZED bucket — the LSH
    * failure mode above — switches to representative verification: every
    * member pairs with the bucket's `repFactor` smallest-id members (which
    * also pair among themselves), so candidate volume is O(n·repFactor)
    * instead of O(n²) per bucket.
    *
    * Semantics under the guard: all-pairs ENUMERATION inside an oversized
    * bucket is itself quadratic OUTPUT — no engine can list it
    * sub-quadratically — so the guarded contract is the one dedup needs:
    * every member is still verified against the bucket's smallest ids,
    * hence greedy keep-first (drop the larger id of every verified pair)
    * still collapses a homogeneous template family to its minimum id.
    * Member–member pairs between non-representatives of the same oversized
    * bucket are not emitted; pairs they form in any other (small) bucket
    * still are.
    *
    * `blocked` must carry `idCol` + `bucketCols` + `carryCols`; output is
    * (id_a, id_b) with id_a < id_b plus `<c>_a`/`<c>_b` for each carry
    * column. Callers should `.distinct()` (pairs repeat across buckets).
    */
  private[graft] def boundedBucketPairs(
      blocked: DataFrame,
      idCol: String,
      bucketCols: Seq[String],
      carryCols: Seq[String],
      maxBucket: Int,
      repFactor: Int): DataFrame = {
    // Oversized-bucket detection via aggregate + anti/semi join, NOT a
    // window over the full frame: a window would shuffle AND sort every
    // (band, bucket) partition just to mark populations, while the
    // oversized list is tiny by construction (≤ rows/maxBucket entries,
    // usually zero) — AQE broadcasts it and the common no-skew path costs
    // one map-side-combined count, no sort, no extra shuffle of `blocked`.
    val oversized = blocked
      .groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBucket)
      .select(bucketCols.map(col): _*)
    val joinOn = bucketCols.map(c => col(s"l.$c") === col(s"r.$c"))

    val small = blocked.join(oversized, bucketCols, "left_anti")
    val smallPairs = small.as("l")
      .join(small.as("r"),
        joinOn.foldLeft(col(s"l.$idCol") < col(s"r.$idCol"))(_ && _))
      .select(col(s"l.$idCol").as("id_a") +: col(s"r.$idCol").as("id_b") +:
        carryCols.flatMap(c =>
          Seq(col(s"l.$c").as(s"${c}_a"), col(s"r.$c").as(s"${c}_b"))): _*)

    // row_number ranks only the big subset (the rare skew path), not the
    // whole frame
    val big = blocked.join(oversized, bucketCols, "left_semi")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(bucketCols.map(col): _*).orderBy(col(idCol))))
    val reps = big.where(col("__rn") <= repFactor)
    val la = col(s"l.$idCol") < col(s"r.$idCol")
    val bigPairs = big.as("l")
      .join(reps.as("r"),
        joinOn.foldLeft(col(s"l.$idCol") =!= col(s"r.$idCol"))(_ && _))
      .select(
        when(la, col(s"l.$idCol")).otherwise(col(s"r.$idCol")).as("id_a") +:
        when(la, col(s"r.$idCol")).otherwise(col(s"l.$idCol")).as("id_b") +:
        carryCols.flatMap(c => Seq(
          when(la, col(s"l.$c")).otherwise(col(s"r.$c")).as(s"${c}_a"),
          when(la, col(s"r.$c")).otherwise(col(s"l.$c")).as(s"${c}_b"))): _*)

    smallPairs.unionAll(bigPairs)
  }

  /** One-job skew audit over a bucketed frame: how many buckets exceeded
    * `maxBucket`, and the largest population seen.
    */
  private[graft] def bucketSkewAudit(
      blocked: DataFrame, bucketCols: Seq[String], maxBucket: Int): SkewAudit = {
    val r = blocked
      .groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum(when(col("__n") > maxBucket, 1L).otherwise(0L)).as("oversized"),
        max(col("__n")).as("mx"))
      .head()
    SkewAudit(
      if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  // ------------------------------------------------------------ exact
  /** Exact duplicate groups by normalized-content fingerprint: one row per
    * duplicated fingerprint with group size and the kept (minimum) id.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("keep_id"))
      .where(col("group_size") > 1)

  /** Exact dedup keeping the row with the minimum id per key —
    * deterministic (unlike `dropDuplicates`, whose survivor depends on
    * partition order), and correct even when ids themselves repeat (a
    * semi-join back on the id would keep BOTH copies of a duplicated id):
    * one shuffle, `min_by` the whole row ordered by (id, row).
    */
  def exactByKey(df: DataFrame, idCol: String, keyCols: Seq[Column]): DataFrame = {
    val rowStruct = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols: _*)
      .agg(min_by(rowStruct, struct(col(idCol), rowStruct)).as("__row"))
      .select(df.columns.map(c => col(s"__row.`$c`").as(c)).toIndexedSeq: _*)
  }

  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactByKey(df, idCol, Seq(fingerprint(col(textCol))))

  // ------------------------------------------------------------ MinHash + LSH
  /** MinHash signature: `numHashes` independent min-hashes over word
    * `shingleSize`-gram shingles, h_j(s) = xxhash64(j, s). Broder '97
    * estimator: P[minhash_j(A)=minhash_j(B)] = Jaccard(A,B).
    */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    signatureFromShingles(shingles(text, shingleSize), numHashes)

  /** Signature over an already-materialized shingle column — one-pass
    * codegen'd kernel (see [[graft.functions.MinHashSig]]); each shingle is
    * hashed once, the k functions are derived by cheap mixing.
    */
  def signatureFromShingles(sh: Column, numHashes: Int): Column =
    graft.functions.MinHashSig.minhash(sh, numHashes)

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline: signature → band into `bands` of `rows` hashes → explode one
    * row per (band, banded-signature-hash) → shuffle on the bucket →
    * self-join within buckets → distinct candidate pairs → verify with exact
    * shingle-set Jaccard ≥ `threshold`.
    *
    * The only all-to-all movement is the bucket shuffle; candidate
    * verification re-joins the (small) candidate-id set back to the shingle
    * sets. Output: (id_a, id_b, jaccard), id_a < id_b.
    *
    * EXECUTION CONTRACT (not lazy): this method runs a Spark job eagerly —
    * the signature/banding intermediates are persisted for the self-join,
    * the verified pair set is materialized (and persisted) so those large
    * intermediates can be released before returning. The returned DataFrame
    * is cached; the CALLER owns its lifecycle and should
    * `.unpersist()` it when done (long-lived sessions that call this
    * repeatedly without unpersisting accumulate cached outputs until LRU
    * eviction). Re-deriving the result after an eviction recomputes the
    * full lineage — correct, just slower.
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3,
      maxBucket: Int = DefaultMaxBucket,
      repFactor: Int = DefaultRepFactor): DataFrame =
    minhashLshAudited(df, idCol, textCol, threshold, numHashes, bands,
      shingleSize, maxBucket, repFactor)._1

  /** [[minhashLsh]] plus the hot-bucket [[SkewAudit]] — at crawl scale the
    * oversized count is the canary that template families are being handled
    * by representative verification rather than a quadratic join.
    */
  def minhashLshAudited(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3,
      maxBucket: Int = DefaultMaxBucket,
      repFactor: Int = DefaultRepFactor): (DataFrame, SkewAudit) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    // The shingle sets are the ONE projection of `df`: persisted first, so
    // the input (and everything upstream of it — in a pipeline, gates and
    // exact dedup) is scanned exactly once. Signatures, banding, and the
    // verify join all derive from this cached frame. (At cluster scale this
    // is the standard "materialize the shingles" step; MEMORY_AND_DISK
    // spills instead of OOMing.)
    val sets = df.select(col(idCol).as("sid"), shingles(col(textCol), shingleSize).as("sset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sigs = sets
      .select(col("sid").as("id"), signatureFromShingles(col("sset"), numHashes).as("sig"))

    // Both sides of the candidate self-join read `banded`; persist it so the
    // signature hashing runs once, not twice.
    val banded = sigs.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          xxhash64((b * rows until (b + 1) * rows).map(i => element_at(col("sig"), i + 1)): _*)
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val candidates = boundedBucketPairs(banded, "id", Seq("band", "bucket"),
        Nil, maxBucket, repFactor)
      .distinct()
    val verified = candidates
      .join(sets.as("sa"), col("id_a") === col("sa.sid"))
      .join(sets.as("sb"), col("id_b") === col("sb.sid"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sa.sset"), col("sb.sset")).as("jaccard"))
      .where(col("jaccard") >= threshold)

    // Materialize the (small: pairs above threshold) output, then release
    // the large cached intermediates — repeated calls in a long-lived
    // session must not accumulate blocks until LRU pressure. Callers may
    // unpersist the returned frame when finished with it.
    val out = verified.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    val audit = bucketSkewAudit(banded, Seq("band", "bucket"), maxBucket)
    banded.unpersist(blocking = false)
    sets.unpersist(blocking = false)
    (out, audit)
  }

  /** |A∩B| / |A∪B| on distinct-element array columns — one-pass kernel
    * (see [[graft.functions.ArrayJaccard]]).
    */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.ArrayJaccard.jaccardSim(a, b)

  // --------------------------------------------- incremental near-dup
  /** Persisted MinHash band/bucket index over a corpus — the structure a
    * rolling crawl probes so each new batch near-dedups WITHOUT rescanning
    * corpus text ([[incrementalNearDup]]; the near-dup analogue of nd1's
    * fingerprint index). Two frames: `banded` (id, band, bucket) is the
    * probe surface, `sets` (sid, sset) carries the shingle sets candidate
    * verification needs. Caller-owned handle (the [[graft.operators
    * .Similarity.IvfIndex]] contract): both frames are persisted and
    * materialized at build; `close()` releases them. In a real deployment
    * both frames live as bucketed tables (write once per index refresh,
    * bucketed by (band, bucket) and by sid — probe joins arrive
    * exchange-free); this handle is the in-session form.
    */
  final case class LshIndex private[operators] (
      sets: DataFrame,
      banded: DataFrame,
      numHashes: Int,
      bands: Int,
      shingleSize: Int) {
    def close(): Unit = {
      sets.unpersist(blocking = false)
      banded.unpersist(blocking = false)
    }

    /** Fold a batch's signatures into the index — the refresh step of the
      * rolling-crawl loop ("append survivors to the index"), previously
      * left to the caller. One scan of the BATCH text only (shingle →
      * signature → band); the existing index is unioned, never recomputed.
      * Returns a NEW handle owning the refreshed caches; the superseded
      * handle's blocks are released once the new frames materialize, so
      * `index = index.append(...)` is the intended usage. With
      * `checkpointTo` set, the batch's signatures ALSO land as a delta
      * epoch of that lineage before the in-memory union — batch-sized
      * I/O per refresh — so a crashed/restarted consumer resumes from
      * [[Dedup.loadLshIndex]] with nothing lost.
      */
    def append(batch: DataFrame, idCol: String, textCol: String,
        checkpointTo: Option[String] = None): LshIndex = {
      val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val nSets = batch.select(col(idCol).as("sid"),
          shingles(col(textCol), shingleSize).as("sset"))
        .persist(mad)
      val nBanded = bandedFromSets(nSets, numHashes, bands)
      // Durable refresh: the DELTA (this batch's signatures only) lands as
      // the next epoch of the lineage — batch-sized I/O per refresh, never
      // a full-index rewrite; [[Dedup.loadLshIndex]] replays snapshot +
      // deltas, so a restarted stream resumes from everything checkpointed.
      checkpointTo.foreach { path =>
        val dir = IndexStore.nextEpochDir(sets.sparkSession, path)
        nSets.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
          .parquet(s"$dir/sets")
        nBanded.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
          .parquet(s"$dir/banded")
        IndexStore.writeSidecar(sets.sparkSession, dir,
          s"""{"kind":"lsh","delta":true,"numHashes":$numHashes,"bands":$bands,"shingleSize":$shingleSize}""")
      }
      val sets2 = sets.unionAll(nSets).persist(mad)
      val banded2 = banded.unionAll(nBanded).persist(mad)
      banded2.count()
      sets2.count()
      nSets.unpersist(blocking = false)
      sets.unpersist(blocking = false)
      banded.unpersist(blocking = false)
      LshIndex(sets2, banded2, numHashes, bands, shingleSize)
    }

    /** Persist this index durably: write `sets` and `banded` as parquet
      * under the next `epoch=N` of `path` plus a tiny JSON sidecar with
      * the signature geometry — the cross-SESSION form of the handle (a
      * rolling crawl is a cross-session workload; an in-memory index dies
      * with the JVM and costs a full corpus re-scan to rebuild). The
      * sidecar is written LAST, so a torn save (crash mid-write) leaves an
      * epoch [[Dedup.loadLshIndex]] skips; epochs are never overwritten
      * (the [[graft.sources.Versioned]] discipline — refresh loops write a
      * new epoch per checkpoint). A metastore deployment would bucketBy
      * (band, bucket) / sid into tables instead for exchange-free probe
      * joins; plain parquet keeps the layout portable. Returns the epoch
      * dir written.
      */
    def save(path: String): String = {
      val dir = IndexStore.nextEpochDir(sets.sparkSession, path)
      sets.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/sets")
      banded.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/banded")
      IndexStore.writeSidecar(sets.sparkSession, dir,
        s"""{"kind":"lsh","numHashes":$numHashes,"bands":$bands,"shingleSize":$shingleSize}""")
      dir
    }
  }

  /** Reload an [[LshIndex.save]] lineage: the newest complete FULL
    * snapshot unioned with every complete DELTA epoch after it (the
    * refresh-loop log — [[LshIndex.append]] with `checkpointTo`). Frames
    * come back persisted and materialized exactly like [[buildLshIndex]]
    * leaves them, so probes against a reloaded index reproduce the
    * in-session index bit-for-bit.
    */
  /** Garbage-collect a durable lineage ([[LshIndex.save]],
    * [[SemIndex.save]], [[BpeStore.save]] — any epoch+sidecar store):
    * delete every epoch the corresponding load no longer replays, i.e.
    * everything before the newest complete full snapshot. Loads before and
    * after see identical data; run after a fresh full save (a compaction,
    * a periodic re-snapshot) so a long-lived rolling-crawl lineage stays
    * bounded by one snapshot plus its deltas instead of growing forever.
    * Returns the deleted epoch dirs.
    */
  def vacuumLineage(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] = {
    val done = IndexStore.completeEpochs(spark, path)
    require(done.nonEmpty, s"no complete epoch under $path")
    IndexStore.vacuum(spark, path,
      IndexStore.jsonString(done.last._2, "kind"))
  }

  def loadLshIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): LshIndex = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val (dirs, meta) = IndexStore.snapshotAndDeltas(spark, path, "lsh")
    val sets = dirs.map(d => spark.read.parquet(s"$d/sets"))
      .reduce(_ unionAll _).persist(mad)
    val banded = dirs.map(d => spark.read.parquet(s"$d/banded"))
      .reduce(_ unionAll _).persist(mad)
    banded.count()
    sets.count()
    LshIndex(sets, banded,
      IndexStore.jsonInt(meta, "numHashes"),
      IndexStore.jsonInt(meta, "bands"),
      IndexStore.jsonInt(meta, "shingleSize"))
  }

  /** Banded bucket rows of a shingle-set frame (sid, sset) — the shared
    * signature→band step of [[buildLshIndex]], [[LshIndex.append]] and
    * [[incrementalNearDup]]'s batch side.
    */
  private[operators] def bandedFromSets(
      sets: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sets
      .select(col("sid").as("id"),
        signatureFromShingles(col("sset"), numHashes).as("sig"))
      .select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * rows until (b + 1) * rows)
              .map(i => element_at(col("sig"), i + 1)): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
  }

  /** Build the [[LshIndex]]: one scan of the corpus text → shingle sets →
    * signatures → banded buckets (identical parameters later batches must
    * use, recorded on the handle).
    */
  def buildLshIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3): LshIndex = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sets = df.select(col(idCol).as("sid"),
        shingles(col(textCol), shingleSize).as("sset"))
      .persist(mad)
    val banded = bandedFromSets(sets, numHashes, bands).persist(mad)
    banded.count()
    LshIndex(sets, banded, numHashes, bands, shingleSize)
  }

  /** Candidate (batch_id, index_id) pairs from probing a banded index, with
    * the hot-bucket guard on the INDEX side: a (band, bucket) holding more
    * than `maxBucket` index members — the template-family failure mode —
    * pairs each probe row with only the bucket's `repFactor` smallest-id
    * index members, so probe cost is O(probe·repFactor) per oversized
    * bucket instead of O(probe·bucketSize). Same guarded contract as
    * [[boundedBucketPairs]]: greedy keep-first still collapses a
    * homogeneous family onto its smallest index ids.
    */
  private[graft] def boundedProbeCandidates(
      probe: DataFrame,
      index: DataFrame,
      maxBucket: Int,
      repFactor: Int): DataFrame = {
    val bucketCols = Seq("band", "bucket")
    val oversized = index.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBucket)
      .select(bucketCols.map(col): _*)
    val small = index.join(oversized, bucketCols, "left_anti")
    val smallC = probe.as("p").join(small.as("i"), bucketCols)
      .select(col("p.id").as("batch_id"), col("i.id").as("index_id"))
    val reps = index.join(oversized, bucketCols, "left_semi")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(bucketCols.map(col): _*).orderBy(col("id"))))
      .where(col("__rn") <= repFactor)
    val bigC = probe.as("p").join(reps.as("i"), bucketCols)
      .select(col("p.id").as("batch_id"), col("i.id").as("index_id"))
    smallC.unionAll(bigC).distinct()
  }

  /** Near-dedup a NEW batch against a persisted [[LshIndex]] plus itself —
    * the rolling-crawl shape: corpus text is never rescanned; batch cost
    * depends on batch size and collision counts only.
    *
    * Output: one row per verified near-dup relation that would DROP a batch
    * doc under greedy keep-first — (batch_id, match_id, jaccard,
    * match_in_index). Batch-vs-index matches keep the index doc
    * (match_in_index = true); within-batch pairs keep the smaller id
    * (batch_id is the larger). Survivors = batch ids absent from
    * `batch_id`; a production loop then appends the survivors' signatures
    * to the index.
    *
    * EXECUTION CONTRACT (the minhashLsh contract): runs eagerly, releases
    * its batch-side caches, returns the (small) match set cached —
    * caller-owned lifecycle.
    */
  def incrementalNearDup(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: LshIndex,
      threshold: Double = 0.8,
      maxBucket: Int = DefaultMaxBucket,
      repFactor: Int = DefaultRepFactor): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bSets = batch.select(col(idCol).as("sid"),
        shingles(col(textCol), index.shingleSize).as("sset"))
      .persist(mad)
    val bBanded = bandedFromSets(bSets, index.numHashes, index.bands)
      .persist(mad)

    // batch -> index: guarded probe join, verify against only colliders.
    // A doc id present in BOTH relations (a re-crawl re-submitting a known
    // id) would pair with itself at jaccard 1.0 and read as "dropped" —
    // excluded here so resubmission is a no-op, not a phantom near-dup.
    val idxMatches = boundedProbeCandidates(bBanded, index.banded,
        maxBucket, repFactor)
      .where(col("batch_id") =!= col("index_id"))
      .join(bSets.as("sa"), col("batch_id") === col("sa.sid"))
      .join(index.sets.as("sb"), col("index_id") === col("sb.sid"))
      .select(col("batch_id"), col("index_id").as("match_id"),
        jaccard(col("sa.sset"), col("sb.sset")).as("jaccard"),
        lit(true).as("match_in_index"))
      .where(col("jaccard") >= threshold)

    // within-batch: the standard guarded self-join; larger id is dropped
    val batchMatches = boundedBucketPairs(bBanded, "id", Seq("band", "bucket"),
        Nil, maxBucket, repFactor)
      .distinct()
      .join(bSets.as("sa"), col("id_a") === col("sa.sid"))
      .join(bSets.as("sb"), col("id_b") === col("sb.sid"))
      .select(col("id_b").as("batch_id"), col("id_a").as("match_id"),
        jaccard(col("sa.sset"), col("sb.sset")).as("jaccard"),
        lit(false).as("match_in_index"))
      .where(col("jaccard") >= threshold)

    val out = idxMatches.unionAll(batchMatches).persist(mad)
    out.count()
    bBanded.unpersist(blocking = false)
    bSets.unpersist(blocking = false)
    out
  }

  // ------------------------------------------------------------ n-gram Jaccard
  /** Brute-force n-gram Jaccard near-dup within explicit blocking groups
    * (e.g. same language+source). The blocking keys keep the self-join
    * per-group instead of N²; for unblocked data use [[minhashLsh]].
    * Output: (id_a, id_b, jaccard), id_a < id_b, jaccard >= threshold.
    */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int = 1,
      threshold: Double = 0.5): DataFrame = {
    val sets = df.select(
      col(idCol).as("id") +: blockCols.map(col) :+ shingles(col(textCol), n).as("sset"): _*)
    val joinCond = blockCols
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.id") < col("b.id"))(_ && _)
    sets.as("a").join(sets.as("b"), joinCond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccard(col("a.sset"), col("b.sset")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** ASYMMETRIC n-gram containment — `|A∩B| / |A|` in both directions:
    * the quote/subset detector symmetric Jaccard misses (a tweet quoted
    * inside a news article has tiny Jaccard but containment ≈ 1 from the
    * tweet's side — the aggregation/quotation case dataset curation
    * actually hunts). Same block-local join shape as [[ngramJaccard]]
    * (never all-pairs across blocks); emits pairs where EITHER direction
    * reaches `threshold`. Empty shingle sets are excluded (no NaN
    * divisions). Each containment is one IEEE division of exact set
    * sizes — bit-portable without quantization.
    */
  def ngramContainment(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int = 1,
      threshold: Double = 0.8): DataFrame = {
    // drop empty-string tokens (an empty/whitespace doc tokenizes to
    // [""] under sql split semantics) so contentless docs never pair
    val sets = df.select(
        col(idCol).as("id") +: blockCols.map(col) :+
          array_remove(shingles(col(textCol), n), "").as("sset"): _*)
      .where(size(col("sset")) > 0)
    val joinCond = blockCols
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.id") < col("b.id"))(_ && _)
    val inter = size(array_intersect(col("a.sset"), col("b.sset")))
      .cast("double")
    sets.as("a").join(sets.as("b"), joinCond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (inter / size(col("a.sset")).cast("double")).as("contain_a_in_b"),
        (inter / size(col("b.sset")).cast("double")).as("contain_b_in_a"))
      .where(greatest(col("contain_a_in_b"), col("contain_b_in_a")) >=
        threshold)
  }

  // ------------------------------------------------------ components
  /** Connected components over an undirected near-dup pair list — the
    * clustering step that closes greedy keep-first's semantic gap (a chain
    * a~b~c where (a,c) never paired directly keeps one doc PER EDGE
    * overlap, not one per family; components keep exactly one).
    *
    * Algorithm: iterative min-label propagation — every node repeatedly
    * takes the minimum label among itself and its neighbors until a fixed
    * point; converges to the component-minimum id in O(diameter)
    * synchronized rounds (the simple special case of Kiveris et al.'s
    * large-star/small-star; near-dup families are dense, so diameters are
    * small in practice). Each round is one edge⋈label join + one groupBy —
    * all distributed, nothing driver-side but the loop control and a
    * one-row convergence probe.
    *
    * Determinism: labels are ids, min is associative — the result is the
    * same whatever the partitioning, which is what lets a recursive-CTE
    * oracle replay it. If `maxIter` rounds pass without a fixed point the
    * call FAILS LOUDLY rather than returning partial labels (raise the cap
    * for graphs with genuinely long thin chains).
    *
    * (Chaining several propagation rounds into one job between probes was
    * measured and REJECTED: the deeper self-join trees re-plan slower than
    * the per-round actions they save, at every scale tried.)
    *
    * EXECUTION CONTRACT (not lazy — the minhashLsh contract): runs eagerly;
    * intermediates are released; the returned (id, component) frame is
    * cached and the caller owns its lifecycle. Nodes outside any edge are
    * not emitted (singletons are their own component by definition).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Materialize the caller's edge list ONCE (it is often an expensive
    // pair-generation plan); every derived frame below reads this cache.
    val e = edges.select(col(aCol).as("src"), col(bCol).as("dst")).persist(mad)
    e.count() // materialize BEFORE deriving: und's three scans of `e` would
              // otherwise race on the cold cache and recompute the (often
              // expensive) pair plan up to 3x within one job
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    // Undirected adjacency + one static SELF-LOOP per node: the loop carries
    // the node's own label through the neighbor-min aggregate, so each round
    // is ONE join + ONE groupBy — no second join to merge self labels back.
    // Persist is LAZY here (first round's job materializes it): all three
    // union branches read the already-materialized `e` cache, so there is
    // no recompute race to guard and no reason to pay a separate action.
    val und = e
      .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .unionAll(nodes.select(col("id").as("src"), col("id").as("dst")))
      .persist(mad)
    var labels = nodes.withColumn("label", col("id")).persist(mad)
    // Convergence witness: labels only ever DECREASE under min-propagation,
    // so the exact (decimal — overflow-proof at any id scale) label total
    // is strictly decreasing until the fixed point; an unchanged total IS
    // convergence. One cache-local aggregate per round — no join probe.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("label").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var prevSum = labelSum(labels) // also materializes the persist
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // self-loops make every node its own src, so this covers all nodes
      // and the min already includes the node's own current label
      val next = und.join(labels, und("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("label"))
        .select(col("src").as("id"), col("label"))
        .persist(mad)
      val nextSum = labelSum(next) // materializes next, then reads its cache
      // Round 1's job is what materializes `und` (off the still-warm `e`
      // cache); only once that has happened is `e` safe to release —
      // dropping it earlier would force the first round to recompute the
      // caller's pair-generation plan for each union branch of `und`.
      if (iter == 0) e.unpersist(blocking = false)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels.unpersist(blocking = false)
      labels = next
      iter += 1
    }
    und.unpersist(blocking = false)
    if (!converged) {
      labels.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph diameter exceeds the cap); raise maxIter")
    }
    labels.select(col("id"), col("label").as("component"))
  }

  // ------------------------------------------------------------ SimHash
  /** 64-bit SimHash (Charikar '02): per distinct token t with hash h(t),
    * bit i of the signature is the sign of Σ_t (h(t) bit i ? +1 : -1).
    * One-pass per-row kernel ([[graft.functions.SimHash64]]) — no explode,
    * no shuffle; the signature computation is a pure map over documents.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.SimHash64.simhash64(col(textCol)).as("simhash"))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the 4 16-bit quarters of the signature
    * (pigeonhole: any pair within Hamming distance 3 shares at least one
    * exact quarter), verify with full Hamming distance <= maxHamming.
    * Quarter buckets get the same hot-bucket guard as the MinHash path —
    * a 16-bit quarter shared by a whole template family is exactly the
    * oversized-bucket shape.
    */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = DefaultMaxBucket,
      repFactor: Int = DefaultRepFactor): DataFrame = {
    val sig = simhash(df, idCol, textCol)
    val blocked = sig.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { q =>
        struct(lit(q).as("q"),
          shiftright(col("simhash"), q * 16).bitwiseAND(lit(0xFFFFL)).as("part"))
      }: _*)).as("blk"))
      .select(col("id"), col("simhash"), col("blk.q"), col("blk.part"))
    boundedBucketPairs(blocked, "id", Seq("q", "part"), Seq("simhash"),
        maxBucket, repFactor)
      .select(col("id_a"), col("id_b"),
        hamming64(col("simhash_a"), col("simhash_b")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------------ embedding cosine
  /** Embedding-cosine near-duplicate pairs within LSH buckets:
    * random-hyperplane bucket (so same-bucket vectors are likely similar),
    * per-bucket self-join, exact cosine verify >= threshold.
    *
    * `tables` > 1 OR-amplifies recall: a pair is a candidate if it collides
    * in ANY of the `tables` independent hyperplane tables (miss probability
    * (1-(1-θ/π)^bits)^tables for angle θ), at the cost of `tables`× bucket
    * rows. Candidates are distinct'd across tables BEFORE the exact-cosine
    * verify, so each surviving pair is verified once.
    * `blockCols` optionally adds metadata blocking on top of the LSH bucket.
    */
  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      lshBits: Int = 12,
      blockCols: Seq[String] = Nil,
      tables: Int = 1,
      maxBucket: Int = DefaultMaxBucket,
      repFactor: Int = DefaultRepFactor): DataFrame = {
    import graft.functions.VecExpressions.{fdot, fnorm}
    val base = df.select(
      (col(idCol).as("id") +: col(vecCol).as("vec") +:
        fnorm(col(vecCol)).as("nrm") +: blockCols.map(col)): _*)
    val withBucket = base.select(
      (col("id") +: blockCols.map(col)) :+
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("tbl"),
            VectorFunctions.hyperplaneBucket(col("vec"), lshBits, seed = 42 + t).as("bucket"))
        }: _*)).as("tb"): _*)
      .select((col("id") +: blockCols.map(col)) :+ col("tb.tbl") :+ col("tb.bucket"): _*)
    val candidates = boundedBucketPairs(withBucket, "id",
        blockCols ++ Seq("tbl", "bucket"), Nil, maxBucket, repFactor)
      .distinct()
    val sides = base.select(col("id"), col("vec"), col("nrm"))
    val denom = col("sa.nrm") * col("sb.nrm")
    candidates
      .join(sides.as("sa"), col("id_a") === col("sa.id"))
      .join(sides.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        when(denom > 0, fdot(col("sa.vec"), col("sb.vec")) / denom)
          .otherwise(lit(null).cast("double")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  // ----------------------------------------------------------- SemDeDup
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication — k-means-cluster the unit-normalized embeddings, then
    * verify exact cosine only WITHIN clusters and greedily drop the larger
    * id of every pair at/above `threshold`. Catches semantically redundant
    * documents whose text never collides in any lexical bucket
    * (paraphrases, re-encodes, template rewrites) — the curation stage the
    * SemDeDup paper runs after lexical dedup.
    *
    * Spark shape: the clustering IS the partitioner. Unit-normalize (norm
    * once per row) → coarse k-means ([[Similarity.ivfIndex]]: deterministic
    * lowest-id init, fixed Lloyd iterations, broadcast-assign) → the verify
    * self-join is cluster-local through the same hot-bucket guard as the
    * LSH family ([[boundedBucketPairs]] with the cluster as the bucket) →
    * exact cosine on the ORIGINAL float vectors (codegen'd
    * [[graft.functions.VecExpressions.fdot]]), so keep/drop decisions are
    * bit-identical to an exact all-pairs engine on every recovered pair.
    * Never corpus-quadratic: candidate volume is Σ cluster², bounded by
    * the guard; hold per-cluster populations flat as data grows by scaling
    * `nClusters` ∝ corpus size (the paper used 50k clusters at LAION-440M
    * scale).
    *
    * Output: (id, dropped) — one row per input id; `dropped = true` iff
    * some smaller-id same-cluster vector has cosine ≥ `threshold` with it.
    *
    * EXECUTION CONTRACT (the [[minhashLsh]] contract): eager — the k-means
    * rounds run now; intermediates are released; the returned frame is
    * cached and the caller owns its lifecycle.
    */
  def semDeDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.99,
      nClusters: Int = 16,
      iterations: Int = 3,
      maxBucket: Int = DefaultMaxBucket,
      repFactor: Int = DefaultRepFactor,
      // > 0 forces every assignment pass onto the two-level route
      // ([[Similarity.ivfIndexHier]]) with this many coarse probes — the
      // build-cost lever when nClusters scales with the corpus. 0 = auto:
      // flat exact argmin below [[Similarity.HierCrossoverK]] (the d8/d8b
      // geometry at every tested SF), hierarchical with 4 probes above it
      // (the auto-geometry corpus-scaled cluster counts).
      hierNProbe: Int = 0): DataFrame = {
    import graft.functions.VecExpressions.{fdot, fnorm}
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Unit-normalize for the CLUSTERING only (cosine geometry is magnitude-
    // free, and near-dup pairs that differ in scale must still co-cluster).
    // Norm lands in its own select first: Catalyst has no let-binding, so
    // inlining fnorm into the lambda would re-walk the vector per element.
    val unit = df
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        fnorm(col(vecCol)).as("nrm"))
      .select(col("id"), transform(col("vec"), v =>
        when(col("nrm") > 0, v.cast("double") / col("nrm"))
          .otherwise(lit(0.0))).as("unit"))
    val (assigned, cents) =
      if (hierNProbe > 0 || nClusters > Similarity.HierCrossoverK)
        Similarity.ivfIndexHier(unit, "id", "unit", nClusters, iterations,
          math.max(hierNProbe, 4))
      else Similarity.ivfIndex(unit, "id", "unit", nClusters, iterations)
    // Each id sits in exactly ONE cluster (unlike multi-table LSH), so the
    // guarded pair stream is already duplicate-free — no distinct needed.
    val blocked = assigned.select(col("neighbor_id").as("id"), col("cluster"))
    val candidates = boundedBucketPairs(blocked, "id", Seq("cluster"), Nil,
      maxBucket, repFactor)
    val sides = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      fnorm(col(vecCol)).as("nrm"))
    val denom = col("sa.nrm") * col("sb.nrm")
    val drops = candidates
      .join(sides.as("sa"), col("id_a") === col("sa.id"))
      .join(sides.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_b").as("id"),
        when(denom > 0, fdot(col("sa.vec"), col("sb.vec")) / denom)
          .otherwise(lit(null).cast("double")).as("cosine"))
      .where(col("cosine") >= threshold)
      .select(col("id")).distinct()
      .withColumn("__d", lit(true))
    val out = df.select(col(idCol).as("id"))
      .join(drops, Seq("id"), "left")
      .select(col("id"), coalesce(col("__d"), lit(false)).as("dropped"))
      .persist(mad)
    out.count()
    assigned.unpersist(blocking = false)
    cents.unpersist(blocking = false)
    out
  }

  /** The SemDeDup paper geometry as a formula: clusters scale WITH the
    * corpus so per-cluster populations stay flat (Abbas et al. ran 50k
    * clusters at LAION-440M — ~9k vectors per cluster; we default tighter
    * because verify is exact cosine, quadratic per cluster). Guarded
    * verify volume is then Σ cluster² ≈ n·targetClusterSize — linear in
    * n — and the hot-bucket guard sits idle on natural data instead of
    * being the thing holding the plan up.
    */
  def autoClusters(n: Long, targetClusterSize: Int = 128): Int =
    math.max(16L, (n + targetClusterSize - 1) / targetClusterSize)
      .min(Int.MaxValue).toInt

  /** [[semDeDup]] with the cluster count derived from the corpus size
    * ([[autoClusters]]) — the production default; the fixed-`nClusters`
    * overload remains for pinned-geometry experiments and the guard-stress
    * fixtures. Costs one extra `count()` of the input.
    */
  def semDeDupAuto(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.99,
      targetClusterSize: Int = 128,
      iterations: Int = 3,
      maxBucket: Int = DefaultMaxBucket,
      repFactor: Int = DefaultRepFactor,
      hierNProbe: Int = 0): DataFrame =
    semDeDup(df, idCol, vecCol, threshold,
      autoClusters(df.count(), targetClusterSize), iterations,
      maxBucket, repFactor, hierNProbe)

  /** A persisted SemDeDup index — the semantic twin of [[LshIndex]] for the
    * rolling-crawl shape: the k-means geometry (centroid table, tiny and
    * broadcastable) plus the assigned members with their ORIGINAL float
    * vectors and norms. Batches probe it via [[incrementalSemDedup]]
    * without ever re-clustering or rescanning the corpus. Caller-owned:
    * `close()` releases the cached frames.
    */
  final case class SemIndex private[operators] (
      centroids: DataFrame,
      members: DataFrame,
      nClusters: Int,
      // The prebuilt two-level routing geometry when the cluster count is
      // above [[Similarity.HierCrossoverK]] (auto geometry at scale) — the
      // index owns it so probes and appends route map-only instead of
      // re-deriving the inner k-means per batch (a fixed ~10 s tax the
      // 100× stress exposed) or broadcasting a corpus-scaled centroid
      // table into a flat argmin.
      private[operators] val routing: Option[Similarity.CoarseRouting]) {
    def close(): Unit = {
      centroids.unpersist(blocking = false)
      members.unpersist(blocking = false)
      routing.foreach(_.close())
      // the build's init localCheckpoint rides in these plans outside the
      // cacheManager; release it now that nothing recomputes from it
      Similarity.releaseEmbeddedCheckpoints(centroids, members)
    }

    /** Fold a batch into the index — the semantic twin of
      * [[LshIndex.append]]: each batch vector unit-normalizes and joins
      * the cluster of its nearest EXISTING centroid (the geometry is
      * frozen at build time — appends never re-cluster, so append cost is
      * batch-sized and assignments of prior members never shift; rebuild
      * when drift warrants, exactly like a production ANN index). Returns
      * a new handle owning refreshed caches; the superseded handle's
      * member blocks are released once the union materializes.
      */
    def append(batch: DataFrame, idCol: String, vecCol: String,
        checkpointTo: Option[String] = None): SemIndex = {
      import graft.functions.VecExpressions.fnorm
      val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val unit = batch
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
          fnorm(col(vecCol)).as("nrm"))
        .select(col("neighbor_id"), transform(col("vec"), v =>
          when(col("nrm") > 0, v.cast("double") / col("nrm"))
            .otherwise(lit(0.0))).as("nvec"))
      val nMembers = batch
        .select(col(idCol).as("sid"), col(vecCol).as("vec"),
          fnorm(col(vecCol)).as("nrm"))
        .join(assignToIndex(unit, centroids, routing)
            .select(col("neighbor_id").as("sid"), col("cluster")),
          Seq("sid"))
        .persist(mad)
      // Durable refresh: the batch's assigned members land as a DELTA
      // epoch — the geometry is frozen at build, so deltas carry members
      // only (no centroid rewrite) and refresh I/O stays batch-sized.
      checkpointTo.foreach { path =>
        val dir = IndexStore.nextEpochDir(centroids.sparkSession, path)
        nMembers.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
          .parquet(s"$dir/members")
        IndexStore.writeSidecar(centroids.sparkSession, dir,
          s"""{"kind":"sem","delta":true,"nClusters":$nClusters}""")
      }
      val members2 = members.unionAll(nMembers).persist(mad)
      members2.count()
      nMembers.unpersist(blocking = false)
      members.unpersist(blocking = false)
      SemIndex(centroids, members2, nClusters, routing)
    }

    /** Cluster-local geometry maintenance for a long-lived index. Appends
      * freeze the geometry, so a rolling crawl concentrated in one
      * embedding region piles members into a few clusters — and every
      * future probe landing there pays a verify loop quadratic in the hot
      * cluster's population (the guard caps the blowup but recall-losing
      * truncation is the wrong steady state for an index). `compact`
      * splits each cluster whose population exceeds `maxFactor` × the
      * index-wide mean by running a deterministic 2-means over ONLY that
      * cluster's members — cluster-LOCAL work: no global re-cluster, no
      * full-corpus Lloyd rounds, cost ∝ oversized populations only. The
      * split halves take fresh cluster ids appended after `nClusters`;
      * untouched clusters keep their ids, members, and centroids
      * bit-identically.
      *
      * Determinism & probe consistency: init = the cluster's two
      * lowest-id members; assignment runs the same block-argmin kernel as
      * every other route; the STORED sub-centroids are the ones the final
      * member assignment was computed against (the [[Similarity
      * .ivfIndex]] discipline), so a probe vector identical to a member
      * routes to that member's side exactly. Split boundaries can in
      * principle separate a near-dup pair — the same approximation d8c
      * accepts at coarse-group boundaries; nd4's exact all-pairs oracle
      * pin measures it end to end.
      *
      * Returns a new handle (the [[append]] ownership contract: the
      * superseded handle's caches are released). Geometry CHANGES here, so
      * a durable lineage needs a fresh FULL [[save]] after compaction —
      * member deltas cannot express a centroid rewrite.
      */
    def compact(maxFactor: Double = 4.0, iterations: Int = 2): SemIndex = {
      val spark = centroids.sparkSession
      import graft.functions.VecExpressions.fblockArgmin
      // per-cluster populations: ≤ nClusters rows — geometry-bounded
      val sizes = members.groupBy(col("cluster"))
        .agg(count(lit(1)).as("__n")).collect()
      val totalN = sizes.map(_.getLong(1)).sum
      val mean = totalN.toDouble / math.max(1, nClusters)
      val oversized = sizes.filter(_.getLong(1) > mean * maxFactor)
        .map(_.getInt(0)).sorted
      if (oversized.isEmpty) return this
      val isOver = col("cluster").isin(oversized.map(_.asInstanceOf[Any]): _*)
      // fresh ids for side-1 halves, appended after the existing id space
      import spark.implicits._
      val newIds = broadcast(oversized.zipWithIndex
        .map { case (c, i) => (c, nClusters + i) }.toSeq
        .toDF("cluster", "__newId"))
      // localCheckpoint, not persist: every structure below embeds this
      // frame's plan (the blocks twice per round, the final relabel once),
      // and `members` itself can carry an arbitrarily deep build+append
      // lineage — truncation (the cp3 lesson) keeps each round's plan
      // bounded where a cache would let AQE's explainString alone OOM.
      val big = members.where(isOver)
        .select(col("sid"), col("cluster"),
          transform(col("vec"), v =>
            when(col("nrm") > 0, v.cast("double") / col("nrm"))
              .otherwise(lit(0.0))).as("unit"))
        .localCheckpoint()
      // (cluster, side) sub-centroid assignment via the per-cluster block
      // kernel: blocks carry ≤ 2 entries, the joined stream is one row per
      // big member, map-side only
      def assignSides(subC: DataFrame): DataFrame = {
        val blocks = broadcast(subC.groupBy(col("cluster"))
          .agg(collect_list(struct(col("side").cast("int").as("cluster"),
            col("centroid"))).as("__block")))
        big.join(blocks, Seq("cluster"))
          .select(col("sid"), col("cluster"), col("unit"),
            fblockArgmin(col("unit"), col("__block"))
              .getField("cluster").as("side"))
      }
      def recompute(assigned: DataFrame): DataFrame = assigned
        .select(col("cluster"), col("side"),
          posexplode(col("unit")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("side"), col("dim"))
        .agg(avg(col("v")).as("mv"))
        .groupBy(col("cluster"), col("side"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("pairs"))
        .select(col("cluster"), col("side"),
          transform(col("pairs"), p => p.getField("mv")).as("centroid"))
      // deterministic init: each oversized cluster's two lowest-id members
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster")).orderBy(col("sid"))
      var sub = big.withColumn("__rn", row_number().over(wIn))
        .where(col("__rn") <= 2)
        .select(col("cluster"), (col("__rn") - 1).cast("int").as("side"),
          col("unit").as("centroid"))
        .localCheckpoint()
      (1 to iterations).foreach { _ =>
        // eager localCheckpoint: truncate per round or the rounds stack
        sub = recompute(assignSides(sub)).localCheckpoint()
      }
      // final labels computed against the STORED geometry (see contract)
      val finalSides = assignSides(sub).select(col("sid"), col("side"))
      val relabel = when(col("side") === 0, col("cluster"))
        .otherwise(col("__newId")).as("cluster")
      // localCheckpoint both result frames: the new handle's plans must not
      // re-embed the superseded lineage (probes explain these trees on
      // every batch)
      val members2 = members.where(!isOver)
        .select(col("sid"), col("vec"), col("nrm"), col("cluster"))
        .unionAll(members.where(isOver)
          .join(finalSides, Seq("sid"))
          .join(newIds, Seq("cluster"))
          .select(col("sid"), col("vec"), col("nrm"), relabel))
        .localCheckpoint()
      val cents2 = centroids.where(!isOver)
        .select(col("cluster"), col("centroid"))
        .unionAll(sub.join(newIds, Seq("cluster"))
          .select(relabel, col("centroid")))
        .localCheckpoint()
      val k2 = cents2.count().toInt // a side can come back empty
      members.unpersist(blocking = false)
      centroids.unpersist(blocking = false)
      routing.foreach(_.close())
      val routing2 =
        if (k2 > Similarity.HierCrossoverK)
          Similarity.buildCoarseRouting(cents2, nProbe = 4)
        else None
      SemIndex(cents2, members2, k2, routing2)
    }

    /** Persist this index durably: centroid and member frames as parquet
      * under the next `epoch=N` of `path` plus the geometry sidecar — the
      * cross-session form ([[LshIndex.save]]'s contract: append-only
      * epochs, sidecar last, so loads only ever see complete epochs). The
      * two-level routing is NOT stored: it derives deterministically from
      * the centroid table, so [[Dedup.loadSemIndex]] rebuilds an identical
      * one — geometry parameters travel, derived structures don't.
      */
    def save(path: String): String = {
      val dir = IndexStore.nextEpochDir(centroids.sparkSession, path)
      centroids.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/centroids")
      members.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/members")
      IndexStore.writeSidecar(centroids.sparkSession, dir,
        s"""{"kind":"sem","nClusters":$nClusters}""")
      dir
    }
  }

  /** Reload the newest complete epoch of a [[SemIndex.save]] lineage.
    * Frames come back persisted and materialized exactly as
    * [[buildSemIndex]] leaves them, and the probe routing is re-derived
    * from the stored centroids (deterministic — same inner k-means, same
    * init rule — so a reloaded index assigns every batch vector to the
    * same cluster the in-session index would).
    */
  def loadSemIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): SemIndex = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val (dirs, meta) = IndexStore.snapshotAndDeltas(spark, path, "sem")
    val nClusters = IndexStore.jsonInt(meta, "nClusters")
    // centroids live only in the snapshot (frozen geometry — deltas carry
    // members only); members replay snapshot + deltas
    val cents = spark.read.parquet(s"${dirs.head}/centroids").persist()
    val members = dirs.map(d => spark.read.parquet(s"$d/members"))
      .reduce(_ unionAll _).persist(mad)
    members.count()
    cents.count()
    val routing =
      if (nClusters > Similarity.HierCrossoverK)
        Similarity.buildCoarseRouting(cents, nProbe = 4)
      else None
    SemIndex(cents, members, nClusters, routing)
  }

  /** Nearest-index-centroid assignment at whatever route the index's
    * geometry warrants: the prebuilt two-level routing when the index
    * carries one (cluster count above [[Similarity.HierCrossoverK]] — a
    * broadcast of a corpus-scaled centroid table would not fit, and flat
    * argmin is n·k work), flat broadcast argmin otherwise. Probes and
    * appends share the build's route so batch assignments reproduce what
    * the build would have assigned.
    */
  private def assignToIndex(unit: DataFrame, centroids: DataFrame,
      routing: Option[Similarity.CoarseRouting]): DataFrame =
    routing match {
      case Some(r) => Similarity.assignRouted(unit, centroids, r, nProbe = 4)
      case None    => Similarity.assign(unit, centroids)
    }

  /** Build the [[SemIndex]]: unit-normalize (the [[semDeDup]] geometry),
    * deterministic k-means — flat [[Similarity.ivfIndex]] below the
    * [[Similarity.HierCrossoverK]] crossover, two-level
    * [[Similarity.ivfIndexHier]] above it — then record each member's
    * cluster alongside its original vector: one corpus scan plus the fixed
    * Lloyd rounds; nothing here depends on future batches.
    */
  def buildSemIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int = 16,
      iterations: Int = 3): SemIndex = {
    import graft.functions.VecExpressions.fnorm
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val unit = df
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        fnorm(col(vecCol)).as("nrm"))
      .select(col("id"), transform(col("vec"), v =>
        when(col("nrm") > 0, v.cast("double") / col("nrm"))
          .otherwise(lit(0.0))).as("unit"))
    val (assigned, cents) =
      if (nClusters > Similarity.HierCrossoverK)
        Similarity.ivfIndexHier(unit, "id", "unit", nClusters, iterations,
          nProbe = 4)
      else Similarity.ivfIndex(unit, "id", "unit", nClusters, iterations)
    val members = df
      .select(col(idCol).as("sid"), col(vecCol).as("vec"),
        fnorm(col(vecCol)).as("nrm"))
      .join(assigned.select(col("neighbor_id").as("sid"), col("cluster")),
        Seq("sid"))
      .persist(mad)
    members.count()
    assigned.unpersist(blocking = false)
    // Precompute the probe-time routing once, only at the geometry where
    // the build itself routed (consistency: probes must reproduce the
    // build's assignment rule, so below the crossover they stay flat).
    val routing =
      if (nClusters > Similarity.HierCrossoverK)
        Similarity.buildCoarseRouting(cents, nProbe = 4)
      else None
    SemIndex(cents, members, nClusters, routing)
  }

  /** Semantic near-dedup of a NEW batch against a persisted [[SemIndex]]
    * plus itself — SemDeDup for the rolling crawl: the corpus is never
    * re-clustered or rescanned; batch cost depends on batch size and the
    * populations of the clusters it lands in only.
    *
    * Each batch vector unit-normalizes and assigns to its nearest INDEX
    * centroid (the same argmin rule the build used), then verifies exact
    * cosine cluster-locally: against index members through the hot-bucket
    * guard on the index side ([[boundedProbeCandidates]] with the cluster
    * as the bucket), and within-batch through [[boundedBucketPairs]].
    * Output mirrors [[incrementalNearDup]]: one row per relation that
    * drops a batch doc under greedy keep-first — (batch_id, match_id,
    * cosine, match_in_index); batch-vs-index keeps the index doc, within-
    * batch keeps the smaller id. Equal ids in batch and index pair are
    * excluded (resubmission is a no-op, not a phantom drop).
    *
    * EXECUTION CONTRACT (the [[minhashLsh]] contract): eager; batch-side
    * caches released; the (small) match set returned cached, caller-owned.
    */
  def incrementalSemDedup(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      index: SemIndex,
      threshold: Double = 0.99,
      maxBucket: Int = DefaultMaxBucket,
      repFactor: Int = DefaultRepFactor): DataFrame = {
    import graft.functions.VecExpressions.{fdot, fnorm}
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val unit = batch
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
        fnorm(col(vecCol)).as("nrm"))
      .select(col("neighbor_id"), transform(col("vec"), v =>
        when(col("nrm") > 0, v.cast("double") / col("nrm"))
          .otherwise(lit(0.0))).as("nvec"))
    val bSides = batch
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        fnorm(col(vecCol)).as("nrm"))
      .join(assignToIndex(unit, index.centroids, index.routing)
          .select(col("neighbor_id").as("id"), col("cluster")),
        Seq("id"))
      .persist(mad)

    val denom = col("sa.nrm") * col("sb.nrm")
    def cosine = when(denom > 0, fdot(col("sa.vec"), col("sb.vec")) / denom)
      .otherwise(lit(null).cast("double"))

    // batch -> index: guarded cluster-local probe (band pinned to 0 — the
    // cluster IS the bucket; one "table", unlike banded LSH)
    val idxMatches = boundedProbeCandidates(
        bSides.select(col("id"), lit(0).as("band"), col("cluster").as("bucket")),
        index.members.select(col("sid").as("id"), lit(0).as("band"),
          col("cluster").as("bucket")),
        maxBucket, repFactor)
      .where(col("batch_id") =!= col("index_id"))
      .join(bSides.as("sa"), col("batch_id") === col("sa.id"))
      .join(index.members.as("sb"), col("index_id") === col("sb.sid"))
      .select(col("batch_id"), col("index_id").as("match_id"),
        cosine.as("cosine"), lit(true).as("match_in_index"))
      .where(col("cosine") >= threshold)

    // within-batch: one cluster per id, so the guarded pair stream is
    // already duplicate-free; larger id drops
    val batchMatches = boundedBucketPairs(
        bSides.select(col("id"), col("cluster")), "id", Seq("cluster"), Nil,
        maxBucket, repFactor)
      .join(bSides.as("sa"), col("id_a") === col("sa.id"))
      .join(bSides.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_b").as("batch_id"), col("id_a").as("match_id"),
        cosine.as("cosine"), lit(false).as("match_in_index"))
      .where(col("cosine") >= threshold)

    val out = idxMatches.unionAll(batchMatches).persist(mad)
    out.count()
    bSides.unpersist(blocking = false)
    out
  }
}
