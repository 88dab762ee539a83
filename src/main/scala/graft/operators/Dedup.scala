package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
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
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .select(col("id"), signatureFromShingles(col("sh"), numHashes).as("sig"))

    // Both sides of the candidate self-join read `banded`; persist it so the
    // scan + shingling + signature pipeline runs once, not twice. (At
    // cluster scale this is the standard "materialize the signatures"
    // step; MEMORY_AND_DISK spills instead of OOMing.)
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

    val candidates = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    // joined twice (id_a side + id_b side): shingle once, reuse
    val sets = df.select(col(idCol).as("sid"), shingles(col(textCol), shingleSize).as("sset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    banded.unpersist(blocking = false)
    sets.unpersist(blocking = false)
    out
  }

  /** |A∩B| / |A∪B| on distinct-element array columns — one-pass kernel
    * (see [[graft.functions.ArrayJaccard]]).
    */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.ArrayJaccard.jaccardSim(a, b)

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
    */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = simhash(df, idCol, textCol)
    val blocked = sig.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { q =>
        struct(lit(q).as("q"),
          shiftright(col("simhash"), q * 16).bitwiseAND(lit(0xFFFFL)).as("part"))
      }: _*)).as("blk"))
      .select(col("id"), col("simhash"), col("blk.q"), col("blk.part"))
    blocked.as("l").join(blocked.as("r"),
        col("l.q") === col("r.q") && col("l.part") === col("r.part") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming64(col("l.simhash"), col("r.simhash")).as("hamming"))
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
      tables: Int = 1): DataFrame = {
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
    val joinCond = (blockCols :+ "tbl" :+ "bucket")
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.id") < col("b.id"))(_ && _)
    val candidates = withBucket.as("a").join(withBucket.as("b"), joinCond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
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
}
