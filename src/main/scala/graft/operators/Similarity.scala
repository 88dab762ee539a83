package graft.operators

import graft.functions.VecExpressions.{fdot, fnorm}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Cosine from a codegen'd dot kernel and per-row precomputed norms —
    * bit-identical to [[VectorFunctions.cosine]] (same fold order, same
    * guard) but each vector's norm is computed once per ROW instead of once
    * per PAIR, and the pair loop compiles into whole-stage codegen instead
    * of interpreted higher-order lambdas.
    */
  private def fastCosine(aVec: Column, aNorm: Column, bVec: Column, bNorm: Column): Column = {
    val denom = aNorm * bNorm
    when(denom > 0, fdot(aVec, bVec) / denom).otherwise(lit(null).cast("double"))
  }

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
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      fnorm(col(vecCol)).as("qnorm")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
        fnorm(col(vecCol)).as("nnorm"))
      .join(q, col("query_id") =!= col("neighbor_id")) // cross w/ self filter
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("qvec"), col("qnorm"), col("nvec"), col("nnorm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Bucket a corpus once for reuse across many query batches.
    *
    * OR-amplified LSH (the standard recall lever): `numTables` independent
    * hash tables of `lshBits` hyperplane bits each; a pair is a candidate if
    * it collides in ANY table. The corpus is stored `numTables` times — the
    * classical space-for-recall trade — but each copy only carries
    * (table, bucket, id, vec), and the per-table join stays bucket-local.
    */
  def bucketize(corpus: DataFrame, idCol: String, vecCol: String,
      lshBits: Int = 6, numTables: Int = 8, seed: Int = 42): DataFrame = {
    val tables = array((0 until numTables).map { tb =>
      struct(lit(tb).as("table"),
        hyperplaneBucket(col(vecCol), lshBits, seed + 1000 * tb).as("bucket"))
    }: _*)
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
        fnorm(col(vecCol)).as("nnorm"), explode(tables).as("tb"))
      .select(col("neighbor_id"), col("nvec"), col("nnorm"),
        col("tb.table"), col("tb.bucket"))
  }

  /** Approximate top-k: per table, probe the query's own bucket plus all
    * buckets at Hamming distance 1 (multi-probe LSH, Lv et al. VLDB'07),
    * union candidates across tables, exact-score, rank.
    */
  def lshTopK(
      bucketedCorpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      lshBits: Int = 6,
      numTables: Int = 8,
      seed: Int = 42): DataFrame = {
    val qTables = (0 until numTables).flatMap { tb =>
      val b = hyperplaneBucket(col(vecCol), lshBits, seed + 1000 * tb)
      (0 to lshBits).map { i =>
        val probe = if (i == 0) b else b.bitwiseXOR(shiftleft(lit(1L), i - 1))
        struct(lit(tb).as("table"), probe.as("bucket"))
      }
    }
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
          fnorm(col(vecCol)).as("qnorm"), explode(array(qTables: _*)).as("tb"))
        .select(col("query_id"), col("qvec"), col("qnorm"),
          col("tb.table"), col("tb.bucket")))
    val scored = bucketedCorpus
      .join(q, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("qvec"), col("qnorm"), col("nvec"), col("nnorm")).as("cosine"))
      .groupBy(col("query_id"), col("neighbor_id")) // dedup multi-table hits
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

  // ------------------------------------------------------------------ IVF
  /** Nearest-cluster assignment of every vector against a (small, broadcast)
    * centroid table — the matrix-kernel shape: the whole centroid table is
    * aggregated into ONE block row that rides a broadcast crossJoin, and a
    * codegen'd block-argmin kernel ([[graft.functions.FloatVecBlockArgmin]])
    * finds the nearest centroid inside a fused primitive loop. The pair
    * stream is n rows (not n·k) and the old per-id argmin SHUFFLE disappears
    * entirely — assignment is now map-only. Same distances, same
    * (d2, cluster) tie ordering → identical assignments to the exploded
    * min_by form (hash-pinned by d8/d8b/d8c/nd3).
    */
  private[graft] def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val block = cents.agg(collect_list(
      struct(col("cluster").cast("int").as("cluster"), col("centroid"))).as("__block"))
    vecs.crossJoin(broadcast(block))
      .select(col("neighbor_id"),
        graft.functions.VecExpressions.fblockArgmin(col("nvec"), col("__block"))
          .getField("cluster").as("cluster"),
        col("nvec"))
  }

  /** Two-level nearest-centroid assignment — bounds the n·k cost of flat
    * argmin when the cluster count scales with the corpus: coarse-cluster
    * the CENTROID TABLE itself (~√k coarse groups; one k·√k k-means over k
    * rows), route each vector MAP-ONLY to its `nProbe` nearest coarse
    * groups (the coarse table rides in the plan as a ~√k-entry literal
    * array — no crossJoin, no shuffle for routing), then exact argmin over
    * only the routed groups' fine centroids: the fine join is keyed on the
    * coarse group, so per-vector work is ~nProbe·√k and the argmin
    * aggregate map-side-combines back to one row per vector. Deterministic
    * throughout (deterministic inner k-means, distance-then-id tie
    * ordering). Approximate at coarse-group boundaries: a vector whose
    * true nearest fine centroid sits in an unprobed group lands in its
    * best PROBED group — for SemDeDup this only matters when a near-dup
    * pair splits across final clusters, which the exact all-pairs oracle
    * pin (d8c) measures end to end. Falls back to flat [[assign]] when k
    * is too small for two levels to pay.
    */
  private[graft] def assignHierarchical(
      vecs: DataFrame, cents: DataFrame, nProbe: Int): DataFrame =
    buildCoarseRouting(cents, nProbe) match {
      case None          => assign(vecs, cents)
      case Some(routing) => assignRouted(vecs, cents, routing, nProbe)
    }

  /** The two-level route's precomputed geometry: the ~√k coarse centroids
    * (tiny, rides in plans as a literal array) and the fine-cluster →
    * coarse-group map (k tiny rows, checkpointed). Built once per centroid
    * table — an index that is probed many times stores this alongside its
    * centroids ([[Dedup.SemIndex]]) instead of re-deriving the inner
    * k-means per probe batch.
    */
  private[graft] final case class CoarseRouting(
      coarse: Array[(Int, Seq[Double])], f2c: DataFrame) {
    def close(): Unit = f2c.unpersist(blocking = false)
  }

  /** Derive [[CoarseRouting]] for a centroid table, or None when k is too
    * small for two levels to pay (the flat-argmin regime). The inner
    * k-means runs over the k centroid ROWS (fine cluster id doubles as the
    * row id — deterministic lowest-id init like the outer build).
    */
  private[graft] def buildCoarseRouting(
      cents: DataFrame, nProbe: Int): Option[CoarseRouting] = {
    val k = cents.count()
    val coarseK = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    if (k <= 64 || coarseK.toLong * nProbe >= k) return None
    val (f2cRaw, coarseRaw) = ivfIndex(
      cents.select(col("cluster").as("neighbor_id"), col("centroid")),
      "neighbor_id", "centroid", nClusters = coarseK, iterations = 2)
    // fine-cluster -> coarse-group map: k tiny rows; localCheckpoint so
    // each outer Lloyd round's plan stays bounded (the cp3 lesson: plan
    // trees, not just recompute, are what stack across iterations)
    val f2c = f2cRaw
      .select(col("neighbor_id").as("cluster"), col("cluster").as("__cg"))
      .localCheckpoint()
    val coarseRows = coarseRaw.select(col("cluster"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    f2cRaw.unpersist(blocking = false)
    coarseRaw.unpersist(blocking = false)
    Some(CoarseRouting(coarseRows, f2c))
  }

  /** Two-level assignment against a prebuilt [[CoarseRouting]]: map-only
    * routing to the nProbe nearest coarse groups (the coarse table rides
    * in the plan as a ~√k-entry literal array — no crossJoin, no shuffle
    * for routing), then exact argmin over only the routed groups' fine
    * centroids (~nProbe·√k per vector; the aggregate map-side-combines
    * back to one row per vector). Deterministic; approximate only at
    * coarse-group boundaries — see [[assignHierarchical]]'s contract.
    */
  private[graft] def assignRouted(
      vecs: DataFrame, cents: DataFrame, routing: CoarseRouting,
      nProbe: Int): DataFrame = {
    val coarseLit = array(routing.coarse.map { case (cg, cent) =>
      struct(typedLit(cent).as("cent"), lit(cg).as("cg"))
    }.toIndexedSeq: _*)
    // map-only routing: distances to every coarse centroid in one
    // projection, sort by (d2, cg), take the nProbe nearest groups
    val dists = transform(coarseLit, c => struct(
      graft.functions.VecExpressions.fdistSq(col("nvec"), c.getField("cent"))
        .as("d2"),
      c.getField("cg").as("cg")))
    val routed = vecs.select(col("neighbor_id"), col("nvec"),
        explode(slice(array_sort(dists), 1, nProbe)).as("r"))
      .select(col("neighbor_id"), col("nvec"), col("r.cg").as("__cg"))
    // exact argmin over the routed groups' fine centroids only, in the
    // matrix-kernel shape: each coarse group's ~√k fine centroids are
    // aggregated into one BLOCK row, so the joined stream is n·nProbe rows
    // (not n·nProbe·√k) and the per-row block-argmin kernel does the √k·dim
    // flops in a fused codegen loop. Each fine cluster belongs to exactly
    // one group, so blocks partition the centroids and the cross-group
    // min_by (d2, cluster) ordering reproduces the global argmin exactly.
    val fineBlocks = cents.join(routing.f2c, Seq("cluster"))
      .groupBy(col("__cg"))
      .agg(collect_list(
        struct(col("cluster").cast("int").as("cluster"), col("centroid"))).as("__block"))
    routed.join(fineBlocks, Seq("__cg"))
      .select(col("neighbor_id"), col("nvec"),
        graft.functions.VecExpressions.fblockArgmin(col("nvec"), col("__block")).as("m"))
      .select(col("neighbor_id"), col("nvec"),
        col("m.d2").as("d2"), col("m.cluster").as("cluster"))
      .groupBy(col("neighbor_id"))
      .agg(min_by(struct(col("cluster"), col("nvec")),
        struct(col("d2"), col("cluster"))).as("m"))
      .select(col("neighbor_id"), col("m.cluster").as("cluster"),
        col("m.nvec").as("nvec"))
  }

  /** Build an IVF index: Lloyd's k-means with deterministic init (the
    * `nClusters` lowest-id vectors) and a fixed iteration count — each
    * iteration is one broadcast-assign pass plus one centroid reduce,
    * the textbook distributed k-means shape. Returns (assignedCorpus,
    * centroids): the corpus partitioned by coarse cluster, ready for
    * [[ivfTopK]] probes; reusable across query batches.
    */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int = 16,
      iterations: Int = 3): (DataFrame, DataFrame) =
    ivfIndexCore(corpus, idCol, vecCol, nClusters, iterations, assign)

  /** [[ivfIndex]] with TWO-LEVEL (hierarchical) assignment in every Lloyd
    * round and the final pass — the build-cost lever for cluster counts
    * that scale with the corpus ([[Dedup.autoClusters]]): flat argmin is
    * n·k work per round, and with k = n/targetClusterSize that grows
    * ~n²/target; the hierarchical route costs ~n·(1+nProbe)·√k
    * ([[assignHierarchical]]). Assignment is approximate at coarse-group
    * boundaries — for SemDeDup that only matters when a near-dup PAIR
    * splits across groups, which d8c's exact all-pairs oracle pin
    * measures directly.
    */
  def ivfIndexHier(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int = 16,
      iterations: Int = 3,
      nProbe: Int = 4): (DataFrame, DataFrame) =
    ivfIndexCore(corpus, idCol, vecCol, nClusters, iterations,
      (v, c) => assignHierarchical(v, c, nProbe))

  /** The flat-vs-hierarchical assignment crossover: below this cluster
    * count the flat broadcast argmin wins (two-level routing has a fixed
    * inner-k-means cost); above it the ~n·√k hier route wins and keeps
    * winning as k grows with the corpus (PERF.md: measured near k≈160 at
    * the 100× stress geometry). [[Dedup]]'s auto-geometry entry points use
    * this to pick the build path.
    */
  private[graft] val HierCrossoverK = 160

  /** The k lowest-id rows of `vecs`, renumbered 0..k-1 in id order, as a
    * (cluster, centroid) frame — the deterministic k-means init, derived
    * IN-ENGINE by the chunked-rank decomposition (per-chunk counts → tiny
    * running-offset window → within-chunk row_number): under auto geometry
    * k grows with the corpus (~n/128), so a driver-side
    * `limit(k).collect()` would haul a corpus-proportional multi-GB init
    * through the driver. Chunk = id >> 16 (order-aligned; arithmetic shift
    * floors negatives correctly), so the offset window runs over
    * ~idRange/65536 tiny count rows and each within-chunk window holds at
    * most 65536 rows — no corpus-sized single task anywhere. Membership
    * and numbering are identical to the collect form (same k smallest ids,
    * same id order), so downstream hashes do not move.
    */
  private def initCentroids(vecs: DataFrame, nClusters: Int): DataFrame = {
    val withChunk = vecs.select(col("neighbor_id"), col("nvec"),
      shiftright(col("neighbor_id").cast("long"), 16).as("__chunk"))
    val counts = withChunk.groupBy(col("__chunk")).agg(count(lit(1)).as("__n"))
    val wC = Window.orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wC), lit(0L)))
      .where(col("__off") < nClusters) // only chunks reaching into the k smallest
      .select(col("__chunk"), col("__off"))
    val wIn = Window.partitionBy(col("__chunk")).orderBy(col("neighbor_id"))
    withChunk.join(broadcast(offsets), Seq("__chunk"))
      .withColumn("__rk", row_number().over(wIn) + col("__off"))
      .where(col("__rk") <= nClusters)
      .select((col("__rk") - 1).cast("int").as("cluster"),
        col("nvec").as("centroid"))
  }

  private def ivfIndexCore(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      iterations: Int,
      assignFn: (DataFrame, DataFrame) => DataFrame): (DataFrame, DataFrame) = {
    // The point set feeds EVERY Lloyd iteration plus the final assign —
    // cache it once instead of re-scanning (and re-projecting) the corpus
    // per iteration; released below once the final assignment is
    // materialized (not before: `assigned` derives from it).
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
        transform(col(vecCol), _.cast("double")).as("nvec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Deterministic init: the nClusters lowest-id vectors, renumbered 0..k-1
    // in id order — in-engine (no corpus-proportional driver collect); the
    // non-numeric-id fallback keeps the old tiny-k collect path for callers
    // whose ids don't shift (every registry/production id is integral).
    val spark = corpus.sparkSession
    import spark.implicits._
    val idIsIntegral = vecs.schema("neighbor_id").dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    var cents =
      if (idIsIntegral) initCentroids(vecs, nClusters)
      else vecs.orderBy(col("neighbor_id")).limit(nClusters)
        .select(col("nvec")).collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](0)) }
        .toSeq.toDF("cluster", "centroid")
    // Eager localCheckpoint, not persist: every Lloyd round's plan EMBEDS
    // the init's plan, and the in-engine derivation is a real subtree
    // (windows + join over the corpus) where the old local-relation init
    // was a leaf — without truncation the iteration plans stack it
    // multiplicatively (the cp3 lesson; an un-truncated run OOMed in AQE's
    // explainString before touching any data).
    cents = cents.localCheckpoint()
    (1 to iterations).foreach { _ =>
      val assigned = assignFn(vecs, cents)
      val prev = cents
      cents = centroids(assigned, "cluster", "nvec")
        .select(col("cluster").cast("int").as("cluster"), col("centroid"))
      cents = cents.persist()
      cents.count() // materialize: cut the lineage so iterations don't stack
      prev.unpersist(blocking = false) // release the superseded iteration's blocks
    }
    val assigned = assignFn(vecs, cents)
      .withColumn("nnorm", graft.functions.VecExpressions.fnorm(col("nvec")))
      .persist()
    assigned.count() // materialize BEFORE dropping the point cache it reads
    vecs.unpersist(blocking = false)
    (assigned, cents)
  }

  /** IVF approximate top-k: route each query to its `nProbe` nearest
    * centroids, score only vectors assigned to those clusters. The corpus
    * side touches ~nProbe/nClusters of the data per query — the coarse-
    * quantization scale path complementary to the LSH route.
    */
  def ivfTopK(
      assignedCorpus: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qvec"))
    val routed = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qvec"), col("cluster"),
        graft.functions.VecExpressions.fdistSq(col("qvec"), col("centroid")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2"), col("cluster"))))
      .where(col("rk") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cluster"))
    val scored = broadcast(routed.withColumn("qnorm",
        graft.functions.VecExpressions.fnorm(col("qvec"))))
      .join(assignedCorpus, Seq("cluster"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("qvec"), col("qnorm"), col("nvec"), col("nnorm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** [[ivfTopK]] with two-level QUERY routing — the probe-side twin of
    * [[assignRouted]] for corpus-scaled cluster counts. The flat route
    * crossJoins every query against the whole k-row broadcast centroid
    * table (|Q|·k routing rows, and a corpus-scaled broadcast once k grows
    * ∝ corpus under auto geometry); here each query routes MAP-ONLY to its
    * `coarseProbe` nearest coarse groups via the routing's ~√k-entry
    * literal array, the fine top-`nProbe` window runs over only the routed
    * groups' ~coarseProbe·√k fine centroids, and scoring proceeds
    * cluster-locally exactly as in [[ivfTopK]]. Approximate at coarse
    * boundaries (the d8c/assignRouted contract): a fine cluster inside an
    * unprobed group cannot be selected — the s3b recall gate measures that
    * effect against the exact brute-force baseline end to end.
    */
  def ivfTopKHier(
      assignedCorpus: DataFrame,
      cents: DataFrame,
      routing: CoarseRouting,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbe: Int = 4,
      coarseProbe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qvec"))
    val coarseLit = array(routing.coarse.map { case (cg, cent) =>
      struct(typedLit(cent).as("cent"), lit(cg).as("cg"))
    }.toIndexedSeq: _*)
    val dists = transform(coarseLit, c => struct(
      graft.functions.VecExpressions.fdistSq(col("qvec"), c.getField("cent"))
        .as("d2"),
      c.getField("cg").as("cg")))
    val routedQ = q.select(col("query_id"), col("qvec"),
        explode(slice(array_sort(dists), 1, coarseProbe)).as("r"))
      .select(col("query_id"), col("qvec"), col("r.cg").as("__cg"))
    val fine = cents.join(routing.f2c, Seq("cluster"))
    val sel = routedQ.join(fine, Seq("__cg"))
      .select(col("query_id"), col("qvec"), col("cluster"),
        graft.functions.VecExpressions.fdistSq(col("qvec"), col("centroid")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2"), col("cluster"))))
      .where(col("rk") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cluster"))
    val scored = broadcast(sel.withColumn("qnorm",
        graft.functions.VecExpressions.fnorm(col("qvec"))))
      .join(assignedCorpus, Seq("cluster"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("qvec"), col("qnorm"), col("nvec"), col("nnorm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // ------------------------------------------------- caller-owned handles
  /** An ANN index a library caller builds once, probes many times, and
    * releases explicitly — the cached corpus structures are owned by the
    * handle, not hidden in a session-lifetime global. `close()` drops the
    * persisted blocks; the handle must not be probed afterwards (the lazy
    * lineage would silently rebuild the index per query).
    */
  sealed trait AnnIndex extends AutoCloseable {
    /** Approximate top-k for a query batch; probe cost is index-local
      * (buckets or nProbe clusters), never a full corpus scan.
      */
    def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int = 10): DataFrame
  }

  /** OR-amplified hyperplane-LSH index: the bucketized corpus is persisted
    * once and every probe batch joins bucket-locally against it.
    */
  final case class LshIndex private[Similarity] (
      bucketed: DataFrame, idCol: String, vecCol: String,
      lshBits: Int, numTables: Int, seed: Int) extends AnnIndex {
    def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int = 10): DataFrame =
      lshTopK(bucketed, queries, idCol, vecCol, k, lshBits, numTables, seed)
    override def close(): Unit = bucketed.unpersist(blocking = false)
  }

  def buildLshIndex(corpus: DataFrame, idCol: String, vecCol: String,
      lshBits: Int = 6, numTables: Int = 8, seed: Int = 42): LshIndex = {
    val b = bucketize(corpus, idCol, vecCol, lshBits, numTables, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    b.count() // materialize: probes must reuse blocks, not re-bucketize
    LshIndex(b, idCol, vecCol, lshBits, numTables, seed)
  }

  /** IVF (coarse k-means) index: assigned corpus + centroid table, both
    * persisted by [[ivfIndex]]; probes route through nProbe clusters.
    */
  final case class IvfIndex private[Similarity] (
      assigned: DataFrame, cents: DataFrame, nProbe: Int) extends AnnIndex {
    def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int = 10): DataFrame =
      ivfTopK(assigned, cents, queries, idCol, vecCol, k, nProbe)
    override def close(): Unit = {
      assigned.unpersist(blocking = false)
      cents.unpersist(blocking = false)
      // the build's init localCheckpoint rides in these plans and sits
      // OUTSIDE the cacheManager — release it deterministically now that
      // nothing can recompute from it (mid-build it must stay: an evicted
      // persisted frame recomputes THROUGH the truncated lineage)
      releaseEmbeddedCheckpoints(assigned, cents)
    }
  }

  /** Unpersist every localCheckpoint RDD embedded in the given frames'
    * plans — close()-time hygiene for handles whose build used plan
    * truncation (see [[org.apache.spark.sql.GraftSqlBridge
    * .unpersistLocalCheckpoint]]).
    */
  private[operators] def releaseEmbeddedCheckpoints(frames: DataFrame*): Unit =
    frames.foreach(org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint)

  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, iterations: Int = 3, nProbe: Int = 4): IvfIndex = {
    val (assigned, cents) = ivfIndex(corpus, idCol, vecCol, nClusters, iterations)
    IvfIndex(assigned, cents, nProbe)
  }

  /** Two-level IVF index for corpus-scaled cluster counts: hierarchical
    * assignment in the build ([[ivfIndexHier]]) AND in every probe
    * ([[ivfTopKHier]]) — neither side ever broadcasts the corpus-scaled
    * centroid table or streams |rows|·k routing pairs. The coarse routing
    * is built once and owned by the handle (the [[graft.operators.Dedup
    * .SemIndex]] discipline).
    */
  final case class HierIvfIndex private[Similarity] (
      assigned: DataFrame, cents: DataFrame, routing: CoarseRouting,
      nProbe: Int, coarseProbe: Int) extends AnnIndex {
    def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int = 10): DataFrame =
      ivfTopKHier(assigned, cents, routing, queries, idCol, vecCol,
        k, nProbe, coarseProbe)
    override def close(): Unit = {
      assigned.unpersist(blocking = false)
      cents.unpersist(blocking = false)
      routing.close()
      releaseEmbeddedCheckpoints(assigned, cents)
    }
  }

  def buildHierIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, iterations: Int = 3, nProbe: Int = 8,
      coarseProbe: Int = 4,
      // the BUILD's assignment coarse-probe width — its own knob because
      // widening the QUERY route should not silently re-shape the index
      assignProbe: Int = 4): HierIvfIndex = {
    require(nClusters > 64,
      s"two-level geometry needs nClusters > 64 (got $nClusters); " +
        "use buildIvfIndex below the crossover")
    val (assigned, cents) =
      ivfIndexHier(corpus, idCol, vecCol, nClusters, iterations, assignProbe)
    val routing = buildCoarseRouting(cents, coarseProbe).getOrElse(
      throw new IllegalStateException(
        s"coarse routing degenerate for nClusters=$nClusters"))
    HierIvfIndex(assigned, cents, routing, nProbe, coarseProbe)
  }

  // ------------------------------------------------------ int8 quantization
  /** Int8-quantize float embeddings with a per-vector max-abs scale — the
    * scalar-quantization memory lever of IVF-SQ systems (4× smaller than
    * float32; relative per-component error ≤ 1/254). Map-only: output
    * (idCol, amax, q: array<long> in [-127, 127]). Every step is a
    * left-associated exact IEEE op (`floor(v / amax * 127 + 0.5)` on the
    * float widened to double), so an independent engine replays the
    * quantized codes bit-for-bit — qz1's oracle does.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val amax = array_max(transform(col(vecCol), v => abs(v.cast("double"))))
    df.select(col(idCol), amax.as("amax"), col(vecCol).as("__v"))
      .select(col(idCol), col("amax"),
        transform(col("__v"), v =>
          when(col("amax") > 0,
            floor(v.cast("double") / col("amax") * lit(127.0) + lit(0.5))
              .cast("long"))
            .otherwise(lit(0L))).as("q"))
  }

  /** Reconstruct float vectors from [[quantizeInt8]] output
    * (`q / 127 * amax`) — the form ANN kernels consume; feeding these to
    * [[bruteForceTopK]]/[[lshTopK]] measures end-to-end quantization
    * recall (the s4 gate).
    */
  def dequantizeInt8(qdf: DataFrame, idCol: String, outCol: String = "vec"): DataFrame =
    qdf.select(col(idCol),
      transform(col("q"), q =>
        (q.cast("double") / lit(127.0) * col("amax")).cast("float")).as(outCol))

  // ------------------------------------------------- semantic decontamination
  /** Embedding-level benchmark decontamination: report every corpus vector
    * whose cosine to ANY benchmark vector reaches `threshold` — the
    * semantic sibling of the n-gram decontamination (dc1/dc2) that catches
    * paraphrased benchmark leakage exact n-grams miss.
    *
    * Output: (idCol, matched_bench_id = smallest matching benchmark id,
    * n_matches). Scale shape: eval suites are small (10⁴–10⁶ vectors) while
    * the corpus is the 100 TB side, so the benchmark is `broadcast` and the
    * whole check is one map-side scan of the corpus — no shuffle, no
    * corpus-side index. The pair loop is the codegen'd [[fdot]]/[[fnorm]]
    * kernel with per-row (not per-pair) norms.
    */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // The benchmark rides as ONE block row (id, vec, norm per entry) and a
    // codegen'd threshold-cosine scan ([[graft.functions
    // .FloatVecBlockCosineMatch]]) counts matches + tracks the min matching
    // id per corpus row — the whole check is now a map-only projection:
    // no n·|bench| nested-loop pair stream, no groupBy shuffle. Arithmetic
    // is the fastCosine contract verbatim (per-row norm fold, denom > 0
    // guard, >= threshold), so the dc3 oracle hashes are unchanged.
    val block = broadcast(bench.agg(collect_list(struct(
      col(idCol).cast("long").as("bid"), col(vecCol).as("bvec"),
      fnorm(col(vecCol)).as("bnorm"))).as("__block")))
    corpus.select(col(idCol), col(vecCol).as("__cvec"))
      .crossJoin(block)
      .select(col(idCol),
        graft.functions.VecExpressions
          .fblockCosineMatch(col("__cvec"), col("__block"), threshold).as("m"))
      .where(col("m").isNotNull)
      .select(col(idCol), col("m.matched_bench_id").as("matched_bench_id"),
        col("m.n_matches").as("n_matches"))
  }

  /** The filtering companion of [[semanticDecontaminate]]: corpus rows NOT
    * flagged (left-anti join on the report's id — report rows are already
    * distinct per id, so this is a bounded-size anti side).
    */
  def semanticDecontaminated(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame =
    corpus.join(semanticDecontaminate(corpus, bench, idCol, vecCol, threshold)
      .select(col(idCol)), Seq(idCol), "left_anti")

  // --------------------------------------------- random sign projection (JL)
  /** Deterministic ±1 sign matrix for [[signProject]]: sign(k, j) follows
    * the first hex digit of md5("salt:k:j") — a fixed public function, so
    * every engine (and the DuckDB oracle) derives the identical matrix with
    * no RNG state to ship. Achlioptas-style database-friendly
    * Johnson–Lindenstrauss: E[p·q] preserves inner products at 1/√outDims
    * distortion without a dense Gaussian matrix.
    */
  def rpSigns(outDims: Int, inDims: Int, salt: String = "rp"): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDims, inDims) { (k, j) =>
      val h = md.digest(s"$salt:$k:$j".getBytes("UTF-8"))
      md.reset()
      // first hex digit < '8' ⇔ top bit of the first byte is 0
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
  }

  /** Project `vecCol` (length `inDims`) onto `outDims` sign vectors:
    * out[k] = Σⱼ sign(k,j)·v[j] as a first-term-seeded sequential fold —
    * bit-identical to the oracle's unrolled `(s0)·v[1] + (s1)·v[2] + …`
    * (the rp1 contract). Map-only and codegen'd via
    * [[graft.functions.FloatVecWeightedSum]]: one 4-line LOOP per output
    * dim, replacing the former 1024-node unrolled fold whose single
    * generated method blew janino's 64 KB limit and silently dropped the
    * projection to interpreted evaluation (the once-per-Verify "Code
    * grows beyond 64 KB" warning, root-caused to this site in round 11).
    * The dimensionality-reduction step that makes a 100 TB ANN candidate
    * scan 4× cheaper in bandwidth and FLOPs before the exact re-rank.
    */
  def signProject(df: DataFrame, idCol: String, vecCol: String,
      outDims: Int = 16, inDims: Int = 64, salt: String = "rp",
      outCol: String = "proj"): DataFrame = {
    val signs = rpSigns(outDims, inDims, salt)
    val proj = array(signs.map { row =>
      graft.functions.VecExpressions.fweightedSum(lit(row), col(vecCol))
    }.toIndexedSeq: _*)
    df.select(col(idCol), proj.as(outCol))
  }

  /** Approximate top-k via sign projection + exact re-rank: rank the corpus
    * by cosine in the `outDims`-d projected space, keep the top `candidates`
    * per query, then re-rank just those with exact full-dimension cosine.
    * The projected pass reads outDims/inDims of the bytes; the exact pass
    * touches only `candidates` rows per query — the classic
    * filter-then-refine ANN shape.
    */
  def rpTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, candidates: Int = 50,
      outDims: Int = 16, inDims: Int = 64, salt: String = "rp"): DataFrame = {
    val pc = signProject(corpus, idCol, vecCol, outDims, inDims, salt)
      .withColumnRenamed(idCol, "neighbor_id").withColumnRenamed("proj", "__nproj")
    val pq = broadcast(signProject(queries, idCol, vecCol, outDims, inDims, salt)
      .withColumnRenamed(idCol, "query_id").withColumnRenamed("proj", "__qproj")
      .withColumn("__qpnorm", fnorm(col("__qproj"))))
    val scored = pc.withColumn("__npnorm", fnorm(col("__nproj")))
      .join(pq, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("__qproj"), col("__qpnorm"), col("__nproj"), col("__npnorm"))
          .as("__pcos"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("__pcos").desc, col("neighbor_id").asc)
    val cand = scored.withColumn("__crank", row_number().over(wCand))
      .where(col("__crank") <= candidates)
      .select(col("query_id"), col("neighbor_id"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__nvec"),
      fnorm(col(vecCol)).as("__nnorm"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"),
      fnorm(col(vecCol)).as("__qnorm")))
    val exact = cand.join(cv, "neighbor_id").join(qv, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("__qvec"), col("__qnorm"), col("__nvec"), col("__nnorm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // ------------------------------------------------- product quantization
  /** Trained product-quantization codebooks (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    * space split into `m` subspaces of `subDim` dims, each with its own
    * `ks`-entry k-means codebook. A 64-dim float vector compresses to m
    * one-byte codes — 32× — and query scoring becomes table lookups
    * (ADC: asymmetric distance computation) instead of float dot products.
    */
  final case class PqModel private[Similarity] (
      m: Int, subDim: Int, ks: Int,
      codebook: DataFrame /* (sub, cluster, centroid) */) {
    def close(): Unit = {
      codebook.unpersist(blocking = false)
      releaseEmbeddedCheckpoints(codebook)
    }

    /** Persist to the durable-index lineage layout ([[graft.operators
      * .IndexStore]]: `path/epoch=N/` + sidecar written last, append-only)
      * — the codebook is the whole model (codes are corpus data the caller
      * stores like any table), geometry travels in the sidecar. A trained
      * PQ model is a session-spanning artifact exactly like the
      * LshIndex/SemIndex/BPE stores: every crawl batch must encode with
      * the SAME codewords or its codes are meaningless against the
      * existing corpus.
      */
    def save(path: String): String = {
      val dir = IndexStore.nextEpochDir(codebook.sparkSession, path)
      codebook.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$dir/codebook")
      IndexStore.writeSidecar(codebook.sparkSession, dir,
        s"""{"kind":"pq","m":$m,"subDim":$subDim,"ks":$ks}""")
      dir
    }
  }

  /** Reload the newest complete epoch of a [[PqModel.save]] lineage —
    * codebook persisted and materialized as [[trainPq]] leaves it, so
    * encode/query paths behave identically to the in-session model.
    */
  def loadPqModel(spark: org.apache.spark.sql.SparkSession,
      path: String): PqModel = {
    val (dirs, meta) = IndexStore.snapshotAndDeltas(spark, path, "pq")
    val book = spark.read.parquet(s"${dirs.head}/codebook").persist()
    book.count()
    PqModel(IndexStore.jsonInt(meta, "m"), IndexStore.jsonInt(meta, "subDim"),
      IndexStore.jsonInt(meta, "ks"), book)
  }

  /** `(id, sub, svec)` — each vector exploded into its m subvectors,
    * element type widened to double. Map-only.
    */
  private def pqSubVectors(df: DataFrame, idCol: String, vecCol: String,
      outId: String, m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as(outId),
      posexplode(array((0 until m).map(j =>
        transform(slice(col(vecCol), j * subDim + 1, subDim),
          _.cast("double"))): _*)).as(Seq("sub", "svec")))

  /** One block row per subspace: the codebook sorted by cluster id, in the
    * [[graft.functions.FloatVecBlockArgmin]] layout.
    */
  private def pqBlocks(codebook: DataFrame): DataFrame =
    codebook.groupBy(col("sub"))
      .agg(sort_array(collect_list(struct(
        col("cluster").cast("int").as("cluster"), col("centroid")))).as("block"))

  /** Nearest-codeword assignment of every subvector — the m-way analogue of
    * [[assign]]: the per-subspace block rides a broadcast join on `sub`
    * and the codegen'd squared-L2 block argmin picks the code map-only.
    */
  private def pqAssign(sv: DataFrame, codebook: DataFrame): DataFrame =
    sv.join(broadcast(pqBlocks(codebook)), "sub")
      .select(col(sv.columns.head), col("sub"), col("svec"),
        graft.functions.VecExpressions.fblockArgmin(col("svec"), col("block"))
          .getField("cluster").as("cluster"))

  /** Train PQ codebooks by per-subspace Lloyd iterations. Deterministic
    * init: the subvectors of the `ks` lowest-id vectors (a CONSTANT-size
    * `limit(ks)` collect — ks is 16-256 regardless of corpus size, so this
    * is corpus-independent, unlike the auto-geometry init this engine
    * distributes). Assignment is the block-argmin kernel; new codewords
    * are per-(sub, cluster) means through the one exact [[centroids]]
    * aggregation (subspaces share the shuffle via a combined key). Empty
    * codewords die (standard Lloyd); codes stay consistent because the
    * codebook frame is the single source of truth.
    */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ks: Int = 16, iterations: Int = 2,
      inDims: Int = 64): PqModel = {
    require(inDims % m == 0, s"inDims $inDims not divisible by m $m")
    val subDim = inDims / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val sv = pqSubVectors(corpus, idCol, vecCol, "neighbor_id", m, subDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val seed = corpus.orderBy(col(idCol)).limit(ks)
      .select(transform(col(vecCol), _.cast("double")).as("v")).collect()
      .map(_.getSeq[Double](0))
    var book = seed.zipWithIndex.flatMap { case (v, i) =>
      (0 until m).map(j => (j, i, v.slice(j * subDim, (j + 1) * subDim)))
    }.toSeq.toDF("sub", "cluster", "centroid")

    (1 to iterations).foreach { _ =>
      val assigned = pqAssign(sv, book)
        .withColumn("__sc", col("sub") * lit(ks) + col("cluster"))
      val prev = book
      book = centroids(assigned, "__sc", "svec")
        .select((col("cluster") / ks).cast("int").as("sub"),
          pmod(col("cluster"), lit(ks)).cast("int").as("cluster"),
          col("centroid"))
        // tiny (≤ m·ks rows): truncate lineage so rounds don't stack plans
        .localCheckpoint()
      // the EAGER checkpoint above no longer references prev's plan, so
      // the superseded round's checkpoint RDD can release immediately
      releaseEmbeddedCheckpoints(prev)
    }
    val out = book.persist()
    out.count()
    sv.unpersist(blocking = false)
    PqModel(m, subDim, ks, out)
  }

  /** Encode the corpus: `(neighbor_id, codes array<int>)`, codes ordered by
    * subspace. One pass through the block-argmin kernel, one id-keyed
    * aggregation.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    pqAssign(
      pqSubVectors(corpus, idCol, vecCol, "neighbor_id", model.m, model.subDim),
      model.codebook)
      .groupBy(col("neighbor_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("cluster")))),
        s => s.getField("cluster")).as("codes"))

  /** PQ approximate top-k with exact re-rank: per-query ADC tables (inner
    * product of each query subvector with each codeword — |Q|·m·ks tiny
    * rows, broadcast as per-query lookup maps), a map-only scan scoring
    * every encoded vector with m table lookups, a WindowGroupLimit
    * shortlist, then exact cosine re-rank of `shortlist` candidates per
    * query. The corpus side reads CODES (m bytes equivalent), not vectors
    * — the memory-bandwidth lever that makes a 100 TB scan tractable —
    * and touches float vectors only for shortlist·|Q| rows.
    */
  def pqTopK(corpus: DataFrame, codes: DataFrame, model: PqModel,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, shortlist: Int = 50): DataFrame = {
    // per-query ADC lookup map: (sub*ks + cluster) -> <q_sub, codeword>
    val qsub = pqSubVectors(queries, idCol, vecCol, "query_id",
      model.m, model.subDim)
    val qtables = qsub.join(broadcast(model.codebook), "sub")
      .select(col("query_id"),
        (col("sub") * lit(model.ks) + col("cluster")).as("idx"),
        fdot(col("svec"), col("centroid")).as("ip"))
      .groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("ip"))))
        .as("qmap"))

    // ADC scan: approximate inner product = Σ_j qmap[j·ks + code_j]
    val scored = codes.crossJoin(broadcast(qtables))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(model.m - 1)), lit(0.0),
          (acc, j) => acc + element_at(col("qmap"),
            j * lit(model.ks) + element_at(col("codes"), j + lit(1))))
          .as("__adc"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col("neighbor_id").asc)
    val cand = scored.withColumn("__crank", row_number().over(wCand))
      .where(col("__crank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank on the shortlist only
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__nvec"), fnorm(col(vecCol)).as("__nnorm"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qvec"), fnorm(col(vecCol)).as("__qnorm")))
    val exact = cand.join(cv, "neighbor_id").join(qv, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("__qvec"), col("__qnorm"), col("__nvec"), col("__nnorm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF+PQ composite ANN — the FAISS IVFADC shape and the true
    * billion-vector serving path: coarse k-means routing bounds WHICH
    * vectors are touched (~nProbe/nClusters of the corpus per query, the
    * [[ivfTopK]] property), PQ codes bound the COST PER VECTOR touched
    * (m byte-lookups against a broadcast ADC table instead of a d-term
    * float dot, the [[pqTopK]] property). [[pqTopK]] alone still scans
    * every code; [[ivfTopK]] alone still pays full-width vectors inside
    * probed clusters — composed, per-query work is
    * ~(n·nProbe/nClusters)·m lookups plus an exact re-rank on the
    * `shortlist` survivors, and the corpus-side state is 16×-compressed
    * codes plus one cluster id per vector.
    *
    * Join shape: the query side collapses to a broadcast-sized
    * (query, probed-cluster, ADC-map) table — |Q|·nProbe rows — so the
    * code scan is ONE broadcast-hash join keyed on the code's
    * pre-computed cluster id: map-only, no shuffle of the corpus, AQE
    * untouched. The exact re-rank reads full vectors for
    * |Q|·shortlist ids via the index's own cached assignment (no second
    * corpus scan). Recall is gated end to end by the s7 registry row
    * (both approximations — unprobed clusters AND quantized distances —
    * must survive against the exact baseline).
    */
  def ivfPqTopK(
      ivf: IvfIndex,
      codes: DataFrame,
      model: PqModel,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbe: Int = 4,
      shortlist: Int = 50): DataFrame = {
    // per-query ADC lookup map, exactly as in pqTopK (codebook "cluster"
    // here is the PQ codeword id, not the IVF cluster)
    val qsub = pqSubVectors(queries, idCol, vecCol, "query_id",
      model.m, model.subDim)
    val qtables = qsub.join(broadcast(model.codebook), "sub")
      .select(col("query_id"),
        (col("sub") * lit(model.ks) + col("cluster")).as("idx"),
        fdot(col("svec"), col("centroid")).as("ip"))
      .groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("ip"))))
        .as("qmap"))

    // coarse routing: nProbe nearest IVF centroids per query (ivfTopK's
    // routing), then fold each query's ADC map onto its routed rows — the
    // broadcast query side of the cluster-local code scan
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qvec"))
    val routed = q.crossJoin(broadcast(ivf.cents))
      .select(col("query_id"), col("qvec"), col("cluster"),
        graft.functions.VecExpressions.fdistSq(col("qvec"), col("centroid"))
          .as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2"), col("cluster"))))
      .where(col("rk") <= nProbe)
      .select(col("query_id"), col("cluster"))
    val routedMaps = routed.join(qtables, "query_id")

    // cluster-local ADC scan: codes carry their IVF cluster id from the
    // index's cached assignment; only codes in probed clusters are scored
    val codesClustered = codes.join(
      ivf.assigned.select(col("neighbor_id"), col("cluster")), "neighbor_id")
    val scored = codesClustered.join(broadcast(routedMaps), Seq("cluster"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(model.m - 1)), lit(0.0),
          (acc, j) => acc + element_at(col("qmap"),
            j * lit(model.ks) + element_at(col("codes"), j + lit(1))))
          .as("__adc"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col("neighbor_id").asc)
    val cand = scored.withColumn("__crank", row_number().over(wCand))
      .where(col("__crank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank on the shortlist, reading full vectors from the
    // index's own cache (nvec/nnorm ride the assignment)
    val qv = broadcast(q.withColumn("qnorm", fnorm(col("qvec"))))
    val exact = cand
      .join(ivf.assigned.select(col("neighbor_id"), col("nvec"), col("nnorm")),
        "neighbor_id")
      .join(qv, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("qvec"), col("qnorm"), col("nvec"), col("nnorm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
