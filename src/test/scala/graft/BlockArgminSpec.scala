package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecExpressions
import graft.operators.Similarity

/** The matrix-kernel assignment contract: [[graft.functions
  * .FloatVecBlockArgmin]] must reproduce the exploded
  * `min_by(struct(cluster), struct(d2, cluster))` argmin EXACTLY — same
  * distances (the FloatVecDistSq fold), same lowest-cluster tie-break —
  * because the d8/d8b/d8c/nd3 oracle hashes ride on assignment identity.
  */
class BlockArgminSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def randVec(rng: scala.util.Random, d: Int): Seq[Double] =
    Seq.fill(d)(rng.nextDouble() * 2 - 1)

  test("block argmin == exploded min_by argmin on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val dim = 9
    val vecs = (0L until 200L).map(i => (i, randVec(rng, dim)))
      .toDF("neighbor_id", "nvec")
    val cents = (0 until 23).map(c => (c, randVec(rng, dim)))
      .toDF("cluster", "centroid")

    val viaKernel = Similarity.assign(vecs, cents)
      .select(col("neighbor_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap

    val viaExplode = vecs.crossJoin(broadcast(cents))
      .select(col("neighbor_id"), col("cluster"),
        VecExpressions.fdistSq(col("nvec"), col("centroid")).as("d2"))
      .groupBy(col("neighbor_id"))
      .agg(min_by(col("cluster"), struct(col("d2"), col("cluster"))).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap

    assert(viaKernel == viaExplode)
    assert(viaKernel.size == 200)
  }

  test("block cosine-match == nested-loop join + groupBy formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val dim = 8
    val corpus = (0L until 300L).map(i => (i, randVec(rng, dim)))
      .toDF("vec_id", "embedding")
    val bench = (9000L until 9040L).map(i => (i, randVec(rng, dim)))
      .toDF("vec_id", "embedding")
    // permissive threshold so matches actually occur on random data
    val viaKernel = Similarity.semanticDecontaminate(
        corpus, bench, "vec_id", "embedding", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (d > 0) Some(a.zip(b).map { case (x, y) => x * y }.sum / d) else None
    }
    val bRows = bench.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val expected = corpus.collect().flatMap { r =>
      val hits = bRows.filter { case (_, bv) =>
        cos(r.getSeq[Double](1), bv).exists(_ >= 0.5) }
      if (hits.isEmpty) None
      else Some((r.getLong(0), hits.map(_._1).min, hits.length.toLong))
    }.toSet
    assert(viaKernel.nonEmpty && viaKernel == expected)
  }

  test("ties break to the lowest cluster id, matching struct ordering") {
    import spark.implicits._
    // two identical centroids -> equal d2; the kernel must pick cluster 1
    val vecs = Seq((1L, Seq(0.5, 0.5))).toDF("neighbor_id", "nvec")
    val cents = Seq((3, Seq(1.0, 0.0)), (1, Seq(1.0, 0.0)), (2, Seq(9.0, 9.0)))
      .toDF("cluster", "centroid")
    val out = Similarity.assign(vecs, cents)
      .select(col("cluster")).head().getInt(0)
    assert(out == 1)
  }

  test("routed (hierarchical) assignment agrees with flat assignment " +
      "when every group is probed") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val dim = 6
    val vecs = (0L until 150L).map(i => (i, randVec(rng, dim)))
      .toDF("neighbor_id", "nvec")
    // 80 centroids > the 64-cluster hier floor; nProbe large enough that
    // buildCoarseRouting declines (coarseK*nProbe >= k) is avoided by
    // probing 5 of ~9 groups — so compare only where routing is exact:
    // force full probing by nProbe = coarseK via a direct routing build.
    val cents = (0 until 80).map(c => (c, randVec(rng, dim)))
      .toDF("cluster", "centroid")
    val routing = Similarity.buildCoarseRouting(cents, nProbe = 4)
    assert(routing.isDefined) // 80 > 64 and coarseK(9)*4 < 80
    val coarseK = routing.get.coarse.length
    val flat = Similarity.assign(vecs, cents)
      .select(col("neighbor_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // probe EVERY coarse group -> routed argmin must equal flat argmin
    val routedAll = Similarity.assignRouted(vecs, cents, routing.get, coarseK)
      .select(col("neighbor_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    routing.get.close()
    assert(routedAll == flat)
  }
}
