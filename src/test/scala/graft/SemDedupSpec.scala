package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.semDeDup]] — cluster-then-verify semantic dedup (SemDeDup,
  * Abbas et al. 2023): planted near-identicals must be dropped through the
  * cluster-local plan exactly as an all-pairs engine would drop them, the
  * hot-cluster guard must keep homogeneous families collapsing to their
  * minimum id, and clustering must be magnitude-invariant (cosine
  * geometry), so scaled copies still co-cluster.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("drops planted near-identicals, keeps the rest, one row per id") {
    import spark.implicits._
    // 40 well-separated directions in 8-dim (pairwise cosine <= ~0.94) +
    // 10 jittered copies at ids +1000 (cosine ~0.9999999 to the original)
    val base = (0 until 40).map { i =>
      val a = new Array[Float](8)
      a(i % 8) = 1f
      a((i / 8) % 8) = 0.3f + 0.01f * i
      (i.toLong, a)
    }
    val dups = base.take(10).map { case (id, a) =>
      val b = a.clone(); b(0) = b(0) * 1.0005f; (id + 1000L, b)
    }
    val out = Dedup.semDeDup((base ++ dups).toDF("id", "vec"), "id", "vec",
      threshold = 0.99, nClusters = 8, iterations = 2)
    val flags = out.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags.size == 50)
    dups.foreach { case (id, _) => assert(flags(id), s"planted dup $id kept") }
    base.foreach { case (id, _) => assert(!flags(id), s"original $id dropped") }
    out.unpersist()
  }

  test("hot-cluster guard: oversized homogeneous family still collapses to min id") {
    import spark.implicits._
    // 20 near-identical vectors forced into ONE cluster (nClusters = 1 —
    // with k seeded INSIDE a tight family the family may legitimately
    // split across near-identical centroids, each half keeping its own
    // min) of 20 > maxBucket 4: the guard's representative verification
    // must still pair every member with a smaller-id rep, so greedy
    // keep-first drops all but id 0
    val fam = (0 until 20).map { i =>
      val a = Array(1f, 0.5f, 0.25f, 0.125f)
      a(1) = a(1) * (1f + i.toFloat * 1e-6f)
      (i.toLong, a)
    }
    val out = Dedup.semDeDup(fam.toDF("id", "vec"), "id", "vec",
      threshold = 0.99, nClusters = 1, iterations = 1,
      maxBucket = 4, repFactor = 3)
    val flags = out.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!flags(0L), "minimum id must survive")
    (1 until 20).foreach { i => assert(flags(i.toLong), s"id $i kept") }
    out.unpersist()
  }

  test("autoClusters: floors at 16, scales linearly with corpus size") {
    assert(Dedup.autoClusters(0) == 16)
    assert(Dedup.autoClusters(2048) == 16)   // 2048/128 = exactly the floor
    assert(Dedup.autoClusters(2049) == 17)   // first size past the floor
    assert(Dedup.autoClusters(1280000) == 10000)
    // the paper's LAION-440M geometry (~9k per cluster -> ~50k clusters)
    assert(Dedup.autoClusters(440000000L, 9000) == 48889)
  }

  test("assignHierarchical == flat assign on separated clusters (k > 64)") {
    import spark.implicits._
    import graft.operators.Similarity
    // 100 well-separated centroids in 32-dim; vectors jittered 0.01 around
    // them, so the true argmin is unambiguous and the vector's own group
    // is always its nearest coarse group — the two-level route must agree
    // with flat argmin exactly
    val dim = 32
    val cents = (0 until 100).map { c =>
      val a = new Array[Double](dim)
      a(c % dim) = 10.0 + (c / dim)
      a((c * 7) % dim) += 5.0
      (c, a.toSeq)
    }
    val centsDf = cents.toDF("cluster", "centroid")
    val vecs = (0 until 300).map { i =>
      val a = cents(i % 100)._2.toArray.clone()
      a(i % dim) += 0.01 * ((i % 5) - 2)
      (i.toLong, a.toSeq)
    }.toDF("neighbor_id", "nvec")
    val flat = Similarity.assign(vecs, centsDf)
      .select("neighbor_id", "cluster").as[(Long, Int)].collect().toMap
    val hier = Similarity.assignHierarchical(vecs, centsDf, nProbe = 4)
      .select("neighbor_id", "cluster").as[(Long, Int)].collect().toMap
    assert(hier == flat)
    assert(flat.values.toSet.size > 50, "fixture must genuinely span clusters")
    // small k falls back to flat assign (two levels can't pay)
    val small = centsDf.where(org.apache.spark.sql.functions.col("cluster") < 8)
    val fb = Similarity.assignHierarchical(vecs, small, nProbe = 4)
      .select("neighbor_id", "cluster").as[(Long, Int)].collect().toMap
    val fbFlat = Similarity.assign(vecs, small)
      .select("neighbor_id", "cluster").as[(Long, Int)].collect().toMap
    assert(fb == fbFlat)
  }

  test("incrementalSemDedup: batch paraphrases caught vs index and within batch") {
    import spark.implicits._
    // corpus: 30 well-separated directions; index built once on it
    val corpus = (0 until 30).map { i =>
      val a = new Array[Float](8)
      a(i % 8) = 1f
      a((i / 8) % 8) = 0.3f + 0.02f * i
      (i.toLong, a)
    }
    val index = Dedup.buildSemIndex(corpus.toDF("id", "vec"), "id", "vec",
      nClusters = 4, iterations = 2)
    // batch: 5 fresh directions (kept), 5 paraphrases of INDEXED vectors
    // (dropped vs index), 2 paraphrases of the fresh batch vectors
    // (dropped within batch, keep-first), and one resubmitted known id
    // (equal id in batch and index -> must NOT self-pair)
    val fresh = (0 until 5).map { i =>
      val a = new Array[Float](8)
      a(7 - i % 8) = 1f; a(i % 4) = -0.4f - 0.05f * i
      (100L + i, a)
    }
    val vsIndex = corpus.take(5).map { case (id, a) =>
      val b = a.clone(); b(0) = b(0) * 1.0005f; (200L + id, b)
    }
    val inBatch = fresh.take(2).map { case (id, a) =>
      val b = a.clone(); b(1) = b(1) * 1.0005f; (300L + id, b)
    }
    val resub = Seq((7L, corpus(7)._2))
    val batch = (fresh ++ vsIndex ++ inBatch ++ resub).toDF("id", "vec")
    val out = Dedup.incrementalSemDedup(batch, "id", "vec", index,
      threshold = 0.99)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    vsIndex.foreach { case (id, _) =>
      assert(rows.exists(m => m._1 == id && m._3),
        s"paraphrase $id not caught against index")
    }
    inBatch.foreach { case (id, _) =>
      assert(rows.exists(m => m._1 == id && !m._3),
        s"in-batch paraphrase $id not caught")
    }
    // the resubmitted id is near its indexed twin BY IDENTITY only — the
    // equal-id pair is excluded, and no other vector is near it
    assert(!rows.exists(_._1 == 7L), "resubmitted id must not self-pair")
    fresh.foreach { case (id, _) =>
      assert(!rows.exists(_._1 == id), s"fresh vector $id wrongly dropped")
    }
    out.unpersist()
    index.close()
  }

  test("magnitude-invariant: a 3x-scaled copy co-clusters and is dropped") {
    import spark.implicits._
    val v = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val rows = Seq(
      (0L, v),
      (1L, v.map(_ * 3f)),            // cosine exactly 1, L2-far from v
      (2L, Array(1f, -1f, 0f, 0f)),   // orthogonal bystander
      (3L, Array(0f, 0f, 1f, -1f)))
    val out = Dedup.semDeDup(rows.toDF("id", "vec"), "id", "vec",
      threshold = 0.99, nClusters = 2, iterations = 2)
    val flags = out.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!flags(0L) && flags(1L), "scaled copy must be the dropped one")
    assert(!flags(2L) && !flags(3L))
    out.unpersist()
  }
}
