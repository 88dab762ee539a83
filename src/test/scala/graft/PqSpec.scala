package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.trainPq]] / [[Similarity.pqEncode]] / [[Similarity.pqTopK]]
  * — product quantization with ADC scan and exact re-rank.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 40 well-separated 8-dim directions + exact duplicates of the first 5
    * at high ids — a fixture where true nearest neighbors are unambiguous.
    */
  private def fixture = {
    import spark.implicits._
    val base = (0 until 40).map { i =>
      val a = new Array[Float](8)
      a(i % 8) = 1f
      a((i / 8) % 8) += 0.4f + 0.01f * i
      (i.toLong, a)
    }
    val dups = base.take(5).map { case (id, a) => (id + 1000L, a.clone()) }
    (base ++ dups).toDF("id", "vec")
  }

  test("codes: one row per id, m codes, every code within [0, ks)") {
    val model = Similarity.trainPq(fixture, "id", "vec",
      m = 4, ks = 8, iterations = 2, inDims = 8)
    val codes = Similarity.pqEncode(fixture, "id", "vec", model)
    val rows = codes.collect()
    assert(rows.length == 45)
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4)
      assert(cs.forall(c => c >= 0 && c < 8))
    }
    // identical vectors get identical codes
    val byId = rows.map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    (0 until 5).foreach(i => assert(byId(i.toLong) == byId(i + 1000L)))
    model.close()
  }

  test("ADC + re-rank finds planted exact duplicates as top neighbors") {
    val model = Similarity.trainPq(fixture, "id", "vec",
      m = 4, ks = 8, iterations = 2, inDims = 8)
    val codes = Similarity.pqEncode(fixture, "id", "vec", model)
    val q = fixture.where(col("id") < 5)
    val top1 = Similarity.pqTopK(fixture, codes, model, q, "id", "vec",
        k = 1, shortlist = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(i => assert(top1(i) == i + 1000L,
      s"query $i: expected its exact duplicate, got ${top1(i)}"))
    model.close()
  }

  test("re-ranked ordering equals brute force on the shortlist regime") {
    val model = Similarity.trainPq(fixture, "id", "vec",
      m = 4, ks = 8, iterations = 2, inDims = 8)
    val codes = Similarity.pqEncode(fixture, "id", "vec", model)
    val q = fixture.where(col("id") < 3)
    // shortlist covers the whole corpus -> the re-rank IS brute force
    val pq = Similarity.pqTopK(fixture, codes, model, q, "id", "vec",
        k = 5, shortlist = 100)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(fixture, q, "id", "vec", k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pq == brute)
    model.close()
  }

  test("training is deterministic: same data, same codebook") {
    val m1 = Similarity.trainPq(fixture, "id", "vec",
      m = 2, ks = 4, iterations = 2, inDims = 8)
    val m2 = Similarity.trainPq(fixture, "id", "vec",
      m = 2, ks = 4, iterations = 2, inDims = 8)
    def dump(m: Similarity.PqModel) =
      m.codebook.orderBy("sub", "cluster").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq
    assert(dump(m1) == dump(m2))
    m1.close(); m2.close()
  }

  test("indims must split evenly across subspaces") {
    intercept[IllegalArgumentException] {
      Similarity.trainPq(fixture, "id", "vec", m = 3, ks = 4, inDims = 8)
    }
  }

  test("ivfPqTopK: full-probe full-shortlist equals brute force") {
    val model = Similarity.trainPq(fixture, "id", "vec",
      m = 4, ks = 8, iterations = 2, inDims = 8)
    val codes = Similarity.pqEncode(fixture, "id", "vec", model)
    val ivf = Similarity.buildIvfIndex(fixture, "id", "vec",
      nClusters = 4, iterations = 2)
    val q = fixture.where(col("id") < 3)
    // probing every cluster with a corpus-wide shortlist removes both
    // approximations -> the composite must BE brute force
    val got = Similarity.ivfPqTopK(ivf, codes, model, q, "id", "vec",
        k = 5, nProbe = 4, shortlist = 100)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(fixture, q, "id", "vec", k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
    ivf.close(); model.close()
  }

  test("ivfPqTopK: bounded probe still finds planted exact duplicates") {
    val model = Similarity.trainPq(fixture, "id", "vec",
      m = 4, ks = 8, iterations = 2, inDims = 8)
    val codes = Similarity.pqEncode(fixture, "id", "vec", model)
    val ivf = Similarity.buildIvfIndex(fixture, "id", "vec",
      nClusters = 4, iterations = 2)
    val q = fixture.where(col("id") < 5)
    // a query's exact duplicate shares its vector, hence its cluster —
    // the nearest probed cluster always contains it
    val top1 = Similarity.ivfPqTopK(ivf, codes, model, q, "id", "vec",
        k = 1, nProbe = 2, shortlist = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(i => assert(top1(i) == i + 1000L,
      s"query $i: expected its exact duplicate, got ${top1(i)}"))
    ivf.close(); model.close()
  }
}
