package graft

import graft.operators.Graph
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[Graph.pageRank]] — structure-follows-rank sanity, symmetry, mass
  * bounds and bit-determinism of the integer formulation.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5) = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star: the hub outranks the leaves, leaves tie exactly") {
    val leaves = Seq(2L, 3L, 4L, 5L)
    val out = ranks(leaves.flatMap(l => Seq(1L -> l, l -> 1L)))
    assert(leaves.map(out).distinct.size == 1)
    assert(out(1L) > out(2L) * 2)
  }

  test("symmetric ring: all nodes tie exactly") {
    val n = 6L
    val edges = (0L until n).flatMap(i =>
      Seq(i -> ((i + 1) % n), ((i + 1) % n) -> i))
    val out = ranks(edges)
    assert(out.values.toSeq.distinct.size == 1)
  }

  test("total mass stays within floor-loss of the scale") {
    val out = ranks(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 3L -> 2L,
      1L -> 3L))
    val total = out.values.sum
    assert(total <= 1000000000000L)
    assert(total > 990000000000L, s"total=$total")
  }

  test("bit-deterministic across runs") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 2L, 4L -> 1L,
      1L -> 4L)
    assert(ranks(edges) == ranks(edges))
  }

  test("rank flows: a node every path feeds outranks a peripheral one") {
    // 1..4 all point at 5; 5 points at 1 only
    val out = ranks(Seq(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L, 5L -> 1L,
      1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
    assert(out(5L) > out(3L))
  }

  private def tris(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangles: one triangle counts once at every corner") {
    assert(tris(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: K4 has four triangles, three per node") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield a -> b
    val out = tris(k4)
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: direction, multiplicity and self-loops are ignored") {
    val noisy = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 2L -> 3L, 1L -> 3L,
      3L -> 3L, 4L -> 5L)
    assert(tris(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: a square without diagonals has none") {
    assert(tris(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)).isEmpty)
  }

  test("triangles: hub fan (wheel) — hub joins every rim triangle") {
    // hub 0 connected to rim 1..5, rim is a cycle: 5 triangles, hub in
    // all of them, each rim node in two
    val rim = (1L to 5L).map(i => i -> (if (i == 5L) 1L else i + 1))
    val out = tris(rim ++ (1L to 5L).map(0L -> _))
    assert(out(0L) == 5L)
    assert((1L to 5L).forall(out(_) == 2L))
  }

  test("clusteringCoefficients: clique 1.0, star hub 0.0, path middles 0") {
    import spark.implicits._
    // K3 clique {1,2,3} + star hub 4 -> {5,6} + pendant 3 -> 7
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 5L, 4L -> 6L,
      3L -> 7L)
    val out = Graph.clusteringCoefficients(
        edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, 0.333333))) // 2·1/(3·2)
    assert(out(4L) == ((2L, 0L, 0.0)))      // open wedge hub
    assert(out(5L) == ((1L, 0L, 0.0)))      // degree 1 pinned
    assert(out(7L) == ((1L, 0L, 0.0)))
  }

  test("lp1: communities equal residue classes; chrome links collapse " +
      "everything to one blob") {
    import spark.implicits._
    // lp1 on the real fixture: each community is exactly one residue
    // class of doc_id % 97, labeled by its smallest doc id
    val sfDir = SparkTestSession.sfDir
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long].collect()
    val want = docs.groupBy(_ % 97).values
      .map(g => (g.min, g.length.toLong, g.min, g.max)).toSet
    val got = Queries.lp1LinkCommunities(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)

    // WHY boilerplate stripping matters: add one chrome target shared by
    // every page (href="/" in the real HTML) and min-label propagation
    // correctly collapses the whole graph to a single community
    val refEdges = docs.map(d => (d, 1000000000L + d % 97)).toSeq
    val chrome = docs.map(d => (d, 2000000000L)).toSeq
    val labels = graft.operators.Dedup.connectedComponents(
      (refEdges ++ chrome).toDF("src", "dst"), "src", "dst")
    val comms = labels.where(col("id") < 1000000000L)
      .select(col("component")).distinct().collect()
    assert(comms.length == 1 && comms.head.getLong(0) == docs.min)
  }
}
