package graft

import graft.operators.Graph
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
}
