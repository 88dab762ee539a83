package graft

import graft.operators.IntervalJoin
import org.scalatest.funsuite.AnyFunSuite

/** [[IntervalJoin]] — overlap semantics, half-open edges, exactly-once
  * emission across shared buckets, key isolation.
  */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def iv(rows: Seq[(Long, Long, Long, Long)], s: String, e: String) = {
    import spark.implicits._
    rows.toDF("k", "id", s, e)
  }

  private def join(l: Seq[(Long, Long, Long, Long)],
      r: Seq[(Long, Long, Long, Long)], bucket: Long = 100L) =
    IntervalJoin.overlapJoin(iv(l, "ls", "le"),
        iv(r, "rs", "re").withColumnRenamed("id", "rid"),
        "k", "ls", "le", "rs", "re", bucket)
      .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq.sorted

  test("overlap, containment, touch and disjoint — half-open semantics") {
    val l = Seq((1L, 1L, 100L, 200L))
    val r = Seq(
      (1L, 10L, 150L, 250L), // plain overlap
      (1L, 11L, 120L, 130L), // contained
      (1L, 12L, 200L, 300L), // touches at l.end — half-open, no match
      (1L, 13L, 50L, 100L),  // touches at l.start — no match
      (1L, 14L, 300L, 400L)) // disjoint
    assert(join(l, r) == Seq((1L, 10L), (1L, 11L)))
  }

  test("a pair sharing many buckets is emitted exactly once") {
    // both intervals span 10 buckets at bucket=100
    val l = Seq((1L, 1L, 0L, 1000L))
    val r = Seq((1L, 10L, 500L, 1500L))
    assert(join(l, r) == Seq((1L, 10L)))
    // and with the roles reversed / fully nested
    assert(join(r.map { case (k, id, s, e) => (k, id, s, e) }, l)
      == Seq((10L, 1L)))
  }

  test("keys isolate: identical times on different keys never match") {
    val l = Seq((1L, 1L, 100L, 200L))
    val r = Seq((2L, 10L, 100L, 200L))
    assert(join(l, r).isEmpty)
  }

  test("bucket size does not change the result set") {
    val l = Seq((1L, 1L, 0L, 370L), (1L, 2L, 500L, 501L))
    val r = Seq((1L, 10L, 369L, 600L), (1L, 11L, 0L, 1L))
    for (b <- Seq(1L, 7L, 100L, 1000L))
      assert(join(l, r, b) == Seq((1L, 10L), (1L, 11L), (2L, 10L)), s"b=$b")
  }
}
