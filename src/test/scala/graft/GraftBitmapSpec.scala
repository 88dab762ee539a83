package graft

import graft.sources.GraftBitmap
import org.scalatest.funsuite.AnyFunSuite

/** The compressed delete-vector codec ([[graft.sources.GraftBitmap]]):
  * exact round trips over every shape, set semantics for duplicates,
  * and the size bounds that make 10^7-position erasures sidecar-cheap.
  */
class GraftBitmapSpec extends AnyFunSuite {

  private def roundTrip(ps: Array[Long]): Unit = {
    val distinctSorted = ps.distinct.sorted
    val enc = GraftBitmap.encode(ps.sorted)
    assert(GraftBitmap.cardinality(enc) == distinctSorted.length.toLong)
    assert(GraftBitmap.decode(enc).toSeq == distinctSorted.toSeq)
  }

  test("round trips: empty, singleton, dense run, sparse, mixed, dups") {
    roundTrip(Array.empty[Long])
    roundTrip(Array(0L))
    roundTrip(Array(7L))
    roundTrip((100L until 500L).toArray)
    roundTrip(Array(1L, 10L, 100L, 1000L, 1000000L, Long.MaxValue / 2))
    roundTrip(Array(5L, 5L, 6L, 6L, 6L, 9L, 9L)) // duplicates collapse
    roundTrip((0L until 50L).flatMap(i => Seq(i * 37L, i * 37L + 1)).toArray)
  }

  test("decodeRunChunks covers the set exactly with bounded chunks") {
    def viaChunks(ps: Array[Long], maxChunk: Int): Seq[Long] = {
      val chunks = GraftBitmap.decodeRunChunks(
        GraftBitmap.encode(ps.sorted), maxChunk)
      assert(chunks.forall(_._2 <= maxChunk))
      chunks.flatMap { case (s, n) => s until s + n }.toSeq
    }
    assert(viaChunks(Array.empty, 10) == Seq.empty)
    assert(viaChunks((100L until 500L).toArray, 64) ==
      (100L until 500L).toSeq)
    assert(GraftBitmap.decodeRunChunks(
      GraftBitmap.encode((0L until 1000L).toArray), 64).length == 16)
    val rnd = new scala.util.Random(11)
    val ps = Array.fill(3000)(rnd.nextLong(1L << 30).abs).distinct.sorted
    assert(viaChunks(ps, 7) == ps.toSeq)
  }

  test("randomized round trips (fixed seed)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(5000)
      val ps = Array.fill(n)(rnd.nextLong(1L << 40).abs)
      roundTrip(ps)
    }
  }

  test("a contiguous 10^7-position erasure encodes in ~10 bytes; " +
      "random sparse marks cost 1-3 bytes each (vs 8-16+ as rows)") {
    val dense = GraftBitmap.encode((0L until 10000000L).toArray)
    assert(dense.length < 32,
      s"one 10^7 run must be header-sized, got ${dense.length} bytes")
    assert(GraftBitmap.cardinality(dense) == 10000000L)
    assert(GraftBitmap.decode(dense).length == 10000000)

    val rnd = new scala.util.Random(7)
    val sparse = Array.fill(1000000)(rnd.nextLong(1L << 33).abs)
      .distinct.sorted
    val enc = GraftBitmap.encode(sparse)
    assert(enc.length < sparse.length * 4,
      s"sparse marks must stay under 4 B each, got ${enc.length} for " +
        s"${sparse.length}")
    assert(GraftBitmap.decode(enc).toSeq == sparse.toSeq)
  }
}
