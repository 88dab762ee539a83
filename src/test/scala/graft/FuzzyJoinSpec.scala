package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[FuzzyJoin]] — deletion-neighborhood (FastSS) blocked edit-distance
  * join. The blocking claims LOSSLESSNESS for ed<=k, so every spec here
  * compares the blocked plan against the brute-force all-pairs definition
  * on data with insertions, deletions, substitutions, ties, and length
  * mismatches — not just the friendly fixed-length case.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet
  }

  private val zoo: Seq[(Long, String)] = Seq(
    1L -> "martha", 2L -> "marhta", // transposition = 2 substitutions
    3L -> "marta", // deletion of one char from both above
    4L -> "martha", // exact dup of 1
    5L -> "msrtha", // substitution vs 1
    6L -> "marthaa", // insertion vs 1
    7L -> "xyz", 8L -> "xz", 9L -> "yz", 10L -> "z",
    11L -> "", 12L -> "a", 13L -> "b",
    14L -> "completely-different")

  test("k=1: blocked pairs == brute force (ins/del/sub/dup/empty)") {
    import spark.implicits._
    val got = FuzzyJoin.fuzzySelfJoin(zoo.toDF("id", "s"), "id", "s", maxDist = 1)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute(zoo, 1))
  }

  test("k=2: blocked pairs == brute force") {
    import spark.implicits._
    val got = FuzzyJoin.fuzzySelfJoin(zoo.toDF("id", "s"), "id", "s", maxDist = 2)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute(zoo, 2))
  }

  test("k=1 randomized: lossless on a mutated-clone corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    val base = (0 until 60).map(i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(6))(alphabet(rnd.nextInt(6))).mkString))
    val mutated = base.take(30).map { case (id, s0) =>
      val op = rnd.nextInt(3)
      val p = rnd.nextInt(s0.length)
      val s = op match {
        case 0 => s0.updated(p, alphabet(rnd.nextInt(6))) // sub
        case 1 => s0.substring(0, p) + s0.substring(p + 1) // del
        case _ => s0.substring(0, p) + alphabet(rnd.nextInt(6)) + s0.substring(p) // ins
      }
      (id + 1000L, s)
    }
    val rows = base ++ mutated
    val got = FuzzyJoin.fuzzySelfJoin(rows.toDF("id", "s"), "id", "s", maxDist = 1)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = brute(rows, 1)
    assert(want.size >= 30, s"fixture too sparse: ${want.size}")
    assert(got == want)
  }

  test("hot-bucket guard degrades to representatives with an audit") {
    import spark.implicits._
    // 20 identical strings in one bucket with maxBucket 4: candidates go
    // through repFactor representatives, so every member still pairs with
    // at least the min-id rep (what greedy dedup needs), and the audit
    // reports the oversized bucket
    val fam = (0 until 20).map(i => (i.toLong, "same"))
    val (out, audit) = FuzzyJoin.fuzzySelfJoinAudited(
      fam.toDF("id", "s"), "id", "s", maxDist = 1, maxBucket = 4, repFactor = 2)
    val pairs = out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(audit.oversizedBuckets > 0)
    (1 until 20).foreach { i =>
      assert(pairs.exists { case (a, b) => a < i && b == i },
        s"member $i lost its smaller-id link under the guard")
    }
  }

  test("two-table fuzzyJoin matches per-pair brute force") {
    import spark.implicits._
    val left = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    val right = Seq(10L -> "alpah", 11L -> "alpha", 12L -> "bta", 13L -> "delta")
    val got = FuzzyJoin.fuzzyJoin(
        left.toDF("id", "s"), "id", "s",
        right.toDF("id", "s"), "id", "s", maxDist = 1)
      .select("left_id", "right_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // alpha~alpah is a transposition (ed 2) — must NOT match at k=1
    assert(got == Set((1L, 11L, 0), (2L, 12L, 1)))
  }

  test("deletionVariants: identity always present, correct counts, distinct") {
    import spark.implicits._
    val df = Seq("abcd").toDF("s")
      .select(FuzzyJoin.deletionVariants(col("s"), 2).as("v"))
    val v = df.collect()(0).getSeq[String](0)
    assert(v.contains("abcd"))
    assert(v.toSet.size == v.size)
    // 1 identity + 4 single deletions + C(4,2)=6 double deletions, all
    // distinct for a string with unique chars
    assert(v.size == 11)
  }

  test("resolveEntities: transitive merge, min-id canonical, singletons") {
    import spark.implicits._
    // chain: "north" ~ "nrth" (del) ~ "nrtx" (sub) — ends are 2 edits
    // apart, so only the CLOSURE puts all three in one entity; plus an
    // exact-dup pair and an unmatched singleton
    val rows = Seq(
      5L -> "north", 9L -> "nrth", 7L -> "nrtx",
      2L -> "south", 3L -> "south",
      11L -> "isolated-row")
    val got = FuzzyJoin.resolveEntities(rows.toDF("id", "s"), "id", "s", maxDist = 1)
      .select("id", "entity_id", "cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (5L, 5L, 3L), (9L, 5L, 3L), (7L, 5L, 3L),
      (2L, 2L, 2L), (3L, 2L, 2L),
      (11L, 11L, 1L)))
  }
}
