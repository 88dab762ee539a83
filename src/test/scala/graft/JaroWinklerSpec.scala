package graft

import graft.functions.JaroWinkler
import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[JaroWinkler]] — the kernel is pinned against literal values probed
  * from DuckDB's `jaro_winkler_similarity` (the oracle's independent
  * implementation of the rapidfuzz convention), including the edge cases
  * that distinguish conventions: empty strings, the 0.7 boost gate, the
  * prefix cap, integer half-transpositions on an ODD mismatch count.
  * The join spec checks prefix-blocked == all-pairs-within-contract.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def jw(a: String, b: String): Double =
    JaroWinkler.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("classic pairs match DuckDB to 6dp") {
    val pinned = Seq(
      ("martha", "marhta", 0.961111),
      ("dixon", "dicksonx", 0.813333),
      ("dwayne", "duane", 0.84),
      ("jellyfish", "smellyfish", 0.896296),
      ("appel", "applet", 0.914444),
      ("crate", "trace", 0.733333),
      ("abcde", "xbcde", 0.866667))
    pinned.foreach { case (a, b, want) =>
      assert(q6(jw(a, b)) == want, s"jw($a, $b)")
    }
  }

  test("convention edges: empty=0, window=0, exact=1, case-sensitive") {
    assert(jw("", "") == 0.0) // NOT the both-empty=1 variant
    assert(jw("", "abc") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window max(2,2)/2-1 = 0
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ab") == 1.0)
    assert(jw("AB", "ab") == 0.0)
  }

  test("0.7 boost gate is live (IEEE 2.1/3 > 0.7 boosts)") {
    // jaro('dddddddddd','d') = (0.1 + 1 + 1)/3 = 0.7000...01 -> boosted
    assert(q6(jw("dddddddddd", "d")) == 0.73)
    // jaro('crate','trace') = 0.7333 but common prefix 0 -> no boost
    assert(q6(jw("crate", "trace")) == 0.733333)
  }

  test("prefix cap at 4 (5-char common prefix boosts as 4)") {
    assert(q6(jw("prefix", "preficacious")) == 0.85)
  }

  test("odd mismatch count floors the half-transpositions") {
    // matched sequences abc/bca: 3 mismatches -> t = 1, jaro = 17/18
    assert(q6(jw("abcxxx", "bcaxxx")) == q6(17.0 / 18.0))
    // 4 mismatches -> t = 2, jaro = 8/9
    assert(q6(jw("abcdxx", "badcxx")) == q6(8.0 / 9.0))
  }

  test("jwSelfJoin == all-pairs within the prefix-block contract") {
    import spark.implicits._
    val zoo = Seq(
      1L -> "martha", 2L -> "marhta", 3L -> "marta", 4L -> "martha",
      5L -> "marthaz", 6L -> "martin", 7L -> "marxxx",
      8L -> "walker", 9L -> "walkar", 10L -> "walken",
      11L -> "mar", 12L -> "ma", 13L -> "")
    val got = FuzzyJoin
      .jwSelfJoin(zoo.toDF("id", "s"), "id", "s",
        prefixLen = 4, minSim = 0.9)
      .select("id_a", "id_b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = (for {
      (ia, sa) <- zoo; (ib, sb) <- zoo
      if ia < ib && sa.take(4) == sb.take(4)
      s = q6(jw(sa, sb)) if s >= 0.9
    } yield (ia, ib, s)).toSet
    assert(got == brute && brute.nonEmpty)
    // short strings (len < prefixLen) block on their full selves
    assert(!brute.exists(p => p._1 == 11L || p._2 == 11L))
  }
}
