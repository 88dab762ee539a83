package graft

import graft.operators.DataQuality
import graft.operators.DataQuality._
import org.scalatest.funsuite.AnyFunSuite

/** [[DataQuality.audit]] — rules as data, evaluated exactly. */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def result(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap

  test("every rule kind counts planted violations exactly") {
    import spark.implicits._
    val child = Seq(
      (1L, Option("a"), Option(5.0), Option("ok"), Option(10L)),
      (2L, None, Option(-1.0), Option("ok"), Option(10L)),     // null name, low val
      (3L, Option("b"), Option(99.0), Option("bad!"), Option(20L)), // high val, regex fail
      (3L, Option("c"), Option(5.0), Option("zz"), Option(30L)),    // dup id, enum fail
      (4L, Option("d"), None, Option("ok"), None)              // null key -> fk/enum skip? value null
    ).toDF("id", "name", "v", "tag", "fk")
    val parent = Seq(10L, 20L).toDF("pid")

    val out = DataQuality.audit(
      Map("child" -> child, "parent" -> parent),
      Seq(
        NotNull("name_nn", "child", "name"),
        InRange("v_range", "child", "v", 0.0, 50.0),
        Matches("tag_re", "child", "tag", "^[a-z]+$"),
        InSet("tag_enum", "child", "tag", Seq("ok", "bad!", "zz")),
        Unique("id_uniq", "child", Seq("id")),
        RefIntegrity("fk_ok", "child", "fk", "parent", "pid")))
    val m = result(out.collect().toIndexedSeq)
    assert(m("name_nn") == ((1L, 5L)))
    assert(m("v_range") == ((2L, 5L))) // -1 and 99; null not counted
    assert(m("tag_re") == ((1L, 5L))) // "bad!"
    assert(m("tag_enum") == ((0L, 5L)))
    assert(m("id_uniq") == ((1L, 5L))) // id 3 twice -> 1 extra row
    assert(m("fk_ok") == ((1L, 4L))) // fk=30 orphan; null fk not checked
  }

  test("composite uniqueness counts extra rows per duplicate tuple") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L))
      .toDF("a", "b")
    val m = result(DataQuality.audit(Map("t" -> df),
      Seq(Unique("ab", "t", Seq("a", "b")))).collect().toIndexedSeq)
    assert(m("ab") == ((2L, 5L)))
  }

  test("predicate rules over one table fuse into a single scan") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val out = DataQuality.audit(Map("t" -> df), Seq(
      NotNull("r1", "t", "a"), NotNull("r2", "t", "b"),
      InRange("r3", "t", "a", 0, 10), Matches("r4", "t", "b", "^[a-z]$")))
    // one LocalTableScan/scan leaf in the whole plan — all four rules ride it
    val plan = out.queryExecution.optimizedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("LocalRelation") || l.contains("Relation ["))
    assert(scans == 1, s"expected one scan leaf, plan:\n$plan")
    assert(result(out.collect().toIndexedSeq).values.toSet == Set((0L, 2L)))
  }

  test("audit rejects rules against unknown tables") {
    import spark.implicits._
    val df = Seq(1L).toDF("a")
    intercept[IllegalArgumentException] {
      DataQuality.audit(Map("t" -> df), Seq(NotNull("x", "nope", "a")))
    }
  }
}
