package graft

import graft.operators.Association
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Association]] — chi-square cells/summary: exact zero under
  * independence, V = 1 under perfect association, grid zero-fill, null
  * exclusion, degenerate dof.
  */
class AssociationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  test("independent columns: every obs equals expected, chi2 = 0, V = 0") {
    // marginals a: x=4, y=2; b: u=3, v=3; every exp = rowTot*colTot/6 = obs
    val d = df(Seq(("x", "u"), ("x", "u"), ("x", "v"), ("x", "v"),
      ("y", "u"), ("y", "v")))
    val cells = Association.chiSquareCells(d, "a", "b").collect()
    assert(cells.length == 4)
    cells.foreach { r =>
      assert(r.getLong(2).toDouble == r.getDouble(3), r.toString)
      assert(r.getDouble(4) == 0.0, r.toString)
    }
    val st = Association.chiSquareStat(d, "a", "b").collect()(0)
    assert(st.getLong(0) == 6L && st.getLong(1) == 1L)
    assert(st.getDouble(2) == 0.0 && st.getDouble(3) == 0.0)
  }

  test("perfect 2x2 association: chi2 = n, Cramér's V = 1") {
    val d = df(Seq(("x", "u"), ("x", "u"), ("x", "u"),
      ("y", "v"), ("y", "v"), ("y", "v")))
    val st = Association.chiSquareStat(d, "a", "b").collect()(0)
    assert(st.getLong(0) == 6L && st.getLong(1) == 1L)
    assert(math.abs(st.getDouble(2) - 6.0) < 1e-6)
    assert(st.getDouble(3) == 1.0)
  }

  test("grid is zero-filled: absent (val_a, val_b) pairs appear at obs 0") {
    val d = df(Seq(("x", "u"), ("y", "v")))
    val cells = Association.chiSquareCells(d, "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(cells.size == 4)
    assert(cells(("x", "v")) == 0L && cells(("y", "u")) == 0L)
    assert(cells(("x", "u")) == 1L && cells(("y", "v")) == 1L)
  }

  test("nulls on either side are excluded from the grid and n") {
    import spark.implicits._
    val d = Seq((Some("x"), Some("u")), (Some("x"), None),
      (None, Some("u")), (None, None)).toDF("a", "b")
    val st = Association.chiSquareStat(d, "a", "b").collect()(0)
    assert(st.getLong(0) == 1L)
  }

  test("single-category column: dof = 0, V pinned to 0") {
    val d = df(Seq(("x", "u"), ("x", "v"), ("x", "u")))
    val st = Association.chiSquareStat(d, "a", "b").collect()(0)
    assert(st.getLong(1) == 0L && st.getDouble(3) == 0.0)
    assert(st.getDouble(2) == 0.0)
  }

  test("chi2 equals the sum of quantized per-cell contribs (2x3 by hand)") {
    // obs: (x,u)=2 (x,v)=1 (x,w)=0 / (y,u)=0 (y,v)=1 (y,w)=2
    val d = df(Seq(("x", "u"), ("x", "u"), ("x", "v"),
      ("y", "v"), ("y", "w"), ("y", "w")))
    val cells = Association.chiSquareCells(d, "a", "b").collect()
    val byCell = cells.map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    val st = Association.chiSquareStat(d, "a", "b").collect()(0)
    assert(st.getLong(1) == 2L)
    assert(math.abs(byCell.values.sum - st.getDouble(2)) < 1e-9)
    // exp(x,u) = 3*2/6 = 1 -> contrib (2-1)^2/1 = 1
    assert(byCell(("x", "u")) == 1.0)
    assert(byCell(("x", "w")) == 1.0) // (0-1)^2/1
  }

  test("linearTrend: exact line recovered with r2 = 1, flat line r2 = 0") {
    import spark.implicits._
    val d = (Seq.tabulate(10)(i => ("up", i.toLong, 2.5 * i + 7.0)) ++
      Seq.tabulate(10)(i => ("flat", i.toLong, 4.0))).toDF("g", "x", "y")
    val out = graft.operators.Association.linearTrend(d, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("up") == ((10L, 2.5, 7.0, 1.0)))
    // zero slope and zero y-variance: denY = 0 -> r2 pinned 0
    assert(out("flat") == ((10L, 0.0, 4.0, 0.0)))
  }

  test("linearTrend: degenerate groups pin to zero") {
    import spark.implicits._
    val d = Seq(("one", 5L, 9.0), ("samex", 3L, 1.0), ("samex", 3L, 2.0))
      .toDF("g", "x", "y")
    val out = graft.operators.Association.linearTrend(d, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("one") == ((0.0, 0.0, 0.0)))   // n < 2
    assert(out("samex") == ((0.0, 0.0, 0.0))) // zero x-variance
  }

  test("linearTrend: noisy slope lands near truth with 0 < r2 < 1") {
    import spark.implicits._
    val d = Seq.tabulate(50)(i =>
      ("g", i.toLong, 3.0 * i + (if (i % 2 == 0) 5.0 else -5.0)))
      .toDF("g", "x", "y")
    val r = graft.operators.Association.linearTrend(d, "g", "x", "y")
      .collect()(0)
    assert(math.abs(r.getDouble(2) - 3.0) < 0.1, s"slope=${r.getDouble(2)}")
    assert(r.getDouble(4) > 0.9 && r.getDouble(4) < 1.0)
  }

  test("welchT: hand-computed statistic, degenerate pinning, group isolation") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0),
      ("c", 999.0)) // other groups never contaminate the comparison
      .toDF("g", "v")
    val r = graft.operators.Association.welchT(df, "g", "v", "a", "b")
      .collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
    // t = -3 / sqrt(1/3 + 1/3) = -3.674235 (6dp)
    assert(r.getDouble(6) == -3.674235)
    // n < 2 on either side pins t to 0
    val d2 = Seq(("a", 1.0), ("b", 4.0), ("b", 5.0)).toDF("g", "v")
    assert(graft.operators.Association.welchT(d2, "g", "v", "a", "b")
      .collect()(0).getDouble(6) == 0.0)
  }

  private def basket(rows: Seq[(Long, String)], minSupport: Long) = {
    import spark.implicits._
    graft.operators.Association.marketBasket(
      rows.toDF("bk", "it"), "bk", "it", minSupport)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
  }

  test("marketBasket: hand-computed support / confidence / lift") {
    // 4 baskets: {a,b}, {a,b,c}, {a,c}, {b}
    val rows = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b", 2L -> "c",
      3L -> "a", 3L -> "c", 4L -> "b")
    val out = basket(rows, 1L)
    // a:3 b:3 c:2, ab:2, ac:2, bc:1, N=4
    assert(out(("a", "b")) ==
      ((2L, 3L, 3L, 0.5, 0.666667, 0.666667, 0.888889)))
    assert(out(("a", "c")) == ((2L, 3L, 2L, 0.5, 0.666667, 1.0, 1.333333)))
    assert(out(("b", "c")) ==
      ((1L, 3L, 2L, 0.25, 0.333333, 0.5, 0.666667)))
  }

  test("marketBasket: minSupport prunes items before pairing") {
    val rows = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b", 2L -> "c",
      3L -> "a", 3L -> "c", 4L -> "b")
    val out = basket(rows, 2L)
    // all items survive (a:3 b:3 c:2) but bc (n_ab=1) is cut
    assert(out.keySet == Set(("a", "b"), ("a", "c")))
    assert(basket(rows, 3L).isEmpty) // no PAIR reaches 3 baskets
  }

  test("marketBasket: duplicate (basket, item) rows count once") {
    val rows = Seq(1L -> "a", 1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b")
    val out = basket(rows, 1L)
    assert(out(("a", "b"))._1 == 2L)
    assert(out(("a", "b"))._2 == 2L)
  }

  test("marketBasket: independent items have lift 1") {
    // a and b in all 4 baskets: P(ab)=1, lift = 1
    val rows = (1L to 4L).flatMap(i => Seq(i -> "a", i -> "b"))
    assert(basket(rows, 1L)(("a", "b"))._7 == 1.0)
  }

  test("marketBasket: item-item cosine = n_ab / sqrt(n_a*n_b)") {
    import spark.implicits._
    // ab co-occur twice; a in 4 baskets, b in 2: cos = 2/sqrt(8)
    val rows = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b",
      3L -> "a", 4L -> "a")
    val cos = graft.operators.Association.marketBasket(
        rows.toDF("bk", "it"), "bk", "it", 1L)
      .collect()(0).getDouble(9)
    assert(cos == math.floor(2.0 / math.sqrt(8.0) * 1e6 + 0.5) / 1e6)
  }
}
