package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics: latest right row matched WHOLESALE (pandas
  * merge_asof / kdb aj) — a null field in the matched row stays null, and
  * all carried columns come from the same right row.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("basic most-recent match with equal-time right row included") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 90.0))
      .toDF("k", "rt", "price")
    val out = AsOfJoin(left, right, "k", "k", "t", "rt")
      .orderBy("ev").collect()
    // e1@t=10 matches right@10 (<=), e2@t=20 matches right@15, e3@t=5 none
    assert(out.map(r => Option(r.get(r.fieldIndex("asof_price")))).toSeq ==
      Seq(Some(100.0), Some(150.0), None))
  }

  test("null field in the latest right row is NOT back-filled from older rows") {
    val left = Seq((1L, 30L, "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 10L, Some(100.0), Some("a")),
      (1L, 20L, None: Option[Double], Some("b")) // latest row: price is null
    ).toDF("k", "rt", "price", "tag")
    val row = AsOfJoin(left, right, "k", "k", "t", "rt").collect().head
    // pandas merge_asof: the t=20 row wins wholesale -> price null, tag "b"
    assert(row.isNullAt(row.fieldIndex("asof_price")))
    assert(row.getString(row.fieldIndex("asof_tag")) == "b")
  }

  test("all carried columns come from the same right row") {
    val left = Seq((1L, 100L, "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 10L, Some("p_old"), None: Option[String]),
      (1L, 20L, None: Option[String], Some("q_new"))
    ).toDF("k", "rt", "p", "q")
    val row = AsOfJoin(left, right, "k", "k", "t", "rt").collect().head
    // a per-column carry would mix rows: p from t=10, q from t=20
    assert(row.isNullAt(row.fieldIndex("asof_p")))
    assert(row.getString(row.fieldIndex("asof_q")) == "q_new")
  }

  test("forward: earliest at-or-after match; strict excludes equal time") {
    val left = Seq((1L, 10L, "e1"), (1L, 16L, "e2"), (2L, 99L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (1L, 20L, 200.0),
      (2L, 5L, 50.0)).toDF("k", "rt", "price")
    def prices(strict: Boolean) =
      AsOfJoin.forward(left, right, "k", "k", "t", "rt", strict = strict)
        .orderBy("ev").collect()
        .map(r => Option(r.get(r.fieldIndex("asof_price")))).toSeq
    // inclusive: e1@10 -> right@10; e2@16 -> right@20; e3@99 -> none
    assert(prices(strict = false) == Seq(Some(100.0), Some(200.0), None))
    // strict: e1@10 skips the equal-time row -> right@15
    assert(prices(strict = true) == Seq(Some(150.0), Some(200.0), None))
  }

  test("forward self-join: next order per key, last row unmatched") {
    val orders = Seq((1L, 10L, 101L), (1L, 20L, 102L), (1L, 30L, 103L),
      (2L, 5L, 201L)).toDF("k", "t", "oid")
    val out = AsOfJoin.forward(
        orders, orders.select($"k".as("rk"), $"t".as("rt"), $"oid".as("roid")),
        "k", "rk", "t", "rt", rightValues = Seq("roid"), strict = true)
      .orderBy("oid").collect()
      .map(r => (r.getLong(r.fieldIndex("oid")),
        Option(r.get(r.fieldIndex("asof_roid"))))).toSeq
    assert(out == Seq(101L -> Some(102L), 102L -> Some(103L),
      103L -> None, 201L -> None))
  }
}
