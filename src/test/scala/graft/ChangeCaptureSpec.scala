package graft

import java.sql.Timestamp

import graft.operators.ChangeCapture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ChangeCapture.scd2]] — run compaction into validity intervals. */
class ChangeCaptureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def t(s: String) = Timestamp.valueOf(s)

  test("runs compact, intervals chain half-open, last run stays open") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", t("2024-01-01 00:00:00"), 1L),
      (1L, "a", t("2024-01-02 00:00:00"), 2L),
      (1L, "b", t("2024-01-03 00:00:00"), 3L),
      (1L, "a", t("2024-01-04 00:00:00"), 4L), // back to a = NEW run
      (2L, "x", t("2024-01-01 00:00:00"), 5L)
    ).toDF("k", "v", "ts", "id")
    val out = ChangeCapture.scd2(df, "k", "v", "ts", "id")
      .orderBy("k", "valid_from").collect()
    val rows = out.map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, "a", t("2024-01-01 00:00:00"), Some(t("2024-01-03 00:00:00")), 2L),
      (1L, "b", t("2024-01-03 00:00:00"), Some(t("2024-01-04 00:00:00")), 1L),
      (1L, "a", t("2024-01-04 00:00:00"), None, 1L),
      (2L, "x", t("2024-01-01 00:00:00"), None, 1L)))
  }

  test("equal timestamps break ties on the tie column; null is a state") {
    import spark.implicits._
    val ts0 = t("2024-01-01 00:00:00")
    val df = Seq(
      (1L, Option("a"), ts0, 2L),
      (1L, Option.empty[String], ts0, 1L), // first by tie-break
      (1L, Option.empty[String], ts0, 3L)  // run continues: null == null
    ).toDF("k", "v", "ts", "id")
    val out = ChangeCapture.scd2(df, "k", "v", "ts", "id")
      .orderBy("valid_from", "n_events").collect()
      .map(r => (Option(r.getString(1)), r.getLong(4)))
    // order: null(id1) -> a(id2) -> null(id3): three runs of 1 each...
    // ids 1,2,3 sort as null, a, null -> runs (null,1), (a,1), (null,1)
    assert(out.toSeq == Seq((None, 1L), (Some("a"), 1L), (None, 1L)))
  }

  test("asOf returns each key's value at an instant") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", t("2024-01-01 00:00:00"), 1L),
      (1L, "b", t("2024-01-05 00:00:00"), 2L),
      (2L, "x", t("2024-01-04 00:00:00"), 3L)
    ).toDF("k", "v", "ts", "id")
    val hist = ChangeCapture.scd2(df, "k", "v", "ts", "id")
    val got = ChangeCapture.asOf(hist, lit(t("2024-01-04 12:00:00")))
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "x"))
    // before key 2 existed
    val earlier = ChangeCapture.asOf(hist, lit(t("2024-01-02 00:00:00")))
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(earlier == Map(1L -> "a"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4)))
      .sortBy(x => (x._1, x._3.getTime)).toSeq

  test("scd2Merge == full recompaction: absorb, close, new keys, multi-run batches") {
    import spark.implicits._
    val all = Seq(
      // key 1: run continues across the boundary (absorb + later change)
      (1L, "a", t("2024-01-01 00:00:00"), 1L),
      (1L, "a", t("2024-01-03 00:00:00"), 2L), // batch: same value -> absorb
      (1L, "b", t("2024-01-04 00:00:00"), 3L), // then a change
      // key 2: value changes exactly at the boundary
      (2L, "x", t("2024-01-01 00:00:00"), 4L),
      (2L, "y", t("2024-01-03 12:00:00"), 5L),
      // key 3: exists only in history
      (3L, "h", t("2024-01-01 00:00:00"), 6L),
      // key 4: exists only in the batch, two runs
      (4L, "n", t("2024-01-03 00:00:00"), 7L),
      (4L, "m", t("2024-01-05 00:00:00"), 8L)
    ).toDF("k", "v", "ts", "id")
    val cut = t("2024-01-02 00:00:00")
    val hist = ChangeCapture.scd2(all.where($"ts" < cut), "k", "v", "ts", "id")
    val merged = ChangeCapture.scd2Merge(hist,
      all.where($"ts" >= cut), "k", "v", "ts", "id")
    val full = ChangeCapture.scd2(all, "k", "v", "ts", "id")
    assert(canon(merged) == canon(full))
  }

  test("scd2Merge rejects late events loudly") {
    import spark.implicits._
    val hist = ChangeCapture.scd2(
      Seq((1L, "a", t("2024-01-05 00:00:00"), 1L)).toDF("k", "v", "ts", "id"),
      "k", "v", "ts", "id")
    val late = Seq((1L, "b", t("2024-01-01 00:00:00"), 2L))
      .toDF("k", "v", "ts", "id")
    val e = intercept[IllegalArgumentException] {
      ChangeCapture.scd2Merge(hist, late, "k", "v", "ts", "id")
    }
    assert(e.getMessage.contains("late events"))
  }

  test("no global window: every exchange is hash-partitioned on the key") {
    import spark.implicits._
    val df = Seq((1L, "a", t("2024-01-01 00:00:00"), 1L)).toDF("k", "v", "ts", "id")
    val plan = ChangeCapture.scd2(df, "k", "v", "ts", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"found a global exchange:\n$plan")
  }

  private def diff(oldRows: Seq[(Long, String, Option[Double])],
      newRows: Seq[(Long, String, Option[Double])]) = {
    import spark.implicits._
    val o = oldRows.toDF("k", "s", "x")
    val n = newRows.toDF("k", "s", "x")
    ChangeCapture.snapshotDiff(o, n, Seq("k"), Seq("s", "x"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2))))).toMap
  }

  test("snapshotDiff: added / removed / changed / unchanged classification") {
    val out = diff(
      oldRows = Seq((1L, "a", Some(1.0)), (2L, "b", Some(2.0)),
        (3L, "c", Some(3.0))),
      newRows = Seq((1L, "a", Some(1.0)), (2L, "B", Some(2.5)),
        (4L, "d", Some(4.0))))
    assert(out == Map(
      2L -> (("changed", Some("s,x"))),
      3L -> (("removed", None)),
      4L -> (("added", None))))
  }

  test("snapshotDiff: null-safe compare — null→value changes, null==null does not") {
    val out = diff(
      oldRows = Seq((1L, "a", None), (2L, "b", None)),
      newRows = Seq((1L, "a", Some(9.0)), (2L, "b", None)))
    assert(out == Map(1L -> (("changed", Some("x")))))
  }

  test("schemaDiff: added / removed / type-changed incl. nullability") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val oldDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType, nullable = true),
        StructField("b", StringType), StructField("c", DoubleType))))
    val newDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType, nullable = false),
        StructField("c", StringType), StructField("d", IntegerType))))
    val out = ChangeCapture.schemaDiff(oldDf, newDf)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.getString(2)), Option(r.getString(3)))))
      .toMap
    assert(out("b") == (("removed", Some("string"), None)))
    assert(out("d") == (("added", None, Some("int"))))
    assert(out("a") == (("type_changed", Some("bigint"),
      Some("bigint not null"))))
    assert(out("c") == (("type_changed", Some("double"), Some("string"))))
    // identical schemas: empty diff
    assert(ChangeCapture.schemaDiff(oldDf, oldDf).count() == 0)
  }

  test("snapshotDiff: changed_cols lists only the differing columns, name-sorted") {
    val out = diff(
      oldRows = Seq((1L, "a", Some(1.0))),
      newRows = Seq((1L, "z", Some(1.0))))
    assert(out(1L) == (("changed", Some("s"))))
  }
}
