package graft

import graft.operators.Features
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Features]] — target encoding shrink, quantile binning, min-max
  * scaling, transition matrix; by hand on tiny frames.
  */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("targetEncode: shrinks toward the global mean by category size") {
    import spark.implicits._
    // global mean 10; cat "big" (n=4, mean 20), "small" (n=1, mean -30)
    val df = (Seq.fill(4)(("big", 20.0)) ++ Seq(("small", -30.0)) ++
      Seq.fill(5)(("rest", 8.0))).toDF("c", "y")
    val out = Features.targetEncode(df, "c", "y", smoothing = 10.0)
      .select("c", "c_te").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gm = (4 * 20.0 - 30.0 + 5 * 8.0) / 10.0
    def expect(s: Double, n: Int) = (s + 10.0 * gm) / (n + 10.0)
    assert(math.abs(out("big") - expect(80.0, 4)) < 1e-6)
    assert(math.abs(out("small") - expect(-30.0, 1)) < 1e-6)
    // the rare category sits closer to the global mean than its own mean
    assert(math.abs(out("small") - gm) < math.abs(-30.0 - gm) / 2)
  }

  test("targetEncode: null category falls back to the global mean") {
    import spark.implicits._
    val df = Seq((Some("a"), 4.0), (Some("a"), 6.0), (None, 100.0))
      .toDF("c", "y")
    val out = Features.targetEncode(df, "c", "y", smoothing = 0.0)
      .where(col("c").isNull).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(2) == 5.0) // global mean of non-null cats
  }

  test("quantileBin: quartiles split a uniform column evenly") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val counts = Features.quantileBin(df, "v")
      .groupBy("v_bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0L, 1L, 2L, 3L))
    assert(counts.values.sum == 100L)
    counts.values.foreach(c => assert(c >= 24 && c <= 26, counts.toString))
  }

  test("minMaxScale: endpoints at 0/1, zero-range pins 0, nulls pass") {
    import spark.implicits._
    val df = Seq((Some(10.0), 5.0), (Some(20.0), 5.0), (None, 5.0))
      .toDF("a", "b")
    val out = Features.minMaxScale(df, Seq("a", "b")).collect()
    val byA = out.map(r => Option(r.get(0)) ->
      ((Option(r.get(2)), r.getDouble(3)))).toMap
    assert(byA(Some(10.0)) == ((Some(0.0), 0.0)))
    assert(byA(Some(20.0)) == ((Some(1.0), 0.0)))
    assert(byA(None) == ((None, 0.0)))
  }

  test("transitionMatrix: counts and row-normalized shares by hand") {
    import spark.implicits._
    // user 1: A->B->A->B ; user 2: A->A
    val df = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 5L, "A"), (2L, 6L, "A"))
      .toDF("k", "id", "st").withColumn("ts", col("id").cast("timestamp"))
    val out = Features.transitionMatrix(df, "k", "st", "ts", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("A", "B") -> ((2L, 2.0 / 3)), ("A", "A") -> ((1L, 1.0 / 3)),
      ("B", "A") -> ((1L, 1.0))))
  }

  test("transitionMatrix: first event per key is excluded") {
    import spark.implicits._
    val df = Seq((1L, 1L, "X"), (2L, 2L, "Y")).toDF("k", "id", "st")
      .withColumn("ts", col("id").cast("timestamp"))
    assert(Features.transitionMatrix(df, "k", "st", "ts", "id").count() == 0)
  }

  test("robustScale: outlier-immune fences, null pass, zero-IQR pin") {
    import spark.implicits._
    // values 1..9 plus a 1e9 sentinel: median 5.5, IQR = 7.75 - 3.25
    val df = ((1 to 9).map(_.toDouble) :+ 1e9)
      .zipWithIndex.map { case (v, i) => (i.toLong, Some(v)) }
      .toDF("id", "x")
      .unionAll(Seq((99L, Option.empty[Double])).toDF("id", "x"))
    val out = Features.robustScale(df, Seq("x"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // median of the 10 non-null values: (5+6)/2 = 5.5; q1 = 3.25, q3 = 7.75
    assert(out(4L) == Some(q6d((5.0 - 5.5) / 4.5)))
    assert(out(99L) == None)
    // the sentinel scales to a huge value but does NOT distort the others
    assert(out(0L) == Some(-1.0)) // (1 - 5.5)/4.5
    // zero-IQR: constant column pins 0
    val const = (1 to 5).map(i => (i.toLong, 7.0)).toDF("id", "x")
    assert(Features.robustScale(const, Seq("x"))
      .collect().forall(_.getDouble(2) == 0.0))
  }

  private def q6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("rfmSegments: quartile scores and segment codes by hand") {
    import spark.implicits._
    // four customers with strictly increasing f and m, decreasing recency
    val rows =
      Seq((1L, 0)).map { case (c, d) => (c, d, 10.0) } ++
        (1 to 2).map(d => (2L, d, 10.0)) ++
        (1 to 3).map(d => (3L, d, 10.0)) ++
        (1 to 4).map(d => (4L, d, 10.0))
    val df = rows.toDF("cust", "day", "amt")
      .withColumn("ts", (col("day") * 86400).cast("timestamp"))
    val out = Features.rfmSegments(df, "cust", "ts", "amt")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(7))))
      .toMap
    // maxday = 4: recencies 4,2,1,0; f 1,2,3,4; m 10,20,30,40
    assert(out(1L) == ((4L, 1L, 10.0, "4-1-1")))
    assert(out(2L) == ((2L, 2L, 20.0, "3-2-2")))
    assert(out(3L) == ((1L, 3L, 30.0, "2-3-3")))
    assert(out(4L) == ((0L, 4L, 40.0, "1-4-4")))
  }

  test("giniSplit: pure branches gain the full root impurity") {
    import spark.implicits._
    // feature perfectly separates the 50/50 target: root gini = 0.5,
    // each branch pure (gini 0), split impurity 0, gain 0.5
    val df = (1 to 10).map(i =>
      (if (i <= 5) "a" else "b", if (i <= 5) "x" else "y")).toDF("f", "t")
    val branches = Features.giniSplitBranches(df, "f", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(branches == Map("a" -> ((5L, 0.0, 0.0)),
      "b" -> ((5L, 0.0, 0.0))))
    val stat = Features.giniSplitStat(df, "f", "t").collect()(0)
    assert((stat.getLong(0), stat.getDouble(1), stat.getDouble(2),
      stat.getDouble(3)) == ((10L, 0.5, 0.0, 0.5)))
  }

  test("giniSplit: uninformative feature has ~zero gain") {
    import spark.implicits._
    // both branches mirror the global 50/50 target mix
    val df = (1 to 8).map(i =>
      (if (i % 2 == 0) "a" else "b", if (i % 4 < 2) "x" else "y"))
      .toDF("f", "t")
    val stat = Features.giniSplitStat(df, "f", "t").collect()(0)
    assert(stat.getDouble(1) == 0.5)         // root gini
    assert(stat.getDouble(3) == 0.0)         // no gain
    val branches = Features.giniSplitBranches(df, "f", "t").collect()
    assert(branches.forall(_.getDouble(2) == 0.5)) // each branch gini
  }

  test("giniFeatureRanking: perfect feature outranks noise; per-feature nulls respected") {
    import spark.implicits._
    // f_good separates the target perfectly; f_bad mirrors the mix;
    // f_sparse is null on half the rows (its n must shrink accordingly)
    val df = (1 to 12).map { i =>
      val t = if (i <= 6) "x" else "y"
      (t, t.toUpperCase, if (i % 2 == 0) "m" else "n",
        if (i <= 6) Some(s"s$t") else None)
    }.toDF("t", "f_good", "f_bad", "f_sparse")
    val out = Features.giniFeatureRanking(df,
        Seq("f_good", "f_bad", "f_sparse"), "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(4)))).toMap
    assert(out("f_good") == ((12L, 0.5, 0.5)))   // full gain
    assert(out("f_bad")._3 == 0.0)               // no gain
    assert(out("f_sparse")._1 == 6L)             // its own non-null n
    assert(out("f_sparse")._2 == 0.0)            // single class on that subset
    // ordering: best gain first
    val order = Features.giniFeatureRanking(df,
      Seq("f_good", "f_bad", "f_sparse"), "t")
      .collect().map(_.getString(0)).toSeq
    assert(order.head == "f_good")
  }

  test("rollingFeatures: lags and exact rolling mean by hand") {
    import spark.implicits._
    val df = Seq((1L, 1L, 2.0), (1L, 2L, 4.0), (1L, 3L, 9.0),
      (1L, 4L, 1.0), (2L, 5L, 7.0))
      .toDF("k", "id", "v").withColumn("ts", col("id").cast("timestamp"))
    val out = Features.rollingFeatures(df, "k", "ts", "id", "v")
      .orderBy("id").collect()
    def lag1(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(4)) None else Some(r.getDouble(4))
    assert(lag1(out(0)) == None && lag1(out(1)) == Some(2.0) &&
      lag1(out(2)) == Some(4.0) && lag1(out(3)) == Some(9.0))
    assert(lag1(out(4)) == None) // key-local: user 2 sees no user-1 rows
    // rolling mean of trailing 3: row 3 -> (2+4+9)/3 = 5.0,
    // row 4 -> (4+9+1)/3 = 4.666667
    assert(out(2).getDouble(6) == 5.0)
    assert(out(3).getDouble(6) == 4.666667)
    assert(out(0).getDouble(6) == 2.0)
  }

  test("rfmSegments: null customer / date / amount rows are excluded") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(1), Some(10.0)),
      (None, Some(1), Some(99.0)),
      (Some(2L), None, Some(99.0)),
      (Some(3L), Some(1), None))
      .toDF("cust", "day", "amt")
      .withColumn("ts", (col("day").cast("long") * 86400).cast("timestamp"))
    val out = Features.rfmSegments(df, "cust", "ts", "amt").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }
}
