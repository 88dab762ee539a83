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
}
