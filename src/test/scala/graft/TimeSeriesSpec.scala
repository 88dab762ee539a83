package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TimeSeries]] — grid resample + forward fill and trailing z-score
  * anomalies, by hand on tiny keyed series.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ev(rows: Seq[(Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
  }

  test("resample: gaps forward-fill, step bounds per key, observed flags") {
    // user 1: days 0, 2 observed (gap at day 1); user 2: single day
    val df = ev(Seq(
      (1L, 1L, "2024-01-01 05:00:00", 10.0),
      (1L, 2L, "2024-01-03 06:00:00", 30.0),
      (2L, 3L, "2024-01-05 00:00:00", 7.0)))
    val out = TimeSeries.resample(df, "user_id", "ts", "event_id",
        "value", 86400L)
      .orderBy("user_id", "step_start").collect()
    assert(out.length == 4)
    assert(out.map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).toSeq
      == Seq((1L, 10.0, true), (1L, 10.0, false), (1L, 30.0, true),
        (2L, 7.0, true)))
    // steps are day-aligned and contiguous for user 1
    val days = out.filter(_.getLong(0) == 1L)
      .map(_.getTimestamp(1).toInstant.getEpochSecond).toSeq
    assert(days == Seq(days.head, days.head + 86400, days.head + 172800))
    assert(days.head % 86400 == 0)
  }

  test("resample: last observation in a step wins by (sec, id) tie-break") {
    val df = ev(Seq(
      (1L, 5L, "2024-01-01 01:00:00", 1.0),
      (1L, 6L, "2024-01-01 23:00:00", 2.0),
      // same second as id=8 — higher id wins
      (1L, 9L, "2024-01-02 10:00:00", 99.0),
      (1L, 8L, "2024-01-02 10:00:00", 50.0)))
    val out = TimeSeries.resample(df, "user_id", "ts", "event_id",
        "value", 86400L)
      .orderBy("step_start").collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(2.0, 99.0))
  }

  test("rollingAnomaly: constant series scores 0, a spike flags") {
    val base = (1L to 30L).map(i =>
      (1L, i, f"2024-01-01 00:${i}%02d:00", 5.0))
    val spiked = base.dropRight(1) :+
      ((1L, 30L, "2024-01-01 00:30:00", 500.0))
    val out = TimeSeries.rollingAnomaly(ev(spiked), "user_id", "ts",
        "event_id", "value", windowRows = 20, threshold = 3.0)
      .orderBy("event_id").collect()
    // all-constant prefix: zero variance -> z = 0, no flags
    assert(out.dropRight(1).forall(r =>
      r.getDouble(4) == 0.0 && !r.getBoolean(5)))
    val last = out.last
    assert(last.getDouble(4) > 3.0 && last.getBoolean(5),
      s"spike z=${last.getDouble(4)}")
  }

  test("rollingAnomaly: z matches a by-hand sample z-score") {
    // window of 3: values 1, 3, 8 -> mean 4, sample std sqrt(13)
    val df = ev(Seq(
      (1L, 1L, "2024-01-01 00:00:01", 1.0),
      (1L, 2L, "2024-01-01 00:00:02", 3.0),
      (1L, 3L, "2024-01-01 00:00:03", 8.0)))
    val out = TimeSeries.rollingAnomaly(df, "user_id", "ts", "event_id",
        "value", windowRows = 3, threshold = 3.0)
      .orderBy("event_id").collect()
    val expect = (8.0 - 4.0) / math.sqrt(13.0)
    assert(math.abs(out.last.getDouble(4) - expect) < 1e-6)
    // first row: n = 1 -> pinned 0
    assert(out.head.getDouble(4) == 0.0)
  }

  test("rollingAnomaly windows are key-local") {
    val df = ev(Seq(
      (1L, 1L, "2024-01-01 00:00:01", 100.0),
      (2L, 2L, "2024-01-01 00:00:02", 0.0),
      (2L, 3L, "2024-01-01 00:00:03", 0.1)))
    val out = TimeSeries.rollingAnomaly(df, "user_id", "ts", "event_id",
        "value", windowRows = 5, threshold = 3.0).collect()
    // user 1's lone big value never contaminates user 2's stats
    assert(out.forall(r => !r.getBoolean(5)))
  }

  test("periodGrowth: totals, lag and percent change by hand") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 60.0), (3L, 30.0))
      .toDF("period", "v")
    val out = TimeSeries.periodGrowth(df, "period", "v")
      .orderBy("period").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((1L, 30.0), (2L, 60.0), (3L, 30.0)))
    assert(out(0).isNullAt(4)) // first period has no growth
    assert(out(1).getDouble(4) == 100.0)
    assert(out(2).getDouble(4) == -50.0)
  }

  test("periodGrowth: zero previous total yields null growth") {
    import spark.implicits._
    val df = Seq((1L, 0.0), (2L, 5.0)).toDF("period", "v")
    val out = TimeSeries.periodGrowth(df, "period", "v")
      .orderBy("period").collect()
    assert(out(1).isNullAt(4))
  }

  test("userGrowth: DAU, first-time counts and exact cumulative distinct") {
    val df = ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", 0.0),
      (2L, 2L, "2024-01-01 11:00:00", 0.0),
      (1L, 3L, "2024-01-02 10:00:00", 0.0), // returning
      (3L, 4L, "2024-01-02 11:00:00", 0.0), // new
      (1L, 5L, "2024-01-04 09:00:00", 0.0))) // returning after a gap
    val out = TimeSeries.userGrowth(df, "user_id", "ts")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((2L, 2L, 2L), (2L, 1L, 3L), (1L, 0L, 3L)))
  }

  test("ewma: pandas adjust=True values on a two-point series") {
    val df = ev(Seq(
      (1L, 1L, "2024-01-01 00:00:01", 4.0),
      (1L, 2L, "2024-01-01 00:00:02", 8.0)))
    val out = TimeSeries.ewma(df, "user_id", "ts", "event_id", "value")
      .orderBy("event_id").collect()
    assert(out(0).getDouble(4) == 4.0) // single point: ewma = value
    // (8 + 0.75*4) / (1 + 0.75) = 6.285714...
    assert(out(1).getDouble(4) == 6.285714)
  }

  test("ewma: truncation — rows beyond the window stop contributing") {
    // 9 identical old values then a jump; with K = 8 the first value has
    // fallen out, so the smoothed value is the same as for an 8-row run
    def run(n: Int) = {
      val rows = (1 to n).map(i =>
        (1L, i.toLong, f"2024-01-01 00:00:$i%02d", 1.0)) :+
        (1L, (n + 1).toLong, f"2024-01-01 00:01:00", 100.0)
      TimeSeries.ewma(ev(rows), "user_id", "ts", "event_id", "value")
        .orderBy("event_id").collect().last.getDouble(4)
    }
    assert(run(8) == run(20))
  }

  test("activityStreaks: islands, longest run, multi-event days count once") {
    val df = ev(Seq(
      // user 1: days 1,2,3 (streak 3; day 2 twice), day 6 (streak 1)
      (1L, 1L, "2024-01-02 10:00:00", 0.0),
      (1L, 2L, "2024-01-03 09:00:00", 0.0),
      (1L, 3L, "2024-01-03 23:00:00", 0.0),
      (1L, 4L, "2024-01-04 01:00:00", 0.0),
      (1L, 5L, "2024-01-07 12:00:00", 0.0),
      // user 2: one day
      (2L, 6L, "2024-01-01 00:00:00", 0.0)))
    val out = TimeSeries.activityStreaks(df, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4L, 2L, 3L))) // 4 active days, 2 streaks, longest 3
    assert(out(2L) == ((1L, 1L, 1L)))
  }

  test("ewma: key-local and null values drop out of both sums") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "2024-01-01 00:00:01", Some(100.0)),
      (2L, 2L, "2024-01-01 00:00:02", Some(4.0)),
      (2L, 3L, "2024-01-01 00:00:03", None),
      (2L, 4L, "2024-01-01 00:00:04", Some(8.0)))
      .toDF("user_id", "event_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = TimeSeries.ewma(df, "user_id", "ts", "event_id", "value")
      .orderBy("event_id").collect()
    assert(out(1).getDouble(4) == 4.0)    // user 1 never leaks into user 2
    // null value row: the pandas convention — smooth from the non-null
    // history (only the 4.0 at lag 1 contributes)
    assert(out(2).getDouble(4) == 4.0)
    // null row drops out: weights are lag-POSITION based, so 8.0 pairs
    // with 4.0 at lag 2: (8*16384 + 4*9216) / (16384 + 9216)
    val expect = (8.0 * 16384 + 4.0 * 9216) / (16384 + 9216)
    assert(math.abs(out(3).getDouble(4) - expect) < 1e-6)
  }
}
