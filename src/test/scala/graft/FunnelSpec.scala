package graft

import java.sql.Timestamp

import graft.operators.Funnel
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[Funnel.funnel]] / [[Funnel.cohortRetention]]. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def t(s: String) = Timestamp.valueOf(s)

  test("funnel: strict ordering — same-timestamp and out-of-order don't count") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes in order
      (1L, "a", t("2024-01-01 10:00:00")),
      (1L, "b", t("2024-01-01 11:00:00")),
      (1L, "c", t("2024-01-01 12:00:00")),
      // user 2: b BEFORE a, then no later b -> stops at a
      (2L, "b", t("2024-01-01 09:00:00")),
      (2L, "a", t("2024-01-01 10:00:00")),
      // user 3: b at the SAME instant as a -> strict > excludes it
      (3L, "a", t("2024-01-01 10:00:00")),
      (3L, "b", t("2024-01-01 10:00:00")),
      // user 4 never enters
      (4L, "b", t("2024-01-01 10:00:00"))
    ).toDF("u", "et", "ts")
    val got = Funnel.funnel(ev, "u", "et", "ts", Seq("a", "b", "c"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 3L), (2L, "b", 1L), (3L, "c", 1L)))
  }

  test("funnel: re-entry uses first occurrence, later repeats don't help") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", t("2024-01-01 10:00:00")),
      (1L, "a", t("2024-01-03 10:00:00")), // later 'a' must not reset
      (1L, "b", t("2024-01-02 10:00:00"))  // after FIRST a -> counts
    ).toDF("u", "et", "ts")
    val got = Funnel.funnel(ev, "u", "et", "ts", Seq("a", "b"))
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 1L))
  }

  test("cohortRetention: offsets count from the first-event week") {
    import spark.implicits._
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), // Monday, cohort week 2024-01-01
      (1L, t("2024-01-10 10:00:00")), // week of 2024-01-08 -> offset 1
      (1L, t("2024-01-21 10:00:00")), // Sunday of week 2024-01-15 -> offset 2
      (2L, t("2024-01-10 10:00:00"))  // cohort 2024-01-08, offset 0
    ).toDF("u", "ts")
    val got = Funnel.cohortRetention(ev, "u", "ts").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("churnHazard: at-risk ladder, end-day censoring, KM curve by hand") {
    import spark.implicits._
    // 5 users; last active days: u1 -> d1, u2 -> d1, u3 -> d2, u4 & u5
    // -> d3 (the horizon: censored, never counted as churn)
    val ev = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-02 08:00:00"),
      (2L, "2024-01-02 09:00:00"),
      (3L, "2024-01-03 08:00:00"),
      (4L, "2024-01-01 08:00:00"), (4L, "2024-01-04 08:00:00"),
      (5L, "2024-01-04 09:00:00"))
      .toDF("u", "ts_s").withColumn("ts", col("ts_s").cast("timestamp"))
    val hz = Funnel.churnHazard(ev, "u", "ts")
    val rows = hz.collect().map(r =>
      (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // day1: 5 at risk, 2 churn (u1, u2) -> hazard 0.4
    // day2: 3 at risk, 1 churn (u3)     -> hazard 0.333333
    assert(rows.toSeq == Seq((5L, 2L, 0.4), (3L, 1L, 0.333333)))
    // KM: s1 = 0.6, s2 = 0.6 * (2/3) = 0.4 (within IEEE of the chain)
    val km = Funnel.kaplanMeier(hz).map(_._2)
    assert(math.abs(km(0) - 0.6) < 1e-12)
    assert(math.abs(km(1) - 0.4) < 1e-12)
  }
}
