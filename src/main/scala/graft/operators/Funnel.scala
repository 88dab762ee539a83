package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention — the
  * "group-wise insight" family (SURVEY §2.5) extended to the questions an
  * events table actually gets asked.
  *
  * Scale shape: both operators are chains of per-user aggregates — every
  * shuffle is keyed on the user column, each stage's frame is one row per
  * user-that-reached-it (monotonically shrinking), and the final rollups
  * are counts over those. No windows over the raw event stream, nothing
  * corpus-quadratic, nothing collected.
  */
object Funnel {

  /** Strictly-ordered funnel: a user reaches step i when an event of
    * `steps(i)` exists STRICTLY AFTER their step-(i-1) reach time (first
    * qualifying occurrence — the standard first-touch funnel). Returns one
    * row per step: `(step bigint, event_type, users bigint)`, users
    * non-increasing.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "empty funnel")
    val spark = events.sparkSession
    import spark.implicits._
    // stage 0: first occurrence of the entry step per user. Each stage is
    // persisted for exactly two uses (its count and the next stage's
    // join), then released.
    var reached = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .persist()
    var out = Seq((1L, steps.head, reached.count()))
    steps.drop(1).foreach { st =>
      // next stage: first qualifying occurrence strictly after the
      // previous reach time; the join's right side shrinks every stage
      val prev = reached
      reached = events.where(col(typeCol) === st)
        .join(prev.select(col(userCol), col("__t").as("__prev")), userCol)
        .where(col(tsCol) > col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .persist()
      out = out :+ ((out.size + 1L, st, reached.count()))
      prev.unpersist(blocking = false)
    }
    reached.unpersist(blocking = false)
    out.toDF("step", "event_type", "users")
  }

  /** Weekly cohort retention: users grouped by the week of their FIRST
    * event; `(cohort_week date, week_offset bigint, users bigint)` counts
    * distinct users of each cohort active in each subsequent week.
    * Weeks are `date_trunc("week", …)` (ISO Monday start, session-zone
    * UTC); offsets are exact day-difference / 7.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first"))
    events
      .join(first, userCol)
      .select(col(userCol),
        date_trunc("week", col("__first")).cast("date").as("cohort_week"),
        date_trunc("week", col(tsCol)).cast("date").as("__week"))
      .groupBy(col("cohort_week"),
        (datediff(col("__week"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count_distinct(col(userCol)).as("users"))
  }

  /** Churn hazard table — the survival-analysis view of the event stream:
    * per day, the users still AT RISK (active at some point, not yet
    * churned, churn = last active day when it precedes the observation
    * end; users last seen ON the end day are right-CENSORED, not churned)
    * and the churn events, with the hazard rate `d/n` as one IEEE
    * division, 6dp-quantized.
    *
    * Scale shape: ONE per-user aggregate (last active day) + a 1-row max;
    * the day frame and its cumulative are localized (bounded by
    * `maxDays`). Nothing row-proportional past the first scan.
    *
    * The Kaplan–Meier survival curve `S(t) = Π (1 − dᵢ/nᵢ)` is the
    * sequential-product view of this frame — [[kaplanMeier]] computes it
    * driver-side (the PSI convention: a cumulative IEEE product has no
    * engine-portable exact form, so the ORACLE surface is the hazard
    * table and the curve is a convenience).
    */
  def churnHazard(events: DataFrame, userCol: String, tsCol: String,
      maxDays: Int = 100000): DataFrame = {
    val day = floor(col(tsCol).cast("long") / lit(86400.0)).cast("long")
    val last = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol)).agg(max(day).as("__last"))
    val horizon = last.agg(max(col("__last")).as("__end"),
      count(lit(1)).as("__n_users"))
    val deaths = last.crossJoin(broadcast(horizon))
      .where(col("__last") < col("__end")) // end-day users are censored
      .groupBy(col("__last").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val frame = localized(
      deaths.crossJoin(broadcast(horizon)), maxDays)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    frame
      .withColumn("n_at_risk",
        col("__n_users") - coalesce(sum(col("n_events")).over(w), lit(0L)))
      .withColumn("hazard",
        floor(col("n_events").cast("double") /
          col("n_at_risk").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
      .select(col("day"), col("n_at_risk"), col("n_events"), col("hazard"))
      .orderBy(col("day"))
  }

  /** Driver-side Kaplan–Meier survival curve over a [[churnHazard]] frame
    * (see its doc for why the product is not oracle surface): returns
    * `(day, survival)` with the sequential product of `(1 − d/n)`.
    */
  def kaplanMeier(hazardFrame: DataFrame): Seq[(Long, Double)] = {
    val rows = hazardFrame.select(col("day"), col("n_at_risk"),
      col("n_events")).collect().sortBy(_.getLong(0))
    var s = 1.0
    rows.map { r =>
      s *= 1.0 - r.getLong(2).toDouble / r.getLong(1).toDouble
      (r.getLong(0), s)
    }.toSeq
  }

  private def localized(df: DataFrame, maxRows: Int): DataFrame = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"hazard frame exceeded $maxRows days; coarsen the horizon")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}
