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
}
