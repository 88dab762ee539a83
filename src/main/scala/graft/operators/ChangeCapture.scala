package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction: collapse a per-key event/observation
  * stream into SCD2-style validity intervals — one row per run of equal
  * values, `[valid_from, valid_to)` half-open, `valid_to` null for the
  * currently-open run.
  *
  * This is the batch side of a dimension-history pipeline: replaying a
  * crawl/CDC log into "what was the value of X for key K at time T"
  * without storing every observation.
  *
  * Scale shape: every window is partitioned by the key — shuffle once on
  * the key, sort within partitions, no global window anywhere. Run
  * detection is lag + running sum inside that partition order, the run
  * compaction is a key-local groupBy on the same partitioning (Catalyst
  * reuses the exchange), and the interval chaining is a second key-local
  * window over the ALREADY-compacted (runs-sized, not events-sized)
  * frame. Skewed keys degrade one partition's sort, not the plan.
  */
object ChangeCapture {

  /** Compact `df` into validity intervals of `valueCol` per `keyCol`.
    *
    * Ordering within a key is `(tsCol, tieCol)` — the tie-breaker makes
    * the result deterministic when observations share a timestamp. Value
    * comparison is null-safe (a null value is a state like any other); a
    * key's first observation always opens a run.
    *
    * Output: `(keyCol, valueCol, valid_from, valid_to, n_events)`.
    */
  def scd2(df: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val flagged = df
      .select(col(keyCol), col(valueCol), col(tsCol), col(tieCol))
      .withColumn("__chg",
        when(row_number().over(w) === 1 ||
          !(col(valueCol) <=> lag(col(valueCol), 1).over(w)), 1L)
          .otherwise(0L))
      .withColumn("__run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged
      .groupBy(col(keyCol), col("__run"))
      // the value is constant within a run by construction; min() is a
      // deterministic way to pick it (first() is not)
      .agg(min(col(valueCol)).as(valueCol),
        min(col(tsCol)).as("valid_from"),
        count(lit(1L)).as("n_events"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .select(col(keyCol), col(valueCol), col("valid_from"),
        col("valid_to"), col("n_events"))
  }

  /** Point-in-time lookup over an SCD2 frame: the value of each key as of
    * `at` (rows whose interval contains the instant).
    */
  def asOf(scd2Frame: DataFrame, at: Column): DataFrame =
    scd2Frame.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
