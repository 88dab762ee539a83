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

  /** Incremental SCD2: fold a NEW batch of observations into an existing
    * [[scd2]] history WITHOUT replaying the events that built it — the
    * incremental-index pattern (nd1/nd2/nd3) applied to CDC. Work is
    * batch-sized: the batch compacts alone, then only the TOUCHED keys'
    * open runs join against it; closed history rows and untouched keys
    * pass through by reference.
    *
    * Contract: every batch observation for a key must be strictly later
    * than that key's open-run `valid_from` (in-order arrival — a crawl
    * /CDC log read forward). Late events need a replay of the affected
    * keys; this operator REJECTS them loudly rather than silently
    * mis-chaining intervals. Given in-order batches,
    * `scd2Merge(scd2(first), second) == scd2(first ∪ second)` exactly —
    * boundary runs with unchanged values merge (counts sum), changed
    * values close the open run at the batch run's start.
    */
  def scd2Merge(history: DataFrame, batch: DataFrame, keyCol: String,
      valueCol: String, tsCol: String, tieCol: String): DataFrame = {
    val batchRuns = scd2(batch, keyCol, valueCol, tsCol, tieCol)
      .withColumnRenamed("valid_from", "__bfrom")
      .withColumnRenamed("valid_to", "__bto")
      .withColumnRenamed("n_events", "__bn")
      .withColumnRenamed(valueCol, "__bval")
    val wB = Window.partitionBy(col(keyCol)).orderBy(col("__bfrom"))
    val firstRuns = batchRuns.withColumn("__rn", row_number().over(wB))

    val open = history.where(col("valid_to").isNull)
    val closed = history.where(col("valid_to").isNotNull)

    // loud in-order check: any batch observation at or before a key's
    // open-run start means a late event — bounded aggregate, one row
    val late = batchRuns.join(open, Seq(keyCol), "inner")
      .where(col("__bfrom") <= col("valid_from"))
      .limit(1).collect()
    require(late.isEmpty,
      s"scd2Merge: late events for key ${late.headOption.map(_.get(0))} — " +
        "batch observations must be strictly after the open run's start")

    // each touched key's FIRST batch run decides the boundary: same value
    // -> the open run ABSORBS it (counts sum, and the open run takes the
    // absorbed run's end — null only if the batch had no later run);
    // changed value -> the open run closes at the batch run's start
    val tsType = history.schema("valid_from").dataType
    val first = firstRuns.where(col("__rn") === 1)
      .select(col(keyCol), col("__bval").as("__fval"),
        col("__bfrom").as("__ffrom"), col("__bto").as("__fto"),
        col("__bn").as("__fn"))
    val mergedOpen = open.join(first, Seq(keyCol), "left")
      .select(
        col(keyCol), col(valueCol), col("valid_from"),
        when(col("__ffrom").isNull, lit(null).cast(tsType)) // untouched key
          .when(col(valueCol) <=> col("__fval"), col("__fto")) // absorbed
          .otherwise(col("__ffrom")) // closed by a changed value
          .as("valid_to"),
        (col("n_events") + when(col(valueCol) <=> col("__fval"),
          coalesce(col("__fn"), lit(0L))).otherwise(lit(0L))).as("n_events"))

    // batch runs that survive as their own rows: everything except a
    // first run absorbed into a same-value open run
    val openVals = open.select(col(keyCol), col(valueCol).as("__oval"),
      lit(true).as("__hasOpen"))
    val keptRuns = firstRuns.join(openVals, Seq(keyCol), "left")
      .where(!(col("__rn") === 1 && coalesce(col("__hasOpen"), lit(false)) &&
        (col("__bval") <=> col("__oval"))))
      .select(col(keyCol), col("__bval").as(valueCol),
        col("__bfrom").as("valid_from"), col("__bto").as("valid_to"),
        col("__bn").as("n_events"))

    closed.select(col(keyCol), col(valueCol), col("valid_from"),
        col("valid_to"), col("n_events"))
      .unionAll(mergedOpen)
      .unionAll(keptRuns)
  }

  /** Keyed snapshot diff — the data-versioning primitive: compare two
    * versions of a table and emit one row per key that was `added`,
    * `removed`, or `changed`, with the comma-joined (name-sorted) list of
    * columns whose values differ. Unchanged keys are dropped. The input
    * pair is typically two [[graft.sources.Versioned]] snapshot reads.
    *
    * Scale shape: ONE co-partitioned full-outer shuffle on the key
    * columns; every comparison is a map-side null-safe equality on the
    * joined row. No collect, no second pass — diffing two 50 TB snapshots
    * is exactly one join.
    *
    * Determinism: null-safe comparison (`<=>`), so null→value and
    * value→null count as changes; a null vs null cell does not.
    * `changed_cols` is null for added/removed rows.
    */
  /** Schema diff between two snapshots — the metadata companion to
    * [[snapshotDiff]]: one row per column that was `added`, `removed`,
    * or `type_changed` (nullability relaxation/tightening counts as a
    * type change). Pure driver-side metadata — schemas are not data; no
    * job runs. Sorted by column name for deterministic output.
    */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.schema.map(f => f.name -> f).toMap
    val n = newDf.schema.map(f => f.name -> f).toMap
    val rows =
      (n.keySet -- o.keySet).toSeq.map(c =>
        (c, "added", null: String, n(c).dataType.simpleString)) ++
      (o.keySet -- n.keySet).toSeq.map(c =>
        (c, "removed", o(c).dataType.simpleString, null: String)) ++
      (o.keySet & n.keySet).toSeq
        .filter(c => o(c).dataType != n(c).dataType ||
          o(c).nullable != n(c).nullable)
        .map { c =>
          def s(f: org.apache.spark.sql.types.StructField) =
            f.dataType.simpleString +
              (if (f.nullable) "" else " not null")
          (c, "type_changed", s(o(c)), s(n(c)))
        }
    import oldDf.sparkSession.implicits._
    rows.sortBy(_._1)
      .toDF("column", "change_type", "old_type", "new_type")
  }

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val cmp = compareCols.sorted
    val o = oldDf.select((keyCols.map(col) :+ lit(1L).as("__in_old")) ++
      cmp.map(c => col(c).as(s"__old_$c")): _*)
    val n = newDf.select((keyCols.map(col) :+ lit(1L).as("__in_new")) ++
      cmp.map(c => col(c).as(s"__new_$c")): _*)
    val j = o.join(n, keyCols, "full_outer")
    val changedCols = concat_ws(",", cmp.map(c =>
      when(!(col(s"__old_$c") <=> col(s"__new_$c")), lit(c))): _*)
    j.withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(changedCols =!= "", lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("change_type") =!= "unchanged")
      .select(keyCols.map(col) :+ col("change_type") :+
        when(col("change_type") === "changed", changedCols)
          .as("changed_cols"): _*)
  }
}
