package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization and monitoring over an event stream: resample
  * an irregular series onto a fixed grid with forward fill, and flag
  * anomalies against a trailing window — the standard prep before any
  * windowed feature extraction or seasonal model, and the reference's
  * "analyze this time column" ask class done scale-first.
  *
  * Scale shape: everything is KEY-LOCAL. The grid is `keys × grid steps`
  * (independent of event volume — 100× more events per key do not grow
  * the grid), built from a per-key min/max aggregate and a map-only
  * `sequence` explode; the per-step last observation is one map-side-
  * combined aggregate; forward fill and trailing stats are windows
  * partitioned BY KEY — no global ordering anywhere. At 100 TB the only
  * full-data costs are the initial scans and one shuffle keyed
  * (key, step).
  */
object TimeSeries {

  /** Resample an irregular per-key series onto a fixed `stepSeconds` grid
    * spanning each key's own [first, last] observation (so every key's
    * first grid row is observed and forward fill is total). Output:
    * `(key, step_start, value, observed)` — `value` is the LAST
    * observation in the step, carried forward through empty steps
    * verbatim (no arithmetic, so doubles hash bit-identically);
    * `observed` marks real steps. Ties inside a step break by
    * `(tsCol, tieCol)` descending — `tieCol` must make the order total
    * (an event id).
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, stepSeconds: Long): DataFrame = {
    val step = (col(tsCol).cast("long") / lit(stepSeconds)).cast("long") *
      lit(stepSeconds)
    val stepped = df.select(col(keyCol), col(tsCol), col(tieCol),
      col(valueCol), step.as("__step"))
    // last observation per (key, step): max over the (ts, tie, value)
    // struct — (ts, tie) is a total order, value just rides along
    val obs = stepped
      .groupBy(col(keyCol), col("__step"))
      .agg(max(struct(col(tsCol).cast("long"), col(tieCol),
        col(valueCol))).as("__m"))
      .select(col(keyCol), col("__step"),
        col(s"__m.$valueCol").as("__obs_value"))
    val grid = stepped
      .groupBy(col(keyCol))
      .agg(min(col("__step")).as("__lo"), max(col("__step")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"),
        lit(stepSeconds))).as("__step"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__step"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "__step"), "left")
      .withColumn("value",
        last(col("__obs_value"), ignoreNulls = true).over(w))
      .withColumn("observed", col("__obs_value").isNotNull)
      .select(col(keyCol), timestamp_seconds(col("__step")).as("step_start"),
        col("value"), col("observed"))
  }

  /** Trailing-window z-score anomaly flags per key: each row scored
    * against the sample mean/stddev of the previous `windowRows`
    * observations INCLUDING itself, ordered by `(tsCol, tieCol)` within
    * the key. Output adds `(z, is_anomaly)`; rows whose window has < 2
    * points or zero variance get z = 0.
    *
    * Determinism: values are 6dp-quantized to exact integers; the window
    * sum and sum-of-squares accumulate as BIGINT / DECIMAL(38,0) (both
    * exact, so sliding-frame evaluation order is irrelevant — DuckDB's
    * segment-tree and Spark's running frames agree bit-for-bit), and the
    * z finish is a fixed IEEE sequence, 6dp-quantized. Magnitude bound:
    * |value| ≤ 2e12 keeps q² inside DECIMAL(38,0) for any window size
    * ≤ 1e13.
    */
  def rollingAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, windowRows: Int = 20,
      threshold: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(windowRows - 1).toLong, Window.currentRow)
    val q = floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long")
    val qq = (q.cast("decimal(19,0)") * q.cast("decimal(19,0)"))
      .cast("decimal(38,0)")
    val base = df
      .withColumn("__q", q)
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__q")).over(w))
      .withColumn("__ss", sum(qq).over(w).cast("double"))
    // sample variance in q-units²: (n·Σq² − (Σq)²) / (n·(n−1)); z is
    // scale-free so the 1e6 cancels
    val nD = col("__n").cast("double")
    val sD = col("__s").cast("double")
    val qD = col("__q").cast("double")
    val varNum = nD * col("__ss") - sD * sD
    val z = (qD * nD - sD) /
      (nD * sqrt(varNum / (nD * (nD - lit(1.0)))))
    base
      .withColumn("z",
        when(col("__n") >= 2 && varNum > 0,
          floor(z * lit(1e6) + lit(0.5)) / lit(1e6))
          .otherwise(lit(0.0)))
      .withColumn("is_anomaly", abs(col("z")) > lit(threshold))
      .drop("__q", "__n", "__s", "__ss")
  }

  private def localized(df: DataFrame, maxRows: Int): DataFrame = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"period frame exceeded $maxRows rows; coarsen the period")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Period-over-period growth: aggregate `valueCol` per integer period
    * (e.g. yyyymm), attach the previous period's total and the percent
    * change — the month-over-month revenue view every business rollup
    * starts from.
    *
    * Scale shape: ONE map-side-combined `groupBy(period)` scan; the
    * shuffle is as wide as the period count. The lag runs on the
    * LOCALIZED period frame (bounded by `maxPeriods`, loud error beyond
    * — a finer-than-bounded period axis is the wrong rollup), so no
    * global window ever touches the fact table.
    *
    * Determinism: totals are 6dp-quantized DECIMAL(38,0) sums; the
    * growth percent is `((cur − prev) / prev) · 100` as one fixed IEEE
    * sequence, 6dp-quantized; the first period's growth is null.
    */
  def periodGrowth(df: DataFrame, periodCol: String, valueCol: String,
      maxPeriods: Int = 100000): DataFrame = {
    val per = localized(
      df.where(col(periodCol).isNotNull && col(valueCol).isNotNull)
        .groupBy(col(periodCol).as("period"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(floor(col(valueCol) * lit(1e6) + lit(0.5))
            .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total")),
      maxPeriods)
    val w = Window.orderBy(col("period"))
    per
      .withColumn("prev_total", lag(col("total"), 1).over(w))
      .withColumn("growth_pct",
        when(col("prev_total").isNotNull && col("prev_total") =!= 0.0,
          floor((col("total") - col("prev_total")) / col("prev_total") *
            lit(100) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .orderBy(col("period"))
  }

  /** Truncated ADJUSTED exponential moving average per key (the
    * pandas `ewm(adjust=True)` convention, cut at `windowRows` lags):
    * `s_t = Σᵢ wⁱ·x_{t−i} / Σᵢ wⁱ` over the trailing window, with decay
    * `w = wNum/wDen` (default 3/4, i.e. α = 1/4). Adds `ewma`.
    *
    * Scale shape: key-local window only — `windowRows` fused `lag`s over
    * one `(key)(ts, tie)` sort; everything after is map-only arithmetic.
    *
    * Determinism (why truncated + rational): the recursive EWMA is a
    * floating-point recurrence whose value depends on the whole history —
    * impossible to replay exactly in another engine without running the
    * same unbounded loop. With a fixed window K and rational decay, each
    * weight is the exact integer `wNumⁱ·wDen^(K−1−i)`, values are
    * 6dp-quantized, the numerator accumulates exactly in DECIMAL(38,0)
    * (overflow-proof for any Long-representable quantized value; the
    * BIGINT oracle errors loudly first), the denominator as an exact
    * BIGINT weight sum, and one IEEE division + 6dp quantize finishes —
    * bit-equal anywhere. Null values (and pre-history lags) drop out of
    * both sums.
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, wNum: Int = 3, wDen: Int = 4,
      windowRows: Int = 8): DataFrame = {
    require(windowRows >= 1 && wNum > 0 && wDen > wNum)
    require(BigInt(wDen).pow(windowRows - 1) * windowRows <= BigInt(1L << 40),
      "weight magnitude: shrink windowRows or the decay denominator")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val q = floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long")
    def lagQ(i: Int): Column = if (i == 0) q else lag(q, i).over(w)
    val weights = (0 until windowRows).map(i =>
      (BigInt(wNum).pow(i) * BigInt(wDen).pow(windowRows - 1 - i)).toLong)
    // Numerator terms accumulate in DECIMAL(38,0): the weight bound above
    // caps Σweights ≤ 2^40, but a Long NUMERATOR (weight × 6dp-quantized
    // value) would silently wrap for |value| ≳ 2^23/Σw in non-ANSI Spark
    // while the BIGINT oracle errors loudly — decimal keeps the product
    // exact for any representable input (≤ ~1e31 ≪ 10^38). The
    // denominator is a pure weight sum and stays comfortably in Long.
    val dec = "decimal(38,0)"
    val numSum = (0 until windowRows).map(i =>
      when(lagQ(i).isNotNull,
          lagQ(i).cast(dec) * lit(weights(i)).cast(dec))
        .otherwise(lit(0L).cast(dec)))
      .reduce(_ + _)
    val denSum = (0 until windowRows).map(i =>
      when(lagQ(i).isNotNull, lit(weights(i))).otherwise(lit(0L)))
      .reduce(_ + _)
    df.withColumn("ewma",
      when(denSum > 0,
        floor(numSum.cast("double") / denSum.cast("double") / lit(1e6) *
          lit(1e6) + lit(0.5)) / lit(1e6)))
  }

  /** User-growth curve: per day, the active-user count (DAU), the
    * first-time-user count, and the CUMULATIVE distinct-user total — the
    * growth dashboard every event product runs. The cumulative distinct
    * is NOT a running `count(distinct)` (which would need an
    * ever-growing distinct state per day at scale): each user collapses
    * to their FIRST active day in one aggregate, so cumulative distinct
    * = running sum of first-time counts — exact, two key-keyed scans,
    * and the only window runs over the localized day frame (bounded by
    * `maxDays`).
    */
  def userGrowth(df: DataFrame, keyCol: String, tsCol: String,
      maxDays: Int = 100000): DataFrame = {
    val day = floor(col(tsCol).cast("long") / lit(86400.0)).cast("long")
    val base = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), day.as("__day"))
    val dau = base.groupBy(col("__day").as("day"))
      .agg(countDistinct(col(keyCol)).as("dau"))
    val newPerDay = base.groupBy(col(keyCol))
      .agg(min(col("__day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val joined = localized(
      dau.join(newPerDay, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L))),
      maxDays)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  /** Activity streaks (gaps-and-islands) per key: collapse a timestamped
    * event stream into maximal runs of CONSECUTIVE active days and report
    * `(key, active_days, n_streaks, longest_streak)` — the engagement /
    * retention view next to [[periodGrowth]].
    *
    * Scale shape: events collapse to distinct `(key, day)` FIRST (one
    * map-side-combined distinct — the only full-data shuffle), then the
    * classic `day − rank(day)` island id runs in a key-local window over
    * the per-day frame (≤ one row per key per day, independent of event
    * volume), and two key-local groupBys finish. Pure integer output.
    */
  def activityStreaks(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val day = floor(col(tsCol).cast("long") / lit(86400.0)).cast("long")
    val days = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), day.as("__day")).distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    val runs = days
      .withColumn("__island", col("__day") - row_number().over(w))
      .groupBy(col(keyCol), col("__island"))
      .agg(count(lit(1)).as("__len"))
    runs.groupBy(col(keyCol))
      .agg(sum(col("__len")).as("active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"))
  }
}
