package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two dataset snapshots — the check a
  * rolling training-data pipeline runs before trusting a new crawl batch
  * against the corpus it was tuned on.
  *
  * The contract is LONG-FORM per-bin evidence, not a single opaque score:
  * `(bin, cnt_a, cnt_b, share_a, share_b, divergence)` — exact integer
  * counts, shares as one IEEE division, and a RATIONAL per-bin divergence
  * term (triangular discrimination, `(pA-pB)^2 / (pA+pB)`) that needs no
  * epsilon smoothing and no transcendental, so it is bit-reproducible
  * across engines (the tt1 ratio-over-log convention). The classic PSI
  * (which needs ln and eps) is provided as a driver-side convenience over
  * the same frame for human consumption.
  *
  * Scale shape: one map-side-combined `groupBy(bin)` scan per snapshot —
  * the only shuffle is nBins rows wide — then a full-outer join of two
  * tiny per-bin frames and a broadcast of two 1-row totals. Works
  * unchanged whether a snapshot is 1 MB or 10 TB; nothing is proportional
  * to rows except the scans.
  */
object Drift {

  /** Fixed-width numeric binning: `clamp(floor((v - lo) / width), 0, n-1)`
    * — under/overflow lands in the edge bins, so a fixed spec stays total
    * as the data moves (the point of drift detection).
    */
  def binOf(v: Column, lo: Double, hi: Double, nBins: Int): Column = {
    require(nBins > 0 && hi > lo, s"bad bin spec [$lo, $hi) x $nBins")
    val w = (hi - lo) / nBins
    least(greatest(floor((v - lit(lo)) / lit(w)).cast("long"), lit(0L)),
      lit(nBins - 1L))
  }

  private def binnedCounts(df: DataFrame, column: String, bin: Column): DataFrame =
    df.where(col(column).isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1L)).as("cnt"))

  /** Per-bin drift evidence between snapshots `a` and `b` on a numeric
    * column. Every bin in [0, nBins) is present (zero-filled), plus the
    * exact shares and the rational divergence term; nulls are excluded on
    * both sides.
    */
  def numericDrift(a: DataFrame, b: DataFrame, column: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val bins = (0L until nBins.toLong).toDF("bin")
    val ca = binnedCounts(a, column, binOf(col(column), lo, hi, nBins))
    val cb = binnedCounts(b, column, binOf(col(column), lo, hi, nBins))
    drift(bins.join(broadcast(ca), Seq("bin"), "left")
      .withColumnRenamed("cnt", "cnt_a")
      .join(broadcast(cb), Seq("bin"), "left")
      .withColumnRenamed("cnt", "cnt_b"))
  }

  /** Drift per SEGMENT — [[numericDrift]] evaluated independently for
    * every value of `segmentCol` (per-language, per-source, per-tenant):
    * the aggregate drift check can read clean while one segment shifts
    * badly (the Simpson's-paradox failure of whole-table drift). Shares
    * and divergence normalize WITHIN each segment; every (segment, bin)
    * cell is zero-filled over the union of segments observed on either
    * side.
    *
    * Scale shape: one map-side-combined `groupBy(segment, bin)` scan per
    * snapshot — the shuffle is segments × nBins wide, bounded by
    * `maxCells` (loud error beyond); all share math runs on the
    * localized cell frame.
    */
  def numericDriftBy(a: DataFrame, b: DataFrame, segmentCol: String,
      column: String, lo: Double, hi: Double, nBins: Int,
      maxCells: Int = 1 << 20): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def counts(df: DataFrame, name: String): DataFrame =
      df.where(col(column).isNotNull && col(segmentCol).isNotNull)
        .groupBy(col(segmentCol).cast("string").as("segment"),
          binOf(col(column), lo, hi, nBins).as("bin"))
        .agg(count(lit(1L)).as(name))
    val ca = localized(counts(a, "cnt_a"), maxCells)
    val cb = localized(counts(b, "cnt_b"), maxCells)
    val segs = ca.select(col("segment"))
      .union(cb.select(col("segment"))).distinct()
    val bins = (0L until nBins.toLong).toDF("bin")
    val filled = segs.crossJoin(bins)
      .join(ca, Seq("segment", "bin"), "left")
      .join(cb, Seq("segment", "bin"), "left")
      .withColumn("cnt_a", coalesce(col("cnt_a"), lit(0L)))
      .withColumn("cnt_b", coalesce(col("cnt_b"), lit(0L)))
    val totals = filled.groupBy(col("segment"))
      .agg(sum(col("cnt_a")).as("__ta"), sum(col("cnt_b")).as("__tb"))
    filled.join(totals, Seq("segment"))
      .withColumn("share_a",
        when(col("__ta") > 0, col("cnt_a").cast("double") / col("__ta"))
          .otherwise(lit(0.0)))
      .withColumn("share_b",
        when(col("__tb") > 0, col("cnt_b").cast("double") / col("__tb"))
          .otherwise(lit(0.0)))
      .withColumn("divergence",
        when(col("share_a") + col("share_b") > 0,
          (col("share_a") - col("share_b")) * (col("share_a") - col("share_b"))
            / (col("share_a") + col("share_b")))
          .otherwise(lit(0.0)))
      .drop("__ta", "__tb")
  }

  /** One numeric column's drift spec for [[numericDriftMulti]]. */
  final case class ColSpec(column: String, lo: Double, hi: Double, nBins: Int)

  /** Multi-column drift in ONE scan per snapshot: every row emits its
    * (column, bin) pair for all D specs (map-only explode), one shuffle
    * keyed (column, bin) counts them, and the per-column share/divergence
    * math runs on the tiny bins frame. At 100 TB this is the difference
    * between D full-table scans and one — a drift report over a whole
    * wide table costs what a single-column check costs. Output =
    * [[numericDrift]]'s evidence columns plus `column`, zero-filled per
    * column; nulls excluded per column independently.
    */
  def numericDriftMulti(a: DataFrame, b: DataFrame,
      specs: Seq[ColSpec]): DataFrame = {
    require(specs.nonEmpty, "no columns")
    val spark = a.sparkSession
    import spark.implicits._
    def binned(df: DataFrame, cntName: String): DataFrame = df
      .select(explode(array(specs.map { sp =>
        struct(lit(sp.column).as("column"),
          when(col(sp.column).isNotNull,
            binOf(col(sp.column), sp.lo, sp.hi, sp.nBins)).as("bin"))
      }: _*)).as("s"))
      .where(col("s.bin").isNotNull)
      .groupBy(col("s.column").as("column"), col("s.bin").as("bin"))
      .agg(count(lit(1L)).as(cntName))
    val bins = specs.flatMap(sp => (0L until sp.nBins.toLong)
      .map(sp.column -> _)).toDF("column", "bin")
    // ≤ Σ nBins rows — localize so the per-column totals below don't
    // re-run the snapshot scans (see [[localized]])
    val filled = localized(bins
      .join(broadcast(binned(a, "cnt_a")), Seq("column", "bin"), "left")
      .join(broadcast(binned(b, "cnt_b")), Seq("column", "bin"), "left")
      .withColumn("cnt_a", coalesce(col("cnt_a"), lit(0L)))
      .withColumn("cnt_b", coalesce(col("cnt_b"), lit(0L))),
      maxRows = specs.map(_.nBins).sum)
    val totals = filled.groupBy(col("column"))
      .agg(sum(col("cnt_a")).as("__ta"), sum(col("cnt_b")).as("__tb"))
    filled.join(broadcast(totals), "column")
      .withColumn("share_a",
        when(col("__ta") > 0, col("cnt_a").cast("double") / col("__ta"))
          .otherwise(lit(0.0)))
      .withColumn("share_b",
        when(col("__tb") > 0, col("cnt_b").cast("double") / col("__tb"))
          .otherwise(lit(0.0)))
      .withColumn("divergence",
        when(col("share_a") + col("share_b") > 0,
          (col("share_a") - col("share_b")) * (col("share_a") - col("share_b"))
            / (col("share_a") + col("share_b")))
          .otherwise(lit(0.0)))
      .drop("__ta", "__tb")
  }

  /** Categorical drift: one row per category value observed in either
    * snapshot (nulls excluded), same evidence columns keyed by `value`.
    * `maxCategories` bounds the driver-side evidence materialization
    * (drift over a >10k-category column is the wrong tool anyway) — a
    * loud error beats a silent multi-GB collect.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, column: String,
      maxCategories: Int = 10000): DataFrame = {
    val ca = a.where(col(column).isNotNull)
      .groupBy(col(column).as("value")).agg(count(lit(1L)).as("cnt_a"))
    val cb = b.where(col(column).isNotNull)
      .groupBy(col(column).as("value")).agg(count(lit(1L)).as("cnt_b"))
    drift(ca.join(cb, Seq("value"), "full_outer"), maxCategories)
  }

  /** Two-sample Kolmogorov–Smirnov evidence between snapshots `a` and `b`
    * on a numeric column, over the same fixed binning as [[numericDrift]]:
    * per-bin `(bin, cnt_a, cnt_b, cdf_a, cdf_b, gap)` where `gap =
    * |cdf_a − cdf_b|` and the KS statistic is `max(gap)` (see [[ks]]).
    *
    * Binned KS, deliberately: the exact statistic needs a global sort of
    * both snapshots — at 100 TB that is a full-data total-order shuffle
    * for one scalar. Binning keeps the cost at one map-side-combined scan
    * per snapshot and bounds the error by the largest single bin's share
    * (the CDFs are exact AT bin boundaries; refine nBins, not the plan).
    * Determinism: cumulative counts are exact integers accumulated over
    * the localized ≤nBins evidence frame, each CDF is one IEEE division,
    * and the gap is one subtraction — bit-identical across engines with
    * no quantization step. The single-partition window below runs over
    * the ≤nBins LOCAL rows, never over data.
    */
  def ksDrift(a: DataFrame, b: DataFrame, column: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = a.sparkSession
    import spark.implicits._
    val bins = (0L until nBins.toLong).toDF("bin")
    val ca = binnedCounts(a, column, binOf(col(column), lo, hi, nBins))
    val cb = binnedCounts(b, column, binOf(col(column), lo, hi, nBins))
    val filled = localized(bins.join(broadcast(ca), Seq("bin"), "left")
      .withColumnRenamed("cnt", "cnt_a")
      .join(broadcast(cb), Seq("bin"), "left")
      .withColumnRenamed("cnt", "cnt_b")
      .withColumn("cnt_a", coalesce(col("cnt_a"), lit(0L)))
      .withColumn("cnt_b", coalesce(col("cnt_b"), lit(0L))), nBins)
    val totals = filled.agg(sum(col("cnt_a")).as("__ta"),
      sum(col("cnt_b")).as("__tb"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .withColumn("__ca", sum(col("cnt_a")).over(w))
      .withColumn("__cb", sum(col("cnt_b")).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("cdf_a",
        when(col("__ta") > 0, col("__ca").cast("double") / col("__ta"))
          .otherwise(lit(0.0)))
      .withColumn("cdf_b",
        when(col("__tb") > 0, col("__cb").cast("double") / col("__tb"))
          .otherwise(lit(0.0)))
      .withColumn("gap", abs(col("cdf_a") - col("cdf_b")))
      .drop("__ta", "__tb", "__ca", "__cb")
      .orderBy(col("bin"))
  }

  /** KS statistic over a [[ksDrift]] frame — max per-bin CDF gap.
    * Collects nBins rows (driver-side convenience, like [[psi]]).
    */
  def ks(ksFrame: DataFrame): Double =
    ksFrame.agg(max(col("gap"))).collect()(0).getDouble(0)

  /** Materialize a (bounded, tiny by construction) evidence frame to a
    * LocalRelation: the share/divergence math references the counts
    * TWICE (once for totals, once per row), and left lazy that would
    * recompute the snapshot scans once per reference — localizing pins
    * exactly one scan per snapshot and makes everything downstream free.
    */
  private def localized(df: DataFrame, maxRows: Int): DataFrame = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"drift evidence exceeded $maxRows rows; bound the key space " +
        "(this operator materializes per-bin/per-category counts)")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  private def drift(joined: DataFrame, maxRows: Int = 1 << 20): DataFrame = {
    val filled = localized(joined
      .withColumn("cnt_a", coalesce(col("cnt_a"), lit(0L)))
      .withColumn("cnt_b", coalesce(col("cnt_b"), lit(0L))), maxRows)
    // totals as 1-row broadcast aggregates, not window functions — a
    // window would ship every bin row through one partition for nothing
    val totals = filled.agg(sum(col("cnt_a")).as("__ta"),
      sum(col("cnt_b")).as("__tb"))
    filled.crossJoin(broadcast(totals))
      .withColumn("share_a",
        when(col("__ta") > 0, col("cnt_a").cast("double") / col("__ta"))
          .otherwise(lit(0.0)))
      .withColumn("share_b",
        when(col("__tb") > 0, col("cnt_b").cast("double") / col("__tb"))
          .otherwise(lit(0.0)))
      .withColumn("divergence",
        when(col("share_a") + col("share_b") > 0,
          (col("share_a") - col("share_b")) * (col("share_a") - col("share_b"))
            / (col("share_a") + col("share_b")))
          .otherwise(lit(0.0)))
      .drop("__ta", "__tb")
  }

  /** Classic PSI over a drift frame — ln-based, eps-smoothed, so
    * analysis-side only (not oracle-reproducible across engines; see the
    * class doc). Collects nBins rows.
    */
  def psi(driftFrame: DataFrame, eps: Double = 1e-6): Double =
    driftFrame.select("share_a", "share_b").collect().iterator.map { r =>
      val pa = math.max(r.getDouble(0), eps)
      val pb = math.max(r.getDouble(1), eps)
      (pa - pb) * math.log(pa / pb)
    }.sum
}
