package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-feature preparation over cleaned tables: smoothed target
  * encoding, exact-quantile discretization, min-max scaling, and the
  * Markov transition matrix of a per-key event sequence — the feature
  * tier next to [[Cleaning.oneHot]].
  *
  * Scale shapes: every op here is ONE map-side-combined aggregate (per
  * category / 1-row / per state pair) whose result is tiny, broadcast
  * back over a map-only projection. Nothing shuffles the fact table; the
  * windows in [[transitionMatrix]] are key-local. Determinism follows
  * the registry discipline: exact DECIMAL/BIGINT sums, fixed IEEE
  * finishes, 6dp quantization (see Queries.scala's helper header).
  */
object Features {

  private def q6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Smoothed mean target encoding: each category's feature value is
    * `(Σtarget + m·globalMean) / (n + m)` — the empirical-Bayes shrink
    * toward the global mean that keeps rare categories from memorizing
    * their few rows. Adds `<catCol>_te`; null/unseen categories get the
    * global mean. Targets are 6dp-quantized and summed in DECIMAL(38,0)
    * (order-independent); the finish is one fixed IEEE sequence per
    * category, 6dp-quantized. One scan + a broadcast join back.
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      smoothing: Double = 10.0, maxCategories: Int = 100000): DataFrame = {
    val qt = floor(col(targetCol) * lit(1e6) + lit(0.5))
      .cast("decimal(19,0)").cast("decimal(38,0)")
    // per-category stats feed both the global mean and the encoding —
    // localize (≤ categories rows) so the target scans exactly once
    val stats = localized(
      df.where(col(catCol).isNotNull && col(targetCol).isNotNull)
        .groupBy(col(catCol))
        .agg(sum(qt).as("__qs"),           // DECIMAL(38,0): the global
          count(lit(1)).as("__n")),        // re-sum stays exact below
        maxCategories)
    val g = stats.agg(sum(col("__qs")).as("__gqs"), sum(col("__n")).as("__gn"))
    val gmean = (col("__gqs").cast("double") / lit(1e6)) /
      col("__gn").cast("double")
    val te = (col("__qs").cast("double") / lit(1e6) +
      lit(smoothing) * col("__gmean")) /
      (col("__n").cast("double") + lit(smoothing))
    val enc = stats.crossJoin(broadcast(g))
      .withColumn("__gmean", gmean)
      .withColumn(s"${catCol}_te", q6(te))
      .select(col(catCol), col(s"${catCol}_te"), q6(col("__gmean")).as("__gm6"))
    val fallback = broadcast(enc.select(col("__gm6")).limit(1))
    df.join(broadcast(enc.drop("__gm6")), Seq(catCol), "left")
      .crossJoin(fallback)
      .withColumn(s"${catCol}_te",
        coalesce(col(s"${catCol}_te"), col("__gm6")))
      .drop("__gm6")
  }

  /** Exact-quantile discretization: adds `<c>_bin` ∈ [0, probs.size] —
    * the equal-frequency binning feature (quartiles by default). Fences
    * come from [[Cleaning.exactQuantilesDistributed]] (bit-compatible
    * with DuckDB's quantile_cont, driver collect bounded by the quantile
    * budget machinery); the assignment is a map-only sum of comparisons
    * against the ≤probs.size broadcast fences. Null values bin to null.
    */
  def quantileBin(df: DataFrame, c: String,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val fences = Cleaning.exactQuantilesDistributed(df, c, probs).flatten
    val bin = fences.foldLeft(lit(0L)) { (acc, f) =>
      acc + (col(c) > lit(f)).cast("long")
    }
    df.withColumn(s"${c}_bin",
      when(col(c).isNotNull, bin).otherwise(lit(null).cast("long")))
  }

  /** Min-max scaling to [0, 1]: adds `<c>_scaled` = (x − min)/(max − min),
    * 6dp-quantized; a zero-range column pins to 0. One 1-row aggregate
    * broadcast over a map-only projection.
    */
  def minMaxScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val stats = broadcast(df.agg(aggs.head, aggs.tail: _*))
    val joined = df.crossJoin(stats)
    val out = cols.foldLeft(joined) { (d, c) =>
      val range = col(s"__max_$c") - col(s"__min_$c")
      d.withColumn(s"${c}_scaled",
        when(col(c).isNull, lit(null).cast("double"))
          .when(range > 0, q6((col(c) - col(s"__min_$c")) / range))
          .otherwise(lit(0.0)))
    }
    out.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Robust scaling — `(x − median) / IQR`, 6dp-quantized: the outlier-
    * immune sibling of [[minMaxScale]] (one 1e9 sentinel drags a min-max
    * range to uselessness; the median/IQR fences ignore it). Fences come
    * from the budget-bounded exact-quantile machinery (quantile_cont-
    * compatible); scaling is a map-only projection against three driver
    * scalars. Zero-IQR columns pin to 0; nulls pass through.
    */
  def robustScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    // one FUSED quantile round per p across ALL columns (the c6b
    // discipline): ps rounds total instead of cols × ps. For 2 columns
    // the 100× stress gain is modest (23.3 → 21.7 s — the budget-bounded
    // rounds are cheap next to the output projection) but the round
    // count no longer grows with the column list
    val proj = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val Seq(q1s, meds, q3s) =
      Seq(0.25, 0.5, 0.75).map(p => Cleaning.exactQuantilesMulti(proj, cols, p))
    cols.foldLeft(df) { (d, c) =>
      val (q1, med, q3) = (q1s(c), meds(c), q3s(c))
      d.withColumn(s"${c}_rscaled",
        when(col(c).isNull, lit(null).cast("double"))
          .when(lit(q3 - q1) > 0,
            q6((col(c) - lit(med)) / lit(q3 - q1)))
          .otherwise(lit(0.0)))
    }
  }

  /** First-order Markov transition matrix of a per-key ordered state
    * sequence: `(from_state, to_state, n_trans, p)` where `p` is the
    * row-normalized transition probability (one IEEE division on exact
    * counts). The lag is a KEY-LOCAL window ordered `(tsCol, tieCol)`;
    * the pair counts are one map-side-combined shuffle ≤ states² rows;
    * each key's first event has no predecessor and is excluded.
    */
  def transitionMatrix(df: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String, maxStates: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // the pair-count evidence is ≤ states² rows and feeds BOTH the totals
    // and the per-row share — localize so the sequence scans exactly once
    // (the Drift evidence-frame discipline)
    val pairs = localized(df
      .withColumn("__from", lag(col(stateCol), 1).over(w))
      .where(col("__from").isNotNull)
      .groupBy(col("__from").as("from_state"),
        col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n_trans")), maxStates * maxStates)
    val totals = pairs.groupBy(col("from_state"))
      .agg(sum(col("n_trans")).as("__tot"))
    pairs.join(broadcast(totals), Seq("from_state"))
      .withColumn("p", col("n_trans").cast("double") / col("__tot"))
      .drop("__tot")
      .orderBy(col("from_state"), col("to_state"))
  }

  private def localized(df: DataFrame, maxRows: Int): DataFrame = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"feature evidence exceeded $maxRows rows; bound the state space")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Gini split-quality evidence — the decision-tree question "how well
    * does splitting on `featureCol` separate `targetCol`": per feature
    * value, the branch size, its Gini impurity `1 − Σ(cᵢ/n_v)²` and its
    * weighted contribution `(n_v/n)·gini_v`; [[giniSplitStat]] is the
    * 1-row root-vs-split summary over the same scan. The long-form
    * evidence contract mirrors [[Association.chiSquareCells]].
    *
    * Scale shape: ONE map-side-combined `groupBy(feature, target)` scan;
    * the shuffle is the v·c cell grid, bounded by `maxCells` (loud error
    * beyond), and all impurity math runs on the localized cell frame.
    *
    * Determinism: `gini_v = (n_v² − Σcᵢ²) / n_v²` with both sides exact
    * in DECIMAL(38,0) and ONE double cast each; the weighted term is the
    * fixed IEEE sequence `(n_vD / nD) · gini_raw`; both 6dp-quantized.
    * Magnitude bound: branch sizes ≤ 1e19 stay exact.
    */
  def giniSplitBranches(df: DataFrame, featureCol: String,
      targetCol: String, maxCells: Int = 10000): DataFrame =
    giniGrid(df, featureCol, targetCol, maxCells)
      .select(col("val"), col("n_rows"), q6(col("__gini_raw")).as("gini"),
        q6(col("__wgt_raw")).as("weighted"))
      .orderBy(col("val"))

  /** 1-row summary over the same grid: `(n_rows, root_gini,
    * split_impurity, gini_gain)` — split impurity is the exact integer
    * sum of the 6dp-quantized branch contributions (order-independent,
    * the chi2 convention), and the gain is root − split.
    */
  def giniSplitStat(df: DataFrame, featureCol: String, targetCol: String,
      maxCells: Int = 10000): DataFrame = {
    val g = giniGrid(df, featureCol, targetCol, maxCells)
      .withColumn("__w6",
        floor(col("__wgt_raw") * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
    // root gini needs global class counts: re-sum the bounded cell frame
    val cells = g.select(col("val"), explode(col("__cells")).as("c"))
      .select(col("c.target").as("target"), col("c.cnt").as("cnt"))
      .groupBy(col("target")).agg(sum(col("cnt")).as("cnt"))
    val root = cells.agg(
      sum(col("cnt")).as("__n"),
      sum((col("cnt").cast("decimal(19,0)") * col("cnt").cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("__sumsq"))
    val splitSum = g.agg(sum(col("__w6")).as("__s6"))
    root.crossJoin(broadcast(splitSum))
      .withColumn("root_gini", q6(
        (col("__n").cast("decimal(19,0)") * col("__n").cast("decimal(19,0)") -
          col("__sumsq")).cast("decimal(38,0)").cast("double") /
          (col("__n").cast("decimal(19,0)") * col("__n").cast("decimal(19,0)"))
            .cast("decimal(38,0)").cast("double")))
      .withColumn("split_impurity", col("__s6").cast("double") / lit(1e6))
      .withColumn("gini_gain", q6(col("root_gini") - col("split_impurity")))
      .select(col("__n").as("n_rows"), col("root_gini"),
        col("split_impurity"), col("gini_gain"))
  }

  /** Shared (feature value) frame: per value, n_rows, Σc², raw gini and
    * raw weighted contribution, plus the nested per-target cells for the
    * root recount. One input scan; everything else on the local frame.
    */
  private def giniGrid(df: DataFrame, featureCol: String, targetCol: String,
      maxCells: Int): DataFrame = {
    val cells = localized(
      df.where(col(featureCol).isNotNull && col(targetCol).isNotNull)
        .groupBy(col(featureCol).cast("string").as("val"),
          col(targetCol).cast("string").as("target"))
        .agg(count(lit(1)).as("cnt")), maxCells)
    val byVal = cells.groupBy(col("val"))
      .agg(sum(col("cnt")).as("n_rows"),
        sum((col("cnt").cast("decimal(19,0)") * col("cnt").cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("__sumsq"),
        collect_list(struct(col("target"), col("cnt"))).as("__cells"))
    val totals = byVal.agg(sum(col("n_rows")).as("__n"))
    val nv2 = (col("n_rows").cast("decimal(19,0)") *
      col("n_rows").cast("decimal(19,0)")).cast("decimal(38,0)")
    byVal.crossJoin(broadcast(totals))
      .withColumn("__gini_raw",
        (nv2 - col("__sumsq")).cast("decimal(38,0)").cast("double") /
          nv2.cast("double"))
      .withColumn("__wgt_raw",
        col("n_rows").cast("double") / col("__n").cast("double") *
          col("__gini_raw"))
  }

  /** Feature ranking by Gini gain — [[giniSplitBranches]] evaluated for
    * MANY candidate features in ONE melted scan: "which column best
    * splits the target", the actual decision-tree / feature-selection
    * step. Each input row explodes into one `(feature, value)` pair per
    * candidate (map-only; F× row inflation pre-aggregation, the melt
    * cost), a single `groupBy(feature, value, target)` scan reduces, and
    * all impurity math runs on the localized cell frame. Per-feature
    * semantics match [[giniSplitStat]] exactly — including that each
    * feature's n and root Gini cover ITS OWN non-null subset.
    *
    * Output: `(feature, n_rows, root_gini, split_impurity, gini_gain)`
    * ordered by gain descending (ties by feature name).
    */
  def giniFeatureRanking(df: DataFrame, featureCols: Seq[String],
      targetCol: String, maxCells: Int = 10000): DataFrame = {
    require(featureCols.nonEmpty)
    val pairs = array(featureCols.map(c =>
      struct(lit(c).as("feature"), col(c).cast("string").as("val"))): _*)
    val cells = localized(
      df.where(col(targetCol).isNotNull)
        .select(explode(pairs).as("__fv"),
          col(targetCol).cast("string").as("target"))
        .where(col("__fv.val").isNotNull)
        .groupBy(col("__fv.feature").as("feature"),
          col("__fv.val").as("val"), col("target"))
        .agg(count(lit(1)).as("cnt")), maxCells)
    def sq(c: Column): Column =
      (c.cast("decimal(19,0)") * c.cast("decimal(19,0)")).cast("decimal(38,0)")
    val byVal = cells.groupBy(col("feature"), col("val"))
      .agg(sum(col("cnt")).as("n_v"), sum(sq(col("cnt"))).as("__sumsq"))
    val nPerF = byVal.groupBy(col("feature")).agg(sum(col("n_v")).as("__n"))
    val nv2 = sq(col("n_v"))
    val wgt = byVal.join(nPerF, Seq("feature"))
      .withColumn("__gini_raw",
        (nv2 - col("__sumsq")).cast("decimal(38,0)").cast("double") /
          nv2.cast("double"))
      .withColumn("__w6",
        floor(col("n_v").cast("double") / col("__n").cast("double") *
          col("__gini_raw") * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
      .groupBy(col("feature"))
      .agg(sum(col("__w6")).as("__s6"))
    val root = cells.groupBy(col("feature"), col("target"))
      .agg(sum(col("cnt")).as("__c"))
      .groupBy(col("feature"))
      .agg(sum(col("__c")).as("n_rows"), sum(sq(col("__c"))).as("__rss"))
    val rn2 = sq(col("n_rows"))
    root.join(wgt, Seq("feature"))
      .withColumn("root_gini", q6(
        (rn2 - col("__rss")).cast("decimal(38,0)").cast("double") /
          rn2.cast("double")))
      .withColumn("split_impurity", col("__s6").cast("double") / lit(1e6))
      .withColumn("gini_gain", q6(col("root_gini") - col("split_impurity")))
      .select(col("feature"), col("n_rows"), col("root_gini"),
        col("split_impurity"), col("gini_gain"))
      .orderBy(col("gini_gain").desc, col("feature"))
  }

  /** Trailing-window lag / rolling-mean feature generation per key: adds
    * `<value>_lag1`, `<value>_lag2` (verbatim carries — no arithmetic)
    * and `<value>_rmean<K>` (exact 6dp-integer window sum, one IEEE
    * division, 6dp-quantized — the an1/rollingAnomaly discipline) over
    * the previous `windowRows` rows INCLUDING the current one. The
    * standard ML feature prep next to [[targetEncode]]/[[quantileBin]].
    * Key-local windows only; one shuffle on the key.
    */
  def rollingFeatures(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, windowRows: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val wRoll = w.rowsBetween(-(windowRows - 1).toLong,
      org.apache.spark.sql.expressions.Window.currentRow)
    val q = floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long")
    df
      .withColumn(s"${valueCol}_lag1", lag(col(valueCol), 1).over(w))
      .withColumn(s"${valueCol}_lag2", lag(col(valueCol), 2).over(w))
      .withColumn(s"${valueCol}_rmean$windowRows",
        when(count(col(valueCol)).over(wRoll) > 0,
          floor(sum(q).over(wRoll).cast("double") /
            count(col(valueCol)).over(wRoll).cast("double") / lit(1e6) *
            lit(1e6) + lit(0.5)) / lit(1e6)))
  }

  /** RFM customer segmentation: per customer, recency (days since their
    * last transaction, relative to the dataset's last transaction day),
    * frequency (transaction count) and monetary (exact 6dp-summed spend),
    * each quartile-scored 1–4 against the exact-quantile fences of the
    * per-customer frame, concatenated into the classic `r-f-m` segment
    * code. Note the monotone convention: score 1 = lowest value on every
    * axis, so r_score 1 = MOST recent (recency measures staleness).
    *
    * Scale shape: one map-side-combined `groupBy(customer)` scan of the
    * transaction stream; the reference day is a broadcast 1-row max; the
    * three quartile fence sets come from the budget-bounded exact-quantile
    * machinery ([[Cleaning.exactQuantilesDistributed]] — quantile_cont-
    * compatible at any row count) over the aggregated frame, which is
    * `localCheckpoint`ed so the transaction scan runs once, not once per
    * fence set. Scoring is map-only comparisons against 9 broadcast
    * scalars.
    *
    * Determinism: recency/frequency are exact integers, monetary is a
    * 6dp-quantized DECIMAL(38,0) sum, fences interpolate exactly as
    * DuckDB's quantile_cont, and scores are integer comparison sums (the
    * fe1 convention).
    */
  def rfmSegments(tx: DataFrame, custCol: String, dateCol: String,
      amountCol: String): DataFrame = {
    // Epoch-day via datediff against a fixed epoch DATE: timezone-
    // independent (a timestamp cast would shift by the session offset on
    // non-UTC JVMs, diverging from the oracle's UTC epoch()).
    val day = datediff(col(dateCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val per = tx
      .where(col(custCol).isNotNull && col(dateCol).isNotNull &&
        col(amountCol).isNotNull)
      .select(col(custCol).as("customer"), day.as("__day"),
        col(amountCol).as("__amt"))
      .groupBy(col("customer"))
      .agg(max(col("__day")).as("__last"),
        count(lit(1)).as("frequency"),
        (sum(floor(col("__amt") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("monetary"))
    val maxDay = per.agg(max(col("__last")).as("__maxd"))
    val rfm = per.crossJoin(broadcast(maxDay))
      .select(col("customer"), (col("__maxd") - col("__last")).as("recency"),
        col("frequency"), col("monetary"))
      .localCheckpoint(true)
    def score(c: String): Column =
      Cleaning.exactQuantilesDistributed(
          rfm.select(col(c).cast("double").as(c)), c,
          Seq(0.25, 0.5, 0.75)).flatten
        .foldLeft(lit(1L)) { (acc, f) =>
          acc + (col(c).cast("double") > lit(f)).cast("long")
        }
    val out = rfm
      .withColumn("r_score", score("recency"))
      .withColumn("f_score", score("frequency"))
      .withColumn("m_score", score("monetary"))
    out.withColumn("segment",
      concat_ws("-", col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
  }
}
