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
    val day = floor(col(dateCol).cast("timestamp").cast("long") /
      lit(86400.0)).cast("long")
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
