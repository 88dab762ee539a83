package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical–categorical association: Pearson's chi-square test of
  * independence plus Cramér's V — the EDA step after value counts: are two
  * categorical columns related, and how strongly. (The numeric twin is
  * p14's correlation matrix.) Reference behavior class: the agent's
  * "insight" asks over grouped categoricals (agent_data_wrangler
  * tool_call_agent.py's free-form analysis step); the statistic itself is
  * public-textbook.
  *
  * Contract mirrors [[Drift]]: LONG-FORM per-cell evidence — every
  * (val_a, val_b) combination in the observed category grid, including
  * absent pairs at obs = 0 (chi-square is defined over the full grid) —
  * not a single opaque score; the 1-row summary is a second view over the
  * same frame.
  *
  * Scale shape: ONE map-side-combined `groupBy(a, b)` scan of the input;
  * the shuffle is r·c cells wide. The grid, marginals and all statistic
  * math run on the localized cell frame (bounded by `maxCells`, loud
  * error beyond — association over a >10k-cell grid is the wrong tool).
  * Nothing downstream of the scan is proportional to rows.
  *
  * Determinism: cells and marginals are exact integers; the cell term
  * `(obs − exp)² / exp` is algebraically `(n·obs − rT·cT)² / (n·rT·cT)`,
  * whose numerator/denominator are computed EXACTLY in DECIMAL(38,0)
  * (DuckDB: HUGEINT), cast to double once, and finished with two IEEE ops
  * — then 6dp-quantized. Chi-square is the sum of the QUANTIZED per-cell
  * terms accumulated as exact integers (the p14 convention), so the total
  * is associative and shuffle-order-independent. Magnitude bound: with
  * n ≤ 1e12 rows and obs ≤ n, n·obs ≤ 1e24 — DECIMAL(38,0) holds to
  * n ≈ 1e19; the double cast of the squared numerator (≤ 1e48) is far
  * inside double range.
  */
object Association {

  private def localized(df: DataFrame, maxRows: Int): DataFrame = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"association evidence exceeded $maxRows cells; bound the category " +
        "space (this operator materializes the full r x c grid)")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  private def q6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** The zero-filled grid with marginals and exact cell terms attached —
    * shared by [[chiSquareCells]] and [[chiSquareStat]]. Columns: val_a,
    * val_b, obs, row_tot, col_tot, n, __exp_raw, __contrib_raw. One input
    * scan; everything else is on the local cell frame.
    */
  private def grid(df: DataFrame, colA: String, colB: String,
      maxCells: Int): DataFrame = {
    val cells = localized(
      df.where(col(colA).isNotNull && col(colB).isNotNull)
        .groupBy(col(colA).cast("string").as("val_a"),
          col(colB).cast("string").as("val_b"))
        .agg(count(lit(1L)).as("obs")), maxCells)
    val rowTot = cells.groupBy(col("val_a"))
      .agg(sum(col("obs")).as("row_tot"))
    val colTot = cells.groupBy(col("val_b"))
      .agg(sum(col("obs")).as("col_tot"))
    val totals = cells.agg(sum(col("obs")).as("n"))
    val num = dec(col("n")) * dec(col("obs")) -
      dec(col("row_tot")) * dec(col("col_tot"))
    val den = dec(col("n")) * dec(col("row_tot")) * dec(col("col_tot"))
    rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("val_a", "val_b"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("__exp_raw",
        col("row_tot").cast("double") * col("col_tot").cast("double") /
          col("n").cast("double"))
      .withColumn("__contrib_raw",
        num.cast("double") * num.cast("double") / den.cast("double"))
  }

  /** Per-cell chi-square evidence for `colA` x `colB` (nulls excluded on
    * either side): `(val_a, val_b, obs, expected, contrib)` over the FULL
    * observed-category grid, expected counts and `(obs−exp)²/exp` terms
    * 6dp-quantized, ordered by (val_a, val_b).
    */
  def chiSquareCells(df: DataFrame, colA: String, colB: String,
      maxCells: Int = 10000): DataFrame =
    grid(df, colA, colB, maxCells)
      .select(col("val_a"), col("val_b"), col("obs"),
        q6(col("__exp_raw")).as("expected"),
        q6(col("__contrib_raw")).as("contrib"))
      .orderBy(col("val_a"), col("val_b"))

  /** Group-wise ordinary-least-squares trend: per group, the slope /
    * intercept / r² of `yCol` regressed on integer `xCol` — "is spend
    * rising per priority class", the numeric-vs-numeric insight next to
    * [[chiSquareCells]] (cat-cat) and p14's correlation (global pairs).
    *
    * ONE map-side-combined `groupBy(group)` scan accumulating the five
    * sufficient sums (n, Σx, Σx², Σy, Σxy, Σy²) — y 6dp-quantized, all
    * sums EXACT in DECIMAL(38,0) (x must already be an integer column,
    * e.g. epoch days), so partial aggregation order is irrelevant. The
    * closed-form finish is a fixed IEEE sequence per group, 6dp-quantized
    * (the p14 discipline). Degenerate groups (n < 2 or zero x-variance)
    * return slope = intercept = r2 = 0. Magnitude bound: |x| ≤ 1e6,
    * |y| ≤ 1e12 holds to ~1e14 rows per group in DECIMAL(38,0).
    */
  def linearTrend(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val qy = floor(col(yCol) * lit(1e6) + lit(0.5)).cast("decimal(19,0)")
    val x = col(xCol).cast("decimal(19,0)")
    val g = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(x.cast("decimal(38,0)")).cast("double").as("__sx"),
        sum((x * x).cast("decimal(38,0)")).cast("double").as("__sxx"),
        sum(qy.cast("decimal(38,0)")).cast("double").as("__sy"),
        sum((x * qy).cast("decimal(38,0)")).cast("double").as("__sxy"),
        sum((qy * qy).cast("decimal(38,0)")).cast("double").as("__syy"))
    val nD = col("__n").cast("double")
    val den = nD * col("__sxx") - col("__sx") * col("__sx")
    val denY = nD * col("__syy") - col("__sy") * col("__sy")
    val num = nD * col("__sxy") - col("__sx") * col("__sy")
    val slopeRaw = num / den / lit(1e6)
    val interceptRaw = (col("__sy") / lit(1e6) - slopeRaw * col("__sx")) / nD
    val r2Raw = num * num / (den * denY)
    g.withColumn("slope",
        when(col("__n") >= 2 && den > 0, q6(slopeRaw)).otherwise(lit(0.0)))
      .withColumn("intercept",
        when(col("__n") >= 2 && den > 0, q6(interceptRaw)).otherwise(lit(0.0)))
      .withColumn("r2",
        when(col("__n") >= 2 && den > 0 && denY > 0, q6(r2Raw))
          .otherwise(lit(0.0)))
      .select(col(groupCol), col("__n").as("n_rows"), col("slope"),
        col("intercept"), col("r2"))
  }

  /** Market-basket association rules — frequent item PAIRS with support,
    * confidence (both directions) and lift; the retail/recommendation
    * workhorse and the transactional sibling of [[chiSquareCells]].
    *
    * Scale shape (the Apriori prune, distributed): items below
    * `minSupport` cannot participate in a frequent pair, so the basket
    * stream is semi-join-filtered against the frequent-item set BEFORE
    * pair generation — the only quadratic step (per-basket pair explode)
    * runs on pruned baskets and is basket-LOCAL (self-join keyed on the
    * basket id, never a global cross join). One groupBy counts pairs;
    * frequent-item counts and the basket total ride as broadcast 1-row /
    * tiny frames. At 100 TB: two scans of (basket, item), one pair-keyed
    * shuffle bounded by pruned-pair volume.
    *
    * Determinism: support/confidence/lift are single IEEE divisions of
    * exact BIGINT counts (products taken exactly in DECIMAL(38,0) before
    * one double cast), 6dp-quantized. Duplicate (basket, item) rows count
    * once. Output: `(item_a, item_b, n_ab, n_a, n_b, support, conf_a_b,
    * conf_b_a, lift)` for pairs with `n_ab >= minSupport`, item_a < item_b.
    */
  def marketBasket(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    // NOTE on multi-consumer reuse: the distinct frame feeds the item
    // counts, both pair-join sides and the basket total, but Catalyst's
    // ReusedExchange already dedups the distinct's shuffle across them —
    // measured 13.3 s plain vs 17.4 s with explicit localCheckpoints at
    // the 100× stress, so the lazy form stays (the opposite call from
    // triangleCounts, where the shared frame sat BEHIND further joins the
    // reuse machinery cannot collapse)
    val bi = baskets
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__bk"), col(itemCol).cast("string").as("__it"))
      .distinct()
    val itemCnt = bi.groupBy(col("__it")).agg(count(lit(1)).as("__n_item"))
    val frequent = itemCnt.where(col("__n_item") >= minSupport)
    val pruned = bi.join(frequent, Seq("__it"), "left_semi")
    val pairs = pruned.select(col("__bk"), col("__it").as("item_a"))
      .join(pruned.select(col("__bk"), col("__it").as("item_b")), Seq("__bk"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val nBaskets = bi.agg(countDistinct(col("__bk")).as("__n_bk"))
    val withCounts = pairs
      .join(frequent.select(col("__it").as("item_a"),
        col("__n_item").as("n_a")), Seq("item_a"))
      .join(frequent.select(col("__it").as("item_b"),
        col("__n_item").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
    val liftNum = (dec(col("n_ab")) * dec(col("__n_bk"))).cast("double")
    val liftDen = (dec(col("n_a")) * dec(col("n_b"))).cast("double")
    withCounts.select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        q6(col("n_ab").cast("double") / col("__n_bk").cast("double"))
          .as("support"),
        q6(col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_b"),
        q6(col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_b_a"),
        q6(liftNum / liftDen).as("lift"),
        // item-item cosine over binary co-occurrence vectors — the
        // classic collaborative-filtering score beside lift:
        // n_ab / √(n_a·n_b), exact product, one sqrt + division
        q6(col("n_ab").cast("double") / sqrt(liftDen)).as("cosine"))
      .orderBy(col("item_a"), col("item_b"))
  }

  /** Welch's two-sample t evidence — "do these two groups differ in
    * mean": `(n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat)` for the
    * two named groups of `groupCol`, the A/B-testing companion to
    * [[chiSquareStat]] (categorical) and [[Drift.ks]] (distributional).
    * The statistic is reported as evidence; p-value lookup is a
    * driver-side table, not engine work.
    *
    * Scale shape: ONE map-side-combined `groupBy` scan over the
    * two-group filter (three exact accumulators per group); everything
    * after runs on the 2-row local frame.
    *
    * Determinism: values 6dp-quantized, sums/squares exact in
    * DECIMAL(38,0) (DuckDB: HUGEINT), one double cast each, then a fixed
    * IEEE sequence — mean `(S/n)/1e6`, sample variance
    * `(n·SS − S²)/(n·(n−1))/1e12`, `t = (m_a − m_b)/√(v_a/n_a + v_b/n_b)`
    * — all 6dp-quantized. Groups with n < 2 or zero variance pin t to 0;
    * an ABSENT group still yields the single output row with n = 0,
    * NULL mean and 0 variance (the SQL-aggregate shape), never 0 rows.
    */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val qv = floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("decimal(19,0)")
    val g = localized(
      df.where(col(valueCol).isNotNull &&
          col(groupCol).cast("string").isin(groupA, groupB))
        .groupBy(col(groupCol).cast("string").as("__g"))
        .agg(count(lit(1)).as("__n"),
          sum(qv.cast("decimal(38,0)")).cast("double").as("__s"),
          sum((qv * qv).cast("decimal(38,0)")).cast("double").as("__ss")),
      4)
    def side(name: String, suffix: String): DataFrame = {
      // Re-aggregate the (at most one) matching group row so an ABSENT
      // group still yields one row with n=0 / NULL mean / 0 variance —
      // the same shape a SQL aggregate over an empty filter produces
      // (otherwise the crossJoin of an empty side collapses the result
      // to zero rows, an undefined contract on missing groups).
      val f = g.where(col("__g") === name)
        .agg(coalesce(sum(col("__n")), lit(0L)).as("__n"),
          sum(col("__s")).as("__s"), sum(col("__ss")).as("__ss"))
      val nD = col("__n").cast("double")
      f.select(
        col("__n").as(s"n_$suffix"),
        q6(col("__s") / nD / lit(1e6)).as(s"mean_$suffix"),
        when(col("__n") >= 2,
          (nD * col("__ss") - col("__s") * col("__s")) /
            (nD * (nD - lit(1.0))) / lit(1e12))
          .otherwise(lit(0.0)).as(s"__vraw_$suffix"))
    }
    val ab = side(groupA, "a").crossJoin(side(groupB, "b"))
    // t from the QUANTIZED means (the published values) and the raw
    // variances — one documented IEEE chain the oracle replays verbatim
    val tRaw = (col("mean_a") - col("mean_b")) /
      sqrt(col("__vraw_a") / col("n_a").cast("double") +
        col("__vraw_b") / col("n_b").cast("double"))
    ab
      .withColumn("t_stat",
        when(col("n_a") >= 2 && col("n_b") >= 2 &&
          (col("__vraw_a") > 0 || col("__vraw_b") > 0), q6(tRaw))
          .otherwise(lit(0.0)))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        q6(col("__vraw_a")).as("var_a"), q6(col("__vraw_b")).as("var_b"),
        col("t_stat"))
  }

  /** 1-row summary: `(n_rows, dof, chi2, cramers_v)`. `chi2` is the exact
    * integer sum of the 6dp-quantized cell terms (order-independent);
    * `cramers_v = sqrt(chi2 / (n · min(r−1, c−1)))`, 6dp-quantized, 0 when
    * either column has a single category (dof = 0).
    */
  def chiSquareStat(df: DataFrame, colA: String, colB: String,
      maxCells: Int = 10000): DataFrame = {
    val g = grid(df, colA, colB, maxCells)
      .withColumn("__c6",
        floor(col("__contrib_raw") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)"))
    g.agg(
        sum(col("obs")).as("n_rows"),
        countDistinct(col("val_a")).as("__r"),
        countDistinct(col("val_b")).as("__c"),
        sum(col("__c6")).as("__chi2i"))
      .withColumn("dof", (col("__r") - 1) * (col("__c") - 1))
      .withColumn("chi2", col("__chi2i").cast("double") / lit(1e6))
      .withColumn("cramers_v",
        when(col("dof") > 0, q6(sqrt(col("chi2") /
          (col("n_rows").cast("double") *
            least(col("__r") - 1, col("__c") - 1).cast("double")))))
          .otherwise(lit(0.0)))
      .select(col("n_rows"), col("dof"), col("chi2"), col("cramers_v"))
  }
}
