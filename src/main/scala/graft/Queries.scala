package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, Dedup, FuzzyJoin, SequencePack, Similarity}
import graft.functions.TextFunctions

/** The driver-facing query registry: one entry per implemented operator
  * (SURVEY.md §2 inventory + north-star extensions), each with a DuckDB
  * oracle SQL twin in [[OracleSql]].
  *
  * Determinism contract with the oracle: every *computed* double is produced
  * by exact-sum arithmetic (scaled-long `lsum`/`lmean`/`lstd`, or decimal
  * `dsum`/`dsumSq` where magnitudes demand it) cast back to double, so Spark
  * and DuckDB produce bit-identical values regardless of aggregation order.
  * Raw column values pass through untouched. Row ORDER is NOT part of the
  * contract — the driver's harness sorts rows canonically before hashing —
  * so all-rows outputs carry no final ORDER BY (a global sort of a 100 TB
  * result would dominate the query); ORDER BY remains only where it is
  * semantic (head/top-k selection) or the output is tiny.
  */
object Queries {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(s, s"$dir/$name.parquet")
    else s.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped both as parquet TIMESTAMP(NANOS) — which Spark's
    * reader only admits as a long — and as TIMESTAMP(MICROS) isAdjustedToUTC
    * =false, which Spark 4 reads natively as TIMESTAMP_NTZ. Normalize both
    * to a session-zone TIMESTAMP so every downstream operator sees one type;
    * the session zone is pinned UTC, so the NTZ cast is value-identity.
    */
  private[graft] def loadEvents(s: SparkSession, path: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private def ts(v: String): Column = lit(java.sql.Timestamp.valueOf(v))

  // ---- exact aggregate helpers (see OracleSql twins) ---------------------
  // Two exact-sum families, both bit-identical between Spark and DuckDB
  // because both engines run the same IEEE ops in the same order:
  //  - dsum/dsumSq: DECIMAL-cast accumulation — unbounded magnitude, but
  //    every row pays a BigDecimal add (~3.6x a double sum).
  //  - lsum/lmean/lstd: quantize to 6 decimal places with floor(x*1e6+0.5)
  //    (pure codegen'd double math, no BigDecimal), accumulate the exact
  //    integer as BIGINT (associative, shuffle-order-independent), divide
  //    once at the end. Valid while sum(|x|) <= 9.2e12 (long range / 1e6);
  //    beyond that — grand totals over ~1e9 money rows — use dsum.
  private def dsum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")
  // Sum of squares via 6dp integer quantization and exact DECIMAL products.
  // A double->decimal cast of x*x is NOT portable (Spark rounds the shortest
  // string repr, DuckDB the exact binary value — they disagree on ~1e-7 of
  // rows, which cancellation in the stddev formula amplifies); quantizing to
  // an integer first makes every step exact in both engines.
  private def dsumSq(c: Column): Column = {
    val q = floor(c * lit(1e6) + lit(0.5)).cast("decimal(19,0)")
    sum((q * q).cast("decimal(38,0)")).cast("double") / lit(1e12)
  }
  private def lsum(c: Column): Column = {
    // try_sum nulls out on Long overflow where plain sum would wrap silently
    // (non-ANSI); the guard turns that into a loud error instead of a wrong
    // total. Past the bound, switch the call site to dsum.
    val s = try_sum(floor(c * lit(1e6) + lit(0.5)))
    when(s.isNull && count(c) > 0,
        raise_error(lit("lsum overflow: sum(|x|*1e6) exceeded Long range; use dsum")))
      .otherwise(s).cast("double") / lit(1e6)
  }
  private def lmean(c: Column): Column = lsum(c) / count(c)
  // Windowed twin of lsum with the SAME loud-overflow policy: try_sum nulls
  // out on Long wrap, and a silent null would quietly drop rows from any
  // comparison against the windowed value — so wrap it in the identical
  // null-plus-nonempty raise_error guard (count(c) over the same window spec
  // folds into the same Window operator; no extra pass).
  private def lsumWin(c: Column, w: org.apache.spark.sql.expressions.WindowSpec,
      scale: Double): Column = {
    val s = try_sum(floor(c * lit(scale) + lit(0.5))).over(w)
    when(s.isNull && count(c).over(w) > 0,
        raise_error(lit("window lsum overflow: sum(|x|*scale) exceeded Long range; use dsum")))
      .otherwise(s).cast("double") / lit(scale)
  }
  private def lstd(c: Column): Column =
    sqrt((dsumSq(c) - lsum(c) * lsum(c) / count(c)) / (count(c) - lit(1)))

  // ======================================================================
  // Profiling (SURVEY §2.2)
  // ======================================================================

  /** P2: shape — row counts of the core tables in one result. */
  def p2Shape(s: SparkSession, dir: String): DataFrame = {
    val parts = Seq("lineitem", "orders", "customer", "documents").map { n =>
      t(s, dir, n).agg(lit(n).as("tbl"), count(lit(1)).as("n_rows"))
    }
    parts.reduce(_.unionAll(_)).orderBy(col("tbl"))
  }

  /** P3: deterministic head — first 5 lineitem rows by key. */
  def p3Head(s: SparkSession, dir: String): DataFrame = {
    // total-order sort: (l_orderkey, l_linenumber) is NOT unique in the
    // generated data, and a head over a partial order is engine-dependent
    val li = t(s, dir, "lineitem")
    li.orderBy(li.columns.map(col).toIndexedSeq: _*).limit(5)
  }

  /** P5: describe — count/mean/std/min/median/max per numeric column in
    * TWO table scans: the moments ride the exact-quantile plan's fused
    * count+sketch job ([[Cleaning.exactQuantilesMultiFused]]), the second
    * scan collects the budget-bounded median windows. All six statistics
    * come back as driver scalars, so the result frame is a local relation —
    * no third pass. (All three columns are DoubleType, so aggregating the
    * quantile plan's cast-to-double projection is arithmetic-identical.)
    */
  def p5Describe(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val moments = cols.flatMap { c =>
      Seq(
        lmean(col(c)).as(s"__mean_$c"),
        lstd(col(c)).as(s"__std_$c"),
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c"))
    }
    val (medians, _, row) = Cleaning.exactQuantilesMultiFused(
      li, cols, 0.5, Cleaning.DefaultQuantileWindowBudget, moments)
    import s.implicits._
    cols.map { c =>
      (c, row.getAs[Long](c), row.getAs[Double](s"__mean_$c"),
        row.getAs[Double](s"__std_$c"), row.getAs[Double](s"__min_$c"),
        medians(c), row.getAs[Double](s"__max_$c"))
    }.toDF("col_name", "n", "mean", "std", "min_v", "median", "max_v")
      .orderBy(col("col_name"))
  }

  /** P6: null count per column (orders). */
  def p6NullCounts(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.agg(
      sum(col("o_orderkey").isNull.cast("long")).as("n_orderkey"),
      sum(col("o_custkey").isNull.cast("long")).as("n_custkey"),
      sum(col("o_orderstatus").isNull.cast("long")).as("n_orderstatus"),
      sum(col("o_totalprice").isNull.cast("long")).as("n_totalprice"),
      sum(col("o_orderdate").isNull.cast("long")).as("n_orderdate"),
      sum(col("o_orderpriority").isNull.cast("long")).as("n_orderpriority"))
  }

  /** P7: extremes + exact distinct counts on lineitem. */
  def p7Extremes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"))

  /** P8: duplicate-text group count on documents. */
  def p8DupCheck(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("text")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
      .agg(count(lit(1)).as("n_dup_groups"))

  /** P9: value counts of a categorical (order priority). */
  def p9ValueCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("o_orderpriority"))

  // ======================================================================
  // Aggregation / join / window (SURVEY §2.5 + scale extension)
  // ======================================================================

  /** TPC-H Q1-style pricing summary — the flagship scan+agg. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.where(col("l_shipdate") <= ts("2001-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        lsum(col("l_quantity")).as("sum_qty"),
        lsum(col("l_extendedprice")).as("sum_base_price"),
        lsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        lsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        lmean(col("l_quantity")).as("avg_qty"),
        lmean(col("l_extendedprice")).as("avg_price"),
        lmean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style: top 10 unshipped orders by revenue. Small dims
    * broadcast; the lineitem scan carries the filter.
    */
  def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").where(col("o_orderdate") < ts("2000-01-01 00:00:00"))
    val li = t(s, dir, "lineitem").where(col("l_shipdate") > ts("2000-01-01 00:00:00"))
    // orders is a fact table: shuffle-join it (AQE may still broadcast at
    // small SF); only the customer dim gets an explicit broadcast hint.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(lsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation for one region/year; dims broadcast,
    * single shuffle on the group key.
    */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
      .where(col("o_orderdate") >= ts("1998-01-01 00:00:00") &&
        col("o_orderdate") < ts("2000-01-01 00:00:00"))
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(lsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10-style: returned-item revenue per customer — who cost us
    * the most in returns. Fact-fact join shuffles on the order key, the
    * customer dim broadcasts; exact 6dp revenue sums; top 20 by revenue
    * (TakeOrdered, the semantic ORDER BY).
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(lsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14-style: promo revenue share per month — the two
    * conditional exact sums ride ONE scan of the lineitem⋈part join;
    * the share is a single IEEE division of the two 6dp-exact sums.
    */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("yyyymm"))
      .agg(
        lsum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0)))
          .as("promo_revenue"),
        lsum(rev).as("total_revenue"))
      .withColumn("promo_share",
        floor(col("promo_revenue") / col("total_revenue") * lit(100) *
          lit(1e6) + lit(0.5)) / lit(1e6))
      .orderBy(col("yyyymm"))
  }

  /** TPC-H Q18-style: large-volume orders — the HAVING-filtered
    * aggregate-then-join shape: per-order exact quantity totals first
    * (the having filter shrinks the frame before any join), then the
    * orders fact joins the SHRUNK frame and the customer dim broadcasts.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(lsum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > 200.0)
    big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
  }

  /** TPC-H Q6-style: single-row forecast — pure scan+filter+sum, the
    * pushdown showcase.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1999-01-01 00:00:00") &&
        col("l_shipdate") < ts("2000-01-01 00:00:00") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(lsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Semi-join: suppliers with a recent shipment. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").where(col("l_shipdate") >= ts("2001-01-01 00:00:00"))
    t(s, dir, "supplier")
      .join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** Anti-join: customers with no orders. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    t(s, dir, "customer")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Set operations: customers who bought in 1998 but not 1999 (EXCEPT),
    * plus the 1998∩1999 repeat buyers (INTERSECT), tagged and unioned.
    */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    def buyers(y0: String, y1: String) = ord
      .where(col("o_orderdate") >= ts(y0) && col("o_orderdate") < ts(y1))
      .select(col("o_custkey"))
    val b98 = buyers("1998-01-01 00:00:00", "1999-01-01 00:00:00")
    val b99 = buyers("1999-01-01 00:00:00", "2000-01-01 00:00:00")
    b98.except(b99).select(col("o_custkey"), lit("churned").as("cohort"))
      .unionAll(b98.intersect(b99).select(col("o_custkey"), lit("repeat").as("cohort")))
  }

  /** Correlated-subquery shape: orders above their customer's own average
    * spend — expressed as a grouped window (decimal-exact mean), the
    * Spark-native decorrelation of `WHERE price > (SELECT avg ... )`.
    */
  def qAboveOwnAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    t(s, dir, "orders")
      // scaled-long window sum (o_totalprice has 2 decimal places): exact,
      // association-independent, no BigDecimal per row — see lsumWin (loud
      // error on Long wrap, never a silent null that drops rows)
      .withColumn("cust_avg",
        lsumWin(col("o_totalprice"), w, 100.0) / count(lit(1)).over(w))
      .where(col("o_totalprice") > col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
  }

  /** Window top-k: 3 biggest orders per customer. */
  def w1TopkPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
  }

  /** Window running sum per supplier (scaled-long exact accumulation so the
    * result is independent of the engine's window-sum association).
    */
  def w2RunningSum(s: SparkSession, dir: String): DataFrame = {
    // l_quantity closes the sort: (shipdate, orderkey, linenumber) is not
    // unique in the generated data, and rows tying on the full key carry
    // equal quantity, so the ROWS-frame prefix sums are a stable multiset
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .withColumn("running_qty", lsumWin(col("l_quantity"), w, 100.0))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
  }

  /** Sessionization via lag: count 30-minute-gap sessions per user
    * (second-truncated timestamps pin integer comparisons).
    */
  def w3Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** As-of join: each event picks up the user's most recent order at or
    * before the event time (kdb aj / pandas merge_asof semantics; Spark has
    * no built-in — see [[graft.operators.AsOfJoin]]). Right side pre-deduped
    * per (key, time) for determinism.
    */
  def w4AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
    val ord = t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
      .select(col("o_custkey"), col("o_orderdate"),
        col("m.o_orderkey").as("o_orderkey"), col("m.o_totalprice").as("o_totalprice"))
    graft.operators.AsOfJoin(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightValues = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"),
        col("asof_o_orderkey"), col("asof_o_totalprice"))
  }

  /** Range-frame window: trailing 30-day order count + decimal-exact spend
    * per order within its priority class (RANGE frames include ties by
    * value, so the result is deterministic under any tie order).
    */
  def w5RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("sec"))
      .rangeBetween(-2592000L, 0L) // 30 days in seconds
    t(s, dir, "orders")
      // NTZ has no direct long cast; NTZ -> TIMESTAMP in the UTC session
      // == DuckDB's epoch() of the naive timestamp
      .withColumn("sec", col("o_orderdate").cast("timestamp").cast("long"))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .withColumn("trailing_spend", lsumWin(col("o_totalprice"), w, 100.0))
      .select(col("o_orderkey"), col("trailing_n"), col("trailing_spend"))
  }

  /** Rollup aggregation: revenue subtotals by (returnflag, linestatus) with
    * per-flag and grand totals.
    */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(lsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Cube: all four grouping-set combinations of (returnflag, linestatus)
    * in one pass — rollup's full-lattice sibling; partial aggregation
    * still combines map-side per grouping set.
    */
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(lsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Pivot: order counts per priority pivoted by status. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot(col("o_orderstatus"), Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))

  /** Hourly event rollup (the batch twin of the streaming windowed agg). */
  def e1HourlyTotals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), lsum(col("value")).as("total_value"))

  /** JSON extraction from the props column. */
  def e2JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_value"))

  // ======================================================================
  // Cleaning (SURVEY §2.3) — nulls synthesized deterministically so the
  // oracle can verify the imputation semantics on the shared testdata.
  // ======================================================================

  /** C1: median-impute l_quantity after nullifying values > 45. */
  def c1ImputeMedian(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_quantity") > 45, lit(null)).otherwise(col("l_quantity")).as("qty"))
    val m = Cleaning.exactQuantilesMulti(base, Seq("qty"), 0.5)("qty")
    base.select(col("l_orderkey"), col("l_linenumber"),
        coalesce(col("qty"), lit(m)).as("qty_filled"))
  }

  /** C2: mean-impute o_totalprice after nullifying values > 300000
    * (decimal-exact mean so the filled value matches the oracle bit-for-bit).
    */
  def c2ImputeMean(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") > 300000, lit(null)).otherwise(col("o_totalprice")).as("price"))
    val m = base.agg(lmean(col("price"))).head().getDouble(0)
    base.select(col("o_orderkey"), coalesce(col("price"), lit(m)).as("price_filled"))
  }

  /** C3: mode-impute l_returnflag (nullified where l_tax > 0.07) with the
    * pinned tie-break: max count, then smallest value.
    */
  def c3ImputeMode(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_tax") > 0.07, lit(null)).otherwise(col("l_returnflag")).as("flag"))
    val m = Cleaning.pinnedMode(base, "flag").map(_.toString).getOrElse("")
    base.select(col("l_orderkey"), col("l_linenumber"),
        coalesce(col("flag"), lit(m)).as("flag_filled"))
  }

  /** C4: derived-value impute — o_orderdate nullified for status 'P' rows,
    * filled with min of the remaining dates ("never" placeholder).
    */
  def c4ImputeDerived(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_orderdate")).as("odate"))
    val m = base.agg(min(col("odate"))).head().get(0) // LocalDateTime under NTZ
    base.select(col("o_orderkey"), coalesce(col("odate"), lit(m)).as("odate_filled"))
  }

  /** C5: drop rows with a null critical column (same nullification as C1). */
  def c5DropNulls(s: SparkSession, dir: String): DataFrame =
    Cleaning.dropNullRows(Seq("qty"))(
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") > 45, lit(null)).otherwise(col("l_quantity")).as("qty")))

  /** C6: 3σ outlier filter on o_totalprice — μ and σ from decimal-exact
    * sums so the cut boundary is engine-independent.
    */
  def c6ZscoreFilter(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val r = o.agg(
      lsum(col("o_totalprice")).as("sx"),
      dsumSq(col("o_totalprice")).as("sxx"),
      count(col("o_totalprice")).as("n")).head()
    val (sx, sxx, n) = (r.getDouble(0), r.getDouble(1), r.getLong(2))
    val mean = sx / n
    val std = math.sqrt((sxx - sx * sx / n) / (n - 1))
    o.where(abs(col("o_totalprice") - mean) <= 3 * std)
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  /** C6B: robust outlier filter on events.value — median/MAD fence
    * ([[Cleaning.robustOutlierFilter]]): the cut C6 cannot make when the
    * contamination is wild enough to drag μ/σ themselves. Exact medians
    * via the bounded bracket-and-refine path, so the fence is
    * engine-independent and the row replays in quantile_cont SQL.
    */
  def c6bMadFilter(s: SparkSession, dir: String): DataFrame =
    Cleaning.robustOutlierFilter(Seq("value"))(t(s, dir, "events"))
      .select(col("event_id"), col("value"))

  /** C7: two-phase — beyond-3σ event values to null, then median-impute. */
  def c7OutlierToNull(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val r = e.agg(
      lsum(col("value")).as("sx"), dsumSq(col("value")).as("sxx"),
      count(col("value")).as("n")).head()
    val (sx, sxx, n) = (r.getDouble(0), r.getDouble(1), r.getLong(2))
    val mean = sx / n
    val std = math.sqrt((sxx - sx * sx / n) / (n - 1))
    val nulled = e.select(col("event_id"),
      when(abs(col("value") - mean) > 3 * std, lit(null)).otherwise(col("value")).as("v"))
    val med = Cleaning.exactQuantilesMulti(nulled, Seq("v"), 0.5)("v")
    nulled.select(col("event_id"), coalesce(col("v"), lit(med)).as("value_clean"))
  }

  /** C8: winsorize o_totalprice at the exact 95th percentile. */
  def c8PercentileCap(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cap = Cleaning.exactQuantilesMulti(o, Seq("o_totalprice"), 0.95)("o_totalprice")
    o.select(col("o_orderkey"),
        least(col("o_totalprice"), lit(cap)).as("price_capped"))
  }

  /** C9: keyed dedup keeping the min doc_id per (lang, source). */
  def c9DedupKeyed(s: SparkSession, dir: String): DataFrame =
    Dedup.exactByKey(t(s, dir, "documents"), "doc_id",
        Seq(col("lang"), col("source")))
      .select(col("doc_id"), col("lang"), col("source"))

  /** C10: whitespace/case normalization. */
  def c10Normalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        upper(trim(col("c_name"))).as("name_norm"),
        lower(col("c_mktsegment")).as("segment_norm"))

  /** C11: canonicalization — CASE dictionary + anchored regexp strip. */
  def c11Canonicalize(s: SparkSession, dir: String): DataFrame = {
    val canon = Cleaning.canonicalize("o_orderstatus",
      Map("F" -> "FINISHED", "O" -> "OPEN", "P" -> "PENDING")) _
    canon(t(s, dir, "orders"))
      .select(col("o_orderkey"), col("o_orderstatus").as("status_canon"),
        regexp_replace(col("o_orderpriority"), "^[0-9]-", "").as("priority_clean"))
  }

  /** C12: categorical → boolean canonicalization. */
  def c12Booleanize(s: SparkSession, dir: String): DataFrame =
    Cleaning.booleanize("event_type",
        trueValues = Seq("purchase", "signup"),
        falseValues = Seq("click", "view", "error"))(
        t(s, dir, "events").select(col("event_id"), col("event_type")))
      .withColumnRenamed("event_type", "is_conversion")

  /** C13: date validity flag + derived year. */
  def c13DateFlag(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_orderdate") > ts("2001-06-01 00:00:00")).as("is_late"),
        year(col("o_orderdate")).cast("long").as("o_year"))

  /** C14: sentinel → null. */
  def c14Sentinel(s: SparkSession, dir: String): DataFrame =
    Cleaning.sentinelToNull(Seq("o_orderpriority"), Seq("4-NOT SPECIFIED"))(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")))
      .withColumnRenamed("o_orderpriority", "priority_or_null")

  // ======================================================================
  // Text analysis (north-star)
  // ======================================================================

  /** T1: token statistics per document. */
  def t1TokenStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long").as("n_uniq_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"))

  /** T2: heuristic quality score (formula mirrored exactly in the oracle);
    * token array materialized once per row.
    */
  def t2Quality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"),
        TextFunctions.qualityScoreFromToks(col("text"), col("toks")).as("quality"))

  /** T3: stopword-profile language ID (one-pass codegen kernel). */
  def t3LangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred"))

  /** T4: normalized-content fingerprint. */
  def t4Fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))

  /** T5: corpus filter — the canonical training-data selection pipeline:
    * keep docs passing quality + length + language gates.
    */
  def t5CorpusFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScoreFromToks(col("text"), col("toks")).as("quality"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .where(col("quality") >= 0.5 && col("n_tokens") >= 20 &&
        col("n_tokens") <= 200 && col("lang").isin("en", "de", "fr"))

  /** P10: group-wise insight — the reference's recommended analysis shape
    * ("department and performance scores", SURVEY §2.5) over the testdata:
    * per market segment, customer count / mean balance / balance spread.
    */
  def p10GroupInsight(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        lmean(col("c_acctbal")).as("avg_balance"),
        lstd(col("c_acctbal")).as("std_balance"),
        min(col("c_acctbal")).as("min_balance"),
        max(col("c_acctbal")).as("max_balance"))
      .orderBy(col("c_mktsegment"))

  /** T6: corpus-level n-gram document frequency — top 20 bigrams by the
    * number of documents containing them (distinct per doc via shingles).
    */
  def t6NgramCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(TextFunctions.shingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("bigram"))
      .limit(20)

  /** T7: repetition / duplication quality metrics (Gopher-style filters):
    * per document, the duplicate-token ratio (1 − distinct/total) and the
    * most-frequent-token fraction, plus the boolean gate a pipeline would
    * filter on. Two-level aggregation — tokens partial-aggregate map-side
    * into (doc, token) counts, then one (doc) rollup — so the shuffle
    * carries distinct (doc, token) pairs, not raw token occurrences; no
    * driver participation at any corpus size.
    */
  def t7Repetition(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))
    val perTok = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    perTok.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_toks"), count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
      .select(col("doc_id"), col("n_toks"),
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_toks").cast("double"), 6).as("dup_token_ratio"),
        round(col("top_cnt").cast("double") /
          col("n_toks").cast("double"), 6).as("top_token_frac"))
      .withColumn("repetitive",
        col("top_token_frac") > 0.3 || col("dup_token_ratio") > 0.5)
  }

  /** P11: approximate distinct count with a folded exactness gate (the
    * s2/s3 recall-gate pattern applied to sketches): HyperLogLog++
    * (`approx_count_distinct`, rsd 2%) runs beside the exact distinct and
    * the output carries the exact count plus a boolean asserting the sketch
    * landed within ±5%. The oracle expects TRUE, so a sketch regression
    * flips the driver hash red. At 100 TB the HLL side is the one a
    * pipeline keeps: constant memory per partition, single merge, no
    * distinct shuffle.
    */
  def p11ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.agg(
      countDistinct(col("o_custkey")).as("exact_custkeys"),
      approx_count_distinct(col("o_custkey"), 0.02).as("__approx"))
      .select(col("exact_custkeys"),
        (abs(col("__approx").cast("double") -
          col("exact_custkeys").cast("double")) <=
          col("exact_custkeys").cast("double") * lit(0.05))
          .as("approx_within_5pct"))
  }

  /** P11B: the sketch gate PER GROUP — distinct users per event type,
    * exact beside HLL++, the ±5% bound folded into a boolean per group
    * (the p11 convention, grouped). One map-side-combined aggregate;
    * sketches merge associatively, so the gate holds under any
    * partitioning.
    */
  def p11bGroupApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("__approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("__approx").cast("double") -
          col("exact_users").cast("double")) <=
          col("exact_users").cast("double") * lit(0.05))
          .as("approx_within_5pct"))

  /** P13: fixed-bin numeric histogram — the profiling staple a DESCRIBE
    * doesn't give: distribution shape. One map-side-combined aggregate over
    * floor(x / width); bins with no rows are absent (sparse output), bin
    * edges are exact integer math so the result is partition-independent.
    */
  def p13Histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(floor(col("l_extendedprice") / lit(5000.0)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_rows"))
      .select((col("bin") * 5000L).cast("double").as("bin_lo"), col("n_rows"))
      .orderBy(col("bin_lo"))

  /** P15: 2-D histogram (heatmap evidence) over quantity × discount — ONE
    * map-side-combined groupBy on two binned dimensions, sparse cells
    * (zero cells omitted), exact integer bin ids. Quantity bins are
    * width-10 on integral values; discount bins are 2-CENT buckets of the
    * 6dp-quantized value, so edges are exact integers in both engines
    * (a raw `floor(x/0.02)` would sit on IEEE bin boundaries).
    */
  def p15Histogram2d(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(floor(col("l_quantity") / lit(10.0)).cast("long").as("__bq"),
        (floor(col("l_discount") * lit(100) + lit(0.5)).cast("long") / 2)
          .cast("long").as("__bd"))
      .agg(count(lit(1)).as("n_rows"))
      .select((col("__bq") * 10L).cast("double").as("qty_lo"),
        ((col("__bd") * 2L).cast("double") / lit(100.0)).as("disc_lo"),
        col("n_rows"))

  /** P16: group-wise categorical mode — each user's most frequent event
    * type, deterministic tie-break by the larger type string (the c3
    * pinned-tie-break discipline, expressed as one `max(struct)` — two
    * map-side-combined aggregates, no window).
    */
  def p16GroupMode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("__cnt"), col("event_type"))).as("__m"))
      .select(col("user_id"), col("__m.event_type").as("mode_event"),
        col("__m.__cnt").as("n_occurrences"))

  /** P17: exact per-group median — each customer's median order value via
    * key-local rank windows (odd n: the middle value verbatim; even n:
    * `(a+b)/2`, one IEEE add + divide — bit-portable without
    * quantization). The grouped counterpart of p5's global exact median;
    * no global sort, no driver collect: the window partitions by
    * customer.
    */
  def p17GroupMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wn = Window.partitionBy(col("o_custkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn))
      .where(col("__rn") === expr("(__n + 1) div 2") ||
        col("__rn") === expr("__n div 2") + 1)
      .groupBy(col("o_custkey"))
      .agg(min(col("__n")).as("n_orders"),
        (sum(col("o_totalprice")) / count(lit(1))).as("median_value"))
  }

  /** The measure columns p14's correlation matrix covers, in output order.
    * Shared with [[OracleSql]] so the generated per-pair SQL blocks stay in
    * lock-step with the Spark aggregate.
    */
  private[graft] val CorrCols =
    Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  /** P14: pairwise Pearson correlation matrix over lineitem's numeric
    * measures — the EDA step after describe/histogram: which measures move
    * together. ONE fused scan: every sum, sum-of-squares and cross-product
    * for all C(4,2) pairs partial-aggregates map-side in a single
    * Aggregate (15 exact-integer accumulators), then the 6 correlations
    * unfold from the 1-row result — adding columns widens the row, never
    * adds a scan, and nothing shuffles but 15 numbers per partition.
    *
    * Exactness: each measure is 6dp-quantized to an integer
    * (floor(x·1e6 + 0.5), the dsumSq convention) and all sums/products
    * accumulate in DECIMAL(38,0) — associative, shuffle-order-independent,
    * bit-identical in DuckDB's HUGEINT. The scale factors cancel in the
    * correlation ratio. The exact integer sums then cast to double once
    * and r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²)·√(n·Σy² − (Σy)²)) is a
    * fixed sequence of correctly-rounded IEEE ops, quantized to 6dp.
    * Magnitude bound (documented like lsum's): q ≤ 1.2e11 for the price
    * column, so Σq² ≤ 1.44e22·n — DECIMAL(38,0) holds to n ≈ 7e15 rows.
    */
  def p14CorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cols = CorrCols
    def q(c: String): Column =
      floor(col(c) * lit(1e6) + lit(0.5)).cast("decimal(19,0)")
    val sums = cols.map(c => sum(q(c).cast("decimal(38,0)"))
      .cast("double").as(s"s_$c"))
    val prods = for { i <- cols.indices; j <- i until cols.length } yield
      sum((q(cols(i)) * q(cols(j))).cast("decimal(38,0)"))
        .cast("double").as(s"p_${cols(i)}_${cols(j)}")
    val aggd = t(s, dir, "lineitem")
      .agg(count(lit(1)).cast("double").as("n"), (sums ++ prods): _*)
    def corrOf(x: String, y: String): Column = {
      val num = (col("n") * col(s"p_${x}_$y")) - (col(s"s_$x") * col(s"s_$y"))
      def f(c: String) = (col("n") * col(s"p_${c}_$c")) -
        (col(s"s_$c") * col(s"s_$c"))
      floor(num / (sqrt(f(x)) * sqrt(f(y))) * lit(1e6) + lit(0.5)) / lit(1e6)
    }
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length } yield
      struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        corrOf(cols(i), cols(j)).as("corr"))
    aggd.select(col("n").cast("long").as("n_rows"),
        explode(array(pairs.toIndexedSeq: _*)).as("p"))
      .select(col("p.col_x").as("col_x"), col("p.col_y").as("col_y"),
        col("n_rows"), col("p.corr").as("corr"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** PROF1: MERGEABLE profiling — lineitem's measures profiled as two
    * disjoint batches (l_orderkey parity) whose sufficient statistics are
    * merged ([[graft.profile.Profiler.sufficientStats]]/`mergeStats`),
    * then finalized. The oracle computes the stats DIRECTLY from the
    * whole table — hash equality proves batch-wise profiling is exact,
    * i.e. a 100 TB corpus can be profiled incrementally as batches land
    * (one fused scan each, profiles merged as 7-number rows) and never
    * rescanned. The scd1b/nd*-style invariance row for the P-family.
    */
  def prof1MergedDescribe(s: SparkSession, dir: String): DataFrame = {
    import graft.profile.Profiler
    val li = t(s, dir, "lineitem")
    val parts = Seq(
      li.where(col("l_orderkey") % 2 === 0),
      li.where(col("l_orderkey") % 2 === 1))
      .map(d => Profiler.sufficientStats(d, CorrCols))
    Profiler.describeFromStats(Profiler.mergeStats(parts))
      .orderBy(col("col_name"))
  }

  /** TT1: per-document distinctive terms — tf·idf with a RATIONAL idf
    * (tf × N / df) instead of the classic log: rankings stay
    * df-monotone and every score is one exact-integer IEEE division, so
    * the result is bit-portable (`ln` is not, see lm1). Top 3 terms per
    * doc by (score desc, term asc) — keyword extraction over the corpus.
    *
    * Shape: (doc, term) tf counts and term df counts are two partial-
    * aggregated shuffles over the same exploded stream; the df side joins
    * back on the term key (co-partitioned with its own groupBy); N is a
    * 1-row broadcast; the top-3 is a per-doc window over ≤ distinct-terms
    * rows. The corpus never self-joins.
    */
  def tt1TopTerms(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = t(s, dir, "documents").agg(count(lit(1)).as("n"))
    val score = (col("tf") * col("n")).cast("double") / col("df").cast("double")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), score.as("score"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("term"),
        col("score"))
  }

  /** BM25: ranked retrieval over documents for a fixed 3-term query
    * ([[graft.operators.Search.bm25TopK]]) — inverted-index-shaped plan
    * (only query-term postings shuffle), rational-idf scoring with exact
    * quantized per-doc sums, deterministic (score desc, doc_id) top-20.
    */
  def bm25TopDocs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Search.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
      Seq("spark", "join", "window"), topK = 20)

  // bm25b memo: the inverted index is query-independent — build once per
  // dir (two corpus scans), like the ANN index memos
  private val bm25Cache = scala.collection.mutable.Map
    .empty[String, graft.operators.Search.TermIndex]
  private def bm25Cached(s: SparkSession, dir: String) =
    bm25Cache.getOrElseUpdate(dir, graft.operators.Search.buildTermIndex(
      t(s, dir, "documents"), "doc_id", "text"))

  /** BM25B: the same query THROUGH a durable inverted index — build the
    * postings/lengths index once, save it to an epoch lineage, reload
    * into a fresh handle, and answer from posting lists only (no token
    * explode, no corpus scan at query time). Bit-equal scoring to
    * [[bm25TopDocs]], so the oracle is shared — hash equality proves the
    * index path AND its save/load round-trip change nothing.
    */
  def bm25bIndexed(s: SparkSession, dir: String): DataFrame = {
    val built = bm25Cached(s, dir)
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_bm25").toString
    built.save(lineage)
    val reloaded = graft.operators.Search.loadTermIndex(s, lineage)
    val out = graft.operators.Search.bm25TopKIndexed(reloaded,
        Seq("spark", "join", "window"), topK = 20)
      .select(col("id").as("doc_id"), col("score"))
    out.persist(); out.count()
    reloaded.close()
    out
  }

  /** CQ1: per-source corpus health report — the one-stop rollup a pipeline
    * owner reads before changing mixture weights: per (lang, source)
    * stratum, doc count, exact mean quality, exact mean duplicate-token
    * ratio, and the low-quality count. ONE narrow map pass (quality and
    * dup ratio both come from the per-row token array — no explode, no
    * per-token shuffle) into one map-side-combined groupBy; means use the
    * lsum quantized-long trick so the rollup is bit-portable.
    */
  def cq1CorpusReport(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        split(trim(col("text")), "\\s+").as("toks"))
      .select(col("lang"), col("source"),
        TextFunctions.qualityScoreFromToks(col("text"), col("toks")).as("q"),
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double"), 6).as("dup_ratio"))
    d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        lmean(col("q")).as("avg_quality"),
        lmean(col("dup_ratio")).as("avg_dup_ratio"),
        sum(when(col("q") < 0.5, 1L).otherwise(0L)).as("n_low_quality"))
      .orderBy(col("lang"), col("source"))
  }

  /** P12: approximate-quantile sketch with a folded exactness gate — the
    * p11 pattern applied to percentiles. `percentile_approx` (KLL-style
    * sketch: constant memory per partition, one merge — the quantile a
    * 100 TB profile actually computes; p5's exact path is the budget-bounded
    * verifier) runs beside an EXACT distributed rank check: each sketched
    * value's true rank (one broadcast of the 3 sketch rows against the
    * column, counted exactly) must land within ±1% of the target rank.
    * The oracle pins every gate TRUE, so a sketch regression flips the
    * driver hash red.
    */
  def p12ApproxQuantileGate(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
    val pcts = Seq(0.5, 0.9, 0.99)
    val appr = li.agg(
      percentile_approx(col("x"), array(pcts.map(lit): _*), lit(10000)).as("vs"),
      count(lit(1)).as("n"))
    val sketch = appr.select(posexplode(col("vs")).as(Seq("i", "v")), col("n"))
    li.join(broadcast(sketch))
      .groupBy(col("i"), col("v"), col("n"))
      .agg(sum(when(col("x") <= col("v"), 1L).otherwise(0L)).as("rank"))
      .select(
        element_at(array(pcts.map(lit): _*), col("i") + 1).as("pct"),
        (abs(col("rank").cast("double") -
          element_at(array(pcts.map(lit): _*), col("i") + 1) * col("n").cast("double"))
          <= col("n").cast("double") * lit(0.01)).as("rank_ok"))
      .orderBy(col("pct"))
  }

  // ======================================================================
  // Dedup / similarity (north-star)
  // ======================================================================

  /** Documents ∪ 50 planted duplicates (ids shifted by 1e6) — the dedup
    * fixture, built identically in the oracle.
    */
  private def docsWithPlantedDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.unionAll(d.where(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** D1: exact-dup groups by content fingerprint over the planted fixture. */
  def d1ExactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docsWithPlantedDups(s, dir), "doc_id", "text")
      .select(col("keep_id"), col("group_size"))

  /** FJ1: edit-distance fuzzy self-join (entity resolution) over customer
    * names through the LOSSLESS deletion-neighborhood blocking
    * ([[graft.operators.FuzzyJoin]]). The oracle replays the brute-force
    * O(n^2) `levenshtein` definition, so hash equality proves the blocked
    * plan recovers EVERY ed<=1 pair — recall 1.0 by construction, unlike
    * the probabilistic d2/d3 families — while Spark-side candidates stay
    * bucket-local (one shuffle on the variant key, hot buckets guarded).
    */
  def fj1FuzzyJoin(s: SparkSession, dir: String): DataFrame =
    FuzzyJoin.fuzzySelfJoin(t(s, dir, "customer"), "c_custkey", "c_name",
        maxDist = 1)
      .select(col("id_a").as("a_key"), col("id_b").as("b_key"),
        col("dist").cast("long").as("dist"))

  /** ER1: entity resolution end to end ([[FuzzyJoin.resolveEntities]]) —
    * fuzzy pairs → transitive closure → canonical (min-id) entity per
    * cluster. Fixture: each customer (key ≤ 2000; the cap bounds the
    * oracle's quadratic replay, the Spark path is the unbounded scale
    * plan) yields three records — a base name and two planted 1-edit
    * typos (delete 2nd char / substitute 3rd with 'x'). The key is
    * suffixed into the name TWICE so distinct customers sit ≥ 2 edits
    * apart even after one typo: every cluster is exactly {base, typo1,
    * typo2}, and typo1~typo2 (2 edits apart, linked only via the base)
    * proves the closure actually merges transitively. The oracle replays
    * brute-force O(n²) levenshtein edges + recursive-CTE reachability —
    * hash equality proves lossless blocking AND the exact fixed point.
    */
  def er1EntityResolution(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer").where(col("c_custkey") <= 2000)
      .select(col("c_custkey"),
        concat(col("c_name"), lit("/"), col("c_custkey").cast("string"),
          lit("/"), col("c_custkey").cast("string")).as("nm"))
    val recs = base.select((col("c_custkey") * 4).as("rec_id"), col("nm").as("name"))
      .unionAll(base.select((col("c_custkey") * 4 + 1).as("rec_id"),
        concat(col("nm").substr(lit(1), lit(1)),
          col("nm").substr(lit(3), length(col("nm")))).as("name")))
      .unionAll(base.select((col("c_custkey") * 4 + 2).as("rec_id"),
        concat(col("nm").substr(lit(1), lit(2)), lit("x"),
          col("nm").substr(lit(4), length(col("nm")))).as("name")))
    FuzzyJoin.resolveEntities(recs, "rec_id", "name", maxDist = 1)
      .select(col("rec_id"), col("name"), col("entity_id"), col("cluster_size"))
  }

  /** DQ1: declarative data-quality audit ([[graft.operators.DataQuality]])
    * — 12 rules over four tables (not-null, range, regex, enum, single and
    * composite uniqueness, two FK integrity checks) compiled to one fused
    * scan per table plus one distinct/anti-join per key rule. The fixture
    * catches real violations (122 negative `c_acctbal` rows) and pins
    * exact zeros everywhere else.
    */
  def dq1RuleAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality._
    val tables = Map(
      "orders" -> t(s, dir, "orders"),
      "customer" -> t(s, dir, "customer"),
      "lineitem" -> t(s, dir, "lineitem"),
      "events" -> t(s, dir, "events"))
    graft.operators.DataQuality.audit(tables, Seq(
      NotNull("orders_date_not_null", "orders", "o_orderdate"),
      InRange("orders_price_range", "orders", "o_totalprice", 0.0, 1e9),
      InSet("orders_status_enum", "orders", "o_orderstatus",
        Seq("O", "F", "P")),
      Unique("orders_key_unique", "orders", Seq("o_orderkey")),
      RefIntegrity("orders_custkey_fk", "orders", "o_custkey",
        "customer", "c_custkey"),
      Matches("customer_name_format", "customer", "c_name",
        "^Customer#[0-9]{9}$"),
      InRange("customer_acctbal_nonneg", "customer", "c_acctbal", 0.0, 1e12),
      InRange("lineitem_qty_range", "lineitem", "l_quantity", 1.0, 50.0),
      InRange("lineitem_discount_range", "lineitem", "l_discount", 0.0, 0.1),
      Unique("lineitem_pk_unique", "lineitem",
        Seq("l_orderkey", "l_linenumber")),
      RefIntegrity("lineitem_orderkey_fk", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      InSet("events_type_enum", "events", "event_type",
        Seq("click", "signup", "error", "view", "purchase"))))
  }

  /** S6R: the PQ model's save/load round-trip must be invisible — train,
    * persist the codebook lineage, reload into a fresh handle, encode and
    * query THROUGH THE RELOADED MODEL, and still pass the identical s6
    * recall gate (the nd2r/nd3r/tok1r durable-artifact contract).
    */
  def s6rReloadedPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val (model, _) = s6Cached(s, dir)
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_pq").toString
    model.save(lineage)
    val reloaded = Similarity.loadPqModel(s, lineage)
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", reloaded)
    val approx = Similarity.pqTopK(e, codes, reloaded,
      e.where(col("vec_id") < 5), "vec_id", "embedding",
      k = 10, shortlist = 200)
    val out = annGate(s1Cached(s, dir), approx, minHits = 8, k = 10)
    out.persist(); out.count()
    reloaded.close()
    out
  }

  /** C11B: dictionary-only fuzzy canonicalization ([[Cleaning
    * .fuzzyCanonicalize]]) — typos nobody enumerated snap to the nearest
    * canonical form within 1 edit, map-only. The fixture plants a
    * deterministic deletion / substitution / insertion on 3 of every 5
    * segment values (the pii1 planted-fixture pattern) and the oracle
    * replays the same nearest-entry rule with a correlated min-distance
    * lookup.
    */
  def c11bFuzzyCanon(s: SparkSession, dir: String): DataFrame = {
    val seg = col("c_mktsegment")
    val dirty =
      when(pmod(col("c_custkey"), lit(5)) === 0, substring(seg, 2, 64))
        .when(pmod(col("c_custkey"), lit(5)) === 1,
          concat(substring(seg, 1, 1), lit("x"), substring(seg, 3, 64)))
        .when(pmod(col("c_custkey"), lit(5)) === 2, concat(lit("z"), seg))
        .otherwise(seg)
    val df = t(s, dir, "customer")
      .select(col("c_custkey"), dirty.as("dirty"),
        dirty.as("canonical"))
    Cleaning.fuzzyCanonicalize("canonical", Seq("AUTOMOBILE", "BUILDING",
      "FURNITURE", "HOUSEHOLD", "MACHINERY"), maxDist = 1)(df)
  }

  // drift rows: snapshot A = pre-1998 orders, snapshot B = the rest — a
  // fixed, semantically meaningful split both engines restate verbatim
  private val driftCut = "1998-01-01 00:00:00"

  /** DRIFT1: numeric distribution drift ([[graft.operators.Drift]]) of
    * `o_totalprice` across the 1998 boundary — long-form per-bin evidence
    * (exact counts, IEEE-exact shares, rational divergence term; see the
    * Drift scaladoc for why PSI's ln stays out of the oracle contract).
    */
  def drift1Numeric(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    graft.operators.Drift.numericDrift(
      o.where(col("o_orderdate") < ts(driftCut)),
      o.where(col("o_orderdate") >= ts(driftCut)),
      "o_totalprice", lo = 0.0, hi = 500000.0, nBins = 20)
  }

  /** DRIFT2: categorical drift of `o_orderpriority` across the same
    * boundary — one row per category seen in either snapshot.
    */
  def drift2Categorical(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    graft.operators.Drift.categoricalDrift(
      o.where(col("o_orderdate") < ts(driftCut)),
      o.where(col("o_orderdate") >= ts(driftCut)),
      "o_orderpriority")
  }

  /** FN1: strictly-ordered first-touch funnel ([[graft.operators.Funnel
    * .funnel]]) — view → click → purchase over the events stream; each
    * stage is a per-user aggregate joined against the previous stage's
    * (shrinking) reach frame.
    */
  def fn1Funnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnel(t(s, dir, "events"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))

  /** COH1: weekly cohort retention ([[graft.operators.Funnel
    * .cohortRetention]]) — distinct active users per (first-event week,
    * week offset); ISO-Monday truncation in the pinned UTC session zone.
    */
  def coh1Cohorts(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.cohortRetention(t(s, dir, "events"),
      "user_id", "ts")

  /** DRIFT3: multi-column drift in ONE scan per snapshot ([[graft
    * .operators.Drift.numericDriftMulti]]) — three lineitem measures
    * across the 1998 ship-date boundary; at scale this is one table scan
    * for a whole drift report instead of one per column.
    */
  def drift3Multi(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Drift.ColSpec
    val li = t(s, dir, "lineitem")
    graft.operators.Drift.numericDriftMulti(
      li.where(col("l_shipdate") < ts(driftCut)),
      li.where(col("l_shipdate") >= ts(driftCut)),
      Seq(ColSpec("l_quantity", 1.0, 51.0, 10),
        ColSpec("l_extendedprice", 0.0, 100000.0, 20),
        ColSpec("l_discount", 0.0, 0.1, 5)))
      .withColumnRenamed("column", "col_name")
  }

  /** SCD1: change-data-capture compaction ([[graft.operators
    * .ChangeCapture]]) — the events stream collapsed into SCD2 validity
    * intervals of `event_type` per user, `(ts, event_id)`-ordered,
    * half-open, open-ended current run. Key-local windows only.
    */
  def scd1History(s: SparkSession, dir: String): DataFrame =
    graft.operators.ChangeCapture.scd2(
      t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")

  /** SCD1B: INCREMENTAL SCD2 — compact the first 15 days of events into a
    * history, then fold the rest in through [[graft.operators
    * .ChangeCapture.scd2Merge]] (batch-sized work, untouched keys pass by
    * reference). Shares scd1's oracle: hash equality proves
    * `merge(scd2(first), second) == scd2(everything)` exactly — boundary
    * runs with unchanged values merge with summed counts, changed values
    * close the open run at the batch's first observation.
    */
  def scd1bIncrementalHistory(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val cut = ts("2024-01-16 00:00:00")
    val hist = graft.operators.ChangeCapture.scd2(
      ev.where(col("ts") < cut), "user_id", "event_type", "ts", "event_id")
    graft.operators.ChangeCapture.scd2Merge(hist,
      ev.where(col("ts") >= cut), "user_id", "event_type", "ts", "event_id")
  }

  /** D2: MinHash-LSH near-dup pairs — ORACLE-CHECKED since the base hash
    * went portable (MD5 first-8-bytes, [[graft.functions.MinHashSig
    * .hashUtf8]]): DuckDB rebuilds every 128-hash signature (splitmix64
    * emulated exactly in wrapping u64 arithmetic), joins band slices on
    * equality, and verifies candidates with the same trigram Jaccard — so
    * hash equality proves the full signature→band→verify plan bit-for-bit.
    */
  def d2MinhashLsh(s: SparkSession, dir: String): DataFrame =
    // r = numHashes/bands = 16 rows per band: band-collision threshold
    // (1/bands)^(1/r) ~ 0.88, so the dense j~0.5 mass of this synthetic
    // corpus stays out of the candidate join (at r=4 it admits ~40% of all
    // pairs and the verify join goes quadratic).
    Dedup.minhashLsh(docsWithPlantedDups(s, dir), "doc_id", "text",
        threshold = 0.8, numHashes = 128, bands = 8, shingleSize = 3)

  /** D2b: the ORACLE-CHECKED MinHash-LSH path — banding tuned for recall at
    * the 0.9 near-dup threshold (16 bands x 8 rows: per-pair miss
    * (1-0.9^8)^16 ~ 1.2e-4, verified 0 misses on this corpus at every SF),
    * hash-compared against DuckDB's exact all-pairs trigram Jaccard. The
    * corpus carries ~25 organic pairs at j in [0.9, 0.99) plus the 50
    * planted exact dups, so equality proves the bucketed plan recovers
    * genuine near-duplicates, not just identical texts, without an
    * all-pairs join.
    */
  def d2bMinhashLshOracle(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docsWithPlantedDups(s, dir), "doc_id", "text",
      threshold = 0.9, numHashes = 128, bands = 16, shingleSize = 3)

  /** D3: SimHash near-dup pairs — ORACLE-CHECKED: the token hash is
    * portable (first 8 MD5 bytes, [[graft.functions.SimHash64.tokenHash]]),
    * so DuckDB rebuilds every 64-bit signature from `md5(tk)` with integer
    * arithmetic and compares exact all-pairs `bit_count(xor) <= 3` against
    * this plan's pigeonhole-blocked join (4 × 16-bit quarters — provably
    * exact for Hamming ≤ 3, so hash equality proves the blocked plan loses
    * nothing vs the quadratic oracle).
    */
  def d3Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(docsWithPlantedDups(s, dir), "doc_id", "text", maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))

  /** D4: token-set Jaccard near-dups, blocked by (lang, source). */
  def d4NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq("lang", "source"), n = 1, threshold = 0.5)

  /** D4B: asymmetric n-gram CONTAINMENT pairs ([[Dedup.ngramContainment]])
    * — `|A∩B|/|A|` both directions within (lang, source) blocks; the
    * quote/subset detector symmetric Jaccard misses.
    */
  def d4bNgramContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainment(t(s, dir, "documents"), "doc_id", "text",
      blockCols = Seq("lang", "source"), n = 1, threshold = 0.8)

  /** D5: embedding-cosine near-dup pairs within label blocks (exact cosine;
    * the oracle mirrors the fold order with an unrolled 64-term sum).
    */
  def d5EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VecExpressions.{fdot, fnorm}
    val e = t(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"),
        fnorm(col("embedding")).as("nrm")) // norm once per ROW, not per pair
    val denom = col("a.nrm") * col("b.nrm")
    val cos = when(denom > 0, fdot(col("a.vec"), col("b.vec")) / denom)
      .otherwise(lit(null).cast("double"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), cos.as("cosine"))
      .where(col("cosine") >= 0.3)
  }

  /** D5b: the SCALE path for embedding near-dup — OR-amplified multi-table
    * hyperplane-LSH bucketing, per-bucket join, exact-cosine verify — run
    * against a fixture with 50 planted near-identical vectors (element 1
    * scaled by 1.001f, ids +1e6; built identically in the oracle). The
    * oracle computes exact all-pairs cosine >= 0.99, so hash equality
    * proves the bucketed plan recovers every qualifying pair (100% recall
    * at near-dup thresholds) without an all-pairs join: candidate
    * generation is bucket-local, O(n·tables) bucket rows.
    */
  def d5bEmbeddingNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = e.where(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    Dedup.embeddingNearDup(e.unionAll(planted), "vec_id", "embedding",
      threshold = 0.99, lshBits = 12, tables = 4)
  }

  /** D8: SemDeDup — semantic dedup by k-means-cluster-then-verify
    * ([[Dedup.semDeDup]]) over the d5b planted fixture (50 near-identical
    * vectors at ids +1e6, cosine ≈ 1−1e−7 to their originals; background
    * pairs top out at cosine ≈ 0.6 at every SF). The oracle replays the
    * drop set EXACTLY — all-pairs unrolled-sum cosine ≥ 0.99, drop the
    * larger id of every pair — so hash equality proves the cluster-local
    * plan loses no qualifying pair (every near-dup family co-clusters)
    * while never joining all-pairs.
    */
  def d8Semdedup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = e.where(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    Dedup.semDeDup(e.unionAll(planted), "vec_id", "embedding",
        threshold = 0.99, nClusters = 16, iterations = 3)
      .orderBy(col("id"))
  }

  /** D8B: SemDeDup under the AUTO cluster geometry ([[Dedup.autoClusters]]
    * — nClusters ∝ corpus/targetClusterSize, the paper's scale rule as the
    * default) over the same planted fixture as d8. The oracle is the same
    * exact all-pairs drop-set pin, so the row proves the auto geometry
    * keeps 100% co-clustering recall while per-cluster populations stay
    * flat (the d8 pinned-16 row remains as the guard-stress geometry).
    */
  def d8bSemdedupAuto(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = e.where(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    Dedup.semDeDupAuto(e.unionAll(planted), "vec_id", "embedding",
        threshold = 0.99, targetClusterSize = 128, iterations = 3)
      .orderBy(col("id"))
  }

  /** D8C: SemDeDup under the auto geometry with TWO-LEVEL assignment
    * (route via ~√k coarse groups, exact argmin over nProbe probed
    * groups' fine centroids — [[graft.operators.Similarity
    * .ivfIndexHier]]): the build-cost lever that keeps the auto
    * geometry's Lloyd rounds ~n·√k instead of n·k. Same exact all-pairs
    * drop-set oracle as d8/d8b — a green hash proves the hierarchical
    * route loses no qualifying pair at this corpus (assignment shifts at
    * coarse boundaries only matter when a near-dup PAIR splits).
    */
  def d8cSemdedupHier(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = e.where(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    Dedup.semDeDupAuto(e.unionAll(planted), "vec_id", "embedding",
        threshold = 0.99, targetClusterSize = 128, iterations = 3,
        hierNProbe = 4)
      .orderBy(col("id"))
  }

  /** S1: exact brute-force top-10 cosine neighbors for query vectors 0-4. */
  def s1KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // The exact S1 result is the yardstick for BOTH ANN gates (s2, s3) — memo
  // it per data dir as a persisted 50-row frame so the brute-force pass runs
  // once per dir, not once per gate. If an external clearCache() drops the
  // blocks the lineage recomputes transparently.
  private val s1Cache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def s1Cached(s: SparkSession, dir: String): DataFrame =
    s1Cache.getOrElseUpdate(dir, {
      val df = s1KnnBruteForce(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })

  // IVF index memo: the k-means build is the dominant cost of the IVF path
  // and is query-independent — build once per dir, reuse across calls. The
  // memo is a thin wrapper over the caller-owned [[Similarity.IvfIndex]]
  // handle (build/probe/close is the library surface; this registry keeps a
  // per-dir handle alive for the bench's repeated probes).
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfIndex]
  private def ivfCached(s: SparkSession, dir: String): Similarity.IvfIndex =
    ivfCache.getOrElseUpdate(dir, {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Similarity.buildIvfIndex(e, "vec_id", "embedding",
        nClusters = 16, iterations = 2, nProbe = 4)
    })

  /** S2: LSH approximate top-k, emitted as its own oracle-checked quality
    * gate: per query, `recall_ok` (the approximate top-10 recovers ≥ 6 of
    * the exact top-10) and `k_full` (a full k results came back). The
    * approximate neighbor LISTS follow the hash functions and are therefore
    * engine-private — no independent oracle can reproduce them — so the
    * checkable contract is the recall invariant; a recall regression flips
    * the driver hash red instead of hiding in a rows-only check. Library
    * callers get the full top-k rows from [[Similarity.lshTopK]]
    * (spec-tested for exact agreement shape + recall in SimilaritySpec).
    */
  def s2LshTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val corpus = Similarity.bucketize(e, "vec_id", "embedding")
    val approx = Similarity.lshTopK(corpus, e.where(col("vec_id") < 5),
      "vec_id", "embedding", k = 10)
    annGate(s1Cached(s, dir), approx, minHits = 6, k = 10)
  }

  /** S3: IVF approximate top-k as the same oracle-checked recall gate (see
    * [[s2LshTopK]]); the k-means index is built once per dir via the memo.
    */
  def s3IvfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val approx = ivfCached(s, dir)
      .topK(e.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    annGate(s1Cached(s, dir), approx, minHits = 6, k = 10)
  }

  // Hierarchical-IVF memo for s3b: the two-level index (assigned corpus,
  // fine centroids, coarse routing) is query-independent — build once per
  // dir like [[ivfCached]]; the routing rides the handle so probes route
  // map-only (the SemIndex discipline).
  private val s3bCache = scala.collection.mutable.Map
    .empty[String, Similarity.HierIvfIndex]
  private def s3bCached(s: SparkSession, dir: String) =
    s3bCache.getOrElseUpdate(dir, {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Similarity.buildHierIvfIndex(e, "vec_id", "embedding",
        nClusters = 80, iterations = 2, nProbe = 12, coarseProbe = 6)
    })

  /** S3B: approximate top-k through the TWO-LEVEL IVF probe
    * ([[Similarity.ivfTopKHier]]) — the query-side scale path for
    * corpus-scaled cluster counts, where the flat route's |Q|·k crossJoin
    * and corpus-scaled centroid broadcast stop working. Same recall-gate
    * contract as s2/s3: approximate lists are engine-private, so the
    * oracle pins the invariant (≥5 of the exact top-10 recovered, full k
    * returned) — the two-level route must survive BOTH its
    * approximations (coarse-group routing of queries AND of the
    * assignment that built the index) with recall intact.
    */
  def s3bIvfTopKHier(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val approx = s3bCached(s, dir)
      .topK(e.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    annGate(s1Cached(s, dir), approx, minHits = 5, k = 10)
  }

  /** E3: per-label embedding centroids via decimal-exact element means.
    * Long form `(label, dim, m)` — dim 1-based to match SQL
    * `generate_subscripts`; the array re-assembly lives in
    * [[graft.operators.Similarity.centroids]] for library callers.
    */
  def e3Centroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      // scaled-long exact mean at 9dp (|v|<=1, so the quantized sum fits a
      // long with huge headroom)
      .agg((sum(floor(col("v").cast("double") * lit(1e9) + lit(0.5)))
        .cast("double") / lit(1e9) / count(col("v"))).as("m"))
      .select(col("label"), (col("dim") + 1).cast("long").as("dim"), col("m"))
      .orderBy(col("label"), col("dim"))

  /** MM1: multimodal metadata extraction over a synthetic binary column.
    * The stub codec derives dims from the payload length by plain BIGINT
    * arithmetic and the content id is 8 bytes of SHA-256, so the DuckDB
    * oracle reproduces every column exactly (no longer rows-only).
    */
  def mm1ImageMeta(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
    val media = graft.operators.Multimodal.asMedia(docs, "doc_id", "payload", "image/fake")
    graft.operators.Multimodal.imageMetadata(media).toDF()
      .select(col("id"), col("mime"), col("width"), col("height"),
        col("nBytes").as("n_bytes"), col("sha"))
  }

  /** MM2: frame sampling over a synthetic video column — every 2nd frame's
    * metadata per document. The stub frame count and dims are plain BIGINT
    * arithmetic on the payload length ([[graft.operators.Multimodal
    * .StubCodecs]]), so the oracle reproduces the full exploded output;
    * what the check proves Spark-side is the mapPartitions explode plumbing
    * (per-partition codec batching, bounded output).
    */
  def mm2Frames(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
    val media = graft.operators.Multimodal.asMedia(docs, "doc_id", "payload", "video/fake")
    graft.operators.Multimodal.sampleFrames(media, stride = 2).toDF()
      .select(col("id"), col("frameIndex").as("frame_index"),
        col("width"), col("height"), col("nBytes").as("n_bytes"))
  }

  /** MM3: media embedding feeding the d5b near-dup path — the planted-dup
    * invariant through the full multimodal pipeline: payload → byte-histogram
    * embedding ([[graft.operators.Multimodal.embedMedia]]; identical payloads
    * give identical vectors) → (n_bytes, hyperplane-LSH)-blocked
    * exact-cosine near-dup. Emits one row per planted id with `dup_found`;
    * the oracle asserts TRUE for all 50, so a regression anywhere in the
    * chain (embedding determinism, LSH recall at cosine≈1, blocking) flips
    * the hash red. Neighbor lists beyond the invariant follow the embedding
    * stub and are not part of the contract.
    */
  def mm3MediaEmbed(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
    val fixture = docs.unionAll(
      docs.where(col("doc_id") < 50).withColumn("doc_id", col("doc_id") + 1000000L))
    val media = graft.operators.Multimodal.asMedia(fixture, "doc_id", "payload", "image/fake")
    val emb = graft.operators.Multimodal.embedMedia(media)
      .join(media.toDF().select(col("id"), length(col("data")).as("n_bytes")), Seq("id"))
    val pairs = Dedup.embeddingNearDup(emb, "id", "embedding",
      threshold = 0.999999, lshBits = 12, blockCols = Seq("n_bytes"), tables = 1)
    val found = pairs.where(col("id_b") === col("id_a") + 1000000L)
      .select(col("id_a").as("id"), lit(true).as("__f"))
    t(s, dir, "documents").where(col("doc_id") < 50)
      .select(col("doc_id").as("id"))
      .join(found, Seq("id"), "left")
      .select(col("id"), coalesce(col("__f"), lit(false)).as("dup_found"))
      .orderBy(col("id"))
  }

  /** The adversarial LSH fixture: `n` near-identical template variants —
    * one shared 60-token base plus a per-variant suffix token, so variants
    * are NOT byte-identical (exact dedup can't collapse them) yet any two
    * share 58 of ~59 trigrams (Jaccard 58/60 ≈ 0.967). At crawl scale this
    * is the boilerplate-family shape that piles an entire corpus slice into
    * one (band, bucket) and melts an unguarded LSH self-join. Synthetic and
    * SF-independent by construction, so the oracle is closed-form.
    */
  private[graft] def templateFamily(s: SparkSession, n: Int): DataFrame = {
    val base = (0 until 60).map(i => f"tok$i%02d").mkString(" ")
    s.range(n).select(col("id").as("doc_id"),
      concat(lit(base + " v"), col("id")).as("text"))
  }

  /** D6: hot-bucket skew guard under adversarial input — 5000 template
    * variants whose common band signatures put ~4.4k ids into each band's
    * hot bucket (maxBucket = 1000, so the guard MUST engage: members verify
    * against the bucket's 8 smallest-id representatives instead of
    * all-pairs, O(n·8) not O(n²) candidates). The oracle asserts the
    * closed-form invariant: greedy keep-first still collapses the whole
    * family to doc 0 (every other id is dropped), and the audit saw
    * oversized buckets — so a guard regression (lost recall OR silently
    * quadratic fallback) flips the driver hash red.
    */
  def d6SkewGuard(s: SparkSession, dir: String): DataFrame = {
    val fam = templateFamily(s, 5000)
    val (pairs, audit) = Dedup.minhashLshAudited(fam, "doc_id", "text",
      threshold = 0.9, numHashes = 128, bands = 16, shingleSize = 3,
      maxBucket = 1000, repFactor = 8)
    val dropIds = pairs.select(col("id_b").as("id")).distinct()
      .withColumn("__d", lit(true))
    fam.select(col("doc_id").as("id"))
      .join(dropIds, Seq("id"), "left")
      .select(col("id"), coalesce(col("__d"), lit(false)).as("dropped"),
        lit(audit.oversizedBuckets > 0).as("guard_engaged"))
      .orderBy(col("id"))
  }

  /** D7: near-dup clustering by CONNECTED COMPONENTS over the exact
    * unigram-Jaccard pair graph (planted fixture; (lang, source) blocks) —
    * the clustering that closes greedy keep-first's gap: a family chained
    * a~b~c keeps exactly one doc (the component-minimum), even where (a,c)
    * never paired directly. Labels converge by distributed min-label
    * propagation ([[Dedup.connectedComponents]]); the oracle replays the
    * SAME fixed point as a DuckDB recursive-CTE reachability closure, so
    * hash equality proves the iterative distributed algorithm exact.
    */
  def d7NeardupComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccard(docsWithPlantedDups(s, dir), "doc_id", "text",
      blockCols = Seq("lang", "source"), n = 1, threshold = 0.5)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 40)
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    comp.join(sizes, "component").select(col("id"), col("component"), col("csize"))
  }

  /** D7b: near-dup clustering at the SCALE path — connected components over
    * skew-guarded MinHash-LSH pairs (d2b's banding: 16 bands × 8 rows,
    * verified 0 misses at the 0.9 threshold on this corpus at every SF)
    * instead of [[d7NeardupComponents]]'s labeled quadratic exact-all-pairs
    * edge generation. The oracle rebuilds the edge set as exact all-pairs
    * trigram Jaccard ≥ 0.9 (the d2b equivalence) and closes it with the
    * same recursive-CTE reachability, so hash equality proves BOTH that the
    * bucketed edge generation recovers every qualifying edge AND that the
    * distributed min-label clustering reaches the exact fixed point. This
    * is the composition a 100 TB near-dedup actually runs: every stage
    * (shingle, band, bucket join, verify, propagate) is shuffle-bounded
    * and hot-bucket-guarded; nothing is quadratic in the corpus.
    */
  def d7bComponentsOverLsh(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithPlantedDups(s, dir), "doc_id", "text",
      threshold = 0.9, numHashes = 128, bands = 16, shingleSize = 3)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 40)
    // connectedComponents has materialized its own edge copy; the LSH pair
    // cache (caller-owned per the minhashLsh contract) can go now.
    pairs.unpersist(blocking = false)
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    comp.join(sizes, "component").select(col("id"), col("component"), col("csize"))
  }

  /** CP1: the flagship end-to-end corpus preparation — quality/token gates →
    * exact fingerprint dedup → MinHash-LSH near-dedup, i.e.
    * [[graft.plans.CorpusPipeline.run]] with its default config — checked
    * WHOLE against a DuckDB oracle that recomputes every stage exactly
    * (gates from the t2/t3 formulas, min-id dedup, exact all-pairs trigram
    * Jaccard with the same greedy keep-first policy). The constituent
    * stages were each oracle-green already; this row closes the
    * parts-proven-vs-whole-proven gap.
    */
  def cp1CorpusPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    // materializeResult: the whole pipeline runs ONE upstream scan and the
    // driver's single downstream action reads the cache (which the harness
    // clears between queries; library callers own it per the Config doc).
    val (cleaned, _) = graft.plans.CorpusPipeline.run(docs, "doc_id", "text",
      graft.plans.CorpusPipeline.Config(audit = false, materializeResult = true))
    cleaned.select(col("doc_id"), col("lang"),
      col("n_tokens").cast("long").as("n_tokens"), col("quality"))
  }

  /** CP6: the pipeline with the BENCHMARK-DECONTAMINATION stage wired in —
    * gates → dc1-style 5-gram eval-leakage drop (against the %97 bench
    * subset of the raw corpus) → exact dedup → near-dedup, one whole-
    * composition hash. Ordered before dedup on purpose: a contaminated doc
    * must never survive as a dedup family's representative (dropping it
    * after keep-first dedup would also delete the family's only survivor).
    * The oracle replays every stage, so the hash proves the stage SAW the
    * gated corpus and the dedup saw the decontaminated one.
    */
  def cp6DecontaminatedPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val bench = docs.where(col("doc_id") % 97 === 0)
    val (cleaned, _) = graft.plans.CorpusPipeline.run(docs, "doc_id", "text",
      graft.plans.CorpusPipeline.Config(audit = false, materializeResult = true,
        decontaminateBench = Some(bench)))
    cleaned.select(col("doc_id"), col("lang"),
      col("n_tokens").cast("long").as("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** CP2: end-to-end REWRITE pipeline — corpus-wide duplicate-line rewrite
    * → quality/token gates recomputed on the REWRITTEN text → exact
    * fingerprint dedup — checked WHOLE against an oracle replaying every
    * stage (lr1's window-pair rewrite, the t2/t5 gate formulas, d1's md5
    * min-id dedup). cp1 proved the classic gate→dedup→near-dedup
    * composition; this row proves the rewrite composes the same way,
    * including docs whose text collapses to empty (gated out by n_tokens)
    * or becomes identical to another doc after line removal (caught by
    * the exact dedup stage).
    */
  def cp2RewritePipeline(s: SparkSession, dir: String): DataFrame = {
    val cleaned = graft.operators.TextPipeline.dedupLinesRewrite(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text")
      .select(col("doc_id"), col("clean_text").as("text"))
    val meta = cleaned.select(col("doc_id"), col("text"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val gated = meta
      .where(col("n_tokens").between(5, 100000) && col("quality") >= 0.3)
    val fp = gated.withColumn("__f", TextFunctions.fingerprint(col("text")))
    val keep = fp.groupBy(col("__f")).agg(min(col("doc_id")).as("doc_id"))
    fp.join(keep, Seq("__f", "doc_id"), "left_semi")
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** CP3: the SELECTIVE end-to-end pipeline — heuristic gates → CCNet
    * LM-tier keep (head+middle terciles of the corpus-trained bigram LM)
    * → DSIR selection (target = engine-detected lang 'en') → exact dedup
    * → LSH near-dedup — i.e. [[graft.plans.CorpusPipeline.run]] with the
    * round-7 quality/selection stages wired in as config. The oracle
    * replays every stage exactly (t2/t3 gate formulas, ccn1's ntile
    * machinery over the GATED corpus, ds1's two-model integer comparison
    * over the TIER-KEPT corpus, d1 min-id dedup, exact all-pairs trigram
    * keep-first), so one hash proves the staged composition — including
    * that each model trains on exactly the corpus the previous stage
    * admitted, not on the raw input.
    */
  def cp3SelectivePipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val (cleaned, _) = graft.plans.CorpusPipeline.run(docs, "doc_id", "text",
      graft.plans.CorpusPipeline.Config(audit = false, materializeResult = true,
        lmKeepTiers = Seq("head", "middle"),
        dsirTarget = Some(col("lang") === "en")))
    cleaned.select(col("doc_id"), col("lang"),
      col("n_tokens").cast("long").as("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** CP4: end-to-end SPAN-rewrite pipeline — the Lee-et-al. duplicated-
    * span removal over the NATURAL corpus (organic duplicated 6-grams
    * only, no planting) → quality/token gates recomputed on the rewritten
    * text → exact fingerprint dedup. cp2 proved the line-rewrite composes;
    * this row proves the overlapping-span rewrite composes the same way —
    * including docs whose surviving text shifts gate outcomes and docs
    * made identical by the removal (caught downstream by dedup).
    */
  def cp4SpanRewritePipeline(s: SparkSession, dir: String): DataFrame = {
    val cleaned = graft.operators.TextPipeline.dedupSpansRewrite(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 6)
      .select(col("doc_id"), col("clean_text").as("text"))
    val meta = cleaned.select(col("doc_id"), col("text"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val gated = meta
      .where(col("n_tokens").between(5, 100000) && col("quality") >= 0.3)
    val fp = gated.withColumn("__f", TextFunctions.fingerprint(col("text")))
    val keep = fp.groupBy(col("__f")).agg(min(col("doc_id")).as("doc_id"))
    fp.join(keep, Seq("__f", "doc_id"), "left_semi")
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** CP5: the FULL composition with the span rewrite wired in as pipeline
    * CONFIG (`spanRewriteK`) — heuristic gates → Lee-et-al. duplicated-
    * span rewrite on the GATED corpus → metadata (lang/n_tokens/quality)
    * recomputed on the rewritten text + gates re-applied → exact dedup →
    * LSH near-dedup. cp4 proved the rewrite composes when hand-chained;
    * this row proves [[graft.plans.CorpusPipeline]]'s config stage drives
    * the same composition end to end, including the near-dedup stage over
    * REWRITTEN text (the oracle replays it as exact all-pairs trigram
    * keep-first, so the hash also pins full LSH recall post-rewrite).
    */
  def cp5FullPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val (cleaned, _) = graft.plans.CorpusPipeline.run(docs, "doc_id", "text",
      graft.plans.CorpusPipeline.Config(audit = false, materializeResult = true,
        spanRewriteK = Some(6)))
    cleaned.select(col("doc_id"), col("lang"),
      col("n_tokens").cast("long").as("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** CP5B: the repeat-cap mixture REPORT hook ([[graft.plans
    * .CorpusPipeline.Config.repeatCapEpochs]]) — the Muennighoff
    * water-fill allocation (mix4's closed form) computed over cp5's FINAL
    * corpus, stratified by the pipeline's recomputed `lang` and sized by
    * the rewritten `n_tokens`. The oracle replays the whole upstream
    * chain and then the allocation, so one hash pins that the report saw
    * exactly the corpus the pipeline admitted.
    */
  def cp5bPipelineMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val (_, stats) = graft.plans.CorpusPipeline.run(docs, "doc_id", "text",
      graft.plans.CorpusPipeline.Config(audit = false, materializeResult = true,
        spanRewriteK = Some(6), repeatCapEpochs = Some(4)))
    stats.mixture.get.orderBy(col("lang"))
  }

  /** DC1: benchmark decontamination — flag corpus documents sharing any
    * word 5-gram with a held-out benchmark set (the C4/GPT-3 n-gram-overlap
    * decontamination stage). Benchmark = `doc_id % 97 == 0`; the fixture
    * also plants leaked copies of every benchmark text back into the corpus
    * under shifted ids, so the contaminated set is provably non-empty and
    * the oracle checks both planted and organic overlaps.
    *
    * Scale shape: the benchmark side (eval suites — MBs against a 100 TB
    * corpus) is exploded to distinct (ngram, bench_id) pairs and BROADCAST;
    * the corpus side is a map-only explode feeding a partial-aggregated
    * groupBy(doc_id). The corpus is never shuffled against itself and the
    * join carries no skew (an ngram repeated across the corpus fans out
    * only against the tiny benchmark side).
    */
  def dc1Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val bench = docs.where(col("doc_id") % 97 === 0)
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
      .unionAll(bench.withColumn("doc_id", col("doc_id") + lit(2000000L)))
    val benchGrams = bench.select(col("doc_id").as("bench_id"),
      explode(TextFunctions.shingles(col("text"), 5)).as("ngram"))
    val corpusGrams = corpus.select(col("doc_id"),
      explode(TextFunctions.shingles(col("text"), 5)).as("ngram"))
    corpusGrams.join(broadcast(benchGrams), Seq("ngram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ngram")).as("n_shared_ngrams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .orderBy(col("doc_id"))
  }

  /** DC2: decontamination with a broadcast Bloom prefilter — the variant of
    * [[dc1Decontaminate]] for when even the benchmark's exploded 5-gram set
    * is too large to broadcast exactly (full eval-suite unions at 100 TB
    * corpus scale). A Bloom sketch of the benchmark grams (xxhash64-keyed,
    * ~1.2 bytes/item at 1% fpp — MBs where the exact string set is GBs) is
    * built in one aggregate, shipped as a literal, and applied MAP-SIDE to
    * the corpus gram stream; only the surviving ~fpp fraction pays the
    * exact join that removes Bloom false positives, so the result is
    * IDENTICAL to dc1 (the oracle is dc1's, verbatim). This is precisely
    * the shape of Spark's own runtime bloom-filter join pruning
    * ([[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]),
    * surfaced as an explicit operator the pipeline author controls.
    *
    * Scale shape: corpus side stays map-only through explode + bloom
    * filter; at this SF AQE broadcasts the FP-removal join, at scale it
    * degrades gracefully to a shuffle of the tiny prefiltered remnant —
    * never of the corpus gram stream itself.
    */
  def dc2DecontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column => asCol, expression => asExpr}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val bench = docs.where(col("doc_id") % 97 === 0)
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
      .unionAll(bench.withColumn("doc_id", col("doc_id") + lit(2000000L)))
    val benchGrams = bench.select(col("doc_id").as("bench_id"),
      explode(TextFunctions.shingles(col("text"), 5)).as("ngram"))
    val corpusGrams = corpus.select(col("doc_id"),
      explode(TextFunctions.shingles(col("text"), 5)).as("ngram"))
    // Build the sketch (distributed aggregate; the only driver traffic is
    // the finished ~1 MB bitmap, i.e. exactly the broadcast payload).
    val bloomAgg = asCol(new BloomFilterAggregate(
      asExpr(xxhash64(col("ngram"))),
      Literal(1000000L), Literal(8L * 1000000L)).toAggregateExpression())
    val bloomBytes = benchGrams.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    val mightContain = asCol(new BloomFilterMightContain(
      Literal(bloomBytes), asExpr(xxhash64(col("ngram")))))
    corpusGrams.where(mightContain)
      .join(benchGrams, Seq("ngram")) // exact verify: kills bloom FPs
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ngram")).as("n_shared_ngrams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .orderBy(col("doc_id"))
  }

  /** SP1: deterministic train/val/test splitting by portable content hash —
    * the assignment every training pipeline needs to be reproducible across
    * engines, reruns, and corpus growth (a doc's split never changes when
    * other docs are added). Bucket = first 32 bits of md5(doc_id) mod 100;
    * 80/10/10. Map-only assignment (no shuffle until the audit rollup);
    * the oracle rebuilds the identical buckets from DuckDB's md5.
    */
  def sp1HashSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % 100
    docs.withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"), col("lang"))
  }

  /** SP2: exact-quota stratified sampling — per language, keep exactly
    * ⌈n/10⌉ documents, chosen by md5 rank (deterministic, engine-portable,
    * and stable under reruns). The quota is pure integer math
    * ((n+9) div 10), so both engines select the identical id set.
    *
    * Scale shape: the per-stratum md5 rank is the two-level chunked prefix
    * decomposition ([[stratumChunkRank]] — the mix2/tokenBudgetSelect
    * construction): a plain `Window.partitionBy(lang).orderBy(h)` puts an
    * entire stratum in ONE task ('en' is most of a real crawl — a 20 TB
    * task at 100 TB), while the chunked form's largest full-row window
    * holds one (stratum, hash-prefix) chunk (~1/256 of the stratum) and
    * the only stratum-wide windows run over the ≤256-row chunk-total
    * frames. Quotas come from the same tiny totals, broadcast back. When
    * ~10% suffices without exact quotas, the map-only hash-threshold
    * assignment (the [[sp1HashSplit]] construction, no shuffle at all) is
    * the cheaper 100 TB path.
    */
  def sp2StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (ranked, counts) = stratumChunkRank(docs, "lang", "doc_id")
    val quotas = counts.groupBy(col("lang")).agg(sum(col("__cn")).as("__tot"))
      .select(col("lang"),
        floor((col("__tot") + lit(9L)) / lit(10L)).cast("long").as("__quota"))
    ranked.withColumnRenamed("__rank", "sample_rank")
      .join(broadcast(quotas), Seq("lang"))
      .where(col("sample_rank") <= col("__quota"))
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      .orderBy(col("lang"), col("sample_rank"))
  }

  /** Per-stratum md5 rank by the two-level chunked prefix decomposition:
    * chunk = the hash's own leading hex byte (order-aligned, 256 even
    * sub-chunks per stratum), per-(stratum, chunk) counts → per-stratum
    * offset window over ≤256 rows → within-chunk `row_number` + offset.
    * Returns (ranked: stratumCol, idCol, __rank; counts: stratumCol,
    * __chunk, __cn) — `counts` is the tiny totals frame callers derive
    * stratum sizes from without a second pass.
    */
  private def stratumChunkRank(docs: DataFrame, stratumCol: String,
                               idCol: String): (DataFrame, DataFrame) = {
    val h = md5(col(idCol).cast("string"))
    val withH = docs.select(col(stratumCol), col(idCol), h.as("__h"))
      .withColumn("__chunk",
        conv(substring(col("__h"), 1, 2), 16, 10).cast("long"))
    val counts = withH.groupBy(col(stratumCol), col("__chunk"))
      .agg(count(lit(1)).as("__cn"))
    val wChunks = Window.partitionBy(col(stratumCol)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cn")).over(wChunks), lit(0L)))
      .select(col(stratumCol), col("__chunk"), col("__off"))
    val wIn = Window.partitionBy(col(stratumCol), col("__chunk"))
      .orderBy(col("__h"), col(idCol))
    val ranked = withH.join(broadcast(offsets), Seq(stratumCol, "__chunk"))
      .withColumn("__rank", col("__off") + row_number().over(wIn).cast("long"))
      .select(col(stratumCol), col(idCol), col("__rank"))
    (ranked, counts)
  }

  /** MIX1: deterministic domain-mixing (balance-upsample) — replicate every
    * language stratum to exactly the largest stratum's size, the data-mixing
    * step that reweights a crawl before training. Per-doc copy count =
    * T div n + (rank ≤ T mod n ? 1 : 0) with T = max stratum size, n = own
    * stratum size, rank = the doc's md5 rank within its stratum (the
    * [[sp2StratifiedSample]] rank — deterministic and engine-portable), so
    * per-lang totals hit T EXACTLY and a rerun replicates the same docs.
    * Downstream, the loader materializes copies with a posexplode of
    * `sequence(1, n_copies)` — map-only; this query emits the assignment,
    * which is the part worth hash-checking.
    *
    * Scale shape: the per-stratum rank is [[stratumChunkRank]]'s two-level
    * chunked prefix decomposition (no whole-stratum window task); stratum
    * sizes and their max come from the same ≤256-rows-per-stratum totals
    * frame, broadcast back (the max via a 1-row cross join).
    */
  def mix1BalanceUpsample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (ranked, counts) = stratumChunkRank(docs, "lang", "doc_id")
    val sizes = counts.groupBy(col("lang")).agg(sum(col("__cn")).as("__n"))
    val tmax = sizes.agg(max(col("__n")).as("__t"))
    val base = ranked.join(broadcast(sizes), Seq("lang"))
    base.crossJoin(broadcast(tmax))
      .withColumn("n_copies",
        expr("__t div __n") +
          when(col("__rank") <= col("__t") % col("__n"), 1L).otherwise(0L))
      .select(col("lang"), col("doc_id"), col("n_copies"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** SP3: deterministic global training-order shuffle — every epoch loader
    * needs the corpus in a pseudo-random but REPRODUCIBLE order (same order
    * on rerun, different order per seed, no RNG state to coordinate across
    * 1000 executors). Order key = md5(seed ‖ doc_id): a keyed hash is a
    * fixed function, so the permutation is pure data — Spark range-partitions
    * the sort (sampled split points, each task sorts its range; no single
    * task ever holds the corpus) and DuckDB replays it exactly. Emits the
    * shuffled rank via a two-level prefix count (the [[SequencePack]]
    * construction over hash-prefix chunks), NOT a global row_number window —
    * same reproducibility, no one-task bottleneck.
    */
  def sp3ShuffleOrder(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val h = md5(concat(lit("epoch7:"), col("doc_id").cast("string")))
    // chunk = first byte of the hash: 256 even buckets, order-aligned with
    // the hash sort order because the chunk key is the hash's own prefix
    val withH = docs.select(col("doc_id"), h.as("__h"))
      .withColumn("__chunk", conv(substring(col("__h"), 1, 2), 16, 10).cast("long"))
    val counts = withH.groupBy(col("__chunk")).agg(count(lit(1)).as("__n"))
    val wChunks = Window.orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wChunks), lit(0L)))
      .select(col("__chunk"), col("__off"))
    val wIn = Window.partitionBy(col("__chunk")).orderBy(col("__h"), col("doc_id"))
    withH.join(broadcast(offsets), "__chunk")
      .withColumn("shuffle_rank", col("__off") + row_number().over(wIn).cast("long"))
      .select(col("doc_id"), col("shuffle_rank"))
      .orderBy(col("shuffle_rank"))
  }

  /** SQ1: pack the corpus into fixed 2048-token training sequences and emit
    * the per-sequence manifest. The global running token count is computed
    * by [[graft.operators.SequencePack]]'s two-level distributed prefix sum
    * (per-chunk totals → tiny offset window → within-chunk windows), NOT a
    * corpus-wide unpartitioned window — the difference between a plan that
    * dies at one task and one whose largest window holds `chunkWidth` rows.
    * The oracle replays the identical greedy policy as DuckDB's plain
    * windowed running sum, proving the chunked decomposition exact.
    */
  def sq1SequencePack(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    SequencePack.packManifest(docs, "doc_id", "tok",
        budget = 2048L, chunkWidth = 1024L)
      .orderBy(col("seq_id"))
  }

  /** The fold of the old separate recall-gate queries into the topk entries:
    * ONE pass over the approximate results (left join against the tiny
    * memoized exact set, then a per-query aggregate — `approx` is never
    * referenced twice, so the expensive ANN plan runs once), emitting
    * (query_id, recall_ok, k_full).
    */
  private def annGate(exact: DataFrame, approx: DataFrame, minHits: Int, k: Int): DataFrame = {
    val ex = exact.select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    val stats = approx.select("query_id", "neighbor_id")
      .join(ex, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("nhits"), count(lit(1)).as("nret"))
    exact.select("query_id").distinct()
      .join(stats, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("nhits"), lit(0L)) >= lit(minHits.toLong)).as("recall_ok"),
        (coalesce(col("nret"), lit(0L)) === lit(k.toLong)).as("k_full"))
      .orderBy(col("query_id"))
  }

  // ======================================================================
  // Round-6 corpus-prep operators ([[graft.operators.TextPipeline]])
  // ======================================================================

  /** PII1: PII redaction (C4-style scrubbing) — the synthetic corpus has no
    * PII, so the fixture plants deterministic emails / phone numbers / IPv4
    * addresses derived from doc_id (built identically in the oracle), then
    * redacts and counts them. Map-only, fully codegen'd regex kernels.
    */
  def pii1Redact(s: SparkSession, dir: String): DataFrame = {
    val idStr = col("doc_id").cast("string")
    val planted = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), idStr, lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit(" call 555-"), (lit(1000) + col("doc_id") % 9000).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" host 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string"))).otherwise(lit("")))
    val (ne, np, ni) = graft.operators.TextPipeline.piiCounts(col("__pii"))
    t(s, dir, "documents")
      .select(col("doc_id"), planted.as("__pii"))
      .select(col("doc_id"),
        graft.operators.TextPipeline.redactPii(col("__pii")).as("redacted"),
        ne.cast("long").as("n_emails"), np.cast("long").as("n_phones"),
        ni.cast("long").as("n_ips"))
  }

  /** LD1: duplicated-line fraction over the planted-dup fixture (every line
    * of docs 0–49 occurs in the planted copy, so the metric is provably
    * non-degenerate; organic cross-doc line collisions add on top).
    */
  def ld1DupLines(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.dupLineStats(
      docsWithPlantedDups(s, dir), "doc_id", "text")

  /** LR1: corpus-wide duplicate-line REWRITE over the planted-dup fixture
    * — every duplicated line survives only at its minimum-(doc, pos)
    * occurrence, so the 50 planted whole-doc copies must come back with
    * EMPTY text (their originals own every line) and organic cross-doc
    * line shares collapse to the first owner. String/integer output only
    * → hash-portable.
    */
  def lr1DedupRewrite(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.dedupLinesRewrite(
      docsWithPlantedDups(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** SD1: duplicated k-token SPAN metrics (the exact-substring-dedup
    * signal of Lee et al. 2022) over the NATURAL corpus — no planting
    * needed: the generator's segment reuse yields real duplicated 6-grams
    * at every SF (~9% of positions). Integer counts plus one exact
    * rational division → hash-portable.
    */
  def sd1DupSpans(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.dupSpanStats(
      t(s, dir, "documents"), "doc_id", "text", k = 6)
      .orderBy(col("doc_id"))

  /** SR1: duplicated-SPAN REWRITE — the actual Lee-et-al. removal (all but
    * the canonical minimum-(doc,pos) occurrence of every duplicated 6-token
    * span erased, interval-union overlap resolution) over a planted
    * fixture: 50 whole-document copies (ids +2M) that must reassemble to
    * '', and the ≥20-token docs under id 60 re-planted (ids +4M) as their
    * first 12 tokens plus a unique 6-token tail — the shared prefix is
    * removed up to the last full window and the tail plus the k−1 boundary
    * tokens survive. Organic duplicated 6-grams rewrite on top. The oracle
    * replays the (count, min(doc,pos)) canonical aggregate as lr1's
    * window pair (count, row_number) plus an explicit coverage join, so
    * hash equality proves the overlap resolution exact.
    */
  def sr1SpanRewrite(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val toks = split(trim(col("text")), "\\s+")
    val whole = docs.where(col("doc_id") < 50)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val tail = concat_ws(" ", Seq("a", "b", "c", "d", "e", "f").map(c =>
      concat(lit(s"uq$c"), col("doc_id").cast("string"))): _*)
    val part = docs.where(col("doc_id") < 60 && size(toks) >= 20)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(concat_ws(" ", slice(toks, 1, 12)), lit(" "), tail).as("text"))
    graft.operators.TextPipeline.dedupSpansRewrite(
      docs.unionAll(whole).unionAll(part), "doc_id", "text", k = 6)
      .orderBy(col("doc_id"))
  }

  /** MIX4: temperature mixture under the data-constrained-scaling repeat
    * cap (≤ 2 epochs per (lang, source) domain here, budget = the
    * corpus's own token count) — exact closed-form water-fill, all
    * integer outputs. The oracle replays the sort + prefix/suffix windows
    * + cross-product cap test + largest-remainder top-up in HUGEINT, so
    * hash equality proves the allocation exact: small domains cap (√size
    * shares overweight them), big domains absorb the remainder, and
    * allocations sum to exactly the budget.
    */
  def mix4RepeatCap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(concat(col("lang"), lit("/"), col("source")).as("stratum"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.TextPipeline.repeatCapMixture(
        docs, "stratum", col("n_tokens"), maxEpochs = 2)
      .orderBy(col("stratum"))
  }

  /** T8: Gopher heuristic quality gates (mean word length, symbol-to-word
    * ratio, alphabetic-word fraction, stopword containment) with a planted
    * '#'-spam fixture (20 hash marks appended to docs 0–39 under ids +5M —
    * must fail the symbol gate) on top of the natural corpus.
    * `minStopwords = 1` here: the synthetic vocabulary carries at most one
    * of the canonical eight function words per doc, so Gopher's ≥ 2 would
    * degenerate to keep-nothing; at 1 the stopword axis genuinely splits
    * the corpus (~78% pass). All ratios are exact-integer IEEE divisions.
    */
  def t8GopherGates(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val planted = docs.where(col("doc_id") < 40)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" "),
          concat_ws(" ", (0 until 20).map(_ => lit("#")): _*)).as("text"))
    graft.operators.TextPipeline.gopherGates(
      docs.unionAll(planted), "doc_id", "text", minStopwords = 1)
      .orderBy(col("doc_id"))
  }

  /** LM1: corpus-trained Laplace-smoothed bigram-LM mean probability per
    * doc — the in-engine stand-in for a KenLM-perplexity quality filter.
    */
  def lm1BigramScore(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.bigramLmScore(
      t(s, dir, "documents"), "doc_id", "text")

  /** DS1: Moore–Lewis / DSIR-style domain selection — every document
    * scored under the lang='en' target bigram model and the raw-corpus
    * model; selected iff the quantized target sum strictly beats the raw
    * sum. Output is all-integer (two quantized-long sums + the flag), so
    * the hash is portable by construction.
    */
  def ds1DsirSelect(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.dsirSelect(
      t(s, dir, "documents").select(col("doc_id"), col("text"), col("lang")),
      "doc_id", "text", col("lang") === lit("en"))
      .orderBy(col("doc_id"))

  /** CH1: sliding-window context chunking (64-token windows, stride 48). */
  def ch1Chunks(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.slidingChunks(
      t(s, dir, "documents"), "doc_id", "text")

  /** ND1: incremental dedup — a new crawl batch (docs with doc_id % 10 == 0,
    * plus 30 planted resubmissions of already-indexed docs under shifted
    * ids) deduped against the existing corpus's fingerprint index by
    * anti-join; the planted resubmissions MUST all be dropped, and
    * within-batch exact dups collapse to the min id.
    */
  def nd1IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val existing = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
      .unionAll(existing.where(col("doc_id") < 30)
        .withColumn("doc_id", col("doc_id") + lit(3000000L)))
    val index = graft.operators.TextPipeline.fingerprints(existing, "doc_id", "text")
    graft.operators.TextPipeline.incrementalDedup(batch, "doc_id", "text", index)
  }

  /** ND2: incremental NEAR-dedup — the rolling-crawl shape nd1 covers only
    * for exact dups: the corpus's MinHash band/bucket index is built ONCE
    * ([[Dedup.buildLshIndex]]); a new batch probes it per bucket (skew
    * guard on the index side), verifies Jaccard against only the colliding
    * index docs, and near-dedups within itself — corpus text is never
    * rescanned. Fixture plants doubled-text near-dups (text ‖ ' ' ‖ text:
    * trigram j = n/(n+2) ≥ 0.93 for the ≥30-word docs selected — NOT exact
    * dups, so nd1's fingerprint path can't catch them) of indexed docs
    * under shifted ids. Emits the surviving batch ids; the oracle replays
    * survival with exact all-pairs trigram Jaccard on both relations
    * (batch×index, batch×batch keep-first), so hash equality proves the
    * guarded probe plan recovers every qualifying match.
    */
  def nd2IncrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val existing = docs.where(col("doc_id") % 10 =!= 0)
    val planted = existing
      .where(col("doc_id") < 60 &&
        size(split(trim(col("text")), "\\s+")) >= 30)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"))
    val batch = docs.where(col("doc_id") % 10 === 0).unionAll(planted)
    val index = Dedup.buildLshIndex(existing, "doc_id", "text",
      numHashes = 128, bands = 16, shingleSize = 3)
    val matches = Dedup.incrementalNearDup(batch, "doc_id", "text", index,
      threshold = 0.9)
    index.close()
    batch.select(col("doc_id"))
      .join(matches.select(col("batch_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** ND3: incremental SEMANTIC near-dup — a new embedding batch probed
    * against a persisted SemDeDup index (built on the vec_id % 10 != 0
    * corpus, never re-clustered or rescanned). Fixture plants scaled
    * paraphrases (first component ·1.001 — cosine ≈ 1 with the source):
    * ids +1M perturb INDEXED sources (must fall to the batch-vs-index
    * relation) and ids +2M perturb BATCH sources (must fall to the
    * within-batch keep-first relation). Emits surviving batch ids; the
    * oracle replays survival as exact all-pairs cosine over both
    * relations, so hash equality proves the nearest-centroid assignment
    * plus cluster-local verify recovers every qualifying pair. (Like d8,
    * the pin holds because every cos ≥ 0.99 pair co-assigns under the
    * current geometry — a future geometry change can break the hash
    * without SemDeDup being "wrong"; see the d8 oracle note.)
    */
  def nd3IncrementalSemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val existing = e.where(col("vec_id") % 10 =!= 0)
    def perturb(src: DataFrame, offset: Long) = src
      .select((col("vec_id") + offset).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val b0 = e.where(col("vec_id") % 10 === 0)
    val batch = b0
      .unionAll(perturb(existing.where(col("vec_id") < 50), 1000000L))
      .unionAll(perturb(b0.where(col("vec_id") < 60), 2000000L))
    val index = Dedup.buildSemIndex(existing, "vec_id", "embedding",
      nClusters = 16, iterations = 3)
    val matches = Dedup.incrementalSemDedup(batch, "vec_id", "embedding",
      index, threshold = 0.99)
    index.close()
    batch.select(col("vec_id"))
      .join(matches.select(col("batch_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }

  /** ND2R: the nd2 rolling-crawl probe against a RELOADED index — build
    * the MinHash index, [[Dedup.LshIndex.save]] it to a fresh parquet
    * lineage, drop the in-memory handle, [[Dedup.loadLshIndex]], and only
    * then probe. Same fixture and oracle as nd2: hash equality proves the
    * durable round-trip is invisible — the persisted index answers every
    * probe exactly as the in-session one did (the cross-SESSION contract a
    * rolling crawl actually needs; nd2 alone only proves the in-JVM form).
    */
  def nd2rReloadedNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val existing = docs.where(col("doc_id") % 10 =!= 0)
    val planted = existing
      .where(col("doc_id") < 60 &&
        size(split(trim(col("text")), "\\s+")) >= 30)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"))
    val batch = docs.where(col("doc_id") % 10 === 0).unionAll(planted)
    val built = Dedup.buildLshIndex(existing, "doc_id", "text",
      numHashes = 128, bands = 16, shingleSize = 3)
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_lshidx").toString
    built.save(lineage)
    built.close()
    val index = Dedup.loadLshIndex(s, lineage)
    val matches = Dedup.incrementalNearDup(batch, "doc_id", "text", index,
      threshold = 0.9)
    index.close()
    batch.select(col("doc_id"))
      .join(matches.select(col("batch_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** ND3R: the nd3 semantic probe against a RELOADED [[Dedup.SemIndex]] —
    * save/load between build and probe (centroids + members round-trip
    * through parquet; the probe routing re-derives deterministically from
    * the stored centroids). Same fixture and oracle as nd3.
    */
  def nd3rReloadedSemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val existing = e.where(col("vec_id") % 10 =!= 0)
    def perturb(src: DataFrame, offset: Long) = src
      .select((col("vec_id") + offset).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val b0 = e.where(col("vec_id") % 10 === 0)
    val batch = b0
      .unionAll(perturb(existing.where(col("vec_id") < 50), 1000000L))
      .unionAll(perturb(b0.where(col("vec_id") < 60), 2000000L))
    val built = Dedup.buildSemIndex(existing, "vec_id", "embedding",
      nClusters = 16, iterations = 3)
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_semidx").toString
    built.save(lineage)
    built.close()
    val index = Dedup.loadSemIndex(s, lineage)
    val matches = Dedup.incrementalSemDedup(batch, "vec_id", "embedding",
      index, threshold = 0.99)
    index.close()
    batch.select(col("vec_id"))
      .join(matches.select(col("batch_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }

  /** ND4: the nd3 probe against an APPENDED-then-COMPACTED
    * [[Dedup.SemIndex]] — the full index lifecycle in one row: build on the
    * existing corpus, append a region-concentrated blob (jittered copies of
    * one anchor vector, half the existing ids), `compact` the now-oversized
    * cluster(s) (cluster-local 2-means split, fresh sub-cluster ids), then
    * probe a batch holding fresh vectors plus planted near-copies of BOTH
    * pre-append members and appended blob members. The oracle is the d8
    * trick: an exact all-pairs replay of the match semantics, so the row is
    * green iff the split geometry still routes every planted near-copy into
    * a sub-cluster containing a ≥-threshold twin — the recall question
    * compaction raises, measured end to end.
    */
  def nd4CompactedSemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val existing = e.where(col("vec_id") % 10 =!= 0)
    val anchor = existing.where(col("vec_id") === 1)
      .select(col("embedding").as("__a"))
    // blob: every even existing id re-embedded as a coord-1-jittered copy
    // of the anchor (jitter keyed by the ORIGINAL id so both engines derive
    // identical floats), ids offset into 3000000+
    val blob = existing.where(col("vec_id") % 2 === 0)
      .crossJoin(broadcast(anchor))
      .select((col("vec_id") + 3000000L).as("vec_id"),
        concat(
          array((element_at(col("__a"), 1).cast("double") *
            (lit(1.0) + lit(0.0001) * col("vec_id").cast("double")))
            .cast("float")),
          slice(col("__a"), 2, 63)).as("embedding"))
    def perturb(src: DataFrame, offset: Long) = src
      .select((col("vec_id") + offset).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val b0 = e.where(col("vec_id") % 10 === 0)
    val batch = b0
      .unionAll(perturb(existing.where(col("vec_id") < 50), 5000000L))
      .unionAll(perturb(blob.where(col("vec_id") < 3000100L), 3000000L))
    val built = Dedup.buildSemIndex(existing, "vec_id", "embedding",
      nClusters = 16, iterations = 3)
    val appended = built.append(blob, "vec_id", "embedding")
    val index = appended.compact(maxFactor = 1.5)
    val matches = Dedup.incrementalSemDedup(batch, "vec_id", "embedding",
      index, threshold = 0.99)
    index.close()
    batch.select(col("vec_id"))
      .join(matches.select(col("batch_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }

  /** The nd5 fixture: er1-style distinctive record names (key suffixed
    * twice so distinct customers sit ≥ 2 edits apart even after one typo),
    * split into an indexed corpus (key % 10 ≠ 0) and a crawl batch — the
    * % 10 == 0 names plus planted 1-edit typos of INDEXED names (+1M ids,
    * must fall to the batch-vs-index relation) and of BATCH names (+2M
    * ids, must fall to within-batch keep-first).
    */
  private def fuzzyCrawlFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val names = t(s, dir, "customer")
      .select(col("c_custkey").as("rec_id"),
        concat(col("c_name"), lit("/"), col("c_custkey").cast("string"),
          lit("/"), col("c_custkey").cast("string")).as("name"))
    val existing = names.where(col("rec_id") % 10 =!= 0)
    val b0 = names.where(col("rec_id") % 10 === 0)
    val delTypo = existing.where(col("rec_id") < 100)
      .select((col("rec_id") + 1000000L).as("rec_id"),
        concat(col("name").substr(lit(1), lit(1)),
          col("name").substr(lit(3), length(col("name")))).as("name"))
    val subTypo = b0.where(col("rec_id") < 120)
      .select((col("rec_id") + 2000000L).as("rec_id"),
        concat(col("name").substr(lit(1), lit(2)), lit("x"),
          col("name").substr(lit(4), length(col("name")))).as("name"))
    (existing, b0.unionAll(delTypo).unionAll(subTypo))
  }

  /** ND5: incremental FUZZY dedup — the rolling-crawl probe for
    * typo-level string variation ([[FuzzyJoin.incrementalFuzzyDedup]]),
    * completing the index family (nd1 exact, nd2 lexical, nd3 semantic):
    * the deletion-variant bucket index is built ONCE over the corpus
    * names; a batch probes bucket-locally (index-side hot-bucket guard),
    * verifies exact levenshtein against colliders only, and fuzzy-dedups
    * within itself. Emits surviving batch ids; the oracle replays
    * survival with brute-force O(batch·index) levenshtein, so hash
    * equality proves the hashed deletion-neighborhood blocking recovers
    * every qualifying match end to end.
    */
  def nd5IncrementalFuzzy(s: SparkSession, dir: String): DataFrame = {
    val (existing, batch) = fuzzyCrawlFixture(s, dir)
    val index = FuzzyJoin.buildFuzzyIndex(existing, "rec_id", "name")
    val matches = FuzzyJoin.incrementalFuzzyDedup(batch, "rec_id", "name", index)
    index.close()
    batch.select(col("rec_id"))
      .join(matches.select(col("batch_id").as("rec_id")).distinct(),
        Seq("rec_id"), "left_anti")
      .orderBy(col("rec_id"))
  }

  /** ND5R: the nd5 probe against a RELOADED [[FuzzyJoin.FuzzyIndex]] —
    * save the lineage, drop the in-memory handle, reload, then probe
    * (the nd2r/nd3r cross-session contract). Same fixture and oracle as
    * nd5: hash equality proves the durable round-trip is invisible.
    */
  def nd5rReloadedFuzzy(s: SparkSession, dir: String): DataFrame = {
    val (existing, batch) = fuzzyCrawlFixture(s, dir)
    val built = FuzzyJoin.buildFuzzyIndex(existing, "rec_id", "name")
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_fuzzyidx").toString
    built.save(lineage)
    built.close()
    val index = FuzzyJoin.loadFuzzyIndex(s, lineage)
    val matches = FuzzyJoin.incrementalFuzzyDedup(batch, "rec_id", "name", index)
    index.close()
    batch.select(col("rec_id"))
      .join(matches.select(col("batch_id").as("rec_id")).distinct(),
        Seq("rec_id"), "left_anti")
      .orderBy(col("rec_id"))
  }

  /** URL1: URL-domain blocklist filter (C4's source filter) — URLs planted
    * on even doc_ids ("http://site{id%13}.example.com/p/{id}"), two domains
    * blocklisted; odd docs carry no URL and pass with a null domain.
    */
  def url1DomainFilter(s: SparkSession, dir: String): DataFrame = {
    val idStr = col("doc_id").cast("string")
    val planted = concat(col("text"),
      when(col("doc_id") % 2 === 0,
        concat(lit(" http://site"), (col("doc_id") % 13).cast("string"),
          lit(".example.com/p/"), idStr)).otherwise(lit("")))
    val docs = t(s, dir, "documents").select(col("doc_id"), planted.as("text"))
    graft.operators.TextPipeline.domainFilter(docs, "text",
        Seq("site0.example.com", "site7.example.com"))
      .select(col("doc_id"), col("domain"))
  }

  /** The url2/url3 fixture: a deterministically MESSY URL per document —
    * uppercase scheme/host, default port on every third doc, a fragment
    * and a tracking param on even docs, shuffled param order on odd docs.
    * Consecutive (2m, 2m+1) pairs differ in raw form but share one
    * canonical URL, so canonicalization provably merges them. Shared
    * verbatim with the DuckDB oracle.
    */
  private def messyUrl: Column = {
    val m = floor(col("doc_id") / 2).cast("long")
    concat(
      lit("HTTP://Site"), (m % 13).cast("string"), lit(".Example.COM"),
      when(col("doc_id") % 3 === 0, lit(":80")).otherwise(lit("")),
      lit("/Art/"), m.cast("string"),
      when(col("doc_id") % 2 === 0, lit("?b=2&utm_source=feed&a=1#top"))
        .otherwise(lit("?a=1&utm_campaign=z&b=2")))
  }

  /** URL2: URL canonicalization ([[graft.operators.TextPipeline
    * .canonicalizeUrl]]) — map-only normalization of scheme/host case,
    * default ports, fragments, tracking params and query-param order; the
    * step before any URL-keyed crawl dedup.
    */
  def url2Canonicalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), messyUrl.as("url"))
      .withColumn("canonical_url",
        graft.operators.TextPipeline.canonicalizeUrl(col("url")))
      .orderBy(col("doc_id"))

  /** URL3: canonical-URL dedup — group by the canonical form, keep the
    * min-doc_id survivor with its duplicate count (the d1 exact-dedup
    * shape keyed on url2's canonical string: one map-side-combined
    * shuffle on the canonical key). The fixture plants one canonical per
    * (2m, 2m+1) pair, so exactly the even/odd twins merge.
    */
  def url3CanonicalDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), messyUrl.as("url"))
      .select(col("doc_id"),
        graft.operators.TextPipeline.canonicalizeUrl(col("url"))
          .as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1L)).as("n_dups"))
      .select(col("doc_id"), col("canonical_url"), col("n_dups"))
      .orderBy(col("doc_id"))

  /** KS1: two-sample Kolmogorov–Smirnov drift evidence ([[graft.operators
    * .Drift.ksDrift]]) over drift1's exact snapshots and binning — the
    * classic CDF-gap statistic alongside drift1's per-bin divergence, at
    * the same one-scan-per-snapshot cost (see the ksDrift scaladoc for
    * why binned, not globally sorted).
    */
  def ks1Drift(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    graft.operators.Drift.ksDrift(
      o.where(col("o_orderdate") < ts(driftCut)),
      o.where(col("o_orderdate") >= ts(driftCut)),
      "o_totalprice", lo = 0.0, hi = 500000.0, nBins = 20)
  }

  /** AB1: Welch two-sample t evidence ([[graft.operators.Association
    * .welchT]]) — does urgent-priority order value differ from low
    * priority; one two-group scan, 2-row local finish.
    */
  def ab1WelchT(s: SparkSession, dir: String): DataFrame =
    graft.operators.Association.welchT(
      t(s, dir, "orders"), "o_orderpriority", "o_totalprice",
      "1-URGENT", "5-LOW")

  /** DRIFT4: per-SEGMENT drift ([[graft.operators.Drift.numericDriftBy]])
    * — document-length drift between the even/odd doc_id halves,
    * normalized within each language; catches the per-segment shift an
    * aggregate drift check averages away.
    */
  def drift4BySegment(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.operators.Drift.numericDriftBy(
      d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 =!= 0),
      "lang", "n_chars", lo = 0.0, hi = 600.0, nBins = 12)
  }

  /** ASSOC1: chi-square association evidence ([[graft.operators
    * .Association.chiSquareCells]]) between order priority and order
    * status — the full observed grid with exact counts, expected counts
    * and 6dp per-cell terms; p14's categorical counterpart.
    */
  def assoc1Chi2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Association.chiSquareCells(
      t(s, dir, "orders"), "o_orderpriority", "o_orderstatus")

  /** ASSOC1B: the 1-row chi-square summary ([[graft.operators.Association
    * .chiSquareStat]]) — n, degrees of freedom, the exact-integer-summed
    * statistic and Cramér's V over the same single scan.
    */
  def assoc1bCramers(s: SparkSession, dir: String): DataFrame =
    graft.operators.Association.chiSquareStat(
      t(s, dir, "orders"), "o_orderpriority", "o_orderstatus")

  /** TS1: daily resample + forward fill ([[graft.operators.TimeSeries
    * .resample]]) of each user's event values — the irregular→regular
    * grid step before windowed features; grid size is keys × days,
    * independent of event volume.
    */
  def ts1Resample(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.resample(
      t(s, dir, "events").select(col("user_id"), col("ts"),
        col("event_id"), col("value")),
      "user_id", "ts", "event_id", "value", stepSeconds = 86400L)

  /** AN1: trailing-window z-score anomaly flags ([[graft.operators
    * .TimeSeries.rollingAnomaly]]) per user over the event stream —
    * key-local windows, integer-exact window sums, 6dp-quantized scores.
    */
  def an1RollingAnomaly(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.rollingAnomaly(
      t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("ts"), col("value")),
      "user_id", "ts", "event_id", "value", windowRows = 20,
      threshold = 3.0)
      .select(col("event_id"), col("user_id"), col("z"), col("is_anomaly"))

  /** REG1: group-wise OLS trend ([[graft.operators.Association
    * .linearTrend]]) — slope/intercept/r² of order value over epoch-day
    * per priority class, from one scan of exact sufficient sums.
    */
  def reg1GroupwiseTrend(s: SparkSession, dir: String): DataFrame =
    graft.operators.Association.linearTrend(
      t(s, dir, "orders").withColumn("x_day",
        floor(col("o_orderdate").cast("timestamp").cast("long") /
          lit(86400.0)).cast("long")),
      "o_orderpriority", "x_day", "o_totalprice")
      .orderBy(col("o_orderpriority"))

  /** OH1: dictionary one-hot encoding ([[graft.operators.Cleaning
    * .oneHot]]) of order priority — map-only indicator columns from a
    * pinned category dictionary.
    */
  def oh1OneHot(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cleaning.oneHot("o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
      "prio")(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")))

  /** TE1: smoothed mean target encoding ([[graft.operators.Features
    * .targetEncode]]) of priority against order value — one scan for the
    * per-category exact sums, encoding broadcast back map-only.
    */
  def te1TargetEncode(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.targetEncode(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice")),
      "o_orderpriority", "o_totalprice", smoothing = 10.0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderpriority_te"))

  /** FE1: exact-quantile discretization ([[graft.operators.Features
    * .quantileBin]]) — quartile buckets of extended price; fences from
    * the bounded exact-quantile machinery, assignment map-only.
    */
  def fe1QuantileBin(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.quantileBin(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice")),
      "l_extendedprice")

  /** SC1: min-max scaling ([[graft.operators.Features.minMaxScale]]) of
    * two lineitem measures — one 1-row aggregate broadcast over a
    * map-only projection.
    */
  def sc1MinmaxScale(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.minMaxScale(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_tax")),
      Seq("l_quantity", "l_tax"))

  /** TM1: first-order Markov transition matrix ([[graft.operators
    * .Features.transitionMatrix]]) of each user's event-type sequence —
    * key-local lag, one states²-wide count shuffle, localized share math.
    */
  def tm1Transitions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.transitionMatrix(
      t(s, dir, "events").select(col("user_id"), col("event_type"),
        col("ts"), col("event_id")),
      "user_id", "event_type", "ts", "event_id")

  /** PR1: integer-exact PageRank ([[graft.operators.Graph.pageRank]])
    * over the supplier↔part co-occurrence graph from lineitem (both edge
    * directions, deduped) — 5 iterations of join+aggregate with BIGINT
    * mass, bit-reproducible across engines (the oracle replays all 5
    * hops in unrolled SQL). Part nodes are offset by 2e9 to share the id
    * space.
    */
  def pr1Pagerank(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_suppkey"),
      (col("l_partkey") + lit(2000000000L)).as("__p"))
    val edges = li.select(col("l_suppkey").as("src"), col("__p").as("dst"))
      .union(li.select(col("__p").as("src"), col("l_suppkey").as("dst")))
      .distinct()
    graft.operators.Graph.pageRank(edges, "src", "dst", iterations = 5)
      .orderBy(col("node"))
  }

  /** IJ1: bucketed interval-overlap join ([[graft.operators.IntervalJoin
    * .overlapJoin]]) — each user's 30-minute-gap sessions joined to the
    * SCD2 event-type runs they overlap (both interval sets derived from
    * the same stream, half-open epoch-second bounds; open runs capped at
    * the user's last event + 1). Daily buckets; exactly-once emission via
    * the first-shared-bucket rule, no dedup shuffle.
    */
  def ij1IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("sec", col("ts").cast("long"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("sec")).as("s_start"), (max(col("sec")) + 1).as("s_end"))
    val lastSec = ev.groupBy(col("user_id"))
      .agg((max(col("sec")) + 1).as("__cap"))
    val runs = graft.operators.ChangeCapture.scd2(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
      .join(lastSec, Seq("user_id"))
      .select(col("user_id"), col("event_type"),
        col("valid_from").cast("long").as("r_start"),
        coalesce(col("valid_to").cast("long"), col("__cap")).as("r_end"))
    graft.operators.IntervalJoin.overlapJoin(sess, runs, "user_id",
        "s_start", "s_end", "r_start", "r_end", bucketSeconds = 86400L)
      .select(col("user_id"), col("sess_id"), col("s_start"), col("s_end"),
        col("event_type"), col("r_start"), col("r_end"),
        (least(col("s_end"), col("r_end")) -
          greatest(col("s_start"), col("r_start"))).as("overlap_secs"))
  }

  /** TC1: degree-oriented triangle counting ([[graft.operators.Graph
    * .triangleCounts]]) over the part co-purchase graph — parts are
    * adjacent when they appear in the same order; pair generation is
    * order-local, orientation bounds wedge volume at O(m^1.5) under any
    * hub skew. Per-node participation counts.
    */
  def tc1TriangleCount(s: SparkSession, dir: String): DataFrame = {
    val lp = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("__ok"), col("l_partkey").as("__pk"))
      .distinct()
    val edges = lp
      .join(lp.select(col("__ok"), col("__pk").as("__pk2")), Seq("__ok"))
      .where(col("__pk") < col("__pk2"))
      .select(col("__pk").as("src"), col("__pk2").as("dst"))
    graft.operators.Graph.triangleCounts(edges, "src", "dst")
  }

  /** AR1: market-basket association rules ([[graft.operators.Association
    * .marketBasket]]) — which part brands co-occur across a customer's
    * orders, with support / both-direction confidence / lift on exact
    * counts; Apriori-pruned before the basket-local pair explode.
    */
  def ar1AssocRules(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val baskets = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .select(col("o_custkey").as("basket"), col("p_brand").as("item"))
    graft.operators.Association.marketBasket(baskets, "basket", "item",
      minSupport = 5L)
  }

  /** TC2: local clustering coefficients ([[graft.operators.Graph
    * .clusteringCoefficients]]) over the same co-purchase graph as tc1 —
    * per-node neighborhood density `2T/(d(d−1))`, every node reported.
    */
  def tc2ClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    val lp = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("__ok"), col("l_partkey").as("__pk"))
      .distinct()
    val edges = lp
      .join(lp.select(col("__ok"), col("__pk").as("__pk2")), Seq("__ok"))
      .where(col("__pk") < col("__pk2"))
      .select(col("__pk").as("src"), col("__pk2").as("dst"))
    graft.operators.Graph.clusteringCoefficients(edges, "src", "dst")
  }

  /** GINI1: per-branch Gini split evidence ([[graft.operators.Features
    * .giniSplitBranches]]) — does order priority separate order status;
    * the decision-tree-prep companion to assoc1's chi-square.
    */
  def gini1SplitBranches(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.giniSplitBranches(
      t(s, dir, "orders"), "o_orderpriority", "o_orderstatus")

  /** GINI1B: the 1-row root-vs-split Gini summary ([[graft.operators
    * .Features.giniSplitStat]]) over the same single scan.
    */
  def gini1bSplitStat(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.giniSplitStat(
      t(s, dir, "orders"), "o_orderpriority", "o_orderstatus")

  /** GINI2: feature ranking by Gini gain ([[graft.operators.Features
    * .giniFeatureRanking]]) — three candidate features (priority, order
    * year, price bucket) scored against order status in one melted scan.
    */
  def gini2FeatureRanking(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .withColumn("price_bucket",
        floor(col("o_totalprice") / lit(50000.0)).cast("long"))
    graft.operators.Features.giniFeatureRanking(o,
      Seq("o_orderpriority", "order_year", "price_bucket"), "o_orderstatus")
  }

  /** SC2: robust scaling ([[graft.operators.Features.robustScale]]) —
    * `(x − median)/IQR` of two lineitem measures; the outlier-immune
    * sibling of sc1's min-max, fences from the bounded exact-quantile
    * machinery.
    */
  def sc2RobustScale(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.robustScale(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice")),
      Seq("l_quantity", "l_extendedprice"))

  /** W7: user-growth curve ([[graft.operators.TimeSeries.userGrowth]]) —
    * DAU, first-time users and exact cumulative distinct users per day;
    * the cumulative is a running sum of first-seen counts, never a
    * growing distinct state.
    */
  def w7UserGrowth(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.userGrowth(
      t(s, dir, "events"), "user_id", "ts")

  /** CHURN1: churn hazard table ([[graft.operators.Funnel.churnHazard]])
    * — per day, users at risk, churn events (last-active day before the
    * horizon) and the hazard rate; Kaplan–Meier survival is the
    * driver-side product over this frame.
    */
  def churn1Hazard(s: SparkSession, dir: String): DataFrame = {
    // deterministic 5% md5 thinning (the sp1 convention): the synthetic
    // stream is so dense every user stays active to the horizon; the
    // sparse view spreads last-active days so the hazard table is real
    val keep = conv(substring(md5(col("event_id").cast("string")), 1, 8),
      16, 10).cast("long") % 20 === 0
    graft.operators.Funnel.churnHazard(
      t(s, dir, "events").where(keep), "user_id", "ts")
  }

  /** W6: activity streaks ([[graft.operators.TimeSeries
    * .activityStreaks]]) — per user, maximal runs of consecutive active
    * days from the event stream (gaps-and-islands, key-local).
    */
  def w6Streaks(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.activityStreaks(
      t(s, dir, "events"), "user_id", "ts")

  /** FE2: trailing lag / rolling-mean features ([[graft.operators
    * .Features.rollingFeatures]]) per user over the event stream — the
    * standard windowed feature prep, exact-integer window sums.
    */
  def fe2RollingFeatures(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.rollingFeatures(
      t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"),
        col("value")),
      "user_id", "ts", "event_id", "value")
      .select(col("event_id"), col("user_id"), col("value"),
        col("value_lag1"), col("value_lag2"), col("value_rmean3"))

  /** CH2: sentence segmentation ([[graft.operators.TextPipeline
    * .sentences]]) — one map-only RE2-portable extract pass; the unit
    * step before sentence-bounded chunking.
    */
  def ch2Sentences(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.sentences(
      t(s, dir, "documents"), "doc_id", "text")

  /** T9: Flesch reading-ease ([[graft.operators.TextPipeline
    * .readability]]) — three codegen'd regex counts in one map-only scan,
    * fixed IEEE finish.
    */
  def t9Readability(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.readability(
      t(s, dir, "documents"), "doc_id", "text")

  /** SP5: deterministic weight-proportional sampling ([[graft.operators
    * .SequencePack.systematicSample]]) — ~100 documents selected by
    * fixed-stride crossings of the char-weight cumulative; reruns pick
    * the identical set, selection probability ∝ n_chars.
    */
  def sp5SystematicSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.SequencePack.systematicSample(
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        col("n_chars")),
      "doc_id", "n_chars", k = 100L, chunkWidth = 4096L)

  /** CP7: the sampled-pipeline composition — heuristic gates + the NEW
    * Flesch readability gate ([[graft.operators.TextPipeline
    * .fleschScore]]) → exact dedup → near-dedup at threshold 1.0
    * (identical trigram sets — which the oracle replays as a group-by on
    * the canonicalized shingle set, no pair join) → deterministic
    * systematic downsampling of the final corpus by token mass
    * ([[graft.operators.SequencePack.systematicSample]]). One hash proves
    * the whole staged composition, including that the sample was drawn
    * from exactly the cleaned corpus.
    */
  def cp7SampledPipeline(s: SparkSession, dir: String): DataFrame = {
    val (out, _) = graft.plans.CorpusPipeline.run(
      t(s, dir, "documents"), "doc_id", "text",
      graft.plans.CorpusPipeline.Config(
        nearDupThreshold = 1.0,
        minFlesch = Some(10.0),
        sampleK = Some(50L),
        audit = false))
    out.select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"),
      col("sample_rank"))
  }

  /** RFM1: RFM customer segmentation ([[graft.operators.Features
    * .rfmSegments]]) over orders — exact per-customer
    * recency/frequency/monetary, quartile-scored against the
    * quantile_cont-compatible fences, classic `r-f-m` segment codes.
    */
  def rfm1Segments(s: SparkSession, dir: String): DataFrame =
    graft.operators.Features.rfmSegments(
      t(s, dir, "orders"), "o_custkey", "o_orderdate", "o_totalprice")

  /** POP1: month-over-month revenue growth ([[graft.operators.TimeSeries
    * .periodGrowth]]) — one period-keyed scan of orders, lag + percent
    * change on the localized bounded period frame.
    */
  def pop1PeriodGrowth(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.periodGrowth(
      t(s, dir, "orders").withColumn("yyyymm",
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long")),
      "yyyymm", "o_totalprice")

  /** PMI1: bigram collocations ([[graft.operators.TextPipeline
    * .collocations]]) over the documents corpus — rational PMI lift on
    * exact occurrence counts, top 20.
    */
  def pmi1Collocations(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.collocations(
      t(s, dir, "documents"), "text", minCount = 3L, topK = 20)

  /** DV1: keyed snapshot diff ([[graft.operators.ChangeCapture
    * .snapshotDiff]]) between two derived versions of orders — v1 drops
    * every 97th key, v2 drops every 89th, bumps price on every 7th and
    * flips status on every 11th; the diff must recover exactly those
    * adds/removes/changes from one full-outer join.
    */
  def dv1TableDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val v1 = o.where(col("o_orderkey") % 97 =!= 0)
    val v2 = o.where(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(100.0))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 11 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    graft.operators.ChangeCapture.snapshotDiff(v1, v2, Seq("o_orderkey"),
      Seq("o_orderstatus", "o_totalprice", "o_custkey"))
  }

  /** SP4: group-atomic (leakage-safe) train/val/test split — the split is
    * a pure md5-bucket hash of the GROUP key (l_orderkey), so every line
    * of an order lands in the same split by construction (no customer/
    * document leaking across train and test). Map-only assignment — the
    * per-group rollup here is just the reporting view.
    */
  def sp4GroupSplit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val bucket = conv(substring(md5(col("l_orderkey").cast("string")), 1, 8),
      16, 10).cast("long") % 100
    li.withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("l_orderkey"), col("split"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(floor(col("l_extendedprice") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_price"))
  }

  /** EWMA1: truncated adjusted EWMA smoothing ([[graft.operators
    * .TimeSeries.ewma]], decay 3/4 over 8 trailing rows) of each user's
    * event values — key-local lags, exact integer weights, bit-portable.
    */
  def ewma1Smoothing(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.ewma(
      t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"),
        col("value")),
      "user_id", "ts", "event_id", "value")
      .select(col("event_id"), col("user_id"), col("value"), col("ewma"))

  /** MIX2: per-language token-budget selection in reproducible hash order
    * (the mixture-quota trim), running sum via the per-stratum two-level
    * chunked prefix decomposition — the oracle replays it as a plain
    * per-lang window, proving the decomposition exact.
    */
  def mix2TokenBudget(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("lang"), col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.TextPipeline.tokenBudgetSelect(
      docs, "lang", "doc_id", "n_tokens", budget = 2000L)
  }

  /** TOK1: whitespace vs TRUE subword (BPE) token counts per document — the
    * unit conversion every training pipeline needs before budgets/packing
    * mean anything (the committed 48-merge fixture splits this corpus at
    * ~2.3 BPE tokens per whitespace token). The oracle replays the SAME
    * merge table as 2·M nested `replace` passes over separator-wrapped
    * words (see OracleSql's bpeApplySql proof sketch), so hash equality
    * proves the Catalyst kernel token-for-token.
    */
  def tok1BpeCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
      TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** TOK1R: tok1 driven by a RELOADED merge table — save the committed
    * fixture as a [[graft.operators.BpeStore]] lineage, load it back, and
    * tokenize with the loaded list (nd2r/nd3r's pattern for the third
    * session-spanning artifact, the tokenizer). The oracle is tok1's
    * verbatim, so hash equality proves the parquet round-trip preserves
    * merge ORDER and content token-for-token.
    */
  def tok1rReloadedBpe(s: SparkSession, dir: String): DataFrame = {
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_bpe").toString
    graft.operators.BpeStore.save(s, graft.functions.BpeVocab.Fixture, lineage)
    val merges = graft.operators.BpeStore.load(s, lineage)
    t(s, dir, "documents").select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
      TextFunctions.bpeTokenCount(col("text"), merges).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** TOK2: per-(lang, source) BPE fertility — subword tokens per
    * whitespace word, the tokenizer-efficiency report a multilingual
    * corpus audit runs (high fertility strata burn training budget).
    * Spark side is ONE map-side-combined aggregate over the codegen'd BPE
    * kernel (no explode); the oracle re-derives both counts from the
    * nested-replace merge replay per distinct word. Fertility is one
    * exact rational division, round(·,6) — portable.
    */
  def tok2BpeFertility(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_ws_tokens"),
        sum(TextFunctions.bpeTokenCount(col("text"))).as("n_bpe_tokens"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("n_ws_tokens"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") /
          col("n_ws_tokens").cast("double"), 6).as("fertility"))
      .orderBy(col("lang"), col("source"))

  /** MIX2b: [[mix2TokenBudget]] denominated in BPE tokens — the form a real
    * mixture quota takes (budgets are tokenizer tokens, not whitespace
    * counts). Same per-stratum chunked prefix decomposition; distinct salt
    * so the selection order is independent of mix2's.
    */
  def mix2bTokenBudgetBpe(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("lang"), col("doc_id"),
      TextFunctions.bpeTokenCount(col("text")).as("n_tokens"))
    graft.operators.TextPipeline.tokenBudgetSelect(
      docs, "lang", "doc_id", "n_tokens", budget = 4000L, saltPrefix = "mix2b:")
  }

  /** SQ1b: [[sq1SequencePack]] denominated in BPE tokens — sequence packing
    * in the unit the trainer actually consumes.
    */
  def sq1bSequencePackBpe(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      TextFunctions.bpeTokenCount(col("text")).as("tok"))
    SequencePack.packManifest(docs, "doc_id", "tok",
        budget = 2048L, chunkWidth = 1024L)
      .orderBy(col("seq_id"))
  }

  /** QZ1: int8 embedding quantization (per-vector max-abs scalar
    * quantization — the 4× memory lever ANN indexes take at 100 TB scale).
    * Codes are exact integer outputs of pinned left-associated IEEE
    * arithmetic, so the oracle replays every one bit-for-bit.
    */
  def qz1EmbeddingQuantize(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    Similarity.quantizeInt8(e, "vec_id", "embedding")
      .select(col("vec_id"), posexplode(col("q")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        col("col").as("q"))
      .orderBy(col("vec_id"), col("dim"))
  }

  /** S4: end-to-end quantization-recall gate — dequantized int8 vectors
    * through the exact top-k kernel must recover ≥ 6 of the true float
    * top-10 per query (the s2/s3 gate pattern; measured 10/10 on this
    * corpus). Proves the 4× memory saving does not cost retrieval quality.
    */
  def s4QuantTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val deq = Similarity.dequantizeInt8(
        Similarity.quantizeInt8(e, "vec_id", "embedding"), "vec_id",
        outCol = "embedding")
    val approx = Similarity.bruteForceTopK(deq,
      deq.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    annGate(s1Cached(s, dir), approx, minHits = 6, k = 10)
  }

  /** QC1: learned quality gate — ridge least squares over hashed
    * unigram-PRESENCE features ([[graft.operators.QualityClassifier]]),
    * trained in-engine on a planted labeling (docs containing the token
    * "dup" are "bad"; its md5 bucket is collision-free among this corpus's
    * vocabulary, so a zero-residual separator exists and the learned
    * predictions sit at ~1.0 / ~1e-10 — margin ~1.0 around the 0.5
    * threshold). The oracle pins the invariant (d6/s2 pattern): the trained
    * classifier must reproduce the planted labels EXACTLY, so any training
    * or scoring regression flips the driver hash red. Weights themselves
    * are ulp-level partition-dependent and deliberately not emitted.
    */
  def qc1QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityClassifier
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val labeled = docs.withColumn("y",
      array_contains(split(trim(col("text")), "\\s+"), "dup").cast("double"))
    // train (2 aggregates) + score (1) all read this one projection
    val feats = QualityClassifier.featurize(labeled, "doc_id", "text", dim = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = QualityClassifier.trainRidge(feats,
      labeled.select(col("doc_id"), col("y")), "doc_id", dim = 64)
    QualityClassifier.score(feats, model, "doc_id")
      .join(labeled.select(col("doc_id"), col("y")), "doc_id")
      .select(col("doc_id"),
        (col("score") >= model.threshold).as("pred_bad"),
        (col("y") === 1.0).as("label_bad"))
      .withColumn("correct", col("pred_bad") === col("label_bad"))
      .orderBy(col("doc_id"))
  }

  /** MIX3: temperature-resampled domain mixture (α = 0.5) — allocate a
    * 100k-unit sampling budget across the `source` domains proportional to
    * √(total chars), the multilingual-LM resampling that flattens domain
    * imbalance ([[graft.operators.TextPipeline.temperatureMixture]]).
    * All-integer output (quantized √ weight, largest-remainder allocation),
    * so the oracle replay is exact by construction.
    */
  def mix3TemperatureMix(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.temperatureMixture(
        t(s, dir, "documents"), "source", col("n_chars"), budget = 100000L)
      .orderBy(col("source"))

  /** CCN1: CCNet-style head/middle/tail quality tiers — every scored doc
    * assigned its equal-size tercile by corpus-trained bigram-LM score
    * ([[graft.operators.TextPipeline.qualityBuckets]]). Bucket semantics
    * are exactly `ntile(3) OVER (ORDER BY lm_score DESC, doc_id)` (the
    * oracle's form); the engine computes the same assignment through the
    * chunked-rank decomposition instead of a one-task global window.
    */
  def ccn1QualityBuckets(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextPipeline.qualityBuckets(
        t(s, dir, "documents"), "doc_id", "text", nBuckets = 3)
      .orderBy(col("doc_id"))

  /** DC3: SEMANTIC decontamination — the embedding-space sibling of dc1/dc2
    * that catches paraphrased benchmark leakage n-gram overlap misses.
    * Fixture: benchmark = vec_id < 20; corpus = the rest ∪ near-identical
    * copies of the benchmark (ids +1e6, element 1 scaled by 1.001f — the
    * d5b planting). The report must contain EXACTLY the 20 planted rows
    * (background cosine tops out ≈0.6 at every SF), each matched back to
    * its benchmark source; the oracle replays all-pairs exact cosine.
    */
  def dc3SemanticDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val bench = e.where(col("vec_id") < 20)
    val planted = bench
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = e.where(col("vec_id") >= 20).unionAll(planted)
    Similarity.semanticDecontaminate(corpus, bench, "vec_id", "embedding",
        threshold = 0.99)
      .select(col("vec_id").as("contaminated_id"), col("matched_bench_id"),
        col("n_matches"))
      .orderBy(col("contaminated_id"))
  }

  /** RP1: Johnson–Lindenstrauss sign projection — embeddings 0–49 projected
    * from 64-d onto 16 deterministic ±1 sign vectors
    * ([[Similarity.signProject]]; signs follow md5("rp:k:j"), shared with
    * the oracle as literal coefficients). Each projected value is a
    * left-associated 64-term double fold, so the dump is bit-exact across
    * engines — the hash check proves the projection kernel itself, while
    * [[s5RpTopK]] proves it preserves neighbors.
    */
  def rp1RandomProjection(s: SparkSession, dir: String): DataFrame =
    Similarity.signProject(
        t(s, dir, "embeddings").where(col("vec_id") < 50)
          .select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", outDims = 16)
      .select(col("vec_id"), posexplode(col("proj")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        col("col").as("proj"))
      .orderBy(col("vec_id"), col("dim"))

  /** S5: projection-filtered ANN recall gate — [[Similarity.rpTopK]]
    * (projected-space top-50 candidates → exact re-rank to top-10) over a
    * planted ground truth: 10 near-identical neighbors per query (ids
    * 2e6+q·100+m, element m+1 scaled by 1.001f, cosine ≈ 1−1e−7). The gate
    * requires ≥ 9 of the exact top-10 recovered per query (measured 10/10
    * at every SF) — JL projection must preserve near-duplicate neighbors,
    * which is precisely what the filter-then-refine path is for. Exact
    * top-10 is computed in-engine on the same fixture; the oracle pins the
    * gate TRUE (s2/s3 pattern).
    */
  def s5RpTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val queries = e.where(col("vec_id") < 5)
    val planted = queries
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(1), lit(10))).as("__m"))
      .select((lit(2000000L) + col("vec_id") * 100L + col("__m")).as("vec_id"),
        concat(
          slice(col("embedding"), lit(1), col("__m")),
          array((element_at(col("embedding"), col("__m") + 1) * lit(1.001f))
            .cast("float")),
          slice(col("embedding"), col("__m") + 2, lit(64))).as("embedding"))
    val fixture = e.unionAll(planted)
    val exact = Similarity.bruteForceTopK(fixture, queries, "vec_id", "embedding", k = 10)
    val approx = Similarity.rpTopK(fixture, queries, "vec_id", "embedding",
      k = 10, candidates = 50, outDims = 16)
    annGate(exact, approx, minHits = 9, k = 10)
  }

  // PQ memo for s6: codebooks + encoded corpus are query-independent —
  // train/encode once per dir (the ivfCached/s3bCached discipline)
  private val s6Cache = scala.collection.mutable.Map
    .empty[String, (Similarity.PqModel, DataFrame)]
  private def s6Cached(s: SparkSession, dir: String) =
    s6Cache.getOrElseUpdate(dir, {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      // m=16 x ks=32 with a 200-candidate re-rank: measured 10/10 exact
      // top-10 recall at sf0.001/0.01/0.1 (gate pinned at ≥8 for slack)
      val model = Similarity.trainPq(e, "vec_id", "embedding",
        m = 16, ks = 32, iterations = 2)
      val codes = Similarity.pqEncode(e, "vec_id", "embedding", model).persist()
      codes.count()
      (model, codes)
    })

  /** S6: product-quantization ANN ([[Similarity.trainPq]]/[[Similarity
    * .pqTopK]]) — 64-dim float vectors (256 bytes) compressed to 16
    * one-byte codes (16×), ADC table-lookup scan, 200-candidate
    * shortlist, exact cosine re-rank. Approximate lists are
    * engine-private, so the oracle pins the s2/s3 recall-gate invariant:
    * ≥8 of the exact top-10 recovered and the full k returned per query
    * (measured 10/10 at all SFs), which the 32-codeword-per-subspace
    * geometry must survive end to end.
    */
  def s6PqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val (model, codes) = s6Cached(s, dir)
    val approx = Similarity.pqTopK(e, codes, model,
      e.where(col("vec_id") < 5), "vec_id", "embedding",
      k = 10, shortlist = 200)
    annGate(s1Cached(s, dir), approx, minHits = 8, k = 10)
  }

  /** S7: IVF+PQ composite ANN ([[Similarity.ivfPqTopK]]) — coarse routing
    * bounds which vectors are touched, PQ codes bound the cost per touched
    * vector; the FAISS-IVFADC serving shape for billion-vector corpora.
    * Both approximations (unprobed clusters AND quantized distances) must
    * survive the same recall-gate contract as s3/s6: ≥8 of the exact
    * top-10 recovered and full k returned per query (measured 10/10 at
    * sf0.001/0.01/0.1 with nProbe=6 of 16 clusters, 200-candidate
    * re-rank). Index and codebooks come from the same per-dir memos the
    * flat rows probe, so the row isolates the composite QUERY path.
    */
  def s7IvfPqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val (model, codes) = s6Cached(s, dir)
    val approx = Similarity.ivfPqTopK(ivfCached(s, dir), codes, model,
      e.where(col("vec_id") < 5), "vec_id", "embedding",
      k = 10, nProbe = 6, shortlist = 200)
    annGate(s1Cached(s, dir), approx, minHits = 8, k = 10)
  }

  // ======================================================================
  // Round-11 crawl-frontier operators
  // ======================================================================

  /** The planted-HTML fixture shared by h1/cp8 (the pii1 pattern): each
    * document's text wrapped in a deterministic page scaffold built from
    * `doc_id` — head with title/style/script (must vanish whole), a nav
    * and a footer div of links (boilerplate: link density > 1/2, must
    * drop), the text in a `<p>` (must survive), an HTML comment, a
    * link-only `<ul>` on ids % 3 (drops), an entity-bearing `<p>` on ids
    * % 5 (survives, decodes), and a trailing `<p>` with an INLINE link
    * (survives WITH its link text — the case separating link-density
    * filtering from naive link stripping). The oracle builds the same
    * string with `||`.
    *
    * `headId` feeds the STRIPPED regions (title, script, comment);
    * `bodyId` feeds the content regions and the mod-3/mod-5 variations —
    * h1 passes the same id to both, cp8 splits them so planted copies
    * differ ONLY in stripped regions (duplicates extraction must reveal).
    */
  private def plantedHtml(headId: Column, bodyId: Column): Column = {
    val hId = headId.cast("string")
    val bId = bodyId.cast("string")
    concat(
      lit("<html><head><title>Doc "), hId,
      lit("</title><style>p{margin:0}</style><script>var id="), hId,
      lit(";</script></head><body>"),
      lit("<div><a href=\"/\">Home</a> <a href=\"/about\">About</a> nav</div>"),
      lit("<p>"), col("text"), lit("</p>"),
      lit("<!-- hidden "), hId, lit(" -->"),
      when(bodyId % 3 === 0,
        concat(lit("<ul><li><a href=\"/x\">x"), bId, lit("</a></li></ul>")))
        .otherwise(lit("")),
      when(bodyId % 5 === 0,
        lit("<p>terms &amp; conditions &quot;apply&quot; &lt;here&gt; " +
          "&#39;now&#39;&nbsp;always</p>")).otherwise(lit("")),
      lit("<p>as noted in <a href=\"/ref"), bId, lit("\">reference "),
      bId, lit("</a> the corpus continues</p>"),
      lit("<div>copyright <a href=\"/c\">contact</a> " +
        "<a href=\"/p\">privacy</a> <a href=\"/t\">terms</a></div>"),
      lit("</body></html>"))
  }

  /** H1: HTML → main-content extraction ([[graft.operators.Html.extract]])
    * over the planted-HTML fixture — tag/script/style/comment stripping
    * plus the link-density boilerplate filter, with block accounting. The
    * oracle replays every regex rule and the integer density comparison
    * verbatim in DuckDB, so hash equality proves the extraction — not just
    * its row count — identical. Map-only; zero shuffles.
    */
  def h1HtmlExtract(s: SparkSession, dir: String): DataFrame =
    graft.operators.Html.extract(
      t(s, dir, "documents").select(col("doc_id"),
        plantedHtml(col("doc_id"), col("doc_id")).as("__html")),
      "doc_id", "__html")
      .orderBy(col("doc_id"))

  /** CP8: the pipeline with HTML extraction wired AHEAD of the gates
    * ([[graft.plans.CorpusPipeline.Config.htmlExtract]]) — crawl stage
    * order: extract → gates → exact dedup → set-equality near-dedup (the
    * cp7 threshold-1.0 convention, so the whole-pipeline oracle stays
    * linear). The fixture plants a copy of every doc_id % 11 == 0 page
    * under id +2M whose HTML differs from the original ONLY in stripped
    * regions (title/script/comment carry the real id; all body content
    * derives from id % 2M) — so raw fingerprints differ and the copies
    * collapse in exact dedup IF AND ONLY IF extraction removed the head
    * and comments before the gates. The oracle replays extraction, both
    * gate formulas on the EXTRACTED text, and both dedup stages; the
    * planted copies must all vanish.
    */
  def cp8HtmlPipeline(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = base.unionAll(
      base.where(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + lit(2000000L)))
    val docs = corpus.select(col("doc_id"),
      plantedHtml(col("doc_id"), col("doc_id") % 2000000L).as("text"))
    val (cleaned, _) = graft.plans.CorpusPipeline.run(docs, "doc_id", "text",
      graft.plans.CorpusPipeline.Config(audit = false,
        materializeResult = true, htmlExtract = true,
        nearDupThreshold = 1.0))
    cleaned.select(col("doc_id"), col("lang"),
      col("n_tokens").cast("long").as("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** FJ2: Jaro-Winkler entity-resolution join ([[graft.operators.FuzzyJoin
    * .jwSelfJoin]]) — prefix-4 blocking + the codegen'd
    * [[graft.functions.JaroWinkler]] verify at 0.95, the record-linkage
    * comparator edit distance can't express (er1/fj1 cover the ed≤k
    * contract; this row covers similarity-thresholded matching). Fixture:
    * pseudo-names from reversed key digits (distinct prefixes — blocking
    * does real work), each with a mid-string substitution (JW 0.9556,
    * admitted BY the Winkler prefix boost), an appended char (0.98,
    * admitted), and a same-prefix tail rewrite (0.6296, a candidate the
    * verify must REJECT). The oracle replays the prefix-equality join and
    * DuckDB's own `jaro_winkler_similarity`, both 6dp-quantized — so the
    * hash pins the JW kernel against an independent implementation across
    * every candidate pair, not just spot values.
    */
  def fj2JwJoin(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer").where(col("c_custkey") <= 2000)
      .select(col("c_custkey").as("k"),
        translate(reverse(substring(col("c_name"), 10, 9)),
          "0123456789", "abcdefghij").as("nm"))
    val recs = base.select((col("k") * 4).as("rec_id"), col("nm").as("name"))
      .unionAll(base.select((col("k") * 4 + 1).as("rec_id"),
        concat(substring(col("nm"), 1, 5), lit("x"),
          substring(col("nm"), 7, 3)).as("name")))
      .unionAll(base.select((col("k") * 4 + 2).as("rec_id"),
        concat(col("nm"), lit("z")).as("name")))
      .unionAll(base.select((col("k") * 4 + 3).as("rec_id"),
        concat(substring(col("nm"), 1, 4), lit("zzzzz")).as("name")))
    graft.operators.FuzzyJoin.jwSelfJoin(recs, "rec_id", "name",
        prefixLen = 4, minSim = 0.95)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Content fingerprint of a source parquet table (size + mtime of its
    * file(s)) — keys every derived /tmp fixture cache, so if the driver
    * regenerates test data at the same sfDir path the stale re-layout is
    * NOT silently reused (the cache path itself changes). */
  private[graft] def tableFingerprint(dir: String, table: String): String = {
    val root = new java.io.File(s"$dir/$table.parquet")
    val files =
      if (root.isDirectory)
        Option(root.listFiles()).map(_.toSeq.filter(_.isFile))
          .getOrElse(Seq.empty).sortBy(_.getName)
      else Seq(root)
    val sig = files
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  /** Build a derived layout under /tmp exactly once per content
    * fingerprint: builders write to a unique temp dir which is atomically
    * renamed into place, so two JVMs racing on the same fixture (Bench
    * and Verify sharing /tmp) can never observe a half-written cache —
    * the loser's copy is discarded. */
  private[graft] def buildCachedDir(path: String)(build: String => Unit): String = {
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val tmp = s"$path.tmp.${java.util.UUID.randomUUID().toString.take(8)}"
      build(tmp)
      try
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          // another JVM won the race — keep theirs, drop ours. But only
          // trust a COMPLETE winner: every builder moves a fully-written
          // dir (with Spark's _SUCCESS marker) into place atomically, so
          // a `path` without _SUCCESS is stale garbage (manual deletion,
          // crashed mid-move on a non-atomic fs) — clear it and retry the
          // move once rather than silently serving a partial dir forever.
          if (new java.io.File(s"$path/_SUCCESS").exists())
            org.apache.spark.network.util.JavaUtils
              .deleteRecursively(new java.io.File(tmp))
          else {
            org.apache.spark.network.util.JavaUtils
              .deleteRecursively(new java.io.File(path))
            try java.nio.file.Files.move(
              java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(path),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch {
              // re-raced: only accept the new winner if it is complete
              case _: java.nio.file.FileSystemException
                  if new java.io.File(s"$path/_SUCCESS").exists() =>
                org.apache.spark.network.util.JavaUtils
                  .deleteRecursively(new java.io.File(tmp))
            }
            if (!new java.io.File(s"$path/_SUCCESS").exists()) throw e
          }
      }
    }
    path
  }

  /** Day-partitioned copy of `events`, written once per (JVM, source
    * fingerprint) to /tmp — the pp1/dpp1 fixture. Deterministic content
    * (a pure re-layout of the driver's parquet); the cache key embeds
    * [[tableFingerprint]] so regenerated source data invalidates it.
    *
    * NOTE on the memo keying (applies to every fixture memo below): the
    * in-memory map keys on `dir` ONLY, while staleness safety lives in
    * the PATH, which embeds the content fingerprint — if the source data
    * changes, the path changes and [[buildCachedDir]] rebuilds; the memo
    * merely skips recomputing the fingerprint within one JVM. Do not
    * "simplify" the memo to return a stored path without re-deriving the
    * fingerprint-bearing name, or staleness detection dies with it.
    */
  private val prunedEventsMemo = scala.collection.mutable.Map[String, String]()
  private def prunedEventsPath(s: SparkSession, dir: String): String =
    prunedEventsMemo.synchronized {
      prunedEventsMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_by_day_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Bucketing.writePartitionedByDay(
            t(s, dir, "events"), "ts", tmp)
        }
      })
    }

  /** ts-sorted flat copy of `events` ([[graft.sources.Bucketing
    * .writeTsSorted]]) — the pp2 fixture: globally range-sorted on `ts`
    * with deliberately small (16 KB) row groups so even the test SFs span
    * many groups, each carrying tight min/max stats. Cached once per
    * source fingerprint like the day-partitioned copy.
    */
  private val sortedEventsMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def sortedEventsPath(s: SparkSession, dir: String): String =
    sortedEventsMemo.synchronized {
      sortedEventsMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_ts_sorted_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Bucketing.writeTsSorted(
            t(s, dir, "events"), "ts", tmp, blockSize = 16 * 1024)
        }
      })
    }

  /** PAGED ts-sorted flat copy of `events` — the pp5 fixture: ONE big row
    * group (default 128 MB block at test SFs) cut into many small pages
    * (200-row / 1 KB page limits), so the only stats that can prune are
    * the per-page COLUMN INDEX entries — the level BELOW pp2's row
    * groups.
    */
  private val pagedEventsMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def pagedEventsPath(s: SparkSession, dir: String): String =
    pagedEventsMemo.synchronized {
      pagedEventsMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_ts_paged_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Bucketing.writeTsSorted(
            t(s, dir, "events").coalesce(1), "ts", tmp,
            pageRows = 200, pageBytes = 1024)
        }
      })
    }

  /** PP5: PAGE-level skipping — the final level of the pruning story
    * (pp1 directory listing → dpp1 runtime → pp2 row group → pp5 PAGE):
    * the parquet COLUMN INDEX carries min/max per data page, and Spark's
    * vectorized reader filters page ranges against the pushed predicate,
    * so even INSIDE one row group a narrow window decodes only the pages
    * that intersect it. The fixture makes the claim falsifiable: ONE row
    * group (so group-level skipping can explain NO reduction at all) cut
    * into hundreds of 200-row pages; PageSkippingSpec asserts from the
    * column+offset indexes that the window intersects a strict subset of
    * pages AND that the scan produced exactly the surviving pages' rows.
    * This row pins the VALUES via the same flat twin as pp2 (same 3-day
    * window, different physical layout — re-layout losslessness again).
    *
    * 100 TB lens: row groups are ~128 MB; a 1-hour query against a
    * day-sorted group still decodes 24× too much without page pruning.
    * The column index is the last free index level a lake gets before
    * real secondary indexes.
    */
  def pp5PageSkipping(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(pagedEventsPath(s, dir))
      .where(col("ts") >= ts("2024-01-10 00:00:00") &&
        col("ts") < ts("2024-01-13 00:00:00"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type"))

  /** FRAGMENTED copy of `events` — the cf1 "small-file problem" fixture:
    * a round-robin `repartition(64)` write, the layout a micro-batching
    * or over-parallel ingest leaves behind (64 tiny files, no useful
    * ordering, one scan task + footer round-trip each).
    */
  private val fragmentedEventsMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def fragmentedEventsPath(s: SparkSession, dir: String): String =
    fragmentedEventsMemo.synchronized {
      fragmentedEventsMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_fragmented_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          t(s, dir, "events").repartition(64)
            .write.mode("overwrite").parquet(tmp)
        }
      })
    }

  /** COMPACTED rewrite of the fragmented fixture
    * ([[graft.sources.Compaction.compactSorted]] to 4 ts-range-sorted
    * files, 16 KB row groups) — keyed on the SOURCE fingerprint like
    * every fixture, derived from [[fragmentedEventsPath]].
    */
  private val compactedEventsMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def compactedEventsPath(s: SparkSession, dir: String): String =
    compactedEventsMemo.synchronized {
      compactedEventsMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_compacted_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Compaction.compactSorted(
            s, fragmentedEventsPath(s, dir), tmp, "ts",
            nFiles = 4, blockSize = 16 * 1024)
        }
      })
    }

  /** CF1: small-file compaction — the lake-maintenance operator every
    * streaming ingest needs ([[graft.sources.Compaction]]): the
    * fragmented 64-file ingest layout is rewritten as 4 ts-range-sorted
    * files, and the row proves the three claims that matter: the file
    * count actually dropped 64 → 4 (driver-side listing of both dirs,
    * bounded), the rewrite is LOSSLESS (exact count / distinct ids /
    * 6dp value mass pinned against the flat `events` oracle — the pp1
    * re-layout convention), and the restored layout is SORT-VALID —
    * per-file ts ranges are pairwise disjoint (computed from the data
    * itself via `input_file_name`, 4 groups), so row-group skipping
    * (pp2) works again after compaction instead of being destroyed by a
    * plain round-robin rewrite. CompactionSpec adds the footer-level
    * audit (row groups inside each file non-overlapping) and the
    * byte-size law.
    *
    * 100 TB lens: a micro-batch sink writing 1-minute batches × 200
    * partitions leaves ~10^5 files/table/day; scans pay one task + one
    * footer fetch per file. Nightly range-sorted compaction to ~128 MB
    * files is the standing fix, and it must RESTORE the sort layout or
    * it trades the small-file tax for a full-scan tax.
    */
  def cf1SmallFileCompaction(s: SparkSession, dir: String): DataFrame = {
    val frag = fragmentedEventsPath(s, dir)
    val comp = compactedEventsPath(s, dir)
    val filesBefore = graft.sources.Compaction.dataFiles(frag).size
    val filesAfter = graft.sources.Compaction.dataFiles(comp).size
    val df = s.read.parquet(comp)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__lo"))
    val disjoint = df
      .groupBy(input_file_name().as("__f"))
      .agg(min(col("ts")).as("__lo"), max(col("ts")).as("__hi"))
      .select((lag(col("__hi"), 1).over(w).isNull ||
        lag(col("__hi"), 1).over(w) <= col("__lo")).as("__ok"))
      .agg(min(col("__ok")).as("__disjoint"))
    df.agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_id")).as("n_event_ids"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6))
          .as("total_value"))
      .crossJoin(broadcast(disjoint))
      .select(
        lit(filesBefore.toLong).as("files_before"),
        lit(filesAfter.toLong).as("files_after"),
        lit(filesAfter < filesBefore).as("compaction_reduced"),
        col("__disjoint").as("file_ranges_disjoint"),
        col("n_events"), col("n_event_ids"), col("total_value"))
  }

  /** Persisted ZONE-MAP MANIFEST of the compacted fixture
    * ([[graft.sources.Manifest.writeTs]] on `ts`) — built once from
    * footers at "compaction time", planned from forever (the p11d
    * durable-index convention applied to METADATA).
    */
  private val manifestMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def manifestPath(s: SparkSession, dir: String): String =
    manifestMemo.synchronized {
      manifestMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_manifest_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Manifest.writeTs(
            s, compactedEventsPath(s, dir), "ts", tmp)
        }
      })
    }

  /** Versioned SNAPSHOT table over the compacted fixture
    * ([[graft.sources.Snapshots]]): v1 adopts the 4 compacted files, v2
    * is a copy-on-write range delete of the pp2 3-day window — both
    * versions stay readable (time travel). Built once per source
    * fingerprint; `_SUCCESS` written manually (the table layout is
    * manifests + files, not a Spark write).
    */
  private val snapshotMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def snapshotPath(s: SparkSession, dir: String): String =
    snapshotMemo.synchronized {
      snapshotMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_snapshot_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          graft.sources.Snapshots.deleteRange(
            s, tmp, "ts", tsWindowLoMicros, tsWindowHiMicros,
            blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** The pp2/pp5 3-day window as UTC epoch micros (the session zone is
    * pinned UTC; `Timestamp.valueOf` would shift on a non-UTC JVM).
    */
  private[graft] val tsWindowLoMicros: Long =
    java.time.LocalDateTime.parse("2024-01-10T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  private[graft] val tsWindowHiMicros: Long =
    java.time.LocalDateTime.parse("2024-01-13T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  /** Versioned snapshot table exercising copy-on-write MERGE — the up1
    * fixture: v1 adopts the compacted files; v2 upserts a batch that
    * UPDATES every event of 2024-01-20 (value + 1000) and INSERTS a
    * shadow row per updated event (event_id + 10^12, same ts) — the
    * "late data + corrections" batch every ingest pipeline ships.
    */
  private val upsertSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def upsertSnapPath(s: SparkSession, dir: String): String =
    upsertSnapMemo.synchronized {
      upsertSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_upsert_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          val win = t(s, dir, "events")
            .where(col("ts") >= ts("2024-01-20 00:00:00") &&
              col("ts") < ts("2024-01-21 00:00:00"))
          val updates = win.withColumn("value", col("value") + lit(1000.0))
            .unionByName(win.withColumn("event_id",
              col("event_id") + lit(1000000000000L)))
          graft.sources.Snapshots.upsert(s, tmp, "event_id", "ts",
            updates, blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** Snapshot table exercising EQUALITY-DELETE MERGE — the eq1 fixture:
    * v1 adopts the compacted files; v2 is [[graft.sources.Snapshots
    * .upsertEquality]] with the up1 batch (2024-01-20 updates + shadow
    * inserts) — the batch's KEY SET commits as an `#eq:` sidecar plus
    * fresh insert files, ZERO target files read or rewritten; v3 is
    * OPTIMIZE folding the sidecar physically.
    */
  private val eqSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def eqSnapPath(s: SparkSession, dir: String): String =
    eqSnapMemo.synchronized {
      eqSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_equpsert_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          val win = t(s, dir, "events")
            .where(col("ts") >= ts("2024-01-20 00:00:00") &&
              col("ts") < ts("2024-01-21 00:00:00"))
          val updates = win.withColumn("value", col("value") + lit(1000.0))
            .unionByName(win.withColumn("event_id",
              col("event_id") + lit(1000000000000L)))
          graft.sources.Snapshots.upsertEquality(s, tmp, "event_id", "ts",
            updates, blockSize = 16 * 1024)
          graft.sources.Snapshots.optimize(s, tmp, "ts", 4,
            blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** EQ1: EQUALITY-DELETE MERGE ([[graft.sources.Snapshots
    * .upsertEquality]] — the Iceberg-v2 equality-delete file): the up1
    * batch commits as its KEY SET (`#eq:` sidecar) + fresh insert
    * files, with ZERO target files read, probed, or rewritten — commit
    * cost is O(batch) where the positional MERGE pays a target scan
    * per batch. Reads apply the key set to files ADDED BEFORE the
    * commit (`av=` sequence scoping), so the upsert's own post-image
    * rows survive their own keys. Gates: v2 equals the up1 closed-form
    * replay exactly (count, 6dp mass, 2×|window| rows in the window);
    * EVERY v1 file is re-referenced verbatim (`files_all_reused` — the
    * zero-rewrite proof) with the batch as the only new files; the
    * `#eq:` line is live at v2 and GONE at v3 (optimize folds it) with
    * values unchanged; v1 still serves the pre-merge table.
    *
    * 100 TB lens: CDC ingest MERGEs every minute; a commit that scans
    * the fact table 1440× a day IS the cluster's workload — an
    * equality-delete commit costs the batch, and the read amplification
    * folds at the next scheduled optimize.
    */
  def eq1EqualityUpsert(s: SparkSession, dir: String): DataFrame = {
    val root = eqSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val f1 = S.resolve(root, 1).toSet
    val f2 = S.resolve(root, 2).toSet
    val eqLive = S.manifest(root, 2).eqDeletes.size == 1
    val eqFolded = S.manifest(root, 3).eqDeletes.isEmpty
    val allReused = f1.subsetOf(f2) && (f2 -- f1).nonEmpty
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val inWindow = col("ts") >= ts("2024-01-20 00:00:00") &&
      col("ts") < ts("2024-01-21 00:00:00")
    val a1 = S.read(s, root, 1).agg(count(lit(1)).as("n_v1"))
    val a2 = S.read(s, root, 2).agg(count(lit(1)).as("n_latest"),
      mass.as("total_value_latest"),
      coalesce(sum(when(inWindow, 1L).otherwise(0L)), lit(0L))
        .as("n_window_latest"))
    val a3 = S.read(s, root, 3).agg(count(lit(1)).as("n_opt"),
      mass.as("value_opt"))
    a2.crossJoin(broadcast(a1)).crossJoin(broadcast(a3))
      .select(col("n_v1"), col("n_latest"), col("total_value_latest"),
        col("n_window_latest"), col("n_opt"), col("value_opt"),
        lit(eqLive).as("eq_sidecar_live"),
        lit(allReused).as("files_all_reused"),
        lit(eqFolded).as("eq_folded"))
  }

  /** CDC1: change feed between snapshot versions — what an incremental
    * consumer replays after the tt1 delete ([[graft.sources.Snapshots
    * .netChanges]]): copy-on-write makes the diff exact AND cheap — only
    * files that changed between the manifests are read (reused files
    * cancel by reference, rewritten survivors cancel via multiset
    * `exceptAll`), so the feed costs ∝ changed files, never two full
    * table scans diffed. For the pure delete v1→v2 the net-removed rows
    * ARE the deleted window (pinned against the flat window twin) and
    * the net-added feed is empty (pinned 0).
    *
    * 100 TB lens: downstream consumers (indexes, aggregates, exports)
    * cannot re-scan the table per version; the manifest diff hands them
    * exactly the rows that changed.
    */
  def cdc1ChangeFeed(s: SparkSession, dir: String): DataFrame = {
    val root = snapshotPath(s, dir)
    val (netAdded, netRemoved) =
      graft.sources.Snapshots.netChanges(s, root, 1, 2)
    val removed = netRemoved.agg(count(lit(1)).as("n_removed"),
      (sum(floor(col("value") * lit(1e6) + lit(0.5))
        .cast("decimal(38,0)")).cast("double") / lit(1e6))
        .as("removed_value"))
    val added = netAdded.agg(count(lit(1)).as("n_added_net"))
    removed.crossJoin(broadcast(added))
      .select(col("n_removed"), col("removed_value"), col("n_added_net"))
  }

  /** UP1: copy-on-write MERGE (upsert) — the table-format mutation the
    * delete (tt1) doesn't cover ([[graft.sources.Snapshots.upsert]]):
    * a batch carrying the table's SORT column updates every 2024-01-20
    * event (value + 1000) and inserts one shadow row per updated event
    * (event_id + 10^12, same ts). The rewrite is zone-bounded — only
    * files whose footer [min,max] intersects the batch's day can contain
    * matches; the rest are re-referenced verbatim — and the batch is
    * BROADCAST into the anti-join (a merge batch is operationally small
    * by definition). Gates: the merged table's exact count and 6dp value
    * mass equal the oracle's closed-form replay (events with the window
    * bumped, UNION ALL the shadow rows), the window holds exactly
    * 2×|window| rows (a MERGE that inserts instead of replacing
    * duplicates the updates — this catches it), v1 still reads the
    * original table (isolation), and the copy-on-write bound held.
    *
    * 100 TB lens: MERGE is THE daily mutation of a lakehouse (late
    * events, corrections, CDC upserts); without zone-bounded planning
    * every merge is a full-table rewrite.
    */
  def up1SnapshotUpsert(s: SparkSession, dir: String): DataFrame = {
    val root = upsertSnapPath(s, dir)
    val f1 = graft.sources.Snapshots.resolve(root, 1).toSet
    val f2 = graft.sources.Snapshots.resolve(root, 2).toSet
    val reused = (f1 & f2).size
    val v1 = graft.sources.Snapshots.read(s, root, 1)
    val v2 = graft.sources.Snapshots.read(s, root, 2)
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val inWindow = col("ts") >= ts("2024-01-20 00:00:00") &&
      col("ts") < ts("2024-01-21 00:00:00")
    val a1 = v1.agg(count(lit(1)).as("n_v1"))
    val a2 = v2.agg(count(lit(1)).as("n_latest"),
      mass.as("total_value_latest"),
      coalesce(sum(when(inWindow, 1L).otherwise(0L)), lit(0L))
        .as("n_window_latest"))
    a2.crossJoin(broadcast(a1))
      .select(col("n_v1"), col("n_latest"), col("total_value_latest"),
        col("n_window_latest"),
        lit(f1.size.toLong).as("files_v1"),
        lit(reused >= 1 && reused < f1.size).as("upsert_cow_bounded"))
  }

  /** Snapshot table exercising SCHEMA-EVOLVED append — the se1 fixture:
    * v1 adopts the compacted files; v2 appends the 2024-01-25 events
    * (event_id + 2·10^12) carrying a NEW `quality_score` column
    * (0.5 × value, 6dp) the v1 files never heard of.
    */
  private val evolveSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def evolveSnapPath(s: SparkSession, dir: String): String =
    evolveSnapMemo.synchronized {
      evolveSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_evolve_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          val batch = t(s, dir, "events")
            .where(col("ts") >= ts("2024-01-25 00:00:00") &&
              col("ts") < ts("2024-01-26 00:00:00"))
            .withColumn("event_id", col("event_id") + lit(2000000000000L))
            .withColumn("quality_score",
              floor(col("value") * lit(0.5) * lit(1e6) + lit(0.5)) / lit(1e6))
          graft.sources.Snapshots.append(s, tmp, batch, "ts",
            blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** Snapshot table built BY A STREAM — the ap1 fixture: v1 adopts the
    * compacted files; a checkpointed file stream (8 staged chunks of the
    * id-offset events, one file per micro-batch) appends each batch as
    * its own version through the EXACTLY-ONCE marker path
    * ([[graft.sources.Snapshots.appendBatch]]).
    */
  private val streamSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def streamSnapPath(s: SparkSession, dir: String): String =
    streamSnapMemo.synchronized {
      streamSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_streamsnap_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          val stage = java.nio.file.Files
            .createTempDirectory("graft_streamsnap_stage").toString
          t(s, dir, "events")
            .withColumn("event_id", col("event_id") + lit(3000000000000L))
            .repartition(8).write.parquet(s"$stage/src")
          val src = s.readStream
            .schema(s.read.parquet(s"$stage/src").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(s"$stage/src")
          val q = src.writeStream
            .option("checkpointLocation", s"$stage/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (batch: DataFrame, id: Long) =>
              graft.sources.Snapshots.appendBatch(
                batch.sparkSession, tmp, batch, "ts", id,
                blockSize = 16 * 1024)
              ()
            }
            .start()
          q.awaitTermination()
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** SE1: SCHEMA EVOLUTION on the snapshot table — the append every
    * production table eventually ships: a new ingest batch carries a
    * column (`quality_score`) the existing files never heard of
    * ([[graft.sources.Snapshots.append]] + mergeSchema read). Gates:
    * exact count and 6dp value mass of the evolved table equal the
    * closed-form replay; the quality-score mass equals the replay over
    * the appended day alone; and exactly the ORIGINAL row count reads
    * NULL for the new column (a mergeSchema failure either errors or
    * zero-fills — this catches both). v1 stays readable with its
    * original schema.
    *
    * 100 TB lens: rewriting a year of files to add a column is not an
    * option; name-based parquet column resolution + manifest versioning
    * make evolution a metadata-only operation.
    */
  def se1SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = evolveSnapPath(s, dir)
    val v2 = graft.sources.Snapshots.read(s, root, 2)
    def mass(c: org.apache.spark.sql.Column) =
      (sum(floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
        .cast("double") / lit(1e6))
    v2.agg(
        count(lit(1)).as("n_latest"),
        mass(col("value")).as("total_value"),
        mass(col("quality_score")).as("total_quality"),
        sum(when(col("quality_score").isNull, 1L).otherwise(0L))
          .as("n_null_quality"))
      .select(col("n_latest"), col("total_value"), col("total_quality"),
        col("n_null_quality"))
  }

  /** AP1: STREAMING snapshot ingest with exactly-once batch commits —
    * the table-format sink ([[graft.sources.Snapshots.appendBatch]]):
    * a checkpointed file stream drains 8 staged chunks of id-offset
    * events one micro-batch each; every batch commits as its own
    * version under its batchId marker, so foreachBatch's at-least-once
    * replay is idempotent (the Delta txn pattern — spec-proven by
    * replaying a committed batchId). Gates: the final table equals
    * original ∪ offset copy exactly (count + 6dp mass), the version
    * chain is 1 + 8 (every chunk arrived as its own micro-batch AND
    * committed exactly once), and 8 batch markers exist.
    *
    * 100 TB lens: micro-batch sinks MUST be idempotent under replay or
    * every crash duplicates data; committing the manifest keyed by
    * batchId is the standing exactly-once recipe, and version-per-batch
    * keeps readers isolated from in-flight ingest.
    */
  def ap1StreamIngest(s: SparkSession, dir: String): DataFrame = {
    val root = streamSnapPath(s, dir)
    val latest = graft.sources.Snapshots.latestVersion(root)
    val nBatches = graft.sources.Snapshots.committedBatches(root).size
    val vL = graft.sources.Snapshots.read(s, root, latest)
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    vL.agg(count(lit(1)).as("n_latest"), mass.as("total_value"))
      .select(col("n_latest"), col("total_value"),
        lit(latest.toLong).as("n_versions"),
        lit(nBatches.toLong).as("n_batches"))
  }

  /** MF1: manifest (zone-map) file pruning — the table-format PLANNING
    * mechanism pp1–pp5 don't cover: those prune with stats found at SCAN
    * time (directory names, footers); here the PLANNER picks the file
    * list from [[graft.sources.Manifest]]'s persisted per-file stats
    * table without listing the directory or opening one footer. The row
    * proves: the manifest selects a STRICT, non-empty subset of the 4
    * range-sorted files for the 3-day window; the scan opens no file
    * outside the selection (ground truth via `input_file_name`); the
    * manifest is COMPLETE (its row counts sum to the table's count — a
    * manifest that lies prunes wrong); and the manifest-planned query
    * equals the flat twin (losslessness, value-pinned by the pp2 window
    * oracle shape).
    *
    * 100 TB lens: ~10^6 files/year means seconds-to-minutes of metadata
    * I/O per query if the planner must stat+footer-read them; a manifest
    * read is one KB-scale parquet scan. This is Iceberg's manifest /
    * Delta's stats skipping, built on this library's own footer audit.
    */
  def mf1ManifestPruning(s: SparkSession, dir: String): DataFrame = {
    val comp = compactedEventsPath(s, dir)
    val man = manifestPath(s, dir)
    val selected = graft.sources.Manifest.selectFiles(
      s, man, tsWindowLoMicros, tsWindowHiMicros)
    val totalFiles = graft.sources.Compaction.dataFiles(comp).size
    val pruned = graft.sources.Manifest.readSelected(s, comp, selected)
      .where(col("ts") >= ts("2024-01-10 00:00:00") &&
        col("ts") < ts("2024-01-13 00:00:00"))
    val opened = graft.sources.Bucketing.filesRead(pruned)
      .map(graft.sources.Manifest.normalizePath).toSet
    val scanWithin = opened.subsetOf(selected.toSet)
    val manifestRows = s.read.parquet(man)
      .agg(sum(col("rows")).as("__man_rows"))
    val tableRows = s.read.parquet(comp).agg(count(lit(1)).as("__tbl_rows"))
    pruned
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6))
          .as("total_value"))
      .crossJoin(broadcast(manifestRows)).crossJoin(broadcast(tableRows))
      .select(col("n_events"), col("total_value"),
        lit(totalFiles.toLong).as("files_total"),
        lit(selected.nonEmpty && selected.size < totalFiles)
          .as("manifest_strict_subset"),
        lit(scanWithin).as("scan_within_selection"),
        (col("__man_rows") === col("__tbl_rows")).as("manifest_complete"))
  }

  /** ONE snapshot root driven through the WHOLE lifecycle — the lc1
    * fixture: v1 init (compacted events) → v2 schema-evolved append
    * (2024-01-25 day, +2·10^12 ids, new `quality_score`) → v3 MERGE
    * (2024-01-20 updates +1000 and +10^12 shadow inserts) → v4 range
    * delete (the pp2 window) → v5 OPTIMIZE to 4 files. Each stage is
    * proven in isolation by se1/up1/tt1/cf1; this chain proves they
    * COMPOSE on one table.
    */
  private val lifecycleSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def lifecycleSnapPath(s: SparkSession, dir: String): String =
    lifecycleSnapMemo.synchronized {
      lifecycleSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_lifecycle_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir))
          val ev = t(s, dir, "events")
          S.append(s, tmp, ev
            .where(col("ts") >= ts("2024-01-25 00:00:00") &&
              col("ts") < ts("2024-01-26 00:00:00"))
            .withColumn("event_id", col("event_id") + lit(2000000000000L))
            .withColumn("quality_score",
              floor(col("value") * lit(0.5) * lit(1e6) + lit(0.5)) / lit(1e6)),
            "ts", blockSize = 16 * 1024)
          val d20 = ev.where(col("ts") >= ts("2024-01-20 00:00:00") &&
            col("ts") < ts("2024-01-21 00:00:00"))
          S.upsert(s, tmp, "event_id", "ts",
            d20.withColumn("value", col("value") + lit(1000.0))
              .unionByName(d20.withColumn("event_id",
                col("event_id") + lit(1000000000000L))),
            blockSize = 16 * 1024)
          S.deleteRange(s, tmp, "ts", tsWindowLoMicros, tsWindowHiMicros,
            blockSize = 16 * 1024)
          S.optimize(s, tmp, "ts", 4, blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** LC1: the lakehouse LIFECYCLE composed on ONE table — init, evolve,
    * merge, delete, optimize as five chained versions of a single root
    * (each stage proven in isolation by se1/up1/tt1/cf1; this row proves
    * the composition). The final optimized table is pinned against the
    * closed-form oracle replay: events with the 2024-01-20 day bumped
    * +1000, UNION ALL the day's shadow inserts, UNION ALL the evolved
    * 2024-01-25 append (quality_score carried, NULL elsewhere), MINUS
    * the deleted 2024-01-10..13 window — count, 6dp value mass, 6dp
    * quality mass, NULL-quality count, 5 versions, 4 optimized files.
    *
    * 100 TB lens: no single mechanism matters if they can't run on the
    * same table week after week — this is the week, compressed.
    */
  def lc1LakehouseLifecycle(s: SparkSession, dir: String): DataFrame = {
    val root = lifecycleSnapPath(s, dir)
    val latest = graft.sources.Snapshots.latestVersion(root)
    val files = graft.sources.Snapshots.resolve(root, latest).size
    def mass(c: org.apache.spark.sql.Column) =
      (sum(floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
        .cast("double") / lit(1e6))
    graft.sources.Snapshots.read(s, root, latest)
      .agg(count(lit(1)).as("n_final"),
        mass(col("value")).as("total_value"),
        mass(col("quality_score")).as("total_quality"),
        sum(when(col("quality_score").isNull, 1L).otherwise(0L))
          .as("n_null_quality"))
      .select(col("n_final"), col("total_value"), col("total_quality"),
        col("n_null_quality"),
        lit(latest.toLong).as("n_versions"),
        lit(files.toLong).as("files_final"))
  }

  /** MF2: METADATA-ONLY aggregation — the manifest answers COUNT(*) /
    * MIN / MAX without reading ONE data byte (the Iceberg "metadata-only
    * query"): per-file row counts sum to the table count, per-file zone
    * envelopes fold to the global extremes. The oracle computes the same
    * three values from the DATA — the hash match IS the proof that the
    * metadata answers equal data truth (no TRUE-gate indirection: the
    * pinned values are the claim). At 100 TB the difference is a 4-row
    * manifest scan vs a full-table pass for the most common dashboard
    * query there is.
    */
  def mf2MetadataOnlyAgg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(manifestPath(s, dir))
      .agg(sum(col("rows")).as("n_events"),
        min(col("min_v")).as("min_ts_micros"),
        max(col("max_v")).as("max_ts_micros"))

  /** TT1: snapshot isolation + copy-on-write delete + time travel — the
    * table-format MUTATION story ([[graft.sources.Snapshots]]): v1 adopts
    * the 4 compacted files; a range delete of the 3-day window plans the
    * rewrite from FOOTER ZONES (only files whose [min,max] intersects the
    * window are touched), re-references every other file verbatim in the
    * v2 manifest (zero bytes of I/O — the same physical file serves both
    * versions), and leaves v1 readable. The row time-travels BOTH
    * versions through the manifests and pins v1 == the full flat twin,
    * v2 == the flat twin minus the window, zero surviving window rows,
    * and the copy-on-write bound (>= 1 file reused AND >= 1 rewritten —
    * the delete touched neither nothing nor everything).
    *
    * 100 TB lens: a GDPR deletion must not rewrite a year of data — zone
    * planning bounds the rewrite to intersecting files, and concurrent
    * readers of v1 are isolated from the v2 commit by manifest
    * immutability.
    */
  def tt1SnapshotDelete(s: SparkSession, dir: String): DataFrame = {
    val root = snapshotPath(s, dir)
    val f1 = graft.sources.Snapshots.resolve(root, 1).toSet
    val f2 = graft.sources.Snapshots.resolve(root, 2).toSet
    val reused = (f1 & f2).size
    val v1 = graft.sources.Snapshots.read(s, root, 1)
    val v2 = graft.sources.Snapshots.read(s, root, 2)
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val inWindow = col("ts") >= ts("2024-01-10 00:00:00") &&
      col("ts") < ts("2024-01-13 00:00:00")
    val a1 = v1.agg(count(lit(1)).as("n_v1"), mass.as("total_value_v1"))
    val a2 = v2.agg(count(lit(1)).as("n_v2"), mass.as("total_value_v2"),
      coalesce(sum(when(inWindow, 1L).otherwise(0L)), lit(0L))
        .as("n_window_v2"))
    a1.crossJoin(broadcast(a2))
      .select(col("n_v1"), col("total_value_v1"),
        col("n_v2"), col("total_value_v2"), col("n_window_v2"),
        lit(f1.size.toLong).as("files_v1"),
        lit(reused >= 1 && reused < f1.size).as("copy_on_write_bounded"))
  }

  /** MERGE-ON-READ snapshot table — the mor1 fixture: v1 adopts the
    * compacted files; v2 is a [[graft.sources.Snapshots.deletePositions]]
    * of the pp2 3-day window (a position-delete SIDECAR, zero data files
    * rewritten); v3 is an OPTIMIZE that folds the sidecar back into 4
    * range-sorted data files.
    */
  private val morSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def morSnapPath(s: SparkSession, dir: String): String =
    morSnapMemo.synchronized {
      morSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_mor_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          graft.sources.Snapshots.deletePositions(
            s, tmp, "ts", tsWindowLoMicros, tsWindowHiMicros)
          graft.sources.Snapshots.optimize(s, tmp, "ts", 4,
            blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** MOR1: merge-on-read deletion vectors — the other half of the
    * mutation story the COW delete (tt1) tells ([[graft.sources
    * .Snapshots.deletePositions]]): the same 3-day GDPR window is
    * deleted by committing a KB-scale `(file, pos)` SIDECAR applied as
    * an anti-join at read time, and v2 references the IDENTICAL physical
    * data files as v1 — zero rewrite I/O (gate: the resolved file lists
    * are equal AND exactly one sidecar is live). The v2 read is pinned
    * against the COW twin's closed form (complement count + 6dp mass,
    * zero surviving window rows) and the sidecar's row count equals the
    * window count exactly — the position marks are complete and minimal.
    * v3 (OPTIMIZE) folds the sidecar into data files: no `#dv:` lines
    * survive, and the folded table re-pins the same count/mass.
    *
    * 100 TB lens: a COW delete of 10 rows spread over 10 wide files
    * rewrites 10 files; MoR writes 10 sidecar rows and pays one
    * broadcast-size anti-join per read until the next compaction —
    * exactly why Iceberg/Delta pair COW with position deletes for
    * GDPR-shaped mutations.
    */
  def mor1MergeOnReadDelete(s: SparkSession, dir: String): DataFrame = {
    val root = morSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val filesIdentical = S.resolve(root, 1) == S.resolve(root, 2)
    val dv2 = S.deleteSidecars(root, 2)
    val dvFolded = S.deleteSidecars(root, 3).isEmpty
    val nDv =
      if (dv2.isEmpty) 0L
      else graft.sources.Snapshots.dvRead(s, root, dv2).count()
    val v2 = S.read(s, root, 2)
    val v3 = S.read(s, root, 3)
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val inWindow = col("ts") >= ts("2024-01-10 00:00:00") &&
      col("ts") < ts("2024-01-13 00:00:00")
    val a2 = v2.agg(count(lit(1)).as("n_v2"), mass.as("total_value_v2"),
      coalesce(sum(when(inWindow, 1L).otherwise(0L)), lit(0L))
        .as("n_window_v2"))
    val a3 = v3.agg(count(lit(1)).as("n_v3"), mass.as("total_value_v3"))
    a2.crossJoin(broadcast(a3))
      .select(col("n_v2"), col("total_value_v2"), col("n_window_v2"),
        col("n_v3"), col("total_value_v3"),
        lit(nDv).as("n_dv_positions"),
        lit(filesIdentical).as("files_identical"),
        lit(dv2.size == 1).as("dv_present"),
        lit(dvFolded).as("dv_folded"))
  }

  /** CDC2: ROW-TAGGED change feed — the Delta-CDF consumer contract
    * ([[graft.sources.Snapshots.changeFeed]]) on top of the file-granular
    * diff cdc1 proves: every delta row carries `_change_type` ∈ {insert,
    * update_preimage, update_postimage, delete}, derived by pairing
    * net-added and net-removed rows on the table key (joins on the DELTA
    * only, never the table). Pinned on BOTH standing fixtures: the up1
    * MERGE feed must tag one preimage + one postimage per updated key
    * (original vs +1000 value masses pinned separately — the pairing is
    * value-exact, not just counted), the shadow rows as inserts carrying
    * the original mass, and ZERO deletes; the tt1 delete feed must tag
    * every row `delete` (count + mass pinned) with zero non-delete tags.
    *
    * 100 TB lens: downstream consumers (indexes, aggregates, ML feature
    * stores) need to know not just WHAT rows changed but HOW — an
    * update must retract its preimage and apply its postimage, or
    * incremental aggregates drift. This is Delta's CDF / Iceberg's
    * changelog scan, derived purely from the manifests.
    */
  def cdc2RowTaggedFeed(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val up = S.changeFeed(s, upsertSnapPath(s, dir), 1, 2, "event_id")
    val del = S.changeFeed(s, snapshotPath(s, dir), 1, 2, "event_id")
    def q(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)")
    def tagMass(tag: String) =
      (sum(when(col("_change_type") === tag, q(col("value")))
        .otherwise(lit(0).cast("decimal(38,0)"))).cast("double") / lit(1e6))
    def tagCount(tag: String) =
      sum(when(col("_change_type") === tag, 1L).otherwise(0L))
    val a = up.agg(
      tagCount("insert").as("n_insert"),
      tagCount("update_preimage").as("n_update_pre"),
      tagCount("update_postimage").as("n_update_post"),
      tagCount("delete").as("n_delete_up"),
      tagMass("update_preimage").as("pre_value"),
      tagMass("update_postimage").as("post_value"),
      tagMass("insert").as("insert_value"))
    val b = del.agg(
      tagCount("delete").as("n_delete"),
      tagMass("delete").as("delete_value"),
      sum(when(col("_change_type") =!= "delete", 1L).otherwise(0L))
        .as("n_nondelete_tags"))
    a.crossJoin(broadcast(b))
  }

  /** Durable consumer state over the lifecycle table — the ss1 fixture:
    * [[graft.streaming.SnapshotFeed.drain]] processes versions 2..5 of
    * [[lifecycleSnapPath]] exactly once, writing one quantized stats row
    * per version delta (counts, 6dp value/quality masses, null-quality
    * counts for added and removed sides).
    */
  private val feedStateMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def feedStatePath(s: SparkSession, dir: String): String =
    feedStateMemo.synchronized {
      feedStateMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_feedstate_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val root = lifecycleSnapPath(s, dir)
          graft.streaming.SnapshotFeed.drain(s, root, tmp) {
            (added, removed, v, outPath) =>
              feedStats(s, added, v, "a")
                .crossJoin(feedStats(s, removed, v, "r").drop("v"))
                .coalesce(1)
                .write.mode("overwrite").parquet(outPath)
          }
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** One quantized stats row of a delta side: count, 6dp-quantized value
    * mass (exact BIGINT), quality mass, and null-quality count — a frame
    * WITHOUT the evolved `quality_score` column counts every row as
    * null-quality (those physical rows genuinely carry none).
    */
  private def feedStats(s: SparkSession, df: DataFrame, v: Int,
      p: String): DataFrame = {
    def q(c: org.apache.spark.sql.Column) =
      sum(floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
        .cast("long")
    val hasQ = df.columns.contains("quality_score")
    df.agg(
        count(lit(1)).as(s"${p}_n"),
        coalesce(q(col("value")), lit(0L)).as(s"${p}_vq"),
        (if (hasQ) coalesce(q(col("quality_score")), lit(0L))
         else lit(0L)).as(s"${p}_qq"),
        (if (hasQ) coalesce(sum(when(col("quality_score").isNull, 1L)
            .otherwise(0L)), lit(0L))
         else count(lit(1))).as(s"${p}_nullq"))
      .withColumn("v", lit(v))
  }

  /** SS1: the snapshot table as an INCREMENTAL STREAMING SOURCE — the
    * read-side twin of the exactly-once sink ap1
    * ([[graft.streaming.SnapshotFeed]]): a durable consumer drains each
    * lifecycle version's delta ([[graft.sources.Snapshots.netChanges]])
    * exactly once (marker-after-idempotent-write, cursor derived from
    * its own commits — kill-and-restart proven in SnapshotFeedSpec), and
    * this row folds base + consumed deltas into final-table stats that
    * must equal the lc1 closed form EXACTLY: count, 6dp value mass,
    * quality mass, null-quality count — across an evolve append, a
    * MERGE, a range delete, and an optimize (whose delta is empty by
    * multiset cancellation). A consumer that dropped, duplicated, or
    * mis-tagged one version's rows cannot reproduce all four folds.
    *
    * 100 TB lens: a downstream aggregate/index over a mutating table
    * cannot re-scan per version; it must fold deltas — and the fold is
    * only as good as the feed's exactly-once guarantee.
    */
  def ss1SnapshotSourceFold(s: SparkSession, dir: String): DataFrame = {
    val root = lifecycleSnapPath(s, dir)
    val state = feedStatePath(s, dir)
    val processed = graft.streaming.SnapshotFeed.committedVersions(state)
    val base = feedStats(s, graft.sources.Snapshots.read(s, root, 1), 1, "b")
    val deltas = s.read.parquet(
        processed.map(v => s"$state/delta_v$v"): _*)
      .agg(sum(col("a_n") - col("r_n")).as("d_n"),
        sum(col("a_vq") - col("r_vq")).as("d_vq"),
        sum(col("a_qq") - col("r_qq")).as("d_qq"),
        sum(col("a_nullq") - col("r_nullq")).as("d_nullq"))
    base.crossJoin(broadcast(deltas))
      .select(
        (col("b_n") + col("d_n")).as("n_final"),
        ((col("b_vq") + col("d_vq")).cast("double") / lit(1e6))
          .as("total_value"),
        ((col("b_qq") + col("d_qq")).cast("double") / lit(1e6))
          .as("total_quality"),
        (col("b_nullq") + col("d_nullq")).as("n_null_quality"),
        lit(processed.size.toLong).as("n_versions_processed"),
        lit(processed == Seq(2, 3, 4, 5)).as("exactly_once"))
  }

  /** SS2: the NATIVE streaming source ([[graft.sources.v2
    * .GraftMicroBatchStream]]) — ss1's drain loop replaced by
    * `spark.readStream.format("graft").option("changeFeed", "true")`:
    * manifest versions are CHECKPOINTED OFFSETS the engine owns, each
    * micro-batch carries the file-granular tagged delta of its version
    * range, and [[SupportsAdmissionControl]] bounds the drain
    * (`maxVersionsPerBatch = 2` → the 5-version lifecycle arrives in
    * exactly 3 batches — gated). The foreachBatch consumer folds
    * sign-weighted quantized stats (add = +, remove = −; multiset
    * cancellation makes the sum exact through the MERGE's rewrites and
    * the OPTIMIZE's self-cancelling delta), and the fold must equal the
    * lc1 closed form: count, 6dp value mass, 6dp quality mass,
    * null-quality count — a source that dropped, duplicated, or
    * mis-sided one file's rows cannot reproduce all four.
    * Kill-restart exactly-once is spec-proven (GraftStreamSpec: a
    * restarted checkpoint re-delivers nothing; new commits stream from
    * the cursor).
    *
    * 100 TB lens: the hand-rolled consumer loop (ss1) owns its own
    * cursor; production pipelines want the ENGINE's checkpoint/commit
    * machinery (rate limiting, AvailableNow catch-up, restart
    * semantics) — offsets-as-versions is how Delta's streaming source
    * does it, with the change feed first-class here.
    */
  def ss2NativeStreamFold(s: SparkSession, dir: String): DataFrame = {
    val root = lifecycleSnapPath(s, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ss2")
    try {
      val acc = new java.util.concurrent.atomic.AtomicReference(
        (0L, BigInt(0), BigInt(0), 0L, Set.empty[Int], 0))
      val src = s.readStream.format("graft")
        .option("path", root).option("changeFeed", "true")
        .option("maxVersionsPerBatch", "2").load()
      val q = src.writeStream
        .option("checkpointLocation", s"$tmp/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          def qz(c: org.apache.spark.sql.Column) =
            floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)")
          val signed = when(col("_graft_side") === "add", 1L)
            .otherwise(-1L)
          val r = batch.agg(
            coalesce(sum(signed), lit(0L)),
            coalesce(sum(when(col("_graft_side") === "add",
              qz(col("value"))).otherwise(-qz(col("value")))),
              lit(java.math.BigDecimal.ZERO)),
            coalesce(sum(when(col("quality_score").isNull, lit(0L)
                .cast("decimal(38,0)"))
              .when(col("_graft_side") === "add",
                qz(col("quality_score")))
              .otherwise(-qz(col("quality_score")))),
              lit(java.math.BigDecimal.ZERO)),
            coalesce(sum(when(col("quality_score").isNull, signed)
              .otherwise(0L)), lit(0L)),
            collect_set(col("_graft_version"))).head()
          acc.updateAndGet { case (n, vq, qq, nq, vs, b) =>
            (n + r.getLong(0),
              vq + BigInt(r.getDecimal(1).toBigInteger),
              qq + BigInt(r.getDecimal(2).toBigInteger),
              nq + r.getLong(3),
              vs ++ r.getSeq[Int](4).toSet,
              b + 1)
          }
          ()
        }
        .start()
      q.awaitTermination()
      val (n, vq, qq, nq, versions, batches) = acc.get()
      s.range(1).select(
        lit(n).as("n_final"),
        (lit(vq.toLong).cast("double") / lit(1e6)).as("total_value"),
        (lit(qq.toLong).cast("double") / lit(1e6)).as("total_quality"),
        lit(nq).as("n_null_quality"),
        lit(versions.size.toLong).as("n_versions_processed"),
        lit(versions == Set(1, 2, 3, 4, 5) && batches == 3)
          .as("bounded_exactly_once"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(tmp.toString)
      ()
    }
  }

  /** 16-file z-ordered copy of `events` ([[graft.sources.Bucketing
    * .writeZOrderedFiles]] on (user_id, day-of-stream)) plus its
    * TWO-COLUMN manifest ([[graft.sources.Manifest.writeTs2]] on
    * (user_id, ts)) — the mf3 fixture. File-granular z-order: each file
    * covers a contiguous Morton range, so its envelope is bounded on
    * both dimensions at once.
    */
  private val zordered16Memo = scala.collection.mutable.Map[String, String]()
  private[graft] def zordered16Path(s: SparkSession, dir: String): String =
    zordered16Memo.synchronized {
      zordered16Memo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_zorder16_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Bucketing.writeZOrderedFiles(
            t(s, dir, "events"), col("user_id"),
            pmod(datediff(to_date(col("ts")), lit("2024-01-01")), lit(32)),
            16, tmp, blockSize = 16 * 1024)
        }
      })
    }

  /** The persisted two-column manifest of [[zordered16Path]] — built in
    * its OWN cached dir (the manifest stores absolute file paths, so it
    * must be built over the data fixture's FINAL location).
    */
  private val manifest2Memo = scala.collection.mutable.Map[String, String]()
  private[graft] def manifest2Path(s: SparkSession, dir: String): String =
    manifest2Memo.synchronized {
      manifest2Memo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_manifest2_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Manifest.writeTs2(
            s, zordered16Path(s, dir), "user_id", "ts", tmp)
        }
      })
    }

  /** MF3: TWO-COLUMN manifest zones — composite plan-time pruning on the
    * z-ordered multi-file layout ([[graft.sources.Manifest.buildTs2]] /
    * [[graft.sources.Manifest.selectFiles2]]): one manifest row per file
    * carries the min/max envelope of BOTH user_id and ts, and a
    * conjunctive predicate (`user_id < 8 AND the pp2 3-day window`)
    * selects files in ONE manifest scan. Gates: the conjunctive
    * selection equals the INTERSECTION of the two single-column
    * selections exactly (the interval-intersection law, checked as set
    * equality, not by construction — selectFiles2 runs its own
    * conjunctive predicate); it is a non-empty STRICT subset of the 16
    * files and no larger than either single-column selection; the scan
    * opens no file outside it (`input_file_name` ground truth); the
    * manifest is COMPLETE (row counts sum to the table count); and the
    * pruned query equals the flat twin (count + 6dp mass pinned).
    *
    * 100 TB lens: real queries filter on MORE than one dimension; a
    * single-column manifest leaves the second predicate to row-group
    * luck, while a z-ordered layout + composite manifest gives the
    * planner ~√n pruning on each dimension from one KB-scale stats scan.
    */
  def mf3TwoColumnManifest(s: SparkSession, dir: String): DataFrame = {
    val data = zordered16Path(s, dir)
    val man = manifest2Path(s, dir)
    val M = graft.sources.Manifest
    val (loU, hiU) = (0L, 8L)
    val sel2 = M.selectFiles2(s, man, loU, hiU,
      tsWindowLoMicros, tsWindowHiMicros)
    val selU = M.selectFilesOn(s, man, "min_a", "max_a", loU, hiU)
    val selT = M.selectFilesOn(s, man, "min_b", "max_b",
      tsWindowLoMicros, tsWindowHiMicros)
    val totalFiles = graft.sources.Compaction.dataFileNames(data).size
    val intersectionLaw = sel2.toSet == (selU.toSet & selT.toSet)
    val pruned = M.readSelected(s, data, sel2)
      .where(col("user_id") < lit(hiU) &&
        col("ts") >= ts("2024-01-10 00:00:00") &&
        col("ts") < ts("2024-01-13 00:00:00"))
    val opened = graft.sources.Bucketing.filesRead(pruned)
      .map(M.normalizePath).toSet
    val manifestRows = s.read.parquet(man)
      .agg(sum(col("rows")).as("__man_rows"))
    val tableRows = s.read.parquet(data).agg(count(lit(1)).as("__tbl_rows"))
    pruned
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6))
          .as("total_value"))
      .crossJoin(broadcast(manifestRows)).crossJoin(broadcast(tableRows))
      .select(col("n_events"), col("total_value"),
        lit(totalFiles.toLong).as("files_total"),
        lit(intersectionLaw).as("intersection_law"),
        lit(sel2.nonEmpty && sel2.size < totalFiles)
          .as("strict_subset"),
        lit(sel2.size <= math.min(selU.size, selT.size))
          .as("no_wider_than_either"),
        lit(opened.subsetOf(sel2.toSet)).as("scan_within_selection"),
        (col("__man_rows") === col("__tbl_rows")).as("manifest_complete"))
  }

  /** Snapshot table exercising RENAME + WIDENING evolution — the se2
    * fixture: v1 adopts the compacted files; v2 appends the 2024-01-25
    * day (+2·10^12 ids) carrying a new `flag` column as INT (1); v3
    * widens `flag` to long (metadata-only); v4 appends the 2024-01-26
    * day (+3·10^12 ids) writing `flag` as LONG (2) — two physical types
    * of one column, the union plain mergeSchema refuses; v5 renames
    * `value` → `reading` (metadata-only); v6 OPTIMIZE materializes both
    * mappings physically.
    */
  private val evolve2SnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def evolve2SnapPath(s: SparkSession, dir: String): String =
    evolve2SnapMemo.synchronized {
      evolve2SnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_evolve2_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir))
          val ev = t(s, dir, "events")
          S.append(s, tmp, ev
            .where(col("ts") >= ts("2024-01-25 00:00:00") &&
              col("ts") < ts("2024-01-26 00:00:00"))
            .withColumn("event_id", col("event_id") + lit(2000000000000L))
            .withColumn("flag", lit(1)),
            "ts", blockSize = 16 * 1024)
          S.widenColumn(tmp, "flag", "long")
          S.append(s, tmp, ev
            .where(col("ts") >= ts("2024-01-26 00:00:00") &&
              col("ts") < ts("2024-01-27 00:00:00"))
            .withColumn("event_id", col("event_id") + lit(3000000000000L))
            .withColumn("flag", lit(2L)),
            "ts", blockSize = 16 * 1024)
          S.renameColumn(tmp, "value", "reading")
          S.optimize(s, tmp, "ts", 4, blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** SE2: schema evolution BEYOND add-only — column RENAME and type
    * WIDENING ([[graft.sources.Snapshots.renameColumn]] /
    * [[graft.sources.Snapshots.widenColumn]]), the two mutations
    * `mergeSchema` cannot express (a renamed column comes back as TWO
    * columns; an int32/int64 pair of one column fails the merge —
    * spec-proven contrast). Both are manifest METADATA lines applied by
    * the grouped read: files group by physical footer schema, each group
    * renames/casts to the logical schema, then unions by name — zero
    * data I/O at evolution time, the Iceberg field-mapping idea without
    * field ids (name-level mapping, honest about that scope). The row
    * reads v5 (three physical schemas + both mappings live) AND v6
    * (optimize materialized the mappings; gate: no meta lines survive)
    * and pins identical count / 6dp `reading` mass / exact `flag` sum /
    * null-flag count on both against the closed-form replay.
    *
    * 100 TB lens: renaming a column must not rewrite a year of files;
    * a type that outgrows int32 must not fork the table. Metadata
    * mappings + lazy materialization at the next compaction is how the
    * production formats ship both.
    */
  def se2RenameWiden(s: SparkSession, dir: String): DataFrame = {
    val root = evolve2SnapPath(s, dir)
    val S = graft.sources.Snapshots
    val mapped = S.manifest(root, 5).hasMappings
    val materialized = !S.manifest(root, 6).hasMappings
    def agg(df: DataFrame, p: String) =
      df.agg(
        count(lit(1)).as(s"n_$p"),
        (sum(floor(col("reading") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6))
          .as(s"reading_$p"),
        coalesce(sum(col("flag")), lit(0L)).as(s"flag_$p"),
        sum(when(col("flag").isNull, 1L).otherwise(0L))
          .as(s"nullflag_$p"))
    agg(S.read(s, root, 5), "v5")
      .crossJoin(broadcast(agg(S.read(s, root, 6), "v6")))
      .select(col("n_v5"), col("reading_v5"), col("flag_v5"),
        col("nullflag_v5"), col("n_v6"), col("reading_v6"),
        col("flag_v6"), col("nullflag_v6"),
        lit(mapped).as("v5_mapped"),
        lit(materialized).as("v6_materialized"),
        lit(S.resolve(root, 6).size.toLong).as("files_final"))
  }

  /** Snapshot table exercising RESTORE — the tt3 fixture: v1 adopts the
    * compacted files; v2 MoR-deletes the pp2 3-day window (sidecar);
    * v3 is [[graft.sources.Snapshots.restore]] back to v1 — a
    * metadata-only rollback commit referencing v1's exact file set.
    */
  private val restoreSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def restoreSnapPath(s: SparkSession, dir: String): String =
    restoreSnapMemo.synchronized {
      restoreSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_restore_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          graft.sources.Snapshots.deletePositions(
            s, tmp, "ts", tsWindowLoMicros, tsWindowHiMicros)
          graft.sources.Snapshots.restore(s, tmp, 1)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** SPJ1: STORAGE-PARTITIONED JOIN ([[graft.sources.Snapshots
    * .optimizeBucketed]] + the DSv2 scan's
    * `SupportsReportPartitioning`) — orders and customer are relaid out
    * through `CALL g.system.bucket` so every file holds exactly one
    * `bucket(8, custkey)` value; both scans then report
    * `KeyGroupedPartitioning(bucket(8, key))`, the planner resolves the
    * transform to the catalog's frozen bucket function on both sides,
    * and the fact⋈dim join runs with NO shuffle Exchange on either
    * input. Gates: the SPJ plan's hash-exchange count is strictly
    * below the shuffled twin's (which pays one per join input) and at
    * most the final GROUP BY's one; SPJ rows equal the twin EXACTLY;
    * values equal the closed-form DuckDB join per market segment; and
    * a post-bucketing INSERT of never-matching keys leaves the layout
    * FULLY `k=`-stamped (`layout_maintained` — the DSv2 writers split
    * per bucket id, so appends never silently degrade the join back
    * to a shuffle).
    *
    * 100 TB lens: the fact-fact join exchange is the single most
    * expensive stage a warehouse produces — two co-bucketed 50 TB
    * tables joining WITHOUT moving either side is the whole point of
    * declaring layout to the planner, and why Iceberg/Delta ship SPJ.
    */
  def spj1BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj1")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = confs.map(k =>
      k -> scala.util.Try(s.conf.get(k)).toOption)
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      s.sql(s"CREATE NAMESPACE $cat.lake")
      s.sql(s"""CREATE TABLE $cat.lake.ord
               |(o_custkey BIGINT, o_totalprice DOUBLE)
               |USING graft""".stripMargin)
      s.sql(s"""CREATE TABLE $cat.lake.cust
               |(c_custkey BIGINT, c_mktsegment STRING)
               |USING graft""".stripMargin)
      t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
        .createOrReplaceTempView("graft_spj1_ord")
      t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
        .createOrReplaceTempView("graft_spj1_cust")
      s.sql(s"INSERT INTO $cat.lake.ord SELECT * FROM graft_spj1_ord")
      s.sql(s"INSERT INTO $cat.lake.cust SELECT * FROM graft_spj1_cust")
      s.sql(s"CALL $cat.system.bucket(table => 'lake.ord', " +
        "col => 'o_custkey', n_buckets => 8)")
      s.sql(s"CALL $cat.system.bucket(table => 'lake.cust', " +
        "col => 'c_custkey', n_buckets => 8)")
      // LAYOUT MAINTENANCE under append: a catalog INSERT into the
      // bucketed fact splits per bucket id in the writers and stamps
      // every new file's `k=`, so the SPJ report SURVIVES the append
      // (keys < 0 match no customer — the join result is unchanged)
      s.sql(s"INSERT INTO $cat.lake.ord VALUES " +
        "(CAST(-1 AS BIGINT), 0.0), (CAST(-9 AS BIGINT), 1.5)")
      val ordRoot = s"$wh/lake/ord"
      val mOrd = graft.sources.Snapshots.manifest(ordRoot,
        graft.sources.Snapshots.latestVersion(ordRoot))
      val layoutMaintained =
        mOrd.bucketSpec.contains(("o_custkey", 8)) &&
          mOrd.entries.forall(_.bucket.isDefined)
      val q = s"""SELECT c_mktsegment,
                 |  CAST(count(*) AS BIGINT) AS n_orders,
                 |  CAST(sum(CAST(floor(o_totalprice * 1e6 + 0.5)
                 |    AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS total_price
                 |FROM $cat.lake.ord JOIN $cat.lake.cust
                 |  ON o_custkey = c_custkey
                 |GROUP BY c_mktsegment""".stripMargin
      def shuffleCount(df: DataFrame): Int = {
        df.collect()
        // FINAL plan only — the AQE rendering appends the pre-adaptive
        // "Initial Plan", whose exchanges never ran
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        "Exchange hashpartitioning".r.findAllIn(plan).size
      }
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      val spj = s.sql(q)
      val spjShuffles = shuffleCount(spj)
      val spjRows = spj.collect().map(_.toString).sorted.toSeq
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val twin = s.sql(q)
      val twinShuffles = shuffleCount(twin)
      val twinRows = twin.collect().map(_.toString).sorted.toSeq
      val unshuffled = spjShuffles <= 1 && twinShuffles >= 2 &&
        spjShuffles < twinShuffles
      // materialize NOW: the temp warehouse dies in the finally block
      val rows = spj.collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2)))
      import s.implicits._
      rows.toDF("c_mktsegment", "n_orders", "total_price")
        .select(col("c_mktsegment"), col("n_orders"), col("total_price"),
          lit(unshuffled).as("spj_join_unshuffled"),
          lit(spjRows == twinRows).as("rows_match_twin"),
          lit(layoutMaintained).as("layout_maintained"))
    } finally {
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** Snapshot table exercising BUCKET-STAMP PRUNING — the spj2
    * fixture: v1 adopts the orders (o_custkey, o_totalprice)
    * projection; v2 is [[graft.sources.Snapshots.optimizeBucketed]]
    * (o_custkey, 8 buckets) — every file holds one bucket's keys,
    * `k=`-stamped.
    */
  private val bucketSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def bucketSnapPath(s: SparkSession, dir: String): String =
    bucketSnapMemo.synchronized {
      bucketSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_orders_bucketed_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "orders")
        buildCachedDir(path) { tmp =>
          val seed = s"$tmp/__seed"
          t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
            .coalesce(4).write.parquet(seed)
          graft.sources.Snapshots.init(s, tmp, seed)
          graft.sources.Snapshots.optimizeBucketed(s, tmp, "o_custkey", 8)
          org.apache.spark.network.util.JavaUtils
            .deleteRecursively(new java.io.File(seed))
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
          ()
        }
      })
    }

  /** SPJ2: BUCKET-STAMP PRUNING ([[graft.sources.v2.GraftZonePrune
    * .mightMatchBucket]]) — the point-lookup complement zones cannot
    * give a bucketed layout. `floorMod` interleaves keys, so every
    * file's zone on `o_custkey` spans ~the whole key range and
    * `o_custkey = <const>` zone-prunes NOTHING; the `k=` stamp names
    * the one bucket the key can live in, so the scan plans ONLY that
    * bucket's files (1/8 here). Gates: the scan-audit planned set is a
    * strict, non-empty subset of the probe key's bucket files on a
    * fully stamped layout (`pruned_to_bucket`); the lookup's count and
    * 6dp price mass equal the closed-form DuckDB aggregate over raw
    * orders at the same key (the MIN custkey — closed-form on both
    * sides).
    *
    * 100 TB lens: needle-in-haystack reads on the join key are the
    * second-most-common query on a bucketed fact after the join
    * itself; without stamp pruning they scan the whole table, because
    * bucketing destroyed the zone locality that range-sorting gave.
    */
  def spj2BucketPrunedLookup(s: SparkSession, dir: String): DataFrame = {
    val root = bucketSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val m = S.manifest(root, S.latestVersion(root))
    val key = t(s, dir, "orders").agg(min(col("o_custkey")))
      .head().getLong(0)
    val audit = "spj2-" + java.util.UUID.randomUUID().toString.take(8)
    val agg = s.read.format("graft").option("path", root)
      .option("auditId", audit).load()
      .where(col("o_custkey") === key)
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6))
          .as("total_price")).head()
    val planned = graft.sources.v2.GraftScanAudit.planned(audit).toSet
    graft.sources.v2.GraftScanAudit.clear(audit)
    val bucketFiles = m.entries.filter(_.bucket.contains(
      graft.sources.v2.GraftBucket.id(8, key))).map(_.name).toSet
    val prunedToBucket = m.entries.forall(_.bucket.isDefined) &&
      planned.nonEmpty && planned.subsetOf(bucketFiles) &&
      planned.size < m.entries.size
    import s.implicits._
    Seq((agg.getLong(0), agg.getDouble(1))).toDF("n_orders", "total_price")
      .select(col("n_orders"), col("total_price"),
        lit(prunedToBucket).as("pruned_to_bucket"))
  }

  /** Snapshot table exercising SIDECAR COMPACTION — the mt1 fixture:
    * v1 adopts the compacted files; v2/v3/v4 are three independent MoR
    * deletes (three live sidecars — the MERGE-heavy accrual shape);
    * v5 is [[graft.sources.Snapshots.compactSidecars]]: the three fold
    * into ONE per-file-union bitmap sidecar, zero data files touched.
    */
  private val compactDvSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def compactDvSnapPath(s: SparkSession, dir: String): String =
    compactDvSnapMemo.synchronized {
      compactDvSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_compactdv_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          def micros(v: String): Long = {
            val t = java.sql.Timestamp.valueOf(v)
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          }
          S.init(s, tmp, compactedEventsPath(s, dir))
          S.deletePositions(s, tmp, "ts",
            micros("2024-01-05 00:00:00"), micros("2024-01-06 00:00:00"))
          S.deletePositions(s, tmp, "ts",
            tsWindowLoMicros, tsWindowHiMicros)
          S.deletePositions(s, tmp, "ts",
            micros("2024-01-20 00:00:00"), micros("2024-01-21 00:00:00"))
          S.compactSidecars(s, tmp)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** MT1: SIDECAR COMPACTION ([[graft.sources.Snapshots
    * .compactSidecars]] / `CALL g.system.compact_sidecars`) — the
    * maintenance middle between per-statement sidecar accrual and a
    * full optimize: three MoR deletes leave three live sidecars (reads
    * pay one sidecar resolution per name per scan), and one METADATA
    * commit folds them into a single per-file-union bitmap sidecar —
    * zero data files rewritten. Gates: sidecar count 3 → 1 with the
    * data-file list IDENTICAL across the commit; merged marks equal the
    * three windows' row count exactly (closed form); post-compaction
    * count/6dp mass equal the pre-compaction read AND the closed-form
    * survivor set; the pre-compaction version stays time-travelable.
    *
    * 100 TB lens: a CDC-ingest table takes a MERGE a minute — 1440
    * sidecars a day. Folding them must cost KB of sidecar I/O on a
    * schedule, not a full-table rewrite; this is Iceberg's
    * rewrite_position_delete_files / Delta's DV compaction role.
    */
  def mt1CompactSidecars(s: SparkSession, dir: String): DataFrame = {
    val root = compactDvSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val latest = S.latestVersion(root)
    val before = S.deleteSidecars(root, 4)
    val after = S.deleteSidecars(root, 5)
    val filesUntouched = S.resolve(root, 5) == S.resolve(root, 4)
    val marked = graft.sources.v2.GraftDvPositions.markedFiles(
      s, root, after)
    // the merged sidecar's own cardinality, from the bitmap parts
    val mergedMarks = after.headOption.map(n =>
      s.read.parquet(s"$root/_deletes/$n")
        .agg(coalesce(sum(col("card")), lit(0L))).head().getLong(0))
      .getOrElse(0L)
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val a5 = S.read(s, root, 5)
      .agg(count(lit(1)).as("n_live"), mass.as("value_live"))
    val a4 = S.read(s, root, 4).agg(count(lit(1)).as("n_pre_compact"))
    a5.crossJoin(broadcast(a4))
      .select(col("n_live"), col("value_live"), col("n_pre_compact"),
        lit(mergedMarks).as("marked_positions"),
        lit(before.size.toLong).as("sidecars_before"),
        lit(after.size.toLong).as("sidecars_after"),
        lit(latest.toLong).as("latest_version"),
        lit(filesUntouched).as("files_untouched"),
        lit(marked.nonEmpty).as("bitmap_parts_readable"))
  }

  /** TT3: RESTORE TO VERSION — the rollback verb next to time travel
    * ([[graft.sources.Snapshots.restore]]): an accidental delete (v2's
    * MoR sidecar over the 3-day window) is undone by ONE metadata
    * commit (v3) whose file set and read state are v1's — zero data
    * I/O, history preserved (v2 stays time-travelable AFTER the
    * restore; the row reads it last). Gates: v3 count/mass equal the
    * whole table (the v1 state, closed-form pinned), v3 references
    * EXACTLY v1's files with NO live sidecar, v2 still serves the
    * deleted view, and out-of-history restores refuse.
    *
    * 100 TB lens: the bad-write undo must cost one manifest line, not
    * a restore-from-backup — that is half the operational case for
    * snapshots in every production format.
    */
  def tt3Restore(s: SparkSession, dir: String): DataFrame = {
    val root = restoreSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val filesMatch = S.resolve(root, 3) == S.resolve(root, 1)
    val noSidecar = S.manifest(root, 3).dvNames.isEmpty &&
      S.manifest(root, 2).dvNames.nonEmpty
    val outOfRangeRefused = scala.util.Try(S.restore(s, root, 99)).isFailure
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val a3 = S.read(s, root, 3)
      .agg(count(lit(1)).as("n_restored"), mass.as("value_restored"))
    // v2 read LAST, after the restore commit: continuity of history
    val a2 = S.read(s, root, 2).agg(count(lit(1)).as("n_v2"))
    a3.crossJoin(broadcast(a2))
      .select(col("n_restored"), col("value_restored"), col("n_v2"),
        lit(S.latestVersion(root).toLong).as("latest_version"),
        lit(filesMatch).as("files_match_v1"),
        lit(noSidecar).as("sidecar_cleared"),
        lit(outOfRangeRefused).as("out_of_range_refused"))
  }

  /** Snapshot table exercising DROP COLUMN evolution — the se3 fixture:
    * v1 adopts the compacted files (ts stats); v2 drops `props`
    * (metadata-only `#drop:` tombstone); v3 OPTIMIZE materializes the
    * drop physically (rewritten files have no `props` column) while the
    * tombstone carries.
    */
  private val evolve3SnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def evolve3SnapPath(s: SparkSession, dir: String): String =
    evolve3SnapMemo.synchronized {
      evolve3SnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_evolve3_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir),
            statsCols = Seq("ts"), extraProps = Seq("stats=ts"))
          S.dropColumn(s, tmp, "props")
          S.optimize(s, tmp, "ts", 4, blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** SE3: logical DROP COLUMN ([[graft.sources.Snapshots.dropColumn]])
    * — the last quarter of the evolution surface next to ADD/RENAME/
    * widen. A `#drop:` manifest tombstone hides the column from the
    * CURRENT schema at zero data I/O; physical bytes stay, so v1 time
    * travel still serves the column; OPTIMIZE materializes the drop
    * (rewritten footers carry no `props` field) but KEEPS the tombstone
    * — the re-add refusal record, since a name-mapped format (no field
    * ids) cannot tell a re-added column from pre-drop values retained
    * in unrewritten files. Gates (engine-verified booleans): the
    * dropped column is hidden at v2 and v3 and absent from v3 footers;
    * v1 still serves it non-null; dropping the stats column and
    * re-dropping are refused; counts and 6dp value mass survive both
    * commits untouched.
    *
    * 100 TB lens: retiring a column from a year of files must cost one
    * metadata line, not a rewrite — and must never resurrect as stale
    * bytes when someone reuses the name.
    */
  def se3DropColumn(s: SparkSession, dir: String): DataFrame = {
    val root = evolve3SnapPath(s, dir)
    val S = graft.sources.Snapshots
    val hiddenV2 = !S.read(s, root, 2).columns.contains("props")
    val hiddenV3 = !S.read(s, root, 3).columns.contains("props")
    val servedV1 = S.read(s, root, 1).columns.contains("props")
    val tombstoneKept = S.manifest(root, 3).droppedColumns == Seq("props")
    // materialized: no v3 footer carries the column physically
    val physicalGone = !s.read.parquet(
      S.resolve(root, 3).map(n => s"$root/files/$n"): _*)
      .columns.contains("props")
    val statsDropRefused = scala.util.Try(
      S.dropColumn(s, root, "ts")).isFailure
    val redropRefused = scala.util.Try(
      S.dropColumn(s, root, "props")).isFailure
    val propsV1 = S.read(s, root, 1)
      .agg(sum(when(col("props").isNotNull, 1L).otherwise(0L)))
      .head().getLong(0)
    def agg(df: DataFrame, p: String) =
      df.agg(count(lit(1)).as(s"n_$p"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6))
          .as(s"value_$p"))
    agg(S.read(s, root, 2), "v2")
      .crossJoin(broadcast(agg(S.read(s, root, 3), "v3")))
      .select(col("n_v2"), col("value_v2"), col("n_v3"), col("value_v3"),
        lit(propsV1).as("props_nonnull_v1"),
        lit(hiddenV2).as("hidden_v2"),
        lit(hiddenV3).as("hidden_v3"),
        lit(servedV1).as("served_v1"),
        lit(tombstoneKept).as("tombstone_kept"),
        lit(physicalGone).as("physical_gone_v3"),
        lit(statsDropRefused).as("stats_drop_refused"),
        lit(redropRefused).as("redrop_refused"))
  }

  /** Snapshot table optimized into a Z-ORDER clustering — the oz1
    * fixture: v1 adopts the compacted (ts-sorted) files; v2 is
    * [[graft.sources.Snapshots.optimizeZOrder]] on (user_id,
    * day-of-stream) into 16 Morton-range files.
    */
  private val zoptSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def zoptSnapPath(s: SparkSession, dir: String): String =
    zoptSnapMemo.synchronized {
      zoptSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_zopt_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          graft.sources.Snapshots.optimizeZOrder(s, tmp, col("user_id"),
            pmod(datediff(to_date(col("ts")), lit("2024-01-01")), lit(32)),
            16, blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** OZ1: OPTIMIZE ... ZORDER BY on the snapshot table — the clustering
    * rewrite every production format ships ([[graft.sources.Snapshots
    * .optimizeZOrder]]): the live version (a single-column ts-sort) is
    * recompacted as 16 Morton-range files on (user_id, day), so each
    * file's footer envelope is bounded on BOTH dimensions and a
    * conjunctive predicate (`user_id < 8 AND the pp2 window`) prunes
    * files on the intersection. Gates: the rewrite is LOSSLESS (count +
    * 6dp mass of v2 == the whole table, pinned), v1 stays readable
    * (time travel across the re-clustering), exactly 16 files, the
    * zone-planned conjunctive selection is a non-empty STRICT subset
    * whose scan opens nothing else, and the pruned query equals the
    * flat twin (count + mass pinned — the mf3 predicate, now planned
    * from the SNAPSHOT's own files).
    *
    * 100 TB lens: a table ingested in time order serves time queries
    * and nothing else; re-clustering at compaction time is how the
    * two-filter access pattern gets its layout without a second copy —
    * same one range shuffle any compaction pays.
    */
  def oz1OptimizeZOrder(s: SparkSession, dir: String): DataFrame = {
    val root = zoptSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val files = S.resolve(root, 2)
    val paths = files.map(n => s"$root/files/$n")
    val zu = graft.sources.Bucketing.fileZones(s, paths, "user_id")
    val zt = graft.sources.Bucketing.fileZones(s, paths, "ts")
      .map(z => z._1 -> z._3).toMap
    val selected = zu.collect {
      case (n, _, Some((mnU, mxU)))
          if mxU >= 0L && mnU < 8L && zt(n).exists { case (mnT, mxT) =>
            mxT >= tsWindowLoMicros && mnT < tsWindowHiMicros } => n
    }
    val pruned = s.read
      .parquet(selected.map(n => s"$root/files/$n"): _*)
      .where(col("user_id") < lit(8) &&
        col("ts") >= ts("2024-01-10 00:00:00") &&
        col("ts") < ts("2024-01-13 00:00:00"))
    val opened = graft.sources.Bucketing.filesRead(pruned)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val a1 = S.read(s, root, 1).agg(count(lit(1)).as("n_v1"))
    val a2 = S.read(s, root, 2).agg(count(lit(1)).as("n_v2"),
      mass.as("total_value_v2"))
    val aw = pruned.agg(count(lit(1)).as("n_window"), mass.as("window_value"))
    a2.crossJoin(broadcast(a1)).crossJoin(broadcast(aw))
      .select(col("n_v1"), col("n_v2"), col("total_value_v2"),
        col("n_window"), col("window_value"),
        lit(files.size.toLong).as("files_v2"),
        lit(selected.nonEmpty && selected.size < files.size)
          .as("zorder_prunes"),
        lit(opened.subsetOf(selected.toSet)).as("scan_within_selection"))
  }

  /** KEY-DELETED merge-on-read snapshot — the mor2 fixture: v1 adopts
    * the compacted files; v2 marks every row of user 3 via
    * [[graft.sources.Snapshots.deletePositionsByKey]] (one sidecar,
    * zero files rewritten).
    */
  private val morKeySnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def morKeySnapPath(s: SparkSession, dir: String): String =
    morKeySnapMemo.synchronized {
      morKeySnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_morkey_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Snapshots.init(s, tmp, compactedEventsPath(s, dir))
          graft.sources.Snapshots.deletePositionsByKey(s, tmp, "user_id",
            s.range(3, 4).select(col("id").as("user_id")))
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** MOR2: key-based merge-on-read delete — the GDPR erasure shape
    * ("erase user 3 everywhere") ([[graft.sources.Snapshots
    * .deletePositionsByKey]]): on a TIME-sorted table the user's rows
    * are scattered across every file, so a copy-on-write delete would
    * rewrite the whole table; instead a COLUMN-PRUNED key probe (key
    * column + row index, batch keys broadcast) marks their positions as
    * ONE sidecar and rewrites nothing (gate: v1 and v2 resolve to the
    * IDENTICAL file list). Pinned: the sidecar marks exactly the user's
    * row count, v2 reads the complement (count + 6dp mass), zero user-3
    * rows survive, and v1 still reads the full table (the erasure is a
    * new version, not history rewriting — retention policy decides when
    * vacuum makes it physical).
    *
    * 100 TB lens: THE GDPR query. Zone planning can't help a key
    * predicate on a time-sorted table; the honest cost is one thin-
    * column scan + a KB sidecar, vs rewriting a year of data under COW.
    */
  def mor2KeyErasure(s: SparkSession, dir: String): DataFrame = {
    val root = morKeySnapPath(s, dir)
    val S = graft.sources.Snapshots
    val filesIdentical = S.resolve(root, 1) == S.resolve(root, 2)
    val dv2 = S.deleteSidecars(root, 2)
    val nDv =
      if (dv2.isEmpty) 0L
      else graft.sources.Snapshots.dvRead(s, root, dv2).count()
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val a1 = S.read(s, root, 1).agg(count(lit(1)).as("n_v1"))
    val a2 = S.read(s, root, 2).agg(count(lit(1)).as("n_v2"),
      mass.as("total_value_v2"),
      coalesce(sum(when(col("user_id") === 3L, 1L).otherwise(0L)), lit(0L))
        .as("n_user3_v2"))
    a2.crossJoin(broadcast(a1))
      .select(col("n_v1"), col("n_v2"), col("total_value_v2"),
        col("n_user3_v2"), lit(nDv).as("n_dv_positions"),
        lit(filesIdentical).as("files_identical"),
        lit(dv2.size == 1).as("dv_present"))
  }

  /** CDC-REPLICATED twin of the lifecycle table — the rep1 fixture: a
    * replica starts as v1's rows and then follows versions 2..5 purely
    * through row-tagged change feeds ([[graft.streaming.SnapshotFeed
    * .applyChangeFeed]]), materializing each step.
    */
  private val replicaMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def replicaPath(s: SparkSession, dir: String): String =
    replicaMemo.synchronized {
      replicaMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_replica_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          val root = lifecycleSnapPath(s, dir)
          val latest = S.latestVersion(root)
          var cur = S.read(s, root, 1)
          (2 to latest).foreach { v =>
            val feed = S.changeFeed(s, root, v - 1, v, "event_id")
            cur = graft.streaming.SnapshotFeed
              .applyChangeFeed(cur, feed, "event_id")
            cur.write.mode("overwrite").parquet(s"$tmp/v$v")
            cur = s.read.parquet(s"$tmp/v$v")
          }
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** REP1: full CDC REPLICATION — the materialization consumer the
    * row-tagged feed exists for ([[graft.streaming.SnapshotFeed
    * .applyChangeFeed]]): a replica follows the lifecycle table through
    * versions 2..5 purely by retracting `delete`/`update_preimage` keys
    * and adding `insert`/`update_postimage` rows — never re-scanning the
    * source. The gate is MULTISET EQUALITY with the direct read of the
    * latest version (`exceptAll` empty BOTH ways, binary-exact values
    * across an evolve, a MERGE, a delete, and an optimize), plus the lc1
    * closed-form aggregates pinned on the replica itself. A consumer
    * that mis-tagged, dropped, or double-applied one row cannot pass the
    * two-way exceptAll.
    *
    * 100 TB lens: search indexes, feature stores, and cross-region
    * replicas all follow a mutating table this way; per-version cost is
    * the delta's size, and correctness is exactly this equality.
    */
  def rep1CdcReplica(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val root = lifecycleSnapPath(s, dir)
    val latest = S.latestVersion(root)
    val replica = s.read.parquet(s"${replicaPath(s, dir)}/v$latest")
    val direct = S.read(s, root, latest)
    val cols = direct.columns.sorted.map(col).toSeq
    val r = replica.select(cols: _*)
    val d = direct.select(cols: _*)
    val identical = r.exceptAll(d).isEmpty && d.exceptAll(r).isEmpty
    def mass(c: org.apache.spark.sql.Column) =
      (sum(floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
        .cast("double") / lit(1e6))
    replica.agg(count(lit(1)).as("n_final"),
        mass(col("value")).as("total_value"),
        mass(col("quality_score")).as("total_quality"),
        sum(when(col("quality_score").isNull, 1L).otherwise(0L))
          .as("n_null_quality"))
      .select(col("n_final"), col("total_value"), col("total_quality"),
        col("n_null_quality"),
        lit(identical).as("replica_identical"),
        lit(latest.toLong).as("n_versions"))
  }

  /** Persisted BLOOM manifest of [[zordered16Path]] on `event_id` — the
    * bf1 fixture (its own cached dir; stores file NAMES, so it is
    * location-independent unlike the zone manifests). Built by the
    * DISTRIBUTED one-pass builder ([[graft.sources.Manifest
    * .writeBloomDistributed]]) since round 15 — bf1 probes it
    * driver-side, bf2 in executors; both paths read one format.
    */
  private val bloomManMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def bloomManPath(s: SparkSession, dir: String): String =
    bloomManMemo.synchronized {
      bloomManMemo.getOrElseUpdate(dir, {
        // _bloomman2_: path bumped when the build switched to the
        // distributed one-pass form (cache keys on content fingerprint,
        // not builder code)
        val path = "/tmp/graft_events_bloomman2_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val data = zordered16Path(s, dir)
          val total = s.read.parquet(data).count()
          graft.sources.Manifest.writeBloomDistributed(
            s, data, "event_id", tmp,
            expectedPerFile = math.max(1L, total / 16L * 2L), fpp = 1e-4)
        }
      })
    }

  /** BF1: BLOOM-manifest point-lookup pruning — the file-skipping stats
    * min/max zones cannot provide ([[graft.sources.Manifest
    * .buildBloom]] / [[graft.sources.Manifest.selectFilesBloom]]): on
    * the 16-file z-ordered layout every file's `event_id` envelope
    * spans the whole id space (ids are uncorrelated with the layout
    * dims), so zone pruning keeps ALL 16 files for a `event_id IN (…)`
    * lookup; the per-file blooms keep only the files that might hold
    * the keys. Keys are derived identically on both sides (global min
    * and max id, plus the pp2 window's min id). Gates: NO FALSE
    * NEGATIVE — the selection contains every file the unpruned scan
    * actually finds the keys in (ground truth via `input_file_name`);
    * the selection is a STRICT subset of the 16 files (bloom pruning is
    * real); the pruned lookup's rows equal the flat twin (count + 6dp
    * mass + distinct ids pinned); and the scan opens nothing outside
    * the selection.
    *
    * 100 TB lens: "fetch these 50 record ids" is THE serving query a
    * zone-mapped lake cannot answer without scanning; ~1 KB of bloom
    * per file answers it from a planner-side manifest — Iceberg bloom
    * columns / Delta bloom indexes, built here from public Spark
    * sketches.
    */
  def bf1BloomPointLookup(s: SparkSession, dir: String): DataFrame = {
    val data = zordered16Path(s, dir)
    val man = bloomManPath(s, dir)
    val ev = t(s, dir, "events")
    val kRow = ev.agg(min(col("event_id")), max(col("event_id"))).head()
    val kWin = ev.where(col("ts") >= ts("2024-01-10 00:00:00") &&
        col("ts") < ts("2024-01-13 00:00:00"))
      .agg(min(col("event_id"))).head().getLong(0)
    val keys = Seq(kRow.getLong(0), kRow.getLong(1), kWin).distinct
    val selected = graft.sources.Manifest.selectFilesBloom(s, man, keys)
    val totalFiles = graft.sources.Compaction.dataFileNames(data).size
    // ground truth: which files actually hold the keys (unpruned scan)
    val truth = graft.sources.Bucketing.filesRead(
        s.read.parquet(data).where(col("event_id").isin(keys: _*)))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    val pruned = s.read
      .parquet(selected.map(n => s"$data/$n"): _*)
      .where(col("event_id").isin(keys: _*))
    val opened = graft.sources.Bucketing.filesRead(pruned)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    pruned.agg(count(lit(1)).as("n_hits"),
        countDistinct(col("event_id")).as("n_ids"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6))
          .as("hit_value"))
      .select(col("n_hits"), col("n_ids"), col("hit_value"),
        lit(totalFiles.toLong).as("files_total"),
        lit(truth.subsetOf(selected.toSet)).as("no_false_negative"),
        lit(selected.nonEmpty && selected.size < totalFiles)
          .as("bloom_prunes"),
        lit(opened.subsetOf(selected.toSet)).as("scan_within_selection"))
  }

  /** Streaming-accretion snapshot — the oc1 fixture: v1 adopts the 4
    * compacted files; v2–v4 append three single-day slices (2024-01-27/
    * 28/29, ids offset +4/5/6·10^12) as KB-scale commit files; v5 is an
    * INCREMENTAL bin-pack ([[graft.sources.Snapshots.optimizeBinPack]])
    * with the threshold at the smallest original file, so exactly the
    * three accreted files rewrite and the four originals re-reference.
    */
  private val binpackSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def binpackSnapPath(s: SparkSession, dir: String): String =
    binpackSnapMemo.synchronized {
      binpackSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_binpack_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir))
          val ev = t(s, dir, "events")
          (0 until 3).foreach { i =>
            S.append(s, tmp, ev
              .where(col("ts") >= ts(s"2024-01-2${7 + i} 00:00:00") &&
                col("ts") < ts(s"2024-01-${28 + i} 00:00:00"))
              .withColumn("event_id",
                col("event_id") + lit((4L + i) * 1000000000000L)),
              "ts", blockSize = 16 * 1024)
          }
          val threshold = S.resolve(tmp, 1)
            .map(n => graft.sources.LakeFs.fileLength(s"$tmp/files/$n")).min
          S.optimizeBinPack(s, tmp, "ts", threshold,
            blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** OC1: INCREMENTAL bin-pack compaction — the maintenance the full
    * rewrite (cf1/optimize) cannot afford at scale ([[graft.sources
    * .Snapshots.optimizeBinPack]]): three KB-scale streaming commits
    * accrete on top of four right-sized files, and the pack rewrites
    * ONLY the undersized three into one range-sorted file while
    * re-referencing the originals verbatim (gate: v1's file set is a
    * subset of the packed version's — same physical entries, zero
    * bytes of I/O on the history). Pinned: exactly 3 rewritten / 4
    * reused / 5 files after, and the packed table equals the
    * closed-form replay (events + the three offset day slices) in
    * count and 6dp mass — with time travel: v4 (pre-pack) pins the
    * same values, proving the pack changed layout, not data.
    *
    * 100 TB lens: nightly maintenance must cost ∝ the day's new small
    * bytes, never the table — Delta OPTIMIZE bin-packing / Iceberg
    * binpack rewrite; a compaction that rewrites the year to absorb a
    * day is a failure mode, not a feature.
    */
  def oc1IncrementalBinPack(s: SparkSession, dir: String): DataFrame = {
    val root = binpackSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val latest = S.latestVersion(root)
    val origs = S.resolve(root, 1).toSet
    val after = S.resolve(root, latest)
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val aPre = S.read(s, root, latest - 1)
      .agg(count(lit(1)).as("n_prepack"), mass.as("value_prepack"))
    val aPost = S.read(s, root, latest)
      .agg(count(lit(1)).as("n_packed"), mass.as("value_packed"))
    val filesPre = S.resolve(root, latest - 1).size
    aPost.crossJoin(broadcast(aPre))
      .select(col("n_packed"), col("value_packed"),
        col("n_prepack"), col("value_prepack"),
        lit(filesPre.toLong).as("files_prepack"),
        lit(after.size < filesPre).as("pack_reduced"),
        lit(origs.subsetOf(after.toSet)).as("history_untouched"))
  }

  /** Z-ordered flat copy of `events` ([[graft.sources.Bucketing
    * .writeZOrdered]] on (user_id, day-of-stream)) — the pp3 fixture.
    */
  private val zorderedEventsMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def zorderedEventsPath(s: SparkSession, dir: String): String =
    zorderedEventsMemo.synchronized {
      zorderedEventsMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_zorder_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Bucketing.writeZOrdered(
            t(s, dir, "events"), col("user_id"),
            pmod(datediff(to_date(col("ts")), lit("2024-01-01")), lit(32)),
            tmp, blockSize = 16 * 1024)
        }
      })
    }

  /** Composite production layout of `events` ([[graft.sources.Bucketing
    * .writePartitionedByDayZOrdered]]): day-partitioned directories AND
    * per-partition z-order on (user_id, hour) with deliberately small
    * row groups — the pp4 fixture. 4 KB blocks (vs pp2/pp3's 16 KB)
    * because each DAY here holds only ~1/30 of the table and must still
    * span several row groups for intra-partition skipping to be provable
    * at test SFs.
    */
  private val compositeEventsMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def compositeEventsPath(s: SparkSession, dir: String): String =
    compositeEventsMemo.synchronized {
      compositeEventsMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_composite_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          graft.sources.Bucketing.writePartitionedByDayZOrdered(
            t(s, dir, "events"), "ts", col("user_id"), hour(col("ts")),
            tmp, blockSize = 4 * 1024)
        }
      })
    }

  /** PP4: the COMPOSITE layout proof — every pruning mechanism this
    * library proves in isolation, composing in ONE scan over the layout
    * every real lake actually ships (partition by day, sort/z-order
    * within partitions). The query is dpp1's star join (calendar dim,
    * `week_of_month = 2`) PLUS pp3's cohort predicate (`user_id < 128`):
    * the dim filter prunes `dt=` directories at RUNTIME (DPP — the date
    * set is unknowable at plan time), and inside each surviving
    * directory the z-order layout's row-group min/max stats on user_id
    * skip the groups the cohort can't touch. CompositeLayoutSpec asserts
    * both mechanisms fired on one queryExecution (dynamicpruning in
    * PartitionFilters, `numPartitions` == week-2 day count, scan
    * `numOutputRows` strictly below the surviving partitions' row
    * total); this row pins the VALUES via the flat-twin oracle.
    *
    * 100 TB lens: directory pruning admits ~7/30 of the year, z-order
    * row groups admit ~the cohort's fraction of each admitted day —
    * multiplicative, and neither needed the predicate in the query text
    * (the dim drove it). This is the default layout recommendation this
    * engine makes for a fact table with a time axis and a second hot
    * filter key.
    */
  def pp4CompositePruning(s: SparkSession, dir: String): DataFrame = {
    val fact = s.read.parquet(compositeEventsPath(s, dir))
      .where(col("user_id") < 128)
    val dim = s.read.parquet(calendarPath(s, dir))
      .where(col("week_of_month") === 2)
    fact.join(dim, fact("dt") === dim("day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** PP3: Z-ORDER skipping — the multi-dimensional completion of the
    * pruning story (pp1 directory, dpp1 runtime, pp2 single-column row
    * groups, pp3 TWO columns at once). The layout sorts on the Morton
    * interleave of (user_id, day), so row groups carry usable min/max on
    * BOTH dimensions — the two-filter access pattern (`user cohort AND
    * time window`) a single-column sort cannot serve: pp2's ts-sort
    * answers time windows but scans every group for a user predicate.
    * ZOrderSkippingSpec proves each single-column predicate alone
    * intersects a strict subset of groups from the footers, and that the
    * combined predicate's scan reads only groups surviving BOTH. This
    * row pins VALUES: the combined cohort+window aggregate hash-matches
    * the flat-events DuckDB oracle (re-layout losslessness under the
    * predicates that exercised the skipping).
    */
  def pp3ZOrderSkipping(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(zorderedEventsPath(s, dir))
      .where(col("user_id") < 128 &&
        col("ts") >= ts("2024-01-10 00:00:00") &&
        col("ts") < ts("2024-01-13 00:00:00"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type"))

  /** PP2: ROW-GROUP skipping — the intra-file half of the pruning story
    * (pp1 = directory listing, dpp1 = runtime dim-driven, pp2 = parquet
    * min/max statistics INSIDE surviving files). A narrow ts window over
    * the range-sorted flat copy: the predicate reaches the scan as
    * PushedFilters, and because the layout is globally ts-sorted every
    * row group's [min,max] is tight, so the reader keeps only the few
    * groups intersecting the window — RowGroupSkippingSpec proves it
    * three ways (footer audit: intersecting groups are a strict subset;
    * scan metric: rows produced == surviving groups' rows < total;
    * pushdown: the ts predicate appears in PushedFilters). This row pins
    * the VALUES: same 3-day window as pp1, so the sorted-copy aggregate
    * must hash-match the flat-events DuckDB oracle — re-layout
    * losslessness under a predicate that exercised the skipping path.
    *
    * 100 TB lens: sort-on-write is the cheapest index a lake gets. After
    * directory pruning admits a day (~280 GB), min/max stats are what
    * keep a 1-hour query from decoding the other 23 hours.
    */
  def pp2RowGroupSkipping(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(sortedEventsPath(s, dir))
      .where(col("ts") >= ts("2024-01-10 00:00:00") &&
        col("ts") < ts("2024-01-13 00:00:00"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type"))

  /** ORC copy of `lineitem`, written once per source fingerprint — the
    * orc1 fixture (Spark ships ORC natively; zero added dependencies).
    */
  private val orcLineitemMemo = scala.collection.mutable.Map[String, String]()
  private def orcLineitemPath(s: SparkSession, dir: String): String =
    orcLineitemMemo.synchronized {
      orcLineitemMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_lineitem_orc_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "lineitem")
        buildCachedDir(path) { tmp =>
          t(s, dir, "lineitem").write.mode("overwrite").orc(tmp)
        }
      })
    }

  /** ORC1: second columnar format, end to end — a date-filtered pricing
    * aggregate computed over an ORC re-layout of the fact table must
    * hash-match the DuckDB oracle computed on the ORIGINAL parquet (the
    * pp1 losslessness convention: DuckDB cannot read ORC, so equality
    * against the flat-parquet twin is exactly the proof that the format
    * hop lost nothing — values, timestamp semantics, floating-point
    * payloads). The predicate + two-column projection also exercise
    * ORC's own pushdown/pruning path (Spark's native reader). Round-trip
    * row fidelity for all four formats is additionally spec-pinned in
    * FormatRoundTripSpec; this row makes the ORC path oracle-gated at
    * every SF like any other operator.
    */
  def orc1OrcRelayout(s: SparkSession, dir: String): DataFrame =
    s.read.orc(orcLineitemPath(s, dir))
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(floor(col("l_quantity") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_qty"),
        (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          lit(1e6) + lit(0.5)).cast("decimal(38,0)")).cast("double") /
          lit(1e6)).as("total_revenue"))
      .orderBy(col("l_returnflag"))

  /** Tiny calendar dimension for the star-join pruning proofs: one row per
    * calendar day present in `events`, with derived attributes
    * (`week_of_month`, `is_weekend`) a campaign/reporting dim would carry.
    * Persisted parquet (not an in-memory LocalRelation) so the dpp1 join
    * is a REAL star join — the dim's contents are unknowable at plan time,
    * which is exactly what forces runtime (dynamic) pruning rather than
    * constant-folded static pruning.
    */
  private val calendarMemo = scala.collection.mutable.Map[String, String]()
  private def calendarPath(s: SparkSession, dir: String): String =
    calendarMemo.synchronized {
      calendarMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_calendar_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          t(s, dir, "events")
            .select(to_date(col("ts")).as("day")).distinct()
            .withColumn("week_of_month",
              (floor((dayofmonth(col("day")) - lit(1)) / lit(7)) + lit(1))
                .cast("int"))
            .withColumn("is_weekend", dayofweek(col("day")).isin(1, 7))
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp)
        }
      })
    }

  /** DPP1: DYNAMIC (runtime) partition pruning — the star-join completion
    * of pp1's static proof. A selective predicate on the small calendar
    * dim (`week_of_month = 2`, 7 of ~30 days) joined to the
    * day-partitioned fact on the partition column: the fact's matching
    * `dt=` directories are knowable only AFTER the dim filter runs, so
    * Catalyst inserts a DynamicPruningSubquery into the fact scan's
    * PartitionFilters, reusing the join's broadcast of the filtered dim —
    * the plan mechanism (dynamicpruningexpression in the scan leaf,
    * post-execution `number of partitions read` == 7 of ~30) is asserted
    * in PartitionPruningSpec; this row pins the VALUES via the flat-twin
    * oracle (DuckDB replays the same dim derivation and join on the flat
    * parquet).
    *
    * 100 TB lens: this is THE fact-table pattern — `events ⋈ dim WHERE
    * dim.attr = x` — where static pruning is impossible (the date set
    * lives in the dim, not the query text). Without DPP the scan reads
    * the full year; with it, the broadcast result prunes directories
    * before fact I/O starts. Same join, ~1/4 the scan.
    */
  def dpp1DynamicPruning(s: SparkSession, dir: String): DataFrame = {
    val fact = s.read.parquet(prunedEventsPath(s, dir))
    val dim = s.read.parquet(calendarPath(s, dir))
      .where(col("week_of_month") === 2)
    fact.join(dim, fact("dt") === dim("day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** PP1: layout-level partition pruning — the row that proves a date
    * predicate on a day-partitioned fact layout ([[graft.sources.Bucketing
    * .writePartitionedByDay]]) reads only the matching `dt=` directories
    * AND that the re-layout is lossless: the aggregate over the
    * partitioned copy must hash-match the oracle computed on the FLAT
    * parquet with the equivalent timestamp predicate. The pruning itself
    * (3 of 30 directories listed, PartitionFilters in the scan leaf,
    * actually-read files audited via `input_file_name`) is asserted in
    * PartitionPruningSpec; this row pins the VALUES.
    *
    * 100 TB lens: this is the difference between a dashboard query
    * listing 3 directories and scanning ~1% of the year, versus opening
    * every footer of a 100 TB table to evaluate a ts range — layout
    * pruning happens before I/O, predicate pushdown after.
    */
  def pp1PartitionPruning(s: SparkSession, dir: String): DataFrame = {
    val days = Seq("2024-01-10", "2024-01-11", "2024-01-12")
    s.read.parquet(prunedEventsPath(s, dir))
      .where(col("dt").cast("string").isin(days: _*))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** MM4: REAL media decode as an oracle row — the [[graft.operators
    * .Multimodal.JvmCodecs]] seam (pure-JDK PNG via `javax.imageio`, PCM
    * WAV via `javax.sound.sampled`, spec-proven since round 9) promoted
    * from spec to registry: six deterministic real-format payloads
    * ([[graft.operators.Multimodal.SyntheticMedia]]) are DECODED —
    * raster dims, PCM frame counts, duration from the container's native
    * rate, mean decoded luminance / mean unsigned PCM sample — and
    * checked against literal fixture truth the oracle recomputes from
    * the generating closed forms (gradient `(7x+13y) % 256`, sine
    * `128+100·sin(0.1i)`). A codec that mis-reads any pixel, sample,
    * header rate or frame length breaks the hash. StubCodecs remains
    * the default for mm1–mm3 (their oracles replay the stub in SQL).
    */
  def mm4JvmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows =
      (1 to 3).map(i => M.MediaRow(i.toLong, "image/png",
        M.SyntheticMedia.gradientPng(16 + i, 8 + i))) ++
      (4 to 6).map(i => M.MediaRow(i.toLong, "audio/wav",
        M.SyntheticMedia.sinePcmWav(240 * (i - 3))))
    M.mediaStats(rows.toDS(), M.JvmCodecs)
      .select(col("media_id"), col("mime"), col("width"), col("height"),
        col("n_frames"), col("duration_ms"),
        (floor(col("mean_level") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("mean_level"))
      .orderBy(col("media_id"))
  }

  /** MM5: COMMITTED media fixtures through the real codec seam — mm4's
    * payloads are generated in-process ([[graft.operators.Multimodal
    * .SyntheticMedia]]); this row decodes two binary files checked into
    * the repo (`src/main/resources/graft/media/fixture.{png,wav}`: a
    * 12×8 RGB PNG and a 333-sample 8-bit 11025 Hz PCM WAV, a few hundred
    * bytes each), so the decode path is exercised on bytes NO in-process
    * generator produced. The oracle pins literal measured truth (raster
    * dims, PCM frame count, container-rate duration 333·1000/11025 = 30
    * ms integer, exact mean decoded luminance / mean unsigned sample) —
    * any bit-rot in the committed artifacts or drift in the codec seam
    * breaks the hash.
    */
  def mm5CommittedMediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/media/$name")
      require(in != null, s"missing committed media fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val rows = Seq(
      M.MediaRow(1L, "image/png", res("fixture.png")),
      M.MediaRow(2L, "audio/wav", res("fixture.wav")))
    M.mediaStats(rows.toDS(), M.JvmCodecs)
      .select(col("media_id"), col("mime"), col("width"), col("height"),
        col("n_frames"), col("duration_ms"),
        (floor(col("mean_level") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("mean_level"))
      .orderBy(col("media_id"))
  }

  /** MM6: PERCEPTUAL image near-dup — the multimodal member of the dedup
    * family (exact/MinHash/SimHash/embedding dedup cover text; this
    * covers rasters). Each document carries a REAL PNG (planted: gradient
    * slope pair set by `doc_id % 23` — the image's structure — plus a
    * per-doc brightness offset `doc_id % 3`, the perturbation dHash is
    * built to shrug off), decoded with the pure-JDK codec seam and hashed
    * with [[graft.operators.Multimodal.dHash64]] (exact-integer 9×8
    * difference hash). Probed ground truth of the 69 distinct rasters:
    * within-class Hamming ≤ 4, cross-class ≥ 14 — cleanly split by the
    * radius-7 verify, at which the 8-byte banding is LOSSLESS by
    * pigeonhole.
    *
    * 100 TB lens — collapse multiplicity BEFORE the quadratic step: ids
    * group per distinct hash first (template-heavy corpora have millions
    * of copies per hash; same-hash pairs are ARITHMETIC, `C(n,2)`), and
    * only DISTINCT hashes enter the banded candidate join (hot-bucket
    * guarded like the text LSH family), with near-pair counts as
    * `n_a·n_b` products. The per-id pair emitter ([[graft.operators
    * .Multimodal.dHashNearDup]], spec-proven in JvmCodecSpec) stays the
    * API for sampled inspection; this row is the counting shape that
    * survives 2e9 images. The oracle replays the planted truth in closed
    * form: every within-class pair and nothing else, `C(n_c, 2)` per
    * residue class.
    */
  /** MM7: PERCEPTUAL audio near-dup — the AUDIO member of the dedup
    * family, completing mm6's raster story across both committed-codec
    * modalities. Each document carries a REAL WAV (planted:
    * [[graft.operators.Multimodal.SyntheticMedia.envelopeWav]] — the
    * amplitude-envelope SAWTOOTH rotation is set by `doc_id % 8`, the
    * recording's structure, while `doc_id % 3` picks a gain the
    * energy-envelope hash is invariant to BY CONSTRUCTION: scaling
    * preserves every window-energy ordering). Decoded through
    * `javax.sound.sampled` and hashed with
    * [[graft.operators.Multimodal.audioHash64]] (65-window exact-integer
    * energy dHash). Ground truth is CLOSED FORM, not probed: any two of
    * the 8 sawtooth rotations differ in exactly 16 of 64 comparison
    * bits (wrap positions are disjoint mod 8), so cross-class Hamming is
    * 16 ≫ the radius-7 verify, and within-class variants hash equal.
    *
    * 100 TB lens: identical counting shape to mm6 — multiplicities
    * collapse per distinct hash BEFORE the quadratic step (`C(n,2)`
    * arithmetic for same-hash pairs, `n_a·n_b` products over the ≤24
    * distinct hashes in the guarded banded join). The per-id emitter
    * ([[graft.operators.Multimodal.audioNearDup]], spec-proven) stays
    * the API for sampled inspection. The oracle replays the planted
    * classes in closed form.
    */
  def mm7AudioNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          graft.operators.Multimodal.MediaRow(id, "audio/wav",
            graft.operators.Multimodal.SyntheticMedia.envelopeWav(
              1300, (id % 8).toInt, 65 + 15 * (id % 3).toInt))
        }
      }
    val sigs = M.audioHashDF(media)
      .select(col("id"), col("ahash"), (col("id") % 8).as("audio_class"))
    val byHash = sigs.groupBy(col("ahash"), col("audio_class"))
      .agg(count(lit(1)).as("__n"))
    val samePairs = byHash.groupBy(col("audio_class"))
      .agg(sum((col("__n") * (col("__n") - lit(1L)) / lit(2)).cast("long"))
        .as("__p_same"))
    val blocked = byHash.select(col("ahash"), col("audio_class"), col("__n"),
      explode(array((0 until 8).map { q =>
        struct(lit(q).as("q"),
          shiftright(col("ahash"), q * 8).bitwiseAND(lit(0xFFL)).as("part"))
      }: _*)).as("blk"))
      .select(col("ahash"), col("audio_class"), col("__n"),
        col("blk.q"), col("blk.part"))
    val nearPairs = graft.operators.Dedup.boundedBucketPairs(
        blocked, "ahash", Seq("q", "part"), Seq("audio_class", "__n"),
        graft.operators.Dedup.DefaultMaxBucket,
        graft.operators.Dedup.DefaultRepFactor)
      .distinct()
      .where(graft.operators.Dedup.hamming64(
        col("id_a"), col("id_b")) <= 7)
      .groupBy(col("audio_class_a").as("audio_class"))
      .agg(sum(col("__n_a") * col("__n_b")).as("__p_near"))
    val docs = t(s, dir, "documents")
      .groupBy((col("doc_id") % 8).as("audio_class"))
      .agg(count(lit(1)).as("n_docs"))
    docs.join(samePairs, Seq("audio_class"), "left")
      .join(nearPairs, Seq("audio_class"), "left")
      .select(col("audio_class"), col("n_docs"),
        (coalesce(col("__p_same"), lit(0L)) +
          coalesce(col("__p_near"), lit(0L))).as("n_pairs"))
      .orderBy(col("audio_class"))
  }

  def mm6DHashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    // fully-qualified module access inside the closure: a captured local
    // alias would drag the (non-serializable) Multimodal object along
    val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val cls = (id % 23).toInt
          graft.operators.Multimodal.MediaRow(id, "image/png",
            graft.operators.Multimodal.SyntheticMedia.gradientPng(
              27, 16, 40 + 9 * cls, 23 + 11 * cls, (id % 3).toInt))
        }
      }
    val sigs = M.imageDHash(media)
      .select(col("id"), col("dhash"), (col("id") % 23).as("img_class"))
    val byHash = sigs.groupBy(col("dhash"), col("img_class"))
      .agg(count(lit(1)).as("__n"))
    val samePairs = byHash.groupBy(col("img_class"))
      .agg(sum((col("__n") * (col("__n") - lit(1L)) / lit(2)).cast("long"))
        .as("__p_same"))
    // banded candidate join over DISTINCT hashes only (≤ 69 here; bounded
    // by template diversity, not corpus size, at scale)
    val blocked = byHash.select(col("dhash"), col("img_class"), col("__n"),
      explode(array((0 until 8).map { q =>
        struct(lit(q).as("q"),
          shiftright(col("dhash"), q * 8).bitwiseAND(lit(0xFFL)).as("part"))
      }: _*)).as("blk"))
      .select(col("dhash"), col("img_class"), col("__n"),
        col("blk.q"), col("blk.part"))
    val nearPairs = graft.operators.Dedup.boundedBucketPairs(
        blocked, "dhash", Seq("q", "part"), Seq("img_class", "__n"),
        graft.operators.Dedup.DefaultMaxBucket,
        graft.operators.Dedup.DefaultRepFactor)
      .distinct()
      // boundedBucketPairs names the pair keys id_a/id_b — here they ARE
      // the two distinct dhash values
      .where(graft.operators.Dedup.hamming64(
        col("id_a"), col("id_b")) <= 7)
      .groupBy(col("img_class_a").as("img_class"))
      .agg(sum(col("__n_a") * col("__n_b")).as("__p_near"))
    val docs = t(s, dir, "documents")
      .groupBy((col("doc_id") % 23).as("img_class"))
      .agg(count(lit(1)).as("n_docs"))
    docs.join(samePairs, Seq("img_class"), "left")
      .join(nearPairs, Seq("img_class"), "left")
      .select(col("img_class"), col("n_docs"),
        (coalesce(col("__p_same"), lit(0L)) +
          coalesce(col("__p_near"), lit(0L))).as("n_pairs"))
      .orderBy(col("img_class"))
  }

  /** P11C: sketch-merge across shards — the 100 TB fan-in story p11/p11b
    * imply but never exercise ACROSS A MATERIALIZED BOUNDARY: each of 8
    * hash shards aggregates its own Datasketches HLL partial
    * (`hll_sketch_agg`, binary), the partials are union-merged
    * (`hll_union_agg`) and estimated once — aggregate where the data
    * lives, ship KB sketches, never re-shuffle rows. Two gates ride the
    * p11 convention: the merged estimate lands within ±5% of exact, and —
    * the merge-correctness proof — the estimate is SHARD-COUNT INVARIANT:
    * union over 4 hash shards equals union over 8 exactly (dense HLL
    * registers max-merge, so any disjoint partition of the rows produces
    * the same merged register state; ShardsSpec extends this to 2/16 and
    * to a deliberately SKEWED shard map). Estimate-vs-single-sketch
    * equality is deliberately NOT claimed — a one-pass sketch may sit in
    * sparse mode while a union promotes to dense, a Datasketches mode
    * artifact the ±5% gate absorbs. The oracle pins the exact count and
    * both gates TRUE.
    */
  def p11cShardedSketchMerge(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), xxhash64(col("o_orderkey")).as("__h"))
    def merged(nShards: Int): DataFrame =
      o.groupBy(pmod(col("__h"), lit(nShards)).as("__shard"))
        .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("__sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
          .as(s"__est_$nShards"),
          count(lit(1)).as(s"__n_$nShards"))
    val exact = o.agg(countDistinct(col("o_custkey")).as("exact_custkeys"))
    exact.crossJoin(broadcast(merged(8))).crossJoin(broadcast(merged(4)))
      .select(col("exact_custkeys"), col("__n_8").as("n_shards"),
        (abs(col("__est_8").cast("double") -
          col("exact_custkeys").cast("double")) <=
          col("exact_custkeys").cast("double") * lit(0.05))
          .as("merged_within_5pct"),
        (col("__est_8") === col("__est_4")).as("merge_shard_invariant"))
  }

  /** Q4: order-priority checking — the TPC-H Q4 EXISTS shape: count
    * orders per priority in a quarter having at least one RETURNED line
    * (the schema carries no commit/receipt dates, so the exists predicate
    * is `l_returnflag = 'R'`; the PLAN shape — date-filtered orders
    * LEFT-SEMI-joined to a filtered lineitem projection, no duplication,
    * no distinct — is the point). At 100 TB the semi-join keeps the probe
    * side at one row per order regardless of line fan-out.
    */
  def q4PriorityExists(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1996-04-01 00:00:00"))
    val returned = t(s, dir, "lineitem")
      .where(col("l_returnflag") === "R").select(col("l_orderkey"))
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q7: volume shipping between two nations — TPC-H Q7: revenue by
    * (supplier nation, customer nation, ship year) for the NATION_10 ↔
    * NATION_12 pair, two years. One fact-fact join (lineitem⋈orders) plus
    * broadcast dims; per-row volume quantized 6dp and summed in
    * DECIMAL(38,0) (HUGEINT twin), the exact-sum convention.
    */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1998-01-01 00:00:00"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val su = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n1 = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").as("__ck"), col("n_name").as("cust_nation")))
    val vol = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      lit(1e6) + lit(0.5)).cast("decimal(38,0)")
    li.join(su, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("__sk"))
      .join(n2, col("c_nationkey") === col("__ck"))
      .where((col("supp_nation") === "NATION_10" &&
          col("cust_nation") === "NATION_12") ||
        (col("supp_nation") === "NATION_12" &&
          col("cust_nation") === "NATION_10"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg((sum(vol).cast("double") / lit(1e6)).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8: national market share — TPC-H Q8: per order year, NATION_3's
    * share of ECONOMY-part revenue sold to ASIA-region customers. Both
    * the conditional (nation) sum and the total accumulate exactly in
    * DECIMAL(38,0); the share is ONE double division of the two published
    * sums, 6dp-quantized — so the ratio is as portable as the sums.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part").where(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val nc = t(s, dir, "nation")
      .select(col("n_nationkey").as("__cnk"), col("n_regionkey"))
    val r = t(s, dir, "region").where(col("r_name") === "ASIA")
      .select(col("r_regionkey"))
    val su = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val ns = t(s, dir, "nation")
      .select(col("n_nationkey").as("__snk"), col("n_name").as("supp_nation"))
    val vol = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      lit(1e6) + lit(0.5)).cast("decimal(38,0)")
    val zero = lit(0L).cast("decimal(38,0)")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nc), col("c_nationkey") === col("__cnk"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("__snk"))
      .groupBy(col("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", vol).otherwise(zero))
          .cast("double") / lit(1e6)).as("nation_volume"),
        (sum(vol).cast("double") / lit(1e6)).as("total_volume"))
      .select(col("o_year"), col("nation_volume"), col("total_volume"),
        when(col("total_volume") > 0.0,
          floor(col("nation_volume") / col("total_volume") * lit(1e6) +
            lit(0.5)) / lit(1e6)).otherwise(lit(0.0)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** H2: link-graph extraction — the URL-frontier stage of a crawl
    * pipeline: every `href` of every anchor pulled from the planted-HTML
    * corpus ([[graft.operators.Html.hrefs]], map-only regex), exploded
    * and aggregated to `(href, n_pages, n_refs)` — distinct linking pages
    * and total reference count per target. The per-doc `/ref{id}` links
    * prove per-page uniqueness; the chrome links (`/`, `/about`, `/c`,
    * `/p`, `/t`, `/x`) aggregate across the whole corpus. One explode +
    * one map-side-combined groupBy — the 100 TB frontier-builder shape.
    */
  def h2LinkGraph(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.operators.Html.hrefs(
          plantedHtml(col("doc_id"), col("doc_id")))).as("href"))
      .groupBy(col("href"))
      .agg(countDistinct(col("doc_id")).as("n_pages"),
        count(lit(1)).as("n_refs"))
      .orderBy(col("href"))

  /** W8: quartile banding — `ntile(4)` over customers by account balance
    * within each market segment (total order `(c_acctbal, c_custkey)`, so
    * the banding is deterministic), then per-band population and exact
    * balance aggregates. ntile's equal-height bands are the piece the
    * quantile rows (c8/fe1) don't cover: RANK-defined bands, not
    * VALUE-defined fences.
    */
  def w8NtileBands(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        (sum(floor(col("c_acctbal") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_bal"))
      .orderBy(col("c_mktsegment"), col("quartile"))
  }

  /** SJ1: salted-join identity — [[graft.operators.SkewJoin.saltedJoin]]
    * (big side salted `factor` ways by a whole-row hash, dim side
    * replicated) must produce EXACTLY the plain join's relation: the
    * oracle computes the unsalted lineitem⋈part aggregate, so any row
    * duplicated, dropped or mis-salted by the rewrite flips the hash.
    * This is the manual skew weapon for the key AQE's skew-join can't
    * split (a single mega-key inside one task); the d6 guard covers the
    * self-join flavor, this covers the dimension-join flavor.
    */
  def sj1SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey"), col("l_quantity"))
    val p = t(s, dir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    graft.operators.SkewJoin.saltedJoin(li, p, "l_partkey", factor = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(floor(col("l_quantity") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_qty"))
      .orderBy(col("p_brand"))
  }

  /** HH1: heavy-hitter report ([[graft.operators.SkewJoin.keySkew]]) —
    * the top-20 hottest join keys of the fact table with exact counts and
    * 6dp shares: the diagnostic a 100 TB pipeline runs BEFORE a join to
    * decide between AQE, broadcast, and sj1-style salting. Deterministic
    * under ties (count desc, key asc — a total order).
    */
  def hh1HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val tot = li.agg(count(lit(1)).as("__tot"))
    graft.operators.SkewJoin.keySkew(li, "l_partkey", 20)
      .crossJoin(broadcast(tot))
      .select(col("l_partkey"), col("cnt"),
        (floor(col("cnt").cast("double") / col("__tot").cast("double") *
          lit(1e6) + lit(0.5)) / lit(1e6)).as("share"))
      .orderBy(col("cnt").desc, col("l_partkey"))
  }

  /** TH1: theta-sketch SET ALGEBRA across segments — the question the
    * HLL family (p11*) cannot answer: `|A ∩ B|` and `|A \ B|` of
    * distinct-user sets, here the click/signup segment overlap. Each
    * segment's sketch is built as 8 per-shard partials (shard = EVENT
    * hash, so every user is split across shards — the hard merge case)
    * and union-merged ([[graft.functions.ThetaSketch]]); intersection /
    * difference / union are then constant-space operations on two KB
    * sketches, vs the exact path's groupBy over every user. Below the
    * nominal-entries budget (4096 » the user domain at every SF and at
    * the 100× fixture, whose replication keeps the user key space) a
    * theta sketch retains EVERY distinct hash, so all five estimates are
    * EXACT and sharding/merge-order independent — the row gates on
    * `sketch_exact_mode` (the `isEstimationMode == false` witness) and
    * `sketch_matches_exact` (all five estimates equal their exact
    * twins, computed alongside with one groupBy). Estimation-mode
    * interval guarantees are statistical (95.4% per sketch), so the
    * lossy regime is spec-proven with fixed inputs (ShardsSpec), never
    * oracle-gated — the p11c/hh2 honesty convention.
    */
  def th1ThetaSegments(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ThetaSketch
    val k = 4096
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"),
      pmod(xxhash64(col("event_id")), lit(8)).as("__shard"))
    val sk = ev.groupBy(col("__shard"))
      .agg(
        ThetaSketch.sketchAgg(
          when(col("event_type") === "click", col("user_id")), k).as("__ck"),
        ThetaSketch.sketchAgg(
          when(col("event_type") === "signup", col("user_id")), k).as("__sk"))
      .agg(ThetaSketch.unionAgg(col("__ck"), k).as("ck"),
        ThetaSketch.unionAgg(col("__sk"), k).as("sk"))
      .select(
        floor(ThetaSketch.setEstimate(col("ck"), col("sk"), "union") +
          lit(0.5)).cast("long").as("__u_est"),
        floor(ThetaSketch.setEstimate(col("ck"), col("sk"), "intersect") +
          lit(0.5)).cast("long").as("__i_est"),
        floor(ThetaSketch.setEstimate(col("ck"), col("sk"), "anotb") +
          lit(0.5)).cast("long").as("__d_est"),
        floor(ThetaSketch.estimate(col("ck")) + lit(0.5)).cast("long")
          .as("__c_est"),
        floor(ThetaSketch.estimate(col("sk")) + lit(0.5)).cast("long")
          .as("__s_est"),
        (!ThetaSketch.isEstimation(col("ck")) &&
          !ThetaSketch.isEstimation(col("sk"))).as("__exact_mode"))
    val flags = ev.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("s"))
    val exact = flags.agg(
      sum(col("c")).cast("long").as("n_click_users"),
      sum(col("s")).cast("long").as("n_signup_users"),
      count(when(col("c") === 1 || col("s") === 1, 1)).as("n_any_users"),
      count(when(col("c") === 1 && col("s") === 1, 1)).as("n_both_users"),
      count(when(col("c") === 1 && col("s") === 0, 1))
        .as("n_click_only_users"))
    exact.crossJoin(broadcast(sk))
      .select(col("n_click_users"), col("n_signup_users"),
        col("n_any_users"), col("n_both_users"), col("n_click_only_users"),
        col("__exact_mode").as("sketch_exact_mode"),
        (col("__u_est") === col("n_any_users") &&
          col("__i_est") === col("n_both_users") &&
          col("__d_est") === col("n_click_only_users") &&
          col("__c_est") === col("n_click_users") &&
          col("__s_est") === col("n_signup_users"))
          .as("sketch_matches_exact"))
  }

  /** HH2: MERGEABLE frequent-items sketch heavy hitters — hh1's top-k
    * diagnostic in the shape that survives 100 TB / 2e9-key cardinality:
    * per-shard Datasketches `ItemsSketch` partials
    * ([[graft.functions.FreqSketch]], Misra-Gries family) built where the
    * data lives, union-merged once, frequent items read out with explicit
    * `[lower_bound, upper_bound]` error intervals — KB of sketch state per
    * shard instead of hh1's full `groupBy(key).count` shuffle.
    *
    * The key is the link-graph href (the h2 frontier): the one genuinely
    * heavy-tailed key in the corpus — 5 chrome links at ~15.8% share each
    * over a per-page-unique `/ref{id}` tail — so the sketch runs honestly
    * LOSSY (`maxMapSize = 64` « distinct hrefs; the tail is purged
    * constantly) and the published gates are exactly the ones the sketch
    * GUARANTEES for any sharding and merge order: (a) every true-top-5 key
    * appears in the NO_FALSE_NEGATIVES report — their 15.8% share is far
    * above the ~3.5/64 ≈ 5.5% retention bound, so this is a theorem, not
    * luck; (b) every reported item's interval brackets its exact count;
    * (c) the sketch really purged (`reported < distinct`, capped at
    * 0.75·maxMapSize = 48 entries). Rows are sharded by DOC hash, not by
    * key, so every heavy key is SPLIT across all 8 partials — the hard
    * merge case. Exact anchors (totals, top-1 href + count) ride the same
    * row so the oracle pins real values, not just TRUEs.
    */
  def hh2SketchHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.FreqSketch
    val refs = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.operators.Html.hrefs(
          plantedHtml(col("doc_id"), col("doc_id")))).as("href"))
    val exact = refs.groupBy(col("href")).agg(count(lit(1)).as("cnt"))
    val top5 = exact.orderBy(col("cnt").desc, col("href")).limit(5)
      .select(col("href"))
    val report = refs
      .groupBy(pmod(xxhash64(col("doc_id")), lit(8)).as("__shard"))
      .agg(FreqSketch.sketchAgg(col("href"), 64).as("__sk"))
      .agg(FreqSketch.mergeAgg(col("__sk"), 64).as("__sk"))
      .select(explode(FreqSketch.items(col("__sk"))).as("__r"))
      .select(col("__r.item").as("href"), col("__r.lower_bound"),
        col("__r.upper_bound"))
    val totals = refs.agg(count(lit(1)).as("total_refs"),
      countDistinct(col("href")).as("distinct_hrefs"))
    val top1 = exact.orderBy(col("cnt").desc, col("href")).limit(1)
      .select(col("href").as("top_href"), col("cnt").as("top_href_refs"))
    val covered = top5.join(report, Seq("href"), "left_semi")
      .agg((count(lit(1)) === 5L).as("true_top5_covered"))
    // never broadcast the corpus-sized exact table: semi-join it down to
    // the report's ≤0.75·maxMapSize hrefs first (broadcasting the tiny
    // report), THEN broadcast the shrunken exact side into the outer join
    // (an outer join can only broadcast its non-preserved side)
    val exactReported = exact.join(
      broadcast(report.select(col("href"))), Seq("href"), "left_semi")
    val gates = report.join(broadcast(exactReported), Seq("href"), "left")
      .agg(count(lit(1)).as("__n_reported"),
        (sum(when(col("cnt").isNotNull &&
          col("lower_bound") <= col("cnt") &&
          col("cnt") <= col("upper_bound"), 0L).otherwise(1L)) === 0L)
          .as("bounds_hold"))
    totals.crossJoin(broadcast(top1)).crossJoin(broadcast(covered))
      .crossJoin(broadcast(gates))
      .select(col("total_refs"), col("distinct_hrefs"),
        col("top_href"), col("top_href_refs"),
        col("true_top5_covered"), col("bounds_hold"),
        (col("__n_reported") < col("distinct_hrefs")).as("sketch_lossy"))
  }

  /** LP1: link-graph communities by min-label propagation — the crawl
    * question after h2 builds the frontier: which pages cluster together
    * once BOILERPLATE links are dropped? Chrome links (`/`, `/about`,
    * `/c`, `/p`, `/t`, `/x`) connect every page to every page — keeping
    * them collapses the web to one blob (GraphSpec proves exactly that),
    * so the community graph keeps only content links (`/ref<N>`). Pages
    * sharing a reference target land in one community: the bipartite
    * page↔target edge list (targets offset to 10^9 so the two id spaces
    * cannot collide) feeds [[graft.operators.Dedup.connectedComponents]]
    * — the deterministic integer min-label rule with a convergence
    * witness (the exact label-sum fixed point), so the final labels are
    * sharding- and iteration-order-independent: every page's community
    * IS the smallest page id reachable through shared references, which
    * the oracle replays in closed form (`min(doc_id) per doc_id % 97` —
    * the planted reference plan `/ref{doc_id % 97}` makes residue
    * classes the ground-truth communities).
    *
    * 100 TB lens: same min-label machinery as d7b (dedup components) —
    * one equi-join + map-side-combined min per round, self-loops instead
    * of a second merge join, decimal label-sum as the convergence probe;
    * rounds ∝ component diameter (2 here; the star topology of shared
    * targets), never corpus size.
    */
  def lp1LinkCommunities(s: SparkSession, dir: String): DataFrame = {
    val refs = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.operators.Html.hrefs(
          plantedHtml(col("doc_id"), col("doc_id") % 97))).as("href"))
      .where(col("href").rlike("^/ref[0-9]+$"))
    val edges = refs.select(col("doc_id").as("src"),
      (lit(1000000000L) + substring(col("href"), 5, 18).cast("long"))
        .as("dst"))
    graft.operators.Dedup.connectedComponents(edges, "src", "dst")
      .where(col("id") < 1000000000L) // keep page nodes, drop targets
      .groupBy(col("component").as("community"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
      .orderBy(col("community"))
  }

  /** ZIPF1: Zipf-law fit of the corpus term distribution — the classic
    * corpus-health check (natural text slopes ≈ −1; generated/templated
    * text diverges): OLS slope of `ln(freq)` on `ln(rank)` over the
    * top-100 terms. Both log coordinates are 6dp-quantized to integer
    * units, every OLS moment (Σx, Σy, Σxy, Σx²) accumulates EXACTLY in
    * DECIMAL(38,0) (DuckDB: HUGEINT), and the slope is one double
    * division of exact integers, 6dp — the lm1/bm25 convention extended
    * to regression. The rank window runs over the LIMITed ≤100-row
    * frame, never the vocabulary.
    */
  def zipf1ZipfSlope(s: SparkSession, dir: String): DataFrame = {
    val freq = t(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term")).limit(100)
    val w = Window.orderBy(col("freq").desc, col("term"))
    val xy = freq.withColumn("rank", row_number().over(w))
      .select(
        floor(log(col("rank").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("x"),
        floor(log(col("freq").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("y"))
    val dec = "decimal(38,0)"
    val m = xy.agg(count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"))
    m.select(col("n").cast("long").as("n_terms"),
      (floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
        lit(1e6) + lit(0.5)) / lit(1e6)).as("zipf_slope"))
  }

  /** Day-partitioned HLL shard sketches for p11d, written once per (JVM,
    * sfDir) — the durable "profile index": per-shard partials persisted
    * as parquet BINARY, so distinct-count questions are answerable later
    * without rescanning the fact table.
    */
  private val sketchMemo = scala.collection.mutable.Map[String, String]()
  private def sketchPath(s: SparkSession, dir: String): String =
    sketchMemo.synchronized {
      sketchMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_hll_shards_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "orders")
        buildCachedDir(path) { tmp =>
          t(s, dir, "orders")
            .groupBy(pmod(xxhash64(col("o_orderkey")), lit(8)).as("shard"))
            .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"))
            .write.mode("overwrite").parquet(tmp)
        }
      })
    }

  /** P11D: DURABLE sketch merge — p11c's fan-in with the partials
    * round-tripped through parquet storage: per-shard HLL sketches are
    * persisted as binary columns, RELOADED, union-merged, and the
    * estimate must (a) sit within ±5% of exact and (b) EQUAL the
    * all-in-memory merge bit-for-bit (`reload_invariant`) — the
    * "profile once, answer distinct-count questions forever without
    * rescanning 100 TB" contract, and the sketch member of the durable-
    * index family (nd2r/nd3r/s6r/tok1r).
    */
  def p11dDurableSketchMerge(s: SparkSession, dir: String): DataFrame = {
    val reloaded = s.read.parquet(sketchPath(s, dir))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("__reload_est"))
    val o = t(s, dir, "orders")
    val mem = o
      .groupBy(pmod(xxhash64(col("o_orderkey")), lit(8)).as("__shard"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("__sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
        .as("__mem_est"))
    o.agg(countDistinct(col("o_custkey")).as("exact_custkeys"))
      .crossJoin(broadcast(reloaded)).crossJoin(broadcast(mem))
      .select(col("exact_custkeys"),
        (abs(col("__reload_est").cast("double") -
          col("exact_custkeys").cast("double")) <=
          col("exact_custkeys").cast("double") * lit(0.05))
          .as("reload_within_5pct"),
        (col("__reload_est") === col("__mem_est")).as("reload_invariant"))
  }

  /** Durable HLL index built by a STREAM for p11e: the orders keys staged
    * as 8 files, drained by [[graft.streaming.EventStreams
    * .sketchIndexStream]] one file per micro-batch (checkpointed,
    * AvailableNow), each batch appending its own per-shard partials.
    * Staging + checkpoint are throwaway temp dirs; only the index is the
    * fixture.
    */
  private val streamSketchMemo = scala.collection.mutable.Map[String, String]()
  private def streamSketchPath(s: SparkSession, dir: String): String =
    streamSketchMemo.synchronized {
      streamSketchMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_stream_hll_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "orders")
        buildCachedDir(path) { tmp =>
          val stage = java.nio.file.Files
            .createTempDirectory("graft_stream_hll_stage").toString
          t(s, dir, "orders").select(col("o_custkey"))
            .repartition(8).write.parquet(s"$stage/src")
          val src = s.readStream
            .schema(s.read.parquet(s"$stage/src").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(s"$stage/src")
          graft.streaming.EventStreams.sketchIndexStream(
            src, "o_custkey", tmp, Some(s"$stage/ckpt"))
            .awaitTermination()
        }
      })
    }

  /** P11E: STREAMING durable sketch index — the streaming face of p11d.
    * A checkpointed file stream drains the orders keys one file per
    * micro-batch; each batch appends its own per-shard HLL partials to a
    * durable parquet index ([[graft.streaming.EventStreams
    * .sketchIndexStream]]); the question is then answered from the INDEX
    * alone (reload → `hll_union_agg` → estimate). Gates, restricted to
    * what HLL union GUARANTEES for batch-cut (key-overlapping) partials:
    * `replay_invariant` — union over the partials DUPLICATED equals the
    * single union (a duplicate sketch is a no-op at every step of the
    * merge, so at-least-once batch replay after a crash cannot change
    * the answer — the property that makes a naive append sink exactly
    * correct for sketches); `n_batches` — every staged file arrived as
    * its own micro-batch; `stream_within_5pct` vs the exact distinct.
    * NOT gated: estimate equality across different partial groupings —
    * unlike key-disjoint shard fan-ins, batch-cut partials repeat keys,
    * and the union's mode-transition path (sparse coupons → dense
    * registers) makes the readout grouping-sensitive by a few counts;
    * pinning it would be data-luck, not a theorem (the hh2/kll1
    * honesty convention). Kill-and-restart resumption is spec-proven in
    * StreamingSketchSpec.
    *
    * 100 TB lens: this is how a live corpus keeps its profile current —
    * per-epoch KB appends and a KB-scale merge at question time, instead
    * of a nightly full-table distinct over the stream's history.
    */
  def p11eStreamingSketchIndex(s: SparkSession, dir: String): DataFrame = {
    val idx = s.read.parquet(streamSketchPath(s, dir))
    val est = idx
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("__stream_est"),
        countDistinct(col("batch_id")).as("n_batches"))
    val twice = idx.unionAll(idx)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("__replay_est"))
    t(s, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("exact_custkeys"))
      .crossJoin(broadcast(est)).crossJoin(broadcast(twice))
      .select(col("exact_custkeys"), col("n_batches"),
        (abs(col("__stream_est").cast("double") -
          col("exact_custkeys").cast("double")) <=
          col("exact_custkeys").cast("double") * lit(0.05))
          .as("stream_within_5pct"),
        (col("__replay_est") === col("__stream_est"))
          .as("replay_invariant"))
  }

  /** KLL1: MERGEABLE quantile sketch — the quantile member completing the
    * sketch family (distinct: p11c/p11d HLL; top-k: hh2 frequent-items;
    * set algebra: th1 theta): per-shard Datasketches `KllDoublesSketch`
    * partials ([[graft.functions.KllSketch]], Karnin-Lang-Liberty
    * FOCS'16) built where the data lives, union-merged once, quantiles
    * read out at the coordinator — ~3k retained doubles per shard instead
    * of the global sort / driver-side `approxQuantile` (p12's shape) a
    * 100 TB column profile cannot afford.
    *
    * The sketch runs honestly LOSSY (k = 200 « n at every SF; the merge
    * compacts — witnessed in-row by `sketch_lossy`) and, because KLL
    * compaction is RANDOMIZED (coin-flip level halving), no estimate is
    * pinned by value. The gates are exactly what KLL GUARANTEES:
    * deterministic theorems — `getN` is the exact stream length,
    * min/max are exact stream extremes, every quantile estimate is an
    * actual stream value (`quantiles_in_stream`), estimates are monotone
    * in rank — plus the rank-error bound gated at TWICE the published
    * 99%-confidence ε(k) (a ≈5σ event to breach), in the atom-safe
    * two-sided form `count(v ≤ q̂)/n ≥ r − 2ε ∧ count(v < q̂)/n ≤ r + 2ε`
    * per probe rank. Rows shard by EVENT hash, so every shard sees the
    * full value range — the hard merge case. Exact anchors (count,
    * 6dp min/max) ride the row so the oracle pins real values.
    */
  def kll1QuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KllSketch
    val k = 200
    val ranks = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    val ev = t(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_id"), col("value").cast("double").as("v"))
    val qCols = ranks.zipWithIndex.map { case (r, i) =>
      KllSketch.quantile(col("__sk"), r).as(s"__q$i") }
    val merged = ev
      .groupBy(pmod(xxhash64(col("event_id")), lit(8)).as("__shard"))
      .agg(KllSketch.sketchAgg(col("v"), k).as("__sk"))
      .agg(KllSketch.mergeAgg(col("__sk"), k).as("__sk"))
      .select(KllSketch.summary(col("__sk")).as("__sm") +: qCols: _*)
      .withColumn("__mono", ranks.indices.sliding(2).map {
        case Seq(a, b) => col(s"__q$a") <= col(s"__q$b")
      }.reduce(_ && _))
    // one pass over the values against the broadcast 1-row sketch frame:
    // per probe rank, the two atom-safe rank counts and the in-stream
    // membership witness; first() carries the (constant) sketch readouts
    // through so the randomized sketch is evaluated exactly once
    val aggCols: Seq[Column] =
      Seq(count(lit(1)).as("__n"),
        min(col("v")).as("__minv"), max(col("v")).as("__maxv"),
        first(col("__sm")).as("__s"), first(col("__mono")).as("__m")) ++
      ranks.indices.flatMap { i => Seq(
        sum(when(col("v") <= col(s"__q$i"), 1L).otherwise(0L)).as(s"__le$i"),
        sum(when(col("v") < col(s"__q$i"), 1L).otherwise(0L)).as(s"__lt$i"),
        max(when(col("v") === col(s"__q$i"), 1L).otherwise(0L)).as(s"__in$i"))
      }
    val g = ev.crossJoin(broadcast(merged)).agg(aggCols.head, aggCols.tail: _*)
    val nD = col("__n").cast("double")
    val eps2 = lit(2.0) * col("__s.rank_error")
    g.select(
      col("__n").as("n_values"),
      (floor(col("__minv") * lit(1e6) + lit(0.5)) / lit(1e6)).as("min_value"),
      (floor(col("__maxv") * lit(1e6) + lit(0.5)) / lit(1e6)).as("max_value"),
      (col("__s.n") === col("__n")).as("sketch_n_exact"),
      (col("__s.min_item") === col("__minv") &&
        col("__s.max_item") === col("__maxv")).as("sketch_minmax_exact"),
      ranks.zipWithIndex.map { case (r, i) =>
        (col(s"__le$i").cast("double") >= (lit(r) - eps2) * nD) &&
          (col(s"__lt$i").cast("double") <= (lit(r) + eps2) * nD)
      }.reduce(_ && _).as("rank_bounds_hold"),
      ranks.indices.map(i => col(s"__in$i") === 1L).reduce(_ && _)
        .as("quantiles_in_stream"),
      col("__m").as("quantiles_monotone"),
      (col("__s.num_retained") < col("__s.n")).as("sketch_lossy"))
  }

  /** RS1: MERGEABLE uniform-sample (reservoir) sketch — the SAMPLE member
    * completing the sketch family (distinct: p11c/p11d HLL; top-k: hh2;
    * set algebra: th1; quantiles: kll1): per-shard Datasketches
    * `ReservoirLongsSketch` partials
    * ([[graft.functions.ReservoirSketch]], Vitter TOMS'85 + the
    * PODS'12 mergeable union) built where the data lives, union-merged
    * once — "give me k uniformly random rows of a 100 TB table" without
    * the global `ORDER BY rand() LIMIT k` sort.
    *
    * The sampled SET is random by construction, so no sample content is
    * pinned. The gates are reservoir THEOREMS, deterministic under any
    * sharding and merge order: `getN` counts the stream exactly (and is
    * invariant across 8-shard vs 4-shard fan-ins), the sample size is
    * exactly `min(n, k)`, every sampled value is an actual stream value
    * (broadcast the 64 samples back at the scan — never the reverse),
    * and over the duplicate-free orderkey stream the sample is
    * duplicate-free (sampling without replacement survives the union).
    * The nation table (25 rows « k) witnesses the EXACT regime: the
    * reservoir IS the stream, sorted-equal to the collected keys.
    * Exact anchors (both counts) ride the row so the oracle pins values.
    */
  def rs1ReservoirSample(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ReservoirSketch
    val k = 64
    val keys = t(s, dir, "orders").select(col("o_orderkey").as("key"))
    def merged(shards: Int) = keys
      .groupBy(pmod(xxhash64(col("key")), lit(shards)).as("__shard"))
      .agg(ReservoirSketch.sketchAgg(col("key"), k).as("__sk"))
      .agg(ReservoirSketch.mergeAgg(col("__sk"), k).as("__sk"))
    val m8 = merged(8).select(
      ReservoirSketch.n(col("__sk")).as("__n8"),
      ReservoirSketch.samples(col("__sk")).as("__samp"))
    val m4 = merged(4).select(ReservoirSketch.n(col("__sk")).as("__n4"))
    // containment scan: broadcast the <=k samples AT the orders scan (the
    // only direction that survives 100 TB) and count how many distinct
    // sample values the stream actually contains
    val hits = keys
      .join(broadcast(m8.select(explode(col("__samp")).as("__sv"))),
        col("key") === col("__sv"))
      .agg(countDistinct(col("__sv")).as("__hits"))
    // exact regime: 25 nation keys « k — the reservoir IS the stream
    val nat = t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("nk"))
    val exactReg = nat.agg(
      ReservoirSketch.samples(
        ReservoirSketch.sketchAgg(col("nk"), k)).as("__esamp"),
      sort_array(collect_list(col("nk"))).as("__ekeys"),
      count(lit(1)).as("n_nation"))
    keys.agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(m8)).crossJoin(broadcast(m4))
      .crossJoin(broadcast(hits)).crossJoin(broadcast(exactReg))
      .select(
        col("n_orders"), col("n_nation"),
        (col("__n8") === col("n_orders")).as("sketch_n_exact"),
        (col("__n4") === col("__n8")).as("shard_invariant_n"),
        (size(col("__samp")).cast("long") ===
          least(lit(k.toLong), col("n_orders"))).as("sample_size_min_n_k"),
        (col("__hits") === size(col("__samp")).cast("long"))
          .as("samples_in_stream"),
        (size(array_distinct(col("__samp"))) === size(col("__samp")))
          .as("sample_distinct"),
        (col("__esamp") === col("__ekeys")).as("exact_regime_match"))
  }

  /** VO1: MERGEABLE weighted-sample (VarOpt) sketch — the weighted twin
    * of rs1's uniform reservoir ([[graft.functions.VarOptSketch]], Cohen
    * et al. SODA'09): per-shard `VarOptItemsSketch` partials over
    * (partkey, quantity) pairs, union-merged once. Each retained item
    * carries an ADJUSTED weight making any subset-sum estimate unbiased
    * and variance-optimal — "how much token mass comes from domain X?"
    * from k rows instead of a full scan per question.
    *
    * Gates are VarOpt theorems (the rs1/kll1 honesty convention): exact
    * `n` (shard-count invariant), sample size exactly `min(n, k)`,
    * containment of sampled items in the stream's key domain (broadcast
    * the <=k items at the scan), and the SODA'09 zero-variance identity —
    * the sum of ALL adjusted weights equals the exact total stream weight
    * (gated at 1e-6 relative, ~10^3 x worst-case float-order drift;
    * l_quantity is integer-valued so the exact side is drift-free).
    * The nation table (weight = key+1, 25 rows « k) witnesses the exact
    * regime: samples == the stream with its ORIGINAL weights. Exact
    * anchors (count, 6dp weight total) ride the row.
    */
  def vo1VaroptSample(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VarOptSketch
    val k = 64
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("item"),
        col("l_quantity").cast("double").as("w"))
    def merged(shards: Int) = li
      .groupBy(pmod(xxhash64(col("item"), col("w")), lit(shards))
        .as("__shard"))
      .agg(VarOptSketch.sketchAgg(col("item"), col("w"), k).as("__sk"))
      .agg(VarOptSketch.mergeAgg(col("__sk"), k).as("__sk"))
    val m8 = merged(8).select(
      VarOptSketch.summary(col("__sk")).as("__sm"),
      VarOptSketch.samples(col("__sk")).as("__samp"))
    val m4 = merged(4).select(VarOptSketch.summary(col("__sk")).as("__sm4"))
    val sampleItems = m8.select(
      array_distinct(transform(col("__samp"), x => x.getField("item")))
        .as("__items"))
    val hits = li
      .join(broadcast(sampleItems.select(explode(col("__items"))
        .as("__sv"))), col("item") === col("__sv"))
      .agg(countDistinct(col("__sv")).as("__hits"))
    // exact regime: 25 nation keys, weight = key + 1 (positive)
    val nat = t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("nk"),
        (col("n_nationkey") + lit(1)).cast("double").as("nw"))
    val exactReg = nat.agg(
      VarOptSketch.samples(
        VarOptSketch.sketchAgg(col("nk"), col("nw"), k)).as("__esamp"),
      sort_array(collect_list(struct(col("nk").as("item"),
        col("nw").as("weight")))).as("__epairs"),
      count(lit(1)).as("n_nation"))
    val exact = li.agg(count(lit(1)).as("n_lineitem"),
      (sum(floor(col("w") * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
        .cast("double") / lit(1e6)).as("total_quantity"))
    exact
      .crossJoin(broadcast(m8)).crossJoin(broadcast(m4))
      .crossJoin(broadcast(hits)).crossJoin(broadcast(exactReg))
      .crossJoin(broadcast(sampleItems))
      .select(
        col("n_lineitem"), col("n_nation"), col("total_quantity"),
        (col("__sm.n") === col("n_lineitem")).as("sketch_n_exact"),
        (col("__sm4.n") === col("__sm.n")).as("shard_invariant_n"),
        (col("__sm.num_samples") ===
          least(lit(k.toLong), col("n_lineitem")))
          .as("sample_size_min_n_k"),
        (col("__hits") === size(col("__items")).cast("long"))
          .as("samples_in_stream"),
        (abs(col("__sm.total_weight") - col("total_quantity")) <=
          col("total_quantity") * lit(1e-6)).as("weight_sum_invariant"),
        (col("__esamp") === col("__epairs")).as("exact_regime_match"))
  }

  /** KLL2: GROUPED quantile sketches — the per-segment profile shape
    * ("p50/p95 per event type over 100 TB") that kll1's global sketch
    * doesn't cover: ONE `groupBy(event_type)` aggregation builds a KLL
    * partial per group (map-side combined like any agg — the state per
    * group is the ~KB sketch, never the values), then one broadcast
    * join-back probes every group's estimates against its own stream in
    * a single second pass. Gates are kll1's per-group: exact `getN` per
    * group, exact min/max per group, every quantile an actual value OF
    * ITS GROUP's stream, monotone in rank, and the 2ε(k) two-sided rank
    * bound per (group, rank) — with exact anchors (count, 6dp min/max)
    * pinned per group by the oracle.
    */
  def kll2GroupedQuantiles(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KllSketch
    val k = 200
    val ranks = Seq(0.25, 0.5, 0.75)
    val ev = t(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double").as("v"))
    val qCols = ranks.zipWithIndex.map { case (r, i) =>
      KllSketch.quantile(col("__sk"), r).as(s"__q$i") }
    val perGroup = ev.groupBy(col("event_type"))
      .agg(KllSketch.sketchAgg(col("v"), k).as("__sk"))
      .select(col("event_type") +:
        KllSketch.summary(col("__sk")).as("__sm") +: qCols: _*)
      .withColumn("__mono", ranks.indices.sliding(2).map {
        case Seq(a, b) => col(s"__q$a") <= col(s"__q$b")
      }.reduce(_ && _))
    val aggCols: Seq[Column] =
      Seq(count(lit(1)).as("__n"),
        min(col("v")).as("__minv"), max(col("v")).as("__maxv"),
        first(col("__sm")).as("__s"), first(col("__mono")).as("__m")) ++
      ranks.indices.flatMap { i => Seq(
        sum(when(col("v") <= col(s"__q$i"), 1L).otherwise(0L)).as(s"__le$i"),
        sum(when(col("v") < col(s"__q$i"), 1L).otherwise(0L)).as(s"__lt$i"),
        max(when(col("v") === col(s"__q$i"), 1L).otherwise(0L)).as(s"__in$i"))
      }
    val g = ev.join(broadcast(perGroup), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(aggCols.head, aggCols.tail: _*)
    val nD = col("__n").cast("double")
    val eps2 = lit(2.0) * col("__s.rank_error")
    g.select(
      col("event_type"),
      col("__n").as("n_values"),
      (floor(col("__minv") * lit(1e6) + lit(0.5)) / lit(1e6)).as("min_value"),
      (floor(col("__maxv") * lit(1e6) + lit(0.5)) / lit(1e6)).as("max_value"),
      (col("__s.n") === col("__n")).as("sketch_n_exact"),
      (col("__s.min_item") === col("__minv") &&
        col("__s.max_item") === col("__maxv")).as("sketch_minmax_exact"),
      ranks.zipWithIndex.map { case (r, i) =>
        (col(s"__le$i").cast("double") >= (lit(r) - eps2) * nD) &&
          (col(s"__lt$i").cast("double") <= (lit(r) + eps2) * nD)
      }.reduce(_ && _).as("rank_bounds_hold"),
      ranks.indices.map(i => col(s"__in$i") === 1L).reduce(_ && _)
        .as("quantiles_in_stream"),
      col("__m").as("quantiles_monotone"))
      .orderBy(col("event_type"))
  }

  /** W9: FORWARD as-of join ([[graft.operators.AsOfJoin.forward]], strict)
    * — each order picks up the same customer's NEXT order strictly after
    * it, plus the repurchase gap in days (NULL for the customer's last
    * order): the time-to-next-event analytic w4's backward join can't
    * express. Right side deduped per (customer, date) by max orderkey
    * (the w4 determinism convention); the oracle is DuckDB's native
    * `ASOF LEFT JOIN ... ON t < t'`.
    */
  def w9NextOrder(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val od = ord.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("r_orderkey"))
      .select(col("o_custkey").as("r_custkey"),
        col("o_orderdate").as("r_date"), col("r_orderkey"))
    graft.operators.AsOfJoin.forward(
        ord.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        od,
        leftKey = "o_custkey", rightKey = "r_custkey",
        leftTime = "o_orderdate", rightTime = "r_date",
        rightValues = Seq("r_orderkey", "r_date"), strict = true)
      .select(col("o_orderkey"), col("o_custkey"),
        col("asof_r_orderkey").as("next_orderkey"),
        datediff(col("asof_r_date").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("gap_days"))
      .orderBy(col("o_orderkey"))
  }

  /** TS3: seasonal (hour-of-day) baseline + anomaly count — the seasonal
    * face of an1's rolling anomaly: per (event type, hour-of-day), the
    * exact mean/std of `value` (the ab1 sufficient-sums chain:
    * DECIMAL(38,0) Σq/Σq², one IEEE finish each) and the count of events
    * deviating more than 3σ from their own seasonal cell. The anomaly
    * comparison runs on 6dp-QUANTIZED deviation vs 6dp-quantized 3σ, so
    * the admit decision is engine-stable. One grouped scan + one
    * broadcast join back — the 100 TB seasonal-profile shape.
    */
  def ts3SeasonalBaseline(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod"),
        col("value"))
    val qv = floor(col("value") * lit(1e6) + lit(0.5)).cast("decimal(19,0)")
    val g = ev.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_events"),
        sum(qv.cast("decimal(38,0)")).cast("double").as("__s"),
        sum((qv * qv).cast("decimal(38,0)")).cast("double").as("__ss"))
    val nD = col("n_events").cast("double")
    val base = g.select(col("event_type"), col("hod"), col("n_events"),
      (floor(col("__s") / nD / lit(1e6) * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("mean_value"),
      (floor(sqrt(
        when(col("n_events") >= 2,
          (nD * col("__ss") - col("__s") * col("__s")) /
            (nD * (nD - lit(1.0))) / lit(1e12)).otherwise(lit(0.0))) *
        lit(1e6) + lit(0.5)) / lit(1e6)).as("std_value"))
    val anomalies = ev.join(broadcast(base), Seq("event_type", "hod"))
      .where(floor(abs(col("value") - col("mean_value")) * lit(1e6) +
        lit(0.5)) >
        floor(col("std_value") * lit(3.0) * lit(1e6) + lit(0.5)))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_anomalies"))
    base.join(anomalies, Seq("event_type", "hod"), "left")
      .select(col("event_type"), col("hod"), col("n_events"),
        col("mean_value"), col("std_value"),
        coalesce(col("n_anomalies"), lit(0L)).as("n_anomalies"))
      .orderBy(col("event_type"), col("hod"))
  }

  /** T10: control-character scrub — crawl stage-0 hygiene h1 doesn't
    * cover: C0 controls (except tab/newline/CR, which are legitimate
    * whitespace) and DEL stripped, with a per-doc count. The fixture
    * plants SOH/BEL/DEL bytes on id-derived rows (built with `chr()` in
    * the oracle). Map-only, one character-class regex in the Java∩RE2
    * subset (`\\x` escapes, interpreted by each engine's own regex
    * compiler — no raw control bytes in source or SQL).
    */
  def t10ControlScrub(s: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      when(col("doc_id") % 4 === 0, lit("\u0001x")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("\u0007\u007f")).otherwise(lit("")))
    val ctrl = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
    t(s, dir, "documents")
      .select(col("doc_id"), planted.as("__raw"))
      .select(col("doc_id"),
        (length(col("__raw")) -
          length(regexp_replace(col("__raw"), ctrl, ""))).cast("long")
          .as("n_ctrl"),
        regexp_replace(col("__raw"), ctrl, "").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** DQ2: functional-dependency audit — does `lang → source` hold in the
    * documents table: per lang, row count, distinct source count, and the
    * FD verdict — the profiling input to schema-normalization and
    * dedup-key decisions (a violated FD means the column pair can't key a
    * dimension). One map-side-combined aggregate.
    */
  def dq2FdAudit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("source")).as("n_sources"))
      .select(col("lang"), col("n_rows"), col("n_sources"),
        (col("n_sources") <= 1).as("fd_holds"))
      .orderBy(col("lang"))

  /** Q13: customer order-count distribution — TPC-H Q13: LEFT OUTER join
    * customers to their (non-URGENT) orders, count per customer
    * (zero-order customers kept by the outer join), then the SECOND
    * aggregation over the counts — the double-aggregation "distribution"
    * shape. At 100 TB the first aggregate is the only fact-sized shuffle;
    * the second runs on customer-cardinality rows.
    */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"))
    val o = t(s, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15: top supplier(s) by quarter revenue — TPC-H Q15: exact revenue
    * per supplier over a ship-date quarter, keep every supplier tied at
    * the maximum. The max is a 1-row broadcast aggregate over the
    * supplier-sized revenue view (never a window over the fact table),
    * and "ties all kept" is exact because revenue is an integer-quantized
    * DECIMAL sum — no epsilon games.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val vol = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      lit(1e6) + lit(0.5)).cast("decimal(38,0)")
    val rev = t(s, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(sum(vol).as("__rev"))
    val mx = rev.agg(max(col("__rev")).as("__mx"))
    rev.crossJoin(broadcast(mx)).where(col("__rev") === col("__mx"))
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("__rev").cast("double") / lit(1e6)).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q22: sleeping rich customers — TPC-H Q22: customers whose balance
    * beats the global positive-balance average (scalar-subquery
    * broadcast) and who placed no RECENT orders (anti-join against the
    * date-filtered order stream — the TPC-H "in 7 years" form, here
    * since 2000), grouped by a
    * 2-digit "country code" segment of the key. Three classic shapes in
    * one row: scalar aggregate broadcast, anti-join, grouped finish; the
    * balance average is compared on 6dp-quantized values so the admit
    * decision is engine-stable.
    */
  def q22SleepingCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        (col("c_custkey") % 100).cast("long").as("cntry"))
    val avgBal = c.where(col("c_acctbal") > 0.0)
      .agg((floor(
        sum(floor(col("c_acctbal") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") /
          count(lit(1)).cast("double") / lit(1e6) * lit(1e6) + lit(0.5)) /
        lit(1e6)).as("__avg"))
    val o = t(s, dir, "orders")
      .where(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .where(floor(col("c_acctbal") * lit(1e6) + lit(0.5)) >
        floor(col("__avg") * lit(1e6) + lit(0.5)))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntry"))
      .agg(count(lit(1)).as("numcust"),
        (sum(floor(col("c_acctbal") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("totacctbal"))
      .orderBy(col("cntry"))
  }

  /** Q19: disjunctive-predicate join — TPC-H Q19's shape: revenue over
    * lineitem⋈part where an OR of three (type, size-range,
    * quantity-range) conjunctions holds. The point is the PLAN: the
    * common `l_partkey = p_partkey` stays a single equi-join with the
    * disjunction as a post-join filter (and the per-branch part
    * predicates pushable to the dim scan) — not three unioned joins.
    */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val vol = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      lit(1e6) + lit(0.5)).cast("decimal(38,0)")
    val branch = (col("p_type") === "ECONOMY" &&
        col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
      (col("p_type") === "STANDARD" &&
        col("p_size").between(10, 30) && col("l_quantity").between(10, 35)) ||
      (col("p_type") === "PROMO" &&
        col("p_size").between(20, 50) && col("l_quantity").between(20, 50))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .where(branch)
      .agg(count(lit(1)).as("n_lines"),
        (sum(vol).cast("double") / lit(1e6)).as("revenue"))
  }

  /** C16: temporal referential audit — lineitems SHIPPED BEFORE their
    * order was placed, per line status: the cross-table consistency check
    * dq1's single-table rules can't see. The synthetic generator draws
    * ship dates independently of order dates, so the violations are REAL
    * (≈47% of lines at every SF) — the row pins exact counts and 6dp
    * rates, proving the audit counts precisely rather than existing
    * vacuously on clean data. One fact-fact equi-join + conditional
    * aggregate.
    */
  def c16TemporalAudit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"),
        sum((col("l_shipdate") < col("o_orderdate")).cast("long"))
          .as("n_violations"))
      .select(col("l_linestatus"), col("n_lines"), col("n_violations"),
        (floor(col("n_violations").cast("double") /
          col("n_lines").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("violation_rate"))
      .orderBy(col("l_linestatus"))
  }

  /** P20: categorical entropy profile — Shannon entropy (nats) of three
    * categorical columns across tables, beside row/distinct counts: the
    * information-content heuristic behind key selection, stratification
    * and drift baselines (a near-zero-entropy column can't stratify; a
    * near-log(k) one is uniform). Per-category terms `-p·ln p` are
    * 6dp-quantized to integer units and summed EXACTLY (the zipf1
    * log-convention: one ln per category, identical IEEE chain in the
    * oracle); each groupBy is map-side-combined and the entropy math
    * runs on category-cardinality rows.
    */
  def p20EntropyProfile(s: SparkSession, dir: String): DataFrame = {
    def ent(df: DataFrame, c: String, label: String): DataFrame = {
      val g = df.where(col(c).isNotNull).groupBy(col(c).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val tot = g.agg(sum(col("__c")).as("__n"),
        count(lit(1)).as("n_distinct"))
      val p = col("__c").cast("double") / col("__n").cast("double")
      g.crossJoin(broadcast(tot))
        .select(col("__n"), col("n_distinct"),
          floor(-(p * log(p)) * lit(1e6) + lit(0.5)).cast("long").as("__t"))
        .groupBy()
        .agg(min(col("__n")).as("n_rows"),
          min(col("n_distinct")).as("n_distinct"),
          (sum(col("__t")).cast("double") / lit(1e6)).as("entropy"))
        .select(lit(label).as("column_name"), col("n_rows"),
          col("n_distinct"), col("entropy"))
    }
    ent(t(s, dir, "events"), "event_type", "events.event_type")
      .unionAll(ent(t(s, dir, "orders"), "o_orderpriority",
        "orders.o_orderpriority"))
      .unionAll(ent(t(s, dir, "documents"), "lang", "documents.lang"))
      .orderBy(col("column_name"))
  }

  /** Incremental-manifest snapshot — the mc1 fixture: v1 adopts the 4
    * compacted files (checkpointInterval=4, ts stats stamped); v2–v6
    * append five copies of the 2024-01-26 day (ids offset 7..11·10^12)
    * as KB-scale commits — v4 lands on the checkpoint boundary and is
    * written FULL, the rest are add/remove deltas; v7 is the pp2-window
    * deleteRange. The table that proves commit bytes ∝ changed files.
    */
  private val incrSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def incrSnapPath(s: SparkSession, dir: String): String =
    incrSnapMemo.synchronized {
      incrSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_incr_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir),
            statsCols = Seq("ts"), checkpointInterval = 4)
          val d26 = t(s, dir, "events")
            .where(col("ts") >= ts("2024-01-26 00:00:00") &&
              col("ts") < ts("2024-01-27 00:00:00"))
          (0 until 5).foreach { i =>
            S.append(s, tmp, d26.withColumn("event_id",
              col("event_id") + lit((7L + i) * 1000000000000L)),
              "ts", blockSize = 16 * 1024)
          }
          S.deleteRange(s, tmp, "ts", tsWindowLoMicros, tsWindowHiMicros,
            blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** MC1: INCREMENTAL manifests + checkpoints — commit cost ∝ CHANGED
    * files, not table file count ([[graft.sources.Snapshots]] manifest
    * v2): between checkpoints a commit writes `#parent:` + add/remove
    * lines only; every 4th version (the fixture's interval) is full.
    * Three structural laws are verified IN the row, each falsifiable:
    * `chain_resolves` — an independent replay of the RAW manifest lines
    * (fold +/− from v1, never trusting the library's resolution)
    * reproduces `resolve(v)` for every version; `checkpoint_law` —
    * exactly v1 and v4 are full, v2/3/5/6/7 are deltas;
    * `bounded_commits` — every delta APPEND manifest carries exactly ONE
    * file-section line no matter how many files the table holds. The
    * final table is pinned against the closed-form oracle (events + 5×
    * the appended day − the deleted window; count + 6dp mass).
    *
    * 100 TB lens: at 10^6 files a full-list manifest is ~10^2 MB of
    * metadata PER KB-SCALE COMMIT and re-listing per operation —
    * the one cost in the design that grew with table size instead of
    * commit size. Delta manifests + periodic checkpoints are the Delta
    * log/checkpoint economics: O(changed) per commit, O(interval) reads
    * to resolve.
    */
  def mc1IncrementalManifest(s: SparkSession, dir: String): DataFrame = {
    val root = incrSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val latest = S.latestVersion(root)
    def raw(v: Int): Seq[String] =
      graft.sources.LakeFs.readString(s"$root/_manifests/v$v.txt")
        .split("\n").toSeq.filter(_.nonEmpty)
    var replay = Set.empty[String]
    var chainResolves = true
    var checkpointLaw = true
    var boundedCommits = true
    (1 to latest).foreach { v =>
      val lines = raw(v)
      val isDelta = lines.exists(_.startsWith("#parent:"))
      if (isDelta != (v != 1 && v % 4 != 0)) checkpointLaw = false
      val adds = lines.filter(_.startsWith("+"))
        .map(_.stripPrefix("+").split("\\|").head)
      val removes = lines.filter(_.startsWith("-")).map(_.stripPrefix("-"))
      if (!isDelta)
        replay = lines.filterNot(_.startsWith("#"))
          .map(_.split("\\|").head).toSet
      else replay = replay -- removes ++ adds
      if (S.resolve(root, v).toSet != replay) chainResolves = false
      if (isDelta && v >= 2 && v <= 6 && // the delta appends
          adds.size + removes.size != 1) boundedCommits = false
    }
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    S.read(s, root, latest)
      .agg(count(lit(1)).as("n_final"), mass.as("total_value"))
      .select(col("n_final"), col("total_value"),
        lit(latest.toLong).as("n_versions"),
        lit(chainResolves).as("chain_resolves"),
        lit(checkpointLaw).as("checkpoint_law"),
        lit(boundedCommits).as("bounded_commits"))
  }

  /** MS1: COMMIT-TIME manifest stats — zone planning and the read
    * fast-path with ZERO plan-time footer I/O ([[graft.sources
    * .Snapshots]] file-entry stats): the table is initialized fresh
    * inside the row (stats for `ts` stamped from ONE footer open per
    * file AT COMMIT), then a merge-on-read delete of the pp2 window
    * plans its zones, probes, and commits — while a thread-local footer
    * counter ([[graft.sources.Bucketing.footerReads]]) proves not one
    * parquet footer was re-opened (`plan_footer_free`), and the v2 read
    * fingerprints from the manifest the same way (`read_footer_free`).
    * Values are the mor1 closed form: complement count + 6dp mass, zero
    * window survivors, sidecar rows == window rows.
    *
    * 100 TB lens: footer-based planning re-opens 10^5–10^6 footers per
    * mutation — seconds-to-minutes of driver metadata I/O; production
    * formats stamp stats at commit so the planner reads ONE manifest.
    * This row is the falsifiable form of that property.
    */
  def ms1ManifestStats(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_ms1")
    val root = tmpRoot.toString + "/t"
    try {
    S.init(s, root, compactedEventsPath(s, dir), statsCols = Seq("ts"))
    val ctr = graft.sources.Bucketing.footerReads.get()
    val before = ctr.get()
    val r = S.deletePositions(s, root, "ts",
      tsWindowLoMicros, tsWindowHiMicros)
    val planFooterFree = ctr.get() == before
    val before2 = ctr.get()
    val v2 = S.read(s, root, 2)
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val inWindow = col("ts") >= ts("2024-01-10 00:00:00") &&
      col("ts") < ts("2024-01-13 00:00:00")
    val agg = v2.agg(count(lit(1)).as("n_v2"), mass.as("total_value_v2"),
      coalesce(sum(when(inWindow, 1L).otherwise(0L)), lit(0L))
        .as("n_window_v2")).collect().head
    val readFooterFree = ctr.get() == before2
    s.range(1).select(
      lit(agg.getLong(0)).as("n_v2"),
      lit(agg.getDouble(1)).as("total_value_v2"),
      lit(agg.getLong(2)).as("n_window_v2"),
      lit(r.markedPositions).as("n_dv_positions"),
      lit(planFooterFree).as("plan_footer_free"),
      lit(readFooterFree).as("read_footer_free"))
    } finally {
      // every gate is collected above — the fresh table (a full copy of
      // the compacted fixture) must not accumulate per-invocation in /tmp
      graft.sources.LakeFs.deleteRecursively(tmpRoot.toString)
      ()
    }
  }

  /** MC2: PARQUET manifest checkpoints — mc1's delta/checkpoint
    * economics with the last O(table-files) metadata cost removed
    * ([[graft.sources.Snapshots]] `#pqsec:` sections): above the
    * table's `pqsec` threshold (0 here, so every full manifest
    * externalizes) a checkpoint's file section is written as a PARQUET
    * side table and the manifest itself carries ONE pointer line, so
    * cold resolution loads entries as a DataFrame instead of parsing a
    * ~10^2 MB text blob on the driver, and every raw metadata read
    * (committedBatches, versionAsOf, history) stays KB-scale. Gates:
    * the full manifests (v1, v4 under interval 4) are pointer-only;
    * a HAND replay (parquet section + raw delta lines) equals
    * `resolve` at every version; vacuum reclaims the dropped versions'
    * sections (zero `pqsec_` dirs survive a keepFrom=latest cut) while
    * resolution through the materialized checkpoint stays exact.
    * Values: events + 3 appended 01-26 day copies − the deleted window
    * (count + 6dp mass) read AFTER the vacuum.
    *
    * 100 TB lens: Delta's checkpoints are parquet for exactly this —
    * at 10^6 stats-bearing entries a text checkpoint is ~10^2 MB per
    * cold resolve; a parquet section decodes distributed and
    * column-pruned while commits stay delta-sized.
    */
  def mc2ParquetCheckpoint(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_mc2")
    val root = tmpRoot.toString + "/t"
    try {
      S.init(s, root, compactedEventsPath(s, dir), statsCols = Seq("ts"),
        checkpointInterval = 4, pqSectionThreshold = 0)
      val d26 = t(s, dir, "events")
        .where(col("ts") >= ts("2024-01-26 00:00:00") &&
          col("ts") < ts("2024-01-27 00:00:00"))
      (1 to 3).foreach { i => // v2, v3 deltas; v4 a pqsec checkpoint
        S.append(s, root, d26.withColumn("event_id",
          col("event_id") + lit(i * 1000000000000L)), "ts",
          blockSize = 16 * 1024)
      }
      S.deleteRange(s, root, "ts", tsWindowLoMicros, tsWindowHiMicros,
        blockSize = 16 * 1024) // v5: delta off the pqsec checkpoint
      val latest = S.latestVersion(root)
      def raw(v: Int): Seq[String] =
        graft.sources.LakeFs.readString(s"$root/_manifests/v$v.txt")
          .split("\n").toSeq.filter(_.nonEmpty)
      def sectionNames(lines: Seq[String]): Set[String] =
        lines.find(_.startsWith("#pqsec:")) match {
          case Some(p) => s.read
            .parquet(s"$root/_manifests/${p.stripPrefix("#pqsec:")}")
            .select(col("entry")).collect()
            .map(_.getString(0).split("\\|").head).toSet
          case None => lines.filterNot(_.startsWith("#"))
            .map(_.split("\\|").head).toSet
        }
      var replay = Set.empty[String]
      var replayMatches = true
      var externalized = true
      (1 to latest).foreach { v =>
        val lines = raw(v)
        if (!lines.exists(_.startsWith("#parent:"))) {
          if (lines.count(_.startsWith("#pqsec:")) != 1 ||
              lines.exists(l => !l.startsWith("#"))) externalized = false
          replay = sectionNames(lines)
        } else replay = replay --
          lines.filter(_.startsWith("-")).map(_.stripPrefix("-")) ++
          lines.filter(_.startsWith("+"))
            .map(_.stripPrefix("+").split("\\|").head)
        if (S.resolve(root, v).toSet != replay) replayMatches = false
      }
      S.vacuum(root, keepFrom = latest, graceMs = 0L)
      val reclaimed = graft.sources.LakeFs
        .listDirNames(s"$root/_manifests")
        .count(_.startsWith("pqsec_")) == 0
      def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
        .cast("decimal(38,0)")).cast("double") / lit(1e6))
      val agg = S.read(s, root, latest)
        .agg(count(lit(1)).as("n"), mass.as("v")).collect().head
      s.range(1).select(
        lit(agg.getLong(0)).as("n_final"),
        lit(agg.getDouble(1)).as("total_value"),
        lit(latest.toLong).as("n_versions"),
        lit(externalized).as("pqsec_externalized"),
        lit(replayMatches).as("replay_matches"),
        lit(reclaimed).as("vacuum_reclaims"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(tmpRoot.toString)
      ()
    }
  }

  /** String-keyed snapshot — the pp8 fixture: documents under a derived
    * 26-char key `doc<id padded 10>_xxxxxxxxxxxx` (discriminating bytes
    * INSIDE the 16-byte truncation budget, constant tail beyond it — so
    * every stamped bound is TRUNCATED and pruning must rely on the
    * conservative prefix/prefix-successor law), range-sorted into 8
    * files and snapshot-initialized with commit-time `skey` stats.
    */
  private val strSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def strSnapPath(s: SparkSession, dir: String): String =
    strSnapMemo.synchronized {
      strSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_docs_strsnap_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "documents")
        buildCachedDir(path) { tmp =>
          val docs = t(s, dir, "documents")
            .withColumn("skey", concat(lit("doc"),
              lpad(col("doc_id").cast("string"), 10, "0"),
              lit("_xxxxxxxxxxxx")))
          graft.sources.Bucketing.writeRangeSorted(docs, "skey", 8,
            s"$tmp/src", 16 * 1024)
          graft.sources.Snapshots.init(s, s"$tmp/t", s"$tmp/src",
            statsCols = Seq("skey"))
          graft.sources.LakeFs.deleteRecursively(s"$tmp/src")
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** PP8: STRING zone pruning — [[graft.sources.Snapshots.readRangeStr]]
    * over truncated commit-time string bounds, the serving read for the
    * keys an LLM-data pipeline actually ranges on (doc ids, URLs,
    * categories) where numeric zones are blind. The fixture's keys are
    * LONGER than the 16-byte truncation budget with the discriminating
    * bytes inside it, so every file's stamped zone is a conservative
    * `[prefix, prefix-successor)` envelope — the row proves pruning
    * stays exact THROUGH truncation. Gates: every bound truncated
    * (`truncated_bounds` — the row exercises the hard case, not the
    * exact-fit one), the scan opened a strict subset of the version's
    * files, every opened file was zone-selected (selection recomputed
    * here with raw byte compares, independent of the library's
    * intersect), zero plan-time footer opens. Values: count + char mass
    * of ids 100..199 via the string range.
    *
    * 100 TB lens: Iceberg truncates string bounds to 16 bytes for the
    * same reason — full URLs/doc-ids would bloat manifests past
    * usefulness, and the prefix-successor upper bound keeps skipping
    * sound; without string zones, every range/point read on a string
    * key degenerates to a full-file-list scan.
    */
  def pp8StringZoneRead(s: SparkSession, dir: String): DataFrame = {
    val root = strSnapPath(s, dir) + "/t"
    val S = graft.sources.Snapshots
    val latest = S.latestVersion(root)
    val allFiles = S.resolve(root, latest)
    val lo = "doc" + "100".reverse.padTo(10, '0').reverse.mkString
    val hi = "doc" + "200".reverse.padTo(10, '0').reverse.mkString
    val m = S.manifest(root, latest)
    val truncated = m.entries.nonEmpty && m.entries.forall(e =>
      e.szones.get("skey").exists(z => !z.hiExact))
    val ctr = graft.sources.Bucketing.footerReads.get()
    val before = ctr.get()
    val pruned = S.readRangeStr(s, root, latest, "skey", lo, hi)
    val planFooterFree = ctr.get() == before
    val opened = graft.sources.Bucketing.filesRead(pruned)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    // the selection the truncated bounds imply, recomputed with raw
    // unsigned byte compares (independent of StrZone.intersects)
    val qLo = lo.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val qHi = hi.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val selected = m.entries.filter { e =>
      e.szones.get("skey") match {
        case Some(z) =>
          java.util.Arrays.compareUnsigned(z.hi, qLo) >= 0 &&
            java.util.Arrays.compareUnsigned(z.lo, qHi) < 0
        case None => true
      }
    }.map(_.name).toSet
    pruned.agg(count(lit(1)).as("n_in_range"),
        sum(col("n_chars")).as("chars_in_range"))
      .select(col("n_in_range"), col("chars_in_range"),
        lit(truncated).as("truncated_bounds"),
        lit(selected.nonEmpty && selected.size < allFiles.size)
          .as("strict_subset"),
        lit(opened.subsetOf(selected)).as("scan_within_selection"),
        lit(planFooterFree).as("plan_footer_free"))
  }

  /** Timestamp-travel snapshot — the tt2 fixture: v1 adopts the
    * compacted files; v2 appends the 2024-01-25 day (ids +3·10^12); v3
    * is the pp2-window deleteRange. Every manifest carries its `#ts:`
    * commit stamp (monotone by construction).
    */
  private val travelSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def travelSnapPath(s: SparkSession, dir: String): String =
    travelSnapMemo.synchronized {
      travelSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_travel_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir), statsCols = Seq("ts"))
          S.append(s, tmp, t(s, dir, "events")
            .where(col("ts") >= ts("2024-01-25 00:00:00") &&
              col("ts") < ts("2024-01-26 00:00:00"))
            .withColumn("event_id", col("event_id") + lit(3000000000000L)),
            "ts", blockSize = 16 * 1024)
          S.deleteRange(s, tmp, "ts", tsWindowLoMicros, tsWindowHiMicros,
            blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** TT2: TIMESTAMP time travel — `TIMESTAMP AS OF`, the other half of
    * the snapshot contract tt1's version travel began ([[graft.sources
    * .Snapshots.versionAsOf]]/[[readAsOf]]): every commit stamps a
    * monotone `#ts:` in its manifest, and an instant resolves to the
    * newest version at or before it. Gates: each version's own stamp
    * resolves to exactly that version; the instant 1 ms BEFORE a commit
    * resolves to its predecessor (stamps are strictly monotone, so this
    * is deterministic); far-future resolves to latest; pre-history
    * throws. Values: the reads AS OF v2's and v3's stamps are pinned
    * against closed forms (events + the appended day; then minus the
    * deleted window) — count + 6dp mass each.
    *
    * 100 TB lens: "read the table as it was at 02:00 before the bad
    * deploy" is the recovery/audit/reproducible-training query; version
    * numbers are internal, wall-clock is what incidents and compliance
    * speak.
    */
  def tt2TimestampTravel(s: SparkSession, dir: String): DataFrame = {
    val root = travelSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val tsv = (1 to 3).map(v => S.commitTimestamp(root, v).get)
    val boundary = (1 to 3).forall(v => S.versionAsOf(root, tsv(v - 1)) == v)
    val midGap = S.versionAsOf(root, tsv(1) - 1) == 1 &&
      S.versionAsOf(root, tsv(2) - 1) == 2
    val future = S.versionAsOf(root, tsv(2) + 3600000L) == 3
    val prehistory =
      try { S.versionAsOf(root, tsv(0) - 1); false }
      catch { case _: IllegalArgumentException => true }
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val a2 = S.readAsOf(s, root, tsv(1))
      .agg(count(lit(1)).as("n_asof_v2"), mass.as("value_asof_v2"))
    val a3 = S.readAsOf(s, root, tsv(2))
      .agg(count(lit(1)).as("n_asof_v3"), mass.as("value_asof_v3"))
    a2.crossJoin(broadcast(a3))
      .select(col("n_asof_v2"), col("value_asof_v2"),
        col("n_asof_v3"), col("value_asof_v3"),
        lit(boundary).as("boundary_exact"),
        lit(midGap).as("mid_gap_resolves_floor"),
        lit(future).as("future_resolves_latest"),
        lit(prehistory).as("prehistory_throws"))
  }

  /** Merge-on-read MERGE snapshot — the mor3 fixture: v1 adopts the
    * compacted files; v2 is an [[graft.sources.Snapshots
    * .upsertPositions]] of the up1 batch (2024-01-20 day bumped +1000
    * plus one shadow insert per row) — matched rows retract via ONE
    * position sidecar, the batch appends as fresh files, ZERO existing
    * files rewritten; v3 is the OPTIMIZE that folds the sidecar.
    */
  private val morUpsertSnapMemo =
    scala.collection.mutable.Map[String, String]()
  private[graft] def morUpsertSnapPath(s: SparkSession, dir: String): String =
    morUpsertSnapMemo.synchronized {
      morUpsertSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_morup_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir), statsCols = Seq("ts"))
          val win = t(s, dir, "events")
            .where(col("ts") >= ts("2024-01-20 00:00:00") &&
              col("ts") < ts("2024-01-21 00:00:00"))
          val updates = win.withColumn("value", col("value") + lit(1000.0))
            .unionByName(win.withColumn("event_id",
              col("event_id") + lit(1000000000000L)))
          S.upsertPositions(s, tmp, "event_id", "ts", updates,
            blockSize = 16 * 1024)
          S.optimize(s, tmp, "ts", 4, blockSize = 16 * 1024)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** MOR3: MERGE-ON-READ MERGE — the Iceberg-v2 upsert shape, closing
    * the MoR story mor1/mor2 began ([[graft.sources.Snapshots
    * .upsertPositions]]): the up1 MERGE replayed with a position-delete
    * sidecar for the matched rows + an append of the batch, so v2
    * references EVERY v1 file verbatim (gate: v1 ⊆ v2 — zero rewrite
    * I/O) plus the appended batch file, with exactly one live sidecar
    * whose row count equals the matched-window size. The v2 read is
    * pinned to the SAME closed form as the COW up1 twin (count, 6dp
    * mass, 2×window rows — the MoR and COW MERGEs are observationally
    * identical); v3 (OPTIMIZE) folds the sidecar and re-pins.
    *
    * 100 TB lens: a 10-row MERGE into 10 wide files rewrites 10 files
    * under COW but writes one KB sidecar + one KB append here — why
    * Iceberg v2 made position deletes the default MERGE mode for
    * high-churn tables.
    */
  def mor3MergeOnReadUpsert(s: SparkSession, dir: String): DataFrame = {
    val root = morUpsertSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val f1 = S.resolve(root, 1).toSet
    val f2 = S.resolve(root, 2).toSet
    val zeroRewrites = f1.subsetOf(f2)
    val dv2 = S.deleteSidecars(root, 2)
    val dvFolded = S.deleteSidecars(root, 3).isEmpty
    val nDv =
      if (dv2.isEmpty) 0L
      else graft.sources.Snapshots.dvRead(s, root, dv2).count()
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    val inWindow = col("ts") >= ts("2024-01-20 00:00:00") &&
      col("ts") < ts("2024-01-21 00:00:00")
    val a2 = S.read(s, root, 2).agg(count(lit(1)).as("n_v2"),
      mass.as("total_value_v2"),
      coalesce(sum(when(inWindow, 1L).otherwise(0L)), lit(0L))
        .as("n_window_v2"))
    val a3 = S.read(s, root, 3).agg(count(lit(1)).as("n_v3"),
      mass.as("total_value_v3"))
    a2.crossJoin(broadcast(a3))
      .select(col("n_v2"), col("total_value_v2"), col("n_window_v2"),
        col("n_v3"), col("total_value_v3"),
        lit(nDv).as("n_dv_positions"),
        lit(zeroRewrites).as("zero_rewrites"),
        lit(dv2.size == 1).as("dv_present"),
        lit(dvFolded).as("dv_folded"))
  }

  /** SQL1: the DataSourceV2 connector ([[graft.sources.v2
    * .GraftDataSource]]) — the engine's pruned reads surfaced where a
    * SQL user lives: `spark.read.format("graft")` over the mor3 fixture
    * AT VERSION 2 (live position-delete sidecar, appended update files),
    * registered as a temp view and queried with a plain SQL `WHERE` on
    * the 2024-01-20 day. Catalyst pushes the conjuncts into the scan,
    * which translates them to manifest zone selection BEFORE opening a
    * file; MoR sidecars apply inside the readers. Gates: the scan
    * PLANNED exactly the zone-selected files (pushdown really reached
    * the manifest — recomputed independently here), the executors
    * OPENED only those files (the pp6 ground-truth audit, executor-side
    * because `input_file_name` is empty on custom readers), and the
    * planned set is a strict subset of the version's files. Values: the
    * day slice of the MoR-merged table — matched rows re-imaged
    * (+1000), shadow inserts present, retracted originals absent —
    * count + 6dp mass, hash-matched against the closed form.
    *
    * 100 TB lens: an engine whose fast paths need bespoke APIs is not a
    * table format; Delta/Iceberg are DSv2 connectors precisely so SQL,
    * BI tools, and AQE drive manifest pruning without knowing any
    * library call. This row is that surface, gated falsifiably.
    */
  def sql1DsvPushdownRead(s: SparkSession, dir: String): DataFrame = {
    val root = morUpsertSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val audit = s"sql1-${java.util.UUID.randomUUID()}"
    val allFiles = S.resolve(root, 2)
    s.read.format("graft").option("path", root)
      .option("versionAsOf", "2").option("auditId", audit).load()
      .createOrReplaceTempView("graft_sql1_v")
    val agg = s.sql(
      """SELECT CAST(count(*) AS BIGINT) AS n_day,
        |  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)))
        |    AS DOUBLE) / 1e6 AS day_value
        |FROM graft_sql1_v
        |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-21 00:00:00'""".stripMargin)
      .collect().head
    val lo = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
      .getTime * 1000L
    val hi = java.sql.Timestamp.valueOf("2024-01-21 00:00:00")
      .getTime * 1000L
    // the selection the manifest zones imply, recomputed independently
    val selected = S.manifest(root, 2).entries.filter { e =>
      e.zones.get("ts") match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true
      }
    }.map(_.name).toSet
    val planned = graft.sources.v2.GraftScanAudit.planned
      .getOrElse(audit, Seq.empty).toSet
    val opened = graft.sources.v2.GraftScanAudit.opened(audit)
    graft.sources.v2.GraftScanAudit.clear(audit)
    s.range(1).select(
      lit(agg.getLong(0)).as("n_day"),
      lit(agg.getDouble(1)).as("day_value"),
      lit(planned == selected).as("planner_pruned"),
      lit(opened.subsetOf(selected)).as("scan_within_selection"),
      lit(selected.nonEmpty && selected.size < allFiles.size)
        .as("strict_subset"))
  }

  /** WR1: the DSv2 WRITE path ([[graft.sources.v2.GraftWrite]]) —
    * `df.write.format("graft").mode("append")` with the production
    * write split: EXECUTORS stream their partitions straight into the
    * table's file store (one parquet-mr writer per task, no scratch
    * copy, no driver data movement) and stamp each file's commit-time
    * stats from one write-time footer read; the DRIVER commit is
    * metadata-only OCC ([[graft.sources.Snapshots.commitAdopted]]).
    * `sortBy` declares an ordered distribution, so Catalyst
    * range-partitions + sorts BEFORE the writers run and
    * `targetFileCount` pins the file count — the writeRangeSorted
    * layout, expressed through the planner.
    *
    * Fixture: events split by event_id parity — evens seed v1 through
    * the Scala init; odds arrive through the DSv2 write (4 sorted
    * files). Gates: all 4 written entries carry complete stats
    * (rows/bytes/fp/zones) and their sort-column zones are DISJOINT
    * (the ordered distribution was real); a pruned DSv2 read of the
    * middle id range plans a strict subset of the files, opens only
    * planned files (executor audit), and opens ZERO footers (the ms1
    * law now holding for executor-stamped stats). Values: full-table
    * and range count + 6dp value mass, hash-matched to the raw events.
    *
    * 100 TB lens: a write path that funnels data through the driver —
    * or re-reads the table to stamp stats — caps ingest at one node's
    * bandwidth. Here N executors write N files concurrently, the only
    * serial step is one exclusive-create of a manifest delta, and a
    * 1000-executor append commits with the same O(changed-files)
    * metadata bytes as this fixture.
    */
  def wr1DsvWrite(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_wr1")
    val root = tmpRoot.toString + "/t"
    try {
      val ev = t(s, dir, "events")
      val even = ev.where(pmod(col("event_id"), lit(2)) === 0)
      val odd = ev.where(pmod(col("event_id"), lit(2)) === 1)
      graft.sources.Bucketing.writeRangeSorted(even, "event_id", 2,
        s"$tmpRoot/seed", 16 * 1024)
      S.init(s, root, s"$tmpRoot/seed", statsCols = Seq("event_id"))
      odd.write.format("graft").option("path", root)
        .option("sortBy", "event_id").option("targetFileCount", "4")
        .option("statsCols", "event_id")
        .mode("append").save()
      val m = S.manifest(root, 2)
      val newE = m.entries.filter(_.name.startsWith("w_"))
      val statsComplete = newE.size == 4 && newE.forall(e =>
        e.rows.nonEmpty && e.bytes.nonEmpty && e.fp.nonEmpty &&
          e.zones.contains("event_id"))
      val zs = newE.flatMap(_.zones.get("event_id")).sortBy(_._1)
      val zonesDisjoint = zs.size == 4 && zs.sliding(2).forall {
        case Seq((_, h), (l, _)) => h < l
        case _ => true
      }
      // range bounds from the id SPAN (min + span/4 .. min + span/2):
      // equals the count-quartiles on the contiguous testdata ids, and
      // stays non-empty under the stress fixture's offset id-spaces
      val ext = ev.agg(min(col("event_id")), max(col("event_id")))
        .collect().head
      val span = ext.getLong(1) - ext.getLong(0) + 1L
      val lo = ext.getLong(0) + span / 4
      val hi = ext.getLong(0) + span / 2
      def mass(c: Column) = coalesce(
        (sum(floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
          .cast("double") / lit(1e6)), lit(0.0))
      val ctr = graft.sources.Bucketing.footerReads.get()
      val before = ctr.get()
      val audit = s"wr1-${java.util.UUID.randomUUID()}"
      val r = s.read.format("graft").option("path", root)
        .option("auditId", audit).load()
        .where(col("event_id") >= lo && col("event_id") < hi)
        .agg(count(lit(1)).as("n"), mass(col("value")).as("v"))
        .collect().head
      val planFooterFree = ctr.get() == before
      val planned = graft.sources.v2.GraftScanAudit.planned
        .getOrElse(audit, Seq.empty).toSet
      val opened = graft.sources.v2.GraftScanAudit.opened(audit)
      graft.sources.v2.GraftScanAudit.clear(audit)
      val a = S.read(s, root, 2).agg(count(lit(1)).as("n"),
        mass(col("value")).as("v")).collect().head
      s.range(1).select(
        lit(a.getLong(0)).as("n_total"),
        lit(a.getDouble(1)).as("total_value"),
        lit(r.getLong(0)).as("n_range"),
        lit(r.getDouble(1)).as("range_value"),
        lit(statsComplete).as("stats_complete"),
        lit(zonesDisjoint).as("zones_disjoint"),
        lit(planFooterFree).as("plan_footer_free"),
        lit(planned.nonEmpty && planned.size < m.entries.size)
          .as("planner_pruned"),
        lit(opened.subsetOf(planned)).as("scan_within_plan"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(tmpRoot.toString)
      ()
    }
  }

  /** SS3: graft→graft NATIVE streaming replication — the ss2 source
    * composed with the DSv2 streaming SINK
    * ([[graft.sources.v2.GraftStreamingWrite]]):
    * `readStream.format("graft")` (change feed, one version per
    * micro-batch) feeds `writeStream.format("graft")` on a second
    * table, and each epoch commits under the (query id, epoch) pair as
    * ONE atomic manifest create (a `#txn:` high-water mark per query —
    * the Delta setTransaction shape) — data and idempotence marker
    * inseparable, exactly-once scoped to the query so a SECOND
    * query's epoch 0 on the same table is never a false replay.
    *
    * Fixture: events split 3 ways by event_id mod 3 — slice 0 seeds the
    * DESTINATION's v1, slices 1 and 2 are committed to a SOURCE table
    * as versions 1 and 2 and replicated across with
    * `maxVersionsPerBatch=1` (two epochs). Gates: the destination's
    * committed batch set contains epochs 0 and 1; a REPLAYED epoch 0
    * (the restart case) resolves to a skip
    * ([[graft.sources.Snapshots.commitAdopted]] returns None); every
    * streamed file carries complete executor-stamped stats. Values: the
    * destination must equal events EXACTLY (count + 6dp value mass) —
    * a sink that dropped, duplicated, or double-committed one batch
    * cannot reproduce them.
    *
    * 100 TB lens: CDC replication between tables is the backbone
    * topology of a training-data platform (bronze→silver→gold); with
    * both ends native, the ENGINE's checkpointing owns restart
    * semantics and the idempotent manifest commit makes the pipe
    * exactly-once end to end.
    */
  def ss3DsvStreamSink(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_ss3")
    val srcRoot = tmpRoot.toString + "/src"
    val dstRoot = tmpRoot.toString + "/dst"
    try {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("value"))
      def slice(r: Int) = ev.where(pmod(col("event_id"), lit(3)) === r)
      graft.sources.Bucketing.writeRangeSorted(slice(0), "event_id", 1,
        s"$tmpRoot/seed0", 16 * 1024)
      S.init(s, dstRoot, s"$tmpRoot/seed0", statsCols = Seq("event_id"))
      graft.sources.Bucketing.writeRangeSorted(slice(1), "event_id", 1,
        s"$tmpRoot/seed1", 16 * 1024)
      S.init(s, srcRoot, s"$tmpRoot/seed1", statsCols = Seq("event_id"))
      S.append(s, srcRoot, slice(2), "event_id") // source v2
      val q = s.readStream.format("graft")
        .option("path", srcRoot).option("changeFeed", "true")
        .option("maxVersionsPerBatch", "1").load()
        .where(col("_graft_side") === "add")
        .select(col("event_id"), col("ts"), col("value"))
        .writeStream.format("graft")
        .option("path", dstRoot)
        .option("checkpointLocation", s"$tmpRoot/ck")
        .option("statsCols", "event_id")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val qid = q.id.toString
      q.awaitTermination()
      // exactly-once state is the QUERY's #txn: high-water mark (scoped
      // to its id — a second query's epoch 0 is never a false replay)
      val txnMark = S.manifest(dstRoot, S.latestVersion(dstRoot))
        .txnVersion(qid)
      val committed = txnMark.exists(_ >= 1L)
      // the restart case: an epoch re-commit must resolve to a SKIP
      val replaySkipped = S.commitAdopted(dstRoot,
        Seq(S.FileEntry("replay_marker.parquet")),
        batchId = Some(1L), txnApp = Some(qid)).isEmpty
      val mDst = S.manifest(dstRoot, S.latestVersion(dstRoot))
      val streamed = mDst.entries.filter(_.name.startsWith("w_"))
      val statsComplete = streamed.nonEmpty && streamed.forall(e =>
        e.rows.nonEmpty && e.bytes.nonEmpty && e.fp.nonEmpty &&
          e.zones.contains("event_id"))
      def mass(c: Column) = (sum(floor(c * lit(1e6) + lit(0.5))
        .cast("decimal(38,0)")).cast("double") / lit(1e6))
      val a = S.read(s, dstRoot, S.latestVersion(dstRoot))
        .agg(count(lit(1)).as("n"), mass(col("value")).as("v"))
        .collect().head
      s.range(1).select(
        lit(a.getLong(0)).as("n_total"),
        lit(a.getDouble(1)).as("total_value"),
        lit(committed).as("batches_exactly_once"),
        lit(replaySkipped).as("replay_skipped"),
        lit(statsComplete).as("stream_stats_complete"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(tmpRoot.toString)
      ()
    }
  }

  /** SQL2: the V2 CATALOG ([[graft.sources.v2.GraftCatalog]]) — the
    * whole table lifecycle in SQL, zero library calls: CREATE NAMESPACE
    * / CREATE TABLE (the `stats` TBLPROPERTY persisting default zone
    * columns) / two INSERT INTOs (DSv2 executor writes, metadata-only
    * commits) / SELECTs with `VERSION AS OF` + `TIMESTAMP AS OF`
    * resolving through the manifest history / a filterless
    * COUNT-MIN-MAX answered by the COMPLETE aggregate pushdown
    * ([[graft.sources.v2.GraftMetadataAggScan]], zero files) / a WHERE
    * range pruned to the first insert's files by manifest zones.
    *
    * Gates: `agg_metadata_only` — the executed plan IS the metadata
    * scan; `ts_travel_matches` — TIMESTAMP AS OF v2's commit stamp
    * equals VERSION AS OF 2; `scan_pruned` — the ranged WHERE opened a
    * strict subset of the table's live files (executor audit via the
    * catalog's audit hook). Values (counts, extremes, 6dp value mass,
    * half/quartile slices) hash-match the raw events closed form.
    *
    * 100 TB lens: a data platform's users see CATALOG names, not paths
    * — `g.lake.events VERSION AS OF 3` is how BI tools, SQL notebooks,
    * and governance address a table. This row proves the whole surface
    * resolves through one metadata layer with the same pruning/stats
    * economics as the library calls.
    */
  def sql2CatalogSql(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft_sql2")
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      val audit = s"sql2-$cat"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      s.conf.set(s"spark.sql.catalog.$cat.auditId", audit)
      s.sql(s"CREATE NAMESPACE $cat.lake")
      s.sql(s"""CREATE TABLE $cat.lake.ev
               |(event_id BIGINT, ts TIMESTAMP, value DOUBLE)
               |USING graft TBLPROPERTIES ('stats'='event_id')"""
        .stripMargin)
      t(s, dir, "events").select(col("event_id"), col("ts"), col("value"))
        .createOrReplaceTempView("graft_sql2_src")
      val n = t(s, dir, "events").count()
      val (half, quarter) = (n / 2, n / 4)
      s.sql(s"""INSERT INTO $cat.lake.ev
               |SELECT * FROM graft_sql2_src WHERE event_id < $half"""
        .stripMargin) // v2
      s.sql(s"""INSERT INTO $cat.lake.ev
               |SELECT * FROM graft_sql2_src WHERE event_id >= $half"""
        .stripMargin) // v3
      val root = s"${wh.toString}/lake/ev"
      val aggDf = s.sql(s"""SELECT CAST(count(*) AS BIGINT) AS n_total,
        |min(event_id) AS min_id, max(event_id) AS max_id
        |FROM $cat.lake.ev""".stripMargin)
      val aggMeta = aggDf.queryExecution.executedPlan.toString
        .contains("GraftMetadataAggScan")
      val agg = aggDf.collect().head
      val tv = s.sql(s"""SELECT CAST(sum(CAST(floor(value * 1e6 + 0.5)
        |AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS tv FROM $cat.lake.ev"""
        .stripMargin).head().getDouble(0)
      val nV2 = s.sql(s"SELECT count(*) FROM $cat.lake.ev VERSION AS OF 2")
        .head().getLong(0)
      val ts2 = new java.sql.Timestamp(S.commitTimestamp(root, 2).get)
      val nTs = s.sql(s"SELECT count(*) FROM $cat.lake.ev " +
        s"TIMESTAMP AS OF '$ts2'").head().getLong(0)
      graft.sources.v2.GraftScanAudit.clear(audit)
      val nRange = s.sql(s"""SELECT count(*) FROM $cat.lake.ev
        |WHERE event_id >= $quarter AND event_id < $half""".stripMargin)
        .head().getLong(0)
      val opened = graft.sources.v2.GraftScanAudit.opened(audit)
      graft.sources.v2.GraftScanAudit.clear(audit)
      val live = S.manifest(root, S.latestVersion(root)).entries
        .count(_.rows.exists(_ > 0L))
      s.range(1).select(
        lit(agg.getLong(0)).as("n_total"),
        lit(agg.getLong(1)).as("min_id"),
        lit(agg.getLong(2)).as("max_id"),
        lit(tv).as("total_value"),
        lit(nV2).as("n_first_half"),
        lit(nRange).as("n_range"),
        lit(aggMeta).as("agg_metadata_only"),
        lit(nTs == nV2).as("ts_travel_matches"),
        lit(opened.nonEmpty && opened.size < live).as("scan_pruned"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** SQL3: table MAINTENANCE via SQL CALL procedures
    * ([[graft.sources.v2.GraftProcedures]], the connector Procedure
    * API — Iceberg's `CALL catalog.system.rewrite_data_files` shape):
    * after four quarter-span INSERTs fragment the table,
    * `CALL g.system.optimize` compacts the latest version to 2
    * range-sorted files, `CALL g.system.zorder` relayouts on
    * (user_id, event_id) stamping TWO-dimension commit-time stats, and
    * `CALL g.system.vacuum` drops the pre-optimize history and
    * reclaims its unreferenced store files — every step returning its
    * outcome as a row the query asserts on. Gates: post-optimize file
    * count == 2; every z-ordered file carries both zone columns;
    * vacuum dropped manifests AND reclaimed files; time travel below
    * the retention floor now fails; data identical through all three
    * (count + 6dp value mass vs raw events).
    *
    * 100 TB lens: compaction/relayout/retention are the jobs a
    * scheduler owns, and schedulers speak SQL — maintenance that needs
    * library code is maintenance that doesn't run. The procedures
    * return rows precisely so orchestration can gate on outcomes.
    */
  def sql3SqlMaintenance(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft_sql3")
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      s.sql(s"CREATE NAMESPACE $cat.lake")
      s.sql(s"""CREATE TABLE $cat.lake.ev
               |(event_id BIGINT, user_id BIGINT, value DOUBLE)
               |USING graft TBLPROPERTIES ('stats'='event_id')"""
        .stripMargin)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
        .createOrReplaceTempView("graft_sql3_src")
      val ext = t(s, dir, "events")
        .agg(min(col("event_id")), max(col("event_id"))).collect().head
      val mn = ext.getLong(0)
      val span = ext.getLong(1) - mn + 1L
      (0 until 4).foreach { q =>
        val (lo, hi) = (mn + span * q / 4, mn + span * (q + 1) / 4)
        s.sql(s"""INSERT INTO $cat.lake.ev
                 |SELECT * FROM graft_sql3_src
                 |WHERE event_id >= $lo AND event_id < $hi""".stripMargin)
      }
      val root = s"${wh.toString}/lake/ev"
      def massAndCount() = s.sql(s"""SELECT CAST(count(*) AS BIGINT),
        |CAST(sum(CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)))
        |AS DOUBLE) / 1e6 FROM $cat.lake.ev""".stripMargin)
        .collect().head
      val before = massAndCount()
      val optV = s.sql(s"CALL $cat.system.optimize(" +
        "table => 'lake.ev', sort_col => 'event_id', n_files => 2)")
        .head().getInt(0)
      val compacted = S.resolve(root, optV).size == 2
      val afterOpt = massAndCount()
      val zV = s.sql(s"CALL $cat.system.zorder(table => 'lake.ev', " +
        "col_a => 'user_id', col_b => 'event_id', n_files => 4)")
        .head().getInt(0)
      val zm = S.manifest(root, zV)
      val zStats = zm.entries.nonEmpty && zm.entries.forall(e =>
        e.zones.contains("user_id") && e.zones.contains("event_id"))
      val vac = s.sql(s"CALL $cat.system.vacuum(table => 'lake.ev', " +
        s"keep_from => $zV, grace_ms => 0)").head()
      val reclaimed = vac.getInt(0) > 0 && vac.getInt(1) > 0
      val trimmed = scala.util.Try(
        s.sql(s"SELECT count(*) FROM $cat.lake.ev VERSION AS OF 2")
          .collect()).isFailure
      val after = massAndCount()
      s.range(1).select(
        lit(after.getLong(0)).as("n_total"),
        lit(after.getDouble(1)).as("total_value"),
        lit(compacted).as("optimize_compacted"),
        lit(before == afterOpt && afterOpt == after)
          .as("data_invariant"),
        lit(zStats).as("zorder_two_dim_stats"),
        lit(reclaimed).as("vacuum_reclaimed"),
        lit(trimmed).as("history_trimmed"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** RF1: RUNTIME file skipping (DPP for sorted zones,
    * [[graft.sources.v2.GraftScan]] `SupportsRuntimeV2Filtering`) — a
    * broadcast join whose build side filters on a NON-key column, so no
    * static constraint can reach the fact scan (`pushed=[]`): Spark
    * materializes the dim, pushes the surviving join keys as a runtime
    * IN, and the scan re-prunes its file selection against the same
    * commit-time zones before planning partitions. Fixture: events as a
    * 4-file range-sorted snapshot; a 100-row dim keyed every n/100 ids,
    * label-filtered to 3 keys inside the second id-quartile. Gates: the
    * executed plan carries `dynamicpruning`; the executors opened a
    * strict subset of files (audit); values (match count + 6dp matched
    * value mass) hash the closed form.
    *
    * 100 TB lens: fact-dim joins are THE warehouse access path; without
    * runtime filtering a 100 TB fact scan reads everything to join 3
    * dim rows. Partitioned formats get this from partition pruning;
    * here sorted zones give file-granular skipping with no partition
    * columns at all.
    */
  def rf1RuntimeFileSkip(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_rf1")
    val root = tmpRoot.toString + "/t"
    try {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("value"))
      graft.sources.Bucketing.writeRangeSorted(ev, "event_id", 4,
        s"$tmpRoot/seed", 16 * 1024)
      S.init(s, root, s"$tmpRoot/seed", statsCols = Seq("event_id"))
      val n = ev.count()
      val step = n / 100
      s.range(100).select((col("id") * step).as("event_id"),
        concat(lit("label"), col("id")).as("label"))
        .write.parquet(s"$tmpRoot/dim")
      val dim = s.read.parquet(s"$tmpRoot/dim")
        .where(col("label").isin("label26", "label27", "label28"))
      val audit = s"rf1-${java.util.UUID.randomUUID()}"
      val fact = s.read.format("graft").option("path", root)
        .option("auditId", audit).load()
      val joined = fact.join(broadcast(dim), "event_id")
      def mass(c: Column) = coalesce(
        (sum(floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
          .cast("double") / lit(1e6)), lit(0.0))
      val r = joined.agg(count(lit(1)).as("n"),
        mass(col("value")).as("v"))
      val row = r.collect().head
      val dpp = r.queryExecution.executedPlan.toString
        .contains("dynamicpruning")
      val opened = graft.sources.v2.GraftScanAudit.opened(audit)
      graft.sources.v2.GraftScanAudit.clear(audit)
      val total = S.manifest(root, 1).entries.size
      s.range(1).select(
        lit(row.getLong(0)).as("n_match"),
        lit(row.getDouble(1)).as("matched_value"),
        lit(dpp).as("runtime_filter_planned"),
        lit(opened.nonEmpty && opened.size < total).as("files_skipped"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(tmpRoot.toString)
      ()
    }
  }

  /** SQL4: row-level `DELETE FROM ... WHERE` through the DSv2 catalog
    * (`SupportsDeleteV2` on [[graft.sources.v2.GraftTable]]) — the
    * three-tier plan production formats converge on, each tier gated
    * independently:
    *
    *  1. files whose commit-time stats PROVE full coverage (event_id
    *     zone inside the range AND stamped zero null count) DROP from
    *     the manifest as pure metadata — zero data bytes read;
    *  2. boundary (straddling) files take an exact position probe into
    *     ONE merge-on-read sidecar;
    *  3. everything else re-references verbatim.
    *
    * Fixture: events as 16 range-sorted files on event_id; DELETE of
    * the second span-quartile (span/4-wide — ≥4 file widths, so full
    * coverage is guaranteed to occur). Gates: dropped == the
    * INDEPENDENTLY recomputed fully-covered set (zone-subset + null
    * count, no library call) and nonempty; probed == the recomputed
    * straddle set; marked positions == in-range rows minus
    * dropped-file rows (exact conservation); the table hash-equals a
    * Scala [[graft.sources.Snapshots.deleteRange]] COW twin as a
    * multiset; VERSION AS OF the pre-delete version still serves every
    * row (time travel unbroken). Values: count + 6dp mass of the
    * remaining table, closed-form for the oracle.
    *
    * 100 TB lens: retention sweeps (`DELETE WHERE ts < cutoff`) are
    * THE delete workload; on a sorted table this plan drops almost
    * every touched file as manifest metadata and probes only the
    * cutoff-boundary file — a predicate-covered delete costs KB of
    * metadata, not a table rewrite, and SQL users get it with no
    * library call in sight.
    */
  def sql4SqlDelete(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft_sql4")
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$wh/w")
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("value"))
      graft.sources.Bucketing.writeRangeSorted(ev, "event_id", 16,
        s"$wh/seed", 16 * 1024)
      val root = s"$wh/w/lake/ev"
      val twin = s"$wh/w/lake/tw"
      S.init(s, root, s"$wh/seed", statsCols = Seq("event_id"))
      S.init(s, twin, s"$wh/seed", statsCols = Seq("event_id"))
      val ext = ev.agg(min(col("event_id")), max(col("event_id")))
        .collect().head
      val span = ext.getLong(1) - ext.getLong(0) + 1L
      val lo = ext.getLong(0) + span / 4
      val hi = ext.getLong(0) + span / 2
      val m0 = S.manifest(root, 1)
      // the expectation, recomputed independently of the zone library:
      // full coverage = zone ⊆ [lo,hi) AND stamped zero nulls; straddle
      // = intersects but not covered (a zone-less file must be touched)
      def covered(e: S.FileEntry): Boolean =
        e.rows.exists(_ > 0L) &&
          e.nulls.get("event_id").contains(0L) &&
          e.zones.get("event_id").exists { case (a, b) =>
            a >= lo && b < hi
          }
      def intersects(e: S.FileEntry): Boolean =
        e.rows.exists(_ > 0L) &&
          e.zones.get("event_id").forall { case (a, b) =>
            b >= lo && a < hi
          }
      val expDrop = m0.entries.filter(covered)
      val expProbe = m0.entries.filter(e => !covered(e) && intersects(e))
      val nInRange = ev
        .where(col("event_id") >= lo && col("event_id") < hi).count()
      val nTotal = ev.count()
      graft.sources.v2.GraftDeleteAudit.clear(root)
      s.sql(s"DELETE FROM $cat.lake.ev " +
        s"WHERE event_id >= $lo AND event_id < $hi")
      val r = graft.sources.v2.GraftDeleteAudit.lastResult(root).get
      val droppedRows = expDrop.flatMap(_.rows).sum
      S.deleteRange(s, twin, "event_id", lo, hi)
      val a = s.sql(s"""SELECT CAST(count(*) AS BIGINT),
        |CAST(sum(CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)))
        |AS DOUBLE) / 1e6 FROM $cat.lake.ev""".stripMargin)
        .collect().head
      val sqlDf = s.sql(s"SELECT * FROM $cat.lake.ev")
      val twinDf = S.read(s, twin, 2)
      val twinEq = sqlDf.exceptAll(twinDf).isEmpty &&
        twinDf.exceptAll(sqlDf).isEmpty
      val nV1 = s.sql(s"SELECT count(*) FROM $cat.lake.ev VERSION AS OF 1")
        .head().getLong(0)
      s.range(1).select(
        lit(a.getLong(0)).as("n_after"),
        lit(a.getDouble(1)).as("after_value"),
        lit(expDrop.nonEmpty && r.droppedFiles == expDrop.size)
          .as("covered_dropped"),
        lit(r.probedFiles == expProbe.size).as("straddle_probed"),
        lit(r.markedPositions == nInRange - droppedRows)
          .as("marks_exact"),
        lit(twinEq).as("matches_cow_twin"),
        lit(nV1 == nTotal).as("history_intact"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** SQL5: `MERGE INTO` through the delta-based row-level operation
    * ([[graft.sources.v2.GraftRowLevelOperation]], Spark's
    * `SupportsDelta` contract — the Iceberg v2 position-delta MERGE):
    * the scan serves `_file`/`_pos` metadata columns as the row
    * identity, Spark computes the delta, and each task writes its
    * DELETEs as a position-sidecar part and its INSERTs as a fresh
    * data file — executor-side, no funnel — folded by ONE
    * conflict-checked metadata commit.
    *
    * Fixture: events as a 6-file catalog table; the source re-images
    * the 2024-01-20 day window (+1000, matched → UPDATE) and shadows
    * it beyond the id space (+5000, unmatched → INSERT). Gates: one
    * manifest commit; ZERO pre-merge files rewritten (v1's files all
    * survive verbatim); sidecar parts present with marks == the window
    * row count exactly; the table multiset-equals a Scala
    * [[graft.sources.Snapshots.upsertPositions]] twin; VERSION AS OF
    * the pre-merge version still serves the original image. Values:
    * count + 6dp mass after the merge — closed-form for the oracle.
    *
    * 100 TB lens: MERGE is THE CDC/upsert verb; copy-on-write costs a
    * file rewrite per matched key cluster, while this plan costs KB of
    * sidecar + KB of appends regardless of how many wide files the
    * matches scatter across — and the SQL user writes standard
    * `MERGE INTO`, no library call in sight.
    */
  def sql5SqlMerge(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft_sql5")
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$wh/w")
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("value"))
      graft.sources.Bucketing.writeRangeSorted(ev, "event_id", 6,
        s"$wh/seed", 16 * 1024)
      val root = s"$wh/w/lake/ev"
      val twin = s"$wh/w/lake/tw"
      S.init(s, root, s"$wh/seed", statsCols = Seq("event_id"))
      S.init(s, twin, s"$wh/seed", statsCols = Seq("event_id"))
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val win = ev.where(col("ts") >= ts("2024-01-20 00:00:00") &&
        col("ts") < ts("2024-01-21 00:00:00"))
      val nWin = win.count()
      val src = win.select(col("event_id"), col("ts"),
          (col("value") + lit(1000.0)).as("value"))
        .unionAll(win.select(
          (col("event_id") + lit(maxId + 1L)).as("event_id"), col("ts"),
          (col("value") + lit(5000.0)).as("value")))
      src.createOrReplaceTempView("graft_sql5_src")
      val filesBefore = S.resolve(root, 1).toSet
      s.sql(s"""MERGE INTO $cat.lake.ev t USING graft_sql5_src s
               |ON t.event_id = s.event_id
               |WHEN MATCHED THEN UPDATE SET t.value = s.value, t.ts = s.ts
               |WHEN NOT MATCHED THEN INSERT (event_id, ts, value)
               |VALUES (s.event_id, s.ts, s.value)""".stripMargin)
      val vAfter = S.latestVersion(root)
      val oneCommit = vAfter == 2
      val zeroRewrites = filesBefore.subsetOf(S.resolve(root, vAfter).toSet)
      val dvs = S.deleteSidecars(root, vAfter)
      val nMarks =
        if (dvs.isEmpty) 0L
        else graft.sources.Snapshots.dvRead(s, root, dvs).count()
      S.upsertPositions(s, twin, "event_id", "event_id", src)
      val sqlDf = s.sql(s"SELECT * FROM $cat.lake.ev")
      val twinDf = S.read(s, twin, S.latestVersion(twin))
      val twinEq = sqlDf.exceptAll(twinDf).isEmpty &&
        twinDf.exceptAll(sqlDf).isEmpty
      val nV1 = s.sql(s"SELECT count(*) FROM $cat.lake.ev VERSION AS OF 1")
        .head().getLong(0)
      val a = s.sql(s"""SELECT CAST(count(*) AS BIGINT),
        |CAST(sum(CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)))
        |AS DOUBLE) / 1e6 FROM $cat.lake.ev""".stripMargin)
        .collect().head
      s.range(1).select(
        lit(a.getLong(0)).as("n_after"),
        lit(a.getDouble(1)).as("after_value"),
        lit(oneCommit).as("one_commit"),
        lit(zeroRewrites).as("zero_rewrites"),
        lit(dvs.nonEmpty && nMarks == nWin).as("marks_exact"),
        lit(twinEq).as("matches_mor_twin"),
        lit(nV1 == ev.count()).as("history_intact"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** SQL6: `UPDATE` through the same delta plan (updates represented
    * as delete+insert — `representUpdateAsDeleteAndInsert`): one
    * statement, one conflict-checked commit, retracted originals in
    * sidecar parts, re-imaged rows appended, zero files rewritten.
    * Fixture: +1 to the 2024-01-20 day window's values on a 6-file
    * events catalog table. Gates: zero rewrites; sidecar marks == the
    * window row count; count invariant; VERSION AS OF the pre-update
    * version shows the original mass (time travel unbroken). Values:
    * count + 6dp mass after — closed-form (total + window count).
    */
  def sql6SqlUpdate(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft_sql6")
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$wh/w")
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("value"))
      graft.sources.Bucketing.writeRangeSorted(ev, "event_id", 6,
        s"$wh/seed", 16 * 1024)
      val root = s"$wh/w/lake/ev"
      S.init(s, root, s"$wh/seed", statsCols = Seq("event_id"))
      val nWin = ev.where(col("ts") >= ts("2024-01-20 00:00:00") &&
        col("ts") < ts("2024-01-21 00:00:00")).count()
      val nTotal = ev.count()
      val filesBefore = S.resolve(root, 1).toSet
      def mass(rel: String) = s.sql(s"""SELECT
        |CAST(sum(CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0)))
        |AS DOUBLE) / 1e6 FROM $rel""".stripMargin).head().getDouble(0)
      val massBefore = mass(s"$cat.lake.ev")
      s.sql(s"""UPDATE $cat.lake.ev SET value = value + 1
               |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
               |  AND ts < TIMESTAMP '2024-01-21 00:00:00'""".stripMargin)
      val vAfter = S.latestVersion(root)
      val zeroRewrites = filesBefore.subsetOf(S.resolve(root, vAfter).toSet)
      val dvs = S.deleteSidecars(root, vAfter)
      val nMarks =
        if (dvs.isEmpty) 0L
        else graft.sources.Snapshots.dvRead(s, root, dvs).count()
      val nAfter = s.sql(s"SELECT count(*) FROM $cat.lake.ev").head()
        .getLong(0)
      val massAfter = mass(s"$cat.lake.ev")
      val massV1 = mass(s"$cat.lake.ev VERSION AS OF 1")
      s.range(1).select(
        lit(nAfter).as("n_after"),
        lit(massAfter).as("after_value"),
        lit(zeroRewrites).as("zero_rewrites"),
        lit(dvs.nonEmpty && nMarks == nWin).as("marks_exact"),
        lit(nAfter == nTotal).as("count_invariant"),
        lit(massV1 == massBefore).as("history_intact"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** SQL7: CDC through the CATALOG — `CALL g.system.changes(table,
    * from, to, key_col, view)` registers the ROW-TAGGED change feed
    * ([[graft.sources.Snapshots.changeFeed]], the Delta-CDF contract)
    * as a temp view, and plain SQL aggregates it. The procedure
    * returns only the VIEW NAME (Spark's CALL materializes LocalScan
    * rows driver-side — returning the feed itself would collect data
    * through the driver); the feed's plan stays distributed and
    * delta-only, executed lazily by the SELECT.
    *
    * Fixture: the sql5 shape — a SQL MERGE re-imaging the 2024-01-20
    * window (+1000) with shadow inserts (+5000) — then the v1→v2 feed:
    * every window key must tag one update_preimage (original value)
    * and one update_postimage (+1000), every shadow an insert, zero
    * deletes. Values: tag counts and 6dp tag masses — all closed-form.
    *
    * 100 TB lens: CDC consumers are SQL jobs in a scheduler; a change
    * feed only reachable from Scala is invisible to them. Two SQL
    * statements (CALL + SELECT) are the whole consumer, and the feed's
    * joins touch the DELTA only — never the 100 TB table.
    */
  def sql7CdcThroughCatalog(s: SparkSession, dir: String): DataFrame = {
    val S = graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft_sql7")
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$wh/w")
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("value"))
      graft.sources.Bucketing.writeRangeSorted(ev, "event_id", 4,
        s"$wh/seed", 16 * 1024)
      val root = s"$wh/w/lake/ev"
      S.init(s, root, s"$wh/seed", statsCols = Seq("event_id"))
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val win = ev.where(col("ts") >= ts("2024-01-20 00:00:00") &&
        col("ts") < ts("2024-01-21 00:00:00"))
      win.select(col("event_id"), col("ts"),
          (col("value") + lit(1000.0)).as("value"))
        .unionAll(win.select(
          (col("event_id") + lit(maxId + 1L)).as("event_id"), col("ts"),
          (col("value") + lit(5000.0)).as("value")))
        .createOrReplaceTempView("graft_sql7_src")
      s.sql(s"""MERGE INTO $cat.lake.ev t USING graft_sql7_src s
               |ON t.event_id = s.event_id
               |WHEN MATCHED THEN UPDATE SET t.value = s.value, t.ts = s.ts
               |WHEN NOT MATCHED THEN INSERT (event_id, ts, value)
               |VALUES (s.event_id, s.ts, s.value)""".stripMargin)
      val view = "graft_sql7_changes_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val callRow = s.sql(s"CALL $cat.system.changes(" +
        s"table => 'lake.ev', from_version => 1, to_version => 2, " +
        s"key_col => 'event_id', view_name => '$view')").head()
      val viewOk = callRow.getString(0) == view
      val a = s.sql(s"""SELECT
        |CAST(sum(CASE WHEN _change_type = 'insert' THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_insert,
        |CAST(sum(CASE WHEN _change_type = 'update_preimage' THEN 1
        |  ELSE 0 END) AS BIGINT) AS n_update_pre,
        |CAST(sum(CASE WHEN _change_type = 'update_postimage' THEN 1
        |  ELSE 0 END) AS BIGINT) AS n_update_post,
        |CAST(sum(CASE WHEN _change_type = 'delete' THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_delete,
        |CAST(sum(CASE WHEN _change_type = 'update_preimage'
        |  THEN CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0))
        |  ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) / 1e6
        |  AS pre_value,
        |CAST(sum(CASE WHEN _change_type = 'update_postimage'
        |  THEN CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0))
        |  ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) / 1e6
        |  AS post_value,
        |CAST(sum(CASE WHEN _change_type = 'insert'
        |  THEN CAST(floor(value * 1e6 + 0.5) AS DECIMAL(38,0))
        |  ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) / 1e6
        |  AS insert_value
        |FROM $view""".stripMargin).collect().head
      s.catalog.dropTempView(view)
      s.range(1).select(
        lit(a.getLong(0)).as("n_insert"),
        lit(a.getLong(1)).as("n_update_pre"),
        lit(a.getLong(2)).as("n_update_post"),
        lit(a.getLong(3)).as("n_delete"),
        lit(a.getDouble(4)).as("pre_value"),
        lit(a.getDouble(5)).as("post_value"),
        lit(a.getDouble(6)).as("insert_value"),
        lit(viewOk).as("view_registered"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** MF5: COUNT(col) as a METADATA-ONLY planner aggregate — the mf4
    * discipline extended by the commit-time NULL COUNT stats (`n:`
    * per-column stamps): `SELECT count(*), count(k), count(v)` on a
    * filterless scan pushes COMPLETELY into the manifest
    * (`count(col) = rows − nulls`, both exact at commit), planned as
    * [[graft.sources.v2.GraftMetadataAggScan]] — one driver-computed
    * row, ZERO files opened. Fixture: events through the catalog with
    * `value` nulled on every 5th id, stats on both columns. Gates: the
    * executed plan contains the metadata scan node (no HashAggregate,
    * no file I/O); values are the closed-form null complement.
    *
    * 100 TB lens: `count(col)` is the profiler's null-audit primitive
    * (P6's distributed cousin); at 10^6 files it is the difference
    * between a manifest parse and a full-table column scan.
    */
  def mf5CountPushdown(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_mf5")
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$wh/w")
      s.sql(s"CREATE NAMESPACE $cat.lake")
      s.sql(s"""CREATE TABLE $cat.lake.ev (event_id BIGINT, v DOUBLE)
               |USING graft TBLPROPERTIES ('stats'='event_id,v')"""
        .stripMargin)
      t(s, dir, "events").select(col("event_id"),
          when(pmod(col("event_id"), lit(5)) === 0, lit(null))
            .otherwise(col("value")).as("v"))
        .createOrReplaceTempView("graft_mf5_src")
      s.sql(s"""INSERT INTO $cat.lake.ev
        |SELECT /*+ REPARTITION_BY_RANGE(4, event_id) */ *
        |FROM graft_mf5_src""".stripMargin)
      val q = s.sql(s"""SELECT CAST(count(*) AS BIGINT) AS n_total,
        |CAST(count(event_id) AS BIGINT) AS n_id,
        |CAST(count(v) AS BIGINT) AS n_v FROM $cat.lake.ev""".stripMargin)
      val metaOnly = q.queryExecution.executedPlan.toString
        .contains("GraftMetadataAggScan")
      val r = q.collect().head
      s.range(1).select(
        lit(r.getLong(0)).as("n_total"),
        lit(r.getLong(1)).as("n_id"),
        lit(r.getLong(2)).as("n_v"),
        lit(metaOnly).as("metadata_only"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** ARR1: ARRAY columns through the full DSv2 surface — the
    * embedding-table shape (`array<float>`) served and MUTATED by SQL,
    * which the connector previously refused (primitive-only scan):
    * CREATE TABLE with an ARRAY<FLOAT> column, the catalog INSERT
    * writing 3-level parquet LISTs through the executor writers, a SQL
    * read aggregating over the vectors (`size`, `element_at`), and a
    * zone-pruned `DELETE FROM` on the scalar key proving row-level
    * semantics compose with nested columns. Gates: the DSv2 read of
    * the full table matches the raw embeddings parquet exactly (count,
    * summed vector lengths, 6dp mass of the first component — the
    * nested decode is byte-faithful); after deleting the top half of
    * the id space the same aggregates equal the closed-form complement;
    * the delete dropped at least one file as pure metadata (zones on
    * the scalar key prune around the nested payload).
    *
    * 100 TB lens: embedding tables ARE the 100 TB tables of an LLM
    * data platform; a table format whose SQL surface cannot read the
    * vector column forces every ANN/dedup pipeline back onto bespoke
    * APIs. One connector serving both the scalars (pruned, deleted,
    * merged) and the payload arrays is the difference between a demo
    * and a format.
    */
  def arr1DsvArrayRead(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_arr1")
    try {
      val cat = "g" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$wh/w")
      s.sql(s"CREATE NAMESPACE $cat.lake")
      s.sql(s"""CREATE TABLE $cat.lake.emb
               |(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)
               |USING graft TBLPROPERTIES ('stats'='vec_id')"""
        .stripMargin)
      val raw = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      raw.createOrReplaceTempView("graft_arr1_src")
      s.sql(s"""INSERT INTO $cat.lake.emb
        |SELECT /*+ REPARTITION_BY_RANGE(4, vec_id) */ *
        |FROM graft_arr1_src""".stripMargin)
      def agg(rel: String) = s.sql(s"""SELECT
        |CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(size(embedding)) AS BIGINT) AS total_len,
        |CAST(sum(CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE)
        |  * 1e6 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS c1_mass
        |FROM $rel""".stripMargin).collect().head
      val full = agg(s"$cat.lake.emb")
      // the raw twin through the ordinary parquet reader
      raw.createOrReplaceTempView("graft_arr1_twin")
      val twin = agg("graft_arr1_twin")
      val fullMatches = full == twin
      // zone-pruned DELETE around the nested payload
      val half = raw.agg(min(col("vec_id")), max(col("vec_id")))
        .collect().head
      val mid = (half.getLong(0) + half.getLong(1) + 1L) / 2L
      val root = s"$wh/w/lake/emb"
      graft.sources.v2.GraftDeleteAudit.clear(root)
      s.sql(s"DELETE FROM $cat.lake.emb WHERE vec_id >= $mid")
      val r = graft.sources.v2.GraftDeleteAudit.lastResult(root).get
      val after = agg(s"$cat.lake.emb")
      s.range(1).select(
        lit(after.getLong(0)).as("n_after"),
        lit(after.getLong(1)).as("len_after"),
        lit(after.getDouble(2)).as("c1_mass_after"),
        lit(fullMatches).as("full_read_matches"),
        lit(r.droppedFiles >= 1).as("metadata_dropped"))
    } finally {
      graft.sources.LakeFs.deleteRecursively(wh.toString)
      ()
    }
  }

  /** The DISTRIBUTED bloom manifest of [[zordered16Path]] — built by
    * ONE Spark pass ([[graft.sources.Manifest.writeBloomDistributed]]),
    * filters sized for the largest file (ceil(total/16)·2).
    */
  private val bloomManDistMemo =
    scala.collection.mutable.Map[String, String]()
  private[graft] def bloomManDistPath(s: SparkSession, dir: String): String =
    bloomManDistMemo.synchronized {
      bloomManDistMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_bloommand_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val total = s.read.parquet(zordered16Path(s, dir)).count()
          graft.sources.Manifest.writeBloomDistributed(
            s, zordered16Path(s, dir), "event_id", tmp,
            expectedPerFile = math.max(1L, total / 16L * 2L), fpp = 1e-4)
        }
      })
    }

  /** BF2: DISTRIBUTED bloom manifest — bf1's point-lookup pruning with
    * the build and probe moved where they scale ([[graft.sources
    * .Manifest.buildBloomDistributed]] / [[selectFilesBloomDistributed]]
    * over [[graft.functions.BloomSketch]]): the build is ONE Spark pass
    * grouped by `_metadata.file_name` with a bloom AGGREGATE (exact
    * merge = bitwise OR, so map-side combine is free) instead of one
    * driver-launched job per file, and the probe filters the manifest
    * IN EXECUTORS instead of collecting every filter to the driver.
    * Same keys and gates as bf1 — no false negative vs the
    * `input_file_name` ground truth, strict-subset pruning, scan within
    * the selection — plus the build's row counts must sum to the exact
    * table count (they ride the same pass).
    *
    * 100 TB lens: at 10^6 files the driver build is 10^6 scheduler
    * round-trips and the driver probe collects ~a GB of filters; this
    * shape is one job and a KB-scale collect of surviving names.
    */
  def bf2DistributedBloom(s: SparkSession, dir: String): DataFrame = {
    val data = zordered16Path(s, dir)
    val man = bloomManDistPath(s, dir)
    val ev = t(s, dir, "events")
    val kRow = ev.agg(min(col("event_id")), max(col("event_id"))).head()
    val kWin = ev.where(col("ts") >= ts("2024-01-10 00:00:00") &&
        col("ts") < ts("2024-01-13 00:00:00"))
      .agg(min(col("event_id"))).head().getLong(0)
    val keys = Seq(kRow.getLong(0), kRow.getLong(1), kWin).distinct
    val selected =
      graft.sources.Manifest.selectFilesBloomDistributed(s, man, keys)
    val totalFiles = graft.sources.Compaction.dataFileNames(data).size
    val manRows = s.read.parquet(man).agg(sum(col("rows"))).head().getLong(0)
    val truth = graft.sources.Bucketing.filesRead(
        s.read.parquet(data).where(col("event_id").isin(keys: _*)))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    val pruned = s.read
      .parquet(selected.map(n => s"$data/$n"): _*)
      .where(col("event_id").isin(keys: _*))
    val opened = graft.sources.Bucketing.filesRead(pruned)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    pruned.agg(count(lit(1)).as("n_hits"),
        countDistinct(col("event_id")).as("n_ids"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6))
          .as("hit_value"))
      .select(col("n_hits"), col("n_ids"), col("hit_value"),
        lit(totalFiles.toLong).as("files_total"),
        lit(manRows).as("manifest_rows_total"),
        lit(truth.subsetOf(selected.toSet)).as("no_false_negative"),
        lit(selected.nonEmpty && selected.size < totalFiles)
          .as("bloom_prunes"),
        lit(opened.subsetOf(selected.toSet)).as("scan_within_selection"))
  }

  /** MF4: METADATA-ONLY aggregation on a SNAPSHOT table — mf2's
    * manifest-answers-the-dashboard-query claim upgraded to the mutating
    * table ([[graft.sources.Snapshots.metadataAgg]]): COUNT(*) / MIN /
    * MAX of `ts` over the mc1 fixture's LATEST version (7 commits of
    * appends, a checkpoint, and a zone-planned delete deep) computed
    * purely from the manifest's commit-time `rows`/zone stats — zero
    * data bytes, zero footer opens (gated by the thread-local footer
    * counter). The oracle computes the same three values from the DATA's
    * closed form — the hash match IS the proof that commit-time stats
    * stay exact through delta chains, checkpoints, and rewrites.
    *
    * 100 TB lens: "how many rows, what time range" is the most common
    * dashboard query against a mutating lake table; with stats stamped
    * at commit it costs a KB manifest parse instead of a 100 TB scan —
    * and unlike mf2's flat-dir manifest, this survives the table being
    * MUTATED between queries.
    */
  def mf4SnapshotMetadataAgg(s: SparkSession, dir: String): DataFrame = {
    val root = incrSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val ctr = graft.sources.Bucketing.footerReads.get()
    val before = ctr.get()
    val agg = S.metadataAgg(s, root, S.latestVersion(root), "ts")
      .collect().head
    val footerFree = ctr.get() == before
    s.range(1).select(
      lit(agg.getLong(0)).as("n_rows"),
      lit(agg.getLong(1)).as("min_ts_micros"),
      lit(agg.getLong(2)).as("max_ts_micros"),
      lit(footerFree).as("metadata_only"))
  }

  /** PP6: MANIFEST-planned range read on the MUTATING snapshot table —
    * the pruning family's last rung (pp1 directories → dpp1 runtime →
    * pp2 row groups → pp5 pages → mf1 flat-dir manifests) applied where
    * serving reads actually happen ([[graft.sources.Snapshots
    * .readRange]]): the 2024-01-20 day is read from the mc1 fixture's
    * LATEST version (7 commits deep: appends, a checkpoint, a delete)
    * by selecting files from the manifest's commit-time zones BEFORE
    * the scan ever builds a file index. Gates: the scan opened a
    * STRICT SUBSET of the version's files (`input_file_name` ground
    * truth), every opened file was zone-selected, zero footer opens at
    * plan time (thread-local counter), and the values equal the flat
    * events twin (count + 6dp mass — the five appended 01-26 day
    * copies and the deleted 01-10..13 window must not leak in).
    *
    * 100 TB lens: `read().where(day)` still lists and footer-probes
    * 10^5–10^6 files before row-group pruning saves the data I/O;
    * manifest zone selection hands the scan the short list — the
    * difference between seconds of planner metadata I/O per query and
    * a KB parse.
    */
  def pp6SnapshotZoneRead(s: SparkSession, dir: String): DataFrame = {
    val root = incrSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val latest = S.latestVersion(root)
    val allFiles = S.resolve(root, latest)
    val lo = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
      .getTime * 1000L
    val hi = java.sql.Timestamp.valueOf("2024-01-21 00:00:00")
      .getTime * 1000L
    val ctr = graft.sources.Bucketing.footerReads.get()
    val before = ctr.get()
    val pruned = S.readRange(s, root, latest, "ts", lo, hi)
    val planFooterFree = ctr.get() == before
    val opened = graft.sources.Bucketing.filesRead(pruned)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    // the selection the manifest zones imply, recomputed independently
    val selected = S.manifest(root, latest).entries.filter { e =>
      e.zones.get("ts") match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true
      }
    }.map(_.name).toSet
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    pruned.agg(count(lit(1)).as("n_day"), mass.as("day_value"))
      .select(col("n_day"), col("day_value"),
        lit(selected.nonEmpty && selected.size < allFiles.size)
          .as("strict_subset"),
        lit(opened.subsetOf(selected)).as("scan_within_selection"),
        lit(planFooterFree).as("plan_footer_free"))
  }

  /** Vacuumed lifecycle snapshot — the vc1 fixture: init → append the
    * 2024-01-25 day (ids +5·10^12) → deleteRange the pp2 window →
    * OPTIMIZE to 4 files → VACUUM(keepFrom = 4, grace 0) — old
    * manifests dropped, every unreferenced data file (superseded
    * originals, delete-rewrite survivors) physically reclaimed.
    */
  private val vacuumSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def vacuumSnapPath(s: SparkSession, dir: String): String =
    vacuumSnapMemo.synchronized {
      vacuumSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_vacuum_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir), statsCols = Seq("ts"))
          S.append(s, tmp, t(s, dir, "events")
            .where(col("ts") >= ts("2024-01-25 00:00:00") &&
              col("ts") < ts("2024-01-26 00:00:00"))
            .withColumn("event_id", col("event_id") + lit(5000000000000L)),
            "ts", blockSize = 16 * 1024)
          S.deleteRange(s, tmp, "ts", tsWindowLoMicros, tsWindowHiMicros,
            blockSize = 16 * 1024)
          S.optimize(s, tmp, "ts", 4, blockSize = 16 * 1024)
          S.vacuum(tmp, keepFrom = 4, graceMs = 0L)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** VC1: VACUUM retention — the reclamation half of copy-on-write the
    * mutation rows (tt1/up1/lc1) defer ([[graft.sources.Snapshots
    * .vacuum]]): dropping versions 1–3 and physically deleting every
    * file no surviving manifest references. Gates, each falsifiable:
    * the dropped versions REFUSE to resolve (isolation ends exactly at
    * the retention cut); the kept version reads the closed form (the
    * reclaim touched zero live bytes); and the files directory holds
    * EXACTLY the kept version's file set — nothing leaked (storage
    * actually reclaimed: 4 files on disk where the lifecycle wrote 4
    * originals + 1 append + 1 delete-rewrite + 4 optimize outputs) and
    * nothing live was deleted.
    *
    * 100 TB lens: copy-on-write makes old versions free until you
    * reclaim them — then reclamation is the risk: delete too little
    * and storage doubles weekly under churn; delete too much and a
    * live version dangles (the vacuum grace window guards the
    * in-flight writer — spec-proven). This row pins the exact
    * keep/drop boundary.
    */
  def vc1VacuumRetention(s: SparkSession, dir: String): DataFrame = {
    val root = vacuumSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val latest = S.latestVersion(root)
    val dropped = (1 to 3).forall { v =>
      try { S.resolve(root, v); false }
      catch { case _: IllegalArgumentException => true }
    }
    val live = S.resolve(root, latest).toSet
    val onDisk = graft.sources.Compaction.dataFileNames(s"$root/files")
      .toSet
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    S.read(s, root, latest)
      .agg(count(lit(1)).as("n_final"), mass.as("total_value"))
      .select(col("n_final"), col("total_value"),
        lit(latest.toLong).as("latest_version"),
        lit(live.size.toLong).as("n_live_files"),
        lit(dropped).as("history_dropped"),
        lit(onDisk == live).as("storage_reclaimed_exactly"))
  }

  /** HIST1: DESCRIBE HISTORY — the audit surface every table format
    * exposes ([[graft.sources.Snapshots.history]]), pinned per-version
    * against the mc1 fixture's closed form: 7 surviving versions, the
    * per-version ROW COUNTS derived purely from the manifests'
    * commit-time stats (v1 = events, +|day-26| per append through v6,
    * v7 = −|window|), the delta/checkpoint pattern (v1 and v4 full),
    * and every commit stamped with a monotone timestamp. The oracle
    * recomputes each version's count from the DATA — the hash match
    * proves the manifest history IS the data history, version by
    * version, with zero data I/O on the engine side.
    *
    * 100 TB lens: "what changed, when, and how big" across 10^5
    * commits must come from KB manifests; a history listing that scans
    * data is a non-starter, and one that disagrees with the data is
    * worse.
    */
  def hist1DescribeHistory(s: SparkSession, dir: String): DataFrame = {
    val root = incrSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val rows = S.history(s, root).orderBy(col("version")).collect()
    val stamped = rows.forall(!_.isNullAt(1)) && {
      val ts = rows.map(_.getLong(1)).toSeq
      ts == ts.sorted && ts.distinct == ts // strictly monotone stamps
    }
    import s.implicits._
    rows.map(r => (r.getInt(0), r.getLong(4), r.getBoolean(2)))
      .toSeq.toDF("version", "n_rows", "is_delta")
      .withColumn("all_stamped", lit(stamped))
      .orderBy(col("version"))
  }

  /** Bloom-indexed snapshot — the bf3 fixture: init → append the
    * 2024-01-25 day (ids +6·10^12) → deleteRange the pp2 window →
    * OPTIMIZE to 4 ts-sorted files → [[graft.sources.Snapshots
    * .buildBloomIndex]] on `event_id` for the final version (ONE
    * distributed pass, persisted under `_blooms/`).
    */
  private val bloomSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def bloomSnapPath(s: SparkSession, dir: String): String =
    bloomSnapMemo.synchronized {
      bloomSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_bloomsnap_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir), statsCols = Seq("ts"))
          S.append(s, tmp, t(s, dir, "events")
            .where(col("ts") >= ts("2024-01-25 00:00:00") &&
              col("ts") < ts("2024-01-26 00:00:00"))
            .withColumn("event_id", col("event_id") + lit(6000000000000L)),
            "ts", blockSize = 16 * 1024)
          S.deleteRange(s, tmp, "ts", tsWindowLoMicros, tsWindowHiMicros,
            blockSize = 16 * 1024)
          S.optimize(s, tmp, "ts", 4, blockSize = 16 * 1024)
          S.buildBloomIndex(s, tmp, 4, "event_id", fpp = 1e-4)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** BF3: bloom-indexed POINT LOOKUP on the SNAPSHOT table — bf1/bf2's
    * serving query moved where it actually runs at scale: against a
    * MUTATED, versioned table ([[graft.sources.Snapshots
    * .buildBloomIndex]]/[[readKeys]]). The table is ts-sorted, so every
    * file's `event_id` zone spans the id space and zone pruning keeps
    * everything; the version-pinned per-file blooms keep only the
    * files that might hold the keys, probed IN EXECUTORS. Keys derive
    * from the closed form on both sides: the final table's min and max
    * id (one original row, one appended row) plus the deleted window's
    * min id — which must return ZERO rows (the bloom may admit a file;
    * the versioned read must still say the row is gone). Gates: hits
    * pinned (count, distinct ids, 6dp value mass), no false negative
    * vs `input_file_name` ground truth, strict-subset selection, scan
    * within the selection.
    *
    * 100 TB lens: "fetch these record ids as of the current version"
    * is THE serving query of a mutating lake table; version-pinned
    * bloom metadata answers it from KBs — and deletion correctness
    * must come from the SNAPSHOT read, never from hoping the index
    * forgot the row.
    */
  def bf3SnapshotPointLookup(s: SparkSession, dir: String): DataFrame = {
    val root = bloomSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val ev = t(s, dir, "events")
    val inWindow = col("ts") >= ts("2024-01-10 00:00:00") &&
      col("ts") < ts("2024-01-13 00:00:00")
    val inD25 = col("ts") >= ts("2024-01-25 00:00:00") &&
      col("ts") < ts("2024-01-26 00:00:00")
    val kMin = ev.where(!inWindow).agg(min(col("event_id")))
      .head().getLong(0)
    val kMax = ev.where(inD25).agg(max(col("event_id")))
      .head().getLong(0) + 6000000000000L
    val kGone = ev.where(inWindow).agg(min(col("event_id")))
      .head().getLong(0)
    val keys = Seq(kMin, kMax, kGone)
    val allFiles = S.resolve(root, 4)
    val hit = S.readKeys(s, root, 4, "event_id", keys)
    val opened = graft.sources.Bucketing.filesRead(hit)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    val selected = graft.sources.Manifest
      .selectFilesBloomDistributed(s, s"$root/_blooms/v4_event_id.parquet",
        keys).toSet
    // ground truth: files truly holding any LIVE key (unpruned read)
    val truth = graft.sources.Bucketing.filesRead(
        S.read(s, root, 4).where(col("event_id").isin(keys: _*)))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    hit.agg(count(lit(1)).as("n_hits"),
        countDistinct(col("event_id")).as("n_ids"),
        mass.as("hit_value"))
      .select(col("n_hits"), col("n_ids"), col("hit_value"),
        lit(allFiles.size.toLong).as("files_total"),
        lit(truth.subsetOf(selected)).as("no_false_negative"),
        lit(selected.nonEmpty && selected.size < allFiles.size)
          .as("bloom_prunes"),
        lit(opened.subsetOf(selected)).as("scan_within_selection"))
  }

  /** Z-ordered snapshot — the pp7 fixture: init from the compacted
    * events, then OPTIMIZE ... ZORDER BY (user_id, day-of-stream) into
    * 16 Morton-range files with commit-time stats stamped for BOTH
    * physical dimensions (`statsCols = user_id, ts`).
    */
  private val zorderSnapMemo = scala.collection.mutable.Map[String, String]()
  private[graft] def zorderSnapPath(s: SparkSession, dir: String): String =
    zorderSnapMemo.synchronized {
      zorderSnapMemo.getOrElseUpdate(dir, {
        val path = "/tmp/graft_events_zsnap_" +
          dir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
          tableFingerprint(dir, "events")
        buildCachedDir(path) { tmp =>
          val S = graft.sources.Snapshots
          S.init(s, tmp, compactedEventsPath(s, dir), statsCols = Seq("ts"))
          S.optimizeZOrder(s, tmp, col("user_id"),
            pmod(datediff(to_date(col("ts")), lit("2024-01-01")), lit(32)),
            16, blockSize = 16 * 1024, statsCols = Seq("user_id", "ts"))
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
        }
      })
    }

  /** PP7: CONJUNCTIVE manifest-planned read on the Z-ORDERED SNAPSHOT —
    * mf3's two-column pruning moved from a separate flat-dir manifest
    * into the table's OWN commit-time stats ([[graft.sources.Snapshots
    * .optimizeZOrder]] stamping both dimensions, [[readRange2]]
    * planning on their intersection): the cohort+window query
    * (`user_id < 8` AND the pp2 3-day window) selects only the files
    * whose envelopes intersect on BOTH dimensions. Gates: the
    * intersection law holds as SET EQUALITY (conjunctive selection ==
    * selA ∩ selB, recomputed independently from the entries); on the
    * Morton layout the selection is a STRICT subset of each
    * single-dimension selection (both dimensions genuinely prune);
    * the scan opened only selected files (`input_file_name` ground
    * truth); zero plan-time footer opens; and the values equal the
    * flat events twin (count + 6dp mass).
    *
    * 100 TB lens: the two-hot-filter fact table is THE lake layout
    * decision (z-order at compaction, mf3/oz1), and the payoff only
    * lands if the SERVING read plans from the table's own metadata —
    * this row closes that loop end to end on one versioned table.
    */
  def pp7SnapshotZorderRead(s: SparkSession, dir: String): DataFrame = {
    val root = zorderSnapPath(s, dir)
    val S = graft.sources.Snapshots
    val latest = S.latestVersion(root)
    val entries = S.manifest(root, latest).entries
    val (loU, hiU) = (0L, 8L)
    val (loT, hiT) = (tsWindowLoMicros, tsWindowHiMicros)
    def sel(c: String, lo: Long, hi: Long): Set[String] =
      entries.filter(_.zones.get(c) match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true
      }).map(_.name).toSet
    val selU = sel("user_id", loU, hiU)
    val selT = sel("ts", loT, hiT)
    val both = selU & selT
    val ctr = graft.sources.Bucketing.footerReads.get()
    val before = ctr.get()
    val pruned = S.readRange2(s, root, latest,
      "user_id", loU, hiU, "ts", loT, hiT)
    val planFooterFree = ctr.get() == before
    val opened = graft.sources.Bucketing.filesRead(pruned)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    // ground truth: files truly holding matching rows (unpruned scan)
    val truth = graft.sources.Bucketing.filesRead(
        S.read(s, root, latest).where(col("user_id") >= loU &&
          col("user_id") < hiU &&
          unix_micros(col("ts")) >= loT && unix_micros(col("ts")) < hiT))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    def mass = (sum(floor(col("value") * lit(1e6) + lit(0.5))
      .cast("decimal(38,0)")).cast("double") / lit(1e6))
    pruned.agg(count(lit(1)).as("n_events"), mass.as("total_value"))
      .select(col("n_events"), col("total_value"),
        lit(entries.size.toLong).as("files_total"),
        lit(truth.subsetOf(both)).as("no_false_negative"),
        // strict vs the TABLE (the pruning is real) and never wider
        // than either dimension alone (the mf3 convention: at large id
        // cardinality the Morton bit split can leave one dimension
        // non-pruning, so per-dimension strictness is layout-dependent)
        lit(both.nonEmpty && both.size < entries.size &&
          both.size <= selU.size && both.size <= selT.size)
          .as("strict_subset"),
        lit(opened.subsetOf(both)).as("scan_within_selection"),
        lit(planFooterFree).as("plan_footer_free"))
  }

  // ======================================================================
  // Registry
  // ======================================================================

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p2_shape" -> (p2Shape _),
    "p3_head" -> (p3Head _),
    "p5_describe" -> (p5Describe _),
    "p6_nullcounts" -> (p6NullCounts _),
    "p7_extremes" -> (p7Extremes _),
    "p8_dupcheck" -> (p8DupCheck _),
    "p9_value_counts" -> (p9ValueCounts _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_top_revenue" -> (q3TopRevenue _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q6_forecast" -> (q6Forecast _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q14_promo_share" -> (q14PromoShare _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q_semijoin" -> (qSemiJoin _),
    "q_antijoin" -> (qAntiJoin _),
    "q_setops" -> (qSetOps _),
    "q_above_own_avg" -> (qAboveOwnAvg _),
    "w1_topk_per_customer" -> (w1TopkPerCustomer _),
    "w2_running_sum" -> (w2RunningSum _),
    "w3_sessionize" -> (w3Sessionize _),
    "w4_asof_join" -> (w4AsofJoin _),
    "w5_range_window" -> (w5RangeWindow _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "ab1_welch_t" -> (ab1WelchT _),
    "q_pivot" -> (qPivot _),
    "e1_hourly_totals" -> (e1HourlyTotals _),
    "e2_json_extract" -> (e2JsonExtract _),
    "c1_impute_median" -> (c1ImputeMedian _),
    "c2_impute_mean" -> (c2ImputeMean _),
    "c3_impute_mode" -> (c3ImputeMode _),
    "c4_impute_derived" -> (c4ImputeDerived _),
    "c5_drop_nulls" -> (c5DropNulls _),
    "c6_zscore_filter" -> (c6ZscoreFilter _),
    "c6b_mad_filter" -> (c6bMadFilter _),
    "c7_outlier_to_null" -> (c7OutlierToNull _),
    "c8_percentile_cap" -> (c8PercentileCap _),
    "c9_dedup_keyed" -> (c9DedupKeyed _),
    "c10_normalize" -> (c10Normalize _),
    "c11_canonicalize" -> (c11Canonicalize _),
    "c12_booleanize" -> (c12Booleanize _),
    "c13_date_flag" -> (c13DateFlag _),
    "c14_sentinel" -> (c14Sentinel _),
    "t1_token_stats" -> (t1TokenStats _),
    "t2_quality" -> (t2Quality _),
    "t3_langid" -> (t3LangId _),
    "t4_fingerprint" -> (t4Fingerprint _),
    "t5_corpus_filter" -> (t5CorpusFilter _),
    "t6_ngram_counts" -> (t6NgramCounts _),
    "p10_group_insight" -> (p10GroupInsight _),
    "d1_exact_dedup" -> (d1ExactDedup _),
    "d2_minhash_lsh" -> (d2MinhashLsh _),
    "d2b_minhash_lsh_oracle" -> (d2bMinhashLshOracle _),
    "d3_simhash" -> (d3Simhash _),
    "d4_ngram_jaccard" -> (d4NgramJaccard _),
    "d4b_ngram_containment" -> (d4bNgramContainment _),
    "d5_embedding_neardup" -> (d5EmbeddingNearDup _),
    "d5b_embedding_neardup_lsh" -> (d5bEmbeddingNearDupLsh _),
    "d6_skew_guard" -> (d6SkewGuard _),
    "d7_neardup_components" -> (d7NeardupComponents _),
    "d7b_components_over_lsh" -> (d7bComponentsOverLsh _),
    "d8_semdedup" -> (d8Semdedup _),
    "d8b_semdedup_auto" -> (d8bSemdedupAuto _),
    "d8c_semdedup_hier" -> (d8cSemdedupHier _),
    "cp1_corpus_pipeline" -> (cp1CorpusPipeline _),
    "cp3_selective_pipeline" -> (cp3SelectivePipeline _),
    "dc1_decontaminate" -> (dc1Decontaminate _),
    "dc2_decontaminate_bloom" -> (dc2DecontaminateBloom _),
    "sp1_hash_split" -> (sp1HashSplit _),
    "sp2_stratified_sample" -> (sp2StratifiedSample _),
    "mix1_balance_upsample" -> (mix1BalanceUpsample _),
    "sp3_shuffle_order" -> (sp3ShuffleOrder _),
    "sq1_sequence_pack" -> (sq1SequencePack _),
    "t7_repetition" -> (t7Repetition _),
    "t8_gopher_gates" -> (t8GopherGates _),
    "pii1_redact" -> (pii1Redact _),
    "ld1_dup_lines" -> (ld1DupLines _),
    "sd1_dup_spans" -> (sd1DupSpans _),
    "sr1_span_rewrite" -> (sr1SpanRewrite _),
    "lr1_dedup_rewrite" -> (lr1DedupRewrite _),
    "ds1_dsir_select" -> (ds1DsirSelect _),
    "cp2_rewrite_pipeline" -> (cp2RewritePipeline _),
    "cp4_span_rewrite_pipeline" -> (cp4SpanRewritePipeline _),
    "cp5_full_pipeline" -> (cp5FullPipeline _),
    "cp5b_pipeline_mixture" -> (cp5bPipelineMixture _),
    "cp6_decontaminated_pipeline" -> (cp6DecontaminatedPipeline _),
    "lm1_bigram_score" -> (lm1BigramScore _),
    "ch1_chunks" -> (ch1Chunks _),
    "nd1_incremental_dedup" -> (nd1IncrementalDedup _),
    "nd2_incremental_neardup" -> (nd2IncrementalNearDup _),
    "nd3_incremental_semdedup" -> (nd3IncrementalSemDedup _),
    "nd2r_reloaded_neardup" -> (nd2rReloadedNearDup _),
    "nd3r_reloaded_semdedup" -> (nd3rReloadedSemDedup _),
    "nd4_compacted_semdedup" -> (nd4CompactedSemDedup _),
    "nd5_incremental_fuzzy" -> (nd5IncrementalFuzzy _),
    "nd5r_reloaded_fuzzy" -> (nd5rReloadedFuzzy _),
    "qc1_quality_classifier" -> (qc1QualityClassifier _),
    "url1_domain_filter" -> (url1DomainFilter _),
    "url2_canonicalize" -> (url2Canonicalize _),
    "url3_canonical_dedup" -> (url3CanonicalDedup _),
    "ks1_drift" -> (ks1Drift _),
    "assoc1_chi2" -> (assoc1Chi2 _),
    "assoc1b_cramers" -> (assoc1bCramers _),
    "ts1_resample" -> (ts1Resample _),
    "an1_rolling_anomaly" -> (an1RollingAnomaly _),
    "reg1_groupwise_trend" -> (reg1GroupwiseTrend _),
    "oh1_onehot" -> (oh1OneHot _),
    "te1_target_encode" -> (te1TargetEncode _),
    "fe1_quantile_bin" -> (fe1QuantileBin _),
    "sc1_minmax_scale" -> (sc1MinmaxScale _),
    "tm1_transitions" -> (tm1Transitions _),
    "pr1_pagerank" -> (pr1Pagerank _),
    "tc1_triangle_count" -> (tc1TriangleCount _),
    "tc2_clustering_coeff" -> (tc2ClusteringCoeff _),
    "ar1_assoc_rules" -> (ar1AssocRules _),
    "gini1_split_branches" -> (gini1SplitBranches _),
    "gini1b_split_stat" -> (gini1bSplitStat _),
    "gini2_feature_ranking" -> (gini2FeatureRanking _),
    "w6_streaks" -> (w6Streaks _),
    "w7_user_growth" -> (w7UserGrowth _),
    "churn1_hazard" -> (churn1Hazard _),
    "sc2_robust_scale" -> (sc2RobustScale _),
    "fe2_rolling_features" -> (fe2RollingFeatures _),
    "p15_histogram2d" -> (p15Histogram2d _),
    "p16_group_mode" -> (p16GroupMode _),
    "p17_group_median" -> (p17GroupMedian _),
    "ch2_sentences" -> (ch2Sentences _),
    "t9_readability" -> (t9Readability _),
    "sp5_systematic_sample" -> (sp5SystematicSample _),
    "cp7_sampled_pipeline" -> (cp7SampledPipeline _),
    "rfm1_segments" -> (rfm1Segments _),
    "pop1_period_growth" -> (pop1PeriodGrowth _),
    "pmi1_collocations" -> (pmi1Collocations _),
    "dv1_table_diff" -> (dv1TableDiff _),
    "sp4_group_split" -> (sp4GroupSplit _),
    "ewma1_smoothing" -> (ewma1Smoothing _),
    "ij1_interval_join" -> (ij1IntervalJoin _),
    "mix2_token_budget" -> (mix2TokenBudget _),
    "tok1_bpe_count" -> (tok1BpeCount _),
    "tok1r_reloaded_bpe" -> (tok1rReloadedBpe _),
    "tok2_bpe_fertility" -> (tok2BpeFertility _),
    "mix2b_token_budget_bpe" -> (mix2bTokenBudgetBpe _),
    "sq1b_sequence_pack_bpe" -> (sq1bSequencePackBpe _),
    "p11_approx_distinct" -> (p11ApproxDistinct _),
    "p11b_group_approx_distinct" -> (p11bGroupApproxDistinct _),
    "p12_approx_quantile_gate" -> (p12ApproxQuantileGate _),
    "p13_histogram" -> (p13Histogram _),
    "p14_corr_matrix" -> (p14CorrMatrix _),
    "prof1_merged_describe" -> (prof1MergedDescribe _),
    "cq1_corpus_report" -> (cq1CorpusReport _),
    "tt1_top_terms" -> (tt1TopTerms _),
    "s1_knn_bruteforce" -> (s1KnnBruteForce _),
    "s2_lsh_topk" -> (s2LshTopK _),
    "s3_ivf_topk" -> (s3IvfTopK _),
    "s3b_ivf_topk_hier" -> (s3bIvfTopKHier _),
    "qz1_embedding_quantize" -> (qz1EmbeddingQuantize _),
    "s4_quant_topk" -> (s4QuantTopK _),
    "e3_centroids" -> (e3Centroids _),
    "mm1_image_meta" -> (mm1ImageMeta _),
    "mm2_frames" -> (mm2Frames _),
    "mm3_media_embed" -> (mm3MediaEmbed _),
    "mix3_temperature_mix" -> (mix3TemperatureMix _),
    "mix4_repeat_cap" -> (mix4RepeatCap _),
    "ccn1_quality_buckets" -> (ccn1QualityBuckets _),
    "dc3_semantic_decontaminate" -> (dc3SemanticDecontaminate _),
    "rp1_random_projection" -> (rp1RandomProjection _),
    "s5_rp_topk" -> (s5RpTopK _),
    "fj1_fuzzy_join" -> (fj1FuzzyJoin _),
    "er1_entity_resolution" -> (er1EntityResolution _),
    "dq1_rule_audit" -> (dq1RuleAudit _),
    "drift1_numeric" -> (drift1Numeric _),
    "drift2_categorical" -> (drift2Categorical _),
    "scd1_history" -> (scd1History _),
    "bm25_topk" -> (bm25TopDocs _),
    "s6_pq_topk" -> (s6PqTopK _),
    "s7_ivfpq_topk" -> (s7IvfPqTopK _),
    "c11b_fuzzy_canon" -> (c11bFuzzyCanon _),
    "s6r_reloaded_pq" -> (s6rReloadedPq _),
    "bm25b_indexed" -> (bm25bIndexed _),
    "fn1_funnel" -> (fn1Funnel _),
    "coh1_cohorts" -> (coh1Cohorts _),
    "drift3_multi" -> (drift3Multi _),
    "drift4_by_segment" -> (drift4BySegment _),
    "scd1b_incremental_history" -> (scd1bIncrementalHistory _),
    "h1_html_extract" -> (h1HtmlExtract _),
    "cp8_html_pipeline" -> (cp8HtmlPipeline _),
    "fj2_jw_join" -> (fj2JwJoin _),
    "pp1_partition_pruning" -> (pp1PartitionPruning _),
    "dpp1_dynamic_pruning" -> (dpp1DynamicPruning _),
    "pp2_rowgroup_skipping" -> (pp2RowGroupSkipping _),
    "orc1_orc_relayout" -> (orc1OrcRelayout _),
    "pp3_zorder_skipping" -> (pp3ZOrderSkipping _),
    "mm4_jvm_decode" -> (mm4JvmDecode _),
    "mm5_committed_media" -> (mm5CommittedMediaDecode _),
    "p11c_sharded_sketch_merge" -> (p11cShardedSketchMerge _),
    "q4_priority_exists" -> (q4PriorityExists _),
    "q7_nation_volume" -> (q7NationVolume _),
    "q8_market_share" -> (q8MarketShare _),
    "h2_link_graph" -> (h2LinkGraph _),
    "w8_ntile_bands" -> (w8NtileBands _),
    "sj1_salted_join" -> (sj1SaltedJoin _),
    "hh1_heavy_hitters" -> (hh1HeavyHitters _),
    "hh2_sketch_heavy_hitters" -> (hh2SketchHeavyHitters _),
    "lp1_link_communities" -> (lp1LinkCommunities _),
    "th1_theta_segments" -> (th1ThetaSegments _),
    "zipf1_zipf_slope" -> (zipf1ZipfSlope _),
    "p11d_durable_sketch_merge" -> (p11dDurableSketchMerge _),
    "kll1_quantile_sketch" -> (kll1QuantileSketch _),
    "kll2_grouped_quantiles" -> (kll2GroupedQuantiles _),
    "rs1_reservoir_sample" -> (rs1ReservoirSample _),
    "vo1_varopt_sample" -> (vo1VaroptSample _),
    "cf1_small_file_compaction" -> (cf1SmallFileCompaction _),
    "mf1_manifest_pruning" -> (mf1ManifestPruning _),
    "mf2_metadata_only_agg" -> (mf2MetadataOnlyAgg _),
    "lc1_lakehouse_lifecycle" -> (lc1LakehouseLifecycle _),
    "tt1_snapshot_delete" -> (tt1SnapshotDelete _),
    "cdc1_change_feed" -> (cdc1ChangeFeed _),
    "up1_snapshot_upsert" -> (up1SnapshotUpsert _),
    "se1_schema_evolution" -> (se1SchemaEvolution _),
    "ap1_stream_ingest" -> (ap1StreamIngest _),
    "pp4_composite_pruning" -> (pp4CompositePruning _),
    "p11e_streaming_sketch_index" -> (p11eStreamingSketchIndex _),
    "mm6_dhash_neardup" -> (mm6DHashNearDup _),
    "mm7_audio_neardup" -> (mm7AudioNearDup _),
    "pp5_page_skipping" -> (pp5PageSkipping _),
    "w9_next_order" -> (w9NextOrder _),
    "ts3_seasonal_baseline" -> (ts3SeasonalBaseline _),
    "t10_control_scrub" -> (t10ControlScrub _),
    "dq2_fd_audit" -> (dq2FdAudit _),
    "q13_custdist" -> (q13CustDist _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q22_sleeping_customers" -> (q22SleepingCustomers _),
    "q19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "c16_temporal_audit" -> (c16TemporalAudit _),
    "p20_entropy_profile" -> (p20EntropyProfile _),
    "mor1_merge_on_read_delete" -> (mor1MergeOnReadDelete _),
    "cdc2_row_tagged_feed" -> (cdc2RowTaggedFeed _),
    "ss1_snapshot_source_fold" -> (ss1SnapshotSourceFold _),
    "mf3_two_column_manifest" -> (mf3TwoColumnManifest _),
    "se2_rename_widen" -> (se2RenameWiden _),
    "se3_drop_column" -> (se3DropColumn _),
    "oz1_optimize_zorder" -> (oz1OptimizeZOrder _),
    "mor2_key_erasure" -> (mor2KeyErasure _),
    "rep1_cdc_replica" -> (rep1CdcReplica _),
    "bf1_bloom_point_lookup" -> (bf1BloomPointLookup _),
    "oc1_incremental_binpack" -> (oc1IncrementalBinPack _),
    "mc1_incremental_manifest" -> (mc1IncrementalManifest _),
    "ms1_manifest_stats" -> (ms1ManifestStats _),
    "tt2_timestamp_travel" -> (tt2TimestampTravel _),
    "tt3_restore" -> (tt3Restore _),
    "mor3_merge_on_read_upsert" -> (mor3MergeOnReadUpsert _),
    "bf2_distributed_bloom" -> (bf2DistributedBloom _),
    "mf4_snapshot_metadata_agg" -> (mf4SnapshotMetadataAgg _),
    "pp6_snapshot_zone_read" -> (pp6SnapshotZoneRead _),
    "vc1_vacuum_retention" -> (vc1VacuumRetention _),
    "hist1_describe_history" -> (hist1DescribeHistory _),
    "bf3_snapshot_point_lookup" -> (bf3SnapshotPointLookup _),
    "pp7_snapshot_zorder_read" -> (pp7SnapshotZorderRead _),
    "mc2_parquet_checkpoint" -> (mc2ParquetCheckpoint _),
    "pp8_string_zone_read" -> (pp8StringZoneRead _),
    "sql1_dsv2_pushdown_read" -> (sql1DsvPushdownRead _),
    "ss2_native_stream_fold" -> (ss2NativeStreamFold _),
    "wr1_dsv2_write" -> (wr1DsvWrite _),
    "ss3_dsv2_stream_sink" -> (ss3DsvStreamSink _),
    "sql2_catalog_sql" -> (sql2CatalogSql _),
    "sql3_sql_maintenance" -> (sql3SqlMaintenance _),
    "sql4_sql_delete" -> (sql4SqlDelete _),
    "sql5_sql_merge" -> (sql5SqlMerge _),
    "sql6_sql_update" -> (sql6SqlUpdate _),
    "arr1_dsv2_array_read" -> (arr1DsvArrayRead _),
    "sql7_cdc_catalog" -> (sql7CdcThroughCatalog _),
    "mf5_count_pushdown" -> (mf5CountPushdown _),
    "rf1_runtime_file_skip" -> (rf1RuntimeFileSkip _),
    "mt1_compact_sidecars" -> (mt1CompactSidecars _),
    "spj1_bucketed_join" -> (spj1BucketedJoin _),
    "spj2_bucket_pruned_lookup" -> (spj2BucketPrunedLookup _),
    "eq1_equality_upsert" -> (eq1EqualityUpsert _)
  )
}
