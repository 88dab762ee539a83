package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cleaning operators — the reference's C1–C14 surface
  * (SURVEY.md §2.3, mandated at `tool_call_agent.py:137-139`) re-expressed as
  * composable `DataFrame => DataFrame` transformations.
  *
  * Semantics pinned to the committed golden artifacts (SURVEY.md §2.4):
  *  - median/mean/mode imputation computed over the *input* frame, exact
  *    values (pandas parity), applied before any row drop;
  *  - mode tie-break = smallest value (pandas `mode()[0]`);
  *  - stddev is sample stddev (ddof=1 = `stddev_samp`);
  *  - 3σ filter keeps rows within |x−μ| ≤ 3σ on EVERY listed column.
  *
  * Scale design notes: statistics that feed an imputation are tiny scalar
  * aggregates (one job each, map-side combined); they are collected to the
  * driver and re-broadcast as literals — the standard Spark pattern for
  * "aggregate, then map with the aggregate". Exact medians use
  * `approxQuantile(relativeError=0)` for golden parity; at 100 TB pass
  * `relativeError=1e-4` (fixed-memory Greenwald-Khanna sketch) — the switch
  * is a parameter, not a rewrite.
  */
object Cleaning {

  // ---------------------------------------------------------------- C1
  /** Exact column median (pandas parity: linear interpolation). */
  def exactMedian(df: DataFrame, c: String): Option[Double] = {
    val r = df.select(percentile(col(c).cast("double"), lit(0.5)).as("m")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  /** Exact interpolated quantiles, scalable: bracket-and-refine.
    *
    * The `percentile` aggregate buffers every distinct value and merges the
    * maps single-threaded at the final stage — fine to ~1M rows, a wall at
    * cluster scale (and a full RDD sort boxes every value). Instead:
    * (1) bracket the target rank with a Greenwald-Khanna approxQuantile
    * (fixed-memory sketch, rank error ≤ εn); (2) count rows strictly below
    * the bracket (columnar scan); (3) collect and sort only the ~εn values
    * inside the bracket; (4) pick the two exact ranks and interpolate with
    * the quantile_cont formula `lo + (h − ⌊h⌋)·(hi − lo)`, h = (n−1)·p.
    * Small frames skip straight to a local sort.
    */
  def exactQuantilesDistributed(df: DataFrame, c: String, ps: Seq[Double]): Seq[Option[Double]] =
    ps.map(p => exactQuantilesMulti(df, Seq(c), p).get(c))

  private def interp(n: Long, p: Double, pick: Long => Double): Double = {
    val h = (n - 1) * p
    val lo = math.floor(h).toLong
    val vlo = pick(lo)
    if (math.ceil(h).toLong == lo) vlo
    else {
      val vhi = pick(lo + 1)
      // DuckDB quantile_cont arithmetic EXACTLY (empirically verified):
      // weighted form vlo*(1-f) + vhi*f — NOT vlo + f*(vhi-vlo), which
      // drifts in the last ulp at uneven quantile points.
      val f = h - lo
      vlo * (1 - f) + vhi * f
    }
  }

  /** Cap on values collected to the driver per column for an exact
    * quantile: ~1M doubles ≈ 8 MB. Keeps the bracket-and-refine plan
    * driver-safe at ANY row count (the window would otherwise grow as εn).
    */
  val DefaultQuantileWindowBudget: Long = 1L << 20

  /** All listed columns' exact p-quantile in TWO jobs for any column that
    * fits the driver budget, THREE beyond it — independent of column count:
    * (1) one codegen'd aggregate computing per-column counts (plus any
    * caller-fused extras — see [[exactQuantilesMultiFused]]); (2) columns
    * with ≤ `windowBudget` non-null values are collected outright (sorted
    * collect_list — the budget IS the driver bound, so no sketch is
    * needed); larger columns take (2') one `percentile_approx` bracket
    * aggregate (rank error ≤ 5e-4·n; an aggregate column, not a separate
    * RDD pass) and (3) one conditional aggregate collecting each column's
    * base rank + in-bracket window.
    *
    * The collected in-bracket window spans ~5εn ranks (ε = 1e-3), bounded
    * by `windowBudget` values per column: when even that window would
    * overflow the budget (n ≳ 400·budget — multi-hundred-million-row
    * columns at the default), the plan switches to iterative re-bracketing:
    * count the window, re-sketch INSIDE it at the rank the quantile needs,
    * repeat until it fits, then collect. Each round shrinks the window, so
    * even 10¹²-row columns converge in a few rounds.
    */
  def exactQuantilesMulti(df: DataFrame, cols: Seq[String], p: Double): Map[String, Double] =
    exactQuantilesMultiStats(df, cols, p, DefaultQuantileWindowBudget)._1

  /** Stats variant for specs: also returns the per-column count of values
    * actually collected to the driver (the bound under test).
    */
  private[graft] def exactQuantilesMultiStats(
      df: DataFrame,
      cols: Seq[String],
      p: Double,
      windowBudget: Long): (Map[String, Double], Map[String, Long]) = {
    val (q, w, _) = exactQuantilesMultiFused(df, cols, p, windowBudget, Nil)
    (q, w)
  }

  /** Fused variant: `extraAggs` are evaluated in the SAME first-job
    * aggregate as the counts and sketch brackets and returned in the Row —
    * callers like p5_describe ride their moments on the quantile scan, so
    * a full describe is two table scans total. `extraAggs` must reference
    * only the cast-to-double projections of `cols` (aliases must not
    * collide with the column names themselves or a `__qb_` prefix).
    */
  private[graft] def exactQuantilesMultiFused(
      df: DataFrame,
      cols: Seq[String],
      p: Double,
      windowBudget: Long,
      extraAggs: Seq[Column]): (Map[String, Double], Map[String, Long],
        org.apache.spark.sql.Row) = {
    val d = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    // Job 1: counts + caller extras only — codegen'd (percentile_approx
    // would force the whole aggregate into interpreted ObjectHashAggregate,
    // slowing the fused moments; it gets its own job only when needed).
    val firstAggs: Seq[Column] = cols.map(c => count(col(c)).as(c)) ++ extraAggs
    val cntRow = d.agg(firstAggs.head, firstAggs.tail: _*).head()
    val ns = cols.map(c => c -> cntRow.getAs[Long](c)).toMap
    val present = cols.filter(ns(_) > 0)
    if (present.isEmpty) return (Map.empty, Map.empty, cntRow)

    if (present.map(ns).max <= windowBudget) {
      // every column fits the driver budget outright: collect-and-sort, no
      // sketch pass at all (the budget is the documented driver bound)
      val listRow = d.agg(
        sort_array(collect_list(col(present.head))).as(present.head),
        present.tail.map(c => sort_array(collect_list(col(c))).as(c)): _*).head()
      val out = present.map { c =>
        val sorted = listRow.getSeq[Double](listRow.fieldIndex(c))
        c -> interp(ns(c), p, i => sorted(i.toInt))
      }.toMap
      (out, present.map(c => c -> ns(c)).toMap, cntRow)
    } else {
      // ε trades sketch cost against window size; 1e-3 keeps the bracket
      // aggregate cheap while the window (~5εn) fits the default budget to
      // n ≈ 4e8 rows per column
      val eps = 1e-3
      val pl = math.max(0.0, p - 2 * eps)
      val ph = math.min(1.0, p + 2 * eps)
      val sketchAggs = present.map(c =>
        percentile_approx(col(c), array(lit(pl), lit(ph)), lit((2 / eps).toInt))
          .as(s"__qb_$c"))
      val skRow = d.agg(sketchAggs.head, sketchAggs.tail: _*).head()
      val nMax = present.map(ns).max
      val brackets = present.map { c =>
        val arr = skRow.getSeq[Double](skRow.fieldIndex(s"__qb_$c"))
        c -> (arr(0), arr(1))
      }.toMap

      if (5.0 * eps * nMax <= 2.0 * windowBudget) {
        // predicted windows fit: the fused two-job path
        val aggs = present.flatMap { c =>
          val (a, b) = brackets(c)
          Seq(
            sum(when(col(c) < a, 1L).otherwise(0L)).as(s"__base_$c"),
            sort_array(collect_list(when(col(c) >= a && col(c) <= b, col(c))))
              .as(s"__win_$c"))
        }
        val row = d.agg(aggs.head, aggs.tail: _*).head()
        val picked = present.map { c =>
          val (a, b) = brackets(c)
          if (a == b) (c -> a, c -> 0L)
          else {
            val base = row.getAs[Long](s"__base_$c")
            val win = row.getSeq[Double](row.fieldIndex(s"__win_$c"))
            def pick(r: Long): Double = {
              val idx = (r - base).toInt
              win(math.min(math.max(idx, 0), win.length - 1))
            }
            (c -> interp(ns(c), p, pick), c -> win.length.toLong)
          }
        }
        (picked.map(_._1).toMap, picked.map(_._2).toMap, cntRow)
      } else {
        // n so large that even the ε=2e-4 window overflows the budget
        // (n ≳ 2000·budget): per-column iterative re-bracketing. Extra jobs
        // only on this path, never at ordinary scale.
        val picked = present.map { c =>
          val (v, w) = refineAndPick(d, c, ns(c), p, brackets(c), windowBudget)
          (c -> v, c -> w)
        }
        (picked.map(_._1).toMap, picked.map(_._2).toMap, cntRow)
      }
    }
  }

  /** Shrink the bracket [a,b] around the target global ranks until the
    * in-bracket window fits `budget`, then collect + interpolate. Each round
    * is one count aggregate and (if still too big) one GK sketch over the
    * bracketed rows at the LOCAL fraction of the needed ranks. Ties collapse
    * the bracket to a single value (exact answer, nothing collected); the
    * round cap is a safety valve — on pathological no-progress distributions
    * the final round collects whatever the window holds (correct, just
    * bigger than budget).
    */
  private def refineAndPick(d: DataFrame, c: String, n: Long, p: Double,
      bracket0: (Double, Double), budget: Long): (Double, Long) = {
    val h = (n - 1) * p
    val rLo = math.floor(h).toLong
    val rHi = math.min(rLo + 1, n - 1)
    var (a, b) = bracket0
    var iter = 0
    while (true) {
      if (a == b) return (a, 0L)
      val row = d.agg(
        sum(when(col(c) < a, 1L).otherwise(0L)).as("base"),
        sum(when(col(c) >= a && col(c) <= b, 1L).otherwise(0L)).as("m")).head()
      val base = row.getLong(0)
      val m = row.getLong(1)
      if (m <= budget || iter >= 5) {
        val win = d.where(col(c) >= a && col(c) <= b)
          .agg(sort_array(collect_list(col(c)))).head().getSeq[Double](0)
        def pick(r: Long): Double =
          win(math.min(math.max((r - base).toInt, 0), win.length - 1))
        return (interp(n, p, pick), win.length.toLong)
      }
      val e = 5e-3
      val denom = math.max(m - 1, 1L).toDouble
      val fLo = math.max(0.0, (rLo - base).toDouble / denom - 2 * e)
      val fHi = math.min(1.0, (rHi - base).toDouble / denom + 2 * e)
      val arr = d.where(col(c) >= a && col(c) <= b)
        .stat.approxQuantile(c, Array(fLo, fHi), e / 2)
      a = arr(0)
      b = arr(1)
      iter += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** C1: fill nulls in each column with that column's median — ALL columns'
    * medians in one aggregate job (one table scan however many columns are
    * imputed). Exact by default (pandas parity); `relativeError > 0`
    * switches to the fixed-memory Greenwald-Khanna sketch for huge tables.
    */
  def imputeMedian(cols: Seq[String], relativeError: Double = 0.0)(df: DataFrame): DataFrame = {
    val fills: Map[String, Double] =
      if (relativeError == 0.0) exactQuantilesMulti(df, cols, 0.5)
      else {
        val doubled = cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))
        cols.zip(doubled.stat.approxQuantile(cols.toArray, Array(0.5), relativeError))
          .flatMap { case (c, q) => q.headOption.map(c -> _) }.toMap
      }
    df.na.fill(fills)
  }

  // ---------------------------------------------------------------- C2
  /** C2: fill nulls with the column mean (one fused agg job for all cols). */
  def imputeMean(cols: Seq[String])(df: DataFrame): DataFrame = {
    val row = df.agg(avg(col(cols.head)).as(cols.head),
      cols.tail.map(c => avg(col(c)).as(c)): _*).head()
    val fills = cols.flatMap(c =>
      if (row.isNullAt(row.fieldIndex(c))) None else Some(c -> row.getAs[Double](c))).toMap
    df.na.fill(fills)
  }

  // ---------------------------------------------------------------- C3
  /** Mode with the pinned tie-break: highest count, then smallest value
    * (pandas `mode()[0]` — verified on the golden run where `2024-05-13`
    * beat the equal-count `2025-03-28`, SURVEY.md §2.4).
    */
  def pinnedMode(df: DataFrame, c: String): Option[Any] = {
    val r = df
      .where(col(c).isNotNull)
      .groupBy(col(c))
      .agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col(c).asc)
      .limit(1)
      .collect()
    r.headOption.map(_.get(0))
  }

  /** All columns' pinned-tie-break modes in ONE pass: explode each row into
    * (column, value) pairs, count, argmax per column via min_by-over-struct
    * with the (count desc, value asc) tie-break encoded in the struct
    * ordering. One scan + one shuffle regardless of column count (vs one
    * groupBy job per column).
    *
    * The tie-break compares the column's NATIVE order, not the string form:
    * numeric columns carry a double sort key (so 9.0 < 10.0, not
    * "10.0" < "9.0"), everything else falls through to the string value
    * (exact for ISO dates/timestamps and booleans) — matching single-column
    * [[pinnedMode]] and pandas `mode()[0]`.
    */
  def pinnedModes(df: DataFrame, cols: Seq[String]): Map[String, String] = {
    import org.apache.spark.sql.types.NumericType
    def numKey(c: String): Column = df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case _ => lit(null).cast("double")
    }
    val pairs = df.select(explode(map(
      cols.flatMap(c => Seq(lit(c),
        struct(col(c).cast("string").as("s"), numKey(c).as("n")))): _*))
        .as(Seq("__col", "__val")))
      .where(col("__val.s").isNotNull)
    pairs
      .groupBy(col("__col"), col("__val"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("__col"))
      // min_by over (-count, numKey, value): highest count first, then the
      // SMALLEST value in the column's own order — pandas mode()[0].
      .agg(min_by(col("__val.s"), struct((-col("__cnt")).as("nc"),
        col("__val.n").as("n"), col("__val.s").as("s"))).as("__mode"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
  }

  /** C3: fill nulls with the (pinned-tie-break) mode — one pass for all
    * columns; values are re-cast to each column's type by `na.fill`'s
    * string-coercion (string/numeric/date columns all round-trip exactly).
    */
  def imputeMode(cols: Seq[String])(df: DataFrame): DataFrame = {
    val modes = pinnedModes(df, cols)
    cols.foldLeft(df) { (d, c) =>
      modes.get(c) match {
        case Some(m) =>
          d.withColumn(c, coalesce(col(c), lit(m).cast(d.schema(c).dataType)))
        case None => d
      }
    }
  }

  // ---------------------------------------------------------------- C4
  /** C4: fill nulls with a derived scalar from another column, e.g.
    * `last_promo_date <- min(join_date)` ("never promoted" placeholder,
    * `stash/dirty_hr_final_clean_report.txt:12`).
    */
  def imputeDerived(target: String, derive: DataFrame => Any)(df: DataFrame): DataFrame =
    df.withColumn(target, coalesce(col(target), lit(derive(df))))

  /** Common derivation: min of a column. */
  def minOf(c: String): DataFrame => Any = df => df.agg(min(col(c))).head().get(0)

  // ---------------------------------------------------------------- C5
  /** C5: drop rows with a null in any of the listed critical columns. */
  def dropNullRows(cols: Seq[String])(df: DataFrame): DataFrame =
    df.na.drop("any", cols)

  // ---------------------------------------------------------------- C6/C7 shared
  /** Per-column (mean, stddev_samp) in one fused job. */
  def meanStd(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"__m_$c"), stddev_samp(col(c)).as(s"__s_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.flatMap { c =>
      val (mi, si) = (row.fieldIndex(s"__m_$c"), row.fieldIndex(s"__s_$c"))
      if (row.isNullAt(mi) || row.isNullAt(si)) None
      else Some(c -> (row.getDouble(mi), row.getDouble(si)))
    }.toMap
  }

  // ---------------------------------------------------------------- C6
  /** C6: remove rows more than `z` sample standard deviations from the mean
    * in ANY listed column (null cells pass — pandas comparison-with-NaN is
    * false, so NaN rows are not flagged as outliers; verified §2.4).
    */
  def zscoreFilter(cols: Seq[String], z: Double = 3.0)(df: DataFrame): DataFrame = {
    val stats = meanStd(df, cols)
    val keep = cols
      .flatMap(c => stats.get(c).map { case (m, s) =>
        col(c).isNull || s === 0.0 || abs((col(c) - m) / s) <= z
      })
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    df.where(keep)
  }

  private implicit class DoubleGuard(private val s: Double) extends AnyVal {
    def ===(x: Double): Column = lit(s == x)
  }

  // --------------------------------------------------------------- C6b
  /** C6b: ROBUST outlier filter — median/MAD in place of C6's mean/σ.
    * A 3σ cut is computed FROM the outliers it is trying to remove (one
    * 1e9 sentinel drags the mean past every legitimate row); the median
    * and the median-absolute-deviation have a 50% breakdown point, so the
    * fence survives arbitrarily wild contamination. `k`·1.4826·MAD is the
    * σ-consistent fence (1.4826 ≈ 1/Φ⁻¹(3/4) rescales MAD to σ under
    * normality), so k=3 matches C6's nominal strictness on clean data.
    *
    * Null cells pass (the C6 pandas convention); a zero MAD (≥50% of the
    * column at one value) disables the fence for that column rather than
    * dropping every non-modal row.
    *
    * Scale shape: two [[exactQuantilesMulti]] rounds (medians of all
    * listed columns fused in one pass, then MADs of all deviation columns
    * in a second) — 4 bounded jobs total for ANY column count, each
    * driver-safe under the quantile window budget; the filter itself is
    * one map-only predicate.
    */
  def robustOutlierFilter(cols: Seq[String], k: Double = 3.0)(df: DataFrame): DataFrame = {
    val meds = exactQuantilesMulti(df, cols, 0.5)
    val present = cols.filter(meds.contains)
    if (present.isEmpty) return df
    val devFrame = df.select(present.map(c =>
      abs(col(c) - lit(meds(c))).as(s"__dev_$c")): _*)
    val mads = exactQuantilesMulti(devFrame, present.map(c => s"__dev_$c"), 0.5)
    val keep = present.flatMap { c =>
      mads.get(s"__dev_$c").collect { case mad if mad != 0.0 =>
        col(c).isNull ||
          abs(col(c) - lit(meds(c))) <= lit(k) * (lit(1.4826) * lit(mad))
      }
    }.reduceOption(_ && _).getOrElse(lit(true))
    df.where(keep)
  }

  // ---------------------------------------------------------------- C7
  /** C7: two-phase variant — outliers beyond `z`σ become null, then the
    * caller imputes (`stash/dirty_hr_report.txt:15`).
    */
  def outlierToNull(cols: Seq[String], z: Double = 3.0)(df: DataFrame): DataFrame = {
    val stats = meanStd(df, cols)
    cols.foldLeft(df) { (d, c) =>
      stats.get(c) match {
        case Some((m, s)) if s != 0.0 =>
          d.withColumn(c, when(abs((col(c) - m) / s) > z, lit(null)).otherwise(col(c)))
        case _ => d
      }
    }
  }

  // ---------------------------------------------------------------- C8
  /** C8: winsorize — cap values above the `p` quantile at that quantile
    * (salary capped at 95th pctile, `graph_proj/README.md:108`).
    */
  def percentileCap(cols: Seq[String], p: Double = 0.95, relativeError: Double = 0.0)(
      df: DataFrame): DataFrame = {
    val caps = df.stat.approxQuantile(cols.toArray, Array(p), relativeError)
    cols.zip(caps).foldLeft(df) { case (d, (c, capArr)) =>
      capArr.headOption match {
        case Some(cap) => d.withColumn(c, least(col(c), lit(cap)))
        case None      => d
      }
    }
  }

  // ---------------------------------------------------------------- C9
  /** C9: exact duplicate-row removal; `keyCols` nonempty = keyed dedup
    * (reference deduped on `Email`). For a DETERMINISTIC representative per
    * key use [[Dedup.exactByKey]]; this variant keeps Spark's arbitrary
    * first-seen row (the reference's `drop_duplicates` semantics).
    */
  def dropDuplicateRows(keyCols: Seq[String] = Nil)(df: DataFrame): DataFrame =
    if (keyCols.isEmpty) df.dropDuplicates() else df.dropDuplicates(keyCols)

  // ---------------------------------------------------------------- C10
  /** C10: whitespace/case normalization of string categoricals. */
  def normalizeStrings(
      cols: Seq[String],
      trimWs: Boolean = true,
      caseMode: String = "none" // none | lower | upper | title
  )(df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val t0 = if (trimWs) trim(col(c)) else col(c)
      val t1 = caseMode match {
        case "lower" => lower(t0)
        case "upper" => upper(t0)
        case "title" => initcap(t0)
        case _       => t0
      }
      d.withColumn(c, t1)
    }

  // ---------------------------------------------------------------- C11
  /** C11: canonicalize typo/variant values via an explicit mapping
    * (`enginr -> Engineer`, `Germny -> Germany`, `graph_proj/README.md:109`).
    * Small maps compile to a codegen'd CASE chain; large dictionaries should
    * use [[canonicalizeViaDictionary]] (broadcast join) instead.
    */
  def canonicalize(c: String, mapping: Map[String, String])(df: DataFrame): DataFrame = {
    val expr = mapping.foldLeft(col(c)) { case (acc, (from, to)) =>
      when(col(c) === from, lit(to)).otherwise(acc)
    }
    df.withColumn(c, expr)
  }

  /** C11 at scale: broadcast-join against a canonical dictionary table
    * (variant, canonical). Keeps the fact-table scan shuffle-free.
    */
  def canonicalizeViaDictionary(c: String, dict: DataFrame)(df: DataFrame): DataFrame = {
    val d = broadcast(dict.select(col("variant"), col("canonical")).dropDuplicates("variant"))
    df.join(d, df(c) === d("variant"), "left")
      .withColumn(c, coalesce(col("canonical"), col(c)))
      .drop("variant", "canonical")
  }

  /** C11 without a variant list: canonicalize against the DICTIONARY ONLY,
    * snapping any value within `maxDist` edits of a canonical form to it —
    * the cleaning op for typos nobody enumerated. Nearest entry wins; ties
    * break to the lexicographically smallest (array_min over
    * (distance, value) structs). Values with no entry within range pass
    * through unchanged.
    *
    * Fully MAP-ONLY: the dictionary rides the plan as a literal array and
    * each row runs |dict| codegen'd `levenshtein` calls — no join, no
    * shuffle, no explode. Right for the canonical-map regime (tens to
    * hundreds of entries); for dictionary-vs-corpus matching at larger
    * sizes use [[FuzzyJoin.fuzzyJoin]], whose deletion-neighborhood
    * blocking keeps both sides bucket-local.
    */
  def fuzzyCanonicalize(c: String, dict: Seq[String], maxDist: Int = 1)(
      df: DataFrame): DataFrame = {
    require(dict.nonEmpty, "empty dictionary")
    val entries = array(dict.distinct.sorted.map(lit): _*)
    val best = array_min(filter(
      transform(entries, d => struct(levenshtein(col(c), d).as("d"), d.as("v"))),
      s => s.getField("d") <= maxDist))
    df.withColumn(c,
      when(col(c).isNotNull && best.isNotNull, best.getField("v"))
        .otherwise(col(c)))
  }

  // ---------------------------------------------------------------- C12
  /** C12: categorical -> boolean canonicalization (`Y/Yes/N/No/blank`). */
  def booleanize(
      c: String,
      trueValues: Seq[String] = Seq("Y", "Yes", "True", "true", "1"),
      falseValues: Seq[String] = Seq("N", "No", "False", "false", "0")
  )(df: DataFrame): DataFrame =
    df.withColumn(
      c,
      when(trim(col(c)).isin(trueValues: _*), lit(true))
        .when(trim(col(c)).isin(falseValues: _*), lit(false))
        .otherwise(lit(null).cast("boolean")))

  // ---------------------------------------------------------------- C13
  /** C13: parse a string date column and flag impossible future dates
    * ("validation of 'Date Joined' for future dates",
    * `graph_proj/README.md:113`). Adds `<c>_is_future`.
    */
  def parseDates(c: String, format: String = "yyyy-MM-dd", asOf: Option[java.sql.Date] = None)(
      df: DataFrame): DataFrame = {
    val parsed = to_date(col(c), format)
    val ref: Column = asOf.map(d => lit(d)).getOrElse(current_date())
    df.withColumn(c, parsed).withColumn(s"${c}_is_future", parsed > ref)
  }

  // ---------------------------------------------------------------- C14
  /** C14: sentinel strings -> null (the `"N/A"` salaries in `dirty.csv`),
    * then optional numeric cast.
    */
  def sentinelToNull(cols: Seq[String], sentinels: Seq[String] = Seq("N/A", "NA", "null", ""))(
      df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(trim(col(c)).isin(sentinels: _*), lit(null)).otherwise(col(c)))
    }

  def castNumeric(cols: Seq[String])(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))

  // ---------------------------------------------------------------- C16
  /** C16: dictionary one-hot encoding — one 0/1 LONG indicator column per
    * listed category (`<prefix>_<sanitized category>`), the model-prep
    * step after categorical cleanup. Map-only (a row of `when`s, codegen'd,
    * no shuffle); the EXPLICIT dictionary is the scale design: deriving it
    * would be a distinct-scan, and training pipelines pin feature columns
    * anyway (a drifting category set silently reshapes the matrix). Values
    * outside the dictionary (and nulls) encode as all-zeros.
    */
  def oneHot(c: String, categories: Seq[String], prefix: String)(
      df: DataFrame): DataFrame =
    categories.foldLeft(df) { (d, cat) =>
      val name = s"${prefix}_" +
        cat.toLowerCase.replaceAll("[^a-z0-9]+", "_").stripSuffix("_")
      d.withColumn(name,
        when(col(c) === lit(cat), lit(1L)).otherwise(lit(0L)))
    }
}
