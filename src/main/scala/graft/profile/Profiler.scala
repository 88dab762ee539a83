package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column numeric statistics (reference P5/P7, `tool_call_agent.py:136`).
  * `stddev` is sample stddev (ddof=1), matching pandas `std()`.
  */
final case class NumericStats(
    column: String,
    count: Long,
    mean: Option[Double],
    stddev: Option[Double],
    min: Option[Double],
    p25: Option[Double],
    median: Option[Double],
    p75: Option[Double],
    max: Option[Double])

/** The memoized "basic info" profile the reference caches per CSV
  * (`system.txt:2`, SURVEY.md §2.2): schema, shape, null counts, numeric
  * stats, duplicate-row count, top values for categoricals.
  */
final case class Profile(
    columns: Seq[(String, String)], // (name, dtype)  — P1/P4
    rowCount: Long, //                                  P2
    nullCounts: Map[String, Long], //                   P6
    numericStats: Seq[NumericStats], //                 P5/P7
    duplicateRowCount: Long //                          P8
) {
  def shape: (Long, Int) = (rowCount, columns.size)
  def hasNulls: Boolean = nullCounts.values.exists(_ > 0)
}

/** Single-pass profiler.
  *
  * Scale design: everything except percentiles is fused into ONE aggregate
  * job over the table (count + per-column null counts + mean/stddev/min/max),
  * so a 100 TB scan happens once, map-side-combined. Exact percentiles
  * (`relativeError=0`, needed for pandas-parity golden tests) are a second
  * pass via `approxQuantile`; at scale callers pass `percentileError > 0`
  * to keep that pass a fixed-size sketch (Greenwald-Khanna) instead of a
  * full sort.
  */
object Profiler {

  def numericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case StructField(n, _: NumericType, _, _) => n
    }.toSeq

  def apply(df: DataFrame, percentileError: Double = 0.0): Profile = {
    val cols = df.columns.toSeq
    val numCols = numericColumns(df)

    // One fused aggregation: row count, null count per column, and the
    // moment statistics per numeric column. Single shuffle-free job
    // (global agg -> partial + final).
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++
        cols.map(c => sum(col(c).isNull.cast("long")).as(s"__null__$c")) ++
        numCols.flatMap { c =>
          Seq(
            count(col(c)).as(s"__cnt__$c"),
            avg(col(c)).as(s"__mean__$c"),
            stddev_samp(col(c)).as(s"__std__$c"),
            min(col(c)).cast("double").as(s"__min__$c"),
            max(col(c)).cast("double").as(s"__max__$c"))
        }
    val row = df.agg(aggs.head, aggs.tail: _*).head()

    val rowCount = row.getAs[Long]("__n")
    val nulls = cols.map(c => c -> row.getAs[Long](s"__null__$c")).toMap

    // Exact (or ε-approximate) quartiles in one multi-column call.
    val quantiles: Map[String, Array[Double]] =
      if (numCols.isEmpty) Map.empty
      else {
        val doubled = numCols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))
        numCols
          .zip(doubled.stat.approxQuantile(numCols.toArray, Array(0.25, 0.5, 0.75), percentileError))
          .toMap
      }

    def opt(name: String): Option[Double] =
      if (row.isNullAt(row.fieldIndex(name))) None else Some(row.getAs[Double](name))

    val stats = numCols.map { c =>
      val q = quantiles.get(c).filter(_.nonEmpty)
      NumericStats(
        column = c,
        count = row.getAs[Long](s"__cnt__$c"),
        mean = opt(s"__mean__$c"),
        stddev = opt(s"__std__$c"),
        min = opt(s"__min__$c"),
        p25 = q.map(_(0)),
        median = q.map(_(1)),
        p75 = q.map(_(2)),
        max = opt(s"__max__$c"))
    }

    // P8: duplicate-row count — full-width groupBy, counted without
    // collecting groups (Spark map-side combines the common case of
    // all-unique rows).
    val dupCount =
      df.groupBy(cols.map(col): _*)
        .count()
        .where(col("count") > 1)
        .agg(coalesce(sum(col("count") - 1), lit(0L)))
        .head()
        .getLong(0)

    Profile(df.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString)),
      rowCount, nulls, stats, dupCount)
  }

  /** The reference's `basic_info` memo (`system.txt:2`: "cached basic info
    * regarding the csv file") — profile once per (path, percentileError),
    * reuse across pipeline passes and sessions.
    */
  private val cache = scala.collection.concurrent.TrieMap.empty[(String, Double), Profile]

  // ----------------------------------------------- mergeable profiles
  /** Per-column SUFFICIENT statistics in long form — `(col_name, n,
    * n_null, qsum, qsumsq, mn, mx)` with the house exact-integer sums
    * (6dp-quantized BIGINT qsum, DECIMAL(38,0) qsumsq): every field is
    * associative, so profiles of disjoint batches MERGE by plain
    * add/min/max ([[mergeStats]]) into the whole-corpus profile
    * bit-for-bit. This is how 100 TB gets profiled: batch-by-batch as
    * data lands (or per partition / per day), one fused map-side-combined
    * scan each, never a corpus rescan — the profile equivalent of the
    * nd*-family rolling indexes. One aggregate job per call; all listed
    * columns ride the same scan.
    *
    * qsum carries lsum's loud-overflow guard (valid to Σ|x|·1e6 ≤ 9.2e18
    * per batch; merge totals inherit the same bound — switch to dsum
    * fields past ~1e9 money rows per column).
    */
  def sufficientStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "sufficientStats needs at least one column")
    val aggs = cols.flatMap { c =>
      val q = floor(col(c).cast("double") * lit(1e6) + lit(0.5))
      val s = try_sum(q.cast("long"))
      val guarded = when(s.isNull && count(col(c)) > 0,
          raise_error(lit(s"sufficientStats overflow on $c: use dsum fields")))
        .otherwise(s)
      Seq(
        count(col(c)).as(s"__n_$c"),
        sum(col(c).isNull.cast("long")).as(s"__nn_$c"),
        coalesce(guarded, lit(0L)).as(s"__s_$c"),
        coalesce(sum((q.cast("decimal(19,0)") * q.cast("decimal(19,0)"))
          .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as(s"__ss_$c"),
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"__n_$c").as("n"), col(s"__nn_$c").as("n_null"),
          col(s"__s_$c").as("qsum"), col(s"__ss_$c").as("qsumsq"),
          col(s"__mn_$c").as("mn"), col(s"__mx_$c").as("mx"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.n"), col("p.n_null"),
        col("p.qsum"), col("p.qsumsq"), col("p.mn"), col("p.mx"))
  }

  /** Merge [[sufficientStats]] frames from disjoint batches: one tiny
    * groupBy over (batches × columns) rows — exact by associativity.
    */
  def mergeStats(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeStats needs at least one part")
    parts.reduce(_ unionAll _)
      .groupBy(col("col_name"))
      .agg(sum(col("n")).as("n"), sum(col("n_null")).as("n_null"),
        sum(col("qsum")).as("qsum"),
        sum(col("qsumsq")).cast("decimal(38,0)").as("qsumsq"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
  }

  /** Final statistics from (merged) sufficient stats — the exact same
    * IEEE sequence as the one-shot lmean/lstd helpers, so a merged
    * profile is bit-identical to a direct whole-corpus computation.
    */
  def describeFromStats(stats: DataFrame): DataFrame = {
    val lsumD = col("qsum").cast("double") / lit(1e6)
    val dsumSqD = col("qsumsq").cast("double") / lit(1e12)
    stats.select(col("col_name"), col("n"), col("n_null"),
      (lsumD / col("n")).as("mean"),
      sqrt((dsumSqD - lsumD * lsumD / col("n")) / (col("n") - lit(1)))
        .as("std"),
      col("mn").as("min_val"), col("mx").as("max_val"))
  }

  def cached(df: DataFrame, key: String, percentileError: Double = 0.0): Profile =
    cache.getOrElseUpdate((key, percentileError), apply(df, percentileError))

  def invalidate(key: String): Unit = cache.filterInPlace((k, _) => k._1 != key)

  /** P3: deterministic head — the reference previews head(5) or head(10)
    * (`system.txt:2`). A head over a partial order is engine- and
    * partitioning-dependent, so the sort key is ALL ORDERABLE columns by
    * default (map columns have no ordering in Spark and would throw
    * AnalysisException; they ride along unsorted). Pass `sortCols` to
    * preview by a meaningful prefix instead — cheaper than the full-row
    * sort, and the only fully deterministic option when every orderable
    * column can tie.
    */
  def head(df: DataFrame, n: Int = 5, sortCols: Seq[String] = Nil): DataFrame = {
    val keys =
      if (sortCols.nonEmpty) sortCols
      else df.schema.fields.filter(f => isOrderable(f.dataType)).map(_.name).toSeq
    if (keys.isEmpty) df.limit(n) else df.orderBy(keys.map(col): _*).limit(n)
  }

  private def isOrderable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case a: ArrayType => isOrderable(a.elementType)
    case s: StructType => s.fields.forall(f => isOrderable(f.dataType))
    case _ => true
  }

  /** P9-style value counts for a categorical column (SURVEY.md §2.5
    * "value counts / frequency"). Deterministic order: count desc, value asc.
    */
  def valueCounts(df: DataFrame, column: String, limit: Int = 20): DataFrame =
    df.groupBy(col(column))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(column).asc)
      .limit(limit)

  /** Group-wise insight (P10 as a report component, the deterministic
    * replacement for the reference's LLM "recommended_analysis" narratives,
    * `tool_call_agent.py:148`): per-group numeric stats for every
    * low-cardinality string column x every numeric column.
    *
    * Scale: one cheap approx-distinct agg to pick grouping columns, then
    * ONE groupBy job per grouping column covering all numeric columns
    * (map-side combined; output bounded by maxGroups per insight).
    */
  def groupInsights(df: DataFrame, maxGroups: Int = 12,
      maxInsights: Int = 6): Seq[GroupInsight] = {
    val strCols = df.schema.fields.collect {
      case StructField(n, StringType, _, _) => n
    }.toSeq
    val numCols = numericColumns(df)
    if (strCols.isEmpty || numCols.isEmpty) return Nil

    val cardRow = df.agg(
      approx_count_distinct(col(strCols.head)).as(strCols.head),
      strCols.tail.map(c => approx_count_distinct(col(c)).as(c)): _*).head()
    val byCols = strCols.filter { c =>
      val n = cardRow.getAs[Long](c); n >= 2 && n <= maxGroups
    }

    byCols.flatMap { byCol =>
      val aggs = numCols.flatMap { v =>
        Seq(count(col(v)).as(s"__n__$v"), avg(col(v)).as(s"__mean__$v"),
          stddev_samp(col(v)).as(s"__std__$v"))
      }
      val rows = df.where(col(byCol).isNotNull)
        .groupBy(col(byCol).as("__g"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("__g"))
        .collect()
      numCols.map { v =>
        GroupInsight(byCol, v, rows.toSeq.map { r =>
          GroupStats(
            group = r.getAs[String]("__g"),
            n = r.getAs[Long](s"__n__$v"),
            mean = if (r.isNullAt(r.fieldIndex(s"__mean__$v"))) None
                   else Some(r.getAs[Double](s"__mean__$v")),
            stddev = if (r.isNullAt(r.fieldIndex(s"__std__$v"))) None
                     else Some(r.getAs[Double](s"__std__$v")))
        })
      }
    }.take(maxInsights)
  }
}

/** One group's stats within a [[GroupInsight]]. */
final case class GroupStats(group: String, n: Long, mean: Option[Double],
    stddev: Option[Double])

/** Per-group numeric stats for one (grouping column, value column) pair,
  * with the deterministic headline the report renders.
  */
final case class GroupInsight(byCol: String, valueCol: String,
    groups: Seq[GroupStats]) {
  def top: Option[GroupStats] =
    groups.filter(_.mean.isDefined).sortBy(g => (-g.mean.get, g.group)).headOption
  def bottom: Option[GroupStats] =
    groups.filter(_.mean.isDefined).sortBy(g => (g.mean.get, g.group)).headOption
}
