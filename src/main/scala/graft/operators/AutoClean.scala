package graft.operators

import graft.plans.{Pipeline, ReportRenderer, Stage}
import graft.profile.{Profile, Profiler}
import graft.sources.Csv
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The reference's end-to-end wrangling flow as one deterministic facade:
  * load CSV → profile → decide clean steps → apply → iterate to fixed point
  * → versioned write + report.
  *
  * The decision rules replace the LLM planner's judgment with the policy the
  * reference's prompt hard-codes (`tool_call_agent.py:137-139`): missing
  * values are dropped or imputed (mean/median/mode), only EXTREME outliers
  * (>3σ) are handled, no feature engineering. The fixed-point loop is C15
  * ("continue iterative analysis and cleaning until satisfied",
  * `tool_call_agent.py:140-141`) with a deterministic convergence criterion:
  * re-profile after each pass, stop when no rule fires (or maxPasses).
  */
object AutoClean {

  /** Deterministic cleaning policy.
    * @param dropNullRowFraction drop rows on null in columns whose null
    *        fraction is below this (sparse enough to sacrifice rows);
    *        columns above it get imputed instead
    * @param dateFill how to fill null date/timestamp columns: "mode",
    *        "drop", or "min" (derived "never happened" placeholder)
    */
  final case class Policy(
      sentinels: Seq[String] = Seq("N/A", "NA", "null", ""),
      numericFill: String = "median", // median | mean
      dropNullRowFraction: Double = 0.05,
      dateFill: String = "mode",
      zscoreZ: Double = 3.0,
      dedup: Boolean = true,
      trimStrings: Boolean = true,
      maxPasses: Int = 4)

  private def isNumeric(dt: String) =
    Seq("int", "bigint", "double", "float", "smallint", "tinyint", "decimal")
      .exists(dt.startsWith)
  private def isDateLike(dt: String) = dt.startsWith("date") || dt.startsWith("timestamp")

  /** One planning pass: the rules that fire given the current profile. */
  def plan(profile: Profile, policy: Policy): Seq[Stage] = {
    val stages = Seq.newBuilder[Stage]
    val n = profile.rowCount.toDouble.max(1.0)

    if (policy.trimStrings) {
      val strCols = profile.columns.collect { case (c, dt) if dt == "string" => c }
      if (strCols.nonEmpty)
        stages += Stage("trim_strings", s"trim whitespace on ${strCols.mkString(", ")}",
          Cleaning.normalizeStrings(strCols))
    }

    val nullCols = profile.columns.filter { case (c, _) => profile.nullCounts.getOrElse(c, 0L) > 0 }
    val (numNull, rest) = nullCols.partition { case (_, dt) => isNumeric(dt) }
    if (numNull.nonEmpty) {
      val cols = numNull.map(_._1)
      stages += Stage(s"impute_${policy.numericFill}",
        s"fill nulls in ${cols.mkString(", ")} with column ${policy.numericFill}",
        if (policy.numericFill == "mean") Cleaning.imputeMean(cols)
        else Cleaning.imputeMedian(cols))
    }
    val (dateNull, strNull) = rest.partition { case (_, dt) => isDateLike(dt) }
    if (strNull.nonEmpty) {
      val (sparse, dense) = strNull.partition { case (c, _) =>
        profile.nullCounts(c) / n <= policy.dropNullRowFraction
      }
      if (dense.nonEmpty)
        stages += Stage("impute_mode",
          s"fill nulls in ${dense.map(_._1).mkString(", ")} with column mode",
          Cleaning.imputeMode(dense.map(_._1)))
      if (sparse.nonEmpty)
        stages += Stage("drop_null_rows",
          s"drop rows with null in ${sparse.map(_._1).mkString(", ")}",
          Cleaning.dropNullRows(sparse.map(_._1)))
    }
    if (dateNull.nonEmpty) {
      val cols = dateNull.map(_._1)
      policy.dateFill match {
        case "drop" =>
          stages += Stage("drop_null_dates",
            s"drop rows with null in ${cols.mkString(", ")}", Cleaning.dropNullRows(cols))
        case "min" =>
          cols.foreach { c =>
            stages += Stage(s"impute_min_$c", s"fill null $c with min($c)",
              Cleaning.imputeDerived(c, df => df.select(org.apache.spark.sql.functions
                .min(org.apache.spark.sql.functions.col(c))).head().get(0)))
          }
        case _ =>
          stages += Stage("impute_mode_dates",
            s"fill nulls in ${cols.mkString(", ")} with column mode",
            Cleaning.imputeMode(cols))
      }
    }

    // Outliers only after the frame is null-stable: 3σ on true numerics
    // with non-degenerate variance.
    val outlierCols = profile.numericStats
      .filter(s => s.stddev.exists(_ > 0) && s.count > 1)
      .map(_.column)
    if (outlierCols.nonEmpty && nullCols.isEmpty)
      stages += Stage("zscore_filter",
        s"remove rows >${policy.zscoreZ}σ from mean in ${outlierCols.mkString(", ")}",
        Cleaning.zscoreFilter(outlierCols, policy.zscoreZ))

    if (policy.dedup && profile.duplicateRowCount > 0)
      stages += Stage("dedup", s"drop ${profile.duplicateRowCount} duplicate rows",
        Cleaning.dropDuplicateRows())

    stages.result()
  }

  final case class Result(
      df: DataFrame,
      passes: Int,
      audit: Seq[graft.plans.StageResult],
      report: String)

  /** Stages that must fire at most once per clean (repeated 3σ trimming
    * would keep shrinking the tails; the reference applies it once per run).
    */
  private val oneShot = Set("zscore_filter")

  /** Fixed-point clean of an already-loaded frame: re-plan + re-profile per
    * pass; converged when the profile signature (rows, nulls, dups) stops
    * changing or no rule fires.
    */
  def clean(df0: DataFrame, policy: Policy = Policy(), title: String = "dataset"): Result = {
    var df = df0
    var audit = Vector.empty[graft.plans.StageResult]
    var pass = 0
    val initialProfile = Profiler(df0)
    var profile = initialProfile
    var prevSig: Option[(Long, Map[String, Long], Long)] = None
    var done = false
    while (!done && pass < policy.maxPasses) {
      val sig = (profile.rowCount, profile.nullCounts, profile.duplicateRowCount)
      val stages = plan(profile, policy)
        .filterNot(s => oneShot(s.name) && audit.exists(a => a.stage == s.name && a.ok))
      if (stages.isEmpty || prevSig.contains(sig)) done = true
      else {
        prevSig = Some(sig)
        val pipe = new Pipeline(stages)
        df = pipe.run(df)
        audit ++= pipe.auditLog
        profile = Profiler(df)
        pass += 1
      }
    }
    // Insights run on the CLEANED frame (post-impute/-dedup stats are the
    // ones worth narrating); bounded group-by jobs, see Profiler.groupInsights.
    val insights = graft.profile.Profiler.groupInsights(df)
    Result(df, pass, audit, ReportRenderer.render(title, initialProfile, audit, insights))
  }

  /** Full reference flow: CSV in → clean → versioned CSV out + report
    * beside it (S3/S5 semantics).
    */
  def cleanCsv(
      spark: SparkSession,
      path: String,
      policy: Policy = Policy(),
      suffix: String = "clean",
      singleFile: Boolean = true): (Result, String) = {
    val df = Csv.read(spark, path, policy.sentinels)
    val res = clean(df, policy, title = new java.io.File(path).getName)
    val out = Csv.writeVersioned(res.df, path, suffix, singleFile)
    ReportRenderer.write(res.report, path)
    graft.plans.AuditLog.write(res.audit, path) // S6: <base>_audit.jsonl
    (res, out)
  }
}
