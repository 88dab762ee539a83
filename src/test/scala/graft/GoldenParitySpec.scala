package graft

import graft.operators.Cleaning
import graft.sources.Csv
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity golden tests (SURVEY.md §2.4): re-run the reference's
  * committed cleaning pipelines on its own `dirty_hr.csv` and assert
  * row-exact equality with the committed `_clean` artifacts.
  *
  * Artifacts (read-only fixtures, never modified):
  *  - dirty_hr_clean.csv (405 rows): impute age/salary median, bonus mean,
  *    perf mode — THEN drop rows with null last_promo_date.
  *  - dirty_hr_further_clean.csv (396 rows): additionally remove rows with
  *    |x − μ| > 3σ (sample σ) in age OR salary, stats on the 405-row frame.
  *  - stash/dirty_hr_clean_v2.csv (500 rows): no drops; promo date filled
  *    with pinned-tie-break mode 2024-05-13; salary median-filled.
  */
class GoldenParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val refDir = "/root/reference/graph_proj/src/agent"

  private def readCsv(path: String): DataFrame = Csv.read(spark, path)

  /** Compare frames row-exactly after sorting by employee_id; doubles within
    * 1e-9 (CSV round-trip).
    */
  private def assertFrameEqual(got: DataFrame, want: DataFrame): Unit = {
    assert(got.count() == want.count(), "row count")
    assert(got.columns.toSeq == want.columns.toSeq, "columns")
    val g = got.orderBy(col("employee_id")).collect()
    val w = want.orderBy(col("employee_id")).collect()
    g.zip(w).foreach { case (rg, rw) =>
      got.columns.indices.foreach { i =>
        (rg.get(i), rw.get(i)) match {
          case (a: Double, b: Double) =>
            assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
              s"col ${got.columns(i)} id=${rg.get(0)}: $a != $b")
          case (a, b) =>
            assert(a == b, s"col ${got.columns(i)} id=${rg.get(0)}: $a != $b")
        }
      }
    }
  }

  /** The main-run imputation stage: fills computed on the FULL 500-row frame
    * (imputation-before-drop ordering, §2.4).
    */
  private def imputedMain(df: DataFrame): DataFrame = {
    val withMedians = Cleaning.imputeMedian(Seq("age", "salary"))(df)
    val withMean = Cleaning.imputeMean(Seq("bonus_percent"))(withMedians)
    Cleaning.imputeMode(Seq("performance_score"))(withMean)
  }

  test("golden: dirty_hr_clean.csv (impute then drop null promo, 500 -> 405)") {
    val dirty = readCsv(s"$refDir/dirty_hr.csv")
    val cleaned = Cleaning.dropNullRows(Seq("last_promo_date"))(imputedMain(dirty))
    assertFrameEqual(cleaned, readCsv(s"$refDir/dirty_hr_clean.csv"))
  }

  test("golden: dirty_hr_further_clean.csv (3-sigma age/salary, 405 -> 396)") {
    val dirty = readCsv(s"$refDir/dirty_hr.csv")
    val stage1 = Cleaning.dropNullRows(Seq("last_promo_date"))(imputedMain(dirty))
    val stage2 = Cleaning.zscoreFilter(Seq("age", "salary"))(stage1)
    assert(stage2.count() == 396)
    assertFrameEqual(stage2, readCsv(s"$refDir/dirty_hr_further_clean.csv"))
  }

  test("golden: stash v2 promo-date mode fill uses pinned tie-break 2024-05-13") {
    val dirty = readCsv(s"$refDir/dirty_hr.csv")
    // v2 run: salary <- median, last_promo_date <- mode (tied count 3 with
    // 2025-03-28; pandas mode()[0] picks the smaller -> 2024-05-13)
    val m = Cleaning.pinnedMode(dirty, "last_promo_date")
    assert(m.map(_.toString).contains("2024-05-13"))
    val v2 = Cleaning.imputeMode(Seq("last_promo_date"))(
      Cleaning.imputeMedian(Seq("salary"))(dirty))
    assert(v2.count() == 500)
    val want = readCsv(s"$refDir/stash/dirty_hr_clean_v2.csv")
    assertFrameEqual(v2.select("employee_id", "salary", "last_promo_date"),
      want.select("employee_id", "salary", "last_promo_date"))
  }

  test("golden: stash final run derived fill = min(join_date) = 2015-08-05") {
    val dirty = readCsv(s"$refDir/dirty_hr.csv")
    val filled = Cleaning.imputeDerived("last_promo_date",
      Cleaning.minOf("join_date"))(dirty)
    val fillVal = filled
      .join(dirty.where(col("last_promo_date").isNull).select("employee_id"), "employee_id")
      .select("last_promo_date").distinct().collect()
    assert(fillVal.length == 1 && fillVal.head.get(0).toString == "2015-08-05")
  }

  test("golden: verified imputation scalars match the reference report") {
    val dirty = readCsv(s"$refDir/dirty_hr.csv")
    assert(Cleaning.exactMedian(dirty, "age").get == 36.3)
    assert(Cleaning.exactMedian(dirty, "salary").get == 73723.21)
    val meanBonus = dirty.agg(avg("bonus_percent")).head().getDouble(0)
    assert(math.abs(meanBonus - 11.954048582995952) < 1e-12)
    assert(Cleaning.pinnedMode(dirty, "performance_score").get == 3.0)
  }
}
