package graft

import graft.operators.{Cleaning, Dedup}
import graft.plans.{Pipeline, Stage}
import graft.sources.Csv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The messy-strings lifecycle (SURVEY §3.4) on the reference's second
  * fixture `dirty.csv` (FIXTURES.md §2): sentinel salaries, 66%-null ages,
  * 5 duplicate rows, case/typo variants, Y/N/Yes/No subscriptions, US dates.
  * Exercises the explicit C9–C14 chain end-to-end through the Pipeline
  * runner (AutoClean covers the rule-driven path; this pins the manual one).
  */
class DirtyCsvPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val path = "/root/reference/graph_proj/src/agent/dirty.csv"

  test("explicit C9-C14 pipeline cleans dirty.csv") {
    val raw = Csv.read(spark, path) // "N/A" -> null at read time (C14/S1)
    assert(raw.count() == 205)
    // Salary had "N/A" sentinels -> must already infer numeric after nullValue
    assert(raw.schema("Salary").dataType.typeName == "double")

    val pipe = new Pipeline(Seq(
      Stage("trim_title", "whitespace + title case on Name",
        Cleaning.normalizeStrings(Seq("Name"), caseMode = "title")),
      Stage("canon_country", "country variants -> canonical",
        Cleaning.canonicalize("Country", Map(
          "canada" -> "Canada", "U.K." -> "UK", "Germny" -> "Germany",
          "mexico" -> "Mexico", "United States" -> "USA"))),
      Stage("canon_job", "job title typos -> canonical",
        Cleaning.canonicalize("Job Title", Map(
          "enginr" -> "Engineer", "Desginer" -> "Designer",
          "manager" -> "Manager", "data analyst" -> "Data Analyst"))),
      Stage("boolify", "Subscribed Y/Yes/N/No -> boolean",
        Cleaning.booleanize("Subscribed")),
      Stage("dates", "parse US dates + future flag",
        Cleaning.parseDates("Date Joined", "MM/dd/yyyy",
          asOf = Some(java.sql.Date.valueOf("2025-08-08")))),
      Stage("impute_age", "median-fill 66%-null Age",
        Cleaning.imputeMedian(Seq("Age"))),
      Stage("cap_salary", "winsorize salary at p95 (C8)",
        Cleaning.percentileCap(Seq("Salary"), 0.95)),
      Stage("dedup", "drop the 5 exact-duplicate rows (C9)",
        Cleaning.dropDuplicateRows())))

    val out = pipe.run(raw)
    assert(out.count() == 200, "5 duplicate rows removed")
    assert(out.where(col("Age").isNull).count() == 0)
    assert(out.where(col("Country").isin("canada", "Germny", "U.K.")).count() == 0)
    assert(out.where(col("Job Title").isin("enginr", "Desginer")).count() == 0)
    assert(out.schema("Subscribed").dataType.typeName == "boolean")
    assert(out.schema("Date Joined").dataType.typeName == "date")
    // winsorized: the 983,923.20 extreme is capped
    assert(out.agg(max("Salary")).head().getDouble(0) < 983923.0)
    assert(pipe.auditLog.forall(_.ok))
  }

  test("keyed dedup on Email keeps deterministic min-ID survivor") {
    val raw = Csv.read(spark, path)
    val deduped = Dedup.exactByKey(raw, "ID", Seq(col("Email")))
    // 5 duplicated emails -> 200 distinct
    assert(deduped.count() == 200)
  }
}
