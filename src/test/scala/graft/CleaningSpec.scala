package graft

import graft.operators.Cleaning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator unit tests on literal frames — the deterministic edge cases
  * the reference's LLM never faced (FIXTURES.md §4).
  */
class CleaningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("imputeMedian: exact median, non-null cells untouched") {
    val df = Seq[(Int, Option[Double])](
      (1, Some(1.0)), (2, Some(2.0)), (3, Some(10.0)), (4, None)).toDF("id", "v")
    val out = Cleaning.imputeMedian(Seq("v"))(df).orderBy("id").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(1.0, 2.0, 10.0, 2.0))
  }

  test("exactQuantilesDistributed == percentile aggregate on real data") {
    val li = spark.read.parquet(s"${SparkTestSession.sfDir}/lineitem.parquet")
    for (p <- Seq(0.5, 0.95, 0.25)) {
      val agg = li.select(percentile(col("l_extendedprice"), lit(p))).head().getDouble(0)
      val dist = Cleaning.exactQuantilesDistributed(li, "l_extendedprice", Seq(p)).head.get
      assert(agg == dist, s"p=$p: agg=$agg dist=$dist")
    }
  }

  test("imputeMean: mean over non-null only") {
    val df = Seq[(Int, Option[Double])](
      (1, Some(2.0)), (2, Some(4.0)), (3, None)).toDF("id", "v")
    val out = Cleaning.imputeMean(Seq("v"))(df).orderBy("id").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(2.0, 4.0, 3.0))
  }

  test("pinnedMode: tie broken by smallest value (pandas mode()[0])") {
    val df = Seq("b", "b", "a", "a", "c").toDF("v")
    assert(Cleaning.pinnedMode(df, "v").contains("a"))
  }

  test("pinnedModes: numeric ties break on numeric order, not string order") {
    // counts tied between 9.0 and 10.0 — pandas mode()[0] picks 9.0, but a
    // lexicographic tie-break would pick "10.0" ("10.0" < "9.0" as strings)
    val df = Seq(9.0, 9.0, 10.0, 10.0, 11.0).toDF("v")
      .withColumn("s", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("x"),
        org.apache.spark.sql.functions.col("v").cast("int")))
    val m = Cleaning.pinnedModes(df, Seq("v", "s"))
    assert(m("v") == "9.0")
    assert(m("s") == "x10") // string column still string-ordered: "x10" < "x9"
    // and the single-column path agrees on the numeric column
    assert(Cleaning.pinnedMode(df, "v").contains(9.0))
  }

  test("imputeMode: all-null column is a no-op") {
    val df = Seq[(Int, Option[String])]((1, None), (2, None)).toDF("id", "v")
    val out = Cleaning.imputeMode(Seq("v"))(df).collect()
    assert(out.forall(_.isNullAt(1)))
  }

  test("zscoreFilter: keeps nulls, drops only >3-sigma cells") {
    // 10 tight values + one extreme outlier + one null row
    val vals = (1 to 10).map(i => (i, Some(10.0 + i * 0.1))) :+
      (11, Some(1000.0)) :+ (12, Option.empty[Double])
    val df = vals.toDF("id", "v")
    val kept = Cleaning.zscoreFilter(Seq("v"))(df).select("id")
      .collect().map(_.getInt(0)).toSet
    assert(!kept.contains(11) && kept.contains(12) && kept.size == 11)
  }

  test("zscoreFilter: degenerate n<=1 and zero-variance are no-ops") {
    val one = Seq((1, 5.0)).toDF("id", "v")
    assert(Cleaning.zscoreFilter(Seq("v"))(one).count() == 1)
    val const = Seq((1, 5.0), (2, 5.0), (3, 5.0)).toDF("id", "v")
    assert(Cleaning.zscoreFilter(Seq("v"))(const).count() == 3)
  }

  test("outlierToNull then impute = C7 two-phase") {
    val vals = (1 to 10).map(i => (i, 10.0 + i * 0.1)) :+ (11, 1000.0)
    val df = vals.toDF("id", "v")
    val nulled = Cleaning.outlierToNull(Seq("v"))(df)
    assert(nulled.where(col("v").isNull).count() == 1)
  }

  test("percentileCap: winsorizes upper tail only") {
    val df = (1 to 100).map(i => (i, i.toDouble)).toDF("id", "v")
    val out = Cleaning.percentileCap(Seq("v"), 0.95)(df)
    val mx = out.agg(max("v")).head().getDouble(0)
    val mn = out.agg(min("v")).head().getDouble(0)
    assert(mx < 100.0 && mn == 1.0)
  }

  test("dropDuplicateRows: full-row and keyed") {
    val df = Seq((1, "a"), (1, "a"), (2, "a")).toDF("id", "k")
    assert(Cleaning.dropDuplicateRows()(df).count() == 2)
    assert(Cleaning.dropDuplicateRows(Seq("k"))(df).count() == 1)
  }

  test("normalizeStrings + canonicalize (C10/C11 dirty.csv semantics)") {
    val df = Seq("  Audrey Edwards ", "andrew lewis").toDF("Name")
    val out = Cleaning.normalizeStrings(Seq("Name"), caseMode = "title")(df)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("Audrey Edwards", "Andrew Lewis"))
    val jobs = Seq("enginr", "Engineer", "Desginer").toDF("job")
    val canon = Cleaning.canonicalize("job",
      Map("enginr" -> "Engineer", "Desginer" -> "Designer"))(jobs)
      .collect().map(_.getString(0)).toSeq
    assert(canon == Seq("Engineer", "Engineer", "Designer"))
  }

  test("canonicalizeViaDictionary: broadcast dictionary join") {
    val df = Seq((1, "Germny"), (2, "Germany"), (3, "UK")).toDF("id", "country")
    val dict = Seq(("Germny", "Germany"), ("U.K.", "UK")).toDF("variant", "canonical")
    val out = Cleaning.canonicalizeViaDictionary("country", dict)(df)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("Germany", "Germany", "UK"))
  }

  test("booleanize: Y/Yes/N/No/blank -> boolean (C12)") {
    val df = Seq(Some("Y"), Some("Yes"), Some("N"), Some("No"), Some("maybe"), None)
      .toDF("Subscribed")
    val out = Cleaning.booleanize("Subscribed")(df).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(out.toSeq == Seq(Some(true), Some(true), Some(false), Some(false), None, None))
  }

  test("sentinelToNull + castNumeric (C14 N/A salaries)") {
    val df = Seq("52000.5", "N/A", " N/A ").toDF("Salary")
    val out = Cleaning.castNumeric(Seq("Salary"))(
      Cleaning.sentinelToNull(Seq("Salary"))(df)).collect()
    assert(out(0).getDouble(0) == 52000.5 && out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("fuzzyCanonicalize: nearest entry within k, ties lexicographic, " +
    "out-of-range and null pass through") {
    val dict = Seq("Engineer", "Manager", "Analyst", "Enginees")
    val df = Seq(Option("Enginer"), Option("Managr"), Option("Engineer"),
      Option("Plumber"), Option("Engineez"), None).toDF("role")
    val out = Cleaning.fuzzyCanonicalize("role", dict, maxDist = 1)(df)
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    // "Enginer" is 1 edit from BOTH "Engineer" and "Enginees" (and from
    // "Enginee"-less entries nothing else) -> smallest distance ties break
    // to "Engineer" (lexicographically first)
    assert(out == Seq("Engineer", "Manager", "Engineer", "Plumber",
      "Engineer", null))
  }

  test("fuzzyCanonicalize is map-only: no exchange in the plan") {
    val df = Seq("Enginer").toDF("role")
    val plan = Cleaning.fuzzyCanonicalize("role", Seq("Engineer"))(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("parseDates: format parse + future flag (C13)") {
    val df = Seq("05/08/2023", "12/31/2099").toDF("Date Joined")
    val out = Cleaning.parseDates("Date Joined", "MM/dd/yyyy",
      asOf = Some(java.sql.Date.valueOf("2025-08-08")))(df).collect()
    assert(out(0).getAs[java.sql.Date](0).toString == "2023-05-08")
    assert(!out(0).getBoolean(1) && out(1).getBoolean(1))
  }

  test("robustOutlierFilter survives contamination that breaks the 3σ cut") {
    // 9 clean values 1..9 plus a 1e9 sentinel: one point's z-score is
    // bounded by (n−1)/√n ≈ 2.85 < 3 at n=10, so a single wild outlier
    // MASKS itself from the 3σ cut it inflates. The MAD fence is built
    // from medians the sentinel cannot move (fence ≈ 11), so it drops
    // exactly the sentinel and keeps every clean row.
    val rows = (1 to 9).map(i => (i.toLong, Some(i.toDouble))) :+
      (10L, Some(1e9)) :+ (11L, Option.empty[Double])
    val df = rows.toDF("id", "v")
    val mad = Cleaning.robustOutlierFilter(Seq("v"))(df)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!mad.contains(10L), "MAD fence must drop the 1e9 sentinel")
    assert(mad.contains(11L), "null cells pass the fence")
    assert((1 to 9).forall(i => mad.contains(i.toLong)),
      "clean rows must survive the robust fence")
    val sigma = Cleaning.zscoreFilter(Seq("v"))(df)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sigma.contains(10L),
      "fixture check: the 3σ cut is masked by its own outlier")
  }

  test("robustOutlierFilter: zero MAD disables the fence for that column") {
    // 9 of 12 rows at one value → MAD = 0; a hard fence would drop every
    // non-modal row, so the operator must keep all instead
    val rows = (1L to 9L).map(i => (i, 5.0)) ++
      Seq((10L, 1.0), (11L, 9.0), (12L, 500.0))
    val out = Cleaning.robustOutlierFilter(Seq("v"))(rows.toDF("id", "v"))
    assert(out.count() == 12)
  }

  test("oneHot: dictionary indicators, unknowns and nulls all-zero (C16)") {
    import spark.implicits._
    val df = Seq(Some("A-X"), Some("B Y"), Some("zz"), None).toDF("c")
    val out = Cleaning.oneHot("c", Seq("A-X", "B Y"), "f")(df)
    assert(out.columns.toSeq == Seq("c", "f_a_x", "f_b_y"))
    val rows = out.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((Some("A-X"), 1L, 0L), (Some("B Y"), 0L, 1L),
      (Some("zz"), 0L, 0L), (None, 0L, 0L)))
  }
}
