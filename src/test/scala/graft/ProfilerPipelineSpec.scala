package graft

import graft.plans.{Pipeline, ReportRenderer, Stage}
import graft.profile.Profiler
import graft.sources.Csv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilerPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val refDir = "/root/reference/graph_proj/src/agent"

  test("profile of dirty_hr matches FIXTURES.md facts") {
    val df = Csv.read(spark, s"$refDir/dirty_hr.csv")
    val p = Profiler(df)
    assert(p.shape == ((500L, 10)))
    assert(p.nullCounts("last_promo_date") == 95L)
    assert(p.nullCounts("age") == 7L)
    assert(p.nullCounts("salary") == 39L)
    assert(p.nullCounts("bonus_percent") == 6L)
    assert(p.nullCounts("performance_score") == 27L)
    assert(p.duplicateRowCount == 0L)
    val age = p.numericStats.find(_.column == "age").get
    assert(age.min.contains(5.0) && age.max.contains(91.0))
    assert(age.median.contains(36.3))
    // report aggregates verified in BASELINE.md: avg age 36.6
    assert(math.abs(age.mean.get - 36.6) < 0.05)
  }

  test("profile of timestamp/JSON-bearing events table") {
    val ev = Queries.loadEvents(spark, s"${SparkTestSession.sfDir}/events.parquet")
    val p = Profiler(ev)
    assert(p.rowCount == 1000)
    assert(p.columns.exists { case (n, t) => n == "ts" && t == "timestamp" })
    assert(!p.hasNulls)
    val v = p.numericStats.find(_.column == "value").get
    assert(v.count == 1000 && v.min.get >= 0)
    // JSON props profile via value counts on an extracted field
    val vc = Profiler.valueCounts(
      ev.select(get_json_object(col("props"), "$.k").cast("long").as("k")), "k", 3)
    assert(vc.count() == 3)
  }

  test("head(n): deterministic total-order preview; SqlMain views register") {
    val df = Seq((2, "b"), (1, "a"), (3, "c"), (1, "z")).toDF("k", "v")
    val h = Profiler.head(df, 2).collect().map(r => (r.getInt(0), r.getString(1)))
    assert(h.toSeq == Seq((1, "a"), (1, "z"))) // sorted by ALL columns
    val h10 = Profiler.head(df, 10)
    assert(h10.count() == 4) // n larger than data is fine
    // ad-hoc SQL surface: SqlMain's views register and query (graft_*
    // function resolution is covered by ExtensionsSpec's own session)
    SqlMain.registerViews(spark, SparkTestSession.sfDir)
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL").head().getLong(0) > 0)
  }

  test("valueCounts: deterministic order (count desc, value asc)") {
    val df = Seq("b", "a", "a", "c", "b").toDF("v")
    val vc = Profiler.valueCounts(df, "v").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(vc.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("pipeline: audit log records row deltas; report renders") {
    val df = Seq[(Int, Option[Double])]((1, Some(1.0)), (2, None), (3, Some(100.0)))
      .toDF("id", "v")
    val pipe = new Pipeline(Seq(
      Stage("drop_nulls", "drop rows with null v",
        graft.operators.Cleaning.dropNullRows(Seq("v"))),
      Stage("identity", "no-op", identity)))
    val out = pipe.run(df)
    assert(out.count() == 2)
    val log = pipe.auditLog
    assert(log.map(_.stage) == Seq("drop_nulls", "identity"))
    assert(log.head.rowsBefore == 3 && log.head.rowsAfter == 2)
    val report = ReportRenderer.render("test", Profiler(df), log)
    assert(report.contains("drop_nulls") && report.contains("3 rows"))
  }

  test("report surfaces group-wise insights with a recommended-analysis line") {
    val df = Seq(
      ("sales", 9000.0), ("sales", 9500.0), ("sales", 8800.0),
      ("eng", 4000.0), ("eng", 4200.0), ("hr", 5100.0))
      .toDF("dept", "bonus")
    val insights = Profiler.groupInsights(df)
    assert(insights.nonEmpty)
    val ins = insights.find(i => i.byCol == "dept" && i.valueCol == "bonus").get
    assert(ins.top.get.group == "sales" && ins.bottom.get.group == "eng")
    val report = ReportRenderer.render("t", Profiler(df), Nil, insights)
    assert(report.contains("Group-wise insights"))
    assert(report.contains("highest average bonus: sales"))
    assert(report.contains("recommended analysis: compare bonus drivers between sales and eng"))
    // full path: AutoClean report carries the section too
    val res = graft.operators.AutoClean.clean(df, title = "hr")
    assert(res.report.contains("Group-wise insights"))
  }

  test("csv versioned sink never overwrites (S3) and latestVersion resolves (S4)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = Seq((1, "a")).toDF("id", "v")
    val in = s"$tmp/data.csv"
    df.write.option("header", "true").csv(in)
    val out1 = Csv.writeVersioned(df, in, "clean")
    assert(out1 == s"$tmp/data_clean.csv")
    intercept[Exception] { Csv.writeVersioned(df, in, "clean") }
    assert(Csv.latestVersion(in) == s"$tmp/data_clean.csv")
    val out2 = Csv.writeVersioned(df, out1, "clean")
    assert(Csv.latestVersion(in) == out2)
  }

  test("audit JSONL sink (S6) + profile memo cache") {
    val df = Seq((1, 2.0)).toDF("id", "v")
    val tmp = java.nio.file.Files.createTempDirectory("graft_audit").toString
    val res = Seq(graft.plans.StageResult("s1", "desc \"q\"", ok = true, 3, 2, None))
    val p = graft.plans.AuditLog.write(res, s"$tmp/d.csv")
    val line = java.nio.file.Files.readString(p)
    assert(line.contains(""""stage":"s1"""") && line.contains("\\\"q\\\""))
    val p1 = graft.profile.Profiler.cached(df, "k1")
    val p2 = graft.profile.Profiler.cached(df.limit(0), "k1") // memo hit: same key
    assert(p1 eq p2)
    graft.profile.Profiler.invalidate("k1")
  }

  test("QualityGate stage: clean frame passes through, violations fail fast") {
    import graft.operators.DataQuality.{InRange, NotNull}
    val df = Seq((1L, Option(5.0)), (2L, Option(7.0))).toDF("id", "v")
    val gate = graft.plans.QualityGate.stage("vals_ok", Seq(
      NotNull("v_nn", "t", "v"), InRange("v_range", "t", "v", 0.0, 10.0)))
    val p = new Pipeline(Seq(gate))
    assert(p.run(df).collect().length == 2)
    assert(p.auditLog.head.ok)

    val dirty = Seq((1L, Option(5.0)), (2L, Option.empty[Double]),
      (3L, Option(99.0))).toDF("id", "v")
    val p2 = new Pipeline(Seq(gate))
    val e = intercept[IllegalStateException] { p2.run(dirty) }
    assert(e.getMessage.contains("v_nn=1") && e.getMessage.contains("v_range=1"))
    assert(!p2.auditLog.head.ok)
    // budget admits bounded dirt
    val lenient = new Pipeline(Seq(graft.plans.QualityGate.stage("ok2",
      Seq(NotNull("v_nn", "t", "v")), maxViolations = 1)))
    assert(lenient.run(dirty).collect().length == 3)
  }

  test("mergeable profiles: 3-way batch merge is bit-identical to direct") {
    // nulls and negatives included — n_null must survive the merge and
    // floor-quantization must agree on negative values
    val rows = (1 to 90).map { i =>
      (i.toLong, if (i % 7 == 0) None else Some(i * 1.25 - 20.0))
    }
    val df = rows.toDF("k", "v")
    val parts = Seq(df.where($"k" % 3 === 0), df.where($"k" % 3 === 1),
      df.where($"k" % 3 === 2)).map(d => Profiler.sufficientStats(d, Seq("v")))
    val merged = Profiler.describeFromStats(Profiler.mergeStats(parts))
      .collect().head
    val direct = Profiler.describeFromStats(
      Profiler.sufficientStats(df, Seq("v"))).collect().head
    assert(merged == direct) // Row equality: every field bit-identical
    assert(merged.getLong(1) == 78 && merged.getLong(2) == 12) // n, n_null
  }

  test("mergeable profiles: an all-null batch merges as a no-op") {
    val a = Seq((1L, Some(2.0)), (2L, Some(4.0))).toDF("k", "v")
    val b = Seq((3L, Option.empty[Double])).toDF("k", "v")
    val m = Profiler.describeFromStats(Profiler.mergeStats(
      Seq(Profiler.sufficientStats(a, Seq("v")),
        Profiler.sufficientStats(b, Seq("v"))))).collect().head
    assert(m.getLong(1) == 2 && m.getLong(2) == 1)
    assert(m.getDouble(3) == 3.0) // mean unaffected by the null-only batch
    assert(m.getDouble(5) == 2.0 && m.getDouble(6) == 4.0)
  }
}
