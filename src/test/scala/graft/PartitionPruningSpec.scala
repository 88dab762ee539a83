package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout-level pruning — the proof that a date predicate on the
  * day-partitioned events layout prunes to directory listings: the scan
  * leaf carries PartitionFilters on `dt`, and the ground-truth file audit
  * ([[Bucketing.filesRead]]) shows ONLY the matching `dt=` directories
  * were opened. pp1's oracle row pins the values; this spec pins the
  * mechanism.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val path = {
    val p = "/tmp/graft_spec_events_by_day"
    Bucketing.writePartitionedByDay(
      Queries.t(spark, sfDir, "events"), "ts", p)
    p
  }

  private val days = Seq("2024-01-10", "2024-01-11", "2024-01-12")

  test("date filter reads ONLY the matching dt= directories") {
    val filtered = spark.read.parquet(path)
      .where(col("dt").cast("string").isin(days: _*))
    val files = Bucketing.filesRead(filtered)
    assert(files.nonEmpty)
    assert(files.forall(f => days.exists(d => f.contains(s"dt=$d"))),
      s"unexpected files: ${files.filterNot(f => days.exists(d => f.contains(s"dt=$d")))}")
    // and the unfiltered layout has many more partitions than 3
    val allDays = spark.read.parquet(path)
      .select(col("dt").cast("string")).distinct().count()
    assert(allDays >= 25L) // January 2024 span
  }

  test("the scan leaf claims PartitionFilters on dt (plan-level audit)") {
    val filtered = spark.read.parquet(path)
      .where(col("dt").cast("string").isin(days: _*))
      .groupBy(col("event_type")).count()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"no PartitionFilters in:\n$plan")
    // the dt predicate must appear among partition filters, not data ones
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("dt"), s"dt not in partition filters:\n$pf")
  }

  test("dpp1: a dim filter prunes fact partitions at RUNTIME (Spark DPP)") {
    // AQE off so the executed plan is a plain tree whose FileSourceScanExec
    // leaves (and their driver metrics) are directly collectable; DPP
    // itself is an optimizer feature independent of AQE.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.dpp1DynamicPruning(spark, sfDir)
      val planStr = df.queryExecution.executedPlan.toString
      // (a) the fact scan's PartitionFilters carry a runtime subquery —
      // the date set comes from the dim, not the query text
      assert(planStr.contains("dynamicpruningexpression"),
        s"no dynamicpruningexpression in:\n$planStr")
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val fact = scans.find(_.metadata("Location").contains("graft_events_by_day"))
        .getOrElse(fail(s"no fact scan among ${scans.map(_.metadata("Location"))}"))
      // (b) ground truth from the scan's own driver metrics: week 2 of
      // January = 7 of the ~30 dt= directories actually read...
      assert(fact.metrics("numPartitions").value == 7L,
        s"partitions read: ${fact.metrics("numPartitions").value}")
      // ...and pruning happened at RUNTIME: the static (pre-DPP) file set
      // is the full layout, strictly larger than what was read
      assert(fact.metrics("staticFilesNum").value > fact.metrics("numFiles").value,
        s"static=${fact.metrics("staticFilesNum").value} read=${fact.metrics("numFiles").value}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("re-layout is lossless: partitioned+filtered == flat ts-filtered") {
    val part = spark.read.parquet(path)
      .where(col("dt").cast("string").isin(days: _*))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sid"))
      .orderBy(col("event_type")).collect().toSeq
    val flat = Queries.t(spark, sfDir, "events")
      .where(date_format(col("ts"), "yyyy-MM-dd").isin(days: _*))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sid"))
      .orderBy(col("event_type")).collect().toSeq
    assert(part == flat && part.nonEmpty)
  }
}
