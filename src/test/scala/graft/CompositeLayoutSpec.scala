package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pp4 — the composite production layout (day partitions + per-partition
  * z-order): proves the two pruning mechanisms this library demonstrates
  * in isolation COMPOSE in one scan — the calendar-dim filter prunes
  * `dt=` directories at runtime (DPP), and row-group min/max stats on the
  * z-order's user_id dimension skip groups inside every surviving
  * directory. pp4's oracle row pins the values; this spec pins the
  * mechanisms, on one queryExecution.
  */
class CompositeLayoutSpec extends AnyFunSuite {
  // isolated session: this spec toggles adaptive.enabled around its
  // scan-metric assertions while suites run in parallel (see
  // AqeSkewJoinSpec) — own SQLConf keeps both directions race-free
  private lazy val spark = SparkTestSession.spark.newSession()
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.01")

  private lazy val path = Queries.compositeEventsPath(spark, sfDir)

  private def week2Days: Seq[String] =
    spark.read.parquet(path).select(col("dt").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
      .filter { d =>
        val dom = d.substring(8).toInt
        dom >= 8 && dom <= 14 // week_of_month == 2
      }.sorted

  test("layout: ~a month of dt= directories, each day spanning multiple " +
      "z-sorted row groups with a user_id prefix the cohort can't escape") {
    val dirs = Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
    assert(dirs.size >= 25, s"only ${dirs.size} day dirs")
    val day = dirs.find(_.getName == "dt=2024-01-10")
      .getOrElse(fail("no dt=2024-01-10 partition"))
    val groups = Bucketing.rowGroupStats(spark, day.getAbsolutePath, "user_id")
    assert(groups.size >= 3,
      s"only ${groups.size} row groups in one day — blockSize too large " +
        "for this SF to exercise intra-partition skipping")
    // the morton interleave puts every user_id < 128 row at a z value
    // below every user_id >= 128 row (bit 7 of user maps above the whole
    // hour range), so the cohort occupies a strict PREFIX of row groups
    val touching = groups.filter(_._3 < 128L) // group min(user_id) < 128
    assert(touching.nonEmpty, "cohort absent from the audited day")
    assert(touching.size < groups.size,
      s"every group's min(user_id) < 128 (${groups.size} groups) — " +
        "nothing for the cohort predicate to skip")
  }

  test("one scan: runtime directory pruning AND row-group skipping " +
      "compose (plan + metrics on a single queryExecution)") {
    // AQE off so the executed plan is a plain tree whose scan leaf (and
    // its post-execution metrics) is directly collectable
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.pp4CompositePruning(spark, sfDir)
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruningexpression"),
        s"no dynamicpruningexpression in:\n$planStr")
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val fact = scans
        .find(_.metadata("Location").contains("graft_events_composite"))
        .getOrElse(fail(
          s"no fact scan among ${scans.map(_.metadata("Location"))}"))
      // cohort predicate reached the parquet reader
      assert(fact.metadata("PushedFilters").contains("user_id"),
        s"user_id not pushed: ${fact.metadata("PushedFilters")}")
      // (a) directory pruning happened at RUNTIME: only week-2 dt= dirs
      // read, and the static (pre-DPP) file set is strictly larger
      val days = week2Days
      assert(days.nonEmpty)
      assert(fact.metrics("numPartitions").value == days.size.toLong,
        s"partitions read: ${fact.metrics("numPartitions").value} " +
          s"!= week-2 days ${days.size}")
      assert(fact.metrics("staticFilesNum").value >
        fact.metrics("numFiles").value,
        s"static=${fact.metrics("staticFilesNum").value} " +
          s"read=${fact.metrics("numFiles").value} — pruning was not runtime")
      // (b) row-group skipping INSIDE the survivors: the scan produced
      // strictly fewer rows than the surviving partitions hold
      val survivingRows = spark.read.parquet(path)
        .where(col("dt").cast("string").isin(days: _*)).count()
      val produced = fact.metrics("numOutputRows").value
      assert(produced > 0)
      assert(produced < survivingRows,
        s"scan produced $produced of $survivingRows surviving rows — " +
          "no intra-partition skipping")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("re-layout is lossless: composite scan == flat twin") {
    val composite = Queries.pp4CompositePruning(spark, sfDir).collect().toSeq
    val flat = {
      val ev = Queries.t(spark, sfDir, "events")
      val days = ev.select(to_date(col("ts")).as("day")).distinct()
        .withColumn("week_of_month",
          (floor((dayofmonth(col("day")) - lit(1)) / lit(7)) + lit(1))
            .cast("int"))
        .where(col("week_of_month") === 2)
      ev.where(col("user_id") < 128)
        .join(days, to_date(col("ts")) === col("day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          (sum(floor(col("value") * lit(1e6) + lit(0.5))
            .cast("decimal(38,0)")).cast("double") / lit(1e6))
            .as("total_value"))
        .orderBy(col("event_type")).collect().toSeq
    }
    assert(composite == flat && composite.nonEmpty)
  }
}
