package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pp2 — intra-file row-group skipping over the ts-sorted flat re-layout:
  * the footers must make skipping POSSIBLE (tight, disjoint-ish min/max
  * per group), Spark must make it HAPPEN (pushed filter + scan output
  * capped at the surviving groups' rows), and the re-layout must be
  * LOSSLESS (window aggregate equals the unsorted flat scan's).
  */
class RowGroupSkippingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.01")

  private lazy val path = Queries.sortedEventsPath(spark, sfDir)

  // the pp2 window, in epoch micros (session zone is pinned UTC)
  // epoch micros computed explicitly in UTC (the pinned session zone):
  // Timestamp.valueOf would interpret the wall-clock string in the JVM
  // default zone and shift the footer window on a non-UTC JVM
  private def utcMicros(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  private val loMicros = utcMicros("2024-01-10 00:00:00")
  private val hiMicros = utcMicros("2024-01-13 00:00:00")

  test("footers carry tight ts stats and the window intersects a strict " +
      "subset of row groups") {
    val groups = Bucketing.rowGroupStats(spark, path, "ts")
    assert(groups.size >= 4, s"only ${groups.size} row groups — " +
      "blockSize too large for this SF to exercise skipping")
    val total = groups.map(_._2).sum
    assert(total == spark.read.parquet(path).count())
    // globally sorted => per-file group ranges are non-overlapping and
    // ordered (parquet footer order is row order)
    groups.groupBy(_._1).foreach { case (f, gs) =>
      gs.sliding(2).foreach {
        case Seq((_, _, _, aMax), (_, _, bMin, _)) =>
          assert(aMax <= bMin, s"$f: overlapping group ranges")
        case _ => ()
      }
    }
    val surviving = groups.filter(g => g._4 >= loMicros && g._3 < hiMicros)
    assert(surviving.nonEmpty && surviving.size < groups.size,
      s"window intersects ${surviving.size}/${groups.size} groups — " +
      "no skipping to prove")
  }

  test("Spark pushes the ts predicate and reads only surviving groups") {
    // AQE off so the executed plan is a plain tree whose scan leaf (and
    // its post-execution metrics) is directly collectable
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withScanMetrics()
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def withScanMetrics(): Unit = {
    val df = spark.read.parquet(path)
      .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-13 00:00:00")))
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("ts"), s"ts not pushed: $pushed")

    // materialize THIS plan so the inspected scan's metrics populate
    val matching = df.collect().length.toLong
    val groups = Bucketing.rowGroupStats(spark, path, "ts")
    val total = groups.map(_._2).sum
    val survivingRows = groups
      .filter(g => g._4 >= loMicros && g._3 < hiMicros).map(_._2).sum
    val produced = scan.metrics("numOutputRows").value
    assert(produced <= survivingRows,
      s"scan produced $produced > surviving $survivingRows — groups not skipped")
    assert(produced < total,
      s"scan produced every row ($produced of $total) — no skipping happened")
    assert(matching <= produced,
      s"scan produced fewer rows ($produced) than match the predicate ($matching)")
  }

  test("re-layout is lossless: sorted+filtered == flat ts-filtered") {
    val sorted = Queries.pp2RowGroupSkipping(spark, sfDir).collect().toSeq
    val flat = Queries.t(spark, sfDir, "events")
      .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-13 00:00:00")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type")).collect().toSeq
    assert(sorted == flat)
  }
}
