package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pp5 — PAGE-level skipping via the parquet column index, one level below
  * pp2's row groups: the fixture holds ONE row group (group-level stats
  * can explain no reduction whatsoever) cut into hundreds of tiny pages,
  * so any scan-output reduction is the column index at work. The footers
  * must make page skipping POSSIBLE (tight, non-overlapping per-page
  * min/max in the column index), Spark must make it HAPPEN (scan output
  * == the surviving pages' rows, a strict subset), and the re-layout must
  * be LOSSLESS (pp5's oracle row pins values vs the flat twin).
  */
class PageSkippingSpec extends AnyFunSuite {
  // isolated session — same parallel-suite conf-race rationale as
  // CompositeLayoutSpec/AqeSkewJoinSpec
  private lazy val spark = SparkTestSession.spark.newSession()
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.01")

  private lazy val path = Queries.pagedEventsPath(spark, sfDir)

  private def utcMicros(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  private val loMicros = utcMicros("2024-01-10 00:00:00")
  private val hiMicros = utcMicros("2024-01-13 00:00:00")

  test("one row group, many pages; the column index makes the window a " +
      "strict page subset") {
    val groups = Bucketing.rowGroupStats(spark, path, "ts")
    assert(groups.size == 1,
      s"${groups.size} row groups — the fixture must isolate PAGE pruning")
    val pages = Bucketing.pageStats(spark, path, "ts")
    assert(pages.size >= 50, s"only ${pages.size} pages")
    assert(pages.map(_._2).sum == groups.head._2) // offset index covers all
    // globally ts-sorted => page ranges are ordered and non-overlapping
    pages.sliding(2).foreach {
      case Seq((_, _, _, aMax), (_, _, bMin, _)) =>
        assert(aMax <= bMin, "overlapping page ranges")
      case _ => ()
    }
    val surviving = pages.filter(p => p._4 >= loMicros && p._3 < hiMicros)
    assert(surviving.nonEmpty && surviving.size < pages.size,
      s"window intersects ${surviving.size}/${pages.size} pages — " +
        "nothing to skip")
  }

  test("Spark's vectorized reader decodes only the surviving pages") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.read.parquet(path)
        .where(col("ts") >= lit(new java.sql.Timestamp(loMicros / 1000L)) &&
          col("ts") < lit(new java.sql.Timestamp(hiMicros / 1000L)))
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec leaf"))
      assert(scan.metadata("PushedFilters").contains("ts"))
      val matching = df.collect().length.toLong
      val pages = Bucketing.pageStats(spark, path, "ts")
      val total = pages.map(_._2).sum
      val survivingRows = pages
        .filter(p => p._4 >= loMicros && p._3 < hiMicros).map(_._2).sum
      val produced = scan.metrics("numOutputRows").value
      assert(produced <= survivingRows,
        s"scan produced $produced > surviving pages' $survivingRows")
      assert(produced < total,
        s"scan produced every row ($produced of $total) — no page " +
          "skipping (and the single row group rules out group skipping)")
      assert(matching <= produced)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("re-layout is lossless: paged+filtered == flat ts-filtered") {
    val paged = Queries.pp5PageSkipping(spark, sfDir).collect().toSeq
    val flat = Queries.t(spark, sfDir, "events")
      .where(col("ts") >= lit(new java.sql.Timestamp(loMicros / 1000L)) &&
        col("ts") < lit(new java.sql.Timestamp(hiMicros / 1000L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type")).collect().toSeq
    assert(paged == flat && paged.nonEmpty)
  }
}
