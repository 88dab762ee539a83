package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pp3 — multi-dimensional row-group skipping over the Morton-interleaved
  * (user_id, day) re-layout: EACH single-column predicate alone must be
  * able to skip groups from the footers (the z-order claim a one-column
  * sort cannot make), the combined predicate's scan must read only groups
  * surviving both, and the re-layout must be lossless.
  */
class ZOrderSkippingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.01")

  private lazy val path = Queries.zorderedEventsPath(spark, sfDir)

  // epoch micros computed explicitly in UTC (the pinned session zone):
  // Timestamp.valueOf would interpret the wall-clock string in the JVM
  // default zone and shift the footer window on a non-UTC JVM
  private def utcMicros(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  private val loMicros = utcMicros("2024-01-10 00:00:00")
  private val hiMicros = utcMicros("2024-01-13 00:00:00")

  test("morton code interleaves bits") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L),
      (5L, 3L)).toDF("a", "b")
      .select(Bucketing.mortonCode(col("a"), col("b"))).as[Long].collect()
    // a on even bit positions, b on odd: (5,3) = 101 ⋈ 011 = 0b011011 +
    // a's high bit at position 4 -> 0b010111? compute: a bits {0,2} ->
    // z bits {0,4}; b bits {0,1} -> z bits {1,3} => 1+16 + 2+8 = 27
    assert(got.toSeq == Seq(0L, 1L, 2L, 5L, 10L, 27L))
  }

  test("both dimensions prune: each footer predicate keeps a strict " +
      "subset of row groups") {
    val uGroups = Bucketing.rowGroupStats(spark, path, "user_id")
    val tGroups = Bucketing.rowGroupStats(spark, path, "ts")
    assert(uGroups.size >= 8, s"only ${uGroups.size} groups")
    assert(uGroups.size == tGroups.size)
    val uSurvive = uGroups.filter(g => g._3 < 128L) // min(user_id) < 128
    val tSurvive = tGroups.filter(g => g._4 >= loMicros && g._3 < hiMicros)
    assert(uSurvive.nonEmpty && uSurvive.size < uGroups.size,
      s"user predicate kept ${uSurvive.size}/${uGroups.size} groups — " +
      "no user-dimension pruning (z-order broken)")
    assert(tSurvive.nonEmpty && tSurvive.size < tGroups.size,
      s"ts predicate kept ${tSurvive.size}/${tGroups.size} groups — " +
      "no time-dimension pruning (z-order broken)")
  }

  test("the combined scan reads only groups surviving BOTH dimensions") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.read.parquet(path)
        .where(col("user_id") < 128 &&
          col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
          col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-13 00:00:00")))
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec leaf"))
      val pushed = scan.metadata("PushedFilters")
      assert(pushed.contains("user_id") && pushed.contains("ts"),
        s"predicates not pushed: $pushed")
      val matching = df.collect().length.toLong
      // keyed by (file, ordinal) via zip, since stats come back in footer
      // (= row) order per file
      val u = Bucketing.rowGroupStats(spark, path, "user_id")
      val t = Bucketing.rowGroupStats(spark, path, "ts")
      val both = u.zip(t).collect {
        case ((f1, n, uMin, _), (f2, _, tMin, tMax))
            if f1 == f2 && uMin < 128L && tMax >= loMicros && tMin < hiMicros =>
          n
      }
      val total = u.map(_._2).sum
      val produced = scan.metrics("numOutputRows").value
      assert(produced <= both.sum,
        s"scan produced $produced > both-surviving ${both.sum}")
      assert(produced < total, s"no skipping: $produced of $total")
      assert(matching <= produced)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("re-layout is lossless: zordered+filtered == flat filtered") {
    val z = Queries.pp3ZOrderSkipping(spark, sfDir).collect().toSeq
    val flat = Queries.t(spark, sfDir, "events")
      .where(col("user_id") < 128 &&
        col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-13 00:00:00")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")).cast("double") / lit(1e6)).as("total_value"))
      .orderBy(col("event_type")).collect().toSeq
    assert(z == flat && z.nonEmpty)
  }
}
