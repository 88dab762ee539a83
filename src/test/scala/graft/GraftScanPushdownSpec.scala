package graft

import graft.sources.{Compaction, Snapshots}
import graft.sources.v2.GraftScanAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate pushdown + runtime filtering on the DSv2 scan:
  * filterless COUNT/MIN/MAX answer COMPLETELY from manifest stats (zero
  * files planned), refusal is exact (dv sidecars, truncated string
  * bounds, WHERE → normal scan, right answer), and a broadcast join's
  * runtime IN re-prunes files through the same zones (DPP for sorted
  * zones).
  */
class GraftScanPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 range-sorted files of 2500 rows each, stats on k and tag. */
  private def freshTable(tagLen: Int = 5): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pd").toString
    val out = s"$d/src"
    new java.io.File(out).mkdirs()
    (0 until 4).foreach { i =>
      (i * 2500 until (i + 1) * 2500)
        .map(k => (k.toLong, k % 7, ("tag%0" + tagLen + "d").format(k)))
        .toDF("k", "grp", "tag").coalesce(1)
        .write.parquet(s"$out/__part$i")
      val one = Compaction.dataFiles(s"$out/__part$i") match {
        case Seq(f) => f
      }
      java.nio.file.Files.move(one.toPath,
        new java.io.File(out, f"part-$i%05d.parquet").toPath)
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(s"$out/__part$i"))
    }
    val root = s"$d/t"
    Snapshots.init(spark, root, out, statsCols = Seq("k", "tag"))
    root
  }

  private def load(root: String, opts: (String, String)*) = {
    val r = spark.read.format("graft").option("path", root)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("filterless COUNT/MIN/MAX push completely into manifest stats: " +
      "zero files planned, exact values, numeric AND string extremes") {
    val root = freshTable()
    val audit = s"pd-${java.util.UUID.randomUUID()}"
    val df = load(root, "auditId" -> audit)
      .agg(count(lit(1)).as("n"), min("k").as("mnk"), max("k").as("mxk"),
        min("tag").as("mnt"), max("tag").as("mxt"))
    assert(df.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggScan"))
    val r = df.head()
    assert(r.getLong(0) == 10000L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 9999L)
    assert(r.getString(3) == "tag00000" && r.getString(4) == "tag09999")
    assert(GraftScanAudit.planned(audit).isEmpty) // zero files
    assert(GraftScanAudit.opened(audit).isEmpty)
    GraftScanAudit.clear(audit)
  }

  test("refusal is exact: dv sidecars, WHERE clauses, and truncated " +
      "string bounds all fall back to a normal scan with right answers") {
    val root = freshTable()
    // WHERE → no aggregate pushdown (filters stay residual), still exact
    val w = load(root).where(col("k") >= 5000L)
      .agg(count(lit(1)), min("k")).head()
    assert(w.getLong(0) == 5000L && w.getLong(1) == 5000L)
    // dv sidecar → metadata count would be wrong → refused
    Snapshots.deletePositions(spark, root, "k", 0L, 100L)
    val df = load(root).agg(count(lit(1)).as("n"), min("k").as("mn"))
    assert(!df.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggScan"))
    val r = df.head()
    assert(r.getLong(0) == 9900L && r.getLong(1) == 100L)
    // long tags blow the 16-byte truncation budget → string extremes
    // are inexact → refused (count alone still pushes)
    val root2 = freshTable(tagLen = 20)
    val df2 = load(root2).agg(min("tag").as("mn"), max("tag").as("mx"))
    assert(!df2.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggScan"))
    val r2 = df2.head()
    assert(r2.getString(0) == "tag" + "0" * 16 + "0000")
    assert(r2.getString(1) == "tag" + "0" * 16 + "9999")
    val df3 = load(root2).agg(count(lit(1)).as("n"))
    assert(df3.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggScan"))
    assert(df3.head().getLong(0) == 10000L)
  }

  test("timestamp extremes push from micros zones") {
    val d = java.nio.file.Files.createTempDirectory("graft_pdt").toString
    val df = (0 until 1000).map(i => (i.toLong,
      new java.sql.Timestamp(1704067200000L + i * 60000L)))
      .toDF("k", "ts")
    graft.sources.Bucketing.writeRangeSorted(df, "ts", 2, s"$d/src",
      16 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, s"$d/src", statsCols = Seq("ts"))
    val q = load(root).agg(min("ts"), max("ts"))
    assert(q.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggScan"))
    val r = q.head()
    assert(r.getTimestamp(0).getTime == 1704067200000L)
    assert(r.getTimestamp(1).getTime == 1704067200000L + 999 * 60000L)
  }

  test("runtime filtering: a broadcast join's IN re-prunes files from " +
      "zones — only the build side's key range is opened") {
    val root = freshTable()
    val d = java.nio.file.Files.createTempDirectory("graft_rtf").toString
    // a file-backed dim whose SELECTIVE filter is on a non-key column:
    // the surviving k values are only knowable at RUNTIME — no static
    // constraint can reach the fact side (pushed=[] on the scan), so
    // any file skip below is the runtime filter's doing
    (0 until 100).map(i => (i * 100L, s"label$i")).toDF("k", "label")
      .write.parquet(s"$d/dim")
    val dim = spark.read.parquet(s"$d/dim")
      .where(col("label").isin("label26", "label27", "label28"))
    val audit = s"pd-${java.util.UUID.randomUUID()}"
    GraftScanAudit.clear(audit)
    val fact = load(root, "auditId" -> audit)
    val joined = fact.join(broadcast(dim), "k")
    assert(joined.count() == 3L)
    assert(joined.queryExecution.executedPlan.toString
      .contains("dynamicpruning"))
    val opened = GraftScanAudit.opened(audit)
    GraftScanAudit.clear(audit)
    // keys 2600/2700/2800 all live in file 1's zone [2500, 5000)
    assert(opened == Set("part-00001.parquet"),
      s"runtime filter did not prune: opened $opened")
  }
}
