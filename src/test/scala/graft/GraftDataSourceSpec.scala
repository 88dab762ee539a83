package graft

import graft.sources.{Compaction, Snapshots}
import graft.sources.v2.GraftScanAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 connector ([[graft.sources.v2.GraftDataSource]]):
  * `spark.read.format("graft")` must serve exactly what
  * [[graft.sources.Snapshots.read]] serves (MoR sidecars, rename/widen
  * maps, time travel) while the PLANNER drives manifest pruning —
  * pushed filters select files from commit-time zones before any file
  * opens, pruned columns become real parquet projections, and AQE sees
  * manifest statistics.
  */
class GraftDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 range-sorted files of 10k rows, key 0..9999 (zone i =
    * [2500i, 2500(i+1))), long key + int group + string tag.
    */
  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2").toString
    val out = s"$d/src"
    new java.io.File(out).mkdirs()
    (0 until 4).foreach { i =>
      (i * 2500 until (i + 1) * 2500)
        .map(k => (k.toLong, k % 7, f"tag$k%05d"))
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

  test("plain read equals Snapshots.read; pushed range filter prunes " +
      "files from manifest zones (audit ground truth) and stays exact") {
    val root = freshTable()
    assert(load(root).count() == 10000L)
    val audit = s"dsv2-${java.util.UUID.randomUUID()}"
    val got = load(root, "auditId" -> audit)
      .where(col("k") >= 2600L && col("k") < 2700L)
      .agg(count(lit(1)), sum(col("k"))).head()
    assert(got.getLong(0) == 100L)
    assert(got.getLong(1) == (2600L until 2700L).sum)
    // zone selection: exactly file 1 planned AND opened
    assert(GraftScanAudit.planned(audit) == Seq("part-00001.parquet"))
    assert(GraftScanAudit.opened(audit) == Set("part-00001.parquet"))
    GraftScanAudit.clear(audit)
    // a range outside every zone reads zero files and zero rows
    val audit2 = s"dsv2-${java.util.UUID.randomUUID()}"
    assert(load(root, "auditId" -> audit2)
      .where(col("k") >= 50000L).count() == 0L)
    assert(GraftScanAudit.planned(audit2).isEmpty)
    GraftScanAudit.clear(audit2)
  }

  test("string equality prunes via truncated string zones; residual " +
      "filter still evaluates row-exactly") {
    val root = freshTable()
    val audit = s"dsv2-${java.util.UUID.randomUUID()}"
    val rows = load(root, "auditId" -> audit)
      .where(col("tag") === "tag07777").collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("k") == 7777L)
    assert(GraftScanAudit.planned(audit) == Seq("part-00003.parquet"))
    GraftScanAudit.clear(audit)
  }

  test("MoR position deletes apply inside the scan; versionAsOf and " +
      "timestampAsOf travel") {
    val root = freshTable()
    Snapshots.deletePositions(spark, root, "k", 100L, 200L) // v2
    assert(load(root).count() == 9900L)
    assert(load(root).where(col("k") >= 100L && col("k") < 200L)
      .count() == 0L)
    assert(load(root, "versionAsOf" -> "1").count() == 10000L)
    val ts1 = Snapshots.commitTimestamp(root, 1).get
    assert(load(root, "timestampAsOf" -> ts1.toString).count() == 10000L)
    // the pruned read still applies the sidecar (file 0 holds the marks)
    val got = load(root).where(col("k") < 2500L)
      .agg(count(lit(1))).head().getLong(0)
    assert(got == 2400L)
  }

  test("rename/widen maps resolve per file: old files read through the " +
      "chain, new files read natively, widened ints cast") {
    val root = freshTable()
    Snapshots.renameColumn(root, "grp", "bucket") // v2 (metadata only)
    Snapshots.widenColumn(root, "k", "long") // v3 no-op widen (already)
    val df = load(root)
    assert(df.columns.contains("bucket") && !df.columns.contains("grp"))
    assert(df.where(col("bucket") === 3).count() ==
      (0 until 10000).count(_ % 7 == 3).toLong)
    // append AFTER the rename: the new file carries `bucket` physically
    Snapshots.append(spark, root,
      Seq((20000L, 99, "tag20000")).toDF("k", "bucket", "tag"), "k")
    val all = load(root)
    assert(all.count() == 10001L)
    assert(all.where(col("bucket") === 99).count() == 1L)
  }

  test("COUNT(*) prunes every column and answers from manifest row " +
      "stats (zero-page path), dv-adjusted") {
    val root = freshTable()
    Snapshots.deletePositions(spark, root, "k", 0L, 50L)
    val n = load(root).count()
    assert(n == 9950L)
  }

  test("COUNT(col) answers from manifest row + null-count stats " +
      "(metadata-only) and refuses when a file lacks the stamp") {
    val d = java.nio.file.Files.createTempDirectory("graft_cnt").toString
    val wh = s"$d/w"
    val cat = "gc" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.t (k BIGINT, tag STRING)
                 |USING graft TBLPROPERTIES ('stats'='k,tag')"""
      .stripMargin)
    spark.sql(s"""INSERT INTO $cat.ns.t
      |SELECT id, CASE WHEN id % 4 = 0 THEN NULL
      |  ELSE concat('t', id) END
      |FROM range(1000)""".stripMargin)
    val q = spark.sql(s"SELECT count(tag), count(k) FROM $cat.ns.t")
    assert(q.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggScan"),
      "COUNT(col) must push completely into manifest stats")
    assert(q.head() == org.apache.spark.sql.Row(750L, 1000L))
    // a column without stamped null counts refuses (v is unstamped)
    spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN tag TO label")
    val q2 = spark.sql(s"SELECT count(label) FROM $cat.ns.t")
    assert(!q2.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggScan"),
      "pending column maps must refuse the metadata aggregate")
    assert(q2.head().getLong(0) == 750L)
    graft.sources.LakeFs.deleteRecursively(d)
  }

  test("the scan reports post-pruning statistics from manifest stats " +
      "(AQE's input)") {
    val root = freshTable()
    val table = new graft.sources.v2.GraftTable(root, 1,
      load(root).schema)
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap())
    val builder = table.newScanBuilder(opts)
    builder.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(Array(org.apache.spark.sql.sources
        .GreaterThanOrEqual("k", 7500L)))
    val stats = builder.build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    assert(stats.numRows().getAsLong == 2500L) // one zone survives
    assert(stats.sizeInBytes().getAsLong > 0L)
    val m = Snapshots.manifest(root, 1)
    assert(stats.sizeInBytes().getAsLong <
      m.entries.flatMap(_.bytes).sum) // pruned, not the whole table
  }

  test("SQL surface: a temp view over the DSv2 read pushes WHERE " +
      "conjuncts into zone pruning") {
    val root = freshTable()
    val audit = s"dsv2-${java.util.UUID.randomUUID()}"
    load(root, "auditId" -> audit).createOrReplaceTempView("graft_dsv2_t")
    val got = spark.sql(
      """SELECT count(*) AS n, sum(k) AS sk FROM graft_dsv2_t
        |WHERE k >= 5000 AND k < 5100""".stripMargin).head()
    assert(got.getLong(0) == 100L)
    assert(got.getLong(1) == (5000L until 5100L).sum)
    assert(GraftScanAudit.planned(audit) == Seq("part-00002.parquet"))
    assert(GraftScanAudit.opened(audit) == Set("part-00002.parquet"))
    GraftScanAudit.clear(audit)
  }

  test("schema evolution: columns appended later read NULL on old " +
      "files through the connector") {
    val root = freshTable()
    Snapshots.append(spark, root,
      Seq((30000L, 1, "tag30000", 3.5)).toDF("k", "grp", "tag", "score"),
      "k")
    val df = load(root)
    assert(df.columns.toSeq == Seq("k", "grp", "tag", "score"))
    assert(df.where(col("score").isNotNull).count() == 1L)
    assert(df.where(col("score").isNull).count() == 10000L)
  }
}
