package graft

import graft.sources.{LakeFs, Snapshots}
import graft.sources.v2.GraftDvPositions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executor-side delete-vector resolution: position sidecars are
  * written as parquet directories PARTITIONED BY TARGET FILE (no
  * single-task funnel), readers load only their own file's positions
  * ([[graft.sources.v2.GraftDvPositions]]), and the DSv2 scan plans
  * partitions carrying sidecar NAMES — the driver never materializes a
  * position (O(files) driver metadata, not O(marked positions)).
  */
class DvExecutorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dvex").toString
    val src = s"$d/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 10000L).map(k => (k, k % 7)).toDF("k", "grp"), "k", 4,
      src, 16 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    root
  }

  test("sidecars are file-partitioned directories; positions resolve " +
      "per file without reading other files' marks") {
    val root = freshTable()
    // marks across two files: [2000, 3000) spans the 2500 boundary
    val r = Snapshots.deletePositions(spark, root, "k", 2000L, 3000L)
    assert(r.markedPositions == 1000L && r.sidecar.nonEmpty)
    val name = r.sidecar.get
    val p = s"$root/_deletes/$name"
    assert(LakeFs.exists(p) && LakeFs.listDirNames(p)
      .forall(_.startsWith("file=")),
      "sidecar must be a file-partitioned directory")
    assert(LakeFs.listDirNames(p).size >= 1)
    val conf = spark.sessionState.newHadoopConf()
    // per-file resolution: each file gets exactly its own marks
    val m = Snapshots.manifest(root, r.version)
    val perFile = m.files.map(f =>
      f -> GraftDvPositions.forFile(conf, root, Seq(name), f).length)
    assert(perFile.map(_._2).sum == 1000L)
    assert(perFile.count(_._2 > 0) ==
      LakeFs.listDirNames(p).size,
      "exactly the partitioned subdirs' files resolve positions")
    // markedFiles is driver metadata: matches the positive resolvers
    assert(GraftDvPositions.markedFiles(spark, root, Seq(name)) ==
      perFile.filter(_._2 > 0).map(_._1).toSet)
    // the read still anti-joins exactly
    assert(Snapshots.read(spark, root, r.version).count() == 9000L)
    assert(Snapshots.read(spark, root, r.version)
      .where(col("k") >= 2000 && col("k") < 3000).isEmpty)
  }

  test("DSv2 scan resolves marks executor-side and the change feed " +
      "streams fresh marks from sidecar names") {
    val root = freshTable()
    val r = Snapshots.deletePositions(spark, root, "k", 100L, 150L)
    // batch read through the connector sees the post-delete image
    val df = spark.read.format("graft").option("path", root).load()
    assert(df.count() == 9950L)
    assert(df.where(col("k") >= 100 && col("k") < 150).isEmpty)
    // _pos metadata column skips marked ordinals (positions are file
    // ordinals; dead rows' ordinals must be absent)
    val posed = spark.read.format("graft").option("path", root).load()
      .select(col("k"), expr("_pos").as("p"))
    assert(posed.count() == 9950L)
    // the streamed MoR delta for v2 equals the marked rows
    val (_, removed) = Snapshots.netChanges(spark, root, 1, r.version)
    assert(removed.count() == 50L)
    assert(removed.agg(min(col("k")), max(col("k"))).head()
      == org.apache.spark.sql.Row(100L, 149L))
  }

  test("legacy single-file sidecars (the row-level writer parts) and " +
      "partitioned sidecars compose in one version") {
    val root = freshTable()
    // partitioned sidecar from a range delete
    val r1 = Snapshots.deletePositions(spark, root, "k", 0L, 10L)
    // legacy-shaped single parquet file appended as a second sidecar:
    // write (file, pos) rows for positions 10..14 of the first file
    val m = Snapshots.manifest(root, r1.version)
    val first = m.files.head
    val legacy = s"dv_legacy_${java.util.UUID.randomUUID().toString
      .take(8)}.parquet"
    val tmp = java.nio.file.Files.createTempDirectory("dvleg").toString
    (10L until 15L).map(pos => (first, pos)).toDF("file", "pos")
      .coalesce(1).write.parquet(s"$tmp/out")
    val one = graft.sources.Compaction.dataFileNames(s"$tmp/out") match {
      case Seq(f) => f
    }
    LakeFs.move(s"$tmp/out/$one", s"$root/_deletes/$legacy")
    // commit a version referencing BOTH sidecars
    val v2 = Snapshots.latestVersion(root)
    Snapshots.commitRowDelta(root, Seq.empty, Seq(legacy),
      Set(first), scannedVersion = v2)
    val v3 = Snapshots.latestVersion(root)
    assert(v3 == v2 + 1)
    val df = Snapshots.read(spark, root, v3)
    assert(df.count() == 10000L - 10L - 5L)
    assert(df.where(col("k") < 15).isEmpty,
      "both sidecar layouts must apply in one read")
    // and through the connector
    assert(spark.read.format("graft").option("path", root).load()
      .count() == 9985L)
  }
}
