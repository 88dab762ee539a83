package graft

import graft.sources.{Compaction, LakeFs, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.sources.Snapshots.deletePositions]] — merge-on-read deletion
  * vectors: a delete commits a KB-scale (file, pos) sidecar instead of
  * rewriting intersecting files; reads apply it as an anti-join;
  * compaction folds it back into data files lazily. The missing half of
  * the copy-on-write mutation story (a COW delete of 10 rows rewrites a
  * whole file; MoR writes 10 sidecar rows).
  */
class MergeOnReadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 range-sorted files of 10k rows, key 0..9999 — zone i covers
    * [2500i, 2500(i+1)) exactly.
    */
  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_mor").toString
    val out = s"$d/t"
    new java.io.File(out).mkdirs()
    (0 until 4).foreach { i =>
      (i * 2500 until (i + 1) * 2500).map(k => (k.toLong, k % 7))
        .toDF("k", "grp").coalesce(1)
        .write.parquet(s"$out/__part$i")
      val one = Compaction.dataFiles(s"$out/__part$i") match {
        case Seq(f) => f
      }
      java.nio.file.Files.move(one.toPath,
        new java.io.File(out, f"part-$i%05d.parquet").toPath)
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(s"$out/__part$i"))
    }
    out
  }

  test("deletePositions rewrites NOTHING: same physical files, one " +
      "sidecar, reads apply it, v1 isolated") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mor1").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    val r = Snapshots.deletePositions(spark, root, "k", 1000L, 3000L)
    assert(r.version == 2 && r.markedPositions == 2000L &&
      r.touchedFiles == 2 && r.sidecar.nonEmpty)
    // the data-file set is IDENTICAL — zero rewrite I/O
    assert(Snapshots.resolve(root, 1) == Snapshots.resolve(root, 2))
    assert(Snapshots.deleteSidecars(root, 2).size == 1)
    // read applies the sidecar
    val v2 = Snapshots.read(spark, root, 2)
    assert(v2.count() == 8000L)
    assert(v2.where(col("k") >= 1000 && col("k") < 3000).isEmpty)
    assert(v2.agg(sum(col("k"))).head().getLong(0) ==
      (0 until 10000).filterNot(k => k >= 1000 && k < 3000)
        .map(_.toLong).sum)
    // no leaked helper columns
    assert(v2.columns.toSeq == Seq("k", "grp"))
    // v1 still reads everything (snapshot isolation)
    assert(Snapshots.read(spark, root, 1).count() == 10000L)
  }

  test("sidecars accumulate DISJOINT: re-deleting an overlapping range " +
      "marks only fresh positions") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mor2").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    Snapshots.deletePositions(spark, root, "k", 1000L, 3000L)
    val r2 = Snapshots.deletePositions(spark, root, "k", 2000L, 4000L)
    assert(r2.markedPositions == 1000L) // [3000,4000) only — no re-marks
    assert(Snapshots.deleteSidecars(root, 3).size == 2)
    assert(Snapshots.read(spark, root, 3).count() == 7000L)
    // a fully-covered re-delete commits a no-op version, no sidecar
    val r3 = Snapshots.deletePositions(spark, root, "k", 1500L, 2500L)
    assert(r3.markedPositions == 0L && r3.sidecar.isEmpty)
    assert(Snapshots.deleteSidecars(root, 4).size == 2)
    assert(Snapshots.read(spark, root, 4).count() == 7000L)
  }

  test("rewrite paths apply live deletion vectors — a COW delete or " +
      "MERGE after a MoR delete can never resurrect the rows") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mor3").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    Snapshots.deletePositions(spark, root, "k", 1000L, 1100L)
    // COW delete touches the SAME zone-0 file the dv marks: the rewrite
    // must carry the dv holes through
    Snapshots.deleteRange(spark, root, "k", 200L, 300L)
    val v3 = Snapshots.read(spark, root, 3)
    assert(v3.count() == 9800L)
    assert(v3.where(col("k") >= 1000 && col("k") < 1100).isEmpty)
    // MERGE whose kept-rows rewrite covers dv'd positions
    val updates = (1050 until 1060).map(k => (k.toLong, 42)).toDF("k", "grp")
    Snapshots.upsert(spark, root, "k", "k", updates)
    val v4 = Snapshots.read(spark, root, 4)
    assert(v4.count() == 9810L) // dv'd rows stay dead; 10 updates insert
    assert(v4.where(col("k") >= 1000 && col("k") < 1050).isEmpty)
    assert(v4.where(col("k") >= 1050 && col("k") < 1060).count() == 10L)
  }

  test("optimize FOLDS sidecars into data files; vacuum reclaims them") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mor4").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    Snapshots.deletePositions(spark, root, "k", 1000L, 3000L)
    val pre = Snapshots.read(spark, root, 2)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head()
    val v3 = Snapshots.optimize(spark, root, "k", 2)
    assert(Snapshots.deleteSidecars(root, v3).isEmpty)
    assert(Snapshots.read(spark, root, v3)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head() == pre)
    // the folded sidecar (a file-partitioned directory) is
    // unreferenced by the live version → reclaimed whole
    assert(LakeFs.listDirNames(s"$root/_deletes").size == 1)
    Snapshots.vacuum(root, keepFrom = 3, graceMs = 0L)
    assert(LakeFs.listDirNames(s"$root/_deletes").isEmpty &&
      LakeFs.listNames(s"$root/_deletes", ".parquet").isEmpty)
    assert(Snapshots.read(spark, root, v3)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head() == pre)
  }

  test("netChanges reports a MoR delete exactly once: removed = the " +
      "marked rows, added = empty, files untouched") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mor5").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    Snapshots.deletePositions(spark, root, "k", 1000L, 1200L)
    val (a, r) = Snapshots.netChanges(spark, root, 1, 2)
    assert(a.isEmpty)
    assert(r.count() == 200L)
    assert(r.agg(min(col("k")), max(col("k"))).head() ===
      org.apache.spark.sql.Row(1000L, 1199L))
    // second MoR delete: the 2->3 feed carries only the NEW marks
    Snapshots.deletePositions(spark, root, "k", 1100L, 1300L)
    val (a2, r2) = Snapshots.netChanges(spark, root, 2, 3)
    assert(a2.isEmpty && r2.count() == 100L)
    assert(r2.agg(min(col("k")), max(col("k"))).head() ===
      org.apache.spark.sql.Row(1200L, 1299L))
    // and the cumulative 1->3 feed is the union of both
    val (_, r13) = Snapshots.netChanges(spark, root, 1, 3)
    assert(r13.count() == 300L)
  }

  test("deletePositionsByKey erases every row of the keys — scattered " +
      "across files, any multiplicity — with zero rewrites") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mork").toString + "/t"
    Snapshots.init(spark, root, freshTable()) // grp = k % 7, all 4 files
    val keys = Seq(2, 5).toDF("grp")
    val r = Snapshots.deletePositionsByKey(spark, root, "grp", keys)
    val expect = (0 until 10000).count(k => k % 7 == 2 || k % 7 == 5)
    assert(r.markedPositions == expect.toLong && r.sidecar.nonEmpty)
    assert(Snapshots.resolve(root, 1) == Snapshots.resolve(root, 2))
    val v2 = Snapshots.read(spark, root, 2)
    assert(v2.count() == 10000L - expect)
    assert(v2.where(col("grp").isin(2, 5)).isEmpty)
    assert(Snapshots.read(spark, root, 1).count() == 10000L)
    // re-erasing the same keys is a no-op (sidecars stay disjoint)
    val r2 = Snapshots.deletePositionsByKey(spark, root, "grp", keys)
    assert(r2.markedPositions == 0L && r2.sidecar.isEmpty)
    // empty key batch commits a no-op version
    val r3 = Snapshots.deletePositionsByKey(spark, root, "grp",
      keys.where(lit(false)))
    assert(r3.markedPositions == 0L && r3.touchedFiles == 0)
    // a key batch whose zone misses every file skips the probe
    val r4 = Snapshots.deletePositionsByKey(spark, root, "grp",
      Seq(99).toDF("grp"))
    assert(r4.markedPositions == 0L && r4.touchedFiles == 0)
  }

  test("deletePositions on a missing range is a no-op version") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mor6").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    val r = Snapshots.deletePositions(spark, root, "k", 50000L, 60000L)
    assert(r.version == 2 && r.markedPositions == 0L &&
      r.touchedFiles == 0 && r.sidecar.isEmpty)
    assert(Snapshots.read(spark, root, 2).count() == 10000L)
  }
}
