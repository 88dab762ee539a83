package graft

import graft.sources.{Compaction, Manifest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.sources.Manifest.buildBloomDistributed]] /
  * [[selectFilesBloomDistributed]] — the executor-side bloom manifest:
  * one Spark pass builds every file's filter (vs one driver job per
  * file), and the probe filters the manifest in executors (vs
  * collecting every filter to the driver).
  */
class BloomDistributedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** `n` range files of 2500 keys each (zone i = [2500i, 2500(i+1))). */
  private def rangeDir(n: Int): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bloomd").toString
    val out = s"$d/t"
    new java.io.File(out).mkdirs()
    (0 until n).foreach { i =>
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

  test("distributed build matches the driver build's selections: no " +
      "false negatives, same files chosen for the same lookups") {
    val dir = rangeDir(4)
    val manDriver = s"${dir}_man_driver"
    val manDist = s"${dir}_man_dist"
    Manifest.writeBloom(spark, dir, "k", manDriver)
    Manifest.writeBloomDistributed(spark, dir, "k", manDist,
      expectedPerFile = 2500L)
    // row counts ride the distributed pass
    val rows = spark.read.parquet(manDist)
      .select(col("file"), col("rows")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 4 && rows.values.forall(_ == 2500L))
    // point lookups: every key's TRUE file is always selected (the
    // no-false-negative law), on both builds, executor- or driver-probed
    for (k <- Seq(0L, 1234L, 2500L, 7499L, 9999L)) {
      val truth = f"part-${k / 2500}%05d.parquet"
      val dvr = Manifest.selectFilesBloom(spark, manDriver, Seq(k))
      val dst = Manifest.selectFilesBloomDistributed(spark, manDist, Seq(k))
      assert(dvr.contains(truth), s"driver build lost $k")
      assert(dst.contains(truth), s"distributed build lost $k")
      assert(dst == dvr,
        s"builds disagree for $k: driver=$dvr distributed=$dst")
    }
    // multi-key lookup spanning two zones selects (at least) both
    val two = Manifest.selectFilesBloomDistributed(spark, manDist,
      Seq(10L, 9000L))
    assert(two.contains("part-00000.parquet") &&
      two.contains("part-00003.parquet"))
    // a key in no file selects nothing (deterministic hashing — pinning
    // the absence documents the fpp regime at this scale)
    assert(Manifest.selectFilesBloomDistributed(spark, manDist,
      Seq(123456789L)).isEmpty)
  }

  test("snapshot bloom index: readKeys prunes files, applies position " +
      "deletes, and vacuum drops the index with its version") {
    import graft.sources.{LakeFs, Snapshots}
    val dir = rangeDir(4)
    val root = s"$dir/../snap"
    Snapshots.init(spark, root, dir, statsCols = Seq("k"))
    Snapshots.buildBloomIndex(spark, root, 1, "k", fpp = 1e-4)
    // exact values through the pruned read
    val hit = Snapshots.readKeys(spark, root, 1, "k", Seq(10L, 7000L))
    assert(hit.count() == 2L)
    val opened = graft.sources.Bucketing.filesRead(hit)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(opened.subsetOf(Set("part-00000.parquet", "part-00002.parquet")))
    // a MoR-deleted key hits nothing even when its bloom admits a file
    Snapshots.deletePositions(spark, root, "k", 10L, 11L)
    Snapshots.buildBloomIndex(spark, root, 2, "k", fpp = 1e-4)
    assert(Snapshots.readKeys(spark, root, 2, "k", Seq(10L)).isEmpty)
    // a (version, column) without an index refuses loudly
    intercept[IllegalArgumentException](
      Snapshots.readKeys(spark, root, 2, "grp", Seq(3L)))
  }

  test("vacuum drops version-pinned bloom indexes below the cut") {
    import graft.sources.{LakeFs, Snapshots}
    val dir = rangeDir(4)
    val root = s"$dir/../snapv"
    Snapshots.init(spark, root, dir, statsCols = Seq("k"))
    Snapshots.buildBloomIndex(spark, root, 1, "k")
    Snapshots.deleteRange(spark, root, "k", 0L, 100L)
    Snapshots.buildBloomIndex(spark, root, 2, "k")
    assert(LakeFs.listDirNames(s"$root/_blooms") ==
      Seq("v1_k.parquet", "v2_k.parquet"))
    Snapshots.vacuum(root, keepFrom = 2, graceMs = 0L)
    assert(LakeFs.listDirNames(s"$root/_blooms") == Seq("v2_k.parquet"))
    assert(Snapshots.readKeys(spark, root, 2, "k", Seq(7000L)).count() == 1L)
  }

  test("index writes are not single-task funnels: a multi-file table's " +
      "bloom index lands as multiple part files") {
    import graft.sources.Snapshots
    val dir = rangeDir(8)
    val root = s"$dir/../snapm"
    // AQE legitimately coalesces KB-scale partitions at test scale; the
    // gate is about the HARD coalesce(1) funnel, so pin it off here —
    // at 10^6 files AQE targets its advisory size and fans out anyway
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    Snapshots.init(s2, root, dir, statsCols = Seq("k"))
    val idx = Snapshots.buildBloomIndex(s2, root, 1, "k")
    // 8 grouped files hash across the shuffle partitions; a coalesce(1)
    // regression would collapse this to exactly one part file
    assert(Compaction.dataFileNames(idx).size >= 2,
      "bloom index written through a single task")
    val manDist = s"${dir}_man_multi"
    Manifest.writeBloomDistributed(s2, dir, "k", manDist, 2500L)
    assert(Compaction.dataFileNames(manDist).size >= 2)
    // the multi-part index still probes exactly
    assert(Snapshots.readKeys(s2, root, 1, "k",
      Seq(10L, 7000L, 19999L)).count() == 3L)
  }

  test("empty key batches select nothing and read an empty frame — " +
      "never an error") {
    import graft.sources.Snapshots
    val dir = rangeDir(2)
    val root = s"$dir/../snape"
    Snapshots.init(spark, root, dir, statsCols = Seq("k"))
    Snapshots.buildBloomIndex(spark, root, 1, "k")
    assert(Manifest.selectFilesBloomDistributed(spark,
      s"$root/_blooms/v1_k.parquet", Seq.empty).isEmpty)
    val empty = Snapshots.readKeys(spark, root, 1, "k", Seq.empty)
    assert(empty.isEmpty && empty.columns.contains("k"))
  }

  test("a 1000-key batch probes through ONE array-argument expression " +
      "with no false negatives") {
    val dir = rangeDir(4)
    val man = s"${dir}_man_batch"
    Manifest.writeBloomDistributed(spark, dir, "k", man, 2500L)
    // every 10th key of zones 0 and 2 plus misses: 1000 keys total
    val present = (0 until 250).map(_ * 10L) ++
      (0 until 250).map(i => 5000L + i * 10L)
    val absent = (0 until 500).map(i => 1000000L + i)
    val keys = (present ++ absent).toSeq
    assert(keys.size == 1000)
    val sel = Manifest.selectFilesBloomDistributed(spark, man, keys).toSet
    assert(sel.contains("part-00000.parquet") &&
      sel.contains("part-00002.parquet"),
      s"batched probe lost a truly-present key's file: $sel")
  }

  test("build cost is ONE pass regardless of file count: the job tally " +
      "does not grow with files (the driver loop's did, one per file)") {
    def jobsFor(nFiles: Int): Int = {
      val dir = rangeDir(nFiles)
      val group = s"bloom-build-$nFiles-${System.nanoTime()}"
      try {
        spark.sparkContext.setJobGroup(group, "bloom build", false)
        val n = Manifest.buildBloomDistributed(spark, dir, "k", 2500L)
          .count()
        assert(n == nFiles.toLong)
        spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      } finally spark.sparkContext.clearJobGroup()
    }
    val j2 = jobsFor(2)
    val j8 = jobsFor(8)
    assert(j2 >= 1 && j8 == j2,
      s"job count grew with file count: 2 files -> $j2 jobs, " +
        s"8 files -> $j8 jobs")
  }
}
