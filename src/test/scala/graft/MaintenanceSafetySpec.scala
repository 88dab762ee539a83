package graft

import graft.sources.{Compaction, LakeFs, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance vs exactly-once state, and table-props durability —
  * the interactions where a compaction or metadata rewrite must NOT
  * erase what a concurrent streaming writer depends on:
  *
  *  - OPTIMIZE / Z-ORDER fold sidecars and materialize column maps but
  *    must CARRY the `#batch`/`#txn:` idempotence lines — dropping a
  *    `#txn:` high-water mark between streaming epochs would make a
  *    restarted query's replayed epoch commit twice (duplicate rows);
  *  - the table props rewrite ([[graft.sources.Snapshots
  *    .renameInStatsProp]]) is an atomic replace, so no crash/reader
  *    window exists where ALL properties (ckpt cadence, pqsec, stats
  *    defaults) are missing;
  *  - an EMPTY streaming epoch commits NOTHING (no manifest churn from
  *    an idle source under a processing-time trigger).
  */
class MaintenanceSafetySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A 2-file table on key `k`, via the Scala init. */
  private def freshTable(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    val src = s"$d/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 5000L).map(k => (k, k % 7)).toDF("k", "grp"), "k", 2,
      src, 16 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    root
  }

  private def entriesOf(spark0: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame, root: String,
      tag: String): Seq[Snapshots.FileEntry] = {
    // write a one-file batch into the store the way a DSv2 task would,
    // returning its stats entry (executor-shaped, driver-run here)
    val tmp = java.nio.file.Files.createTempDirectory(s"b_$tag")
      .toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val one = Compaction.dataFileNames(tmp) match { case Seq(f) => f }
    val name = s"w_test_${tag}_${java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)}.parquet"
    LakeFs.move(s"$tmp/$one", s"$root/files/$name")
    LakeFs.deleteRecursively(tmp)
    val (rows, fp, zones, szones, nulls) = graft.sources.Bucketing
      .fileStatsEntryConf(s"$root/files/$name",
        spark0.sessionState.newHadoopConf(), Seq("k"))
    Seq(Snapshots.FileEntry(name, Some(rows),
      Some(LakeFs.fileLength(s"$root/files/$name")), Some(fp), zones,
      szones, nulls))
  }

  test("optimize and zorder carry #txn: marks — a replayed epoch after " +
      "maintenance still resolves to a skip") {
    val root = freshTable("txnopt")
    val app = "queryA"
    // epoch 0 commits under the app's txn mark
    val e0 = entriesOf(spark, Seq((90000L, 1L)).toDF("k", "grp"), root,
      "e0")
    assert(Snapshots.commitAdopted(root, e0, batchId = Some(0L),
      txnApp = Some(app)).nonEmpty)
    assert(Snapshots.manifest(root, Snapshots.latestVersion(root))
      .txnVersion(app).contains(0L))
    // maintenance between epochs: full rewrite compaction
    Snapshots.optimize(spark, root, "k", 2)
    assert(Snapshots.manifest(root, Snapshots.latestVersion(root))
      .txnVersion(app).contains(0L),
      "optimize must carry the #txn: high-water mark")
    // the restart case: epoch 0 replays — must be a skip, and its
    // orphaned files must be the caller's to drop
    val replay = entriesOf(spark, Seq((90000L, 1L)).toDF("k", "grp"),
      root, "e0r")
    assert(Snapshots.commitAdopted(root, replay, batchId = Some(0L),
      txnApp = Some(app)).isEmpty,
      "replayed epoch after optimize must skip, not double-commit")
    // z-order carries it too
    Snapshots.optimizeZOrder(spark, root, col("k"), col("grp"), 2,
      statsCols = Seq("k", "grp"))
    assert(Snapshots.manifest(root, Snapshots.latestVersion(root))
      .txnVersion(app).contains(0L),
      "optimizeZOrder must carry the #txn: high-water mark")
    // and the NEXT epoch still commits normally
    val e1 = entriesOf(spark, Seq((90001L, 2L)).toDF("k", "grp"), root,
      "e1")
    assert(Snapshots.commitAdopted(root, e1, batchId = Some(1L),
      txnApp = Some(app)).nonEmpty)
    assert(Snapshots.manifest(root, Snapshots.latestVersion(root))
      .txnVersion(app).contains(1L))
  }

  test("renameInStatsProp preserves every other table property " +
      "(atomic replace, not delete+create)") {
    val d = java.nio.file.Files.createTempDirectory("graft_props").toString
    val src = s"$d/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 100L).map(k => (k, k)).toDF("k", "v"), "k", 1, src,
      16 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("k"),
      checkpointInterval = 3, pqSectionThreshold = 7,
      extraProps = Seq("stats=k,v"))
    Snapshots.renameInStatsProp(root, "k", "key")
    val props = LakeFs.readString(s"$root/_manifests/_props.txt")
      .split("\n").map(_.trim).toSet
    assert(props.contains("stats=key,v"),
      s"stats prop must follow the rename, got $props")
    assert(props.contains("ckpt=3") && props.contains("pqsec=7"),
      s"non-stats props must survive the rewrite, got $props")
  }

  test("LakeFs.replaceAtomic overwrites in place and leaves no temp") {
    val d = java.nio.file.Files.createTempDirectory("graft_ra").toString
    val p = s"$d/f.txt"
    LakeFs.createNewAtomic(p, "old")
    LakeFs.replaceAtomic(p, "new")
    assert(LakeFs.readString(p) == "new")
    assert(LakeFs.listNames(d) == Seq("f.txt"),
      "no temp residue after the replace")
  }

  test("an empty streaming epoch commits no manifest version") {
    val root = freshTable("emptyep")
    val v0 = Snapshots.latestVersion(root)
    val w = new graft.sources.v2.GraftStreamingWrite(root,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))),
      Seq("k"), queryId = "qEmpty")
    w.commit(0L, Array.empty)
    assert(Snapshots.latestVersion(root) == v0,
      "empty epoch must not churn a manifest version")
    // a later non-empty epoch commits and advances the mark past the gap
    val e1 = entriesOf(spark, Seq((90002L, 3L)).toDF("k", "grp"), root,
      "ne1")
    assert(Snapshots.commitAdopted(root, e1, batchId = Some(1L),
      txnApp = Some("qEmpty")).nonEmpty)
    assert(Snapshots.manifest(root, Snapshots.latestVersion(root))
      .txnVersion("qEmpty").contains(1L))
  }
}
