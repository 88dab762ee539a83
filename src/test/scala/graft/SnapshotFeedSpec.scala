package graft

import graft.sources.{Compaction, Snapshots}
import graft.streaming.SnapshotFeed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.streaming.SnapshotFeed]] — the snapshot table as an
  * incremental streaming source: every version delta processed exactly
  * once across kill-and-restart, cursor derived from the consumer's own
  * durable commits.
  */
class SnapshotFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_feed").toString
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

  /** The idempotent consumer used throughout: per-version (n_added,
    * n_removed, sum_added, sum_removed) as an overwrite-parquet delta.
    */
  private def statApply(added: org.apache.spark.sql.DataFrame,
      removed: org.apache.spark.sql.DataFrame, v: Int,
      outPath: String): Unit = {
    val a = added.agg(count(lit(1)), coalesce(sum(col("k")), lit(0L))).head()
    val r = removed.agg(count(lit(1)), coalesce(sum(col("k")), lit(0L))).head()
    Seq((v, a.getLong(0), r.getLong(0), a.getLong(1), r.getLong(1)))
      .toDF("v", "n_added", "n_removed", "sum_added", "sum_removed")
      .write.mode("overwrite").parquet(outPath)
  }

  test("drain processes every version delta once; folded deltas equal " +
      "the direct read of the latest version") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_feed1").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    Snapshots.append(spark, root,
      (20000 until 20100).map(k => (k.toLong, 1)).toDF("k", "grp"), "k")
    Snapshots.deleteRange(spark, root, "k", 1000L, 1500L)
    Snapshots.upsert(spark, root, "k", "k",
      (5000 until 5010).map(k => (k.toLong, 99)).toDF("k", "grp"))
    val stateDir = root + "_state"
    val processed = SnapshotFeed.drain(spark, root, stateDir)(statApply)
    assert(processed == Seq(2, 3, 4))
    // base + folded deltas == direct read
    val base = Snapshots.read(spark, root, 1)
      .agg(count(lit(1)), sum(col("k"))).head()
    val deltas = spark.read.parquet(
      (2 to 4).map(v => s"$stateDir/delta_v$v"): _*)
      .agg(sum(col("n_added") - col("n_removed")),
        sum(col("sum_added") - col("sum_removed"))).head()
    val direct = Snapshots.read(spark, root, 4)
      .agg(count(lit(1)), sum(col("k"))).head()
    assert(base.getLong(0) + deltas.getLong(0) == direct.getLong(0))
    assert(base.getLong(1) + deltas.getLong(1) == direct.getLong(1))
    // caught up: a second drain is a no-op
    assert(SnapshotFeed.drain(spark, root, stateDir)(statApply).isEmpty)
    // new commits resume from the cursor
    Snapshots.deleteRange(spark, root, "k", 9000L, 9100L)
    assert(SnapshotFeed.drain(spark, root, stateDir)(statApply) == Seq(5))
  }

  test("applyChangeFeed materializes a replica that follows the source " +
      "row-for-row through merge, delete, MoR delete, and evolution") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_feed3").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    // v2 MERGE (update + insert), v3 COW delete, v4 MoR delete,
    // v5 schema-evolved append
    Snapshots.upsert(spark, root, "k", "k",
      ((5000 until 5010).map(k => (k.toLong, 42)) ++
        (0 until 3).map(i => (100000L + i, 77))).toDF("k", "grp"))
    Snapshots.deleteRange(spark, root, "k", 1000L, 1100L)
    Snapshots.deletePositions(spark, root, "k", 2000L, 2050L)
    Snapshots.append(spark, root,
      Seq((200000L, 1, 0.25)).toDF("k", "grp", "score"), "k")
    val latest = Snapshots.latestVersion(root)
    var replica = Snapshots.read(spark, root, 1)
    (2 to latest).foreach { v =>
      val feed = Snapshots.changeFeed(spark, root, v - 1, v, "k")
      replica = SnapshotFeed.applyChangeFeed(replica, feed, "k")
    }
    val direct = Snapshots.read(spark, root, latest)
    val cols = direct.columns.sorted.map(col).toSeq
    val r = replica.select(cols: _*)
    val d = direct.select(cols: _*)
    assert(r.exceptAll(d).isEmpty && d.exceptAll(r).isEmpty)
    assert(r.count() == 10000L - 100 - 50 + 3 + 1)
  }

  test("kill-and-restart: a crash mid-apply replays ONLY the uncommitted " +
      "version; committed versions never re-run") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_feed2").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    Snapshots.deleteRange(spark, root, "k", 1000L, 1100L) // v2
    Snapshots.deleteRange(spark, root, "k", 3000L, 3100L) // v3
    val stateDir = root + "_state"
    val applied = scala.collection.mutable.ArrayBuffer.empty[Int]
    // consumer dies AFTER durably writing v3's output but BEFORE the
    // marker — the worst spot: a non-idempotent design double-counts
    val crash = intercept[RuntimeException] {
      SnapshotFeed.drain(spark, root, stateDir) { (a, r, v, p) =>
        statApply(a, r, v, p)
        applied += v
        if (v == 3) sys.error("kill -9")
      }
    }
    assert(crash.getMessage == "kill -9")
    assert(SnapshotFeed.committedVersions(stateDir) == Seq(2))
    // restart: v2 is NOT re-applied, v3 is retried (idempotent overwrite)
    val resumed = SnapshotFeed.drain(spark, root, stateDir) { (a, r, v, p) =>
      statApply(a, r, v, p)
      applied += v
    }
    assert(resumed == Seq(3))
    assert(applied.toSeq == Seq(2, 3, 3))
    // the folded state is exact despite the replay
    val deltas = spark.read.parquet(
      (2 to 3).map(v => s"$stateDir/delta_v$v"): _*)
      .agg(sum(col("n_removed"))).head()
    assert(deltas.getLong(0) == 200L)
    assert(SnapshotFeed.cursor(stateDir) == 3)
  }

  test("bounded drain: a 5-version backlog drained 2-at-a-time — with a " +
      "kill between steps — lands the identical final state") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_feed_b").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    (1 to 5).foreach { i => // backlog: v2..v6
      Snapshots.append(spark, root,
        (0 until 10).map(j => (30000L + i * 100 + j, i)).toDF("k", "grp"),
        "k")
    }
    val bounded = root + "_state_bounded"
    val unbounded = root + "_state_unbounded"
    SnapshotFeed.drain(spark, root, unbounded)(statApply)
    // step 1: two versions, no more
    assert(SnapshotFeed.drain(spark, root, bounded, maxVersions = 2)(
      statApply) == Seq(2, 3))
    assert(SnapshotFeed.cursor(bounded) == 3)
    // step 2 "crashes" mid-apply on its second version: v4 committed,
    // v5's marker never written
    intercept[RuntimeException](
      SnapshotFeed.drain(spark, root, bounded, maxVersions = 2) {
        (a, r, v, p) =>
          if (v == 5) sys.error("killed mid-apply")
          statApply(a, r, v, p)
      })
    assert(SnapshotFeed.cursor(bounded) == 4)
    // restart drains the remainder in bounded steps
    assert(SnapshotFeed.drain(spark, root, bounded, maxVersions = 2)(
      statApply) == Seq(5, 6))
    assert(SnapshotFeed.drain(spark, root, bounded, maxVersions = 2)(
      statApply).isEmpty)
    // the bounded consumer's durable state == the unbounded twin's
    val fold = (dir: String) => spark.read.parquet(
      (2 to 6).map(v => s"$dir/delta_v$v"): _*)
      .agg(sum(col("n_added")), sum(col("n_removed")),
        sum(col("sum_added")), sum(col("sum_removed"))).head()
    assert(fold(bounded) == fold(unbounded))
  }

  test("backlog sizes the pending versions from manifests alone: " +
      "per-version file and row counts, drained entries disappear") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_feed_bl").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    (1 to 3).foreach { i => // v2..v4: 10-row appends
      Snapshots.append(spark, root,
        (0 until 10).map(j => (40000L + i * 100 + j, i)).toDF("k", "grp"),
        "k")
    }
    Snapshots.deleteRange(spark, root, "k", 0L, 100L) // v5: 1 rewrite
    val stateDir = root + "_state"
    val bl = SnapshotFeed.backlog(spark, root, stateDir)
      .orderBy(col("version")).collect()
    assert(bl.map(_.getInt(0)).toSeq == Seq(2, 3, 4, 5))
    (0 until 3).foreach { i =>
      assert(bl(i).getLong(1) == 1L && bl(i).getLong(2) == 0L)
      assert(bl(i).getLong(3) == 10L) // rows_added from manifest stats
    }
    // the delete: 1 file out, 1 rewritten file in, survivors counted
    assert(bl(3).getLong(2) == 1L && bl(3).getLong(4) == 2500L)
    assert(bl(3).getLong(3) == 2400L)
    // draining 2 shrinks the backlog to the remainder
    SnapshotFeed.drain(spark, root, stateDir, maxVersions = 2)(statApply)
    assert(SnapshotFeed.backlog(spark, root, stateDir)
      .select(col("version")).collect().map(_.getInt(0)).toSeq ==
      Seq(4, 5))
  }
}
