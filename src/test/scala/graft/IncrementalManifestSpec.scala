package graft

import graft.sources.{Bucketing, Compaction, LakeFs, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 manifest economics ([[graft.sources.Snapshots]]): delta
  * manifests + checkpoints (commit cost ∝ changed files, not table file
  * count), commit-time file stats (zone planning / fingerprinting with
  * ZERO plan-time footer I/O), latest-only batch-id reads pinned to the
  * commit snapshot, vacuum retention grace, and timestamp time travel.
  */
class IncrementalManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 range-sorted files of 10k rows, key 0..9999 (the LakehouseSpec
    * layout: zone i covers [2500i, 2500(i+1)) exactly).
    */
  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_incr").toString
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

  private def rawManifest(root: String, v: Int): Seq[String] =
    LakeFs.readString(s"$root/_manifests/v$v.txt")
      .split("\n").toSeq.filter(_.nonEmpty)

  test("delta manifests resolve identically to an independent replay of " +
      "the raw add/remove lines; checkpoints interrupt the chain") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mc").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"),
      checkpointInterval = 4)
    (1 to 9).foreach { i =>
      Snapshots.append(spark, root,
        Seq((10000L + i, i)).toDF("k", "grp"), "k")
    }
    Snapshots.deleteRange(spark, root, "k", 0L, 2500L) // v11: -1 file
    val latest = Snapshots.latestVersion(root)
    assert(latest == 11)
    // independent replay: fold the RAW manifest lines from v1 forward,
    // never trusting the library's resolution
    var expect = Set.empty[String]
    (1 to latest).foreach { v =>
      val lines = rawManifest(root, v)
      val isDelta = lines.exists(_.startsWith("#parent:"))
      // checkpoint law: v1 and every 4th version are FULL, rest delta
      assert(isDelta == (v != 1 && v % 4 != 0),
        s"v$v delta=$isDelta violates interval-4 checkpointing")
      if (!isDelta)
        expect = lines.filterNot(_.startsWith("#"))
          .map(_.split("\\|").head).toSet
      else {
        expect = expect --
          lines.filter(_.startsWith("-")).map(_.stripPrefix("-")) ++
          lines.filter(_.startsWith("+"))
            .map(_.stripPrefix("+").split("\\|").head)
      }
      assert(Snapshots.resolve(root, v).toSet == expect, s"v$v diverged")
    }
    // commit bytes ∝ changed files: each append's delta carries exactly
    // ONE file-section line (+1 add) no matter how many files the table
    // holds; the delete carries 1 remove + 1 add (rewritten survivor)
    val appendDelta = rawManifest(root, 2)
    assert(appendDelta.count(l =>
      l.startsWith("+") || l.startsWith("-")) == 1)
    // the delete wipes the zone-0 file entirely: remove-only delta
    val deleteDelta = rawManifest(root, 11)
    assert(deleteDelta.count(_.startsWith("-")) == 1)
    assert(deleteDelta.count(_.startsWith("+")) == 0)
    // and the data is exactly right through the whole chain
    val v11 = Snapshots.read(spark, root, 11)
    assert(v11.count() == 10000L - 2500L + 9L)
    assert(v11.where(col("k") < 2500L).isEmpty)
  }

  test("checkpointInterval=1 writes every manifest full — the " +
      "delta-free twin mode") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcfull").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"),
      checkpointInterval = 1)
    (1 to 3).foreach { i =>
      Snapshots.append(spark, root,
        Seq((10000L + i, i)).toDF("k", "grp"), "k")
    }
    (1 to 4).foreach { v =>
      assert(!rawManifest(root, v).exists(_.startsWith("#parent:")))
    }
    assert(Snapshots.resolve(root, 4).size == 7)
  }

  test("vacuum materializes the oldest kept delta as a checkpoint " +
      "sidecar: resolution survives dropping the chain's ancestors") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcvac").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    (1 to 5).foreach { i => // v2..v6, all deltas (interval 16)
      Snapshots.append(spark, root,
        Seq((10000L + i, i)).toDF("k", "grp"), "k")
    }
    assert(rawManifest(root, 4).exists(_.startsWith("#parent:")))
    val before = (4 to 6).map(v => Snapshots.resolve(root, v))
    Snapshots.vacuum(root, keepFrom = 4, graceMs = 0L)
    assert(LakeFs.exists(s"$root/_manifests/_ckpt_v4.txt"))
    assert((4 to 6).map(v => Snapshots.resolve(root, v)) == before)
    intercept[IllegalArgumentException](Snapshots.resolve(root, 3))
    assert(Snapshots.read(spark, root, 6).count() == 10005L)
  }

  test("commit-time stats make planning footer-free: a MoR delete on a " +
      "stats-bearing table opens ZERO parquet footers") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcstats").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    val ctr = Bucketing.footerReads.get()
    val before = ctr.get()
    val r = Snapshots.deletePositions(spark, root, "k", 100L, 200L)
    assert(ctr.get() == before,
      "zone planning re-opened footers despite manifest stats")
    assert(r.markedPositions == 100L && r.touchedFiles == 1)
    // the read fast-path fingerprints from the manifest too
    val before2 = ctr.get()
    assert(Snapshots.read(spark, root, 2).count() == 9900L)
    assert(ctr.get() == before2,
      "read-path fingerprinting re-opened footers despite manifest fp")
    // and zone pruning itself still holds: only the zone-0 file touched
    assert(r.sidecar.nonEmpty)
  }

  test("committedBatches reads ONE manifest regardless of version " +
      "count — the cumulative #batch carry makes the latest sufficient") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcbatch").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    (0 until 6).foreach { i =>
      assert(Snapshots.appendBatch(spark, root,
        Seq((20000L + i, i)).toDF("k", "grp"), "k", i.toLong))
    }
    val ctr = LakeFs.readStringCalls.get()
    val before = ctr.get()
    assert(Snapshots.committedBatches(root) == (0L to 5L))
    assert(ctr.get() - before == 1,
      s"committedBatches read ${ctr.get() - before} manifests, want 1")
  }

  test("appendBatch is pinned to its snapshot: two concurrent replays " +
      "of one batch id land exactly one copy") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcpin").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    val b = Seq((30000L, 1)).toDF("k", "grp")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (0 until 2).map { _ =>
      new Thread(() => {
        gate.await()
        results.add(
          Snapshots.commitWithRetry() {
            Snapshots.appendBatch(spark, root, b, "k", 7L)
          })
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join(120000))
    assert(results.size == 2)
    import scala.jdk.CollectionConverters._
    assert(results.asScala.count(identity) == 1,
      s"exactly one replay must win: $results")
    val latest = Snapshots.latestVersion(root)
    assert(Snapshots.read(spark, root, latest)
      .where(col("k") === 30000L).count() == 1L)
    assert(Snapshots.committedBatches(root) == Seq(7L))
  }

  test("history answers from per-commit #nfiles/#nrows stamps: ONE " +
      "manifest read per version, no delta-chain resolution") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mchist").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"),
      checkpointInterval = 8)
    (1 to 7).foreach { i => // v2..v8: deltas + one checkpoint at v8
      Snapshots.append(spark, root,
        Seq((10000L + i, i)).toDF("k", "grp"), "k")
    }
    Snapshots.deletePositions(spark, root, "k", 100L, 200L) // v9: +1 dv
    val ctr = LakeFs.readStringCalls.get()
    val before = ctr.get()
    val h = Snapshots.history(spark, root).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val reads = ctr.get() - before
    assert(reads == 9L,
      s"history read $reads manifests for 9 versions, want 9 (O(V))")
    // the stamped answers must equal full chain resolution's
    (1 to 9).foreach { v =>
      val m = Snapshots.manifest(root, v)
      val (_, nf, nr, ndv) = h(v - 1)
      assert(nf == m.entries.size.toLong, s"v$v n_files")
      assert(nr == m.entries.flatMap(_.rows).sum, s"v$v n_rows")
      assert(ndv == m.dvNames.size.toLong, s"v$v n_dv")
    }
  }

  test("contended appendBatch replays stay O(1) under a folded " +
      "multi-billion batch watermark (no range materialization)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcwm").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    val m1 = Snapshots.manifest(root, 1)
    // hand-commit v2 carrying the watermark 3×10^9 sequential streaming
    // commits would fold to — materializing that range (the old replay
    // path) is a ~24 GB Seq; the O(1) check must never build it
    LakeFs.createNewAtomic(s"$root/_manifests/v2.txt",
      (Seq(s"#ts:${m1.commitTs.get + 1}", "#batchwm:3000000000") ++
        m1.entries.map(_.render)).mkString("\n"))
    // an already-folded id resolves to a skip without materialization
    assert(!Snapshots.appendBatch(spark, root,
      Seq((40000L, 1)).toDF("k", "grp"), "k", 2999999999L))
    // and a contended NEW id lands exactly once — losers route through
    // the ConcurrentModificationException replay check
    val b = Seq((40001L, 1)).toDF("k", "grp")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (0 until 4).map { _ =>
      new Thread(() => {
        gate.await()
        results.add(Snapshots.commitWithRetry() {
          Snapshots.appendBatch(spark, root, b, "k", 3000000001L)
        })
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    assert(results.size == 4)
    assert(results.asScala.count(identity) == 1,
      s"exactly one replay must win: $results")
    val latest = Snapshots.latestVersion(root)
    assert(Snapshots.read(spark, root, latest)
      .where(col("k") === 40001L).count() == 1L)
  }

  test("parquet file sections: full manifests above the pqsec threshold " +
      "externalize to parquet, resolve identically to the inline twin, " +
      "and vacuum reclaims dropped/orphaned sections") {
    val base = freshTable()
    def lifecycle(root: String, pqsecThreshold: Int): Unit = {
      Snapshots.init(spark, root, base, statsCols = Seq("k"),
        checkpointInterval = 4, pqSectionThreshold = pqsecThreshold)
      (1 to 4).foreach { i => // v2,v3 deltas; v4 full; v5 delta
        Snapshots.append(spark, root,
          Seq((10000L + i, i)).toDF("k", "grp"), "k")
      }
      Snapshots.deleteRange(spark, root, "k", 0L, 2500L) // v6: -1 file
    }
    val rootPq = java.nio.file.Files
      .createTempDirectory("graft_pqsec").toString + "/t"
    val rootTx = java.nio.file.Files
      .createTempDirectory("graft_pqsec_tx").toString + "/t"
    lifecycle(rootPq, pqsecThreshold = 0) // every full section parquet
    lifecycle(rootTx, pqsecThreshold = Int.MaxValue) // inline twin
    // the externalized manifests carry ONE pointer line, no file lines
    Seq(1, 4).foreach { v =>
      val lines = rawManifest(rootPq, v)
      assert(lines.count(_.startsWith("#pqsec:")) == 1, s"v$v pointer")
      assert(!lines.exists(l => !l.startsWith("#")), s"v$v inline leak")
      assert(rawManifest(rootTx, v).count(_.startsWith("#pqsec:")) == 0)
    }
    // resolution equality with the inline twin at every version:
    // same entry count, same stats multiset (names differ by uuid)
    (1 to 6).foreach { v =>
      val pq = Snapshots.manifest(rootPq, v).entries
      val tx = Snapshots.manifest(rootTx, v).entries
      assert(pq.size == tx.size, s"v$v size")
      assert(pq.map(e => (e.rows, e.zones.get("k"))).sorted ==
        tx.map(e => (e.rows, e.zones.get("k"))).sorted, s"v$v stats")
    }
    // data equality end-to-end
    assert(Snapshots.read(spark, rootPq, 6).count() ==
      Snapshots.read(spark, rootTx, 6).count())
    // an orphaned section (losing OCC writer) and dropped versions'
    // sections reclaim: v4's manifest drops at keepFrom=5 (vacuum
    // materializes the keepFrom ckpt first, so no survivor's chain
    // needs it) — ZERO sections remain
    LakeFs.mkdirs(s"$rootPq/_manifests/pqsec_v9_orphan")
    Snapshots.vacuum(rootPq, keepFrom = 5, graceMs = 0L)
    val dirs = LakeFs.listDirNames(s"$rootPq/_manifests")
      .filter(_.startsWith("pqsec_"))
    assert(dirs.isEmpty, s"leaked: $dirs")
    // resolution through the vacuumed chain (v5's materialized ckpt)
    // stays exact
    assert(Snapshots.read(spark, rootPq, 6).count() == 10004L - 2500L)
    intercept[IllegalArgumentException](Snapshots.resolve(rootPq, 3))
    // while a keepFrom placed ON the pqsec version keeps its section:
    // rebuild and cut at 4
    val rootK = java.nio.file.Files
      .createTempDirectory("graft_pqsec_k").toString + "/t"
    lifecycle(rootK, pqsecThreshold = 0)
    Snapshots.vacuum(rootK, keepFrom = 4, graceMs = 0L)
    val kept = LakeFs.listDirNames(s"$rootK/_manifests")
      .filter(_.startsWith("pqsec_"))
    assert(kept.size == 1 && kept.head.startsWith("pqsec_v4_"),
      s"keepFrom's own section must survive: $kept")
    assert(Snapshots.read(spark, rootK, 6).count() == 10004L - 2500L)
  }

  test("readRange prunes files from manifest zones before the scan: " +
      "exact values, empty selection yields an empty typed frame") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcrr").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    // zone 1 only: [2600, 2700) lives entirely in file 1
    val ctr = Bucketing.footerReads.get()
    val before = ctr.get()
    val slice = Snapshots.readRange(spark, root, 1, "k", 2600L, 2700L)
    assert(ctr.get() == before, "readRange planned from footers")
    assert(slice.count() == 100L)
    val opened = Bucketing.filesRead(slice).map(p =>
      p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(opened.size == 1 && opened.head.contains("part-00001"))
    // position deletes still apply through the pruned read
    Snapshots.deletePositions(spark, root, "k", 2600L, 2650L)
    assert(Snapshots.readRange(spark, root, 2, "k", 2600L, 2700L)
      .count() == 50L)
    // a range beyond every zone: empty frame, schema intact
    val empty = Snapshots.readRange(spark, root, 1, "k", 50000L, 60000L)
    assert(empty.isEmpty && empty.columns.toSeq == Seq("k", "grp"))
  }

  test("metadataAgg answers count/min/max from the manifest alone, and " +
      "refuses whenever metadata could lie (live dv, missing stats)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcagg").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    Snapshots.deleteRange(spark, root, "k", 0L, 100L)
    val ctr = Bucketing.footerReads.get()
    val before = ctr.get()
    val r = Snapshots.metadataAgg(spark, root, 2, "k").head()
    assert(ctr.get() == before, "metadataAgg opened a footer")
    assert(r.getLong(0) == 9900L && r.getLong(1) == 100L &&
      r.getLong(2) == 9999L)
    // live position deletes would overcount → refuse
    Snapshots.deletePositions(spark, root, "k", 200L, 210L)
    intercept[IllegalArgumentException](
      Snapshots.metadataAgg(spark, root, 3, "k"))
    // a column without stamped stats → loud error, never a wrong answer
    intercept[RuntimeException](
      Snapshots.metadataAgg(spark, root, 2, "grp"))
  }

  test("batch ids fold into a watermark: unbounded sequential commits " +
      "cost ONE meta line, out-of-order ids stay sparse until gaps fill") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcwm").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    (0 until 20).foreach { i =>
      assert(Snapshots.appendBatch(spark, root,
        Seq((70000L + i, i)).toDF("k", "grp"), "k", i.toLong))
    }
    val latest = Snapshots.latestVersion(root)
    val lines = rawManifest(root, latest)
    assert(lines.count(_.startsWith("#batchwm:")) == 1)
    assert(lines.count(_.startsWith("#batch:")) == 0,
      "sequential ids must fold entirely into the watermark")
    assert(Snapshots.manifest(root, latest).batchWatermark == 19L)
    assert(Snapshots.committedBatches(root) == (0L to 19L))
    // replays of folded ids still skip
    assert(!Snapshots.appendBatch(spark, root,
      Seq((70000L, 0)).toDF("k", "grp"), "k", 5L))
    // out-of-order: 25 commits before 20..24 exist — stays sparse...
    assert(Snapshots.appendBatch(spark, root,
      Seq((70100L, 1)).toDF("k", "grp"), "k", 25L))
    val m1 = Snapshots.manifest(root, Snapshots.latestVersion(root))
    assert(m1.batchWatermark == 19L && m1.isBatchCommitted(25L) &&
      !m1.isBatchCommitted(21L))
    // ...and folds once the gap fills
    (20L to 24L).foreach { id =>
      assert(Snapshots.appendBatch(spark, root,
        Seq((70100L + id, 1)).toDF("k", "grp"), "k", id))
    }
    val m2 = Snapshots.manifest(root, Snapshots.latestVersion(root))
    assert(m2.batchWatermark == 25L)
    assert(rawManifest(root, Snapshots.latestVersion(root))
      .count(_.startsWith("#batch:")) == 0)
  }

  test("vacuum retention grace: a just-written unreferenced file " +
      "survives the default window (the adopt-then-commit race guard)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcgrace").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    Snapshots.append(spark, root, Seq((40000L, 1)).toDF("k", "grp"), "k")
    // an orphan as a mid-commit writer would leave it: adopted data
    // file, manifest not yet committed
    val orphan = s"$root/files/orphan_inflight.parquet"
    LakeFs.copyFile(s"$root/files/" +
      Snapshots.resolve(root, 1).head, orphan)
    val (_, deletedGraced) = Snapshots.vacuum(root, keepFrom = 2)
    assert(deletedGraced == 0, "grace window must protect young orphans")
    assert(LakeFs.exists(orphan))
    val (_, deletedNow) = Snapshots.vacuum(root, keepFrom = 2, graceMs = 0L)
    assert(deletedNow == 1)
    assert(!LakeFs.exists(orphan))
  }

  test("timestamp time travel: versionAsOf resolves the newest version " +
      "at or before the instant; pre-history throws") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcts").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    Snapshots.append(spark, root, Seq((50000L, 1)).toDF("k", "grp"), "k")
    Snapshots.deleteRange(spark, root, "k", 0L, 2500L)
    val ts = (1 to 3).map(v => Snapshots.commitTimestamp(root, v).get)
    assert(ts == ts.sorted && ts.distinct == ts, "stamps must be monotone")
    assert(Snapshots.versionAsOf(root, ts(0)) == 1)
    assert(Snapshots.versionAsOf(root, ts(1)) == 2)
    assert(Snapshots.versionAsOf(root, ts(2)) == 3)
    assert(Snapshots.versionAsOf(root, ts(2) - 1) < 3)
    assert(Snapshots.versionAsOf(root, ts(2) + 1000000L) == 3)
    intercept[IllegalArgumentException](
      Snapshots.versionAsOf(root, ts(0) - 1))
    assert(Snapshots.readAsOf(spark, root, ts(1)).count() == 10001L)
    assert(Snapshots.readAsOf(spark, root, ts(2)).count() == 7501L)
  }

  test("latestVersion is hint-accelerated but never hint-dependent: " +
      "stale, garbled, or missing hints all resolve correctly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mchint").toString + "/t"
    Snapshots.init(spark, root, freshTable(), statsCols = Seq("k"))
    (1 to 3).foreach { i =>
      Snapshots.append(spark, root, Seq((60000L + i, i)).toDF("k", "grp"),
        "k")
    }
    val hint = s"$root/_manifests/_latest.hint"
    assert(Snapshots.latestVersion(root) == 4)
    LakeFs.writeHint(hint, "2") // stale: probe forward
    assert(Snapshots.latestVersion(root) == 4)
    LakeFs.writeHint(hint, "not-a-number") // garbled: fall back to listing
    assert(Snapshots.latestVersion(root) == 4)
    LakeFs.delete(hint) // missing (legacy table): listing
    assert(Snapshots.latestVersion(root) == 4)
  }

  test("pre-round-15 manifests stay readable AND mutable: plain name " +
      "lines, no #ts/#parent/stats — the standing-table upgrade path") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mcold").toString + "/t"
    val table = freshTable()
    // hand-write the OLD layout: copied files + a bare full name list
    LakeFs.mkdirs(s"$root/files")
    val names = Compaction.dataFileNames(table)
    names.foreach(n => LakeFs.copyFile(s"$table/$n", s"$root/files/$n"))
    LakeFs.mkdirs(s"$root/_manifests")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_manifests/v1.txt"),
      names.mkString("\n").getBytes("UTF-8"))
    // reads resolve (no hint, no stats, no timestamp)
    assert(Snapshots.latestVersion(root) == 1)
    assert(Snapshots.resolve(root, 1) == names.sorted)
    assert(Snapshots.read(spark, root, 1).count() == 10000L)
    assert(Snapshots.commitTimestamp(root, 1).isEmpty)
    // mutations plan from FOOTERS (the conservative fallback) and the
    // new commit is a delta carrying stats for its new files
    val r = Snapshots.deleteRange(spark, root, "k", 0L, 100L)
    assert(r.rewritten == 1 && r.reused == 3)
    assert(Snapshots.read(spark, root, 2).count() == 9900L)
    val v2 = rawManifest(root, 2)
    assert(v2.exists(_.startsWith("#parent:1")))
    assert(v2.exists(_.startsWith("#ts:")))
    // timestamp travel works from the first stamped version on; the
    // unstamped v1 counts as infinitely old
    val ts2 = Snapshots.commitTimestamp(root, 2).get
    assert(Snapshots.versionAsOf(root, ts2) == 2)
    assert(Snapshots.versionAsOf(root, ts2 - 1) == 1)
  }

  test("schema fingerprints invalidate when a path is rewritten — the " +
      "memo keys on (path, length, mtime), not path alone") {
    val d = java.nio.file.Files
      .createTempDirectory("graft_fpmemo").toString
    val p = s"$d/f.parquet"
    def writeAs(df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$d/tmp")
      val one = Compaction.dataFiles(s"$d/tmp") match { case Seq(f) => f }
      LakeFs.delete(p)
      java.nio.file.Files.move(one.toPath, new java.io.File(p).toPath)
    }
    writeAs(Seq((1L, 2)).toDF("a", "b"))
    val fp1 = Bucketing.schemaFingerprint(spark, p)
    writeAs(Seq((1L, 2.5, "x")).toDF("a", "c", "d")) // same path, new schema
    val fp2 = Bucketing.schemaFingerprint(spark, p)
    assert(fp1 != fp2, "stale fingerprint served for a rewritten path")
  }

  test("the upsert zone-verify probe applies live deletion vectors: a " +
      "MoR-deleted match cannot promote its file into the rewrite set") {
    // table sorted/zoned on z but KEYED on k (k runs opposite to z), so
    // a matched key can live OUTSIDE the batch's zone — the probe's job
    val d = java.nio.file.Files.createTempDirectory("graft_pdv").toString
    (0 until 4).foreach { i =>
      (i * 2500 until (i + 1) * 2500)
        .map(j => (j.toLong, (9999 - j).toLong, j % 7))
        .toDF("z", "k", "grp").coalesce(1)
        .write.parquet(s"$d/t/__part$i")
      val one = Compaction.dataFiles(s"$d/t/__part$i") match {
        case Seq(f) => f
      }
      java.nio.file.Files.move(one.toPath,
        new java.io.File(s"$d/t", f"part-$i%05d.parquet").toPath)
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(s"$d/t/__part$i"))
    }
    val root = s"$d/snap"
    Snapshots.init(spark, root, s"$d/t")
    // k=9899 lives at z=100 in the zone-0 file; MoR-delete it first
    Snapshots.deletePositionsByKey(spark, root, "k",
      Seq(9899L).toDF("k"))
    val zone0 = Snapshots.resolve(root, 2).find(_.contains("part-00000"))
      .getOrElse(fail("zone-0 file missing"))
    // the update says z=9000: zone plan touches only the zone-3 file;
    // the probe sees k=9899's stored row is DEAD → zone-0 stays reused
    val r = Snapshots.upsert(spark, root, "k", "z",
      Seq((9000L, 9899L, 55)).toDF("z", "k", "grp"))
    assert(Snapshots.resolve(root, r.version).contains(zone0),
      "probe promoted a file whose only match was MoR-deleted")
    val v = Snapshots.read(spark, root, r.version)
    assert(v.where(col("k") === 9899L).count() == 1L) // the update row
    assert(v.where(col("k") === 9899L).select(col("grp"))
      .head().getInt(0) == 55)
  }
}
