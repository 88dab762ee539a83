package graft

import graft.sources.{Bucketing, Compaction, Manifest, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.sources.Manifest]] + [[graft.sources.Snapshots]] — the
  * table-format layer: zone-map manifests plan file lists without
  * touching the directory; snapshot versions mutate copy-on-write at
  * file granularity and time-travel losslessly.
  */
class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 range-sorted files of 10k rows, key 0..9999 — zone i covers
    * [2500i, 2500(i+1)) exactly (written per-range, not sampled, so the
    * envelopes are known in closed form).
    */
  private lazy val tableDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_lake").toString
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

  test("manifest zones match the data exactly; selection is the " +
      "interval-intersection law") {
    val zones = Manifest.buildTs(spark, tableDir, "k")
    assert(zones.size == 4)
    zones.zipWithIndex.foreach { case ((file, bytes, rows, mn, mx), i) =>
      assert(file.endsWith(f"part-$i%05d.parquet"))
      assert(bytes > 0 && rows == 2500L)
      assert(mn == 2500L * i && mx == 2500L * (i + 1) - 1)
    }
    val man = s"${tableDir}_man"
    Manifest.writeTs(spark, tableDir, "k", man)
    // inside one zone
    assert(Manifest.selectFiles(spark, man, 100, 200).size == 1)
    // straddling a boundary
    assert(Manifest.selectFiles(spark, man, 2400, 2600).size == 2)
    // full range / beyond
    assert(Manifest.selectFiles(spark, man, 0, 10000).size == 4)
    assert(Manifest.selectFiles(spark, man, 10000, 20000).isEmpty)
    // boundary semantics: [lo, hi) — hi exactly at a zone min excludes it
    assert(Manifest.selectFiles(spark, man, 0, 2500).size == 1)
    // empty selection reads an empty frame with the right schema
    val empty = Manifest.readSelected(spark, tableDir, Seq.empty)
    assert(empty.isEmpty && empty.columns.toSeq == Seq("k", "grp"))
  }

  test("two-column manifest: per-file envelopes exact on both " +
      "dimensions, conjunctive selection = the intersection law") {
    // files zone k ascending and j descending: file i has k in
    // [2500i, 2500(i+1)) and j in [9999-2500(i+1)+1, 9999-2500i]
    val d = java.nio.file.Files.createTempDirectory("graft_m2").toString
    val out = s"$d/t"
    new java.io.File(out).mkdirs()
    (0 until 4).foreach { i =>
      (i * 2500 until (i + 1) * 2500)
        .map(k => (k.toLong, 9999L - k)).toDF("k", "j").coalesce(1)
        .write.parquet(s"$out/__part$i")
      val one = Compaction.dataFiles(s"$out/__part$i") match {
        case Seq(f) => f
      }
      java.nio.file.Files.move(one.toPath,
        new java.io.File(out, f"part-$i%05d.parquet").toPath)
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(s"$out/__part$i"))
    }
    val zones = Manifest.buildTs2(spark, out, "k", "j")
    assert(zones.size == 4)
    zones.zipWithIndex.foreach { case ((_, bytes, rows, mnA, mxA, mnB, mxB),
        i) =>
      assert(bytes > 0 && rows == 2500L)
      assert(mnA == 2500L * i && mxA == 2500L * (i + 1) - 1)
      assert(mnB == 9999L - (2500L * (i + 1) - 1) && mxB == 9999L - 2500L * i)
    }
    val man = s"$d/man"
    Manifest.writeTs2(spark, out, "k", "j", man)
    // k in [2000,6000) hits files 0,1,2; j in [2000,5000) hits files 2,3
    // (j runs DESCENDING) → conjunction = file 2 only
    val sel2 = Manifest.selectFiles2(spark, man, 2000L, 6000L, 2000L, 5000L)
    val selA = Manifest.selectFilesOn(spark, man, "min_a", "max_a",
      2000L, 6000L)
    val selB = Manifest.selectFilesOn(spark, man, "min_b", "max_b",
      2000L, 5000L)
    assert(selA.size == 3 && selB.size == 2)
    assert(sel2.size == 1 && sel2.toSet == (selA.toSet & selB.toSet))
    assert(sel2.head.endsWith("part-00002.parquet"))
    // non-empty single-column selections whose conjunction is empty
    assert(Manifest.selectFiles2(spark, man, 0L, 100L, 0L, 100L).isEmpty)
    // the conjunctive-planned scan equals the flat twin
    val got = Manifest.readSelected(spark, out, sel2)
      .where(col("k") >= 2000 && col("k") < 6000 &&
        col("j") >= 2000 && col("j") < 5000)
      .agg(count(lit(1)), sum(col("k"))).head()
    val want = spark.read.parquet(out)
      .where(col("k") >= 2000 && col("k") < 6000 &&
        col("j") >= 2000 && col("j") < 5000)
      .agg(count(lit(1)), sum(col("k"))).head()
    assert(got == want && got.getLong(0) == 1000L)
  }

  test("bloom manifest: no false negatives for any present key, real " +
      "pruning for point lookups, union over multi-key batches") {
    val man = s"${tableDir}_bloom"
    Manifest.writeBloom(spark, tableDir, "k", man, fpp = 1e-4)
    // no-false-negative sweep: every sampled key's true file is selected,
    // and the lookup prunes (fp behavior is deterministic for fixed data)
    (0 until 10000 by 617).foreach { k =>
      val sel = Manifest.selectFilesBloom(spark, man, Seq(k.toLong))
      assert(sel.contains(f"part-${k / 2500}%05d.parquet"),
        s"false negative for k=$k")
      assert(sel.size < 4, s"no pruning for k=$k")
    }
    // a key outside the domain selects (almost surely) nothing
    assert(Manifest.selectFilesBloom(spark, man, Seq(999999L)).size <= 1)
    // multi-key batches select the union of the per-key files
    val s2 = Manifest.selectFilesBloom(spark, man, Seq(100L, 9000L))
    assert(Set("part-00000.parquet", "part-00003.parquet")
      .subsetOf(s2.toSet))
  }

  test("manifest-planned scan equals the full scan with the predicate") {
    val man = s"${tableDir}_man2"
    Manifest.writeTs(spark, tableDir, "k", man)
    val files = Manifest.selectFiles(spark, man, 2400, 5100)
    assert(files.size == 3)
    val got = Manifest.readSelected(spark, tableDir, files)
      .where(col("k") >= 2400 && col("k") < 5100)
      .agg(count(lit(1)), sum(col("k"))).head()
    val want = spark.read.parquet(tableDir)
      .where(col("k") >= 2400 && col("k") < 5100)
      .agg(count(lit(1)), sum(col("k"))).head()
    assert(got == want)
    assert(Bucketing.filesRead(
      Manifest.readSelected(spark, tableDir, files))
      .map(Manifest.normalizePath).toSet
      .subsetOf(files.toSet))
  }

  test("snapshot delete is copy-on-write: zone-planned rewrite, " +
      "physical reuse, v1 isolated, chained versions") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snap").toString + "/t"
    assert(Snapshots.init(spark, root, tableDir) == 1)
    val v1Rows = Snapshots.read(spark, root, 1).count()
    assert(v1Rows == 10000L)

    // delete [1000, 3000): touches zones 0 and 1 only
    val r = Snapshots.deleteRange(spark, root, "k", 1000L, 3000L)
    assert(r.version == 2 && r.rewritten == 2 && r.reused == 2)
    val f1 = Snapshots.resolve(root, 1).toSet
    val f2 = Snapshots.resolve(root, 2).toSet
    // the two untouched files are the SAME physical entries, not copies
    assert((f1 & f2).size == 2)
    // v2 content: exactly the complement
    val v2 = Snapshots.read(spark, root, 2)
    assert(v2.count() == 8000L)
    assert(v2.where(col("k") >= 1000 && col("k") < 3000).isEmpty)
    assert(v2.agg(sum(col("k"))).head().getLong(0) ==
      (0 until 10000).filterNot(k => k >= 1000 && k < 3000).map(_.toLong).sum)
    // v1 still reads the ORIGINAL data after the delete (isolation)
    assert(Snapshots.read(spark, root, 1).count() == 10000L)

    // chained delete wiping an entire file's zone drops the file
    val r2 = Snapshots.deleteRange(spark, root, "k", 7500L, 10000L)
    assert(r2.version == 3 && r2.rewritten == 1)
    assert(Snapshots.resolve(root, 3).size == Snapshots.resolve(root, 2).size - 1)
    assert(Snapshots.read(spark, root, 3).count() == 5500L)
    assert(Snapshots.latestVersion(root) == 3)
  }

  test("upsert is a zone-bounded MERGE: matched keys replaced, unmatched " +
      "inserted, untouched files reused, versions isolated") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_up").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    // batch inside zone 1 only: update keys 3000..3009 (grp := 99),
    // insert keys 100000..100004 with in-zone sort values
    // zone column is k itself; the insert keys (100000+) extend the
    // batch zone past zones 2 and 3, so those files are touched too
    val updates = ((3000 until 3010).map(k => (k.toLong, 99)) ++
      (0 until 5).map(i => (100000L + i, 77))).toDF("k", "grp")
    val r = Snapshots.upsert(spark, root, "k", "k", updates)
    assert(r.version == 2 && r.upserted == 15L)
    // batch zone [3000, 100004]: zones 1,2,3 intersect, zone 0 reused
    assert(r.rewritten == 3 && r.reused == 1)
    val v2 = Snapshots.read(spark, root, 2)
    assert(v2.count() == 10005L)
    // matched keys replaced, not duplicated
    assert(v2.where(col("k") >= 3000 && col("k") < 3010).count() == 10L)
    assert(v2.where(col("k") >= 3000 && col("k") < 3010)
      .agg(min(col("grp")), max(col("grp"))).head() ===
      org.apache.spark.sql.Row(99, 99))
    // unmatched inserted
    assert(v2.where(col("k") >= 100000).count() == 5L)
    // every other row untouched
    assert(v2.where(col("k") < 3000 || (col("k") >= 3010 && col("k") < 100000))
      .agg(sum(col("grp"))).head().getLong(0) ==
      (0 until 10000).filterNot(k => k >= 3000 && k < 3010)
        .map(k => (k % 7).toLong).sum)
    // v1 isolated
    assert(Snapshots.read(spark, root, 1).count() == 10000L)

    // empty batch commits a no-op version
    val r2 = Snapshots.upsert(spark, root, "k", "k",
      updates.where(lit(false)))
    assert(r2.version == 3 && r2.rewritten == 0 && r2.upserted == 0L)
    assert(Snapshots.read(spark, root, 3).count() == 10005L)
  }

  test("optimize compacts the churned manifest into few files with " +
      "identical data; vacuum reclaims only unreferenced files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_opt").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    Snapshots.deleteRange(spark, root, "k", 1000L, 1100L)
    val updates = (5000 until 5020).map(k => (k.toLong, 42)).toDF("k", "grp")
    Snapshots.upsert(spark, root, "k", "k", updates)
    val before = Snapshots.resolve(root, Snapshots.latestVersion(root))
    val preSum = Snapshots.read(spark, root, 3)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head()

    val v4 = Snapshots.optimize(spark, root, "k", 2)
    assert(v4 == 4)
    val after = Snapshots.resolve(root, 4)
    assert(after.size == 2 && after.size < before.size)
    assert(Snapshots.read(spark, root, 4)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head() == preSum)

    // vacuum to latest: old manifests dropped, their exclusive files
    // physically deleted, the live version untouched
    val onDisk = Compaction.dataFiles(s"$root/files").size
    val (manifests, deleted) = Snapshots.vacuum(root, keepFrom = 4, graceMs = 0L)
    assert(manifests == 3)
    assert(deleted == onDisk - 2, "vacuum must delete ALL unreferenced files")
    assert(Compaction.dataFiles(s"$root/files").size == 2)
    assert(Snapshots.read(spark, root, 4)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head() == preSum)
    intercept[IllegalArgumentException](Snapshots.resolve(root, 1))
  }

  test("append evolves the schema (old files read NULL), and batch " +
      "commits are exactly-once under replay") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ap").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    // evolved batch: a column no v1 file has
    val batch = (0 until 10).map(i => (20000L + i, 1, 3.5))
      .toDF("k", "grp", "score")
    assert(Snapshots.append(spark, root, batch, "k") == 2)
    val v2 = Snapshots.read(spark, root, 2)
    assert(v2.count() == 10010L)
    assert(v2.where(col("score").isNull).count() == 10000L)
    assert(v2.agg(sum(col("score"))).head().getDouble(0) == 35.0)
    // v1 keeps its original schema
    assert(!Snapshots.read(spark, root, 1).columns.contains("score"))

    // exactly-once: replaying a committed batchId is a no-op
    val b = (0 until 3).map(i => (30000L + i, 2)).toDF("k", "grp")
    assert(Snapshots.appendBatch(spark, root, b, "k", 7L))
    assert(!Snapshots.appendBatch(spark, root, b, "k", 7L))
    assert(Snapshots.latestVersion(root) == 3)
    assert(Snapshots.read(spark, root, 3).count() == 10013L)
    assert(Snapshots.committedBatches(root) == Seq(7L))
  }

  test("commits are optimistic-concurrency safe: a second writer from " +
      "the same base version fails loudly instead of silently winning") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    // this writer planned against v1; a racing committer lands v2 first
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_manifests/v2.txt"),
      Snapshots.resolve(root, 1).mkString("\n").getBytes("UTF-8"))
    val batch = Seq((50000L, 1)).toDF("k", "grp")
    intercept[java.util.ConcurrentModificationException](
      Snapshots.append(spark, root, batch, "k", base = 1))
    // re-planning against the new latest succeeds
    assert(Snapshots.append(spark, root, batch, "k") == 3)
    // and the loser's failure left v2 intact
    assert(Snapshots.read(spark, root, 2).count() == 10000L)
  }

  test("netChanges replays exactly the delta: delete feed = deleted " +
      "rows, upsert feed = new versions + replaced originals") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdc").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    Snapshots.deleteRange(spark, root, "k", 1000L, 1100L)
    val (a1, r1) = Snapshots.netChanges(spark, root, 1, 2)
    assert(a1.isEmpty)
    assert(r1.count() == 100L)
    assert(r1.agg(min(col("k")), max(col("k"))).head() ===
      org.apache.spark.sql.Row(1000L, 1099L))

    val updates = (5000 until 5005).map(k => (k.toLong, 9)).toDF("k", "grp")
    Snapshots.upsert(spark, root, "k", "k", updates)
    val (a2, r2) = Snapshots.netChanges(spark, root, 2, 3)
    // new row versions arrive, replaced originals leave
    assert(a2.count() == 5L && a2.agg(min(col("grp")), max(col("grp")))
      .head() === org.apache.spark.sql.Row(9, 9))
    assert(r2.count() == 5L)
    assert(r2.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq ==
      (5000L to 5004L))
    assert(r2.agg(max(col("grp"))).head().getInt(0) <= 6) // originals: k % 7
  }

  test("changeFeed tags rows with the Delta-CDF contract: paired " +
      "update pre/post images, inserts, deletes — by key") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdf").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    // v2: MERGE — update keys 5000..5004 (grp := 9), insert 100000..100002
    val updates = ((5000 until 5005).map(k => (k.toLong, 9)) ++
      (0 until 3).map(i => (100000L + i, 77))).toDF("k", "grp")
    Snapshots.upsert(spark, root, "k", "k", updates)
    val feed = Snapshots.changeFeed(spark, root, 1, 2, "k").cache()
    val byTag = feed.groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag == Map("insert" -> 3L, "update_preimage" -> 5L,
      "update_postimage" -> 5L))
    // preimages carry the ORIGINAL values, postimages the new ones
    assert(feed.where(col("_change_type") === "update_preimage")
      .agg(max(col("grp"))).head().getInt(0) <= 6) // originals: k % 7
    assert(feed.where(col("_change_type") === "update_postimage")
      .agg(min(col("grp")), max(col("grp"))).head() ===
      org.apache.spark.sql.Row(9, 9))
    assert(feed.where(col("_change_type") === "insert")
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq ==
      (100000L to 100002L))
    // pre/post pair on the SAME keys
    assert(feed.where(col("_change_type").startsWith("update"))
      .groupBy(col("k")).count().where(col("count") =!= 2).isEmpty)
    feed.unpersist()
    // v3: pure delete — every tag is 'delete'
    Snapshots.deleteRange(spark, root, "k", 1000L, 1100L)
    val feed2 = Snapshots.changeFeed(spark, root, 2, 3, "k")
    assert(feed2.groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("delete" -> 100L))
    // and a merge-on-read delete tags identically to the COW one
    Snapshots.deletePositions(spark, root, "k", 2000L, 2050L)
    val feed3 = Snapshots.changeFeed(spark, root, 3, 4, "k")
    assert(feed3.groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("delete" -> 50L))
  }

  test("racing writers never collide on a physical file: the loser's " +
      "orphans sit beside the winner's files until vacuum reclaims them") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ2").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    // writer A wins v2
    val a = Seq((60000L, 1)).toDF("k", "grp")
    assert(Snapshots.append(spark, root, a, "k", base = 1) == 2)
    val winnerSum = Snapshots.read(spark, root, 2)
      .agg(count(lit(1)), sum(col("k"))).head()
    // writer B planned against the same base: its data files land (UUID
    // names — they CANNOT overwrite A's), then its commit fails loudly
    val b = Seq((70000L, 2)).toDF("k", "grp")
    intercept[java.util.ConcurrentModificationException](
      Snapshots.append(spark, root, b, "k", base = 1))
    // the winner's committed version is byte-identical after the race —
    // the corruption the deterministic-name layout allowed
    assert(Snapshots.read(spark, root, 2)
      .agg(count(lit(1)), sum(col("k"))).head() == winnerSum)
    assert(Snapshots.read(spark, root, 2)
      .where(col("k") === 70000L).isEmpty)
    // the loser's orphan exists on disk but no manifest references it...
    val onDisk = Compaction.dataFileNames(s"$root/files").size
    val referenced = (1 to 2).flatMap(Snapshots.resolve(root, _)).distinct
    assert(onDisk == referenced.size + 1)
    // ...and vacuum reclaims exactly it
    val (_, deleted) = Snapshots.vacuum(root, keepFrom = 1, graceMs = 0L)
    assert(deleted == 1)
    assert(Compaction.dataFileNames(s"$root/files").size == referenced.size)
  }

  test("batch id commits atomically WITH the manifest and survives " +
      "vacuum: no crash window between data and idempotence marker") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_batch").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    val b = Seq((80000L, 3)).toDF("k", "grp")
    assert(Snapshots.appendBatch(spark, root, b, "k", 42L))
    // the id is IN the committed manifest — one atomic exclusive create
    assert(Snapshots.manifest(root, 2).batchIds == Seq(42L))
    // later commits carry the cumulative set forward...
    Snapshots.append(spark, root, Seq((80001L, 3)).toDF("k", "grp"), "k")
    assert(Snapshots.manifest(root, 3).batchIds == Seq(42L))
    // ...so exactly-once survives vacuum dropping the committing manifest
    Snapshots.vacuum(root, keepFrom = 3, graceMs = 0L)
    assert(Snapshots.committedBatches(root) == Seq(42L))
    assert(!Snapshots.appendBatch(spark, root, b, "k", 42L))
  }

  test("upsert verifies the zone plan: a matched key stored OUTSIDE the " +
      "batch's zone is still replaced (key probe), not duplicated") {
    // table sorted/zoned on z but KEYED on k (k runs opposite to z), so
    // an update row can carry a z whose zone misses its stored row's file
    val d = java.nio.file.Files.createTempDirectory("graft_probe_t").toString
    (0 until 4).foreach { i =>
      (i * 2500 until (i + 1) * 2500)
        .map(j => (j.toLong, (9999 - j).toLong, j % 7))
        .toDF("z", "k", "grp").coalesce(1)
        .write.parquet(s"$d/t/__part$i")
      val one = Compaction.dataFiles(s"$d/t/__part$i") match { case Seq(f) => f }
      java.nio.file.Files.move(one.toPath,
        new java.io.File(s"$d/t", f"part-$i%05d.parquet").toPath)
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(s"$d/t/__part$i"))
    }
    val root2 = s"$d/snap"
    Snapshots.init(spark, root2, s"$d/t")
    // key k=9899 is stored at z=100 (zone-0 file); the update batch says
    // z=9000 — the zone plan alone touches only the zone-3 file
    val viol = Seq((9000L, 9899L, 55)).toDF("z", "k", "grp")
    val r = Snapshots.upsert(spark, root2, "k", "z", viol)
    // probe promoted the stored row's file: matched key replaced, unique
    val v2 = Snapshots.read(spark, root2, 2)
    assert(v2.count() == 10000L)
    assert(v2.where(col("k") === 9899L).count() == 1L)
    assert(v2.where(col("k") === 9899L).select(col("grp"))
      .head().getInt(0) == 55)
    assert(r.rewritten >= 2) // zone file AND the promoted file
    // trustZones skips the probe — documenting exactly the failure the
    // default prevents: the stale row survives beside its replacement
    val root3 = s"$d/snap_trust"
    Snapshots.init(spark, root3, s"$d/t")
    Snapshots.upsert(spark, root3, "k", "z", viol, trustZones = true)
    assert(Snapshots.read(spark, root3, 2)
      .where(col("k") === 9899L).count() == 2L)
  }

  test("schema-fingerprint fast path: a uniform table plans a PLAIN " +
      "read (no mergeSchema footer-union), an evolved one keeps it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_fp").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    def scanOptions(df: org.apache.spark.sql.DataFrame)
        : Map[String, String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation
            .asInstanceOf[org.apache.spark.sql.execution.datasources
              .HadoopFsRelation].options
      }.head
    // 4 files, one physical schema → no mergeSchema option on the scan
    assert(!scanOptions(Snapshots.read(spark, root, 1))
      .contains("mergeSchema"))
    // an add-only evolved append makes schemas mixed → footer-union read
    Snapshots.append(spark, root,
      Seq((90000L, 1, 0.5)).toDF("k", "grp", "score"), "k")
    assert(scanOptions(Snapshots.read(spark, root, 2))
      .get("mergeSchema").contains("true"))
    // optimize normalizes the physical schema → fast path again
    val v3 = Snapshots.optimize(spark, root, "k", 2)
    assert(!scanOptions(Snapshots.read(spark, root, v3))
      .contains("mergeSchema"))
  }

  test("optimizeZOrder rewrites the live version as Morton-range files: " +
      "lossless, dv folded, conjunctive pruning works on the result") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_zopt").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    // put a live dv on the table so the fold is exercised too
    Snapshots.deletePositions(spark, root, "k", 0L, 500L)
    val pre = Snapshots.read(spark, root, 2)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head()
    val v3 = Snapshots.optimizeZOrder(spark, root, col("k"), col("grp"), 8)
    assert(Snapshots.resolve(root, v3).size == 8)
    assert(Snapshots.deleteSidecars(root, v3).isEmpty)
    assert(Snapshots.read(spark, root, v3)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head() == pre)
    // every file's envelope is bounded on BOTH dimensions, and a
    // conjunctive predicate selects a strict subset
    val paths = Snapshots.resolve(root, v3).map(n => s"$root/files/$n")
    val zk = Bucketing.fileZones(spark, paths, "k")
    val zg = Bucketing.fileZones(spark, paths, "grp").map(z => z._1 -> z._3)
      .toMap
    assert(zk.forall(_._3.nonEmpty) && zg.values.forall(_.nonEmpty))
    val sel = zk.filter {
      case (n, _, Some((mnK, mxK))) =>
        val (mnG, mxG) = zg(n).get
        mxK >= 2000L && mnK < 4000L && mxG >= 0L && mnG < 3L
      case _ => false
    }
    assert(sel.nonEmpty && sel.size < 8)
  }

  test("commitWithRetry linearizes racing writers: both commits land, " +
      "no version lost, every batch present exactly once") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_retry").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    // stale-base attempt: fails once, retry replans and lands
    val rival = Seq((70000L, 1)).toDF("k", "grp")
    Snapshots.append(spark, root, rival, "k") // v2 lands first
    var calls = 0
    val v = Snapshots.commitWithRetry() {
      calls += 1
      // first call deliberately plans against the stale base 1
      val base = if (calls == 1) 1 else -1
      Snapshots.append(spark, root,
        Seq((71000L, 2)).toDF("k", "grp"), "k", base = base)
    }
    assert(v == 3 && calls == 2)
    // real concurrency: two threads race from the same live table
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val fs = (0 until 2).map { i =>
      Future(Snapshots.commitWithRetry() {
        Snapshots.append(spark, root,
          Seq((72000L + i, 3)).toDF("k", "grp"), "k")
      })
    }
    val got = fs.map(f => Await.result(f, 120.seconds)).sorted
    assert(got == Seq(4, 5))
    val latest = Snapshots.read(spark, root, 5)
    assert(latest.where(col("k") >= 70000L).count() == 4L)
    // exhausted retries fail loudly
    intercept[java.util.ConcurrentModificationException](
      Snapshots.commitWithRetry(maxAttempts = 2) {
        Snapshots.append(spark, root, rival, "k", base = 1)
      })
  }

  test("optimizeBinPack rewrites ONLY undersized files: right-sized " +
      "files re-referenced verbatim, live dv marks survive, lossless") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pack").toString + "/t"
    Snapshots.init(spark, root, tableDir) // 4 files, ~equal size
    val bigSize = Compaction.dataFiles(s"$root/files").map(_.length).min
    // three tiny commits on top (the streaming-accretion shape)
    (0 until 3).foreach { i =>
      Snapshots.append(spark, root,
        Seq((50000L + i, i)).toDF("k", "grp"), "k")
    }
    // a MoR mark on a BIG file must survive the pack untouched
    Snapshots.deletePositions(spark, root, "k", 100L, 110L)
    val pre = Snapshots.read(spark, root, 5)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head()
    val origs = Snapshots.resolve(root, 1).toSet

    val r = Snapshots.optimizeBinPack(spark, root, "k", bigSize)
    assert(r.rewritten == 3 && r.reused == 4 && r.filesAfter == 5)
    val after = Snapshots.resolve(root, r.version)
    // the four right-sized files are the SAME physical entries
    assert(origs.subsetOf(after.toSet))
    // the dv line still applies to them
    assert(Snapshots.deleteSidecars(root, r.version).size == 1)
    assert(Snapshots.read(spark, root, r.version)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head() == pre)
    assert(Snapshots.read(spark, root, r.version)
      .where(col("k") >= 100 && col("k") < 110).isEmpty)
    // a fully right-sized table is a no-op pack
    val r2 = Snapshots.optimizeBinPack(spark, root, "k", 1L)
    assert(r2.rewritten == 0 && r2.reused == 5)
  }

  test("deleteRange on a missing range rewrites nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snap2").toString + "/t"
    Snapshots.init(spark, root, tableDir)
    val r = Snapshots.deleteRange(spark, root, "k", 50000L, 60000L)
    assert(r.rewritten == 0 && r.reused == 4)
    assert(Snapshots.read(spark, root, 2).count() == 10000L)
  }
}
