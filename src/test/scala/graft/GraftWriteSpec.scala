package graft

import graft.sources.{Bucketing, LakeFs, Snapshots}
import graft.sources.v2.{GraftCommitMessage, GraftScanAudit, GraftStreamingWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 WRITE path ([[graft.sources.v2.GraftWrite]]): executors
  * write store files and stamp their own commit-time stats; the driver
  * commit is metadata-only OCC; streaming epochs are exactly-once.
  */
class GraftWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_w").toString
    val out = s"$d/src"
    new java.io.File(out).mkdirs()
    (0L until 1000L).map(k => (k, k % 7, f"tag$k%05d"))
      .toDF("k", "grp", "tag").coalesce(1).write.parquet(s"$d/__seed")
    val one = graft.sources.Compaction.dataFiles(s"$d/__seed") match {
      case Seq(f) => f
    }
    java.nio.file.Files.move(one.toPath,
      new java.io.File(out, "part-00000.parquet").toPath)
    org.apache.spark.network.util.JavaUtils
      .deleteRecursively(new java.io.File(s"$d/__seed"))
    val root = s"$d/t"
    Snapshots.init(spark, root, out, statsCols = Seq("k", "tag"))
    root
  }

  private def load(root: String, opts: (String, String)*) = {
    val r = spark.read.format("graft").option("path", root)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("a rival relayout between write build and commit STRIPS stale " +
      "bucket stamps: ids computed under a dead spec never mis-group " +
      "a storage-partitioned join") {
    val root = freshTable()
    Snapshots.optimizeBucketed(spark, root, "k", 4)
    // one real store file, stamped as a writer that RESOLVED (k, 8)
    // would stamp it — the live spec is (k, 4), so the id is stale
    def adopted(tag: String, assumed: Option[(String, Int)])
        : Snapshots.FileEntry = {
      Seq((9000L, 1L, tag)).toDF("k", "grp", "tag").coalesce(1)
        .write.parquet(s"$root/__w_$tag")
      val f = graft.sources.Compaction.dataFiles(s"$root/__w_$tag") match {
        case Seq(x) => x
      }
      val name = s"w_race_$tag.parquet"
      java.nio.file.Files.move(f.toPath,
        new java.io.File(s"$root/files", name).toPath)
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(s"$root/__w_$tag"))
      val (rows, fp, zones, szones, _) = Bucketing.fileStatsEntry(spark,
        s"$root/files/$name", Seq("k"))
      val n = assumed.map(_._2).getOrElse(4)
      val e = Snapshots.FileEntry(name, Some(rows),
        Some(LakeFs.fileLength(s"$root/files/$name")), Some(fp), zones,
        szones, bucket = Some(graft.sources.v2.GraftBucket.id(n, 9000L)))
      Snapshots.commitAdopted(root, Seq(e), assumedBucket = assumed)
      Snapshots.manifest(root, Snapshots.latestVersion(root))
        .entries.find(_.name == name).get
    }
    // assumed (k, 8) ≠ live (k, 4): the stamp must be STRIPPED
    assert(adopted("stale", Some(("k", 8))).bucket.isEmpty,
      "a stamp computed under a dead spec must not land")
    // assumed matches the live spec: the stamp lands
    assert(adopted("fresh", Some(("k", 4))).bucket
      .contains(graft.sources.v2.GraftBucket.id(4, 9000L)))
    // data correct through both commits
    assert(load(root).where(col("k") === 9000L).count() == 2L)
  }

  test("batch append through the writer API: new version, data exact, " +
      "manifest stats stamped by the EXECUTOR (plans stay footer-free)") {
    val root = freshTable()
    val add = (1000L until 1500L).map(k => (k, k % 7, f"tag$k%05d"))
      .toDF("k", "grp", "tag")
    add.write.format("graft").option("path", root)
      .option("sortBy", "k").option("statsCols", "k,tag")
      .mode("append").save()
    assert(Snapshots.latestVersion(root) == 2)
    // exact content
    assert(load(root).count() == 1500L)
    assert(load(root).agg(sum("k")).head().getLong(0) ==
      (0L until 1500L).sum)
    // every DSv2-written entry carries full stats — rows, bytes, fp,
    // numeric AND string zones — identical in KIND to the Scala path's
    val m = Snapshots.manifest(root, 2)
    val newEntries = m.entries.filterNot(_.name == "part-00000.parquet")
    assert(newEntries.nonEmpty)
    newEntries.foreach { e =>
      assert(e.rows.nonEmpty && e.bytes.nonEmpty && e.fp.nonEmpty)
      assert(e.zones.contains("k") && e.szones.contains("tag"))
    }
    assert(newEntries.flatMap(_.rows).sum == 500L)
    // zone exactness: the union of new zones is exactly [1000, 1499]
    assert(newEntries.map(_.zones("k")._1).min == 1000L)
    assert(newEntries.map(_.zones("k")._2).max == 1499L)
    // the stamped stats equal what a fresh footer read computes —
    // write-surface-independent manifests
    val e0 = newEntries.head
    val (rows, fp, zones, szones, _) = Bucketing.fileStatsEntry(spark,
      s"$root/files/${e0.name}", Seq("k", "tag"))
    assert(e0.rows.contains(rows) && e0.fp.contains(fp))
    assert(e0.zones == zones && e0.szones == szones)
    // and planning a pruned read over the new files opens ZERO footers
    Bucketing.footerReads.get().set(0L)
    val audit = s"w-${java.util.UUID.randomUUID()}"
    assert(load(root, "auditId" -> audit)
      .where(col("k") >= 1200L && col("k") < 1210L).count() == 10L)
    assert(Bucketing.footerReads.get().get() == 0L)
    val planned = GraftScanAudit.planned(audit).toSet
    assert(!planned.contains("part-00000.parquet")) // zones pruned seed
    GraftScanAudit.clear(audit)
  }

  test("sorted multi-file write: targetFileCount makes N files with " +
      "DISJOINT tight zones; a pushed point range plans one file") {
    val root = freshTable()
    val add = (10000L until 14000L).reverse.map(k => (k, k % 7, s"t$k"))
      .toDF("k", "grp", "tag")
    add.write.format("graft").option("path", root)
      .option("sortBy", "k").option("targetFileCount", "4")
      .mode("append").save()
    val m = Snapshots.manifest(root, 2)
    val newE = m.entries.filterNot(_.name == "part-00000.parquet")
    assert(newE.size == 4)
    // range-partitioned + sorted → zones are disjoint and cover exactly
    val zs = newE.map(_.zones("k")).sortBy(_._1)
    assert(zs.head._1 == 10000L && zs.last._2 == 13999L)
    zs.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo)
      case _ => ()
    }
    val audit = s"w-${java.util.UUID.randomUUID()}"
    assert(load(root, "auditId" -> audit)
      .where(col("k") === 13500L).count() == 1L)
    assert(GraftScanAudit.planned(audit).size == 1)
    GraftScanAudit.clear(audit)
  }

  test("overwrite truncates: new version holds ONLY the new files; " +
      "history still serves the old image; dv/maps dropped") {
    val root = freshTable()
    Snapshots.deletePositions(spark, root, "k", 0L, 10L) // v2 + sidecar
    assert(load(root).count() == 990L)
    Seq((5L, 1, "x")).toDF("k", "grp", "tag")
      .write.format("graft").option("path", root)
      .option("statsCols", "k").mode("overwrite").save()
    assert(Snapshots.latestVersion(root) == 3)
    assert(load(root).count() == 1L)
    assert(load(root).head().getLong(0) == 5L) // dv does NOT re-apply
    assert(load(root, "versionAsOf" -> "2").count() == 990L)
    assert(load(root, "versionAsOf" -> "1").count() == 1000L)
    val m = Snapshots.manifest(root, 3)
    assert(m.dvNames.isEmpty && !m.hasMappings)
  }

  test("empty batch append is a version no-op; writes to a pinned " +
      "time-travel read are refused") {
    val root = freshTable()
    spark.emptyDataset[(Long, Int, String)].toDF("k", "grp", "tag")
      .write.format("graft").option("path", root).mode("append").save()
    assert(Snapshots.latestVersion(root) == 1)
    val e = intercept[Exception] {
      Seq((1L, 1, "a")).toDF("k", "grp", "tag")
        .write.format("graft").option("path", root)
        .option("versionAsOf", "1").mode("append").save()
    }
    assert(e.getMessage.contains("time-travel") ||
      Option(e.getCause).exists(_.getMessage.contains("time-travel")))
  }

  test("concurrent batch writers: rival commits RETRY metadata-only " +
      "and both land (no lost update, distinct versions)") {
    val root = freshTable()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fs = (0 until 4).map { i =>
      scala.concurrent.Future {
        Seq((100000L + i, i, s"w$i")).toDF("k", "grp", "tag")
          .write.format("graft").option("path", root)
          .mode("append").save()
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(fs),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(Snapshots.latestVersion(root) == 5)
    assert(load(root).count() == 1004L)
    assert(load(root).where(col("k") >= 100000L).count() == 4L)
  }

  test("all primitive types round-trip bit-exactly through write+read") {
    val d = java.nio.file.Files.createTempDirectory("graft_wt").toString
    val src = Seq(
      (1L, 7, 3.5, 2.25f, true, "héllo", java.sql.Timestamp.valueOf(
        "2024-03-01 10:30:00.123456"), java.sql.Date.valueOf("2024-03-01"),
        Array[Byte](1, 2, 3), 12.toShort, 4.toByte),
      (2L, -7, -0.5, -1.5f, false, "", java.sql.Timestamp.valueOf(
        "1969-12-31 23:59:59.999999"), java.sql.Date.valueOf("1969-12-31"),
        Array.empty[Byte], Short.MinValue, Byte.MaxValue))
      .toDF("l", "i", "d", "f", "b", "s", "ts", "dt", "bin", "sh", "by")
    // seed v1 through init (the table needs to exist), then DSv2-append
    // the SAME frame and compare the halves
    src.coalesce(1).write.parquet(s"$d/__seed")
    val one = graft.sources.Compaction.dataFiles(s"$d/__seed") match {
      case Seq(f) => f
    }
    new java.io.File(s"$d/src").mkdirs()
    java.nio.file.Files.move(one.toPath,
      new java.io.File(s"$d/src", "part-00000.parquet").toPath)
    val root = s"$d/t"
    Snapshots.init(spark, root, s"$d/src", statsCols = Seq("l", "s"))
    src.write.format("graft").option("path", root)
      .option("statsCols", "l,s").mode("append").save()
    val all = load(root)
    assert(all.count() == 4L)
    // the two images agree column-for-column (each row exactly twice)
    val dup = all.groupBy(all.columns.map(col).toIndexedSeq: _*).count()
    assert(dup.count() == 2L)
    assert(dup.where(col("count") =!= 2L).count() == 0L)
    // null handling: a frame of nulls round-trips as nulls
    val nulls = Seq((3L, null.asInstanceOf[java.lang.Integer]))
      .toDF("l", "i")
      .select(col("l"), col("i").cast("int"), lit(null).cast("double")
        .as("d"), lit(null).cast("float").as("f"),
        lit(null).cast("boolean").as("b"), lit(null).cast("string")
        .as("s"), lit(null).cast("timestamp").as("ts"),
        lit(null).cast("date").as("dt"), lit(null).cast("binary")
        .as("bin"), lit(null).cast("short").as("sh"),
        lit(null).cast("byte").as("by"))
    nulls.write.format("graft").option("path", root)
      .mode("append").save()
    val r = load(root).where(col("l") === 3L).head()
    (1 until r.length).foreach(i => assert(r.isNullAt(i)))
  }

  test("crash orphans: a written-but-never-committed store file is " +
      "invisible to every reader and reclaimed by vacuum") {
    val root = freshTable()
    // simulate a task that wrote its file and died before the driver
    // commit (no abort ran): the file sits in files/ unreferenced
    Seq((7777L, 1L, "orphan")).toDF("k", "grp", "tag").coalesce(1)
      .write.parquet(s"$root/__orphan")
    val f = graft.sources.Compaction.dataFiles(s"$root/__orphan") match {
      case Seq(x) => x
    }
    java.nio.file.Files.move(f.toPath,
      new java.io.File(s"$root/files", "w_dead_p0_a99.parquet").toPath)
    org.apache.spark.network.util.JavaUtils
      .deleteRecursively(new java.io.File(s"$root/__orphan"))
    // invisible: reads are manifest-driven
    assert(load(root).count() == 1000L)
    assert(Snapshots.read(spark, root, 1).count() == 1000L)
    // reclaimed: vacuum deletes unreferenced store files past the grace
    Snapshots.vacuum(root, 1, graceMs = 0L)
    assert(!LakeFs.exists(s"$root/files/w_dead_p0_a99.parquet"))
    assert(load(root).count() == 1000L)
  }

  test("streaming sink: epochs commit exactly-once — a REPLAYED epoch " +
      "skips and deletes its orphan files (restart semantics)") {
    val root = freshTable()
    val schema = load(root).schema
    val w = new GraftStreamingWrite(root, schema, Seq("k"), "queryA")
    // synthesize an epoch's worth of committed task output: one real
    // parquet file in the store plus its entry (what DataWriter.commit
    // returns)
    def taskOutput(tag: String): GraftCommitMessage = {
      val name = s"w_test_${tag}.parquet"
      Seq((9000L, 1L, tag)).toDF("k", "grp", "tag").coalesce(1)
        .write.parquet(s"$root/__tmp_$tag")
      val f = graft.sources.Compaction.dataFiles(s"$root/__tmp_$tag") match {
        case Seq(x) => x
      }
      java.nio.file.Files.move(f.toPath,
        new java.io.File(s"$root/files", name).toPath)
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(s"$root/__tmp_$tag"))
      val (rows, fp, zones, szones, _) = Bucketing.fileStatsEntry(spark,
        s"$root/files/$name", Seq("k"))
      GraftCommitMessage(Seq((Snapshots.FileEntry(name, Some(rows),
        Some(LakeFs.fileLength(s"$root/files/$name")), Some(fp), zones,
        szones), s"$root/files/$name")))
    }
    val m0 = taskOutput("e0")
    w.commit(0L, Array(m0))
    assert(Snapshots.latestVersion(root) == 2)
    assert(load(root).count() == 1001L)
    // the replay: a restarted query re-runs epoch 0 — new attempt, new
    // physical file, same epoch id
    val m0b = taskOutput("e0_replay")
    w.commit(0L, Array(m0b))
    assert(Snapshots.latestVersion(root) == 2) // no new version
    assert(load(root).count() == 1001L) // no double data
    assert(!LakeFs.exists(m0b.files.head._2)) // the orphan was reclaimed
    // a NEW epoch commits normally; an EMPTY epoch commits NOTHING —
    // no manifest churn from an idle trigger (its replay re-executes
    // to the same zero rows and skips again), and a later non-empty
    // epoch advances the mark past the gap
    w.commit(1L, Array(taskOutput("e1")))
    val vAfterE1 = Snapshots.latestVersion(root)
    w.commit(2L, Array.empty)
    assert(Snapshots.latestVersion(root) == vAfterE1,
      "an empty epoch must not commit a version")
    val m = Snapshots.manifest(root, Snapshots.latestVersion(root))
    assert(m.txnVersion("queryA").contains(1L))
    assert(load(root).count() == 1002L)
    w.commit(3L, Array(taskOutput("e3")))
    assert(Snapshots.manifest(root, Snapshots.latestVersion(root))
      .txnVersion("queryA").contains(3L),
      "a non-empty epoch advances the mark past the empty gap")
    assert(load(root).count() == 1003L)
    // idempotence is scoped to THE QUERY: a different query's epoch 0
    // on the same table is a FIRST write, never a false replay — the
    // data-loss trap of keying on the epoch alone
    val w2 = new GraftStreamingWrite(root, schema, Seq("k"), "queryB")
    w2.commit(0L, Array(taskOutput("b0")))
    assert(load(root).count() == 1004L)
    assert(Snapshots.manifest(root, Snapshots.latestVersion(root))
      .txnVersion("queryB").contains(0L))
    // and queryA's mark survives queryB's commits
    assert(Snapshots.manifest(root, Snapshots.latestVersion(root))
      .txnVersion("queryA").contains(3L))
  }

  test("overwrite with an EMPTY frame leaves a readable zero-row table " +
      "(schema rides a seed file), not a wedged zero-file version") {
    val root = freshTable()
    spark.emptyDataset[(Long, Long, String)].toDF("k", "grp", "tag")
      .write.format("graft").option("path", root)
      .mode("overwrite").save()
    assert(Snapshots.latestVersion(root) == 2)
    assert(load(root).count() == 0L)
    assert(load(root).columns.toSeq == Seq("k", "grp", "tag"))
    assert(Snapshots.read(spark, root, 2).count() == 0L)
    // and the table accepts writes again
    Seq((1L, 1L, "x")).toDF("k", "grp", "tag")
      .write.format("graft").option("path", root).mode("append").save()
    assert(load(root).count() == 1L)
  }

  test("case-variant column names are refused with a clear error (a " +
      "silent case-mismatched file would read as all-NULL)") {
    val root = freshTable()
    val cp = java.nio.file.Files.createTempDirectory("graft_wcase")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val q = mem.toDF().toDF("K", "grp", "tag")
      .writeStream.format("graft").option("path", root)
      .option("checkpointLocation", cp.toString).start()
    mem.addData((1L, 1L, "x"))
    val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q.processAllAvailable() }
    assert(e.getMessage.contains("case-insensitively") ||
      Option(e.getCause)
        .exists(_.getMessage.contains("case-insensitively")))
  }

  test("writeStream.format(\"graft\") end-to-end: micro-batches land " +
      "exactly-once across a forced batch replay (checkpoint surgery)") {
    val root = freshTable()
    val cp = java.nio.file.Files.createTempDirectory("graft_wcp").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    def start() = mem.toDF().toDF("k", "grp", "tag")
      .writeStream.format("graft")
      .option("path", root).option("checkpointLocation", cp)
      .option("statsCols", "k")
      .start()
    // a type-mismatched streaming schema is REFUSED at write build (the
    // batch path aligns byName; streaming must not poison the table)
    val memBad = MemoryStream[(Long, Int, String)]
    val qBad = memBad.toDF().toDF("k", "grp", "tag")
      .writeStream.format("graft")
      .option("path", root).option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_wcpb").toString)
      .start()
    memBad.addData((1L, 1, "x"))
    val badErr = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { qBad.processAllAvailable() }
    assert(badErr.getMessage.contains("write schema mismatch") ||
      Option(badErr.getCause)
        .exists(_.getMessage.contains("write schema mismatch")))
    val q1 = start()
    mem.addData((2000L, 1L, "s0"))
    q1.processAllAvailable()
    q1.stop()
    assert(load(root).where(col("k") >= 2000L).count() == 1L)
    // crash-after-sink-commit-before-checkpoint: drop the commit marker
    // so the restarted query REPLAYS the last batch into the sink
    val commits = new java.io.File(s"$cp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    commits.last.delete()
    if (crc.exists()) crc.delete()
    val q2 = start()
    q2.processAllAvailable()
    mem.addData((2001L, 2L, "s1"))
    q2.processAllAvailable()
    q2.stop()
    // the replayed batch did not double; the new batch landed
    assert(load(root).where(col("k") === 2000L).count() == 1L)
    assert(load(root).where(col("k") === 2001L).count() == 1L)
    assert(load(root).count() == 1002L)
  }
}
