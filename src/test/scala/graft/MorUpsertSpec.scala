package graft

import graft.sources.{Compaction, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.sources.Snapshots.upsertPositions]] — merge-on-read MERGE
  * (the Iceberg v2 upsert shape): matched target rows retract via one
  * position-delete sidecar, update rows append as fresh files, ZERO
  * existing files rewritten, and the read equals the copy-on-write
  * [[graft.sources.Snapshots.upsert]] row-for-row.
  */
class MorUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_moru").toString
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

  private val updates = ((100 until 200).map(k => (k.toLong, 42)) ++
    (20000 until 20010).map(k => (k.toLong, 9)))

  test("upsertPositions == copy-on-write upsert row-for-row, with zero " +
      "files rewritten") {
    val src = freshTable()
    val rootMor = src + "_mor"
    val rootCow = src + "_cow"
    Snapshots.init(spark, rootMor, src, statsCols = Seq("k"))
    Snapshots.init(spark, rootCow, src, statsCols = Seq("k"))
    val batch = updates.toDF("k", "grp")
    val r = Snapshots.upsertPositions(spark, rootMor, "k", "k", batch)
    Snapshots.upsert(spark, rootCow, "k", "k", batch)
    // zero rewrites: v1's files all survive verbatim in v2
    assert(Snapshots.resolve(rootMor, 1).toSet
      .subsetOf(Snapshots.resolve(rootMor, 2).toSet))
    assert(r.markedPositions == 100L && r.appended == 110L &&
      r.sidecar.nonEmpty)
    val mor = Snapshots.read(spark, rootMor, 2)
    val cow = Snapshots.read(spark, rootCow, 2)
    assert(mor.count() == 10010L)
    assert(mor.exceptAll(cow).isEmpty && cow.exceptAll(mor).isEmpty,
      "MoR MERGE must equal the COW MERGE as a multiset")
    assert(mor.where(col("k") >= 100 && col("k") < 200)
      .where(col("grp") =!= 42).isEmpty)
  }

  test("MERGE over the LIVE table: a key whose stored row is already " +
      "MoR-deleted inserts exactly once, never resurrects") {
    val src = freshTable()
    val root = src + "_live"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    Snapshots.deletePositions(spark, root, "k", 150L, 160L)
    val r = Snapshots.upsertPositions(spark, root, "k", "k",
      Seq((155L, 77)).toDF("k", "grp"))
    // the stored 155 is dead — nothing new to mark, pure insert
    assert(r.markedPositions == 0L && r.sidecar.isEmpty)
    val v = Snapshots.read(spark, root, 3)
    assert(v.count() == 10000L - 10L + 1L)
    assert(v.where(col("k") === 155L).count() == 1L)
    assert(v.where(col("k") === 155L).head().getInt(1) == 77)
  }

  test("optimize folds the MERGE sidecar: values identical, no #dv " +
      "lines survive") {
    val src = freshTable()
    val root = src + "_fold"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    Snapshots.upsertPositions(spark, root, "k", "k",
      updates.toDF("k", "grp"))
    val pre = Snapshots.read(spark, root, 2)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head()
    val v3 = Snapshots.optimize(spark, root, "k", 2)
    assert(Snapshots.deleteSidecars(root, v3).isEmpty)
    assert(Snapshots.read(spark, root, v3)
      .agg(count(lit(1)), sum(col("k")), sum(col("grp"))).head() == pre)
  }

  test("8 writers racing from one instant all land under OCC retry: " +
      "dense versions, every row present exactly once") {
    val src = freshTable()
    val root = src + "_occ8"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        gate.await()
        try Snapshots.commitWithRetry(maxAttempts = 24) {
          Snapshots.append(spark, root,
            Seq((40000L + i, i)).toDF("k", "grp"), "k")
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"every writer must land eventually: $errs")
    assert(Snapshots.latestVersion(root) == 9) // dense: 8 commits, no gaps
    val v = Snapshots.read(spark, root, 9)
    assert(v.count() == 10008L)
    assert(v.where(col("k") >= 40000L && col("k") < 40008L)
      .select(col("k")).distinct().count() == 8L)
  }

  test("concurrent upsertPositions vs append linearize under OCC " +
      "retry: both land, result = sequential application") {
    val src = freshTable()
    val root = src + "_occ"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = new Thread(() => {
      gate.await()
      try Snapshots.commitWithRetry() {
        Snapshots.upsertPositions(spark, root, "k", "k",
          Seq((500L, 42)).toDF("k", "grp"))
      } catch { case e: Throwable => errs.add(e) }
    })
    val t2 = new Thread(() => {
      gate.await()
      try Snapshots.commitWithRetry() {
        Snapshots.append(spark, root,
          Seq((30000L, 3)).toDF("k", "grp"), "k")
      } catch { case e: Throwable => errs.add(e) }
    })
    t1.start(); t2.start(); gate.countDown()
    t1.join(180000); t2.join(180000)
    assert(errs.isEmpty, s"OCC retry must absorb the race: $errs")
    assert(Snapshots.latestVersion(root) == 3)
    val v = Snapshots.read(spark, root, 3)
    assert(v.count() == 10001L)
    assert(v.where(col("k") === 500L).count() == 1L)
    assert(v.where(col("k") === 500L).head().getInt(1) == 42)
    assert(v.where(col("k") === 30000L).count() == 1L)
  }
}
