package graft

import graft.sources.{Compaction, Snapshots}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native streaming source ([[graft.sources.v2
  * .GraftMicroBatchStream]]): manifest versions as checkpointed offsets,
  * file-granular tagged deltas per version, admission control, and
  * exactly-once across a stop/recommit/restart cycle.
  */
class GraftStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 range files of 10k rows (k 0..9999), then a lifecycle: v2 MoR
    * delete [100,200), v3 append 50 rows, v4 COW delete [2500,2600),
    * v5 optimize to 2 files.
    */
  private def lifecycleTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_str").toString
    val out = s"$d/src"
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
    val root = s"$d/t"
    Snapshots.init(spark, root, out, statsCols = Seq("k"))
    Snapshots.deletePositions(spark, root, "k", 100L, 200L)
    Snapshots.append(spark, root,
      (20000 until 20050).map(k => (k.toLong, 1)).toDF("k", "grp"), "k")
    Snapshots.deleteRange(spark, root, "k", 2500L, 2600L)
    Snapshots.optimize(spark, root, "k", 2)
    root
  }

  /** Drain the change feed with AvailableNow into a driver buffer;
    * returns (rows as (version, side, k, grp), batch count).
    */
  private def drain(root: String, ckpt: String,
      maxPerBatch: Option[Int] = None,
      maxBytes: Option[Long] = None)
      : (Seq[(Int, String, Long, Int)], Int) = {
    val buf = new scala.collection.mutable.ArrayBuffer[
      (Int, String, Long, Int)]()
    var batches = 0
    val rd0 = spark.readStream.format("graft")
      .option("path", root).option("changeFeed", "true")
    val rd1 = maxPerBatch
      .fold(rd0)(m => rd0.option("maxVersionsPerBatch", m.toString))
    val src = maxBytes
      .fold(rd1)(b => rd1.option("maxBytesPerBatch", b.toString)).load()
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect().map(r => (
          r.getAs[Int]("_graft_version"), r.getAs[String]("_graft_side"),
          r.getAs[Long]("k"), r.getAs[Int]("grp")))
        buf.synchronized { buf ++= rows; batches += 1 }
        ()
      }
      .start()
    q.awaitTermination()
    (buf.toSeq, batches)
  }

  test("the full drain folds to exactly the latest table: adds minus " +
      "removes reproduce read() row-for-row through MoR, COW, append, " +
      "and optimize") {
    val root = lifecycleTable()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_str_ck").toString
    val (rows, _) = drain(root, ckpt)
    assert(rows.map(_._1).distinct.sorted == Seq(1, 2, 3, 4, 5))
    val adds = rows.filter(_._2 == "add").map(r => (r._3, r._4))
      .toDF("k", "grp")
    val removes = rows.filter(_._2 == "remove").map(r => (r._3, r._4))
      .toDF("k", "grp")
    val folded = adds.exceptAll(removes)
    val expect = Snapshots.read(spark, root, 5).select(col("k"), col("grp"))
    assert(folded.exceptAll(expect).isEmpty &&
      expect.exceptAll(folded).isEmpty,
      "fold diverged from the latest snapshot")
    // the MoR delete's delta is position-granular: version 2 emits
    // exactly the 100 freshly-marked rows as removes and NO adds
    val v2 = rows.filter(_._1 == 2)
    assert(v2.forall(_._2 == "remove") && v2.size == 100)
    assert(v2.map(_._3).sorted == (100L until 200L))
    // the optimize's file-granular delta cancels by multiset
    val v5 = rows.filter(_._1 == 5)
    val v5a = v5.filter(_._2 == "add").map(r => (r._3, r._4)).sorted
    val v5r = v5.filter(_._2 == "remove").map(r => (r._3, r._4)).sorted
    assert(v5a == v5r, "optimize delta must cancel")
  }

  test("admission control bounds the batch: maxVersionsPerBatch=2 " +
      "drains 5 versions in 3 batches") {
    val root = lifecycleTable()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_str_ck2").toString
    val (rows, batches) = drain(root, ckpt, maxPerBatch = Some(2))
    assert(batches == 3, s"expected 3 bounded batches, got $batches")
    assert(rows.map(_._1).distinct.sorted == Seq(1, 2, 3, 4, 5))
  }

  test("byte-based admission: a fat version is admitted alone while " +
      "thin versions batch together") {
    // v2 is a FAT append (20k rows), v3-v5 are thin (20 rows each)
    val d = java.nio.file.Files.createTempDirectory("graft_strb").toString
    val src = s"$d/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 100L).map(k => (k, 0)).toDF("k", "grp"), "k", 1, src,
      16 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    Snapshots.append(spark, root,
      (100000L until 120000L).map(k => (k, 1)).toDF("k", "grp"), "k") // fat
    (0 until 3).foreach { i =>
      Snapshots.append(spark, root,
        (200000L + i * 100 until 200000L + i * 100 + 20)
          .map(k => (k, 2)).toDF("k", "grp"), "k") // thin v3..v5
    }
    val fat = Snapshots.versionDeltaBytes(root, 2).get
    val thin = (3 to 5).map(v => Snapshots.versionDeltaBytes(root, v).get)
    assert(thin.forall(_ < fat / 4), s"fixture: fat=$fat thin=$thin")
    // budget: all three thin versions fit together, the fat one does not
    val budget = thin.sum + 1
    assert(budget < fat)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_str_ckb").toString
    val (rows, batches) = drain(root, ckpt, maxBytes = Some(budget))
    // v1 (seed, admitted alone: its bytes >= budget? no — v1 is tiny,
    // so v1 may batch with nothing ahead of it... batches: v1 alone or
    // not, v2 MUST be alone, v3-v5 together => between 3 and 4 batches
    assert(rows.map(_._1).distinct.sorted == Seq(1, 2, 3, 4, 5))
    assert(batches >= 3 && batches <= 4,
      s"fat version alone + thin versions batched, got $batches batches")
    // the decisive law: no batch contains the fat version AND another
    // version (admitted alone), and the three thin versions share one
    val perBatchVersions = {
      // recompute from admission directly: walk offsets like the engine
      val s = new graft.sources.v2.GraftMicroBatchStream(root,
        org.apache.spark.sql.types.StructType(Seq()), 0, Int.MaxValue,
        budget, None)
      var cur = 0
      val out = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
      var guard = 0
      while (cur < 5 && guard < 10) {
        val next = s.latestOffset(new graft.sources.v2.GraftOffset(cur),
          org.apache.spark.sql.connector.read.streaming.ReadLimit
            .allAvailable()).asInstanceOf[graft.sources.v2.GraftOffset]
          .version
        out += ((cur + 1) to next)
        cur = next
        guard += 1
      }
      out.toSeq
    }
    assert(perBatchVersions.exists(_ == Seq(3, 4, 5)),
      s"thin versions must batch together: $perBatchVersions")
    assert(perBatchVersions.contains(Seq(2)),
      s"the fat version must be admitted alone: $perBatchVersions")
  }

  test("checkpointed offsets are exactly-once across restart: a second " +
      "run re-delivers nothing, and new commits stream from the cursor") {
    val root = lifecycleTable()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_str_ck3").toString
    val (rows1, _) = drain(root, ckpt)
    assert(rows1.map(_._1).distinct.sorted == Seq(1, 2, 3, 4, 5))
    // caught up: the same checkpoint delivers zero rows
    val (rows2, _) = drain(root, ckpt)
    assert(rows2.isEmpty, s"re-delivery after restart: ${rows2.take(5)}")
    // two more commits land while the stream is down
    Snapshots.append(spark, root,
      Seq((30000L, 2)).toDF("k", "grp"), "k") // v6
    Snapshots.deletePositions(spark, root, "k", 30000L, 30001L) // v7
    val (rows3, _) = drain(root, ckpt)
    assert(rows3.map(_._1).distinct.sorted == Seq(6, 7),
      "restart must resume at the checkpointed cursor")
    assert(rows3.filter(_._1 == 6).map(_._2) == Seq("add"))
    assert(rows3.filter(_._1 == 7).map(r => (r._2, r._3)) ==
      Seq(("remove", 30000L)))
    // the total fold across all three runs still equals the table
    val all = rows1 ++ rows3
    val folded = all.filter(_._2 == "add").map(r => (r._3, r._4))
      .toDF("k", "grp")
      .exceptAll(all.filter(_._2 == "remove").map(r => (r._3, r._4))
        .toDF("k", "grp"))
    val expect = Snapshots.read(spark, root, 7).select(col("k"), col("grp"))
    assert(folded.exceptAll(expect).isEmpty &&
      expect.exceptAll(folded).isEmpty)
  }
}
