package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EQUALITY-DELETE sidecars ([[Snapshots.upsertEquality]]) — the
  * streaming-upsert commit whose cost is O(batch) with ZERO target
  * I/O: the batch's key set commits as an `#eq:` sidecar + fresh
  * insert files; reads apply the key set to files ADDED BEFORE the
  * commit (`av=` scoping), so the result is row-for-row the positional
  * MERGE's; optimize folds everything.
  */
class EqualityDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_eq").toString
    val src = s"$d/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 20000L).map(k => (k, k % 7, s"v$k"))
        .toDF("k", "grp", "tag"), "k", 4, src, 64 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    root
  }

  test("read parity with the positional twin; the upsert's own inserts " +
      "survive their key set; zero target bytes read at commit") {
    val rootEq = freshTable()
    val rootPos = freshTable()
    val updates = ((0L until 200L) ++ (9900L until 10100L))
      .map(k => (k, -1L, s"new$k")).toDF("k", "grp", "tag")
      .union(Seq((90000L, 5L, "ins")).toDF("k", "grp", "tag"))

    // EQUALITY commit: measure bytes read by the commit's jobs — the
    // updates frame is a local relation, so ANY input bytes would be
    // target-file reads
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val r = try {
      val r = Snapshots.upsertEquality(spark, rootEq, "k", "k",
        updates, blockSize = 64 * 1024)
      Thread.sleep(3000) // listener bus drains asynchronously
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(r.keys == 401L && r.appended == 401L && r.sidecar.nonEmpty)
    assert(bytesRead.get() == 0L,
      s"an equality commit must read ZERO target bytes, read " +
        s"${bytesRead.get()}")

    // positional twin
    Snapshots.upsertPositions(spark, rootPos, "k", "k", updates,
      blockSize = 64 * 1024)
    def snap(root: String): Seq[String] =
      Snapshots.read(spark, root, Snapshots.latestVersion(root))
        .collect().map(_.toString).sorted.toSeq
    assert(snap(rootEq) == snap(rootPos),
      "equality and positional MERGE must serve identical rows")
    // count sanity: 20000 + 1 insert, keys unique
    assert(snap(rootEq).size == 20001)

    // the DSv2 path agrees — columnar AND row reader, with and without
    // the key column in the projection
    val vec0 = graft.sources.v2.GraftVectorizedAudit.batches.get()
    val dsv2 = spark.read.format("graft").option("path", rootEq).load()
    val got = dsv2.agg(count(lit(1)), sum(col("grp"))).collect().head
    assert(graft.sources.v2.GraftVectorizedAudit.batches.get() > vec0,
      "eq-table scans stay columnar")
    val want = Snapshots.read(spark, rootEq,
      Snapshots.latestVersion(rootEq))
      .agg(count(lit(1)), sum(col("grp"))).collect().head
    assert(got.getLong(0) == want.getLong(0) &&
      got.getLong(1) == want.getLong(1))
    // projection WITHOUT the key column (internal key read + drop)
    val tags = dsv2.select(col("tag"))
      .where(col("tag").isin("new5", "v5", "ins")).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(tags == Seq("ins", "new5"), s"got $tags")
    // row path agrees
    val rowR = spark.read.format("graft").option("path", rootEq)
      .option("vectorize", "false").load()
      .agg(count(lit(1)), sum(col("grp"))).collect().head
    assert(rowR.getLong(0) == got.getLong(0) &&
      rowR.getLong(1) == got.getLong(1))

    // time travel: v1 still serves the pre-merge state
    assert(Snapshots.read(spark, rootEq, 1).count() == 20000L)

    // optimize folds: no #eq lines survive, values unchanged
    val vOpt = Snapshots.optimize(spark, rootEq, "k", 2,
      blockSize = 64 * 1024)
    assert(Snapshots.manifest(rootEq, vOpt).eqDeletes.isEmpty)
    assert(snap(rootEq) == snap(rootPos))
  }

  test("a second equality batch re-kills the first batch's rows but " +
      "not its own inserts; evolution verbs refuse the live key column") {
    val root = freshTable()
    val b1 = (0L until 100L).map(k => (k, -1L, "b1")).toDF("k", "grp", "tag")
    Snapshots.upsertEquality(spark, root, "k", "k", b1,
      blockSize = 64 * 1024)
    // batch 2 overlaps batch 1's keys: b1's rows (av = eq1 version)
    // ARE in scope of eq2 (added before it) — post-image is b2's
    val b2 = (50L until 150L).map(k => (k, -2L, "b2")).toDF("k", "grp", "tag")
    Snapshots.upsertEquality(spark, root, "k", "k", b2,
      blockSize = 64 * 1024)
    val rows = Snapshots.read(spark, root,
      Snapshots.latestVersion(root))
      .where(col("k") < 200).select(col("k"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val expect = ((0L until 50L).map(k => (k, "b1")) ++
      (50L until 150L).map(k => (k, "b2")) ++
      (150L until 200L).map(k => (k, s"v$k"))).sorted.toSeq
    assert(rows == expect)
    // the key column is frozen while sidecars live
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(root, "k", "key")
    }
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(root, "k", "double")
    }
    // change-feed streaming refuses live-eq versions loudly
    val ex = intercept[Exception] {
      spark.read.format("graft").option("path", root)
        .option("changeFeed", "true").load()
      val q = spark.readStream.format("graft").option("path", root)
        .option("changeFeed", "true").load()
        .writeStream.format("memory").queryName("eq_refuse_" +
          java.util.UUID.randomUUID().toString.take(6))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(60000) finally q.stop()
    }
    assert(ex.getMessage != null)
    // net change feed between pre- and post-eq versions reports the
    // replaced rows exactly once
    val (added, removed) = Snapshots.netChanges(spark, root, 1, 2)
    assert(added.count() == 100L)
    assert(removed.where(col("k") < 100).count() == 100L)
  }

  test("on a BUCKETED table the upsert's insert files are bucket-" +
      "stamped and pure — CDC ingest composes with SPJ instead of " +
      "degrading the fact join back to a shuffle") {
    val root = freshTable()
    Snapshots.optimizeBucketed(spark, root, "k", 4)
    val updates = (0L until 100L).map(k => (k, -1L, s"new$k"))
      .toDF("k", "grp", "tag")
      .union(Seq((90001L, 5L, "ins")).toDF("k", "grp", "tag"))
    val r = Snapshots.upsertEquality(spark, root, "k", "k", updates,
      blockSize = 64 * 1024)
    val m = Snapshots.manifest(root, r.version)
    assert(m.bucketSpec == Some(("k", 4)))
    assert(m.entries.forall(_.bucket.isDefined),
      "equality-upsert insert files must carry bucket stamps")
    assert(m.eqDeletes.nonEmpty)
    // per-file purity: every insert file holds exactly its bucket
    val inserted = m.entries.filter(_.name.startsWith("equp_"))
    assert(inserted.nonEmpty)
    inserted.foreach { e =>
      val ks = spark.read.parquet(s"$root/files/${e.name}")
        .select(col("k")).collect().map(_.getLong(0))
      assert(ks.nonEmpty && ks.forall(k =>
        graft.sources.v2.GraftBucket.id(4, k) == e.bucket.get),
        s"${e.name} leaks keys outside bucket ${e.bucket.get}")
      assert(e.addedV.contains(r.version),
        "the av= scoping stamp must survive the bucketed write path")
    }
    // read parity: updated keys serve the post-image, the rest the
    // original rows, the fresh insert appears once
    val got = Snapshots.read(spark, root, r.version)
      .select(col("k"), col("tag")).collect()
      .map(x => (x.getLong(0), x.getString(1))).toMap
    assert(got.size == 20001)
    (0L until 100L).foreach(k => assert(got(k) == s"new$k"))
    assert(got(90001L) == "ins")
    assert(got(150L) == "v150" && got(19999L) == "v19999")
  }
}
