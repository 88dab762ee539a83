package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming smoke: drive the events parquet through the
  * windowed-agg and sessionization queries with the memory sink, and check
  * the streaming totals equal the batch equivalents.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def eventsBatch =
    Queries.loadEvents(spark, s"${SparkTestSession.sfDir}/events.parquet")

  test("windowed totals: streaming result == batch rollup") {
    val batch = eventsBatch
    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(s"${SparkTestSession.sfDir}/events.parquet".stripSuffix("/events.parquet"))
    // restrict the directory glob to the events file via load of dir is not
    // possible here (one dir, many tables) -> stream from a temp copy
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    batch.write.mode("overwrite").parquet(tmp)
    val streamed = spark.readStream.schema(batch.schema).parquet(tmp)
    val agg = EventStreams.windowedTotals(streamed)
    val q = EventStreams.runToMemory(agg, "win_out",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    q.processAllAvailable(); q.stop()
    val streamTotal = spark.table("win_out").agg(sum("n_events")).head().getLong(0)
    assert(streamTotal == batch.count())
    val batchHours = batch.groupBy(date_trunc("hour", col("ts")), col("event_type"))
      .count().count()
    assert(spark.table("win_out").count() == batchHours)
  }

  test("streaming dedup: duplicated batch collapses to distinct events") {
    val batch = eventsBatch
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream3").toString
    batch.unionAll(batch).write.mode("overwrite").parquet(tmp) // plant dups
    val streamed = spark.readStream.schema(batch.schema).parquet(tmp)
    val deduped = EventStreams.dedupStream(streamed, Seq("event_id"))
    val q = EventStreams.runToMemory(deduped, "dedup_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == batch.count())
  }

  test("sessionize: per-user state via flatMapGroupsWithState") {
    val batch = eventsBatch
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    batch.write.mode("overwrite").parquet(tmp)
    val streamed = spark.readStream.schema(batch.schema).parquet(tmp)
    val sess = EventStreams.sessionize(spark, streamed)
    val q = EventStreams.runToMemory(sess, "sess_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_out")
    // Append contract: every emitted session is final (closed), and no
    // event is counted twice — emitted events never exceed the input.
    assert(out.where(!col("closed")).count() == 0)
    val totalEvents = out.agg(sum("nEvents")).head().getLong(0)
    assert(totalEvents > 0 && totalEvents <= batch.count())
    val users = batch.select("user_id").distinct().count()
    assert(out.select("user_id").distinct().count() <= users)
  }

  test("sessionize splits on inactivity gaps and closes prior sessions") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      EventStreams.Event(1L, at(0), 7L, "click", 1.0, "{}"),
      EventStreams.Event(2L, at(10), 7L, "click", 2.0, "{}"),
      EventStreams.Event(3L, at(120), 7L, "view", 3.0, "{}"), // > 30 min gap
      EventStreams.Event(4L, at(125), 7L, "view", 4.0, "{}")
    ).toDF()
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream4").toString
    events.coalesce(1).write.mode("overwrite").parquet(tmp)
    val streamed = spark.readStream.schema(events.schema).parquet(tmp)
    val sess = EventStreams.sessionize(spark, streamed, gapMinutes = 30)
    val q = EventStreams.runToMemory(sess, "sess_gap_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_gap_out")
      .orderBy(col("sessionStart")).collect()
    // the first session is closed by the gap; the trailing open session
    // (120..125) is NOT emitted — the watermark (125) never passes
    // last + gap (155), so the stream can't prove it over
    assert(rows.length == 1)
    assert(rows(0).getAs[Boolean]("closed") && rows(0).getAs[Long]("nEvents") == 2L)
    assert(rows(0).getAs[Double]("totalValue") == 3.0)
    assert(rows(0).getAs[java.sql.Timestamp]("sessionStart") == at(0))
  }

  test("stream-static enrich: broadcast left join against a dimension") {
    import spark.implicits._
    val batch = eventsBatch
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream6").toString
    batch.write.mode("overwrite").parquet(tmp)
    val streamed = spark.readStream.schema(batch.schema).parquet(tmp)
    val dim = batch.select("user_id").distinct().limit(10)
      .withColumn("tier", lit("gold"))
    val q = EventStreams.runToMemory(
      EventStreams.enrich(streamed, dim, Seq("user_id")), "enrich_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val out = spark.table("enrich_out")
    assert(out.count() == batch.count()) // left join keeps every event
    val gold = dim.select("user_id").as[Long].collect().toSet
    val tagged = out.where(col("tier") === "gold")
      .select("user_id").distinct().as[Long].collect().toSet
    assert(tagged == gold)
  }

  test("streaming sessionize == batch w3 once every real session is closed") {
    // One sentinel event per user, 10 days after the last real event: its
    // arrival closes each user's final open session through the normal gap
    // logic (the sentinel's own session stays open and unemitted), so the
    // Append stream's closed sessions are EXACTLY the batch sessionization —
    // the semantic tie between EventStreams.sessionize and Queries.w3.
    val batch = eventsBatch
    val colsInOrder = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)
    val sentinels = batch.select("user_id").distinct()
      .withColumn("event_id", col("user_id") + 1000000000L)
      .withColumn("ts", lit(sentinelTs))
      .withColumn("event_type", lit("sentinel"))
      .withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
      .select(colsInOrder.map(col): _*)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_w3").toString
    batch.select(colsInOrder.map(col): _*).unionByName(sentinels)
      .write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val streamed = spark.readStream.schema(schema).parquet(tmp)
    val sess = EventStreams.sessionize(spark, streamed, gapMinutes = 30)
    val q = EventStreams.runToMemory(sess, "sess_w3_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val streamAgg = spark.table("sess_w3_out")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("nEvents")).as("n_events"))
    val w3 = Queries.w3Sessionize(spark, SparkTestSession.sfDir)
    assert(streamAgg.exceptAll(w3).count() == 0 && w3.exceptAll(streamAgg).count() == 0,
      "streaming closed sessions must reproduce the batch w3 sessionization")
  }

  test("streaming windowed totals == batch e1_hourly_totals once the watermark closes") {
    // One sentinel event 10 days past the last real event pushes the
    // watermark beyond every real window's end, so Append emits EXACTLY the
    // real hourly windows (the sentinel's own window stays open and
    // unemitted). With exactScale the totals are scaled-long exact —
    // associative, so micro-batch order can't perturb them — making the
    // streaming output bit-identical to the oracle-green batch e1 rollup:
    // the windowed-agg twin of the sessionize≡w3 tie below.
    val batch = eventsBatch
    val colsInOrder = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)
    import spark.implicits._
    val sentinel = Seq(EventStreams.Event(999999999L, sentinelTs, 1L,
      "sentinel", 0.0, "{}")).toDF().select(colsInOrder.map(col): _*)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_e1").toString
    batch.select(colsInOrder.map(col): _*).unionByName(sentinel)
      .write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val streamed = spark.readStream.schema(schema).parquet(tmp)
    val agg = EventStreams.windowedTotals(streamed, "1 hour", "2 hours",
      exactScale = Some(1e6))
    val q = EventStreams.runToMemory(agg, "win_e1_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val stream = spark.table("win_e1_out")
      .select(col("window_start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))
    val e1 = Queries.e1HourlyTotals(spark, SparkTestSession.sfDir)
    assert(stream.where(col("event_type") === "sentinel").count() == 0,
      "the sentinel's own window must stay open and unemitted")
    assert(stream.exceptAll(e1).count() == 0 && e1.exceptAll(stream).count() == 0,
      "closed streaming windows must reproduce the batch hourly rollup bit-for-bit")
  }

  test("streaming incremental dedup == batch surviving fingerprint set") {
    import spark.implicits._
    import graft.operators.TextPipeline
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val existing = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
      .unionAll(existing.where(col("doc_id") < 30)
        .withColumn("doc_id", col("doc_id") + lit(3000000L)))
    val index = TextPipeline.fingerprints(existing, "doc_id", "text")
    // stream the batch from a temp dir
    val tmp = java.nio.file.Files.createTempDirectory("graft_nd_stream").toString
    batch.write.mode("overwrite").parquet(tmp)
    val streamed = spark.readStream.schema(batch.schema).parquet(tmp)
    val out = EventStreams.incrementalDedupStream(streamed, "text", index)
    val q = EventStreams.runToMemory(out, "nd_stream_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val streamFps = spark.table("nd_stream_out").select("fp")
      .as[String].collect().toSet
    val batchFps = TextPipeline.incrementalDedup(batch, "doc_id", "text", index)
      .select("fp").as[String].collect().toSet
    assert(streamFps == batchFps)
    assert(streamFps.nonEmpty)
  }

  test("streaming incremental NEAR-dedup == batch nd2 survivors (one micro-batch)") {
    import spark.implicits._
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val existing = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
      .unionAll(existing
        .where(col("doc_id") < 60 &&
          size(split(trim(col("text")), "\\s+")) >= 30)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" "), col("text")).as("text")))
    val index = Dedup.buildLshIndex(existing, "doc_id", "text",
      numHashes = 128, bands = 16, shingleSize = 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft_nd2_stream").toString
    batch.write.mode("overwrite").parquet(tmp)
    val streamed = spark.readStream.schema(batch.schema).parquet(tmp)
    val got = scala.collection.mutable.Set.empty[Long]
    val q = EventStreams.incrementalNearDupStream(
      streamed, "doc_id", "text", index, threshold = 0.9) { survivors =>
        got ++= survivors.select("doc_id").as[Long].collect()
      }
    q.awaitTermination()
    val m = Dedup.incrementalNearDup(batch, "doc_id", "text", index, 0.9)
    val want = batch.join(m.select(col("batch_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    m.unpersist(); index.close()
    assert(got.toSet == want)
    // every planted near-dup resubmission (id >= 3000000) was dropped
    assert(!got.exists(_ >= 3000000L) && want.nonEmpty)
  }

  test("two-batch NEAR-dedup with refresh: batch 2 caught against batch 1's survivor") {
    import spark.implicits._
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    // index knows only doc 1
    val index0 = Dedup.buildLshIndex(Seq((1L, words("a", 40))).toDF("doc_id", "text"),
      "doc_id", "text", numHashes = 128, bands = 16, shingleSize = 3)
    val ref = new EventStreams.LshIndexRef(index0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = EventStreams.incrementalNearDupStreamWithRefresh(
      ms.toDF.toDF("doc_id", "text"), "doc_id", "text", ref, threshold = 0.9) {
        s => perBatch += s.select("doc_id").as[Long].collect().toSet
      }
    // batch 1: a NOVEL doc (not in the index) — must survive and be
    // appended to the index by the refresh loop
    val novel = words("b", 40)
    ms.addData((100L, novel))
    q.processAllAvailable()
    assert(perBatch.last == Set(100L))
    // batch 2: a near-dup of batch 1's survivor (one extra token, trigram
    // jaccard 38/39), a near-dup of the ORIGINAL index doc, and a fresh doc
    ms.addData((200L, novel + " extra"),
      (201L, words("a", 40) + " tail"),
      (300L, words("c", 40)))
    q.processAllAvailable()
    q.stop()
    // 200 is caught ONLY IF the index refreshed with doc 100 — the
    // static-index variant would have let it through; 201 proves the
    // original corpus signatures still probe after the append
    assert(perBatch.last == Set(300L))
    ref.index.close()
  }

  test("durable NEAR-dedup refresh: killed stream restarts from the lineage") {
    import spark.implicits._
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_ndur").toString
    // corpus index (knows doc 1 only) checkpointed as the full snapshot
    val built = Dedup.buildLshIndex(Seq((1L, words("a", 40))).toDF("doc_id", "text"),
      "doc_id", "text", numHashes = 128, bands = 16, shingleSize = 3)
    built.save(lineage)
    built.close()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]

    // session 1: admit a novel doc; its delta epoch lands inside
    // foreachBatch; then the query dies and every in-memory handle goes
    val ref1 = new EventStreams.LshIndexRef(Dedup.loadLshIndex(spark, lineage))
    val ms1 = MemoryStream[(Long, String)]
    val q1 = EventStreams.incrementalNearDupStreamWithRefresh(
      ms1.toDF.toDF("doc_id", "text"), "doc_id", "text", ref1,
      threshold = 0.9, checkpointTo = Some(lineage)) {
        s => perBatch += s.select("doc_id").as[Long].collect().toSet
      }
    val novel = words("b", 40)
    ms1.addData((100L, novel))
    q1.processAllAvailable()
    q1.stop()
    ref1.index.close() // the "JVM died" line: nothing in memory survives
    assert(perBatch.last == Set(100L))

    // session 2: a FRESH ref reloaded from the lineage — batch 2's
    // near-dup of doc 100 is caught only if session 1's delta persisted;
    // the near-dup of original doc 1 proves the snapshot still probes
    val ref2 = new EventStreams.LshIndexRef(Dedup.loadLshIndex(spark, lineage))
    val ms2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.incrementalNearDupStreamWithRefresh(
      ms2.toDF.toDF("doc_id", "text"), "doc_id", "text", ref2,
      threshold = 0.9, checkpointTo = Some(lineage)) {
        s => perBatch += s.select("doc_id").as[Long].collect().toSet
      }
    ms2.addData((200L, novel + " extra"),
      (201L, words("a", 40) + " tail"),
      (300L, words("c", 40)))
    q2.processAllAvailable()
    q2.stop()
    ref2.index.close()
    assert(perBatch.last == Set(300L))
  }

  test("durable SEMANTIC refresh: killed stream restarts from the lineage") {
    import spark.implicits._
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def dir(i: Int): Seq[Float] = {
      val a = new Array[Float](8)
      a(i % 8) = 1f
      a((i / 8 + 3) % 8) = 0.3f + 0.02f * i
      a.toSeq
    }
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_semdur").toString
    val built = Dedup.buildSemIndex(
      (0 until 10).map(i => (i.toLong, dir(i))).toDF("id", "vec"),
      "id", "vec", nClusters = 4, iterations = 2)
    built.save(lineage)
    built.close()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]

    val ref1 = new EventStreams.SemIndexRef(Dedup.loadSemIndex(spark, lineage))
    val ms1 = MemoryStream[(Long, Seq[Float])]
    val q1 = EventStreams.incrementalSemDedupStreamWithRefresh(
      ms1.toDF.toDF("id", "vec"), "id", "vec", ref1,
      threshold = 0.99, checkpointTo = Some(lineage)) {
        s => perBatch += s.select("id").as[Long].collect().toSet
      }
    val novel = { val a = new Array[Float](8); a(5) = -1f; a(1) = 0.9f; a.toSeq }
    ms1.addData((100L, novel))
    q1.processAllAvailable()
    q1.stop()
    ref1.index.close()
    assert(perBatch.last == Set(100L))

    // restart: the scaled paraphrase of doc 100 (cosine 1) is caught only
    // through the persisted delta epoch
    val ref2 = new EventStreams.SemIndexRef(Dedup.loadSemIndex(spark, lineage))
    val ms2 = MemoryStream[(Long, Seq[Float])]
    val q2 = EventStreams.incrementalSemDedupStreamWithRefresh(
      ms2.toDF.toDF("id", "vec"), "id", "vec", ref2,
      threshold = 0.99, checkpointTo = Some(lineage)) {
        s => perBatch += s.select("id").as[Long].collect().toSet
      }
    val fresh = { val a = new Array[Float](8); a(6) = -1f; a(0) = -0.7f; a.toSeq }
    ms2.addData((200L, novel.map(_ * 2f)), (300L, fresh))
    q2.processAllAvailable()
    q2.stop()
    ref2.index.close()
    assert(perBatch.last == Set(300L))
  }

  test("streaming auto-compact: a concentrated crawl splits the hot " +
      "cluster and the full snapshot survives restart") {
    import spark.implicits._
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def base(i: Int): Seq[Float] = {
      val a = new Array[Float](8)
      a((i % 4) * 2) = 1f
      a(1) = 0.01f * i
      a.toSeq
    }
    // tight fan around axis 6 in the (6,7) plane: adjacent cos ~0.9998 —
    // below the 0.9999 threshold, so every member admits, but the whole
    // fan lands in one cluster and skews it
    def fan(j: Int): Seq[Float] = {
      val a = new Array[Float](8)
      a(6) = math.cos(j * 0.02).toFloat
      a(7) = math.sin(j * 0.02).toFloat
      a.toSeq
    }
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_semcompact").toString
    val built = Dedup.buildSemIndex(
      (0 until 40).map(i => (i.toLong, base(i))).toDF("id", "vec"),
      "id", "vec", nClusters = 4, iterations = 2)
    built.save(lineage)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = new EventStreams.SemIndexRef(built)
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.incrementalSemDedupStreamWithRefresh(
      ms.toDF.toDF("id", "vec"), "id", "vec", ref,
      threshold = 0.9999, checkpointTo = Some(lineage),
      compactEvery = 1, compactFactor = 1.5) { _ => () }
    ms.addData((0 until 30).map(j => (1000L + j, fan(j))): _*)
    q.processAllAvailable()
    ms.addData((30 until 60).map(j => (1000L + j, fan(j))): _*)
    q.processAllAvailable()
    q.stop()
    assert(ref.index.nClusters > 4) // the hot cluster split mid-stream
    val kLive = ref.index.nClusters
    ref.index.close()
    // restart: the compacted geometry is the lineage's newest full
    // snapshot; a scaled twin of an admitted fan member is caught
    val reloaded = Dedup.loadSemIndex(spark, lineage)
    assert(reloaded.nClusters == kLive)
    val twin = Seq((9000L, fan(25).map(_ * 2f))).toDF("id", "vec")
    val m = Dedup.incrementalSemDedup(twin, "id", "vec", reloaded,
      threshold = 0.9999)
    assert(m.select("batch_id").distinct().count() == 1)
    m.unpersist(blocking = false)
    reloaded.close()
  }

  test("two-batch SEMANTIC dedup with refresh: paraphrase caught across batches") {
    import spark.implicits._
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def dir(i: Int, boost: Float = 1f): Seq[Float] = {
      val a = new Array[Float](8)
      a(i % 8) = boost
      a((i / 8 + 3) % 8) = 0.3f + 0.02f * i
      a.toSeq
    }
    val index0 = Dedup.buildSemIndex(
      (0 until 10).map(i => (i.toLong, dir(i))).toDF("id", "vec"),
      "id", "vec", nClusters = 4, iterations = 2)
    val ref = new EventStreams.SemIndexRef(index0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float])]
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = EventStreams.incrementalSemDedupStreamWithRefresh(
      ms.toDF.toDF("id", "vec"), "id", "vec", ref, threshold = 0.99) {
        s => perBatch += s.select("id").as[Long].collect().toSet
      }
    // batch 1: a novel direction — survives and refreshes the index
    val novel = { val a = new Array[Float](8); a(5) = -1f; a(1) = 0.9f; a.toSeq }
    ms.addData((100L, novel))
    q.processAllAvailable()
    assert(perBatch.last == Set(100L))
    // batch 2: a scaled paraphrase of batch 1's survivor (cosine 1 — only
    // caught if the refresh appended doc 100), a paraphrase of an ORIGINAL
    // index doc, and a fresh direction
    val fresh = { val a = new Array[Float](8); a(6) = -1f; a(0) = -0.7f; a.toSeq }
    ms.addData(
      (200L, novel.map(_ * 2f)),
      (201L, dir(3, boost = 1.0005f)),
      (300L, fresh))
    q.processAllAvailable()
    q.stop()
    assert(perBatch.last == Set(300L))
    ref.index.close()
  }

  test("sessionize across two batches: open session absorbs the later batch, emits once") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream5")
    // two files, forced into two micro-batches via maxFilesPerTrigger=1,
    // ordered by mtime (file-source default: oldest first)
    val f1 = tmp.resolve("b1"); val f2 = tmp.resolve("b2")
    Seq(EventStreams.Event(1L, at(0), 7L, "click", 1.0, "{}"),
        EventStreams.Event(2L, at(10), 7L, "click", 2.0, "{}"))
      .toDF().coalesce(1).write.parquet(f1.toString)
    Seq(EventStreams.Event(3L, at(200), 7L, "view", 3.0, "{}"),
        EventStreams.Event(4L, at(205), 7L, "view", 4.0, "{}"))
      .toDF().coalesce(1).write.parquet(f2.toString)
    val now = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())
    val later = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000)
    java.nio.file.Files.walk(f1).filter(_.toString.endsWith(".parquet"))
      .forEach(p => java.nio.file.Files.setLastModifiedTime(p, now))
    java.nio.file.Files.walk(f2).filter(_.toString.endsWith(".parquet"))
      .forEach(p => java.nio.file.Files.setLastModifiedTime(p, later))
    val schema = Seq.empty[EventStreams.Event].toDF().schema
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*")
    val sess = EventStreams.sessionize(spark, streamed, gapMinutes = 30)
    val q = EventStreams.runToMemory(sess, "sess_2batch_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_2batch_out").collect()
    // session (0..10) held open through batch 1 (no closed=false noise),
    // closed exactly once when batch 2's gap arrives; (200..205) stays open
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows(0).getAs[Boolean]("closed"))
    assert(rows(0).getAs[Long]("nEvents") == 2L)
    assert(rows(0).getAs[Double]("totalValue") == 3.0)
  }

  test("driftMonitorStream: per-batch divergence against a fixed reference") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // reference mix: 50/50 x,y
    val reference = (Seq.fill(50)("x") ++ Seq.fill(50)("y")).toDF("src")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = EventStreams.driftMonitorStream(
      ms.toDF.toDF("src"), "src", reference) { (id, ev) =>
        val d = ev.agg(org.apache.spark.sql.functions.sum("divergence"))
          .collect()(0).getDouble(0)
        perBatch += ((id, d))
      }
    // batch 0 matches the reference mix; batch 1 is all-z (novel category)
    ms.addData(Seq.fill(10)("x") ++ Seq.fill(10)("y"): _*)
    q.processAllAvailable()
    ms.addData(Seq.fill(20)("z"): _*)
    q.processAllAvailable()
    q.stop()
    assert(perBatch.size == 2)
    val (inDist, shifted) = (perBatch(0)._2, perBatch(1)._2)
    assert(inDist == 0.0, s"matching batch scored $inDist")
    // total divergence of disjoint supports = sum over x,y,z of p^2/p = 2
    assert(math.abs(shifted - 2.0) < 1e-12, s"disjoint batch scored $shifted")
  }

  test("funnelStream: cross-batch strict ordering, same-batch cascade, stragglers ignored") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    def e(u: Long, id: Long, ts: String, t: String) =
      (id, java.sql.Timestamp.valueOf(ts), u, t, 0.0, "{}")
    val q = EventStreams.funnelStream(spark,
        ms.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        Seq("signup", "activate", "purchase"))
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    // batch 0: user 1 cascades two steps in order; user 2 sends the
    // second step FIRST (must not count)
    ms.addData(
      e(1L, 1L, "2024-01-01 10:00:00", "signup"),
      e(1L, 2L, "2024-01-01 10:05:00", "activate"),
      e(2L, 3L, "2024-01-01 10:00:00", "activate"))
    q.processAllAvailable()
    // batch 1: user 1 completes; a straggler "activate" OLDER than user
    // 1's signup time arrives for user 2 after their signup -> ignored
    ms.addData(
      e(1L, 4L, "2024-01-01 11:00:00", "purchase"),
      e(2L, 5L, "2024-01-01 12:00:00", "signup"),
      e(2L, 6L, "2024-01-01 11:59:00", "activate"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set(
      (1L, 1L, "signup"), (1L, 2L, "activate"), (1L, 3L, "purchase"),
      (2L, 1L, "signup")))
  }

  test("funnel state hygiene: non-entrants hold no state; timeout/completion evict") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.{Optional => JOpt}
    val steps = Array("signup", "purchase")
    def ev(u: Long, id: Long, ts: String, t: String) =
      EventStreams.Event(id, java.sql.Timestamp.valueOf(ts), u, t, 0.0, "{}")
    val ptt =
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout
    def mk(st: JOpt[EventStreams.FunnelProgress], timedOut: Boolean) =
      TestGroupState.create[EventStreams.FunnelProgress](
        st, ptt, 1000L, JOpt.empty[Long], timedOut)
    def fresh() = mk(JOpt.empty(), timedOut = false)

    // a user who never reaches step 0 must register NO state
    val s1 = fresh()
    val out1 = EventStreams.funnelStep(steps, Some("1 hour"))(
      2L, Iterator(ev(2L, 1L, "2024-01-01 10:00:00", "purchase")), s1).toSeq
    assert(out1.isEmpty && !s1.exists && !s1.isUpdated)

    // an entrant registers state AND arms the eviction clock
    val s2 = fresh()
    val out2 = EventStreams.funnelStep(steps, Some("1 hour"))(
      1L, Iterator(ev(1L, 2L, "2024-01-01 10:00:00", "signup")), s2).toSeq
    assert(out2.map(_.step) == Seq(1L) && s2.exists)
    assert(s2.getTimeoutTimestampMs.isPresent) // setTimeoutDuration armed

    // completion removes state
    val s3 = mk(JOpt.of(EventStreams.FunnelProgress(1,
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime)),
      timedOut = false)
    val out3 = EventStreams.funnelStep(steps, Some("1 hour"))(
      1L, Iterator(ev(1L, 3L, "2024-01-01 11:00:00", "purchase")), s3).toSeq
    assert(out3.map(_.step) == Seq(2L) && s3.isRemoved)

    // timeout invocation evicts the stalled entrant
    val s4 = mk(JOpt.of(EventStreams.FunnelProgress(1, 0L)),
      timedOut = true)
    val out4 = EventStreams.funnelStep(steps, Some("1 hour"))(
      1L, Iterator.empty, s4).toSeq
    assert(out4.isEmpty && s4.isRemoved)
  }

  test("changeFeedStream: per-batch diffs against a ROLLING snapshot") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "x")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Double)]
    val perBatch =
      scala.collection.mutable.ArrayBuffer.empty[Map[Long, (String, String)]]
    val ref = new EventStreams.SnapshotRef(null)
    val q = EventStreams.changeFeedStream(
      ms.toDF.toDF("k", "s", "x"), base, Seq("k"), Seq("s", "x"), ref) {
        (_, diff) =>
          perBatch += diff.collect().map(r => r.getLong(0) ->
            ((r.getString(1), Option(r.getString(2)).getOrElse("")))).toMap
      }
    // batch 0: key 2 changes x, key 3 is new
    ms.addData((2L, "b", 25.0), (3L, "c", 30.0))
    q.processAllAvailable()
    // batch 1: key 2 changes AGAIN (vs the ADVANCED snapshot: s this
    // time), key 1 re-sent unchanged (must not be reported)
    ms.addData((2L, "B", 25.0), (1L, "a", 10.0))
    q.processAllAvailable()
    q.stop()
    assert(perBatch.size == 2)
    assert(perBatch(0) == Map(
      2L -> (("changed", "x")), 3L -> (("added", ""))))
    // the rolling snapshot advanced: batch 1's diff for key 2 is only s
    // (x already 25.0), and the unchanged resend of key 1 is silent
    assert(perBatch(1) == Map(2L -> (("changed", "s"))))
  }

  test("durable FUZZY refresh: cross-batch catch survives a killed stream") {
    import spark.implicits._
    import graft.operators.FuzzyJoin
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_fzdur").toString
    val built = FuzzyJoin.buildFuzzyIndex(
      Seq((1L, "watermark-state")).toDF("id", "s"), "id", "s")
    built.save(lineage)
    built.close()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]

    // session 1: a novel title survives; its delta epoch lands in-batch;
    // then the stream dies and every in-memory handle is closed
    val ref1 = new EventStreams.FuzzyIndexRef(
      FuzzyJoin.loadFuzzyIndex(spark, lineage))
    val ms1 = MemoryStream[(Long, String)]
    val q1 = EventStreams.incrementalFuzzyDedupStreamWithRefresh(
      ms1.toDF.toDF("id", "s"), "id", "s", ref1,
      checkpointTo = Some(lineage)) {
        s => perBatch += s.select("id").as[Long].collect().toSet
      }
    ms1.addData((100L, "brand-new-title"))
    q1.processAllAvailable()
    q1.stop()
    ref1.index.close()
    assert(perBatch.last == Set(100L))

    // session 2: fresh ref from the lineage — the typo of doc 100 is
    // caught only if session 1's delta persisted; the typo of original
    // doc 1 proves the snapshot still probes; the novel doc survives
    val ref2 = new EventStreams.FuzzyIndexRef(
      FuzzyJoin.loadFuzzyIndex(spark, lineage))
    val ms2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.incrementalFuzzyDedupStreamWithRefresh(
      ms2.toDF.toDF("id", "s"), "id", "s", ref2,
      checkpointTo = Some(lineage)) {
        s => perBatch += s.select("id").as[Long].collect().toSet
      }
    ms2.addData((200L, "brand-new-titl"),
      (201L, "watermark-statee"), (300L, "unrelated-name"))
    q2.processAllAvailable()
    q2.stop()
    ref2.index.close()
    assert(perBatch.last == Set(300L))
  }

  test("stream-stream interval join == the batch join, both sides streamed") {
    val batch = eventsBatch
    val types = batch.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted
    val (ta, tb) = (types(0), types(1))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    batch.write.mode("overwrite").parquet(tmp)
    def sideStream(tpe: String) = spark.readStream.schema(batch.schema)
      .parquet(tmp).where(col("event_type") === tpe)
    val joined = EventStreams.joinWithin(
      sideStream(ta), sideStream(tb), within = "30 minutes")
    val q = EventStreams.runToMemory(joined, "ssj_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssj_out").select("left_id", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin: the same interval predicate as a plain join
    val l = batch.where(col("event_type") === ta).alias("l")
    val r = batch.where(col("event_type") === tb).alias("r")
    val want = l.join(r, expr(
        "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 30 minutes " +
          "AND r.ts <= l.ts"))
      .select(col("l.event_id"), col("r.event_id"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("LEFT OUTER interval join: matches emit on data, nulls emit on the " +
      "watermark, result == batch left join") {
    import spark.implicits._
    import graft.streaming.EventStreams.Event
    def ev(id: Long, user: Long, minutes: Long): Event =
      Event(id, new java.sql.Timestamp(minutes * 60000L), user, "x", 1.0, "")
    // user 1: right row 5 min before both left rows (both match the
    // trailing 30-min window); user 2: right row 40 min before (outside
    // the window -> null); user 3: no right row at all -> null
    val leftRows = Seq(ev(10, 1, 60), ev(11, 1, 70), ev(20, 2, 60),
      ev(30, 3, 65))
    val rightRows = Seq(ev(91, 1, 55), ev(92, 2, 20))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msL = MemoryStream[Event]
    val msR = MemoryStream[Event]
    val joined = EventStreams.joinWithinOuter(msL.toDF(), msR.toDF(),
      within = "30 minutes", watermark = "2 hours")
    // NOT runToMemory: AvailableNow drains what exists at start and stops,
    // but this test must feed three batches through a LIVE query (null
    // emission is driven by the watermark of a LATER batch)
    val q = joined.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("ssjo_out").start()
    msL.addData(leftRows: _*)
    msR.addData(rightRows: _*)
    q.processAllAvailable()
    // batch 1 processed; only MATCHED rows can be out so far — the nulls
    // must wait for the watermark, which is still at the real data's edge
    val early = spark.table("ssjo_out").where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(1), Option(r.get(2)).map(_.toString)))
      .toSet
    assert(early.forall(_._2.isDefined),
      s"null row emitted BEFORE the watermark closed it: $early")
    // batch 2: flush rows 10 h ahead (watermark delay 2 h) advance both
    // watermarks past every real left row — user -1, excluded below
    msL.addData(ev(1000, -1L, 660))
    msR.addData(ev(1001, -1L, 660))
    q.processAllAvailable()
    // null emission happens in the batch AFTER the watermark update; if
    // the engine's no-data batch didn't fire within processAllAvailable,
    // nudge one more data batch through
    msL.addData(ev(1002, -1L, 700))
    msR.addData(ev(1003, -1L, 700))
    q.processAllAvailable(); q.stop()

    val got = spark.table("ssjo_out").where(col("user_id") >= 0)
      .select(col("left_id"),
        when(col("right_id").isNull, lit(-1L)).otherwise(col("right_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin: plain left join under the same interval predicate
    val lB = leftRows.toDF().alias("l")
    val rB = rightRows.toDF().alias("r")
    val want = lB.join(rB, expr(
        "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 30 minutes " +
          "AND r.ts <= l.ts"), "left_outer")
      .select(col("l.event_id"),
        when(col("r.event_id").isNull, lit(-1L)).otherwise(col("r.event_id")))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(got == want, s"got $got want $want")
    // and the null rows are really there (users 2 and 3)
    assert(got.contains((20L, -1L)) && got.contains((30L, -1L)))
    assert(got.contains((10L, 91L)) && got.contains((11L, 91L)))
  }
}
