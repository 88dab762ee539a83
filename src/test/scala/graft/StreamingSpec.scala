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

  private def eventsBatch = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"${SparkTestSession.sfDir}/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

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
    val users = batch.select("user_id").distinct().count()
    assert(out.select("user_id").distinct().count() == users)
    // every event lands in exactly one emitted session (closed or open)
    val totalEvents = out.agg(sum("nEvents")).head().getLong(0)
    assert(totalEvents == batch.count())
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
    assert(rows.length == 2)
    assert(rows(0).getAs[Boolean]("closed") && rows(0).getAs[Long]("nEvents") == 2L)
    assert(rows(0).getAs[Double]("totalValue") == 3.0)
    assert(!rows(1).getAs[Boolean]("closed") && rows(1).getAs[Long]("nEvents") == 2L)
    assert(rows(1).getAs[java.sql.Timestamp]("sessionStart") == at(120))
  }
}
