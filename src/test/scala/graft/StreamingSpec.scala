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

  test("sessionize: per-user state via mapGroupsWithState") {
    val batch = eventsBatch
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    batch.write.mode("overwrite").parquet(tmp)
    val streamed = spark.readStream.schema(batch.schema).parquet(tmp)
    val sess = EventStreams.sessionize(spark, streamed)
    val q = EventStreams.runToMemory(sess, "sess_out")
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_out")
    val users = batch.select("user_id").distinct().count()
    assert(out.select("user_id").distinct().count() == users)
    val totalEvents = out.agg(sum("nEvents")).head().getLong(0)
    assert(totalEvents == batch.count())
  }
}
