package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[EventStreams.sketchIndexStream]] — the streaming durable sketch
  * index: per-micro-batch HLL partials appended to parquet, answers from
  * the index alone. Proves the operational contract p11e's oracle row
  * can't: a KILLED and RESTARTED stream resumes from its checkpointed
  * source offsets (new batches only — no re-read, no double-append), and
  * at-least-once replay of partials cannot change the merged answer.
  */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def est(df: DataFrame): Long =
    df.agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .head().getLong(0)

  test("checkpointed stream: epoch 1 builds, restart drains only the new " +
      "epoch, replayed partials are no-ops") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_sketch").toString
    val (src, idx, ckpt) = (s"$base/src", s"$base/idx", s"$base/ckpt")

    // epoch 1: 4 files of keys 0..3999
    spark.range(0L, 4000L).select(col("id").as("k"))
      .repartition(4).write.parquet(src)
    def drain(): Unit = EventStreams.sketchIndexStream(
      spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
      "k", idx, Some(ckpt)).awaitTermination()
    drain()

    val epoch1 = spark.read.parquet(idx)
    assert(epoch1.select(col("batch_id")).distinct().count() == 4L,
      "maxFilesPerTrigger=1 over 4 files must give 4 micro-batches")
    val epoch1Rows = epoch1.count()
    val est1 = est(epoch1)
    assert(math.abs(est1 - 4000.0) <= 200.0, s"epoch-1 estimate $est1")

    // epoch 2: 4 MORE files, keys 2000..5999 — overlapping the first
    // epoch, as real re-crawls do
    spark.range(2000L, 6000L).select(col("id").as("k"))
      .repartition(4).write.mode("append").parquet(src)
    drain() // the restart: same checkpoint, fresh query

    val all = spark.read.parquet(idx)
    assert(all.select(col("batch_id")).distinct().count() == 8L,
      "restart must continue batch numbering past the checkpoint")
    // offsets resumed: epoch-1 partials untouched (no re-read, no
    // double-append of already-committed batches)
    assert(all.where(col("batch_id") < 4).count() == epoch1Rows)
    val est2 = est(all)
    assert(math.abs(est2 - 6000.0) <= 300.0, s"final estimate $est2")

    // at-least-once harmlessness: merging every partial TWICE (a full
    // crash-replay of the sink) changes nothing — duplicate sketches are
    // no-ops at every step of the union
    assert(est(all.unionAll(all)) == est2)

    // and the index answers without the source: drop the staged files,
    // the merged answer is unchanged (the durable-index contract)
    org.apache.spark.network.util.JavaUtils
      .deleteRecursively(new java.io.File(src))
    assert(est(spark.read.parquet(idx)) == est2)
  }
}
