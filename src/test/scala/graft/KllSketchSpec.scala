package graft

import graft.functions.KllSketch
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.KllSketch]] — the mergeable quantile sketch: exact
  * regime below the compaction threshold, the deterministic surface
  * (n / min / max) invariant across shardings in the lossy regime, the
  * 2ε rank theorem on the merged estimates, and durable parquet
  * round-trip of serialized partials.
  */
class KllSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 200

  /** shard → partial → merge → (summary, quantile estimates) */
  private def sketchOver(df: DataFrame, shards: Int,
      ranks: Seq[Double]): Row = {
    val qCols = ranks.zipWithIndex.map { case (r, i) =>
      KllSketch.quantile(col("sk"), r).as(s"q$i") }
    df.groupBy(pmod(col("id"), lit(shards)).as("shard"))
      .agg(KllSketch.sketchAgg(col("v"), K).as("sk"))
      .agg(KllSketch.mergeAgg(col("sk"), K).as("sk"))
      .select(KllSketch.summary(col("sk")).as("sm") +: qCols: _*)
      .head()
  }

  test("exact regime: below the compaction threshold every quantile is " +
      "exact and the sketch says so") {
    // n = 150 < 201 (k = 200's first compaction), values 1..150
    val df = (1 to 150).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val r = sketchOver(df, 4, Seq(0.0, 0.5, 1.0))
    val sm = r.getStruct(0)
    assert(sm.getLong(0) == 150L) // n
    assert(sm.getDouble(1) == 1.0 && sm.getDouble(2) == 150.0) // min/max
    assert(sm.getLong(3) == 150L) // retained == n: nothing discarded
    assert(!sm.getBoolean(5)) // not estimation mode
    // INCLUSIVE: smallest v with rank(v) = count(<=v)/n >= r
    assert(r.getDouble(1) == 1.0) // rank 0
    assert(r.getDouble(2) == 75.0) // rank 0.5
    assert(r.getDouble(3) == 150.0) // rank 1
  }

  test("lossy regime: n/min/max stay exact and shard-count-invariant; " +
      "estimates obey the 2ε rank theorem under any sharding") {
    val n = 20000
    val df = (0 until n).map(i => (i.toLong, (i * 37 % n).toDouble))
      .toDF("id", "v")
    val ranks = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    for (shards <- Seq(2, 8)) {
      val r = sketchOver(df, shards, ranks)
      val sm = r.getStruct(0)
      assert(sm.getLong(0) == n.toLong, s"n drifted at $shards shards")
      assert(sm.getDouble(1) == 0.0 && sm.getDouble(2) == (n - 1).toDouble)
      assert(sm.getLong(3) < n, "sketch never compacted — not lossy")
      assert(sm.getBoolean(5))
      val eps2 = 2.0 * sm.getDouble(4)
      ranks.zipWithIndex.foreach { case (rank, i) =>
        val q = r.getDouble(i + 1)
        // values are the integers 0..n-1 each once: trueRank(q) = (q+1)/n
        val trueRankLe = (q + 1.0) / n
        val trueRankLt = q / n
        assert(trueRankLe >= rank - eps2 && trueRankLt <= rank + eps2,
          s"rank $rank at $shards shards: estimate $q breaches 2ε=$eps2")
        assert(q == math.floor(q) && q >= 0 && q < n,
          s"quantile $q is not an actual stream value")
      }
    }
  }

  test("serialized partials survive a parquet round trip and merge to the " +
      "same deterministic surface") {
    val n = 5000
    val df = (0 until n).map(i => (i.toLong, math.sin(i * 0.1)))
      .toDF("id", "v")
    val partials = df.groupBy(pmod(col("id"), lit(4)).as("shard"))
      .agg(KllSketch.sketchAgg(col("v"), K).as("sk"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kll").toString + "/partials"
    partials.write.parquet(dir)
    val back = spark.read.parquet(dir)
      .agg(KllSketch.mergeAgg(col("sk"), K).as("sk"))
      .select(KllSketch.summary(col("sk")).as("sm"),
        KllSketch.rank(col("sk"), lit(0.0)).as("r0"))
      .head()
    val sm = back.getStruct(0)
    assert(sm.getLong(0) == n.toLong)
    val exactMin = (0 until n).map(i => math.sin(i * 0.1)).min
    val exactMax = (0 until n).map(i => math.sin(i * 0.1)).max
    assert(sm.getDouble(1) == exactMin && sm.getDouble(2) == exactMax)
    // sin values are symmetric around 0: estimated rank of 0.0 within 2ε
    // of the exact rank
    val exactRank0 =
      (0 until n).count(i => math.sin(i * 0.1) <= 0.0).toDouble / n
    assert(math.abs(back.getDouble(1) - exactRank0) <= 2.0 * sm.getDouble(4))
  }

  test("empty input: quantile and rank read out as NULL, n = 0") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    val r = df.agg(KllSketch.sketchAgg(col("v"), K).as("sk"))
      .select(KllSketch.summary(col("sk")).as("sm"),
        KllSketch.quantile(col("sk"), 0.5).as("q"),
        KllSketch.rank(col("sk"), lit(1.0)).as("rk"))
      .head()
    assert(r.getStruct(0).getLong(0) == 0L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("null values are skipped, not counted") {
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "v")
    val sm = df.agg(KllSketch.sketchAgg(col("v"), K).as("sk"))
      .select(KllSketch.summary(col("sk"))).head().getStruct(0)
    assert(sm.getLong(0) == 2L)
    assert(sm.getDouble(1) == 1.0 && sm.getDouble(2) == 3.0)
  }
}
