package graft

import graft.functions.{ReservoirSketch, VarOptSketch}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.ReservoirSketch]] / [[graft.functions.VarOptSketch]]
  * — the sampling members of the mergeable-sketch family: exact regime
  * when n <= k (the sample IS the stream), the deterministic theorems in
  * the lossy regime (exact n under any sharding, sample size = min(n,k),
  * containment, no-replacement distinctness, VarOpt's zero-variance
  * total-weight identity), SQL surface, and parquet round-trip of
  * serialized partials.
  */
class SamplingSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 32

  /** Idempotent per-suite registration (the ExtensionsSpec convention:
    * `withExtensions` would no-op once another suite built the session).
    */
  private def registerSql(): Unit =
    org.apache.spark.sql.GraftSqlBridge.registerFunctionExtensions(
      spark, new GraftExtensions)

  private def reservoirOver(df: DataFrame, shards: Int): Row =
    df.groupBy(pmod(col("id"), lit(shards)).as("shard"))
      .agg(ReservoirSketch.sketchAgg(col("v"), K).as("sk"))
      .agg(ReservoirSketch.mergeAgg(col("sk"), K).as("sk"))
      .select(ReservoirSketch.n(col("sk")).as("n"),
        ReservoirSketch.samples(col("sk")).as("samp"))
      .head()

  test("reservoir exact regime: n <= k keeps the whole stream, sorted") {
    val df = (1 to 20).map(i => (i.toLong, (100 - i).toLong)).toDF("id", "v")
    val r = reservoirOver(df, 4)
    assert(r.getLong(0) == 20L)
    assert(r.getSeq[Long](1) == (80L to 99L))
  }

  test("reservoir lossy regime: exact shard-invariant n, size == k, " +
      "containment, without replacement") {
    val n = 5000
    val df = (0 until n).map(i => (i.toLong, i.toLong * 7)).toDF("id", "v")
    for (shards <- Seq(2, 8)) {
      val r = reservoirOver(df, shards)
      assert(r.getLong(0) == n.toLong, s"n drifted at $shards shards")
      val samp = r.getSeq[Long](1)
      assert(samp.size == K)
      assert(samp.distinct.size == K, "duplicate in without-replacement sample")
      assert(samp.forall(v => v % 7 == 0 && v >= 0 && v < 7L * n),
        "sampled value not in stream")
      assert(samp == samp.sorted, "readout not ascending")
    }
  }

  test("reservoir partials survive a parquet round-trip and merge equal") {
    val df = (0 until 2000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val parts = df.groupBy(pmod(col("id"), lit(8)).as("shard"))
      .agg(ReservoirSketch.sketchAgg(col("v"), K).as("sk"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_rs_rt").toString
    parts.write.mode("overwrite").parquet(path)
    val r = spark.read.parquet(path)
      .agg(ReservoirSketch.mergeAgg(col("sk"), K).as("sk"))
      .select(ReservoirSketch.n(col("sk")),
        size(ReservoirSketch.samples(col("sk")))).head()
    assert(r.getLong(0) == 2000L && r.getInt(1) == K)
  }

  test("reservoir SQL surface round-trips") {
    registerSql()
    val df = (0 until 500).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    df.createOrReplaceTempView("rs_sql_in")
    val r = spark.sql(
      s"""SELECT graft_reservoir_n(sk) AS n,
         |  size(graft_reservoir_samples(sk)) AS m
         |FROM (SELECT graft_reservoir_merge(sk, $K) AS sk
         |      FROM (SELECT graft_reservoir_sketch_agg(v, $K) AS sk
         |            FROM rs_sql_in GROUP BY pmod(id, 4)))""".stripMargin)
      .head()
    assert(r.getLong(0) == 500L && r.getInt(1) == K)
  }

  private def varoptOver(df: DataFrame, shards: Int): Row =
    df.groupBy(pmod(col("id"), lit(shards)).as("shard"))
      .agg(VarOptSketch.sketchAgg(col("item"), col("w"), K).as("sk"))
      .agg(VarOptSketch.mergeAgg(col("sk"), K).as("sk"))
      .select(VarOptSketch.summary(col("sk")).as("sm"),
        VarOptSketch.samples(col("sk")).as("samp"))
      .head()

  test("varopt exact regime: n <= k keeps the stream with ORIGINAL weights") {
    val df = (1 to 20).map(i => (i.toLong, i.toLong, i * 1.5))
      .toDF("id", "item", "w")
    val r = varoptOver(df, 4)
    val sm = r.getStruct(0)
    assert(sm.getLong(0) == 20L && sm.getLong(1) == 20L)
    val pairs = r.getSeq[Row](1).map(p => (p.getLong(0), p.getDouble(1)))
    assert(pairs == (1 to 20).map(i => (i.toLong, i * 1.5)))
  }

  test("varopt lossy regime: exact shard-invariant n, size == k, " +
      "containment, zero-variance total weight") {
    val n = 5000
    // integer-valued weights 1..9 -> the exact total is float-drift-free
    val df = (0 until n).map(i => (i.toLong, i.toLong * 3, (i % 9 + 1).toDouble))
      .toDF("id", "item", "w")
    val exactTotal = (0 until n).map(i => (i % 9 + 1).toDouble).sum
    for (shards <- Seq(2, 8)) {
      val r = varoptOver(df, shards)
      val sm = r.getStruct(0)
      assert(sm.getLong(0) == n.toLong, s"n drifted at $shards shards")
      assert(sm.getLong(1) == K.toLong)
      assert(math.abs(sm.getDouble(2) - exactTotal) <= exactTotal * 1e-9,
        s"total-weight identity broken: ${sm.getDouble(2)} vs $exactTotal")
      val pairs = r.getSeq[Row](1).map(p => (p.getLong(0), p.getDouble(1)))
      assert(pairs.forall { case (it, w) => it % 3 == 0 && w > 0.0 },
        "sampled item not in stream / non-positive adjusted weight")
      assert(pairs.map(_._1) == pairs.map(_._1).sorted, "not ascending")
      // adjusted weights never fall below original minimum weight 1.0
      assert(pairs.forall(_._2 >= 1.0 - 1e-12))
    }
  }

  test("varopt subset-sum estimate from the sample is plausible: a ~half " +
      "weight slice estimates within 5x of truth at k=32") {
    // smoke-level sanity only — unbiasedness is statistical, never gated.
    // The slice (even items, ~50% of total weight) is wide enough that
    // missing it entirely has probability ~2^-32 at k=32.
    val n = 5000
    val df = (0 until n).map(i => (i.toLong, i.toLong * 3, (i % 9 + 1).toDouble))
      .toDF("id", "item", "w")
    val r = varoptOver(df, 8)
    val slice = r.getSeq[Row](1)
      .filter(p => (p.getLong(0) / 3) % 2 == 0).map(_.getDouble(1)).sum
    val truth = (0 until n).filter(_ % 2 == 0).map(i => (i % 9 + 1).toDouble).sum
    assert(slice > truth / 5.0 && slice < truth * 5.0,
      s"subset estimate wildly off: $slice vs $truth")
  }

  test("varopt SQL surface round-trips") {
    registerSql()
    val df = (0 until 500).map(i => (i.toLong, i.toLong, 2.0))
      .toDF("id", "item", "w")
    df.createOrReplaceTempView("vo_sql_in")
    val r = spark.sql(
      s"""SELECT graft_varopt_summary(sk).n AS n,
         |  graft_varopt_summary(sk).total_weight AS tw,
         |  size(graft_varopt_samples(sk)) AS m
         |FROM (SELECT graft_varopt_merge(sk, $K) AS sk
         |      FROM (SELECT graft_varopt_sketch_agg(item, w, $K) AS sk
         |            FROM vo_sql_in GROUP BY pmod(id, 4)))""".stripMargin)
      .head()
    assert(r.getLong(0) == 500L && math.abs(r.getDouble(1) - 1000.0) < 1e-6)
    assert(r.getInt(2) == K)
  }
}
