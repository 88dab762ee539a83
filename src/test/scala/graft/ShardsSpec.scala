package graft

import graft.sources.Shards
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Shards]] — token-budget training-shard export: round-trip fidelity,
  * the greedy packing bound, shard-predicate partition pruning,
  * deterministic assignment, and the never-overwrite discipline.
  */
class ShardsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = (0 until 97).map { i =>
    (i.toLong, s"doc $i body", 10L + (i % 7)) // 10..16 tokens per doc
  }.toDF("doc_id", "text", "n_tokens")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_shards").toString + "/export"

  test("round-trips every row, bounds every shard, prunes on the shard column") {
    val root = tmp()
    val budget = 100L
    val manifest = Shards.writeTokenShards(fixture, "doc_id", "n_tokens",
      root, budget, chunkWidth = 16L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val back = Shards.readShards(spark, root)
    assert(back.count() == 97)
    assert(back.columns.contains("shard"))
    // every doc comes back intact
    val pairs = back.select("doc_id", "n_tokens").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(pairs.toSeq == fixture.select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq)
    // greedy bound: a shard holds at most budget + (max doc - 1) tokens,
    // and every shard except the last is at least budget-full when the
    // NEXT shard exists (no premature cuts)
    val maxDoc = 16L
    manifest.foreach { case (s, (_, toks)) =>
      assert(toks <= budget + maxDoc - 1, s"shard $s overfull: $toks")
    }
    val totalToks = manifest.values.map(_._2).sum
    assert(totalToks == fixture.agg(sum("n_tokens")).head().getLong(0))
    // partition pruning: a shard predicate hits only that directory
    val pruned = back.where(col("shard") === 0)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("shard"), s"no partition filter in: $scan")
    assert(pruned.count() == manifest(0L)._1)
  }

  test("assignment is deterministic across writes and matches the manifest") {
    val r1 = tmp(); val r2 = tmp()
    val m1 = Shards.writeTokenShards(fixture, "doc_id", "n_tokens", r1, 100L, 16L)
      .orderBy("shard").collect().map(_.toSeq).toSeq
    val m2 = Shards.writeTokenShards(fixture, "doc_id", "n_tokens", r2, 100L, 16L)
      .orderBy("shard").collect().map(_.toSeq).toSeq
    assert(m1 == m2)
    val a = Shards.readShards(spark, r1).select("doc_id", "shard")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Shards.readShards(spark, r2).select("doc_id", "shard")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("never overwrites an existing export") {
    val root = tmp()
    Shards.writeTokenShards(fixture, "doc_id", "n_tokens", root, 100L, 16L).collect()
    intercept[Exception] {
      Shards.writeTokenShards(fixture, "doc_id", "n_tokens", root, 100L, 16L).collect()
    }
  }

  test("HLL sketch-merge is shard-count and shard-shape invariant (p11c)") {
    import org.apache.spark.sql.functions._
    // 5k values, ~1.7k distinct — enough that the union is in dense mode
    val vals = spark.range(0, 5000)
      .select((col("id") % 1700).as("v"), col("id"))
    def mergedEst(shard: org.apache.spark.sql.Column): Long =
      vals.groupBy(shard.as("__s"))
        .agg(hll_sketch_agg(col("v"), lit(12)).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
        .head().getLong(0)
    val ests = Seq(2, 4, 8, 16)
      .map(n => mergedEst(pmod(xxhash64(col("id")), lit(n))))
    // any DISJOINT partition max-merges to the same dense register state:
    // equal estimates across 2/4/8/16 shards...
    assert(ests.distinct.size == 1, s"shard-count varied: $ests")
    // ...and across a deliberately SKEWED shard map (99% in one shard)
    val skewed = mergedEst(when(col("id") % 100 === 0, lit(1)).otherwise(lit(0)))
    assert(skewed == ests.head, s"skewed map diverged: $skewed vs ${ests.head}")
    // and the estimate is within the p11 5% envelope of exact
    assert(math.abs(skewed.toDouble - 1700.0) <= 1700.0 * 0.05)
  }

  test("theta merge: exact regime shard-invariant and equal to truth; " +
      "lossy regime brackets truth and set algebra stays sane (th1)") {
    import graft.functions.ThetaSketch
    import org.apache.spark.sql.{Column, DataFrame}

    def merged(df: DataFrame, key: Column, shard: Column, k: Int) =
      df.groupBy(shard.as("__s"))
        .agg(ThetaSketch.sketchAgg(key, k).as("sk"))
        .agg(ThetaSketch.unionAgg(col("sk"), k).as("sk"))
    def est(skDf: DataFrame): Double =
      skDf.select(ThetaSketch.estimate(col("sk"))).head().getDouble(0)
    def estMode(skDf: DataFrame): Boolean =
      skDf.select(ThetaSketch.isEstimation(col("sk"))).head().getBoolean(0)

    // EXACT regime: nominal 4096 >= 1700 distinct — merged estimate is
    // the truth for ANY sharding, including a 99%-skewed map
    val vals = spark.range(0, 5000).select((col("id") % 1700).as("v"),
      col("id"))
    val exactEsts = (Seq(2, 4, 8, 16)
      .map(n => merged(vals, col("v"), pmod(xxhash64(col("id")), lit(n)), 4096))
      :+ merged(vals, col("v"),
        when(col("id") % 100 === 0, lit(1)).otherwise(lit(0)), 4096))
    exactEsts.foreach { m =>
      assert(!estMode(m) && est(m) == 1700.0, s"${est(m)} ${estMode(m)}")
    }

    // LOSSY regime: 100k distinct at nominal 1024 — estimation mode, and
    // the 2-sigma interval brackets the true cardinality (deterministic
    // for this fixed input: theta hashing is seeded and fixed)
    val big = spark.range(0, 100000).select(col("id").as("v"), col("id"))
    val m = merged(big, col("v"), pmod(xxhash64(col("id")), lit(8)), 1024)
    assert(estMode(m))
    val row = m.select(ThetaSketch.estimate(col("sk"))).head()
    val e = row.getDouble(0)
    assert(math.abs(e - 100000.0) / 100000.0 < 0.10, s"est $e")

    // set algebra in exact regime: A = 0..999, B = 500..1499 (on shards)
    val a = merged(spark.range(0, 1000).select(col("id").as("v"), col("id")),
      col("v"), pmod(xxhash64(col("id")), lit(4)), 4096)
      .select(col("sk").as("a"))
    val b = merged(spark.range(500, 1500).select(col("id").as("v"), col("id")),
      col("v"), pmod(xxhash64(col("id")), lit(8)), 4096)
      .select(col("sk").as("b"))
    val ops = a.crossJoin(b).select(
      ThetaSketch.setEstimate(col("a"), col("b"), "union").as("u"),
      ThetaSketch.setEstimate(col("a"), col("b"), "intersect").as("i"),
      ThetaSketch.setEstimate(col("a"), col("b"), "anotb").as("d")).head()
    assert(ops.getDouble(0) == 1500.0 && ops.getDouble(1) == 500.0 &&
      ops.getDouble(2) == 500.0, s"$ops")
  }

  test("frequent-items merge: exact regime shard-invariant, lossy regime " +
      "keeps its guarantees (hh2)") {
    import graft.functions.FreqSketch
    import org.apache.spark.sql.{Column, DataFrame}

    def merged(df: DataFrame, key: Column, shard: Column, maxMap: Int) =
      df.groupBy(shard.as("__s"))
        .agg(FreqSketch.sketchAgg(key, maxMap).as("sk"))
        .agg(FreqSketch.mergeAgg(col("sk"), maxMap).as("sk"),
          max(lit(0)).as("__z")) // keep a stable 1-row frame
    def report(skDf: DataFrame): Map[String, (Long, Long, Long)] =
      skDf.select(explode(FreqSketch.items(col("sk"))).as("r"))
        .select(col("r.item"), col("r.estimate"), col("r.lower_bound"),
          col("r.upper_bound"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    def maxErr(skDf: DataFrame): Long =
      skDf.select(FreqSketch.maxError(col("sk"))).head().getLong(0)

    // EXACT regime: maxMapSize 4096 >= 1700 distinct keys — no purge can
    // ever happen, so for ANY disjoint sharding the merged sketch IS the
    // exact count map: identical across 2/4/8/16 shards and a 99%-skewed
    // shard map, maxError 0, estimates == true counts.
    val vals = spark.range(0, 5000)
      .select(concat(lit("k"), (col("id") % 1700).cast("string")).as("v"),
        col("id"))
    val exactMaps = (Seq(2, 4, 8, 16)
      .map(n => merged(vals, col("v"), pmod(xxhash64(col("id")), lit(n)), 4096))
      :+ merged(vals, col("v"),
        when(col("id") % 100 === 0, lit(1)).otherwise(lit(0)), 4096))
    val reps = exactMaps.map(report)
    assert(reps.forall(_ == reps.head),
      s"exact-regime merge varied with sharding: sizes ${reps.map(_.size)}")
    assert(reps.head.size == 1700)
    assert(exactMaps.forall(maxErr(_) == 0L))
    // id % 1700 over 0..4999: ids < 1600 appear 3x, the rest 2x
    assert(reps.head("k0")._1 == 3L && reps.head("k1699")._1 == 2L)

    // LOSSY regime: 5 heavy keys at 10% share each over a 5000-key unique
    // tail, maxMapSize 64 (eps ~ 3.5/64 = 5.5% < 10%): for EVERY sharding
    // the NO_FALSE_NEGATIVES report must contain all heavy keys, every
    // interval must bracket the true count, and the sketch must have
    // genuinely purged (maxError > 0, retained << distinct).
    val heavy = spark.range(0, 5000)
      .select(concat(lit("h"), (col("id") % 5).cast("string")).as("v"),
        col("id"))
    val tail = spark.range(0, 5000)
      .select(concat(lit("t"), col("id").cast("string")).as("v"),
        (col("id") + 5000).as("id"))
    val stream = heavy.unionByName(tail)
    for (n <- Seq(2, 4, 16)) {
      val sk = merged(stream, col("v"), pmod(xxhash64(col("id")), lit(n)), 64)
      val rep = report(sk)
      val err = maxErr(sk)
      assert(err > 0L, s"n=$n: expected lossy regime")
      assert(rep.size < 64, s"n=$n: retained ${rep.size}")
      for (k <- 0 until 5) {
        val tru = 1000L
        val got = rep.get(s"h$k")
        assert(got.isDefined, s"n=$n: heavy key h$k missing from report")
        val (_, lb, ub) = got.get
        assert(lb <= tru && tru <= ub, s"n=$n h$k: [$lb,$ub] !∋ $tru")
      }
    }
  }
}
