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
}
