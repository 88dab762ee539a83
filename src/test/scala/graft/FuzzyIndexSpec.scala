package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rolling-crawl fuzzy-dedup contract ([[FuzzyJoin.FuzzyIndex]]):
  * batches probe a persisted deletion-variant bucket index without
  * rescanning indexed strings, catch typo-level (≤ maxDist) variants,
  * keep-first within themselves, fold survivors in via append, and
  * round-trip durably through the epoch+sidecar lineage.
  */
class FuzzyIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "gradient-descent", 2L -> "tokenizer-vocab",
    3L -> "shuffle-exchange", 4L -> "watermark-state")
  private def df(rows: Seq[(Long, String)]) = rows.toDF("id", "s")

  test("typo variants of indexed strings are matched; novel strings survive") {
    val idx = FuzzyJoin.buildFuzzyIndex(df(corpus), "id", "s")
    val batch = df(Seq(
      10L -> "gradient-descnt",   // deletion vs 1
      11L -> "tokenizer-vocab",   // exact dup of 2
      12L -> "xhuffle-exchange",  // substitution vs 3
      13L -> "completely-novel"))
    val m = FuzzyJoin.incrementalFuzzyDedup(batch, "id", "s", idx)
    val got = m.select("batch_id", "match_id", "match_in_index").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((10L, 1L, true), (11L, 2L, true), (12L, 3L, true)))
    m.unpersist(); idx.close()
  }

  test("within-batch fuzzy dups keep the smallest id") {
    val idx = FuzzyJoin.buildFuzzyIndex(df(corpus.take(1)), "id", "s")
    val batch = df(Seq(
      20L -> "alpha-beta", 21L -> "alpha-betaz", 22L -> "alpha-bet"))
    val m = FuzzyJoin.incrementalFuzzyDedup(batch, "id", "s", idx)
    val inBatch = m.where(!col("match_in_index"))
      .select("batch_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 20~21 (ins) and 20~22 (del) — larger id always drops; 21~22 are 2
    // edits apart, no direct pair
    assert(inBatch == Set((21L, 20L), (22L, 20L)))
    m.unpersist(); idx.close()
  }

  test("append folds survivors in: the NEXT batch is caught cross-batch") {
    var idx = FuzzyJoin.buildFuzzyIndex(df(corpus), "id", "s")
    val b1 = df(Seq(30L -> "brand-new-title"))
    val m1 = FuzzyJoin.incrementalFuzzyDedup(b1, "id", "s", idx)
    assert(m1.count() == 0) // novel: survives
    idx = idx.append(b1, "id", "s")
    val b2 = df(Seq(31L -> "brand-new-titl")) // typo of batch-1 survivor
    val m2 = FuzzyJoin.incrementalFuzzyDedup(b2, "id", "s", idx)
    val got = m2.select("batch_id", "match_id", "match_in_index").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((31L, 30L, true)))
    m1.unpersist(); m2.unpersist(); idx.close()
  }

  test("save/load round-trip: reloaded probe matches in-session, deltas replay") {
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_fuzzy_rt").toString
    val built = FuzzyJoin.buildFuzzyIndex(df(corpus), "id", "s")
    built.save(lineage)
    // delta epoch via append(checkpointTo): must replay on load
    val appended = built.append(df(Seq(40L -> "delta-epoch-entry")),
      "id", "s", checkpointTo = Some(lineage))
    val batch = df(Seq(
      50L -> "gradient-descnt", 51L -> "delta-epoch-entr"))
    val inSession = FuzzyJoin.incrementalFuzzyDedup(batch, "id", "s", appended)
      .select("batch_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    appended.close()
    val reloaded = FuzzyJoin.loadFuzzyIndex(spark, lineage)
    assert(reloaded.maxDist == 1)
    val fromDisk = FuzzyJoin.incrementalFuzzyDedup(batch, "id", "s", reloaded)
      .select("batch_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    reloaded.close()
    assert(inSession == Set((50L, 1L), (51L, 40L)))
    assert(fromDisk == inSession)
  }
}
