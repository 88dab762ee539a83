package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rolling-crawl near-dedup contract: a batch probes the persisted
  * band/bucket index without rescanning corpus text, catches exact AND
  * near duplicates, keep-firsts within itself, and degrades to
  * representative verification when an index bucket is template-hot.
  */
class IncrementalNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  // >= 30 words each: a doubled text then has trigram jaccard n/(n+2) >= 0.93
  private val corpusTexts = Seq(
    1L -> ("spark shuffles the sorted batch through the exchange and spills to disk when pressure rises " +
      "while the scheduler keeps every core busy and the metrics sink records each stage duration faithfully"),
    2L -> ("the optimizer prunes columns early so the scan reads only what the query needs downstream " +
      "and predicate pushdown lets the parquet reader skip entire row groups before any bytes decompress"),
    3L -> ("watermarks bound the state a streaming aggregate keeps before emitting final windowed results " +
      "so late events past the threshold are dropped deterministically and checkpoint size stays flat forever"),
    4L -> ("broadcast joins ship the small dimension to every executor avoiding a full shuffle of facts " +
      "which keeps network traffic proportional to the dimension size instead of the entire fact table"))

  test("batch near-dups of indexed docs are matched; novel docs survive") {
    val index = Dedup.buildLshIndex(mkDocs(corpusTexts), "doc_id", "text",
      numHashes = 128, bands = 16, shingleSize = 3)
    val batch = mkDocs(Seq(
      10L -> (corpusTexts(0)._2 + " " + corpusTexts(0)._2), // doubled: near-dup
      11L -> corpusTexts(1)._2,                             // exact dup
      12L -> "a completely different document about tokenizers and merge tables and vocabularies today"))
    val m = Dedup.incrementalNearDup(batch, "doc_id", "text", index, threshold = 0.9)
    val dropped = m.select("batch_id").as[Long].collect().toSet
    assert(dropped == Set(10L, 11L))
    val idxMatches = m.where(col("match_in_index"))
      .select("batch_id", "match_id").as[(Long, Long)].collect().toSet
    assert(idxMatches == Set((10L, 1L), (11L, 2L)))
    m.unpersist(); index.close()
  }

  test("within-batch near-dups keep the smallest id") {
    val index = Dedup.buildLshIndex(mkDocs(corpusTexts.take(1)), "doc_id", "text",
      numHashes = 128, bands = 16, shingleSize = 3)
    val novel = "entirely new content that matches nothing in the index and repeats itself very little " +
      "because every clause here introduces fresh vocabulary about tokenizers shards manifests and quotas " +
      "rather than reusing the corpus phrasing about shuffles scans watermarks or broadcast dimensions"
    val batch = mkDocs(Seq(20L -> novel, 21L -> novel, 22L -> (novel + " " + novel)))
    val m = Dedup.incrementalNearDup(batch, "doc_id", "text", index, threshold = 0.9)
    assert(m.where(col("match_in_index")).count() == 0)
    val pairs = m.select("batch_id", "match_id").as[(Long, Long)].collect().toSet
    // 20 survives; 21 and 22 both dropped against smaller ids
    assert(pairs.map(_._1) == Set(21L, 22L))
    assert(pairs.forall { case (b, k) => k < b })
    m.unpersist(); index.close()
  }

  test("hot index bucket engages the guard: family still collapses onto smallest index ids") {
    // 3000 near-identical indexed variants (one trailing token differs) —
    // every band bucket holds ~the whole family, far over maxBucket
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven"
    val fam = (0L until 3000L).map(i => i -> s"$base v$i")
    val index = Dedup.buildLshIndex(mkDocs(fam), "doc_id", "text",
      numHashes = 128, bands = 16, shingleSize = 3)
    val batch = mkDocs(Seq(9000L -> s"$base v9000"))
    val m = Dedup.incrementalNearDup(batch, "doc_id", "text", index,
      threshold = 0.9, maxBucket = 100, repFactor = 8)
    val matches = m.select("batch_id", "match_id").as[(Long, Long)].collect()
    // guard: the probe verified against representatives only — bounded,
    // and the matches are exactly the bucket's smallest index ids
    assert(matches.nonEmpty && matches.length <= 16 * 8)
    assert(matches.map(_._2).min == 0L)
    assert(m.select("batch_id").distinct().as[Long].collect().toSeq == Seq(9000L))
    m.unpersist(); index.close()
  }

  test("index build parameters are reused by the probe (bands must align)") {
    val index = Dedup.buildLshIndex(mkDocs(corpusTexts), "doc_id", "text",
      numHashes = 64, bands = 8, shingleSize = 2)
    val batch = mkDocs(Seq(30L -> corpusTexts(3)._2))
    val m = Dedup.incrementalNearDup(batch, "doc_id", "text", index, threshold = 0.9)
    assert(m.select("batch_id").as[Long].collect().toSeq == Seq(30L))
    m.unpersist(); index.close()
  }
}
