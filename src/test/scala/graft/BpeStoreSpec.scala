package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeVocab
import graft.operators.BpeStore

/** [[BpeStore]] round-trip: the tokenizer is the third session-spanning
  * artifact (after the LSH/Sem indexes) — a reloaded merge table must
  * tokenize bit-identically, which means order AND content survive the
  * parquet lineage.
  */
class BpeStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("save/load round-trips the committed fixture in rank order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_t").toString
    val epoch = BpeStore.save(spark, BpeVocab.Fixture, dir)
    assert(epoch.endsWith("epoch=0"))
    val back = BpeStore.load(spark, dir)
    assert(back == BpeVocab.Fixture)
    // loaded table passes structural validation and tokenizes identically
    val t = BpeVocab.tableFor(back)
    val direct = BpeVocab.tableFor(BpeVocab.Fixture)
    val probe = org.apache.spark.unsafe.types.UTF8String
      .fromString("the quick brown fox said hello world")
    assert(BpeVocab.count(t, probe) == BpeVocab.count(direct, probe))
  }

  test("epochs append; load takes the newest complete one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_t2").toString
    BpeStore.save(spark, BpeVocab.Fixture.take(5), dir)
    BpeStore.save(spark, BpeVocab.Fixture, dir)
    assert(BpeStore.load(spark, dir) == BpeVocab.Fixture)
  }

  test("a torn save (no sidecar) is invisible to load") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_t3").toString
    BpeStore.save(spark, BpeVocab.Fixture, dir)
    // simulate a crash mid-write of the NEXT epoch: frames exist, no sidecar
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "epoch=1", "merges"))
    assert(BpeStore.load(spark, dir) == BpeVocab.Fixture)
  }
}
