package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Durable index lineages: save/load round-trips for [[Dedup.LshIndex]]
  * and [[Dedup.SemIndex]] must be invisible to probes (identical matches),
  * epochs must append rather than overwrite, and a torn save (an epoch dir
  * with no sidecar) must be skipped by load.
  */
class IndexPersistenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "a completely different document about spark query planning"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"),
    (4L, "yet another unrelated piece of text with its own words")
  ).toDF("doc_id", "text")

  private def probeBatch = Seq(
    (101L, "the quick brown fox jumps over the lazy dog again and again"),
    (102L, "nothing like anything in the index at all whatsoever")
  ).toDF("doc_id", "text")

  test("LshIndex save/load round-trip: reloaded probe matches in-session") {
    val built = Dedup.buildLshIndex(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3)
    val inSession = Dedup.incrementalNearDup(probeBatch, "doc_id", "text",
      built, threshold = 0.9).collect().map(_.toString).sorted
    val lineage = tmp("lsh_rt")
    val dir = built.save(lineage)
    assert(dir.endsWith("epoch=0"))
    built.close()
    val loaded = Dedup.loadLshIndex(spark, lineage)
    assert(loaded.numHashes == 64 && loaded.bands == 16 &&
      loaded.shingleSize == 3)
    val reloaded = Dedup.incrementalNearDup(probeBatch, "doc_id", "text",
      loaded, threshold = 0.9).collect().map(_.toString).sorted
    loaded.close()
    assert(inSession.nonEmpty && (inSession sameElements reloaded))
  }

  test("epochs append; load takes the newest complete; torn saves skipped") {
    val lineage = tmp("lsh_epochs")
    val i0 = Dedup.buildLshIndex(docs.where(col("doc_id") <= 2),
      "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 3)
    assert(i0.save(lineage).endsWith("epoch=0"))
    // refresh: append the rest, checkpoint as the next epoch
    val i1 = i0.append(docs.where(col("doc_id") > 2), "doc_id", "text")
    assert(i1.save(lineage).endsWith("epoch=1"))
    i1.close()
    // a torn save: epoch dir exists but no sidecar — must be invisible
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$lineage/epoch=2"))
    val loaded = Dedup.loadLshIndex(spark, lineage)
    assert(loaded.sets.count() == 4) // epoch=1's four docs, not epoch=0's two
    loaded.close()
  }

  private def vecs(ids: Seq[Long]) = ids.map { i =>
    (i, Array.tabulate(8)(d => (((i * 7 + d * 3) % 11) + 1).toFloat))
  }.toDF("vec_id", "vec")

  test("vacuumLineage keeps exactly the load's replay set") {
    val lineage = tmp("lsh_vac")
    // epoch 0: full; epoch 1: delta (append w/ checkpoint); epoch 2: torn;
    // epoch 3: fresh full; epoch 4: delta after it
    val b0 = Dedup.buildLshIndex(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3)
    b0.save(lineage)
    val extra = Seq((50L, "some new admitted survivor text for the delta"))
      .toDF("doc_id", "text")
    val b1 = b0.append(extra, "doc_id", "text", Some(lineage))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(lineage, "epoch=2", "sets")) // torn
    val b2 = b1.append(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", None)
    b2.save(lineage) // epoch 3: full snapshot of everything so far
    val b3 = b2.append(
      Seq((60L, "another later survivor for the post-snapshot delta"))
        .toDF("doc_id", "text"), "doc_id", "text", Some(lineage))
    b3.close()
    val expected = Dedup.loadLshIndex(spark, lineage)
    val expectedSets = expected.sets.select("sid").as[Long].collect().toSet
    expected.close()

    val deleted = Dedup.vacuumLineage(spark, lineage)
    assert(deleted.map(_.split("epoch=").last.toLong).toSet == Set(0L, 1L, 2L))
    val after = Dedup.loadLshIndex(spark, lineage)
    assert(after.sets.select("sid").as[Long].collect().toSet == expectedSets)
    assert(expectedSets.contains(60L) && expectedSets.contains(50L))
    after.close()
    // idempotent: nothing left to delete
    assert(Dedup.vacuumLineage(spark, lineage).isEmpty)
  }

  test("SemIndex save/load round-trip: reloaded probe matches in-session") {
    val corpus = vecs(1L to 40L)
    val built = Dedup.buildSemIndex(corpus, "vec_id", "vec",
      nClusters = 4, iterations = 2)
    // batch: one near-dup of an indexed vector (scaled copy: cosine 1) and
    // one vector orthogonal-ish to everything
    val batch = corpus.where(col("vec_id") === 5L)
      .select((col("vec_id") + 100L).as("vec_id"),
        transform(col("vec"), v => (v * lit(1.01f)).cast("float")).as("vec"))
      .unionAll(Seq((200L, Array(9f, -9f, 9f, -9f, 9f, -9f, 9f, -9f)))
        .toDF("vec_id", "vec"))
    val inSession = Dedup.incrementalSemDedup(batch, "vec_id", "vec",
      built, threshold = 0.999).collect().map(_.toString).sorted
    val lineage = tmp("sem_rt")
    built.save(lineage)
    built.close()
    val loaded = Dedup.loadSemIndex(spark, lineage)
    assert(loaded.nClusters == 4)
    val reloaded = Dedup.incrementalSemDedup(batch, "vec_id", "vec",
      loaded, threshold = 0.999).collect().map(_.toString).sorted
    loaded.close()
    assert(inSession.nonEmpty && (inSession sameElements reloaded))
  }

  test("PqModel save/load: reloaded codebook and codes are identical") {
    import graft.operators.Similarity
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(d => (math.sin(i * 8 + d) * 10).toFloat))
    }.toDF("id", "vec")
    val model = Similarity.trainPq(vecs, "id", "vec",
      m = 2, ks = 4, iterations = 2, inDims = 8)
    val lineage = tmp("graft_pq")
    model.save(lineage)
    val loaded = Similarity.loadPqModel(spark, lineage)
    assert((loaded.m, loaded.subDim, loaded.ks) == ((2, 4, 4)))
    def book(m: Similarity.PqModel) =
      m.codebook.orderBy("sub", "cluster").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq
    assert(book(model) == book(loaded))
    def codes(m: Similarity.PqModel) =
      Similarity.pqEncode(vecs, "id", "vec", m).orderBy("neighbor_id")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(codes(model) == codes(loaded))
    // second save appends an epoch; load still resolves the newest
    model.save(lineage)
    val again = Similarity.loadPqModel(spark, lineage)
    assert(book(again) == book(model))
    model.close(); loaded.close(); again.close()
  }
}
