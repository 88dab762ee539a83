package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** North-star operator specs: text functions, dedup recall on planted
  * near-dups, LSH-vs-brute-force recall, multimodal plumbing.
  */
class ExtensionOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------------ text
  test("tokenCount / subwordCount / shingles") {
    val df = Seq("the quick  brown fox", "", "one").toDF("text")
    val out = df.select(
      TextFunctions.tokenCount(col("text")),
      TextFunctions.shingles(col("text"), 2)).collect()
    assert(out(0).getInt(0) == 4)
    assert(out(0).getSeq[String](1) == Seq("the quick", "quick brown", "brown fox"))
    assert(out(1).getInt(0) == 0)
    assert(out(2).getSeq[String](1).isEmpty) // 1 token -> no bigrams
  }

  test("langId: marker-based prediction with deterministic tie-break") {
    val df = Seq(
      "the cat and the dog sat in the house",
      "el perro y la casa de los gatos en la calle",
      "der hund und die katze ist nicht hier",
      "xyzzy qwerty").toDF("text")
    val out = df.select(TextFunctions.langId(col("text"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "es", "de", "und"))
  }

  test("fingerprint: normalization collapses case/punct/space variants") {
    val df = Seq("Hello, World!", "hello world", "HELLO  WORLD").toDF("text")
    val fps = df.select(TextFunctions.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps.distinct.length == 1)
  }

  // --------------------------------------------------------------- vectors
  test("cosine/dot/norm: known values, zero-vector guard") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 2f), Array(1f, 2f, 2f)),
      (Array(0f, 0f, 0f), Array(1f, 0f, 0f))).toDF("a", "b")
    val out = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
    assert(out(2).isNullAt(0))
  }

  // ----------------------------------------------------------------- dedup
  private val docs = {
    val base = "spark catalyst shuffles partition columns into sorted runs " +
      "while tungsten packs rows off heap for cache friendly scans"
    Seq(
      (1L, base),
      (2L, base), // exact dup of 1
      (3L, base.replace("sorted", "ordered")), // near dup of 1
      (4L, "completely different text about gardening tulips and soil ph levels"),
      (5L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("id", "text")
  }

  test("exactDedup keeps min-id survivor per fingerprint") {
    val kept = Dedup.exactDedup(docs, "id", "text").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("minhashLsh finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "id", "text",
        threshold = 0.7, numHashes = 64, bands = 16, shingleSize = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup missed: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), s"near dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"false positive: $pairs")
  }

  test("simhashNearDup: exact dup at hamming 0, unrelated far") {
    val pairs = Dedup.simhashNearDup(docs, "id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.exists(_._3 == 0), s"exact dup not at hamming 0: ${pairs.toSeq}")
    assert(!pairs.exists(p => (p._1, p._2) == (4L, 5L)))
  }

  test("ngramJaccard: blocked exact jaccard") {
    val blocked = docs.withColumn("blk", lit(1))
    val pairs = Dedup.ngramJaccard(blocked, "id", "text", Seq("blk"), n = 1, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L))
  }

  test("ngramContainment: catches the quote-inside-article case Jaccard misses") {
    import spark.implicits._
    // doc 2 = doc 1 plus a lot of extra text: jaccard is small (4/12)
    // but doc 1 is FULLY contained in doc 2
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta e f g h i j k l"),
      (3L, "totally different words here"))
      .toDF("id", "text").withColumn("blk", lit(1))
    val jac = Dedup.ngramJaccard(d, "id", "text", Seq("blk"), n = 1,
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)), "symmetric jaccard must miss the quote")
    val out = Dedup.ngramContainment(d, "id", "text", Seq("blk"), n = 1,
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == ((1.0, 4.0 / 12)))
    // empty docs never pair (and never NaN)
    val withEmpty = d.unionAll(Seq((4L, "")).toDF("id", "text")
      .withColumn("blk", lit(1)))
    assert(!Dedup.ngramContainment(withEmpty, "id", "text", Seq("blk"),
        n = 1, threshold = 0.0)
      .collect().exists(r => r.getLong(0) == 4L || r.getLong(1) == 4L))
  }

  test("embeddingNearDup multi-table LSH: planted near-identical pairs, 100% recall") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = e.where(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val pairs = Dedup.embeddingNearDup(e.unionAll(planted), "vec_id", "embedding",
        threshold = 0.99, lshBits = 12, tables = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (i, i+1e6) pair recovered, nothing else qualifies
    assert(pairs == (0L until 20L).map(i => (i, i + 1000000L)).toSet)
  }

  test("connectedComponents: chains, stars, isolated pairs; loud non-convergence") {
    // chain 1-2-3-4, star 10-{11,12,13}, pair 20-21: min-label must flow the
    // whole chain even though (1,4) never pair directly
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(edges, "id_a", "id_b")
    val got = comp.as[(Long, Long)].collect().toMap
    comp.unpersist()
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
    // a 6-hop chain cannot converge in 2 rounds: must fail loudly, not
    // return partial labels
    val chain = (1L to 7L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 2)
    }
  }

  test("hot-bucket guard: template family collapses to min id, sub-quadratic candidates") {
    // 500 near-identical variants, cap 50 → every band's hot bucket is
    // oversized and MUST go through representative verification
    val fam = Queries.templateFamily(spark, 500)
    val (guarded, audit) = Dedup.minhashLshAudited(fam, "doc_id", "text",
      threshold = 0.9, numHashes = 128, bands = 16, shingleSize = 3,
      maxBucket = 50, repFactor = 8)
    assert(audit.oversizedBuckets > 0, "guard must engage on the template family")
    assert(audit.maxBucketSize > 50)
    val guardedDrops = guarded.select("id_b").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(guardedDrops == (1L until 500L).toSet,
      "greedy keep-first must still collapse the family to doc 0")
    guarded.unpersist(blocking = false)
    // and with the cap out of reach the unguarded all-pairs plan drops the
    // exact same id set — the guard changes cost, not the dedup outcome
    val (unguarded, audit2) = Dedup.minhashLshAudited(fam, "doc_id", "text",
      threshold = 0.9, numHashes = 128, bands = 16, shingleSize = 3,
      maxBucket = 1000000, repFactor = 8)
    assert(audit2.oversizedBuckets == 0L)
    val plainDrops = unguarded.select("id_b").distinct()
      .collect().map(_.getLong(0)).toSet
    unguarded.unpersist(blocking = false)
    assert(guardedDrops == plainDrops)
  }

  test("hot-bucket guard: simhash and embedding paths stay correct when capped") {
    // identical texts → identical simhash → all four quarter buckets hold
    // the whole family; cap 20 forces the representative path
    val fam = (0L until 100L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val simDrops = Dedup.simhashNearDup(fam, "doc_id", "text", maxHamming = 3,
        maxBucket = 20, repFactor = 4)
      .select("id_b").distinct().collect().map(_.getLong(0)).toSet
    assert(simDrops == (1L until 100L).toSet)

    // identical vectors → one LSH bucket per table; cap 20 again
    val vecs = (0L until 100L).map(i => (i, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val embDrops = Dedup.embeddingNearDup(vecs, "vec_id", "embedding",
        threshold = 0.99, lshBits = 8, tables = 2, maxBucket = 20, repFactor = 4)
      .select("id_b").distinct().collect().map(_.getLong(0)).toSet
    assert(embDrops == (1L until 100L).toSet)
  }

  // ------------------------------------------------------------ similarity
  test("lshTopK recall >= 60% of brute-force top-5 on real embeddings") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(
        Similarity.bucketize(e, "vec_id", "embedding"),
        queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("ivfTopK recall >= 60% of brute-force top-5") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (assigned, cents) = Similarity.ivfIndex(e, "vec_id", "embedding",
      nClusters = 8, iterations = 2)
    val approx = Similarity.ivfTopK(assigned, cents, queries, "vec_id", "embedding",
        k = 5, nProbe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }

  test("saltedJoin == plain join on skewed data") {
    import graft.operators.SkewJoin
    // one hot key (90% of rows) + a tail
    val big = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val small = (1 to 101).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", factor = 4)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    val skew = SkewJoin.keySkew(big, "k", 1).head()
    assert(skew.getLong(0) == 1L && skew.getLong(1) == 900L)
  }

  // ------------------------------------------------------------ multimodal
  test("multimodal: metadata + frame sampling over binary payloads") {
    val df = Seq((1L, "abcdef"), (2L, "0123456789abcdef")).toDF("id", "payload")
      .select(col("id"), encode(col("payload"), "utf-8").as("payload"))
    val media = Multimodal.asMedia(df, "id", "payload", "image/fake")
    val meta = Multimodal.imageMetadata(media).collect()
    assert(meta.length == 2 && meta.forall(m => m.width > 0 && m.height > 0))
    assert(meta.find(_.id == 1L).get.nBytes == 6L)
    val frames = Multimodal.sampleFrames(media, stride = 1).collect()
    assert(frames.nonEmpty && frames.forall(_.frameIndex >= 0))
    val emb = Multimodal.embedMedia(media, dim = 16).collect()
    assert(emb.forall(_.getSeq[Float](1).length == 16))
  }

  test("codec seam: operators follow whichever MediaCodec is injected") {
    val df = Seq((1L, "abcdef"), (2L, "0123456789abcdef")).toDF("id", "payload")
      .select(col("id"), encode(col("payload"), "utf-8").as("payload"))
    val media = Multimodal.asMedia(df, "id", "payload", "image/fake")
    // a second fake implementing the same trait with different arithmetic —
    // the same spec body must hold for both, proving the seam is pluggable
    val codecs: Seq[(Multimodal.MediaCodec, String)] =
      Seq((Multimodal.StubCodecs, "stub"), (ExtensionOpsSpec.AltCodec, "alt"))
    codecs.foreach { case (codec, name) =>
      val meta = Multimodal.imageMetadata(media, codec).collect()
      assert(meta.length == 2, name)
      meta.foreach { m =>
        val (w, h) = codec.decodeImageDims(Array.fill(m.nBytes.toInt)(0: Byte))
        assert((m.width, m.height) == (w, h), s"$name dims must come from the codec")
      }
      val frames = Multimodal.sampleFrames(media, stride = 1, codec = codec)
        .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(frames(1L) == codec.frameCount(new Array[Byte](6)).toLong, name)
      val emb = Multimodal.embedMedia(media, dim = 8, codec = codec).collect()
      emb.foreach { r =>
        val got = r.getSeq[Float](1)
        assert(got.length == 8, name)
      }
    }
    // and the two codecs genuinely disagree, so the assertions above aren't
    // vacuously shared behavior
    assert(Multimodal.StubCodecs.decodeImageDims(new Array[Byte](6)) !=
      ExtensionOpsSpec.AltCodec.decodeImageDims(new Array[Byte](6)))
  }

  test("AnnIndex handles: build once, probe, close releases the cached blocks") {
    import org.apache.spark.storage.StorageLevel
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = e.where(col("vec_id") < 5)

    val lsh = Similarity.buildLshIndex(e, "vec_id", "embedding")
    assert(lsh.bucketed.storageLevel != StorageLevel.NONE)
    val r1 = lsh.topK(queries, "vec_id", "embedding", k = 5)
    val r2 = lsh.topK(queries, "vec_id", "embedding", k = 5) // reuse, no rebuild
    assert(r1.count() == r2.count() && r1.count() > 0)
    lsh.close()
    assert(lsh.bucketed.storageLevel == StorageLevel.NONE)

    val ivf = Similarity.buildIvfIndex(e, "vec_id", "embedding",
      nClusters = 8, iterations = 2, nProbe = 3)
    assert(ivf.assigned.storageLevel != StorageLevel.NONE)
    assert(ivf.cents.storageLevel != StorageLevel.NONE)
    assert(ivf.topK(queries, "vec_id", "embedding", k = 5).count() > 0)
    ivf.close()
    assert(ivf.assigned.storageLevel == StorageLevel.NONE)
    assert(ivf.cents.storageLevel == StorageLevel.NONE)
  }

  test("ivfIndex leaves no leaked per-iteration centroid caches") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n0 = spark.sparkContext.getPersistentRDDs.size
    val ivf = Similarity.buildIvfIndex(e, "vec_id", "embedding",
      nClusters = 4, iterations = 3)
    ivf.close()
    // every iteration's superseded centroid frame was unpersisted during the
    // build, and close() released the final index — nothing new may linger
    assert(spark.sparkContext.getPersistentRDDs.size <= n0,
      "ivfIndex build leaked cached frames")
  }
}

object ExtensionOpsSpec {
  /** Second fake codec for the seam test: same trait, different arithmetic. */
  object AltCodec extends graft.operators.Multimodal.MediaCodec {
    def decodeImageDims(data: Array[Byte]): (Int, Int) =
      (64 + data.length % 7, 64 + data.length % 5)
    def frameCount(data: Array[Byte]): Int = 1 + data.length % 3
    def embed(data: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      v(data.length % dim) = 1f
      v
    }
    def meanLevel(data: Array[Byte]): Double = data.length.toDouble
  }
}
