package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-5 training-pipeline operators: decontamination,
  * deterministic splitting, repetition metrics, sketch gate. The oracle
  * hash-checks their full outputs; these specs pin the *invariants* a
  * refactor must preserve.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("dc1: every planted leaked benchmark copy with >=5 tokens is flagged") {
    val docs = Queries.t(spark, dir, "documents")
    // planted copies carry ids benchId + 2000000; a copy shares ALL its
    // 5-grams with its source, so any copy with at least one 5-gram
    // (>= 5 tokens) must appear in the contaminated set
    val out = Queries.dc1Decontaminate(spark, dir)
    val flagged = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs.where(col("doc_id") % 97 === 0)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("nt"))
      .collect().filter(_.getInt(1) >= 5).map(_.getLong(0) + 2000000L).toSet
    assert(expected.nonEmpty, "fixture must plant at least one leak")
    assert(expected.subsetOf(flagged),
      s"missed planted leaks: ${(expected -- flagged).take(5)}")
  }

  test("dc1: a leaked copy's shared-ngram count equals its source's 5-gram count") {
    val docs = Queries.t(spark, dir, "documents")
    val srcGrams = docs.where(col("doc_id") % 97 === 0)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.shingles(col("text"), 5)).as("ng"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Queries.dc1Decontaminate(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    srcGrams.filter(_._2 > 0).foreach { case (id, ng) =>
      val copyId = id + 2000000L
      assert(out.contains(copyId) && out(copyId) >= ng,
        s"copy $copyId shares >= $ng ngrams with its source, saw ${out.get(copyId)}")
    }
  }

  test("sp1: split assignment is total, deterministic, and ~80/10/10") {
    val out = Queries.sp1HashSplit(spark, dir).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Queries.t(spark, dir, "documents").count()
    assert(total == nDocs, "every document lands in exactly one split")
    val bySplit = out.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // md5 buckets are uniform; 500 docs give ~80/10/10 with slack
    assert(bySplit("train") > nDocs * 7 / 10 && bySplit("train") < nDocs * 9 / 10)
    // determinism: a second run is bit-identical
    val again = Queries.sp1HashSplit(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("t7: metrics match hand-computed values on a tiny frame") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_t7").toString
    Seq(
      (1L, "a a a a b", "en", "s", 9L),
      (2L, "one two three four", "en", "s", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Queries.t7Repetition(spark, tmp)
      .orderBy("doc_id").collect()
    // doc 1: 5 tokens, 2 distinct, top 'a' x4 -> dup 0.6, top 0.8, repetitive
    assert(out(0).getAs[Long]("n_toks") == 5L)
    assert(out(0).getAs[Double]("dup_token_ratio") == 0.6)
    assert(out(0).getAs[Double]("top_token_frac") == 0.8)
    assert(out(0).getAs[Boolean]("repetitive"))
    // doc 2: all distinct -> dup 0.0, top 0.25, clean
    assert(out(1).getAs[Double]("dup_token_ratio") == 0.0)
    assert(out(1).getAs[Double]("top_token_frac") == 0.25)
    assert(!out(1).getAs[Boolean]("repetitive"))
  }

  test("sp2: exact per-stratum quotas, deterministic selection") {
    val docs = Queries.t(spark, dir, "documents")
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Queries.sp2StratifiedSample(spark, dir).collect()
    val kept = out.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.length.toLong).toMap
    perLang.foreach { case (lang, n) =>
      assert(kept.getOrElse(lang, 0L) == (n + 9) / 10,
        s"stratum $lang: expected ceil($n/10), got ${kept.get(lang)}")
    }
    val again = Queries.sp2StratifiedSample(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("p11: HLL estimate is within the gated 5% of the exact count") {
    val r = Queries.p11ApproxDistinct(spark, dir).head()
    assert(r.getAs[Boolean]("approx_within_5pct"),
      s"sketch drifted beyond 5% of ${r.getAs[Long]("exact_custkeys")}")
  }

  test("dc2: bloom-prefiltered result is row-identical to dc1's exact join") {
    val exact = Queries.dc1Decontaminate(spark, dir).collect().map(_.toSeq).toSet
    val bloom = Queries.dc2DecontaminateBloom(spark, dir).collect().map(_.toSeq).toSet
    assert(exact.nonEmpty && bloom == exact,
      s"bloom variant diverged: only-dc1=${(exact -- bloom).take(3)} only-dc2=${(bloom -- exact).take(3)}")
  }

  test("sp3: shuffle order is a permutation, reproducible, and != id order") {
    val out = Queries.sp3ShuffleOrder(spark, dir).collect()
    val n = out.length
    assert(out.map(_.getLong(1)).toSet == (1L to n).toSet, "ranks must be 1..n")
    val again = Queries.sp3ShuffleOrder(spark, dir).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq, "must be reproducible")
    val idOrder = out.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(!idOrder.zip(idOrder.drop(1)).forall { case (a, b) => a < b },
      "hash order must actually permute the id order")
  }

  test("mix1: every stratum's copies total exactly the largest stratum's size") {
    val out = Queries.mix1BalanceUpsample(spark, dir)
    val perLang = out.groupBy(col("lang"))
      .agg(sum(col("n_copies")).as("tot"), count(lit(1)).as("n"))
      .collect()
    val t = perLang.map(_.getAs[Long]("n")).max
    perLang.foreach { r =>
      assert(r.getAs[Long]("tot") == t,
        s"lang ${r.getString(0)}: copies ${r.getAs[Long]("tot")} != target $t")
    }
    assert(out.agg(min(col("n_copies"))).head().getLong(0) >= 1L,
      "every doc must survive mixing at least once")
  }

  test("sq1: chunked prefix sum equals the naive global window, any chunk width") {
    import graft.operators.SequencePack
    import org.apache.spark.sql.expressions.Window
    val docs = Queries.t(spark, dir, "documents").select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    val wAll = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naiveAssign = docs
      .withColumn("__b", coalesce(sum(col("tok")).over(wAll), lit(0L)))
      .selectExpr("doc_id", "__b div 2048L AS seq_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (width <- Seq(7L, 64L, 1024L, 1000000L)) {
      val got = SequencePack.packAssignments(docs, "doc_id", "tok", 2048L, width)
        .select("doc_id", "seq_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naiveAssign, s"chunkWidth=$width diverges from global window")
    }
  }

  test("sp5: systematic sample — ~k rows, weight-proportional, deterministic, chunk-invariant") {
    import graft.operators.SequencePack
    import spark.implicits._
    // heavy doc 42 has half the total mass -> must always be selected
    val docs = ((1L to 100L).map(i => (i, 10L)) :+ (42L, 990L)).toDF("id", "w")
      .groupBy("id").agg(sum(col("w")).as("w"))
    val out = SequencePack.systematicSample(docs, "id", "w", k = 10L)
      .collect().map(r => r.getLong(0)).sorted
    // doc 42 absorbs ~5 stride crossings but is emitted once, so the row
    // count drops below k exactly by the absorbed crossings
    assert(out.length >= 5 && out.length <= 11, s"got ${out.length}")
    assert(out.contains(42L), "the dominant-weight row must be selected")
    // uniform weights: exactly k rows
    val uniform = (1L to 100L).map(i => (i, 10L)).toDF("id", "w")
    assert(SequencePack.systematicSample(uniform, "id", "w", k = 10L)
      .count() == 10L)
    // deterministic and chunk-width-invariant
    val again = SequencePack.systematicSample(docs, "id", "w", k = 10L)
      .collect().map(r => r.getLong(0)).sorted
    val other = SequencePack.systematicSample(docs, "id", "w", k = 10L,
        chunkWidth = 7L)
      .collect().map(r => r.getLong(0)).sorted
    assert(out.toSeq == again.toSeq && out.toSeq == other.toSeq)
    // zero-weight rows are never selected
    val withZero = ((1L to 5L).map(i => (i, 0L)) :+ (9L, 50L)).toDF("id", "w")
    val z = SequencePack.systematicSample(withZero, "id", "w", k = 3L)
      .collect().map(r => r.getLong(0)).toSet
    assert(z == Set(9L))
  }

  test("sq1: manifest conserves docs and tokens; budget crossed only at doc granularity") {
    val docs = Queries.t(spark, dir, "documents").select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    val totals = docs.agg(count(lit(1)), sum(col("tok"))).head()
    val m = Queries.sq1SequencePack(spark, dir)
    val mt = m.agg(sum(col("n_docs")), sum(col("seq_tokens"))).head()
    assert(mt.getLong(0) == totals.getLong(0) && mt.getLong(1) == totals.getLong(1))
    // every sequence but possibly the last starts because the previous one
    // reached the budget: prior cumulative tokens >= 2048 * seq_id
    val rows = m.orderBy(col("seq_id")).collect()
    var cum = 0L
    rows.foreach { r =>
      assert(cum >= 2048L * r.getAs[Long]("seq_id") || r.getAs[Long]("seq_id") == 0L,
        s"gap before seq ${r.getAs[Long]("seq_id")}")
      cum += r.getAs[Long]("seq_tokens")
    }
  }
}
