package graft

import graft.operators.Search
import org.scalatest.funsuite.AnyFunSuite

/** [[Search.bm25TopK]] — retrieval semantics and the inverted-index plan. */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val corpus = Seq(
    (1L, "spark spark spark"),             // high tf, short
    (2L, "spark flink beam storm samza"),  // one hit, longer doc
    (3L, "flink beam"),                    // no hits
    (4L, "spark spark flink flink beam beam storm storm samza samza " +
      "spark spark flink flink beam beam storm storm samza samza"), // hits in a long doc
    (5L, "beam beam beam beam"))

  test("docs without query terms never appear; ranking follows tf and length") {
    import spark.implicits._
    val out = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("spark"), topK = 10).collect()
    val ids = out.map(_.getLong(0)).toSeq
    assert(!ids.contains(3L) && !ids.contains(5L))
    // doc 1: tf 3 in dl 3 beats doc 4 (tf 4 in dl 20) and doc 2 (tf 1)
    assert(ids.head == 1L)
    assert(ids.toSet == Set(1L, 2L, 4L))
    // scores strictly ordered, no ties in this fixture
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("multi-term queries sum per-term contributions exactly") {
    import spark.implicits._
    val one = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("spark"), topK = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val other = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("storm"), topK = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val both = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("spark", "storm"), topK = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // quantized sums: per-doc total == sum of single-term scores to 1e-6
    both.foreach { case (id, s) =>
      val expect = one.getOrElse(id, 0.0) + other.getOrElse(id, 0.0)
      assert(math.abs(s - expect) <= 2e-6, s"doc $id: $s vs $expect")
    }
  }

  test("classic ln idf keeps the same ranking on this corpus") {
    import spark.implicits._
    val rational = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("spark", "samza"), topK = 10).collect().map(_.getLong(0)).toSeq
    val classic = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("spark", "samza"), topK = 10, classicLnIdf = true)
      .collect().map(_.getLong(0)).toSeq
    assert(rational == classic)
  }

  test("duplicate query terms do not double-count") {
    import spark.implicits._
    val a = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("spark"), topK = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("spark", "spark"), topK = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("indexed path: bit-equal to the direct computation") {
    import spark.implicits._
    val df = corpus.toDF("id", "text")
    val direct = Search.bm25TopK(df, "id", "text",
      Seq("spark", "beam"), topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val index = Search.buildTermIndex(df, "id", "text")
    val indexed = Search.bm25TopKIndexed(index, Seq("spark", "beam"),
      topK = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed == direct)
    index.close()
  }

  test("index save/load round-trip answers identically") {
    import spark.implicits._
    val df = corpus.toDF("id", "text")
    val built = Search.buildTermIndex(df, "id", "text")
    val lineage = java.nio.file.Files
      .createTempDirectory("graft_bm25").toString
    built.save(lineage)
    val loaded = Search.loadTermIndex(spark, lineage)
    assert((loaded.n, loaded.sumDl) == ((built.n, built.sumDl)))
    def ask(ix: Search.TermIndex) =
      Search.bm25TopKIndexed(ix, Seq("spark", "storm"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ask(loaded) == ask(built))
    built.close(); loaded.close()
  }

  test("plan: token explode is filtered to the query vocabulary pre-shuffle") {
    import spark.implicits._
    val plan = Search.bm25TopK(corpus.toDF("id", "text"), "id", "text",
      Seq("spark"), topK = 10).queryExecution.optimizedPlan.toString
    // the IN filter must sit below the tf aggregate, i.e. appear in the
    // optimized plan at all (Catalyst would have removed it only by
    // folding the explode, which local data does not trigger)
    assert(plan.contains("spark"), plan)
  }
}
