package graft

import graft.functions.{BpeVocab, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The BPE kernel's contract: canonical lowest-rank-first greedy merging,
  * its equivalence to the oracle's ascending-rank exhaustive replay, and
  * the committed-fixture pins the tok1/mix2b/sq1b rows hash against.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val table = BpeVocab.tableFor(BpeVocab.Fixture)

  /** Ascending-rank exhaustive application — the DuckDB oracle's algorithm
    * (each merge applied left-to-right until no occurrence remains, merges
    * in rank order). The kernel runs lowest-rank-first greedy; over a valid
    * table both reach the same fixed point.
    */
  private def ascendingRank(word: String): Array[String] = {
    var toks = word.map(_.toString).toArray
    BpeVocab.Fixture.foreach { case (a, b) =>
      var changed = true
      while (changed) {
        changed = false
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2; changed = true
          } else { out += toks(i); i += 1 }
        }
        toks = out.toArray
      }
    }
    toks
  }

  test("fixture pins: trained counts on corpus words") {
    // expected values from the training run (tokens per word)
    val expected = Map(
      "window" -> 1, "customer" -> 5, "query" -> 1, "scan" -> 1,
      "spark" -> 3, "the" -> 3, "a" -> 1, "vector" -> 2, "stream" -> 5,
      "agg" -> 1, "dup" -> 2)
    expected.foreach { case (w, n) =>
      assert(BpeVocab.tokenizeWord(table, w).length == n, s"word=$w")
    }
    // tokens concatenate back to the word
    Seq("customer", "window", "stream", "filter").foreach { w =>
      assert(BpeVocab.tokenizeWord(table, w).mkString == w)
    }
  }

  test("lowest-rank-first == ascending-rank exhaustive on arbitrary words") {
    val alpha = "abcdefghijklmnopqrstuvwy"
    val wordGen = Gen.choose(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))
    (0 until 400).foreach { i =>
      val w = wordGen(Gen.Parameters.default, org.scalacheck.rng.Seed(7L + i))
        .getOrElse("")
      val greedy = BpeVocab.tokenizeWord(table, w).toSeq
      val asc = ascendingRank(w).toSeq
      assert(greedy == asc, s"word=$w greedy=$greedy asc=$asc")
      assert(greedy.mkString == w)
    }
  }

  test("expression: count and tokens agree; split contract matches trim/\\s+") {
    val df = Seq(
      (1L, "window customer scan"),
      (2L, "  spark\tquery  "), // tabs survive sql trim (spaces only)
      (3L, ""),
      (4L, "zzz qqq")) // untrained chars stay per-char
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).as("n"),
        size(TextFunctions.bpeTokens(col("text"))).cast("long").as("nt"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    out.foreach { case (id, n, nt) => assert(n == nt, s"doc $id") }
    // window=1, customer=5, scan=1
    assert(out(0)._2 == 7)
    // "" -> [""] -> 0 tokens
    assert(out(2)._2 == 0)
    // zzz (3 chars, no merges) + qqq (q+q+q: merge (q,u) never fires) = 6
    assert(out(3)._2 == 6)
    // null text -> null count
    val n = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(TextFunctions.bpeTokenCount(col("text"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("table validation rejects invalid merge tables") {
    intercept[IllegalArgumentException] {
      BpeVocab.tableFor(Seq(("ab", "c"))) // "ab" never produced
    }
    intercept[IllegalArgumentException] {
      BpeVocab.tableFor(Seq(("a", "b"), ("a", "b"))) // duplicate pair
    }
    // valid: component produced by an earlier merge
    BpeVocab.tableFor(Seq(("a", "b"), ("ab", "c")))
  }

  test("in-engine trainer reproduces the committed fixture from the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val trained = BpeVocab.train(docs, "text", numMerges = 48)
    assert(trained == BpeVocab.Fixture)
  }

  test("NFC: composed and decomposed forms tokenize identically") {
    val empty = BpeVocab.tableFor(Nil)
    val composed = "café"          // é as U+00E9
    val decomposed = "café"       // e + combining acute
    assert(composed != decomposed)      // genuinely different code units
    val a = BpeVocab.tokenizeWord(empty, composed).toSeq
    val b = BpeVocab.tokenizeWord(empty, decomposed).toSeq
    assert(a == b && a.size == 4, s"a=$a b=$b") // c a f é — not 5
    // merges land on the NORMALIZED stream: a merge written in composed
    // form fires on decomposed input too
    val t2 = BpeVocab.tableFor(Seq(("f", "é")))
    assert(BpeVocab.tokenizeWord(t2, decomposed).toSeq == Seq("c", "a", "fé"))
    // count expression sees the same equivalence end to end
    val df = Seq((1L, s"$composed $decomposed")).toDF("id", "text")
    val n = df.select(BpeVocab.bpeTokenCount(col("text"), Nil).as("n"))
      .as[Long].head()
    assert(n == 8)
  }

  test("CJK / unsegmented scripts: code-point fallback, merges reduce fertility") {
    val empty = BpeVocab.tableFor(Nil)
    val cjk = "日本語テキスト" // 日本語テキスト
    // no whitespace -> one word; empty table -> one token per code point
    assert(BpeVocab.tokenizeWord(empty, cjk).length == 7)
    // an astral-plane char (surrogate pair) is ONE code point, not two
    val astral = "a😀b" // a 😀 b
    assert(BpeVocab.tokenizeWord(empty, astral).toSeq ==
      Seq("a", "😀", "b"))
    // a trained CJK merge fires like any other
    val t = BpeVocab.tableFor(Seq(("日", "本")))
    val toks = BpeVocab.tokenizeWord(t, cjk)
    assert(toks.length == 6 && toks(0) == "日本")
    // mixed-script doc: whitespace words tokenize independently
    val df = Seq((1L, s"hello $cjk world")).toDF("id", "text")
    val n = df.select(BpeVocab.bpeTokenCount(col("text"), Nil).as("n"))
      .as[Long].head()
    assert(n == 5L + 7L + 5L)
  }

  test("empty merge table tokenizes to code points") {
    val t0 = BpeVocab.tableFor(Nil)
    assert(BpeVocab.tokenizeWord(t0, "abc").toSeq == Seq("a", "b", "c"))
  }

  test("corpus BPE/ws ratio is non-degenerate under the fixture") {
    val dir = "/root/testdata/sf0.001"
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val r = df.select(
        sum(TextFunctions.bpeTokenCount(col("text"))).as("bpe"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("ws"))
      .as[(Long, Long)].collect()(0)
    val ratio = r._1.toDouble / r._2
    assert(ratio > 1.5 && ratio < 4.0, s"ratio=$ratio")
  }
}
