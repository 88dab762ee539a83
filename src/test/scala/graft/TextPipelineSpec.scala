package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextPipeline

/** Round-6 corpus-prep operators: PII redaction, duplicated-line stats,
  * bigram-LM scoring, sliding chunks, incremental dedup, token budgets.
  */
class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("redactPii scrubs emails, phones and IPs and is idempotent") {
    val df = Seq(
      (1L, "mail me at a.b+c@sub.example.org or call 555-1234 from 10.0.0.1"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.co and ip 192.168.1.255")).toDF("id", "text")
    val once = df.select(col("id"), TextPipeline.redactPii(col("text")).as("r"))
    val rows = once.orderBy("id").as[(Long, String)].collect()
    assert(rows(0)._2 == "mail me at <EMAIL> or call <PHONE> from <IP>")
    assert(rows(1)._2 == "no pii here at all")
    assert(rows(2)._2 == "two mails <EMAIL> <EMAIL> and ip <IP>")
    val twice = once.select(col("id"), TextPipeline.redactPii(col("r")).as("r"))
    assert(twice.orderBy("id").as[(Long, String)].collect().toSeq ==
      rows.toSeq)
    val (ne, np, ni) = TextPipeline.piiCounts(col("text"))
    val counts = df.select(col("id"), ne.as("e"), np.as("p"), ni.as("i"))
      .orderBy("id").as[(Long, Int, Int, Int)].collect()
    assert(counts.toSeq == Seq((1L, 1, 1, 1), (2L, 0, 0, 0), (3L, 2, 0, 1)))
  }

  test("domainFilter drops blocklisted domains, keeps url-less docs") {
    val df = Seq(
      (1L, "visit http://spam.example.com/x now"),
      (2L, "see https://good.example.org/page"),
      (3L, "no url at all")).toDF("doc_id", "text")
    val out = TextPipeline.domainFilter(df, "text", Seq("spam.example.com"))
      .select("doc_id", "domain").as[(Long, Option[String])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((2L, Some("good.example.org")), (3L, None)))
  }

  test("tokenLines partitions the token sequence exactly") {
    val df = Seq((1L, (1 to 25).map(i => s"w$i").mkString(" "))).toDF("id", "text")
    val lines = df.select(TextPipeline.tokenLines(col("text"), 10).as("ls"))
      .as[Seq[String]].head()
    assert(lines.size == 3)
    assert(lines.flatMap(_.split(" ")) == (1 to 25).map(i => s"w$i"))
    assert(lines(2) == (21 to 25).map(i => s"w$i").mkString(" "))
  }

  test("dupLineStats flags cross-doc duplicate lines only") {
    // docs 1 and 2 share their first 10-token line; doc 3 is unique
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, shared + " " + (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (1 to 10).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextPipeline.dupLineStats(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "dup_line_frac", "line_dup_flag")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 2L, 0.5, true), (2L, 2L, 0.5, true), (3L, 2L, 0.0, false)))
  }

  test("dedupLinesRewrite keeps only the canonical occurrence of duplicated lines") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val aTail = (1 to 10).map(i => s"a$i").mkString(" ")
    val df = Seq(
      (1L, shared + " " + aTail),  // owns the canonical copy of `shared`
      (2L, shared + " " + shared), // both copies lose to doc 1's pos 0
      (3L, aTail)                  // tail line canonical in doc 1 (pos 1)
    ).toDF("doc_id", "text")
    val out = TextPipeline.dedupLinesRewrite(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_lines", "n_removed")
      .as[(Long, String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, shared + " " + aTail, 2L, 0L),
      (2L, "", 2L, 2L),
      (3L, "", 1L, 1L)))
  }

  test("dupSpanStats counts overlapping duplicated windows, incl. within-doc repeats") {
    // doc 1 repeats its own 6-gram (positions 1 and 7 both start
    // "r1..r6"); doc 2 shares doc 1's repeated 6-gram once; doc 3 is
    // unique; doc 4 is SHORTER than one span and must vanish, not blow up
    val rep = (1 to 6).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (1L, rep + " " + rep),                                  // 7 spans, all dup
      (2L, rep + " " + (1 to 6).map(i => s"b$i").mkString(" ")), // span 1 dup
      (3L, (1 to 12).map(i => s"c$i").mkString(" ")),
      (4L, "too short")).toDF("doc_id", "text")
    val out = TextPipeline.dupSpanStats(df, "doc_id", "text", k = 6)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // doc 1: 12 toks -> 7 spans; positions 1 and 7 are both "r1..r6"
    // (3 occurrences corpus-wide with doc 2's first span); the straddling
    // windows pos 2-6 are each unique
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(1L)._2 == 7L && m(1L)._3 == 2L)
    assert(m(2L)._2 == 7L && m(2L)._3 == 1L)
    assert(m(3L)._2 == 7L && m(3L)._3 == 0L && m(3L)._4 == 0.0)
  }

  test("repeatCapMixture: caps bind, budget exact, degenerates to mix3") {
    // three domains: tiny (will cap under the temperature), medium, large
    def doc(st: String, words: Int, n: Int) =
      (0 until n).map(i => (st, (1 to words).map(j => s"w$j").mkString(" ")))
    val df = (doc("a", 10, 2) ++ doc("b", 40, 10) ++ doc("c", 50, 40))
      .toDF("stratum", "text")
      .select(col("stratum"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("n_tokens"))
    // sizes: a=20, b=400, c=2000; budget=self=2420; maxEpochs=2
    val out = TextPipeline.repeatCapMixture(df, "stratum", col("n_tokens"),
        maxEpochs = 2)
      .orderBy("stratum")
      .select("stratum", "stratum_size", "cap", "capped", "alloc")
      .as[(String, Long, Long, Boolean, Long)].collect()
    val m = out.map(r => r._1 -> r).toMap
    assert(out.map(_._2).sum == 2420L)
    assert(out.map(_._5).sum == 2420L, "allocations must sum to the budget")
    out.foreach { r => assert(r._5 <= r._3, s"alloc over cap: $r") }
    // √size shares: a's ideal ≈ 2420·√20/(√20+√400+√2000) ≈ 157 > cap 40
    assert(m("a")._4 && m("a")._5 == 40L, "tiny domain must cap at 2 epochs")
    assert(!m("c")._4, "large domain absorbs the remainder uncapped")
    // with a cap that can never bind, the allocation IS mix3's
    val noCap = TextPipeline.repeatCapMixture(df, "stratum", col("n_tokens"),
        maxEpochs = 1000000, budget = 1000L)
      .orderBy("stratum").select("stratum", "alloc")
      .as[(String, Long)].collect().toMap
    val mix3 = TextPipeline.temperatureMixture(df, "stratum",
        col("n_tokens"), budget = 1000L)
      .orderBy("stratum").select("stratum", "alloc")
      .as[(String, Long)].collect().toMap
    assert(noCap == mix3)
  }

  test("gopherGates: hand-computed ratios and threshold semantics") {
    val df = Seq(
      (1L, "the cat sat on the mat and slept"),   // 8 words, all gates pass
      (2L, "## ### #... x1 y2"),                  // fails length+symbol+alpha
      (3L, "a bb cc dd ee the of"),               // mwl 2.0 -> fails length only
      (4L, "supercalifragilistic expialidocious the of"), // mwl 9.75 passes
      (5L, "the something otherwords here now")   // exactly ONE stopword
    ).toDF("doc_id", "text")
    val out = TextPipeline.gopherGates(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double, Long, Boolean)].collect()
    assert(out(0) == ((1L, 8L, 3.125, 0.0, 1.0, 2L, true)))
    assert(out(1) == ((2L, 5L, 2.6, 1.4, 0.4, 0L, false)))
    assert(out(2)._3 == 2.0 && !out(2)._7 && out(2)._6 == 2L)
    assert(out(3) == ((4L, 4L, 9.75, 0.0, 1.0, 2L, true)))
    // Gopher default needs >= 2 stopwords; the relaxed corpus contract
    // (minStopwords = 1) admits doc 5
    assert(out(4)._6 == 1L && !out(4)._7)
    val relaxed = TextPipeline.gopherGates(df, "doc_id", "text", minStopwords = 1)
      .orderBy("doc_id").select("keep").as[Boolean].collect()
    assert(relaxed.toSeq == Seq(true, false, false, true, true))
  }

  test("dedupSpansRewrite erases non-canonical spans with interval-union overlap") {
    val words = (1 to 14).map(i => s"w$i").mkString(" ")
    val rep = (1 to 7).map(i => s"r$i").mkString(" ")
    val tail = "t1 t2 t3"
    val df = Seq(
      (1L, words),                 // canonical owner of every shared span
      (2L, words),                 // whole-doc copy -> must reassemble to ''
      (3L, rep + " " + rep),       // internal repeat: exactly one copy survives
      (4L, "too short"),           // < k tokens: no spans, untouched
      (5L, (1 to 12).map(i => s"u$i").mkString(" ")), // unique, untouched
      (6L, (1 to 8).map(i => s"w$i").mkString(" ") + " " + tail) // partial overlap
    ).toDF("doc_id", "text")
    val out = TextPipeline.dedupSpansRewrite(df, "doc_id", "text", k = 6)
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_tokens", "n_removed")
      .as[(Long, String, Long, Long)].collect()
    val m = out.map(r => r._1 -> r).toMap
    assert(out.length == 6)
    // canonical occurrences survive; the whole-doc copy is fully erased
    assert(m(1L) == ((1L, words, 14L, 0L)))
    assert(m(2L) == ((2L, "", 14L, 14L)))
    // internal repeat: non-canonical windows at pos 8 (r1..r6) and 9
    // (r2..r7) union to positions 8-14 -> one clean copy remains
    assert(m(3L) == ((3L, rep, 14L, 7L)))
    assert(m(4L) == ((4L, "too short", 2L, 0L)))
    assert(m(5L)._4 == 0L && m(5L)._2 == m(5L)._2)
    // partial overlap: prefix windows pos 1-3 are duplicated (doc 1 owns
    // them), covering tokens 1-8; the straddling windows are unique, so
    // the tail survives exactly
    assert(m(6L) == ((6L, tail, 11L, 8L)))
    // stats consistency: zero-removal docs are byte-identical, and kept
    // token counts reconcile with n_tokens - n_removed
    out.foreach { case (_, ct, nt, nr) =>
      val kept = if (ct.isEmpty) 0 else ct.split(" ").length
      assert(kept == nt - nr)
    }
  }

  test("dsirSelect == local two-model replay incl. unseen target bigrams") {
    val docs = Seq(
      (1L, "a b a b c", "en"),
      (2L, "a b x y", "de"),  // "x y" and head "x" unseen in target
      (3L, "q r q r", "de"))  // fully unseen in target
    val out = TextPipeline.dsirSelect(docs.toDF("doc_id", "text", "lang"),
        "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect()

    // local replay with the same IEEE arithmetic
    def bigrams(t: String) = t.split(" ").sliding(2).map(_.mkString(" ")).toList
    val all = docs.flatMap { case (id, t, _) => bigrams(t).map(id -> _) }
    val tgtB = docs.filter(_._3 == "en").flatMap { case (_, t, _) => bigrams(t) }
    val tc2 = tgtB.groupBy(identity).map { case (k, v) => k -> v.size }
    val tc1 = tgtB.groupBy(_.split(" ").head).map { case (k, v) => k -> v.size }
    val rb = all.map(_._2)
    val rc2 = rb.groupBy(identity).map { case (k, v) => k -> v.size }
    val rc1 = rb.groupBy(_.split(" ").head).map { case (k, v) => k -> v.size }
    val tvv = docs.filter(_._3 == "en").flatMap(_._2.split(" ")).distinct.size
    val rvv = docs.flatMap(_._2.split(" ")).distinct.size
    def q(c2: Int, c1: Int, v: Int): Long =
      math.floor((c2 + 1).toDouble / (c1 + v).toDouble * 1e9 + 0.5).toLong
    val expect = all.groupBy(_._1).map { case (id, bs) =>
      val qt = bs.map { case (_, bg) =>
        q(tc2.getOrElse(bg, 0), tc1.getOrElse(bg.split(" ").head, 0), tvv) }.sum
      val qr = bs.map { case (_, bg) =>
        q(rc2(bg), rc1(bg.split(" ").head), rvv) }.sum
      id -> (bs.size.toLong, qt, qr, qt > qr)
    }
    assert(out.length == 3)
    out.foreach { case (id, n, qt, qr, sel) =>
      assert(expect(id) == ((n, qt, qr, sel)), s"doc $id")
    }
    // the en doc must self-select (doc 3's flag is fixture-dependent: a
    // 3-token target vocab gives unseen bigrams a HIGH Laplace floor 1/V,
    // which is exactly why real selections train on large target sets)
    assert(out.find(_._1 == 1L).get._5)
  }

  test("bigramLmScore matches a hand-computed Laplace bigram model") {
    // corpus: "a b a b" and "a b c"; bigrams: (a b)x3, (b a)x1, (b c)x1
    // heads: a->3, b->2; vocab V=3
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextPipeline.bigramLmScore(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "lm_score").as[(Long, Long, Double)].collect()
    def q(c2: Long, c1: Long): Long =
      math.floor((c2 + 1).toDouble / (c1 + 3).toDouble * 1e9 + 0.5).toLong
    // doc1: p(a b)=4/6 twice, p(b a)=2/5 once
    val d1 = (2 * q(3, 3) + q(1, 2)).toDouble / 3.0 / 1e9
    // doc2: p(a b)=4/6, p(b c)=2/5
    val d2 = (q(3, 3) + q(1, 2)).toDouble / 2.0 / 1e9
    assert(out.toSeq == Seq((1L, 3L, d1), (2L, 2L, d2)))
  }

  test("slidingChunks covers every token with bounded overlap") {
    for (n <- Seq(1, 47, 48, 64, 65, 100, 200)) {
      val df = Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
      val out = TextPipeline.slidingChunks(df, "doc_id", "text", window = 64, stride = 48)
        .orderBy("chunk_idx")
        .select("chunk_idx", "n_chunk_tokens").as[(Long, Long)].collect()
      assert(out.length == (n + 47) / 48, s"n=$n")
      out.zipWithIndex.foreach { case ((k, sz), i) =>
        assert(k == i)
        assert(sz == math.min(64, n - i * 48), s"n=$n k=$k")
      }
      // windows at stride 48 cover [0, n): last start + its size >= n
      val (lastK, lastSz) = out.last
      assert(lastK * 48 + lastSz == n)
    }
  }

  test("incrementalDedup drops indexed fps and collapses within-batch dups") {
    val existing = Seq((10L, "alpha beta"), (11L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "Alpha, beta!"),      // same fingerprint as doc 10 -> dropped
      (21L, "fresh content one"), // survives
      (22L, "fresh content one"), // within-batch dup of 21 -> collapsed
      (23L, "fresh content two")  // survives
    ).toDF("doc_id", "text")
    val index = TextPipeline.fingerprints(existing, "doc_id", "text")
    val out = TextPipeline.incrementalDedup(batch, "doc_id", "text", index)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(21L, 23L))
  }

  test("incrementalDedup against a BUCKETED index keeps the index side exchange-free") {
    // The 100 TB shape: the corpus fingerprint index is pre-bucketed on fp,
    // so the anti-join shuffles ONLY the (small) new batch into the index's
    // bucketing — the index is never moved. Broadcast is disabled to model
    // an index far past the broadcast ceiling.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan tree for the walk below
    try {
      val corpus = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      graft.sources.Bucketing.writeBucketed(
        TextPipeline.fingerprints(corpus, "doc_id", "text").select("fp"),
        "nd_fp_index", "fp", 8, Some("fp"))
      val batch = corpus.select(col("doc_id"), col("text"))
        .where(col("doc_id") < 40)
        .withColumn("doc_id", col("doc_id") + 5000000L)
        .unionAll(Seq((9000001L, "genuinely new content one"),
          (9000002L, "genuinely new content two")).toDF("doc_id", "text"))
      val out = TextPipeline.incrementalDedup(
        batch, "doc_id", "text", spark.table("nd_fp_index"))
      // no shuffle may sit ABOVE the bucketed index scan (batch-side
      // shuffles are fine — that side is the small one by construction)
      val plan = out.queryExecution.executedPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val shufflesOverIndex = plan.collect {
        case e: ShuffleExchangeExec if e.exists {
          case s: FileSourceScanExec =>
            s.tableIdentifier.exists(_.table == "nd_fp_index")
          case _ => false
        } => e
      }
      assert(shufflesOverIndex.isEmpty,
        s"index side got shuffled:\n$plan")
      assert(plan.exists { case _: ShuffleExchangeExec => true; case _ => false },
        "sanity: the batch side should shuffle into the index's bucketing")
      // all 40 resubmissions drop; only the two genuinely-new docs survive
      assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
        Seq(9000001L, 9000002L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS nd_fp_index")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("tokenBudgetSelect equals the plain per-stratum window running sum") {
    import org.apache.spark.sql.expressions.Window
    val docs = SparkTestSession.spark.read
      .parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select(col("lang"), col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    val budget = 1500L
    val chunked = TextPipeline.tokenBudgetSelect(docs, "lang", "doc_id", "tok", budget)
      .select("lang", "doc_id", "tok", "cum_before")
    val h = md5(concat(lit("mix2:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(h, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val plain = docs
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .where(col("cum_before") < budget)
      .select("lang", "doc_id", "tok", "cum_before")
    assert(chunked.exceptAll(plain).isEmpty && plain.exceptAll(chunked).isEmpty)
    // every stratum's selection is within one doc of the budget
    val maxPer = chunked.groupBy("lang").agg(max(col("cum_before")).as("m"))
      .as[(String, Long)].collect()
    assert(maxPer.nonEmpty && maxPer.forall(_._2 < budget))
  }

  test("temperatureMixture sums to the budget and flattens toward small domains") {
    import spark.implicits._
    val docs = spark.read
      .parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val budget = 100000L
    val mix = TextPipeline.temperatureMixture(docs, "lang", col("n_chars"), budget)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(mix.map(_._5).sum == budget, "allocations must sum exactly to the budget")
    assert(mix.forall(_._5 >= 0))
    // α=0.5 flattening: the smallest stratum's allocation share strictly
    // exceeds its raw size share; the largest stratum's falls below it
    val totSize = mix.map(_._3).sum.toDouble
    val small = mix.minBy(_._3)
    val large = mix.maxBy(_._3)
    assert(small._3 < large._3, "fixture sanity: strata must differ in size")
    assert(small._5.toDouble / budget > small._3 / totSize)
    assert(large._5.toDouble / budget < large._3 / totSize)
    // a domain with a larger weight never allocates more than one unit
    // below a smaller-weighted one (floor share + single remainder unit)
    val byW = mix.sortBy(_._4)
    byW.sliding(2).foreach {
      case Array(lo, hi) => assert(hi._5 >= lo._5 - 1)
      case _ =>
    }
  }

  test("qualityBuckets equals ntile over (lm_score DESC, id) at any corpus size") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = spark.read
      .parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val got = TextPipeline.qualityBuckets(docs, "doc_id", "text", nBuckets = 3)
    // reference: the single-window ntile formulation on the same scores
    val scored = TextPipeline.bigramLmScore(docs, "doc_id", "text")
    val w = Window.orderBy(col("lm_score").desc, col("doc_id").asc)
    val ref = scored.select(col("doc_id"), col("lm_score"),
      element_at(array(lit("head"), lit("middle"), lit("tail")),
        ntile(3).over(w)).as("bucket"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    // tiers are equal-size to within one doc
    val sizes = got.groupBy("bucket").count().as[(String, Long)].collect().toMap
    assert(sizes.keySet == Set("head", "middle", "tail"))
    assert(sizes.values.max - sizes.values.min <= 1)
    // head really is the best-scoring tier
    val minHead = got.where(col("bucket") === "head")
      .agg(min(col("lm_score"))).as[Double].head()
    val maxTail = got.where(col("bucket") === "tail")
      .agg(max(col("lm_score"))).as[Double].head()
    assert(minHead >= maxTail)
  }

  test("canonicalizeUrl: case, ports, fragments, tracking, param order") {
    import spark.implicits._
    val cases = Seq(
      ("HTTP://Example.COM:80/Path/X?b=2&utm_source=f&a=1#frag",
        "http://example.com/Path/X?a=1&b=2"),
      ("https://Host.COM:443", "https://host.com/"),
      ("https://host.com:8080/p", "https://host.com:8080/p"),
      ("http://h/p?utm_source=x&fbclid=y&gclid=z", "http://h/p"),
      ("http://h/p?z=1&y=2&z=0", "http://h/p?y=2&z=0&z=1"),
      ("ftp://Mixed.Case/file", "ftp://mixed.case/file"),
      ("not a url at all", "not a url at all"),
      ("http://h#only-fragment", "http://h/"))
    val got = cases.map(_._1).toDF("u")
      .select(TextPipeline.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
  }

  test("canonical equality merges raw-distinct crawl URLs") {
    import spark.implicits._
    val raw = Seq(
      "HTTP://site.com:80/a?b=2&utm_source=feed&a=1#top",
      "http://Site.com/a?a=1&utm_campaign=z&b=2",
      "http://site.com/other")
    val canon = raw.toDF("u")
      .select(TextPipeline.canonicalizeUrl(col("u")).as("c"))
      .groupBy("c").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(canon == Map("http://site.com/a?a=1&b=2" -> 2L,
      "http://site.com/other" -> 1L))
  }

  test("collocations: rational PMI lift, counts and tie-break by hand") {
    import spark.implicits._
    val docs = Seq((1L, "new york new york"), (2L, "in new york"))
      .toDF("doc_id", "text")
    val out = TextPipeline.collocations(docs, "text", minCount = 1L,
        topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    // W = 7 tokens, B = 5 bigrams; counts: new 3, york 3, in 1
    // lift(new york)  = 3*49/(5*9)  = 3.266667
    // lift(in new)    = 1*49/(5*3)  = 3.266667  (tie -> (w1,w2) order)
    // lift(york new)  = 1*49/(5*9)  = 1.088889
    assert(out.toSeq == Seq(
      ("in", "new", 1L, 1L, 3L, 3.266667),
      ("new", "york", 3L, 3L, 3L, 3.266667),
      ("york", "new", 1L, 3L, 3L, 1.088889)))
  }

  test("sentences: segmentation, trimming, terminator grouping, empties dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One two. Three!  Four five?!"),
      (2L, "no terminator at all"),
      (3L, "..."))
      .toDF("doc_id", "text")
    val out = TextPipeline.sentences(docs, "doc_id", "text")
      .orderBy("doc_id", "sent_idx")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "One two.", 2L), (1L, "Three!", 1L), (1L, "Four five?!", 2L),
      (2L, "no terminator at all", 4L)))
  }

  test("readability: counts and Flesch by hand; simpler text scores higher") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran."),
      (2L, "Extraordinarily sophisticated terminology demonstrates incomprehensibility."))
      .toDF("doc_id", "text")
    val out = TextPipeline.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1: 6 words, 2 sentences, vowel groups: e/a/a/e/o/a = 6
    assert(out(1L)._1 == 6L && out(1L)._2 == 2L && out(1L)._3 == 6L)
    val flesch1 = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert(math.abs(out(1L)._4 - flesch1) < 1e-6)
    assert(out(1L)._4 > out(2L)._4)
  }

  test("collocations: minCount prunes singleton bigrams") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c d")).toDF("doc_id", "text")
    val out = TextPipeline.collocations(docs, "text", minCount = 2L,
      topK = 10).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"))) // "b a", "b c", "c d" occur once
  }
}
