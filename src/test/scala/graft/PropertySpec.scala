package graft

import graft.operators.{Cleaning, Dedup}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5.3): invariants every cleaning operator must
  * hold on arbitrary inputs — the deterministic guarantees the reference's
  * LLM planner could never make.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Option[Double])]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.listOfN(n, for {
        id <- Gen.choose(0, 1000)
        v <- Gen.option(Gen.choose(-1e6, 1e6))
      } yield (id, v))
    }

  /** Raw-scalacheck sampling (no scalatest bridge in the offline cache);
    * few iterations — each sample spins Spark jobs.
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L + i))
        .foreach(body)
    }

  test("slidingChunks covers every token exactly once per stride step, any (n, window, stride)") {
    import graft.operators.TextPipeline
    val gen = for {
      n <- Gen.choose(1, 300)
      window <- Gen.choose(1, 80)
      stride <- Gen.choose(1, window)
    } yield (n, window, stride)
    forAllSampled(gen, n = 6) { case (n, window, stride) =>
      val df = Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
      val out = TextPipeline.slidingChunks(df, "doc_id", "text", window, stride)
        .orderBy("chunk_idx").select("chunk_idx", "n_chunk_tokens")
        .as[(Long, Long)].collect()
      // chunk count, per-chunk size, and tail coverage hold for ANY shape
      assert(out.length == (n + stride - 1) / stride, s"n=$n w=$window s=$stride")
      out.zipWithIndex.foreach { case ((k, sz), i) =>
        assert(k == i && sz == math.min(window, n - i * stride).toLong,
          s"n=$n w=$window s=$stride k=$k")
      }
      val (lastK, lastSz) = out.last
      assert(lastK * stride + lastSz == n)
    }
  }

  test("tokenLines concatenation reconstructs the token stream for any width") {
    import graft.operators.TextPipeline
    val gen = for {
      n <- Gen.choose(1, 200)
      width <- Gen.choose(1, 30)
    } yield (n, width)
    forAllSampled(gen, n = 6) { case (n, width) =>
      val toks = (1 to n).map(i => s"w$i")
      val df = Seq(toks.mkString(" ")).toDF("text")
      val lines = df.select(TextPipeline.tokenLines(col("text"), width).as("ls"))
        .as[Seq[String]].head()
      assert(lines.flatMap(_.split(" ")) == toks, s"n=$n width=$width")
      assert(lines.forall(_.split(" ").length <= width))
      assert(lines.dropRight(1).forall(_.split(" ").length == width))
    }
  }

  test("tokenBudgetSelect emits a prefix of the hash order with cum_before under budget") {
    import graft.operators.TextPipeline
    val gen = for {
      n <- Gen.choose(1, 60)
      budget <- Gen.choose(1L, 400L)
    } yield (n, budget)
    forAllSampled(gen, n = 5) { case (n, budget) =>
      val docs = (0 until n).map(i => (if (i % 2 == 0) "a" else "b", i.toLong,
        (i % 7 + 1).toLong)).toDF("lang", "doc_id", "tok")
      val out = TextPipeline.tokenBudgetSelect(docs, "lang", "doc_id", "tok", budget)
        .select("lang", "doc_id", "cum_before")
        .as[(String, Long, Long)].collect()
      assert(out.forall(_._3 < budget))
      // prefix property: selected ids per stratum == the first k in md5 order
      val byLang = (0 until n).groupBy(i => if (i % 2 == 0) "a" else "b")
      byLang.foreach { case (lang, ids) =>
        def h(i: Int) = {
          val md = java.security.MessageDigest.getInstance("MD5")
          md.digest(s"mix2:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
        val order = ids.sortBy(i => (h(i), i.toLong))
        var cum = 0L
        val expect = order.takeWhile { i =>
          val keep = cum < budget; cum += (i % 7 + 1); keep }.map(_.toLong).toSet
        assert(out.filter(_._1 == lang).map(_._2).toSet == expect,
          s"n=$n budget=$budget lang=$lang")
      }
    }
  }

  test("imputation never changes non-null cells and never adds rows") {
    forAllSampled(rowsGen) { rows =>
      val df = rows.toDF("id", "v")
      for (op <- Seq(Cleaning.imputeMedian(Seq("v")) _, Cleaning.imputeMean(Seq("v")) _)) {
        val out = op(df)
        assert(out.count() == rows.size)
        val joined = df.withColumnRenamed("v", "v0")
          .withColumn("rn", monotonically_increasing_id())
        // non-null cells unchanged: compare multiset of non-null values
        val before = rows.flatMap(_._2).sorted
        val after = out.where(col("v").isNotNull).select("v").as[Double].collect().sorted
        assert(before.forall(after.contains), "non-null values must survive")
      }
    }
  }

  test("3-sigma filter output is a subset of input; idempotent-safe sizes") {
    forAllSampled(rowsGen) { rows =>
      val df = rows.toDF("id", "v")
      val out = Cleaning.zscoreFilter(Seq("v"))(df)
      val n = out.count()
      assert(n <= rows.size)
      // every surviving (id, v) pair existed in the input
      val inSet = rows.toSet
      val survivors = out.as[(Int, Option[Double])].collect()
      assert(survivors.forall(inSet.contains))
    }
  }

  test("dedup is idempotent and keyed-dedup keys are unique") {
    forAllSampled(rowsGen) { rows =>
      val df = rows.toDF("id", "v")
      val d1 = Cleaning.dropDuplicateRows()(df)
      val d2 = Cleaning.dropDuplicateRows()(d1)
      assert(d1.count() == d2.count())
      val byKey = Dedup.exactByKey(df, "id", Seq(col("id")))
      assert(byKey.select("id").distinct().count() == byKey.count())
      assert(byKey.count() == df.select("id").distinct().count())
    }
  }

  test("profile counts are consistent with shape") {
    forAllSampled(rowsGen) { rows =>
      val df = rows.toDF("id", "v")
      val p = graft.profile.Profiler(df)
      assert(p.rowCount == rows.size)
      assert(p.nullCounts("v") == rows.count(_._2.isEmpty))
      assert(p.nullCounts("id") == 0)
      p.numericStats.find(_.column == "v").foreach { s =>
        assert(s.count == rows.count(_._2.nonEmpty))
      }
    }
  }

  test("jaccard kernel == composable formulation on arbitrary token arrays") {
    val arrGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.distinct)
    forAllSampled(Gen.zip(arrGen, arrGen)) { case (a, b) =>
      val df = Seq((a, b)).toDF("x", "y")
      val kernel = df.select(Dedup.jaccard(col("x"), col("y"))).head().getDouble(0)
      val composable = df.select {
        val inter = size(array_intersect(col("x"), col("y"))).cast("double")
        val union = (size(col("x")) + size(col("y"))).cast("double") - inter
        when(union > 0, inter / union).otherwise(lit(0.0))
      }.head().getDouble(0)
      assert(kernel == composable)
    }
  }

  test("langId kernel == composable filter/isin formulation incl. overlaps") {
    import graft.functions.TextFunctions
    // draw from the marker vocabulary (incl. "la", a marker for BOTH es and
    // fr), noise words, and whitespace edge cases
    val wordGen = Gen.oneOf(
      TextFunctions.LangMarkers.values.flatten.toSeq ++
        Seq("xyzzy", "Foo", "BAR", "", " ", "\t", "la", "the", "de"))
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    forAllSampled(textGen, n = 25) { text =>
      val df = Seq(Tuple1(text)).toDF("t")
      val kernel = df.select(TextFunctions.langId(col("t"))).head().getString(0)
      val composable = df
        .select(TextFunctions.langIdFromToks(split(lower(trim(col("t"))), "\\s+")))
        .head().getString(0)
      assert(kernel == composable, s"text=$text")
    }
  }

  test("langId kernel: null text -> \"und\", matching the composable otherwise()") {
    import graft.functions.TextFunctions
    val df = Seq[Option[String]](None, Some("the and"), Some(""))
      .toDF("t")
    val kernel = df.select(TextFunctions.langId(col("t"))).collect().map(_.getString(0))
    val composable = df
      .select(TextFunctions.langIdFromToks(split(lower(trim(col("t"))), "\\s+")))
      .collect().map(_.getString(0))
    assert(kernel.toSeq == composable.toSeq)
    assert(kernel(0) == "und") // null in, "und" out — never null
  }

  test("sequence packing: chunked == naive on adversarial id/token shapes") {
    import graft.operators.SequencePack
    import org.apache.spark.sql.expressions.Window
    // sparse ids (empty chunks), zero-token docs, docs many times the
    // budget, singleton and empty corpora
    val docsGen: Gen[List[(Long, Long)]] =
      Gen.choose(0, 30).flatMap { n =>
        Gen.listOfN(n, for {
          id <- Gen.choose(0L, 100000L)
          tok <- Gen.oneOf(Gen.const(0L), Gen.choose(1L, 50L), Gen.choose(5000L, 20000L))
        } yield (id, tok))
      }.map(_.distinctBy(_._1))
    forAllSampled(docsGen, n = 10) { rows =>
      val df = rows.toDF("doc_id", "tok")
      val wAll = Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val naive = df
        .withColumn("__b", coalesce(sum(col("tok")).over(wAll), lit(0L)))
        .selectExpr("doc_id", "__b div 2048L AS seq_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (width <- Seq(1L, 13L, 4096L)) {
        val got = SequencePack.packAssignments(df, "doc_id", "tok", 2048L, width)
          .select("doc_id", "seq_id")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == naive, s"n=${rows.size} width=$width")
      }
    }
  }

  test("shingle kernel == split/transform semantics incl. whitespace edges") {
    val textGen = Gen.listOf(Gen.oneOf("ab", "cd", "ef", " ", "  ", "\t")).map(_.mkString(" "))
    forAllSampled(textGen, n = 20) { text =>
      val df = Seq(Tuple1(text)).toDF("t")
      val kernel = df.select(graft.functions.TextFunctions.shingles(col("t"), 1))
        .head().getSeq[String](0)
      val composable = df.select(array_distinct(split(trim(col("t")), "\\s+")))
        .head().getSeq[String](0)
      assert(kernel == composable, s"text=${text.map(_.toInt)}")
    }
  }

  test("systematicSample == local stride replay on arbitrary weights and k") {
    import graft.operators.SequencePack
    val gen = for {
      n <- Gen.choose(1, 60)
      ws <- Gen.listOfN(n, Gen.choose(0L, 25L))
      k <- Gen.choose(1, 12)
      width <- Gen.oneOf(3L, 16L, 1000L)
    } yield (ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }, k, width)
    forAllSampled(gen, n = 8) { case (rows, k, width) =>
      val expected = {
        val tot = rows.map(_._2).sum
        val stride = math.max(tot / k, 1L)
        var before = 0L
        rows.flatMap { case (id, w) =>
          val pick = (before + w) / stride > before / stride
          val rank = before / stride
          before += w
          if (pick) Some(id -> rank) else None
        }.toMap
      }
      val got = SequencePack.systematicSample(
          rows.toDF("id", "w"), "id", "w", k.toLong, width)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"n=${rows.size} k=$k width=$width")
    }
  }

  test("shinglesAll: multiset bigrams — distinct equals shingles, count = tokens-1") {
    val textGen = Gen.listOf(Gen.oneOf("ab", "cd", " ", "\t")).map(_.mkString(" "))
    forAllSampled(textGen, n = 20) { text =>
      val df = Seq(Tuple1(text)).toDF("t")
      val all = df.select(graft.functions.TextFunctions.shinglesAll(col("t"), 2))
        .head().getSeq[String](0)
      val dedup = df.select(graft.functions.TextFunctions.shingles(col("t"), 2))
        .head().getSeq[String](0)
      assert(all.distinct == dedup, s"text=${text.map(_.toInt)}")
      // sql trim strips SPACES only (not tabs) — replay that exactly
      val sqlTrimmed = text.dropWhile(_ == ' ')
        .reverse.dropWhile(_ == ' ').reverse
      val nToks = sqlTrimmed.split("\\s+", -1).length
      assert(all.size == math.max(nToks - 1, 0), s"text=${text.map(_.toInt)}")
    }
  }

  // small-vocab corpus generator: dense enough that duplicated lines/spans
  // genuinely occur on arbitrary samples
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(1, 15).flatMap { n =>
      Gen.listOfN(n, Gen.choose(3, 25).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }

  test("dedupLinesRewrite conserves exactly one occurrence of every distinct line") {
    import graft.operators.TextPipeline
    forAllSampled(corpusGen, n = 6) { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = TextPipeline.dedupLinesRewrite(df, "doc_id", "text", lineWidth = 4)
        .select("doc_id", "clean_text", "n_lines", "n_removed")
        .as[(Long, String, Long, Long)].collect()
      // local replay of the line split
      val lines = docs.flatMap { case (_, t) =>
        t.trim.split("\\s+").grouped(4).map(_.mkString(" ")).toList }
      assert(out.map(_._3).sum == lines.size.toLong)
      // kept lines across the corpus = exactly one survivor per distinct line
      assert(out.map(r => r._3 - r._4).sum == lines.distinct.size.toLong)
      // each doc's clean_text is a subsequence of its own original lines
      val orig = docs.toMap
      out.foreach { case (id, clean, _, _) =>
        if (clean.nonEmpty) {
          val mine = orig(id).trim.split("\\s+").grouped(4).map(_.mkString(" ")).toList
          val kept = new java.util.ArrayList[String]()
          var rest = mine
          clean.split(" ").grouped(4).map(_.mkString(" ")).foreach { l =>
            val i = rest.indexOf(l); assert(i >= 0, s"line '$l' not in doc $id")
            rest = rest.drop(i + 1); kept.add(l)
          }
        }
      }
    }
  }

  test("dupSpanStats == local replay on arbitrary small-vocab corpora") {
    import graft.operators.TextPipeline
    forAllSampled(corpusGen, n = 6) { docs =>
      val k = 3
      val df = docs.toDF("doc_id", "text")
      val out = TextPipeline.dupSpanStats(df, "doc_id", "text", k)
        .select("doc_id", "n_spans", "n_dup_spans")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val spans = docs.map { case (id, t) =>
        id -> t.trim.split("\\s+").toList.sliding(k).filter(_.size == k)
          .map(_.mkString(" ")).toList }
      val freq = spans.flatMap(_._2).groupBy(identity).map { case (s, o) => s -> o.size }
      spans.foreach { case (id, ss) =>
        if (ss.isEmpty) assert(!out.contains(id))
        else {
          val (n, d) = out(id)
          assert(n == ss.size.toLong)
          assert(d == ss.count(s => freq(s) >= 2).toLong, s"doc $id")
        }
      }
    }
  }

  test("dedupSpansRewrite == local interval-union replay on arbitrary corpora") {
    import graft.operators.TextPipeline
    forAllSampled(corpusGen, n = 6) { docs =>
      val k = 3
      val out = TextPipeline.dedupSpansRewrite(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .select("doc_id", "clean_text", "n_tokens", "n_removed")
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toVector }.toMap
      val occ = scala.collection.mutable.LinkedHashMap
        .empty[String, List[(Long, Int)]].withDefaultValue(Nil)
      docs.foreach { case (id, _) =>
        val tk = toks(id)
        (0 to tk.size - k).foreach { i =>
          val s = tk.slice(i, i + k).mkString(" ")
          occ(s) = occ(s) :+ ((id, i + 1))
        }
      }
      val rm = scala.collection.mutable.Set.empty[(Long, Int)]
      occ.values.foreach { os =>
        if (os.size >= 2) {
          val canon = os.min
          os.filterNot(_ == canon).foreach { case (d, p) =>
            (p until p + k).foreach(j => rm += ((d, j)))
          }
        }
      }
      docs.foreach { case (id, _) =>
        val tk = toks(id)
        val keep = tk.zipWithIndex.collect { case (w, i) if !rm((id, i + 1)) => w }
        val (ct, nt, nr) = out(id)
        assert(nt == tk.size.toLong && nr == (tk.size - keep.size).toLong, s"doc $id")
        assert(ct == keep.mkString(" "), s"doc $id")
      }
    }
  }

  test("repeatCapMixture == BigInt water-fill replay on arbitrary domain shapes") {
    import graft.operators.TextPipeline
    val gen = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, Gen.choose(1, 500)))
    forAllSampled(gen, n = 8) { sizes0 =>
      val sizes = sizes0.zipWithIndex.map { case (s, i) => (f"s$i%02d", s.toLong) }
      val budget = sizes.map(_._2).sum
      val out = TextPipeline.repeatCapMixture(sizes.toDF("stratum", "n_tokens"),
          "stratum", col("n_tokens"), maxEpochs = 2)
        .select("stratum", "q_weight", "cap", "capped", "alloc")
        .as[(String, Long, Long, Boolean, Long)].collect().sortBy(_._1)
      // exact replay of the closed-form water-fill (engine weights, BigInt)
      val sorted = out.map(r => (r._1, r._2, r._3))
        .sortBy { case (st, w, cap) => (cap.toDouble / w.toDouble, st) }
      var idx = 0
      var ck = BigInt(0)
      var stop = false
      val cappedSet = scala.collection.mutable.Set.empty[String]
      while (idx < sorted.length && !stop) {
        val wSuf = sorted.drop(idx).map(d => BigInt(d._2)).sum
        val d = sorted(idx)
        if (BigInt(d._3) * wSuf <= (BigInt(budget) - ck) * BigInt(d._2)) {
          cappedSet += d._1; ck += d._3; idx += 1
        } else stop = true
      }
      val un = sorted.drop(idx)
      val wr = un.map(d => BigInt(d._2)).sum
      val rem = BigInt(budget) - ck
      val base = un.map(d => d._1 -> rem * d._2 / wr).toMap
      val left = (rem - base.values.sum).toInt
      val topped = un.sortBy(d => (-(rem * d._2 % wr), d._1))
        .take(left).map(_._1).toSet
      out.foreach { case (st, _, cap, cpd, alloc) =>
        assert(cpd == cappedSet(st), s"$st capped flag")
        val want = if (cpd) BigInt(cap) else base(st) + (if (topped(st)) 1 else 0)
        assert(BigInt(alloc) == want && alloc <= cap, s"$st alloc")
      }
      // maxEpochs = 2 with the self budget: Σcap = 2·B, so the fill is
      // always satisfiable and allocations must sum exactly
      assert(out.map(_._5).sum == budget)
    }
  }

  test("semDeDup: sound drops always; complete vs exact greedy when k = 1") {
    import graft.operators.Dedup
    val vecGen: Gen[List[(Long, Array[Float])]] =
      Gen.choose(2, 12).flatMap { n =>
        Gen.listOfN(n, Gen.listOfN(4, Gen.oneOf(-1f, 0f, 1f, 2f)))
          .map(_.zipWithIndex.collect {
            case (v, i) if v.exists(_ != 0f) => (i.toLong, v.toArray) })
      }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na * nb > 0) dot / (na * nb) else Double.NaN
    }
    val tau = 0.95
    forAllSampled(vecGen, n = 6) { vecs =>
      if (vecs.nonEmpty) {
        val out = Dedup.semDeDup(vecs.toDF("id", "vec"), "id", "vec",
          threshold = tau, nClusters = 1, iterations = 1)
        val flags = out.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        out.unpersist()
        val m = vecs.toMap
        vecs.foreach { case (id, v) =>
          val hasPartner = vecs.exists { case (j, w) => j < id && cos(w, v) >= tau + 1e-9 }
          val noPartner = !vecs.exists { case (j, w) => j < id && cos(w, v) >= tau - 1e-9 }
          if (flags(id)) assert(!noPartner, s"unsound drop of $id")
          else assert(!hasPartner, s"k=1 missed a qualifying pair for $id (${m(id).toList})")
        }
      }
    }
  }
}
