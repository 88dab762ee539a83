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
}
