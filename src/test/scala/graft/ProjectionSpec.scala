package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Johnson–Lindenstrauss sign projection, the projection-filtered ANN path,
  * and embedding-space benchmark decontamination.
  */
class ProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rpSigns is deterministic, ±1, and salt-sensitive") {
    val a = Similarity.rpSigns(16, 64)
    val b = Similarity.rpSigns(16, 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(s => s == 1.0 || s == -1.0))
    // roughly balanced (a constant-sign matrix would be a broken hash)
    val pos = a.flatten.count(_ == 1.0)
    assert(pos > 1024 / 4 && pos < 3 * 1024 / 4)
    val other = Similarity.rpSigns(16, 64, salt = "rp2")
    assert(a.map(_.toSeq).toSeq != other.map(_.toSeq).toSeq)
  }

  test("signProject matches a driver-side matrix multiply exactly") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .where(col("vec_id") < 20).select(col("vec_id"), col("embedding"))
    val got = Similarity.signProject(e, "vec_id", "embedding", outDims = 16)
      .as[(Long, Seq[Double])].collect().toMap
    val signs = Similarity.rpSigns(16, 64)
    val raw = e.as[(Long, Seq[Float])].collect().toMap
    raw.foreach { case (id, vec) =>
      val expect = signs.map { row =>
        // same left-to-right fold order as the column expression
        row.zipWithIndex.map { case (s, j) => s * vec(j).toDouble }
          .reduceLeft(_ + _)
      }
      assert(got(id) == expect.toSeq, s"vec $id projection mismatch")
    }
  }

  test("rpTopK recovers planted near-duplicate neighbors (10/10 per query)") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = e.where(col("vec_id") < 5)
    val planted = queries
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(1), lit(10))).as("m"))
      .select((lit(2000000L) + col("vec_id") * 100L + col("m")).as("vec_id"),
        concat(
          slice(col("embedding"), lit(1), col("m")),
          array((element_at(col("embedding"), col("m") + 1) * lit(1.001f)).cast("float")),
          slice(col("embedding"), col("m") + 2, lit(64))).as("embedding"))
    val fixture = e.unionAll(planted)
    val exact = Similarity.bruteForceTopK(fixture, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.rpTopK(fixture, queries, "vec_id", "embedding",
        k = 10, candidates = 50, outDims = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exact.keySet == (0L until 5L).toSet)
    exact.foreach { case (q, ids) =>
      // the exact top-10 per query IS the planted family
      assert(ids == (1 to 10).map(m => 2000000L + q * 100 + m).toSet)
      assert(approx(q) == ids, s"query $q lost a planted neighbor")
    }
  }

  test("semanticDecontaminate flags exactly the planted contamination") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val bench = e.where(col("vec_id") < 20)
    val planted = bench.select((col("vec_id") + 1000000L).as("vec_id"),
      concat(
        array((element_at(col("embedding"), 1) * lit(1.001f)).cast("float")),
        slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = e.where(col("vec_id") >= 20).unionAll(planted)
    val report = Similarity.semanticDecontaminate(corpus, bench,
        "vec_id", "embedding", threshold = 0.99)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(report.map(_._1).toSeq == (0 until 20).map(_ + 1000000L))
    assert(report.forall { case (id, matched, n) => matched == id - 1000000L && n == 1L })
    // the filtering companion drops exactly the flagged rows
    val survivors = Similarity.semanticDecontaminated(corpus, bench,
      "vec_id", "embedding", threshold = 0.99)
    val nCorpus = corpus.count()
    assert(survivors.count() == nCorpus - 20)
    assert(survivors.where(col("vec_id") >= 1000000L).count() == 0)
  }

  test("rpTopK's projected pass does not shuffle the corpus scan") {
    // filter-then-refine must stay candidate-bounded: the only shuffles are
    // the per-query candidate windows (tiny), never a corpus re-partition
    // before the projected scoring join (queries are broadcast)
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val plan = Similarity.rpTopK(e, e.where(col("vec_id") < 5),
      "vec_id", "embedding", k = 10, candidates = 50)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"projected scoring should broadcast the query side:\n$plan")
  }
}
