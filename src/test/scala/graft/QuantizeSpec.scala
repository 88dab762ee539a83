package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("int8 codes bounded, zero vectors map to zero, round-trip error bounded") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-2.0f, 2.0f, 1.0f, -1.0f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
    val rows = q.orderBy("vec_id").as[(Long, Double, Seq[Long])].collect()
    rows.foreach { case (_, amax, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(amax >= 0)
    }
    // zero vector -> all-zero codes with amax 0
    assert(rows(1)._2 == 0.0 && rows(1)._3.forall(_ == 0L))
    // amax component quantizes to exactly +/-127
    assert(rows(0)._3.head == 127L && rows(2)._3.head == -127L)
    // round-trip error per component <= amax/254 + float rounding
    val deq = Similarity.dequantizeInt8(q, "vec_id", outCol = "embedding")
    val err = vecs.as("a").join(deq.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select(col("a.vec_id"),
        zip_with(col("a.embedding"), col("b.embedding"),
          (x, y) => abs(x.cast("double") - y.cast("double"))).as("e"),
        array_max(transform(col("a.embedding"),
          v => abs(v.cast("double")))).as("amax"))
      .select(array_max(col("e")) <= col("amax") / 254.0 + lit(1e-6))
      .as[Boolean].collect()
    assert(err.forall(identity))
  }

  test("quantized top-10 recovers the exact float top-10 on sf0.001 queries") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(e, e.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 10)
    val deq = Similarity.dequantizeInt8(
      Similarity.quantizeInt8(e, "vec_id", "embedding"), "vec_id",
      outCol = "embedding")
    val approx = Similarity.bruteForceTopK(deq, deq.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 10)
    val hits = approx.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id"))
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(qid => assert(hits.getOrElse(qid, 0L) >= 8L,
      s"query $qid recall ${hits.getOrElse(qid, 0L)}/10"))
  }
}
