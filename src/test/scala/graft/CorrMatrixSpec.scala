package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P14 — the fused one-scan Pearson correlation matrix. */
class CorrMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("p14 matches Spark's corr() within the 6dp quantization envelope") {
    val got = Queries.p14CorrMatrix(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    val li = spark.read.parquet(s"${SparkTestSession.sfDir}/lineitem.parquet")
    got.foreach { case ((x, y), r) =>
      val want = li.agg(corr(col(x), col(y))).head().getDouble(0)
      // two error sources vs the streaming corr(): our 6dp input
      // quantization and its different summation — both ≤ ~1e-5 here
      assert(math.abs(r - want) < 1e-4, s"($x,$y): got $r want $want")
    }
    assert(got.size == 6)
  }

  test("perfectly correlated / anticorrelated columns hit ±1 exactly") {
    import spark.implicits._
    // y = 2x + 1 and z = -x: |r| must quantize to exactly 1.0
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1, -i.toDouble))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
      .withColumn("l_tax", col("l_quantity") * 0.5)
    val tmp = java.nio.file.Files.createTempDirectory("corr_fx")
    df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val rows = Queries.p14CorrMatrix(spark, tmp.toString)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(rows(("l_discount", "l_extendedprice")) == -1.0)
    assert(rows(("l_discount", "l_quantity")) == -1.0)
    assert(rows(("l_extendedprice", "l_quantity")) == 1.0)
    assert(rows(("l_quantity", "l_tax")) == 1.0)
  }

  test("all 15 accumulators fuse into ONE lineitem scan") {
    val plan = Queries.p14CorrMatrix(spark, SparkTestSession.sfDir)
      .queryExecution.optimizedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Relation ["))
    assert(scans == 1, s"expected one scan leaf, plan:\n$plan")
  }
}
