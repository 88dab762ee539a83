package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape gate for the chunked per-stratum rank family (sp2, mix1,
  * mix2, sp3): every FULL-ROW window must be partitioned by a hash-prefix
  * chunk — a window partitioned by the stratum alone over raw rows is the
  * one-task-per-stratum shape that dies on a dominant stratum at scale.
  * Stratum-only windows are permitted only over aggregated (≤256 rows per
  * stratum) chunk-total frames.
  */
class StratumRankPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def assertChunkedWindows(name: String, df: DataFrame): Unit = {
    val wins = df.queryExecution.executedPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, s"$name: expected window nodes in the plan")
    wins.foreach { w =>
      val aggregatedInput =
        w.child.collect { case a: BaseAggregateExec => a }.nonEmpty
      val chunkPartitioned = w.partitionSpec.exists(
        _.references.exists(_.name == "__chunk"))
      assert(aggregatedInput || chunkPartitioned,
        s"$name: full-row window not partitioned by __chunk:\n$w")
    }
  }

  test("sp2/mix1/mix2/sp3 plans carry no unpartitioned-stratum full-row window") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = SparkTestSession.sfDir
      assertChunkedWindows("sp2", Queries.sp2StratifiedSample(spark, dir))
      assertChunkedWindows("mix1", Queries.mix1BalanceUpsample(spark, dir))
      assertChunkedWindows("mix2", Queries.mix2TokenBudget(spark, dir))
      assertChunkedWindows("sp3", Queries.sp3ShuffleOrder(spark, dir))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("chunked rank equals the plain per-stratum window on skewed strata") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // one dominant stratum (the real-crawl shape) + tiny ones
    val rows = (0L until 3000L).map(i => (if (i % 100 < 97) "en" else if (i % 100 == 97) "de" else "fr", i))
    val docs = rows.toDF("lang", "doc_id")
    val plain = docs
      .withColumn("__h", md5(col("doc_id").cast("string")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("__h"), col("doc_id"))).cast("long"))
      .select(col("lang"), col("doc_id"), col("r"))
    // compare through sp2's public contract: quota selection must equal
    // the plain-window selection
    val quota = docs.groupBy("lang").count()
      .select(col("lang"), floor((col("count") + lit(9L)) / lit(10L)).cast("long").as("q"))
    val expected = plain.join(quota, "lang").where(col("r") <= col("q"))
      .select(col("lang"), col("doc_id"), col("r").as("sample_rank"))
    // run sp2's algorithm on this frame via a temp view + the same helper
    // path: write docs as the documents table contract
    val tmp = java.nio.file.Files.createTempDirectory("graft_sp2").toString
    docs.withColumn("n_chars", lit(1L)).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val actual = Queries.sp2StratifiedSample(spark, tmp)
    assert(actual.orderBy("lang", "sample_rank").collect().toSeq ==
      expected.orderBy("lang", "sample_rank").collect().toSeq)
  }
}
