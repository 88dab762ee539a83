package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: lineitem ⋈ orders with both sides bucketed on
  * the order key must plan WITHOUT a shuffle exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed join on orderkey is exchange-free") {
    // (warehouse dir is a static conf — set in SparkTestSession)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val li = spark.read.parquet(s"${SparkTestSession.sfDir}/lineitem.parquet")
      val ord = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8, Some("l_orderkey"))
      Bucketing.writeBucketed(ord, "ord_b", "o_orderkey", 8, Some("o_orderkey"))

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), first(col("o_totalprice")).as("p"))
      assert(Bucketing.isExchangeFree(joined),
        s"plan has an exchange:\n${joined.queryExecution.executedPlan}")
      // and it still computes the right thing
      val n = joined.count()
      val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey").distinct().count()
      assert(n == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("partitionBy write + predicate -> partition-pruned scan") {
    // The layout decision that matters most at 100 TB: a corpus written
    // partitionBy(lang) turns every per-language query into a directory
    // prune — the scan must carry the predicate as a PartitionFilter and
    // touch only that partition's files, not filter rows post-read.
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)
    val q = spark.read.parquet(tmp).where(org.apache.spark.sql.functions.col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"predicate did not become a partition filter: ${scan.partitionFilters}")
    // pruning actually happened: only the lang=en directory's files are read
    val selected = scan.selectedPartitions.toPartitionArray
    assert(scan.relation.location.inputFiles.length > selected.length)
    assert(selected.forall(f => f.urlEncodedPath.contains("lang=en") ||
      f.urlEncodedPath.contains("lang%3Den")), selected.map(_.urlEncodedPath).take(3).mkString(","))
    assert(q.count() == docs.where(docs("lang") === "en").count())
  }
}
