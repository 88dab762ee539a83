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
}
