package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join reduction — the row-level sibling of dpp1's
  * directory-level runtime pruning: for `fact ⋈ dim WHERE dim.attr = x`
  * over a NON-partitioned fact, Spark can build a bloom filter from the
  * filtered dim's join keys at runtime and apply `might_contain` on the
  * fact side BEFORE the shuffle, cutting shuffle volume by the dim
  * filter's selectivity. Off by thresholds at test scale (the application
  * side must look scan-heavy), so the spec pins both the MECHANISM (the
  * injected aggregate + might_contain filter in the optimized plan once
  * thresholds allow) and the SEMANTICS (bloom-filtered result identical
  * to the plain join — a bloom filter admits false positives, never
  * false negatives, so the join result cannot change).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  // isolated session — this spec forces bloom/broadcast confs while
  // suites run in parallel (see AqeSkewJoinSpec's rationale)
  private lazy val spark = SparkTestSession.spark.newSession()
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.01")

  test("a selective dim filter injects a runtime bloom filter on the " +
      "fact side, result unchanged") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test tables are tiny; drop the application-side scan threshold so
      // the injection fires the way it would on a 100 TB fact scan
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // and force a SHUFFLE join: under a broadcast join Spark correctly
      // refuses to inject (the broadcast hash probe already filters) —
      // at 100 TB the dim may exceed broadcast size, which is exactly
      // when the bloom reduction pays
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def joined = {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_partkey"), col("l_quantity"))
        val p = spark.read.parquet(s"$sfDir/part.parquet")
          .where(col("p_type") === "ECONOMY")
          .select(col("p_partkey"), col("p_brand"))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_lines"),
            (sum(floor(col("l_quantity") * lit(1e6) + lit(0.5))
              .cast("decimal(38,0)")).cast("double") / lit(1e6))
              .as("total_qty"))
          .orderBy(col("p_brand"))
      }
      // main-tree shuffle records actually written post-execution — the
      // metric the bloom filter exists to move (the filter drops fact
      // rows BEFORE the join shuffle). Recurses into materialized AQE
      // query stages (their subtrees hang off QueryStageExec.plan, not
      // children); the bloom build's own subquery tree is deliberately
      // not counted — the claim is about the fact/dim join shuffles.
      def shuffleRecords(d: org.apache.spark.sql.DataFrame): Long = {
        def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] =
          (p +: p.children.flatMap(allNodes)) ++ (p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              allNodes(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              allNodes(q.plan)
            case _ => Seq.empty
          })
        allNodes(d.queryExecution.executedPlan).collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.metrics("shuffleRecordsWritten").value
        }.sum
      }

      val df = joined
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
          optimized.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$optimized")
      val got = df.collect().toSeq
      val recordsOn = shuffleRecords(df)

      // same join with the feature off — results must be identical
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "false")
      val wantDf = joined
      assert(!wantDf.queryExecution.optimizedPlan.toString
        .contains("might_contain"))
      assert(got == wantDf.collect().toSeq && got.nonEmpty)
      val recordsOff = shuffleRecords(wantDf)

      // the measured claim, not just plan presence: with the filter ON
      // the join shuffles strictly fewer records (the dim filter's
      // selectivity, applied map-side on the fact)
      assert(recordsOn < recordsOff,
        s"bloom filter moved no shuffle records: on=$recordsOn off=$recordsOff")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
