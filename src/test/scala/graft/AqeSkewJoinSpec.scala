package graft

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join split — the AUTOMATIC twin of sj1's manual salting:
  * Spark's `OptimizeSkewedJoin` detects an oversized shuffle partition at
  * runtime (from map-output sizes, not plan-time stats) and splits it
  * into advisory-sized chunks, duplicating the matching partition on the
  * other side. sj1 remains the manual weapon for the one mega-key AQE
  * cannot split (a single key's rows must still meet); this spec proves
  * the automatic path fires and preserves results, completing the skew
  * story the way dpp1 completed pruning.
  *
  * Spec-only by the RuntimeFilterSpec convention: the MECHANISM is a
  * runtime re-plan, not oracle-expressible SQL, and the joined VALUES of
  * a skewed join are already oracle-pinned by sj1 — so this pins
  * (a) detection+split (skew=true on the SMJ, `numSkewedPartitions`/
  * `numSkewedSplits` metrics on the AQE shuffle read), and (b) identity
  * with the same join under no skew handling.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  // suites run in parallel in the forked test JVM and this spec NEEDS
  // specific conf values (AQE on, skew thresholds) while sibling specs
  // toggle adaptive off around their scan-metric assertions — an
  // isolated session (own SQLConf, shared SparkContext) removes the race
  private lazy val spark = SparkTestSession.spark.newSession()

  // ~90% of 400k fact rows pile onto key 0 — the classic hot-key join
  private def fact = spark.range(400000L).select(
    when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000).as("k"),
    (col("id") * 7 % 100).as("v"))
  private def dim = spark.range(1000L).select(
    col("id").as("k"), (col("id") % 7).as("grp"))

  private def joined = fact.join(dim, "k")
    .groupBy(col("grp"))
    .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    .orderBy(col("grp"))

  test("OptimizeSkewedJoin splits the hot partition at runtime; result " +
      "identical to the unoptimized join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test data is tiny; lower the size thresholds so detection fires
      // the way it would on a multi-GB hot partition in production
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "262144",
      // keep the plan a sort-merge join: broadcast would sidestep the
      // shuffle (and at 100 TB the dim side may well exceed broadcast)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = joined
      val got = df.collect().toSeq

      val adaptive = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a
        case other => fail(s"not an adaptive plan: ${other.getClass}")
      }
      val finalPlan = adaptive.executedPlan
      assert(finalPlan.toString.contains("skew=true"),
        s"no skew=true join in final AQE plan:\n$finalPlan")
      // plan.collect does not descend into materialized query stages —
      // their subtrees hang off QueryStageExec.plan, not children
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(allNodes)) ++ (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allNodes(q.plan)
          case _ => Seq.empty
        })
      val reads = allNodes(finalPlan).collect { case r: AQEShuffleReadExec => r }
      val skewedParts = reads.flatMap(_.metrics.get("numSkewedPartitions"))
        .map(_.value)
      val skewedSplits = reads.flatMap(_.metrics.get("numSkewedSplits"))
        .map(_.value)
      assert(skewedParts.exists(_ >= 1L),
        s"no skewed partition detected: $skewedParts")
      // the whole point: the one hot partition became MANY tasks
      assert(skewedSplits.exists(_ >= 2L),
        s"hot partition not split: $skewedSplits")

      // identity: same join with skew handling off
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val want = joined.collect().toSeq
      assert(got == want && got.nonEmpty)
      assert(got.map(_.getLong(1)).sum == 400000L) // every row joined once
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
