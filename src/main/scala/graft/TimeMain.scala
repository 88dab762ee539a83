package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query timing: run the named registry queries N times each
  * (default 2) on SPARK_GRAFT_SF_DIR with the bench's session config, cache
  * cleared between runs — the tool behind PERF.md's "isolated runs".
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.TimeMain d7_neardup_components' }}}
  */
object TimeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        Queries.registry(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] $name%-26s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
