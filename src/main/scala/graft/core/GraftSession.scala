package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * The reference (`tool_call_agent.py:30-54`) spawns one python subprocess per
  * statement; here a single long-lived SparkSession executes every stage as a
  * lazy Catalyst plan. Defaults are tuned for local[N] testing but every knob
  * scales to a multi-executor cluster (AQE on, shuffle partitions sized to the
  * parallelism actually available, UTC session time).
  */
object GraftSession {

  /** Build (or reuse) a SparkSession with scale-aware defaults.
    *
    * @param master     e.g. "local[32]"; on a real cluster pass the cluster master
    * @param shufflePartitions  match cores locally; AQE coalesces at runtime
    */
  def create(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ui.explainMode", "formatted")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
