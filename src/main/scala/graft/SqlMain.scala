package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL entry point — the engine's deterministic replacement for the
  * reference's interactive chat surface (`graph.py` chatbot / `main.py` SDK
  * client): where the reference turned natural language into one-off pandas
  * scripts, a user here runs plain Spark SQL over the registered tables with
  * every graft kernel available as a SQL function (via
  * [[GraftExtensions]]).
  *
  * {{{
  * sbt 'runMain graft.SqlMain /root/testdata/sf0.001 \
  *   "SELECT lang, count(*) FROM (SELECT graft_langid(text) lang FROM documents) GROUP BY lang"'
  * }}}
  *
  * First arg: testdata dir (tables register as views by file name); the
  * rest: one query per arg. Results print as Spark's show() (truncated);
  * batch callers use [[Queries.registry]] / [[SparkEntry.queries]] instead.
  */
object SqlMain {
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit =
    tables.foreach { tbl =>
      if (new java.io.File(s"$dir/$tbl.parquet").exists())
        Queries.t(spark, dir, tbl).createOrReplaceTempView(tbl)
    }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SqlMain <testdata-dir> <sql> [<sql> ...]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    registerViews(spark, args.head)
    args.tail.foreach { sql =>
      println(s"\n-- $sql")
      spark.sql(sql).show(50, truncate = false)
    }
    spark.stop()
  }
}
