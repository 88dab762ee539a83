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
  * rest: one query per arg. With NO query args the entry becomes the
  * session twin of the reference's streaming client (`main.py:16-27`): a
  * read-eval loop on stdin, one statement per line, results streamed back
  * per statement, errors reported without killing the session (the
  * conversational-surface property — a failed query is a turn, not a
  * crash). Batch callers use [[Queries.registry]] / [[SparkEntry.queries]]
  * instead.
  */
object SqlMain {
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit =
    tables.foreach { tbl =>
      if (new java.io.File(s"$dir/$tbl.parquet").exists())
        Queries.t(spark, dir, tbl).createOrReplaceTempView(tbl)
    }

  /** Execute one statement: Right(rendered table) or Left(error message).
    * The session survives failures — the REPL's per-turn contract.
    */
  def execute(spark: SparkSession, sql: String, maxRows: Int = 50): Either[String, String] =
    try Right(formatResult(spark.sql(sql), maxRows))
    catch { case e: Exception => Left(Option(e.getMessage).getOrElse(e.toString).take(500)) }

  /** Plain-text rendering: header row + up to `maxRows` data rows + a
    * truncation marker. take(maxRows+1) bounds driver memory however large
    * the result is.
    */
  def formatResult(df: org.apache.spark.sql.DataFrame, maxRows: Int = 50): String = {
    val rows = df.take(maxRows + 1)
    val shown = rows.take(maxRows).map(_.toSeq.map {
      case null => "NULL"
      case v => v.toString
    })
    val header = df.columns.toSeq
    val widths = header.indices.map { i =>
      (header(i).length +: shown.map(_(i).length)).max
    }
    def line(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sb = new StringBuilder
    sb.append(line(header)).append('\n')
    sb.append(widths.map("-" * _).mkString("|-", "-|-", "-|")).append('\n')
    shown.foreach(r => sb.append(line(r)).append('\n'))
    if (rows.length > maxRows) sb.append(s"... (> $maxRows rows, truncated)\n")
    sb.append(s"(${math.min(rows.length, maxRows)} row(s) shown)")
    sb.toString
  }

  /** stdin read-eval loop; `exit`/`quit`/EOF ends the session. */
  def repl(spark: SparkSession, in: java.io.BufferedReader, out: String => Unit): Unit = {
    Iterator.continually(in.readLine())
      .takeWhile(l => l != null && l.trim != "exit" && l.trim != "quit")
      .map(_.trim)
      .filter(_.nonEmpty)
      .foreach { sql =>
        execute(spark, sql) match {
          case Right(table) => out(table)
          case Left(err) => out(s"ERROR: $err")
        }
      }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SqlMain <testdata-dir> [<sql> ...]  (no sql => stdin REPL)")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    registerViews(spark, args.head)
    if (args.tail.isEmpty) {
      println(s"graft sql — tables: ${tables.mkString(", ")}; 'exit' to quit")
      repl(spark,
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
        s => println(s))
    } else args.tail.foreach { sql =>
      println(s"\n-- $sql")
      execute(spark, sql) match {
        case Right(table) => println(table)
        case Left(err) => println(s"ERROR: $err")
      }
    }
    spark.stop()
  }
}
