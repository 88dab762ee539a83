package graft

import org.scalatest.funsuite.AnyFunSuite

/** The interactive surface (SqlMain REPL core): statements execute against
  * the registered views with graft kernels available, errors are turns (not
  * crashes), and output is bounded however large the result is.
  */
class SqlShellSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    SqlMain.registerViews(s, SparkTestSession.sfDir)
    s
  }

  test("execute renders a bounded table") {
    val r = SqlMain.execute(spark, "SELECT doc_id FROM documents ORDER BY doc_id", maxRows = 3)
    assert(r.isRight)
    val table = r.toOption.get
    assert(table.contains("doc_id"))
    assert(table.contains("truncated"))
    assert(table.linesIterator.count(_.startsWith("|")) == 5) // header + sep + 3 rows
  }

  test("a failing statement is an error turn, not a crash") {
    val bad = SqlMain.execute(spark, "SELECT * FROM no_such_table")
    assert(bad.isLeft)
    // session still works afterwards
    val ok = SqlMain.execute(spark, "SELECT count(*) AS n FROM documents")
    assert(ok.isRight && ok.toOption.get.contains("n"))
  }

  test("repl streams one result per statement and survives a bad line") {
    val in = new java.io.BufferedReader(new java.io.StringReader(
      """SELECT 1 AS one
        |SELECT broken FROM nowhere
        |SELECT 2 AS two
        |exit
        |SELECT 3 AS never""".stripMargin))
    val outs = scala.collection.mutable.ArrayBuffer.empty[String]
    SqlMain.repl(spark, in, outs += _)
    assert(outs.length == 3)
    assert(outs(0).contains("one") && outs(1).startsWith("ERROR:") && outs(2).contains("two"))
  }
}
