package graft

import graft.core.GraftSession
import graft.operators.AutoClean

/** CLI surface for the auto-clean flow — the engine's equivalent of the
  * reference's whole agent run: `runMain graft.CleanMain <csv> [dateFill]`
  * cleans the CSV beside itself (`_clean` suffix, never overwriting) and
  * writes `<base>_report.txt`.
  */
object CleanMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CleanMain <csv-path> [dateFill=mode|drop|min]")
    val policy = AutoClean.Policy(dateFill = args.lift(1).getOrElse("mode"))
    val spark = GraftSession.create("graft-clean")
    val (res, out) = AutoClean.cleanCsv(spark, args(0), policy)
    println(s"[clean] wrote $out (${res.df.count()} rows, ${res.passes} passes)")
    println(s"[clean] stages: ${res.audit.map(a => s"${a.stage}(${a.rowsBefore}->${a.rowsAfter})").mkString(", ")}")
    spark.stop()
  }
}
