package graft

import graft.operators.AutoClean
import graft.sources.Csv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end auto-clean over both reference fixtures: the deterministic
  * replacement for the reference's whole LLM loop.
  */
class AutoCleanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val refDir = "/root/reference/graph_proj/src/agent"

  test("auto-clean dirty_hr.csv reaches a null-free fixed point") {
    val df = Csv.read(spark, s"$refDir/dirty_hr.csv")
    val res = AutoClean.clean(df, AutoClean.Policy(dateFill = "drop"))
    val p = graft.profile.Profiler(res.df)
    assert(!p.hasNulls, s"nulls remain: ${p.nullCounts.filter(_._2 > 0)}")
    assert(p.duplicateRowCount == 0)
    // main-run shape: 500 -> 405 after null-promo drop; 3σ then trims a few
    // more than the golden run (policy filters ALL numeric cols, the
    // reference's specific run only filtered age+salary)
    assert(res.df.count() <= 405 && res.df.count() >= 380)
    assert(res.report.contains("Actions taken"))
    assert(res.audit.forall(_.ok))
  }

  test("auto-clean dirty.csv: sentinels, 66%-null age, dup rows, messy strings") {
    val df = Csv.read(spark, s"$refDir/dirty.csv")
    val res = AutoClean.clean(df)
    val p = graft.profile.Profiler(res.df)
    // Age (66% null, numeric) must be imputed, not dropped: row count stays
    // near 205 minus only the sparse-null drops and dup removal.
    assert(p.nullCounts.getOrElse("Age", 99L) == 0L)
    assert(p.duplicateRowCount == 0)
    assert(res.df.count() > 150)
    // names got trimmed
    val padded = res.df.where(col("Name") =!= trim(col("Name"))).count()
    assert(padded == 0)
  }

  test("cleanCsv writes versioned output + report beside the input") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_auto").toString
    val src = s"$tmp/messy.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src),
      "id,v,s\n1,1.0,a\n2,,b\n3,100.0,\n")
    val (res, out) = AutoClean.cleanCsv(spark, src)
    assert(out == s"$tmp/messy_clean.csv")
    assert(new java.io.File(out).exists())
    assert(new java.io.File(s"$tmp/messy_report.txt").exists())
    assert(res.audit.nonEmpty)
  }
}
