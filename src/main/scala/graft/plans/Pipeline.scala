package graft.plans

import graft.profile.{GroupInsight, Profile, Profiler}
import org.apache.spark.sql.DataFrame

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** One named cleaning step: a pure `DataFrame => DataFrame`. */
final case class Stage(name: String, description: String, op: DataFrame => DataFrame)

/** Outcome envelope per stage — the engine's replacement for the reference's
  * `{success, stdout, stderr}` subprocess result (`tool_call_agent.py:48-51`).
  */
final case class StageResult(
    stage: String,
    description: String,
    ok: Boolean,
    rowsBefore: Long,
    rowsAfter: Long,
    error: Option[String])

/** Deterministic pipeline runner — the data-plane replacement for the
  * reference's LLM plan/execute/observe loop (`tool_call_agent.py:91-171`,
  * SURVEY.md §2.6). Ordered stages replace LLM judgment; an audit log
  * replaces `final_messages.log` (A7); the profile cache replaces
  * `basic_info` memoization (`system.txt:2`).
  *
  * Row counts per stage are actions; pass `audit = false` to keep the whole
  * pipeline one lazy plan (the 100 TB mode — Catalyst then fuses every
  * narrow stage into a single scan).
  */
final class Pipeline(stages: Seq[Stage], audit: Boolean = true) {

  private val log = ArrayBuffer.empty[StageResult]
  def auditLog: Seq[StageResult] = log.toSeq

  def run(input: DataFrame): DataFrame = {
    var df = input
    var rows = if (audit) df.count() else -1L
    stages.foreach { s =>
      try {
        val out = s.op(df)
        val outRows = if (audit) out.count() else -1L
        log += StageResult(s.name, s.description, ok = true, rows, outRows, None)
        df = out
        rows = outRows
      } catch {
        case NonFatal(e) =>
          // Fail-fast per stage, reference A10: surface the error, keep the
          // last good frame (no LLM retry loop to appease).
          log += StageResult(s.name, s.description, ok = false, rows, rows,
            Some(e.getMessage))
          throw e
      }
    }
    df
  }
}

/** S5: natural-language cleaning report, replacing the LLM-written
  * `<base>_report.txt` (`tool_call_agent.py:56-69`) with a deterministic
  * rendering of the profile + audit log.
  */
object ReportRenderer {
  def render(title: String, profile: Profile, results: Seq[StageResult],
      insights: Seq[GroupInsight] = Nil): String = {
    val sb = new StringBuilder
    sb ++= s"Data Cleaning Report: $title\n"
    sb ++= "=" * (22 + title.length) + "\n\n"
    sb ++= s"Dataset shape: ${profile.rowCount} rows x ${profile.columns.size} columns\n\n"
    sb ++= "Columns:\n"
    profile.columns.foreach { case (n, t) =>
      val nulls = profile.nullCounts.getOrElse(n, 0L)
      sb ++= f"  - $n ($t): $nulls%d missing\n"
    }
    sb ++= "\nNumeric summary:\n"
    profile.numericStats.foreach { s =>
      sb ++= f"  - ${s.column}: n=${s.count}, mean=${s.mean.fold("n/a")(v => f"$v%.4f")}, " +
        f"std=${s.stddev.fold("n/a")(v => f"$v%.4f")}, min=${s.min.fold("n/a")(_.toString)}, " +
        f"median=${s.median.fold("n/a")(_.toString)}, max=${s.max.fold("n/a")(_.toString)}\n"
    }
    sb ++= f"\nDuplicate rows: ${profile.duplicateRowCount}\n\nActions taken:\n"
    results.foreach { r =>
      val delta =
        if (r.rowsBefore >= 0 && r.rowsAfter != r.rowsBefore)
          s" (${r.rowsBefore} -> ${r.rowsAfter} rows)"
        else ""
      sb ++= s"  ${if (r.ok) "[ok]" else "[FAILED]"} ${r.stage}: ${r.description}$delta\n"
    }
    // Group-wise insights — the deterministic stand-in for the reference's
    // LLM "recommended_analysis" narrative (tool_call_agent.py:148, e.g.
    // "sales has high bonuses"): spell out which group leads/trails each
    // numeric measure and flag it for follow-up analysis.
    if (insights.nonEmpty) {
      sb ++= "\nGroup-wise insights:\n"
      insights.foreach { ins =>
        sb ++= s"  ${ins.valueCol} by ${ins.byCol}:\n"
        ins.groups.foreach { g =>
          sb ++= f"    - ${g.group}: n=${g.n}, mean=${g.mean.fold("n/a")(v => f"$v%.4f")}, " +
            f"std=${g.stddev.fold("n/a")(v => f"$v%.4f")}\n"
        }
        for (t <- ins.top; b <- ins.bottom if t.group != b.group) {
          sb ++= f"    -> highest average ${ins.valueCol}: ${t.group} " +
            f"(${t.mean.get}%.4f); lowest: ${b.group} (${b.mean.get}%.4f)\n"
          sb ++= s"    -> recommended analysis: compare ${ins.valueCol} " +
            s"drivers between ${t.group} and ${b.group}\n"
        }
      }
    }
    sb.toString
  }

  /** Write the report beside the data, reference path convention
    * `<base>_report.txt` (`tool_call_agent.py:63-64`).
    */
  def write(reportContent: String, dataPath: String): java.nio.file.Path = {
    val dot = dataPath.lastIndexOf('.')
    val base = if (dot < 0) dataPath else dataPath.substring(0, dot)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${base}_report.txt"), reportContent)
  }
}

/** Data-quality assertions as a pipeline stage: run a [[graft.operators
  * .DataQuality]] rule set against the in-flight frame and FAIL FAST
  * (the reference's A10 posture — surface the error, keep the last good
  * frame) when violations exceed the budget. A clean run passes the frame
  * through untouched, so the gate composes anywhere between cleaning
  * stages; the per-rule counts land in the thrown message and therefore
  * in the audit log's error field.
  */
object QualityGate {
  def stage(name: String, rules: Seq[graft.operators.DataQuality.Rule],
      maxViolations: Long = 0L): Stage = {
    val tables = rules.map(_.table).distinct
    require(tables.size == 1,
      s"a pipeline gate checks the one in-flight frame; rules name $tables")
    Stage(name, s"quality gate: ${rules.size} rules, budget $maxViolations",
      df => {
        val counts = graft.operators.DataQuality
          .audit(Map(tables.head -> df), rules)
          .collect() // one row per rule — bounded by the rule list
          .map(r => (r.getString(0), r.getLong(2)))
        val total = counts.map(_._2).sum
        if (total > maxViolations) {
          val detail = counts.filter(_._2 > 0)
            .map { case (r, v) => s"$r=$v" }.mkString(", ")
          throw new IllegalStateException(
            s"quality gate '$name': $total violations > budget " +
              s"$maxViolations ($detail)")
        }
        df
      })
  }
}

/** S6: audit-log sink — JSON-lines per pipeline stage, the engine's
  * replacement for the reference's `final_messages.log`
  * (`tool_call_agent.py:188-202`).
  */
object AuditLog {
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def toJsonLines(results: Seq[StageResult]): String =
    results.map { r =>
      s"""{"stage":"${esc(r.stage)}","description":"${esc(r.description)}",""" +
        s""""ok":${r.ok},"rowsBefore":${r.rowsBefore},"rowsAfter":${r.rowsAfter}""" +
        r.error.map(e => s""","error":"${esc(e)}"""").getOrElse("") + "}"
    }.mkString("", "\n", "\n")

  /** Write `<base>_audit.jsonl` beside the data file. */
  def write(results: Seq[StageResult], dataPath: String): java.nio.file.Path = {
    val dot = dataPath.lastIndexOf('.')
    val base = if (dot < 0) dataPath else dataPath.substring(0, dot)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${base}_audit.jsonl"), toJsonLines(results))
  }
}
