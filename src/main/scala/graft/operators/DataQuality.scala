package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: a rule set compiled into the minimum
  * number of Spark jobs.
  *
  * The reference wrangler's quality checks are ad-hoc LLM-prompted
  * profiling calls (`tool_call_agent.py` "basic info" loop); this is the
  * engine-grade equivalent — assertions as data, violations as a frame.
  *
  * Scale shape: all predicate rules (not-null / range / regex / enum) over
  * one table FUSE into a single conditional aggregate, so a 100 TB table
  * pays ONE scan for any number of such rules — map-side-combined sums, no
  * shuffle beyond the final 1-row reduce. Uniqueness pays the unavoidable
  * distinct (one shuffle on the key), referential integrity one anti-join
  * per FK (AQE broadcasts small parents). Nothing collects more than one
  * row per rule to the driver, and nothing is quadratic anywhere.
  */
object DataQuality {

  /** A named assertion over one table. `checked` below = rows the rule
    * evaluated (total rows for predicate rules; non-null key rows for
    * unique/FK rules), so violation RATES are computable downstream.
    */
  sealed trait Rule {
    def name: String
    def table: String
  }
  /** Violation: the column is null. */
  final case class NotNull(name: String, table: String, column: String) extends Rule
  /** Violation: non-null value outside [lo, hi] (inclusive). */
  final case class InRange(name: String, table: String, column: String,
      lo: Double, hi: Double) extends Rule
  /** Violation: non-null value does not match `regex` (find-anywhere
    * semantics, same as Spark `rlike` / DuckDB `regexp_matches` — anchor
    * with ^$ for full-string).
    */
  final case class Matches(name: String, table: String, column: String,
      regex: String) extends Rule
  /** Violation: non-null value not in `values`. */
  final case class InSet(name: String, table: String, column: String,
      values: Seq[String]) extends Rule
  /** Violation: a non-null key tuple occurring n > 1 times contributes
    * n - 1 violations (total non-null rows minus distinct keys).
    */
  final case class Unique(name: String, table: String,
      columns: Seq[String]) extends Rule
  /** Violation: non-null child key with no matching parent key. */
  final case class RefIntegrity(name: String, table: String, column: String,
      parentTable: String, parentColumn: String) extends Rule

  private def violationPred(r: Rule): Column = r match {
    case NotNull(_, _, c) => col(c).isNull
    case InRange(_, _, c, lo, hi) =>
      col(c).isNotNull && (col(c) < lit(lo) || col(c) > lit(hi))
    case Matches(_, _, c, re) => col(c).isNotNull && !col(c).rlike(re)
    case InSet(_, _, c, vs) => col(c).isNotNull && !col(c).isin(vs: _*)
    case _ => throw new IllegalArgumentException(s"not a predicate rule: $r")
  }

  /** Run `rules` against `tables`; returns one row per rule:
    * `(rule_name, tbl, violations, checked)`.
    */
  def audit(tables: Map[String, DataFrame], rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    rules.foreach(r => require(tables.contains(r.table),
      s"rule ${r.name}: unknown table ${r.table}"))

    val predRules = rules.collect {
      case r @ (_: NotNull | _: InRange | _: Matches | _: InSet) => r
    }
    // one fused aggregate per table covering all its predicate rules
    val predFrames = predRules.groupBy(_.table).toSeq.map { case (tbl, rs) =>
      val aggs = count(lit(1L)).as("__checked") +:
        rs.zipWithIndex.map { case (r, i) =>
          sum(when(violationPred(r), 1L).otherwise(0L)).as(s"__v$i")
        }
      tables(tbl).agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rs.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule_name"), lit(tbl).as("tbl"),
            coalesce(col(s"__v$i"), lit(0L)).as("violations"),
            col("__checked").as("checked"))
        }: _*)).as("r"))
        .select(col("r.*"))
    }

    val uniqueFrames = rules.collect { case Unique(name, tbl, cols) =>
      val nonNull = tables(tbl)
        .where(cols.map(col(_).isNotNull).reduce(_ && _))
      nonNull
        .agg(count(lit(1L)).as("checked"),
          count_distinct(col(cols.head), cols.tail.map(col): _*).as("__d"))
        .select(lit(name).as("rule_name"), lit(tbl).as("tbl"),
          (coalesce(col("checked"), lit(0L)) - coalesce(col("__d"), lit(0L)))
            .as("violations"),
          col("checked"))
    }

    val fkFrames = rules.collect {
      case RefIntegrity(name, tbl, c, ptbl, pc) =>
        require(tables.contains(ptbl), s"rule $name: unknown parent $ptbl")
        val child = tables(tbl).where(col(c).isNotNull).select(col(c))
        val parent = tables(ptbl).select(col(pc).as(c)).distinct()
        val orphans = child.join(parent, Seq(c), "left_anti")
          .agg(count(lit(1L)).as("violations"))
        val total = child.agg(count(lit(1L)).as("checked"))
        orphans.crossJoin(total) // both sides are single-row aggregates
          .select(lit(name).as("rule_name"), lit(tbl).as("tbl"),
            col("violations"), col("checked"))
    }

    (predFrames ++ uniqueFrames ++ fkFrames).reduce(_ unionAll _)
  }
}
