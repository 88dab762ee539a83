package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the prefix-weighted string metric real-name
  * entity resolution runs where edit distance is too coarse (Winkler 1990;
  * the standard record-linkage comparator, e.g. Splink/FEBRL). Spark ships
  * `levenshtein` and `soundex` but no JW; this kernel adds it as a
  * codegen'd expression so the verify stage of a blocked ER join stays
  * inside whole-stage codegen.
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the oracle
  * engine), which follows the rapidfuzz convention:
  *   - either side empty → 0.0 (NOT the both-empty=1 variant);
  *   - match window `max(|a|,|b|)/2 - 1` (floored, min 0), greedy
  *     left-to-right matching;
  *   - transpositions = HALF the mismatched matched positions, integer
  *     division (an odd mismatch count floors: probed
  *     `jaro('abcxxx','bcaxxx') = 17/18`);
  *   - `jaro = (m/|a| + m/|b| + (m-t)/m) / 3`, exactly this operation
  *     order;
  *   - Winkler boost ONLY when `jaro > 0.7`: `jaro + l·0.1·(1-jaro)`
  *     with `l` = common prefix capped at 4 (the 0.7 gate is live: a
  *     computed jaro of exactly 2.1/3 boosts because IEEE 2.1/3 > 0.7);
  *   - case-sensitive; comparison is per UTF-16 code unit, which matches
  *     the oracle on ASCII/BMP text (the ER fixtures' domain — document
  *     when feeding astral-plane text).
  *
  * Scale shape: O(|a|·window) per row, map-only, no allocation beyond two
  * boolean arrays; runs inside the generated code via a static call (the
  * [[ArrayJaccard]] pattern).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = JaroWinkler.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.jw($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + w)
      var j = math.max(0, i - w)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && b.charAt(j) == a.charAt(i)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatch = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val jaro =
      (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val cap = math.min(math.min(la, lb), 4)
      var p = 0
      while (p < cap && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p.toDouble * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column face: `jaroWinkler(a, b)` ∈ [0, 1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaroWinkler(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
