package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-profile language ID in ONE pass over the text.
  *
  * Replaces the composable formulation (`filter(toks, isin(markers))` once
  * per language — interpreted higher-order lambdas, 5 langs x 8 markers per
  * token) with a single tokenize pass and a marker -> language-bitmask
  * lookup. Semantics are identical to
  * [[TextFunctions.langIdFromToks]]`(split(lower(trim(text)), "\\s+"))`:
  * sql-trim (spaces only), Spark `lower`, split limit -1, occurrence counts
  * (not distinct), argmax with ties to the alphabetically-first language,
  * all-zero -> "und". A token may be a marker for several languages (e.g.
  * "la" is both es and fr) — the bitmask credits each.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  // Null text identifies as "und", matching the composable formulation:
  // size(null) is null there, so the when() chain falls to otherwise("und").
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LangIdExpr.undLang else LangIdExpr.langIdOf(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = LangIdExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    ev.copy(
      code = code"""
        ${childGen.code}
        $utf8 ${ev.value} = ${childGen.isNull} ? $cls.undLang() : $cls.langIdOf(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LangIdExpr {
  // Languages in ascending code order — index = bit position = tie-break rank.
  private val langs: Array[String] =
    TextFunctions.LangMarkers.keys.toArray.sorted
  private val langUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)
  val undLang: UTF8String = UTF8String.fromString("und")

  /** marker token -> bitmask of the languages it scores for. */
  private val masks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langs.zipWithIndex.foreach { case (lang, i) =>
      TextFunctions.LangMarkers(lang).foreach { tok =>
        m.merge(tok, Int.box(1 << i), (a, b) => Int.box(a.intValue | b.intValue))
      }
    }
    m
  }

  def langIdOf(s: UTF8String): UTF8String = {
    // lower(trim(text)) then split("\s+", -1), matching the Spark built-ins
    // (sql-trim strips spaces only; tabs/newlines are split separators).
    val toks = s.trim().toLowerCase().toString.split("\\s+", -1)
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val m = masks.get(toks(i))
      if (m ne null) {
        val bits = m.intValue
        var b = 0
        while (b < langs.length) {
          if ((bits & (1 << b)) != 0) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < langs.length) {
      if (counts(l) > bestScore) { bestScore = counts(l); best = l }
      l += 1
    }
    if (best < 0) undLang else langUtf8(best)
  }

  def langId(text: Column): Column =
    GraftSqlBridge.column(LangIdExpr(GraftSqlBridge.expression(text)))
}
