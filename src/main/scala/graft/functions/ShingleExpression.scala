package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a string in ONE pass.
  *
  * The composable formulation (`transform(sequence(...), i =>
  * concat_ws(element_at(split(text), i) ...))`) re-evaluates the `split`
  * subtree for every `element_at` reference — Catalyst has no let-binding,
  * so an L-token document pays ~3·L regex splits. This kernel tokenizes
  * once, slides the window, and dedups with an insertion-ordered set —
  * semantics identical to `array_distinct(transform(...))` over
  * `split(trim(text), "\\s+")`.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.shingle($a, $n);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[WordShingles]] without the dedup: every n-gram OCCURRENCE, in
  * document order — the multiset view collocation/PMI statistics need
  * (frequency of a bigram, not presence). Same one-pass tokenize.
  */
case class WordShinglesAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingleAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.shingleAll($a, $n);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShingles {
  def shingleAll(s: UTF8String, n: Int): ArrayData = {
    val toks = s.trim().toString.split("\\s+", -1)
    if (n > 1 && toks.length < n) return new GenericArrayData(new Array[Any](0))
    val count = if (n <= 1) toks.length else toks.length - n + 1
    val arr = new Array[Any](count)
    if (n <= 1) {
      var i = 0
      while (i < count) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        arr(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
    }
    new GenericArrayData(arr)
  }

  def shinglesAll(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShinglesAll(GraftSqlBridge.expression(text), n))

  def shingle(s: UTF8String, n: Int): ArrayData = {
    // Match Spark's semantics EXACTLY: sql trim() strips spaces only (not
    // tabs — UTF8String.trim), and sql split() uses Java limit -1 (keeps
    // trailing empty strings). Divergence found by PropertySpec on
    // tab-edged input.
    val toks = s.trim().toString.split("\\s+", -1)
    val out = new java.util.LinkedHashSet[String]()
    if (n <= 1) {
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    } else if (toks.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  def shingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))
}
