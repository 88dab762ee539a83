package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** |A∩B| / |A∪B| over two string arrays of DISTINCT elements, one pass.
  *
  * The composable form (`size(array_intersect(a,b))` referenced in both the
  * numerator and the union term) evaluates the intersection up to three
  * times per row. This kernel builds one hash set from the smaller side and
  * probes once. Arithmetic matches the composable form exactly:
  * inter / (|A| + |B| - inter) on small integers, 0.0 when the union is
  * empty — so oracle SQL built on `list_intersect` stays bit-identical.
  */
case class ArrayJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayJaccard.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ArrayJaccard.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.jaccard($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayJaccard {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nb = big.numElements()
    if (ns + nb == 0) return 0.0
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (set.contains(big.getUTF8String(i))) inter += 1; i += 1 }
    val union = (ns + nb).toDouble - inter
    if (union > 0) inter / union else 0.0
  }

  def jaccardSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ArrayJaccard(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
