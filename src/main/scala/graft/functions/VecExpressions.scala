package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dense-vector kernels.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate the
  * lambda interpreted, per element, per row — fine for occasional use, a
  * hot-loop disaster for N² similarity joins. These expressions compile to a
  * tight primitive loop inside whole-stage codegen (and a matching
  * interpreted path), preserving the exact left-to-right double fold order
  * of [[VectorFunctions.dot]], so results are bit-identical to the
  * higher-order formulation and to the unrolled oracle SQL.
  */
abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemJava(arr: String, i: String): String = s"$arr.getFloat($i)"
  protected def elemScala(arr: ArrayData, i: Int): Double = arr.getFloat(i).toDouble
}

/** Σ aᵢ·bᵢ over two float arrays, accumulated in double, sequential order. */
case class FloatVecDot(left: Expression, right: Expression) extends FloatVecBinary {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elemScala(x, i) * elemScala(y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) ${elemJava(a, i)} * (double) ${elemJava(b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** √(Σ aᵢ²) — the L2 norm, same fold order as the dot kernel. */
case class FloatVecNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VecExpressions {
  /** Column wrappers (Spark 4: Column wraps a ColumnNode, not an Expression). */
  def fdot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatVecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def fnorm(a: Column): Column =
    GraftSqlBridge.column(FloatVecNorm(GraftSqlBridge.expression(a)))
}
