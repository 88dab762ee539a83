package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dense-vector kernels over `array<float>` / `array<double>`.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate the
  * lambda interpreted, per element, per row — fine for occasional use, a
  * hot-loop disaster for N² similarity joins. These expressions compile to a
  * tight primitive loop inside whole-stage codegen (and a matching
  * interpreted path), preserving the exact left-to-right double fold order
  * of [[VectorFunctions.dot]], so results are bit-identical to the
  * higher-order formulation and to the unrolled oracle SQL.
  */
object VecKernels {
  /** Per-element accessor choice by array element type. */
  def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def get(arr: ArrayData, i: Int, float: Boolean): Double =
    if (float) arr.getFloat(i).toDouble else arr.getDouble(i)
  def accessor(arr: String, i: String, float: Boolean): String =
    if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Σ aᵢ·bᵢ — double accumulator, sequential fold. */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val lFloat = VecKernels.isFloat(left.dataType)
  private lazy val rFloat = VecKernels.isFloat(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += VecKernels.get(x, i, lFloat) * VecKernels.get(y, i, rFloat)
      i += 1
    }
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
         |  $acc += ${VecKernels.accessor(a, i, lFloat)} * ${VecKernels.accessor(b, i, rFloat)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** √(Σ aᵢ²) — the L2 norm, same fold order as the dot kernel. */
case class FloatVecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val isF = VecKernels.isFloat(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = VecKernels.get(x, i, isF); acc += v * v; i += 1 }
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
         |  double $v = ${VecKernels.accessor(a, i, isF)};
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Σ (aᵢ−bᵢ)² — squared L2 distance (for IVF assignment). */
case class FloatVecDistSq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val lFloat = VecKernels.isFloat(left.dataType)
  private lazy val rFloat = VecKernels.isFloat(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = VecKernels.get(x, i, lFloat) - VecKernels.get(y, i, rFloat)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${VecKernels.accessor(a, i, lFloat)} - ${VecKernels.accessor(b, i, rFloat)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VecExpressions {
  /** Column wrappers (Spark 4: Column wraps a ColumnNode, not an Expression). */
  def fdot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatVecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def fnorm(a: Column): Column =
    GraftSqlBridge.column(FloatVecNorm(GraftSqlBridge.expression(a)))
  def fdistSq(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      FloatVecDistSq(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
