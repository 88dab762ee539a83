package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH bucket of a float vector — `bits` sign bits of
  * projections onto pseudo-random hyperplanes whose weights are derived
  * deterministically from (seed, bit, dim) via a splitmix64 finalizer.
  *
  * Replaces the higher-order-function formulation (interpreted lambda per
  * element per bit) with one codegen'd loop; no stored projection matrix, so
  * executors need no broadcast and the expression stays pure.
  */
case class HyperplaneLshBucket(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0L
    var b = 0
    while (b < bits) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        proj += arr.getFloat(d).toDouble * HyperplaneLshBucket.weight(seed, b, d)
        d += 1
      }
      if (proj >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      val cls = HyperplaneLshBucket.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |long $bucket = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  double $proj = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $proj += (double) $a.getFloat($d) * $cls.weight(${seed}L, $b, $d);
         |  }
         |  if ($proj >= 0) $bucket |= (1L << $b);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneLshBucket {
  /** Deterministic pseudo-random weight in [-1, 1) for (seed, bit, dim). */
  def weight(seed: Long, bit: Int, dim: Int): Double = {
    val h = MinHashSig.mix(seed ^ (bit.toLong * 0xC2B2AE3D27D4EB4FL) ^
      (dim.toLong * MinHashSig.Golden))
    // top 53 bits -> uniform double in [0,1), shifted to [-1,1)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  def bucket(vec: Column, bits: Int, seed: Long): Column =
    GraftSqlBridge.column(HyperplaneLshBucket(GraftSqlBridge.expression(vec), bits, seed))
}
