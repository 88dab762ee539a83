package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

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

/** argmin over a centroid BLOCK: for one vector and an
  * `array<struct<cluster:int, centroid:array<double>>>` block, returns
  * `struct<d2:double, cluster:int>` — the squared-L2-nearest entry, ties
  * broken by lowest cluster id. One row carries the whole block loop, so an
  * assignment join streams n rows instead of n·k (the "matrix kernel"
  * shape): the block rides the join once per row and the k·dim flops run in
  * a fused primitive loop inside whole-stage codegen. Distance arithmetic
  * is the exact [[FloatVecDistSq]] fold and the (d2, cluster) comparator
  * matches `min_by(…, struct(d2, cluster))` double ordering on the
  * non-negative, non-NaN distances k-means produces — so replacing the
  * exploded min_by with this kernel moves no hashes. Empty block → null.
  */
case class FloatVecBlockArgmin(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  private lazy val vFloat = VecKernels.isFloat(left.dataType)
  private lazy val cFloat = right.dataType match {
    case ArrayType(StructType(fields), _) =>
      fields(1).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val block = b.asInstanceOf[ArrayData]
    val m = block.numElements()
    if (m == 0) return null
    var bestD = Double.NaN
    var bestC = 0
    var j = 0
    while (j < m) {
      val entry = block.getStruct(j, 2)
      val c = entry.getInt(0)
      val cent = entry.getArray(1)
      val n = math.min(vec.numElements(), cent.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = VecKernels.get(vec, i, vFloat) - VecKernels.get(cent, i, cFloat)
        acc += d * d
        i += 1
      }
      if (j == 0 || acc < bestD || (acc == bestD && c < bestC)) {
        bestD = acc; bestC = c
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val entry = ctx.freshName("entry")
      val cent = ctx.freshName("cent")
      val c = ctx.freshName("c")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      s"""
         |int $m = $b.numElements();
         |if ($m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $bestD = Double.NaN;
         |  int $bestC = 0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    org.apache.spark.sql.catalyst.InternalRow $entry = $b.getStruct($j, 2);
         |    int $c = $entry.getInt(0);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cent = $entry.getArray(1);
         |    int $n = java.lang.Math.min($a.numElements(), $cent.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $d = ${VecKernels.accessor(a, i, vFloat)} - ${VecKernels.accessor(cent, i, cFloat)};
         |      $acc += $d * $d;
         |    }
         |    if ($j == 0 || $acc < $bestD || ($acc == $bestD && $c < $bestC)) {
         |      $bestD = $acc; $bestC = $c;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$bestD, $bestC});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Threshold-cosine scan over a benchmark BLOCK: for one corpus vector and
  * an `array<struct<bid:long, bvec:array<float|double>, bnorm:double>>`
  * block, returns `struct<matched_bench_id:long, n_matches:long>` over the
  * entries whose cosine reaches `threshold` — or null when none does. The
  * arithmetic is exactly the fastCosine contract: norm = the
  * [[FloatVecNorm]] fold over the corpus vector (once per ROW), cosine =
  * [[FloatVecDot]] fold / (cnorm·bnorm) guarded by denom > 0, match on
  * `>= threshold` — so a decontamination scan that previously needed a
  * broadcast nested-loop join (n·|bench| rows) plus a groupBy becomes ONE
  * map-only projection with identical values and hashes.
  */
case class FloatVecBlockCosineMatch(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("matched_bench_id", LongType, nullable = false),
    StructField("n_matches", LongType, nullable = false)))
  override def nullable: Boolean = true
  private lazy val vFloat = VecKernels.isFloat(left.dataType)
  private lazy val bFloat = right.dataType match {
    case ArrayType(StructType(fields), _) =>
      fields(1).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val block = b.asInstanceOf[ArrayData]
    val nv = vec.numElements()
    var cn = 0.0
    var i = 0
    while (i < nv) { val v = VecKernels.get(vec, i, vFloat); cn += v * v; i += 1 }
    val cnorm = math.sqrt(cn)
    var minBid = Long.MaxValue
    var nMatch = 0L
    var j = 0
    val m = block.numElements()
    while (j < m) {
      val entry = block.getStruct(j, 3)
      val denom = cnorm * entry.getDouble(2)
      if (denom > 0) {
        val bvec = entry.getArray(1)
        val n = math.min(nv, bvec.numElements())
        var acc = 0.0
        var k = 0
        while (k < n) {
          acc += VecKernels.get(vec, k, vFloat) * VecKernels.get(bvec, k, bFloat)
          k += 1
        }
        if (acc / denom >= threshold) {
          nMatch += 1L
          val bid = entry.getLong(0)
          if (bid < minBid) minBid = bid
        }
      }
      j += 1
    }
    if (nMatch == 0L) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](minBid, nMatch))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nv = ctx.freshName("nv")
      val cn = ctx.freshName("cn")
      val cnorm = ctx.freshName("cnorm")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val entry = ctx.freshName("entry")
      val denom = ctx.freshName("denom")
      val bvec = ctx.freshName("bvec")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val minBid = ctx.freshName("minBid")
      val nMatch = ctx.freshName("nMatch")
      val bid = ctx.freshName("bid")
      s"""
         |int $nv = $a.numElements();
         |double $cn = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  double $v = ${VecKernels.accessor(a, i, vFloat)};
         |  $cn += $v * $v;
         |}
         |double $cnorm = java.lang.Math.sqrt($cn);
         |long $minBid = Long.MAX_VALUE;
         |long $nMatch = 0L;
         |int $m = $b.numElements();
         |for (int $j = 0; $j < $m; $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $entry = $b.getStruct($j, 3);
         |  double $denom = $cnorm * $entry.getDouble(2);
         |  if ($denom > 0) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $bvec = $entry.getArray(1);
         |    int $n = java.lang.Math.min($nv, $bvec.numElements());
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $acc += ${VecKernels.accessor(a, k, vFloat)} * ${VecKernels.accessor(bvec, k, bFloat)};
         |    }
         |    if ($acc / $denom >= $threshold) {
         |      $nMatch += 1L;
         |      long $bid = $entry.getLong(0);
         |      if ($bid < $minBid) $minBid = $bid;
         |    }
         |  }
         |}
         |if ($nMatch == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$minBid, $nMatch});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σⱼ wⱼ·vⱼ with the accumulator SEEDED by the first term (w₀·v₀), not
  * 0.0 — bit-identical to the left-associated column fold
  * `w₀·v₀ + w₁·v₁ + …` it replaces (a 0.0 seed would differ on the −0.0
  * corner), and to the oracle's unrolled `(s0)*v[1] + (s1)*v[2] + …`.
  * NULL when the vector is shorter than the weight row — the same result
  * the fold produced via an out-of-range `element_at`.
  *
  * Exists because the unrolled fold's generated code is O(terms): at
  * 16×64 sign projections (rp1/s5), 1024 multiply-add expression nodes
  * landed in ONE generated method, blew janino's 64 KB method limit, and
  * silently fell back to interpreted evaluation on the hot projection
  * path. This kernel is a 4-line loop per output dim.
  */
case class FloatVecWeightedSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val rFloat = VecKernels.isFloat(right.dataType)

  override def nullSafeEval(w: Any, v: Any): Any = {
    val (x, y) = (w.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n == 0 || y.numElements() < n) null
    else {
      var acc = x.getDouble(0) * VecKernels.get(y, 0, rFloat)
      var i = 1
      while (i < n) {
        acc += x.getDouble(i) * VecKernels.get(y, i, rFloat)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, v) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $w.numElements();
         |if ($n == 0 || $v.numElements() < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = $w.getDouble(0) * ${VecKernels.accessor(v, "0", rFloat)};
         |  for (int $i = 1; $i < $n; $i++) {
         |    $acc += $w.getDouble($i) * ${VecKernels.accessor(v, i, rFloat)};
         |  }
         |  ${ev.value} = $acc;
         |}
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
  def fblockArgmin(vec: Column, block: Column): Column =
    GraftSqlBridge.column(
      FloatVecBlockArgmin(GraftSqlBridge.expression(vec), GraftSqlBridge.expression(block)))
  def fblockCosineMatch(vec: Column, block: Column, threshold: Double): Column =
    GraftSqlBridge.column(
      FloatVecBlockCosineMatch(GraftSqlBridge.expression(vec),
        GraftSqlBridge.expression(block), threshold))
  def fweightedSum(weights: Column, vec: Column): Column =
    GraftSqlBridge.column(
      FloatVecWeightedSum(GraftSqlBridge.expression(weights),
        GraftSqlBridge.expression(vec)))
}
