package graft.functions

import org.apache.datasketches.common.ArrayOfLongsSerDe
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.sampling.{VarOptItemsSketch, VarOptItemsUnion}
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable WEIGHTED-sample (VarOpt) sketch aggregates over a
  * Datasketches `VarOptItemsSketch[Long]` (Cohen, Duffield, Kaplan, Lund,
  * Thorup, "Stream sampling for variance-optimal estimation of subset
  * sums", SODA'09 — the published algorithm behind
  * `org.apache.datasketches.sampling.VarOptItemsSketch`).
  *
  * The WEIGHTED twin of the uniform reservoir ([[ReservoirSketch]]): each
  * retained item carries an ADJUSTED weight such that, for ANY subset
  * predicate, the sum of adjusted weights of matching samples is an
  * unbiased — and over all k-sample schemes variance-OPTIMAL — estimator
  * of the subset's true weight. At 100 TB this is how "how much of the
  * corpus's token mass comes from domain X?" gets answered from a
  * k-row sample instead of a full scan per question.
  *
  * Determinism contract. The sampled set is random; never pin contents.
  * Deterministic under any sharding and merge order:
  *   - `getN` is the EXACT stream length;
  *   - sample size is `min(n, k)` exactly;
  *   - every sampled item is an ACTUAL stream item (containment);
  *   - the FULL-set subset sum has ZERO variance by construction — the
  *     sum of all adjusted weights equals the exact total stream weight
  *     (SODA'09 Thm 1; up to float accumulation order, so rows gate it
  *     at a 1e-6 relative tolerance, ~10^3 x the worst-case ulp drift);
  *   - when `n <= k` the sample IS the stream with its ORIGINAL weights
  *     (exact regime).
  */
object VarOptSketch {
  private[functions] val serDe = new ArrayOfLongsSerDe

  /** Aggregate (item, weight) pairs into a serialized VarOpt partial
    * holding at most `k` weighted samples. Null items or weights are
    * skipped; weights must be positive.
    */
  def sketchAgg(item: Column, weight: Column, k: Int): Column =
    GraftSqlBridge.column(VarOptSketchAgg(
      GraftSqlBridge.expression(item),
      GraftSqlBridge.expression(weight), k).toAggregateExpression())

  /** Union-merge serialized VarOpt partials into one serialized sketch. */
  def mergeAgg(sketch: Column, k: Int): Column =
    GraftSqlBridge.column(VarOptMergeAgg(
      GraftSqlBridge.expression(sketch), k).toAggregateExpression())

  /** Serialized sketch → `struct(n, num_samples, total_weight)`:
    * exact stream length, retained count, and the zero-variance full-set
    * weight estimate (= exact total input weight up to float order).
    */
  def summary(sketch: Column): Column =
    GraftSqlBridge.column(VarOptSummary(GraftSqlBridge.expression(sketch)))

  /** Serialized sketch → `array<struct<item, weight>>` of the weighted
    * samples, ascending by item (sorted so exact-regime comparisons are
    * order-free).
    */
  def samples(sketch: Column): Column =
    GraftSqlBridge.column(VarOptSamples(GraftSqlBridge.expression(sketch)))

  private[functions] def heapify(bytes: Array[Byte])
      : VarOptItemsSketch[java.lang.Long] =
    VarOptItemsSketch.heapify(Memory.wrap(bytes), serDe)

  private[functions] def mergeTwo(k: Int,
      a: VarOptItemsSketch[java.lang.Long],
      b: VarOptItemsSketch[java.lang.Long])
      : VarOptItemsSketch[java.lang.Long] = {
    val u = VarOptItemsUnion.newInstance[java.lang.Long](k)
    u.update(a)
    u.update(b)
    u.getResult
  }
}

/** Shared plumbing: the buffer is a live `VarOptItemsSketch[Long]`,
  * spilled/shuffled via the Datasketches wire format (longs fixed-width
  * by `serDe`). Merging routes through a transient `VarOptItemsUnion` —
  * the only correct way to combine two VarOpt states (PODS'12-style
  * weighted-union bookkeeping lives in the union, not the sketch).
  */
trait VarOptAggBase extends TypedImperativeAggregate[
    VarOptItemsSketch[java.lang.Long]] {
  def k: Int
  require(k >= 2 && k <= (1 << 24), s"k must be in [2, 2^24], got $k")

  override def createAggregationBuffer(): VarOptItemsSketch[java.lang.Long] =
    VarOptItemsSketch.newInstance[java.lang.Long](k)
  override def merge(buffer: VarOptItemsSketch[java.lang.Long],
      input: VarOptItemsSketch[java.lang.Long])
      : VarOptItemsSketch[java.lang.Long] =
    VarOptSketch.mergeTwo(k, buffer, input)
  override def eval(buffer: VarOptItemsSketch[java.lang.Long]): Any =
    buffer.toByteArray(VarOptSketch.serDe)
  override def serialize(buffer: VarOptItemsSketch[java.lang.Long])
      : Array[Byte] = buffer.toByteArray(VarOptSketch.serDe)
  override def deserialize(bytes: Array[Byte])
      : VarOptItemsSketch[java.lang.Long] = VarOptSketch.heapify(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `varopt_sketch_agg(item, weight, k)` — build a partial from raw
  * (long item, numeric weight) pairs.
  */
case class VarOptSketchAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends VarOptAggBase with BinaryLike[Expression] {

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"varopt_sketch_agg: unsupported item type ${other.getClass}")
  }
  private def toWeight(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"varopt_sketch_agg: unsupported weight type ${other.getClass}")
  }

  override def update(buffer: VarOptItemsSketch[java.lang.Long],
      input: InternalRow): VarOptItemsSketch[java.lang.Long] = {
    val item = left.eval(input)
    val w = right.eval(input)
    if (item != null && w != null)
      buffer.update(java.lang.Long.valueOf(toLong(item)), toWeight(w))
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): VarOptSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VarOptSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VarOptSketchAgg =
    copy(left = l, right = r)
  override def prettyName: String = "varopt_sketch_agg"
}

/** `varopt_merge_agg(sketchBytes, k)` — union serialized partials. */
case class VarOptMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends VarOptAggBase with UnaryLike[Expression] {

  override def update(buffer: VarOptItemsSketch[java.lang.Long],
      input: InternalRow): VarOptItemsSketch[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else VarOptSketch.mergeTwo(k, buffer,
      VarOptSketch.heapify(v.asInstanceOf[Array[Byte]]))
  }
  override def withNewMutableAggBufferOffset(n: Int): VarOptMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VarOptMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): VarOptMergeAgg =
    copy(child = c)
  override def prettyName: String = "varopt_merge_agg"
}

/** Serialized sketch → `struct(n, num_samples, total_weight)`. Evaluated
  * on 1-row merged frames — CodegenFallback by design, never a hot path.
  */
case class VarOptSummary(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("num_samples", LongType, nullable = false),
    StructField("total_weight", DoubleType, nullable = false)))

  override def nullSafeEval(bytes: Any): Any = {
    val sk = VarOptSketch.heapify(bytes.asInstanceOf[Array[Byte]])
    val total =
      if (sk.getNumSamples == 0) 0.0
      else sk.estimateSubsetSum(_ => true).getTotalSketchWeight
    InternalRow(sk.getN, sk.getNumSamples.toLong, total)
  }
  override protected def withNewChildInternal(c: Expression): VarOptSummary =
    copy(child = c)
  override def prettyName: String = "varopt_summary"
}

/** Serialized sketch → `array<struct<item, weight>>`, ascending by item. */
case class VarOptSamples(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(bytes: Any): Any = {
    val sk = VarOptSketch.heapify(bytes.asInstanceOf[Array[Byte]])
    val s = sk.getSketchSamples
    val pairs = (0 until s.getNumSamples)
      .map(i => (s.items(i).longValue(), s.weights(i)))
      .sortBy(p => (p._1, p._2))
    new GenericArrayData(pairs.map(p => InternalRow(p._1, p._2)))
  }
  override protected def withNewChildInternal(c: Expression): VarOptSamples =
    copy(child = c)
  override def prettyName: String = "varopt_samples"
}
