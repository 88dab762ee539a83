package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketch aggregates over a Datasketches
  * `KllDoublesSketch` (Karnin, Lang, Liberty, "Optimal quantile
  * approximation in streams", FOCS'16 — the published algorithm behind
  * `org.apache.datasketches.kll`).
  *
  * The quantile member of the mergeable-sketch family: distinct-count
  * (HLL, p11c/p11d), top-k (frequent-items, hh2) and set algebra (theta,
  * th1) all aggregate KB partials where the data lives, union-merge once,
  * and read out at the coordinator — this closes the gap for QUANTILES,
  * replacing the "profile a 100 TB column" global sort / driver-side
  * `approxQuantile` (p12's shape) with ~`3k` retained doubles per shard.
  *
  * Determinism contract (what oracle rows may gate on). KLL compaction is
  * RANDOMIZED — the level-halving offset is a coin flip (FOCS'16 §2), so
  * unlike HLL/theta the merged sketch is NOT invariant across runs or
  * shardings, and no estimate may be pinned by value. What IS deterministic
  * and safe to gate:
  *   - `getN` is the EXACT stream length, preserved by any merge order;
  *   - `getMinItem`/`getMaxItem` are EXACT stream extremes (tracked
  *     outside the compactors);
  *   - every quantile estimate is an ACTUAL stream value (KLL retains
  *     items, never interpolates under INCLUSIVE readout);
  *   - estimates are monotone in the requested rank.
  * The rank-error theorem itself (|trueRank(q̂_r) − r| ≤ ε(k) with 99%
  * confidence, ε independent of n) is statistical, so rows gate it at
  * TWICE the published ε — a ≈5σ event to breach under the KLL error
  * model — in the atom-safe two-sided form
  * `count(v ≤ q̂)/n ≥ r − 2ε  AND  count(v < q̂)/n ≤ r + 2ε`
  * (the strict/non-strict split keeps heavy atoms from faking a breach).
  */
object KllSketch {
  /** Aggregate raw numeric values into a serialized KLL sketch partial
    * with parameter `k` (accuracy/size knob; ε(200) ≈ 1.33%).
    */
  def sketchAgg(value: Column, k: Int): Column =
    GraftSqlBridge.column(KllSketchAgg(
      GraftSqlBridge.expression(value), k).toAggregateExpression())

  /** Union-merge serialized sketch partials into one serialized sketch
    * (the shard fan-in / durable-index reload path).
    */
  def mergeAgg(sketch: Column, k: Int): Column =
    GraftSqlBridge.column(KllMergeAgg(
      GraftSqlBridge.expression(sketch), k).toAggregateExpression())

  /** Quantile estimate at normalized rank `rank` (INCLUSIVE search:
    * the smallest retained value whose rank estimate is ≥ `rank`).
    * NULL for an empty sketch.
    */
  def quantile(sketch: Column, rank: Double): Column =
    GraftSqlBridge.column(KllQuantile(GraftSqlBridge.expression(sketch), rank))

  /** Normalized-rank estimate of `value` (INCLUSIVE). NULL when empty. */
  def rank(sketch: Column, value: Column): Column =
    GraftSqlBridge.column(KllRank(
      GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(value)))

  /** One-struct readout of the sketch's deterministic surface:
    * `struct(n, min_item, max_item, num_retained, rank_error,
    * is_estimation)` — `rank_error` is the 99%-confidence normalized
    * single-rank ε(k).
    */
  def summary(sketch: Column): Column =
    GraftSqlBridge.column(KllSummary(GraftSqlBridge.expression(sketch)))

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Shared plumbing: the buffer is a live `KllDoublesSketch`, spilled and
  * shuffled via the Datasketches wire format.
  */
trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {
  def k: Int
  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(buffer: KllDoublesSketch,
      input: KllDoublesSketch): KllDoublesSketch = {
    if (!input.isEmpty) buffer.merge(input)
    buffer
  }
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketch.heapify(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `kll_sketch_agg(value, k)` — build a partial from raw numeric values
  * (nulls skipped).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    child.eval(input) match {
      case null => ()
      case d: Double => buffer.update(d)
      case f: Float => buffer.update(f.toDouble)
      case l: Long => buffer.update(l.toDouble)
      case i: Int => buffer.update(i.toDouble)
      case d: Decimal => buffer.update(d.toDouble)
      case other => throw new IllegalArgumentException(
        s"kll_sketch_agg: unsupported value type ${other.getClass}")
    }
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
  override def prettyName: String = "kll_sketch_agg"
}

/** `kll_merge_agg(sketchBytes, k)` — union serialized partials. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val sk = KllSketch.heapify(v.asInstanceOf[Array[Byte]])
      if (!sk.isEmpty) buffer.merge(sk)
    }
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
  override def prettyName: String = "kll_merge_agg"
}

/** Serialized sketch → quantile at a literal normalized rank. Evaluated on
  * 1-row merged frames — CodegenFallback by design, never a hot path.
  */
case class KllQuantile(child: Expression, rank: Double)
  extends UnaryExpression with CodegenFallback {
  require(rank >= 0.0 && rank <= 1.0, s"rank must be in [0,1], got $rank")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(bytes: Any): Any = {
    val sk = KllSketch.heapify(bytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildInternal(c: Expression): KllQuantile =
    copy(child = c)
  override def prettyName: String = "kll_quantile"
}

/** `(sketch, value)` → normalized-rank estimate of `value` (INCLUSIVE:
  * estimated fraction of the stream ≤ value).
  */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(bytes: Any, value: Any): Any = {
    val sk = KllSketch.heapify(bytes.asInstanceOf[Array[Byte]])
    val v = value match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"kll_rank: unsupported value type ${other.getClass}")
    }
    if (sk.isEmpty) null else sk.getRank(v, QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllRank = copy(left = l, right = r)
  override def prettyName: String = "kll_rank"
}

/** Serialized sketch → `struct(n, min_item, max_item, num_retained,
  * rank_error, is_estimation)` — the deterministic readout surface
  * (min/max NULL for an empty sketch).
  */
case class KllSummary(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("min_item", DoubleType, nullable = true),
    StructField("max_item", DoubleType, nullable = true),
    StructField("num_retained", LongType, nullable = false),
    StructField("rank_error", DoubleType, nullable = false),
    StructField("is_estimation", BooleanType, nullable = false)))

  override def nullSafeEval(bytes: Any): Any = {
    val sk = KllSketch.heapify(bytes.asInstanceOf[Array[Byte]])
    InternalRow(
      sk.getN,
      if (sk.isEmpty) null else sk.getMinItem,
      if (sk.isEmpty) null else sk.getMaxItem,
      sk.getNumRetained.toLong,
      sk.getNormalizedRankError(false),
      sk.isEstimationMode)
  }
  override protected def withNewChildInternal(c: Expression): KllSummary =
    copy(child = c)
  override def prettyName: String = "kll_summary"
}
