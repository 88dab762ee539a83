package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy-hitters) sketch aggregates over a
  * Datasketches `ItemsSketch[String]` (Misra-Gries / space-saving family,
  * Anderson et al., "A high-performance algorithm for identifying frequent
  * items in data streams", IMC'17 — the published algorithm behind
  * `org.apache.datasketches.frequencies`).
  *
  * This is the top-k analog of the HLL fan-in (p11c/p11d): each shard
  * aggregates a KB-scale sketch partial where the data lives, the partials
  * are union-merged at the coordinator, and only then are the frequent
  * items read out — at 100 TB / 2e9-key cardinality this replaces the full
  * `groupBy(key).count` shuffle (hh1's exact shape) with a
  * `maxMapSize`-bounded state per shard, at the cost of estimates that
  * carry explicit `[lowerBound, upperBound]` error intervals.
  *
  * Guarantees that survive ANY sharding and merge order (and are therefore
  * safe to gate deterministically in an oracle row even though the exact
  * retained-item set depends on stream order):
  *   - every retained item's interval brackets its true count
  *     (`lb <= true <= ub`);
  *   - NO_FALSE_NEGATIVES readout returns every item whose true count
  *     exceeds the sketch's `getMaximumError` (so genuinely heavy keys —
  *     share above ~3.5/maxMapSize — can never be missed);
  *   - the retained state never exceeds ~0.75*maxMapSize entries.
  */
object FreqSketch {
  private[functions] val serDe = new ArrayOfStringsSerDe

  /** Aggregate raw string keys into a serialized sketch partial. */
  def sketchAgg(item: Column, maxMapSize: Int): Column =
    GraftSqlBridge.column(StringFreqSketchAgg(
      GraftSqlBridge.expression(item), maxMapSize).toAggregateExpression())

  /** Union-merge serialized sketch partials into one serialized sketch. */
  def mergeAgg(sketch: Column, maxMapSize: Int): Column =
    GraftSqlBridge.column(StringFreqSketchMergeAgg(
      GraftSqlBridge.expression(sketch), maxMapSize).toAggregateExpression())

  /** Read a serialized sketch out as
    * `array<struct<item, estimate, lower_bound, upper_bound>>` under the
    * NO_FALSE_NEGATIVES error type (all items with `ub > maximumError`).
    */
  def items(sketch: Column): Column =
    GraftSqlBridge.column(FreqSketchItems(GraftSqlBridge.expression(sketch)))

  /** The merged sketch's a-posteriori maximum error (0 in exact regime). */
  def maxError(sketch: Column): Column =
    GraftSqlBridge.column(FreqSketchMaxError(GraftSqlBridge.expression(sketch)))
}

/** Shared TypedImperativeAggregate plumbing for the two sketch aggregates:
  * the buffer is a live `ItemsSketch[String]`, spilled/shuffled via the
  * Datasketches wire format (strings length-prefixed by `serDe`).
  */
trait FreqSketchAggBase extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {
  def maxMapSize: Int
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  override def merge(buffer: ItemsSketch[String],
      input: ItemsSketch[String]): ItemsSketch[String] = buffer.merge(input)
  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serDe)
  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqSketch.serDe)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `freq_sketch_agg(item, maxMapSize)` — build a partial from raw keys. */
case class StringFreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqSketchAggBase {

  override def update(buffer: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): StringFreqSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StringFreqSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): StringFreqSketchAgg =
    copy(child = c)
  override def prettyName: String = "freq_sketch_agg"
}

/** `freq_sketch_merge_agg(sketchBytes, maxMapSize)` — union serialized
  * partials (the shard fan-in / durable-index reload path).
  */
case class StringFreqSketchMergeAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqSketchAggBase {

  override def update(buffer: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), FreqSketch.serDe))
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): StringFreqSketchMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StringFreqSketchMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): StringFreqSketchMergeAgg =
    copy(child = c)
  override def prettyName: String = "freq_sketch_merge_agg"
}

/** Serialized sketch → `array<struct<...>>` of NO_FALSE_NEGATIVES frequent
  * items, descending estimate. Evaluated once on a merged one-row frame —
  * deliberately CodegenFallback, never a hot path.
  */
case class FreqSketchItems(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower_bound", LongType, nullable = false),
    StructField("upper_bound", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(bytes: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]), FreqSketch.serDe)
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map { r =>
      InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound)
    })
  }
  override protected def withNewChildInternal(c: Expression): FreqSketchItems =
    copy(child = c)
  override def prettyName: String = "freq_sketch_items"
}

/** Serialized sketch → `getMaximumError` (long): the half-width of every
  * estimate interval; 0 iff the sketch never purged (exact regime).
  */
case class FreqSketchMaxError(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullSafeEval(bytes: Any): Any =
    ItemsSketch.getInstance(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]), FreqSketch.serDe)
      .getMaximumError
  override protected def withNewChildInternal(c: Expression): FreqSketchMaxError =
    copy(child = c)
  override def prettyName: String = "freq_sketch_max_error"
}
