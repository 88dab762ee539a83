package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.sampling.{ReservoirLongsSketch, ReservoirLongsUnion}
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable uniform-sample (reservoir) sketch aggregates over a
  * Datasketches `ReservoirLongsSketch` (Vitter, "Random sampling with a
  * reservoir", TOMS'85, with the mergeable-union extension of Agarwal et
  * al., "Mergeable summaries", PODS'12 — the published algorithms behind
  * `org.apache.datasketches.sampling`).
  *
  * The SAMPLE member of the mergeable-sketch family: distinct-count
  * (HLL, p11c/p11d), top-k (frequent-items, hh2), set algebra (theta,
  * th1) and quantiles (KLL, kll1) all aggregate KB partials where the
  * data lives and union-merge once; this closes the gap for "give me k
  * uniformly random rows of a 100 TB table" — the seed of every eyeball
  * audit, labeling batch, or held-out slice — without the global
  * `ORDER BY rand() LIMIT k` sort such a sample naively costs.
  *
  * Determinism contract (what oracle rows may gate on). The sampled SET
  * is random by construction — never pin sample contents. What IS
  * deterministic under ANY sharding and merge order:
  *   - `getN` is the EXACT stream length (longs are counted, not
  *     sampled; unions sum the exact counts);
  *   - the sample size is `min(n, k)` exactly;
  *   - when `n <= k` the reservoir IS the stream (exact regime — the
  *     sorted sample equals the sorted input multiset);
  *   - every sampled value is an ACTUAL stream value (containment);
  *   - over a duplicate-free stream the sample is duplicate-free
  *     (sampling is without replacement; the PODS'12 union preserves
  *     this over disjoint shards).
  */
object ReservoirSketch {
  /** Aggregate raw long values into a serialized reservoir partial
    * holding at most `k` samples.
    */
  def sketchAgg(value: Column, k: Int): Column =
    GraftSqlBridge.column(ReservoirSketchAgg(
      GraftSqlBridge.expression(value), k).toAggregateExpression())

  /** Union-merge serialized reservoir partials into one serialized
    * reservoir (the shard fan-in / durable-index reload path).
    */
  def mergeAgg(sketch: Column, k: Int): Column =
    GraftSqlBridge.column(ReservoirMergeAgg(
      GraftSqlBridge.expression(sketch), k).toAggregateExpression())

  /** Serialized reservoir → exact stream length `n`. */
  def n(sketch: Column): Column =
    GraftSqlBridge.column(ReservoirN(GraftSqlBridge.expression(sketch)))

  /** Serialized reservoir → `array<long>` of the retained samples,
    * ASCENDING (sorted so the exact-regime set comparison is order-free;
    * the reservoir's internal order is an implementation detail).
    */
  def samples(sketch: Column): Column =
    GraftSqlBridge.column(ReservoirSamples(GraftSqlBridge.expression(sketch)))

  private[functions] def emptySketchBytes(k: Int): Array[Byte] =
    ReservoirLongsSketch.newInstance(k).toByteArray

  private[functions] def heapify(bytes: Array[Byte]): ReservoirLongsSketch =
    ReservoirLongsSketch.heapify(Memory.wrap(bytes))
}

/** Shared plumbing: the buffer is a live `ReservoirLongsUnion` (the union
  * accepts raw longs AND serialized partials, so both aggregates share
  * it); spill/shuffle serialization goes through the RESULT sketch's wire
  * format — a union's state IS its current result reservoir, so
  * round-tripping through the sketch format is lossless and keeps a
  * single on-wire format for buffers, outputs, and durable indexes.
  */
trait ReservoirAggBase extends TypedImperativeAggregate[ReservoirLongsUnion]
    with UnaryLike[Expression] {
  def k: Int
  require(k >= 2 && k <= (1 << 24), s"k must be in [2, 2^24], got $k")

  override def createAggregationBuffer(): ReservoirLongsUnion =
    ReservoirLongsUnion.newInstance(k)
  override def merge(buffer: ReservoirLongsUnion,
      input: ReservoirLongsUnion): ReservoirLongsUnion = {
    val r = input.getResult
    if (r != null) buffer.update(r)
    buffer
  }
  private def resultBytes(buffer: ReservoirLongsUnion): Array[Byte] =
    Option(buffer.getResult).fold(ReservoirSketch.emptySketchBytes(k))(
      _.toByteArray)
  override def eval(buffer: ReservoirLongsUnion): Any = resultBytes(buffer)
  override def serialize(buffer: ReservoirLongsUnion): Array[Byte] =
    resultBytes(buffer)
  override def deserialize(bytes: Array[Byte]): ReservoirLongsUnion = {
    val u = ReservoirLongsUnion.newInstance(k)
    u.update(Memory.wrap(bytes))
    u
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `reservoir_sketch_agg(value, k)` — build a partial from raw longs
  * (nulls skipped; integral types widened).
  */
case class ReservoirSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ReservoirAggBase {

  override def update(buffer: ReservoirLongsUnion,
      input: InternalRow): ReservoirLongsUnion = {
    child.eval(input) match {
      case null => ()
      case l: Long => buffer.update(l)
      case i: Int => buffer.update(i.toLong)
      case s: Short => buffer.update(s.toLong)
      case b: Byte => buffer.update(b.toLong)
      case other => throw new IllegalArgumentException(
        s"reservoir_sketch_agg: unsupported value type ${other.getClass}")
    }
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): ReservoirSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ReservoirSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ReservoirSketchAgg =
    copy(child = c)
  override def prettyName: String = "reservoir_sketch_agg"
}

/** `reservoir_merge_agg(sketchBytes, k)` — union serialized partials. */
case class ReservoirMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ReservoirAggBase {

  override def update(buffer: ReservoirLongsUnion,
      input: InternalRow): ReservoirLongsUnion = {
    val v = child.eval(input)
    if (v != null) buffer.update(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): ReservoirMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ReservoirMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ReservoirMergeAgg =
    copy(child = c)
  override def prettyName: String = "reservoir_merge_agg"
}

/** Serialized reservoir → exact stream length `n` (a counted long, never
  * an estimate). Evaluated on 1-row merged frames — CodegenFallback by
  * design, never a hot path.
  */
case class ReservoirN(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullSafeEval(bytes: Any): Any =
    ReservoirSketch.heapify(bytes.asInstanceOf[Array[Byte]]).getN
  override protected def withNewChildInternal(c: Expression): ReservoirN =
    copy(child = c)
  override def prettyName: String = "reservoir_n"
}

/** Serialized reservoir → ascending `array<long>` of retained samples. */
case class ReservoirSamples(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(bytes: Any): Any = {
    val sk = ReservoirSketch.heapify(bytes.asInstanceOf[Array[Byte]])
    val s = if (sk.getNumSamples == 0) Array.emptyLongArray else sk.getSamples
    new GenericArrayData(s.sorted)
  }
  override protected def withNewChildInternal(c: Expression): ReservoirSamples =
    copy(child = c)
  override def prettyName: String = "reservoir_samples"
}
