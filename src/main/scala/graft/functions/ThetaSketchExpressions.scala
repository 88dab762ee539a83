package graft.functions

import org.apache.datasketches.common.Family
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{AnotB, SetOperation, Sketch, Union}
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregates and SET OPERATIONS (Datasketches theta family —
  * the published KMV/theta algorithm, Dasgupta et al., "Theta-join
  * sketches"/DataSketches: A library of stochastic streaming algorithms).
  *
  * HLL (p11*) answers "how many distinct"; theta answers the question HLL
  * cannot: set ALGEBRA over distinct sets — `|A ∩ B|`, `|A \ B|` across
  * segments, cohorts, crawls — in KB of sketch state instead of the
  * full-shuffle exact distinct-join. Build per-shard partials where the
  * data lives ([[ThetaSketchAgg]]), union-merge the KB partials
  * ([[ThetaUnionAgg]]), then intersect/difference the merged segment
  * sketches driver-side in constant space ([[ThetaSetEstimate]]).
  *
  * Determinism contract (what the oracle rows may gate on): below the
  * nominal-entries threshold a theta sketch retains EVERY distinct hash —
  * `isEstimationMode == false` — and estimates of union/intersection/
  * difference are EXACT and independent of sharding and merge order. In
  * estimation mode the published `[getLowerBound(2), getUpperBound(2)]`
  * interval brackets the truth with 95.4% confidence per sketch — a
  * statistical statement, so lossy-regime gates belong in specs (seeded,
  * fixed inputs), not oracle rows.
  */
object ThetaSketch {
  /** Aggregate raw keys (long or string) into a serialized compact theta
    * sketch partial with `nominalEntries` (power of two) retained-hash
    * budget. Null inputs are skipped.
    */
  def sketchAgg(item: Column, nominalEntries: Int): Column =
    GraftSqlBridge.column(ThetaSketchAgg(
      GraftSqlBridge.expression(item), nominalEntries).toAggregateExpression())

  /** Union-merge serialized compact sketches into one compact sketch. */
  def unionAgg(sketch: Column, nominalEntries: Int): Column =
    GraftSqlBridge.column(ThetaUnionAgg(
      GraftSqlBridge.expression(sketch), nominalEntries).toAggregateExpression())

  /** Estimate of a serialized compact sketch (exact when the sketch never
    * hit its nominal-entries budget).
    */
  def estimate(sketch: Column): Column =
    GraftSqlBridge.column(ThetaEstimate(GraftSqlBridge.expression(sketch)))

  /** `|A ∪ B|`, `|A ∩ B|` or `|A \ B|` of two serialized compact sketches
    * — op is one of "union", "intersect", "anotb".
    */
  def setEstimate(a: Column, b: Column, op: String): Column =
    GraftSqlBridge.column(ThetaSetEstimate(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), op))

  /** TRUE iff the serialized sketch is in estimation mode (has discarded
    * hashes) — the exact-regime witness oracle rows gate on.
    */
  def isEstimation(sketch: Column): Column =
    GraftSqlBridge.column(ThetaIsEstimation(GraftSqlBridge.expression(sketch)))

  private[functions] def heapify(bytes: Array[Byte]): Sketch =
    Sketch.heapify(Memory.wrap(bytes))
}

/** Shared plumbing: the buffer is a live theta `Union` (so build and merge
  * are the same machine), spilled via the union's own wire format and
  * finalized to compact-sketch bytes.
  */
trait ThetaAggBase extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {
  def nominalEntries: Int
  require(nominalEntries >= 16 && (nominalEntries & (nominalEntries - 1)) == 0,
    s"nominalEntries must be a power of two >= 16, got $nominalEntries")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()
  override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult)
    buffer
  }
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `theta_sketch_agg(item, nominalEntries)` — build from raw keys. */
case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case l: Long => buffer.update(l)
      case i: Int => buffer.update(i.toLong)
      case s: UTF8String => buffer.update(s.toString)
      case other => throw new IllegalArgumentException(
        s"theta_sketch_agg: unsupported key ${other.getClass}")
    }
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "theta_sketch_agg"
}

/** `theta_union_agg(sketchBytes, nominalEntries)` — the shard fan-in. */
case class ThetaUnionAgg(
    child: Expression,
    nominalEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buffer.union(ThetaSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
  override def prettyName: String = "theta_union_agg"
}

/** Serialized compact sketch → estimate (double; exact in exact regime). */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(bytes: Any): Any =
    ThetaSketch.heapify(bytes.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
  override def prettyName: String = "theta_estimate"
}

/** Serialized compact sketch → estimation-mode flag. */
case class ThetaIsEstimation(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(bytes: Any): Any =
    ThetaSketch.heapify(bytes.asInstanceOf[Array[Byte]]).isEstimationMode
  override protected def withNewChildInternal(c: Expression): ThetaIsEstimation =
    copy(child = c)
  override def prettyName: String = "theta_is_estimation"
}

/** Set-algebra estimate over two serialized compact sketches. Evaluated on
  * 1-row merged frames — CodegenFallback by design, never a hot path.
  */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  require(Set("union", "intersect", "anotb")(op), s"unknown theta op $op")

  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaSketch.heapify(a.asInstanceOf[Array[Byte]])
    val sb = ThetaSketch.heapify(b.asInstanceOf[Array[Byte]])
    op match {
      case "union" =>
        val u = SetOperation.builder().buildUnion()
        u.union(sa); u.union(sb); u.getResult.getEstimate
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb); i.getResult.getEstimate
      case "anotb" =>
        val d = SetOperation.builder().build(Family.A_NOT_B)
          .asInstanceOf[AnotB]
        d.setA(sa); d.notB(sb); d.getResult(true).getEstimate
    }
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaSetEstimate = copy(left = l, right = r)
  override def prettyName: String = s"theta_$op"
}
