package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter AGGREGATE over Spark's own `util.sketch.BloomFilter`
  * (the sketch `DataFrameStatFunctions.bloomFilter` and the runtime
  * bloom join filter use) — the distributed half of the per-file bloom
  * manifest ([[graft.sources.Manifest]]): build every file's filter in
  * ONE executor-side pass (`groupBy(_metadata.file_name)
  * .agg(bloom_agg(key))`) instead of one driver-launched job per file,
  * and probe manifests in executors ([[BloomMightContain]]) instead of
  * collecting every filter to the driver.
  *
  * The published structure (Bloom 1970, "Space/time trade-offs in hash
  * coding with allowable errors"): k hash bits per item, false positives
  * tunable via (expectedItems, fpp), NO false negatives — the pruning
  * safety law file selection relies on. Spark's implementation hashes
  * longs and UTF8 bytes; merge is bitwise OR, so partial aggregation
  * (map-side combine) is exact and order-free.
  */
object BloomSketch {

  /** Aggregate long/int/string keys into one serialized bloom filter
    * sized for `expectedItems` at `fpp`. Nulls are skipped. Size the
    * filter for the LARGEST group (a bloom sized over holds its fpp;
    * one sized under degrades toward all-positive).
    */
  def bloomAgg(item: Column, expectedItems: Long, fpp: Double): Column =
    GraftSqlBridge.column(BloomBuildAgg(
      GraftSqlBridge.expression(item), expectedItems, fpp)
      .toAggregateExpression())

  /** TRUE iff the serialized filter MIGHT contain the key (no false
    * negatives) — the executor-side manifest probe.
    */
  def mightContain(bloom: Column, key: Column): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(key)))

  /** TRUE iff the serialized filter MIGHT contain ANY of the keys — the
    * BATCHED probe: one expression node and ONE deserialization per
    * manifest row however many keys are probed, where a per-key
    * `mightContain` Or-chain builds an O(keys) expression tree evaluated
    * with O(keys) deserializations per row (a 10^3-key batch = a 10^3-node
    * predicate). Keys ride as one array argument.
    */
  def mightContainAny(bloom: Column, keys: Column): Column =
    GraftSqlBridge.column(BloomMightContainAny(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(keys)))

  private[functions] def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  private[functions] def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

/** `bloom_agg(key, expectedItems, fpp)` → serialized bloom filter. */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
    with UnaryLike[Expression] {
  require(expectedItems > 0, s"expectedItems must be > 0: $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1): $fpp")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)
  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    child.eval(input) match {
      case null => ()
      case l: Long => buffer.putLong(l)
      case i: Int => buffer.putLong(i.toLong)
      case s: UTF8String => buffer.putBinary(s.getBytes)
      case other => throw new IllegalArgumentException(
        s"bloom_agg: unsupported key ${other.getClass}")
    }
    buffer
  }
  override def merge(buffer: BloomFilter, input: BloomFilter): BloomFilter =
    buffer.mergeInPlace(input)
  override def eval(buffer: BloomFilter): Any = BloomSketch.serialize(buffer)
  override def serialize(buffer: BloomFilter): Array[Byte] =
    BloomSketch.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomSketch.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomBuildAgg =
    copy(child = c)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain(bloomBytes, key)` — executor-side membership
  * probe. Deserializes per ROW, so use it on manifest-sized frames (one
  * row per file), never on data: that is exactly its job — the manifest
  * scan is KB-scale while the data it prunes is not.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback
    with BinaryLike[Expression] {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(bloom: Any, key: Any): Any = {
    val bf = BloomSketch.deserialize(bloom.asInstanceOf[Array[Byte]])
    key match {
      case l: Long => bf.mightContainLong(l)
      case i: Int => bf.mightContainLong(i.toLong)
      case s: UTF8String => bf.mightContainBinary(s.getBytes)
      case other => throw new IllegalArgumentException(
        s"bloom_might_contain: unsupported key ${other.getClass}")
    }
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BloomMightContain = copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}

/** `bloom_might_contain_any(bloomBytes, array<key>)` — the batched
  * executor-side probe: deserializes the filter ONCE per manifest row and
  * loops the key array, short-circuiting on the first possible hit. An
  * empty or null key array can match nothing → FALSE (the empty point
  * lookup selects no files).
  */
case class BloomMightContainAny(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback
    with BinaryLike[Expression] {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val bloom = left.eval(input)
    val keys = right.eval(input)
    if (bloom == null || keys == null) false
    else {
      val bf = BloomSketch.deserialize(bloom.asInstanceOf[Array[Byte]])
      val arr = keys.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val et = right.dataType.asInstanceOf[ArrayType].elementType
      var i = 0
      var hit = false
      while (!hit && i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          hit = et match {
            case LongType => bf.mightContainLong(arr.getLong(i))
            case IntegerType => bf.mightContainLong(arr.getInt(i).toLong)
            case StringType =>
              bf.mightContainBinary(arr.getUTF8String(i).getBytes)
            case other => throw new IllegalArgumentException(
              s"bloom_might_contain_any: unsupported key type $other")
          }
        }
        i += 1
      }
      hit
    }
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BloomMightContainAny = copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain_any"
}
