package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's `bucket` function — the shared contract behind
  * STORAGE-PARTITIONED JOINS: [[graft.sources.Snapshots
  * .optimizeBucketed]] lays files out so every file holds exactly one
  * `bucket(n, key)` value, the scan reports that layout as
  * `KeyGroupedPartitioning(bucket(n, key))`, and Spark resolves the
  * transform back to THIS function through the catalog
  * (`FunctionCatalog.loadFunction("bucket")`) to prove both join sides
  * cluster identically — the Iceberg SPJ shape (public
  * SupportsReportPartitioning / V2 function API).
  *
  * The function itself is deliberately simple and FROZEN:
  * `floorMod(key, n)` over integral keys (NULL keys land in bucket 0).
  * Both the writer and the planner evaluate the same [[GraftBucket.id]],
  * and `canonicalName` identifies it across scans — changing the
  * formula would silently mis-join existing layouts, so it never
  * changes; a new formula would be a NEW function name.
  */
object GraftBucket {
  /** Bucket of an integral key: non-negative, stable, NULL → 0. */
  def id(numBuckets: Int, key: Long): Int =
    java.lang.Math.floorMod(key, numBuckets.toLong).toInt

  /** Null-safe boxed form — the one rule every STAMPING surface shares
    * (NULL keys land in bucket 0); the udf the relayout and library
    * writers wrap.
    */
  def idNullSafe(numBuckets: Int, key: java.lang.Long): Int =
    id(numBuckets, if (key == null) 0L else key.longValue())

  /** Row-level bucket extractor for the DSv2 writers: dispatches once
    * on the column's integral type, NULL → bucket 0. ONE definition so
    * the batch, streaming, and delta writers can never drift on the
    * layout contract (a divergence would silently break cross-surface
    * bucket purity).
    */
  def rowExtractor(schema: StructType, col: String, numBuckets: Int)
      : InternalRow => Int = {
    val i = schema.fieldIndex(col)
    val keyOf: InternalRow => Long = schema(i).dataType match {
      case LongType => r => r.getLong(i)
      case IntegerType => r => r.getInt(i).toLong
      case ShortType => r => r.getShort(i).toLong
      case ByteType => r => r.getByte(i).toLong
      case dt => throw new IllegalArgumentException(
        s"bucket column '$col' must be integral, got $dt")
    }
    r => id(numBuckets, if (r.isNullAt(i)) 0L else keyOf(r))
  }
}

object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(key, numBuckets): floorMod bucket id of an integral key — " +
      "the storage-partitioned-join clustering function"

  /** Spark's SPJ resolution binds with (IntegerType, keyType) — the
    * transform's numBuckets literal first, its column second
    * (V2ExpressionUtils.toCatalystTransformOpt).
    */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, key), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"numBuckets must be INT, got ${inputType.fields(0).dataType}")
    inputType.fields(1).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        new GraftBucketBound(inputType.fields(1).dataType)
      case dt => throw new UnsupportedOperationException(
        s"graft bucket supports integral keys, got $dt")
    }
  }
}

final class GraftBucketBound(keyType: DataType)
  extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val key: Long =
      if (input.isNullAt(1)) 0L
      else keyType match {
        case LongType => input.getLong(1)
        case IntegerType => input.getInt(1).toLong
        case ShortType => input.getShort(1).toLong
        case _ => input.getByte(1).toLong
      }
    Integer.valueOf(GraftBucket.id(n, key))
  }
}
