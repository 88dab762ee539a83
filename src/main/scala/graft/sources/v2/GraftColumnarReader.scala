package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarBatch, ColumnarMap}

/** COLUMNAR partition reader over Spark's `VectorizedParquetRecordReader`
  * — the full-surface fast path: unlike the r17 clean-scan-only columnar
  * reader, this one serves EVERY batch scan shape the row reader serves,
  * so the first MERGE / GDPR erasure / ALTER no longer de-vectorizes the
  * table (the Delta DV-read discipline):
  *
  *  - POSITION-DELETE SIDECARS apply as a SELECTION over batch row
  *    indexes: the requested schema carries Spark's row-index temporary
  *    column (`_tmp_metadata_row_index`), which the vectorized reader
  *    fills with exact FILE ORDINALS even when a pushed FilterPredicate
  *    skips row groups — precisely the position space the sidecars mark.
  *    Batches with no marked row pass through untouched (zero overhead
  *    after the marks' neighborhoods); batches with marks re-expose the
  *    reader's vectors through [[SelectedColumnVector]] (an index
  *    indirection, still columnar — no row materialization, no copy).
  *  - PER-FILE SCHEMA ADAPTATION replaces the r17 whole-scan uniform-
  *    fingerprint refusal: a column ABSENT from this file (ADD COLUMN
  *    history) is simply requested and null-filled by Spark's reader; a
  *    RENAMED column resolves through the rename chain to this file's
  *    physical name; a WIDENED column is requested at its target type
  *    and Spark's updaters widen INT32→long / FLOAT→double in the batch.
  *  - METADATA COLUMNS serve columnar too: `_file` is a per-partition
  *    `ConstantColumnVector`, `_pos` IS the row-index vector — so
  *    MERGE/UPDATE row-level scans (which read the whole table plus row
  *    identity) ride the vectorized reader.
  *  - PUSHED FILTERS translate to parquet `FilterPredicate`s bound
  *    against THIS file's physical schema (names remapped through the
  *    rename chain; `ParquetFilters` itself refuses value/physical-type
  *    mismatches such as an out-of-int-range long on a pre-widen INT32
  *    column — the residual above the scan re-evaluates either way).
  *
  * Row-position safety is the load-bearing invariant: `_pos` and the dv
  * selection both come from the reader's own row-index generator, which
  * derives them from the page-store's row-index offsets — exact under
  * row-group skipping, page skipping, and any future reader reordering;
  * never reconstructed by counting rows.
  */
class GraftColumnarReader(p: GraftInputPartition)
    extends PartitionReader[ColumnarBatch] {
  import GraftColumnarReader._

  private val conf: Configuration = {
    val c = new Configuration(false)
    p.confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val path = new org.apache.hadoop.fs.Path(p.path)

  // this file's deleted positions (sorted ordinals), executor-resolved
  private val dv: Array[Long] =
    GraftDvPositions.forFile(conf, p.tableRoot, p.dvNames, p.fileName)

  // equality-delete key sets scoped to this file (executor-resolved,
  // KB-scale): rows whose key lands in a set vanish from the selection
  // exactly like dv-marked positions
  private val eqSets: Seq[(String, Boolean, java.util.HashSet[AnyRef])] =
    if (p.eqDeletes.isEmpty) Seq.empty
    else GraftEqKeys.forSidecars(conf, p.tableRoot, p.eqDeletes)

  private val dataFields: Array[StructField] =
    p.required.fields.filter(f => !GraftMetaColumns.isMeta(f.name))
  // eq key columns the projection pruned away are requested INTERNALLY
  // (between the data columns and the row-index column; never exposed)
  private val extraEqFields: Array[StructField] =
    eqSets.map(k => (k._1, k._2)).distinct
      .filterNot { case (kc, _) => dataFields.exists(_.name == kc) }
      .map { case (kc, isStr) =>
        StructField(kc, if (isStr) StringType else LongType,
          nullable = true)
      }.toArray
  private val posRequested: Boolean =
    p.required.fields.exists(_.name == GraftMetaColumns.Pos)
  private val needPos: Boolean = dv.nonEmpty || posRequested

  // ONE footer per partition: read once on the task's own stream, used
  // for physical-name resolution (rename chain) AND FilterPredicate
  // binding, then HANDED to the vectorized reader (whose initialize
  // would otherwise re-read it) — one footer I/O per file per scan
  // instead of two; on object storage that is one GET saved per file on
  // every mapped or filtered scan. [[GraftVectorizedAudit.footerReads]]
  // counts these reads so specs can pin the per-file total at exactly 1.
  private val inputFile: org.apache.parquet.hadoop.util.HadoopInputFile =
    p.bytesHint match {
      case Some(len) => // manifest byte stats: skip the getFileStatus HEAD
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(
          new org.apache.hadoop.fs.FileStatus(len, false, 1, len, 0L,
            path), conf)
      case None =>
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
    }
  private val inputStream: org.apache.parquet.io.SeekableInputStream =
    inputFile.newStream()
  private val footer: org.apache.parquet.hadoop.metadata.ParquetMetadata =
    try {
      GraftVectorizedAudit.footerReads.incrementAndGet()
      org.apache.parquet.hadoop.ParquetFileReader.readFooter(inputFile,
        org.apache.parquet.HadoopReadOptions.builder(conf, path).build(),
        inputStream)
    } catch {
      case t: Throwable =>
        inputStream.close()
        throw t
    }
  private val fileSchema: org.apache.parquet.schema.MessageType =
    footer.getFileMetaData.getSchema
  private val fileFieldNames: Set[String] = {
    import scala.jdk.CollectionConverters._
    fileSchema.getFields.asScala.map(_.getName).toSet
  }

  /** This file's physical name for a logical column — the newest name
    * in the rename chain the footer actually holds; the logical name
    * itself when no maps ride the scan or nothing matches (column
    * absent: Spark's reader null-fills it).
    */
  private def physName(logical: String): String =
    if (p.maps.isEmpty) logical
    else ParquetRowReader.physicalCandidates(logical, p.maps)
      .find(fileFieldNames.contains).getOrElse(logical)

  /** Rewrite a pushed filter's column references to this file's
    * physical names. Unknown filter shapes pass through untouched —
    * `ParquetFilters` refuses names it cannot bind, so a stale logical
    * reference can only cost pruning, never correctness.
    */
  private def remapFilter(f: sources.Filter): sources.Filter = f match {
    case sources.EqualTo(c, v) => sources.EqualTo(physName(c), v)
    case sources.GreaterThan(c, v) => sources.GreaterThan(physName(c), v)
    case sources.GreaterThanOrEqual(c, v) =>
      sources.GreaterThanOrEqual(physName(c), v)
    case sources.LessThan(c, v) => sources.LessThan(physName(c), v)
    case sources.LessThanOrEqual(c, v) =>
      sources.LessThanOrEqual(physName(c), v)
    case sources.In(c, vs) => sources.In(physName(c), vs)
    case sources.IsNull(c) => sources.IsNull(physName(c))
    case sources.IsNotNull(c) => sources.IsNotNull(physName(c))
    case sources.And(l, r) => sources.And(remapFilter(l), remapFilter(r))
    case sources.Or(l, r) => sources.Or(remapFilter(l), remapFilter(r))
    case sources.Not(x) => sources.Not(remapFilter(x))
    case other => other
  }

  private val vr: org.apache.spark.sql.execution.datasources.parquet
      .VectorizedParquetRecordReader = {
    // requested catalyst schema: data columns under this file's PHYSICAL
    // names at their TARGET types (absent -> null vectors, narrower
    // physical -> widening updaters), plus the row-index temp column
    // when positions are needed (dv selection or `_pos` output)
    val requested = StructType(
      dataFields.toSeq.map(f =>
        StructField(physName(f.name), f.dataType, nullable = true)) ++
        // eq key columns ride under their own names: a live
        // equality-delete key column can never be renamed (the
        // evolution verbs refuse while the sidecar lives)
        extraEqFields.toSeq ++
        (if (needPos) Seq(StructField(RowIdxName, LongType, nullable = true))
         else Seq.empty))
    conf.set("org.apache.spark.sql.parquet.row.requested_schema",
      requested.json)
    conf.set("parquet.read.support.class",
      classOf[org.apache.spark.sql.execution.datasources.parquet
        .ParquetReadSupport].getName)
    // the schema converter reads these with NO default (Spark's own
    // parquet source always stamps them before use); honor any session
    // override already present in the shipped conf
    def defaultKey(k: String, v: String): Unit =
      if (conf.get(k) == null) conf.set(k, v)
    defaultKey("spark.sql.parquet.binaryAsString", "false")
    defaultKey("spark.sql.parquet.int96AsTimestamp", "true")
    defaultKey("spark.sql.parquet.fieldId.read.enabled", "false")
    defaultKey("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    defaultKey("spark.sql.legacy.parquet.nanosAsLong", "false")
    defaultKey("spark.sql.caseSensitive", "false")
    // pushed filters ride in as parquet FilterPredicates bound against
    // THIS file's physical schema: row groups skip by block statistics,
    // pages by column index — safe WITH delete vectors because row
    // positions come from the row-index generator, not running counts
    if (p.pushed.nonEmpty) {
      val pf = new org.apache.spark.sql.execution.datasources.parquet
        .ParquetFilters(fileSchema, true, true, true, true, 10, false,
          org.apache.spark.sql.catalyst.util.RebaseDateTime.RebaseSpec(
            org.apache.spark.sql.internal.LegacyBehaviorPolicy.CORRECTED))
      p.pushed.flatMap(f => pf.createFilter(remapFilter(f)))
        .reduceOption(org.apache.parquet.filter2.predicate.FilterApi.and)
        .foreach(pred => org.apache.parquet.hadoop.ParquetInputFormat
          .setFilterPredicate(conf, pred))
    }
    val split = new org.apache.hadoop.mapred.FileSplit(
      path, 0, inputFile.getLength, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    // graft-written files are Spark-4-era parquet: no legacy calendar
    // rebase (CORRECTED), INT96 read as-is, session-neutral
    val reader = new org.apache.spark.sql.execution.datasources.parquet
      .VectorizedParquetRecordReader(null, "CORRECTED", "UTC",
        "CORRECTED", "UTC", false, Capacity)
    try {
      // the already-read footer + open stream ride into the reader (the
      // 2-arg initialize would re-open and re-parse both); parquet-mr's
      // footer-provided constructor still applies the conf's
      // FilterPredicate to the provided blocks (row-group skipping is
      // unchanged — Dsv2RowGroupSkipSpec gates it)
      reader.initialize(split, ctx, Some(inputFile), Some(inputStream),
        Some(footer))
    } catch {
      case t: Throwable =>
        inputStream.close()
        throw t
    }
    reader.initBatch(new StructType(),
      org.apache.spark.sql.catalyst.InternalRow.empty)
    reader.enableReturningBatches()
    reader
  }

  // output assembly — built once from the reader's (reused) vectors:
  // `outFull` re-exposes them in required order (plus constants);
  // `outSel` wraps each in a SelectedColumnVector over the shared
  // selection buffer. The reader reuses its batch vectors across
  // nextKeyValue() calls, so one wiring serves every batch.
  private val selBuf = new Array[Int](Capacity)
  private var outFull: ColumnarBatch = _
  private var outSel: ColumnarBatch = _
  private var posVec: ColumnVector = _
  // (key vector, isString, key set) per live equality constraint
  private var eqProbes
      : Array[(ColumnVector, Boolean, java.util.HashSet[AnyRef])] = _
  private var current: ColumnarBatch = _
  private var dvIdx = 0

  private def initOut(inner: ColumnarBatch): Unit = {
    if (needPos)
      posVec = inner.column(dataFields.length + extraEqFields.length)
    eqProbes = eqSets.map { case (kc, isStr, set) =>
      val idx = dataFields.indexWhere(_.name == kc) match {
        case -1 => dataFields.length +
          extraEqFields.indexWhere(_.name == kc)
        case i => i
      }
      (inner.column(idx), isStr, set)
    }.toArray
    val fileConst = {
      val c = new org.apache.spark.sql.execution.vectorized
        .ConstantColumnVector(Capacity, StringType)
      c.setUtf8String(org.apache.spark.unsafe.types.UTF8String
        .fromString(p.fileName))
      c
    }
    var dataIdx = -1
    val vecs: Array[ColumnVector] = p.required.fields.map { f =>
      if (f.name == GraftMetaColumns.File) fileConst: ColumnVector
      else if (f.name == GraftMetaColumns.Pos) posVec
      else { dataIdx += 1; inner.column(dataIdx) }
    }
    outFull = new ColumnarBatch(vecs, 0)
    if (dv.nonEmpty || eqProbes.nonEmpty)
      outSel = new ColumnarBatch(vecs.map {
        case c: org.apache.spark.sql.execution.vectorized
            .ConstantColumnVector => c: ColumnVector
        case v => new SelectedColumnVector(v, selBuf)
      }, 0)
  }

  /** Row `r` of the current batch is killed by an equality constraint
    * (key non-null and in a live key set).
    */
  private def eqDead(r: Int): Boolean = {
    var i = 0
    while (i < eqProbes.length) {
      val (vec, isStr, set) = eqProbes(i)
      if (!vec.isNullAt(r)) {
        val v: AnyRef =
          if (isStr) vec.getUTF8String(r)
          else java.lang.Long.valueOf(vec.getLong(r))
        if (set.contains(v)) return true
      }
      i += 1
    }
    false
  }

  override def next(): Boolean = {
    while (vr.nextKeyValue()) {
      val inner = vr.getCurrentValue
        .asInstanceOf[ColumnarBatch]
      if (outFull == null) initOut(inner)
      val n = inner.numRows()
      if (n > 0) {
        if (dv.isEmpty && eqProbes.isEmpty) {
          outFull.setNumRows(n)
          current = outFull
          return true
        }
        var selLen = 0
        if (dv.isEmpty) {
          var i = 0
          while (i < n) { selBuf(i) = i; i += 1 }
          selLen = n
        } else {
          // batch-range probe first: a batch whose position span holds
          // no mark passes through with TWO vector reads, not n — the
          // common case away from a mark's neighborhood
          val first = posVec.getLong(0)
          val last = posVec.getLong(n - 1)
          while (dvIdx < dv.length && dv(dvIdx) < first) dvIdx += 1
          if (dvIdx >= dv.length || dv(dvIdx) > last) {
            var i = 0
            while (i < n) { selBuf(i) = i; i += 1 }
            selLen = n
          } else if (last - first == n - 1) {
            // CONSECUTIVE batch (no mid-batch row skipping): row i
            // holds position first+i, so the survivor selection falls
            // out of the mark list alone — O(marks) long compares +
            // O(n) primitive int writes, no per-row vector reads
            var row = 0
            var d = dvIdx
            while (d < dv.length && dv(d) <= last) {
              val mrow = (dv(d) - first).toInt
              while (row < mrow) {
                selBuf(selLen) = row
                selLen += 1
                row += 1
              }
              if (row == mrow) row += 1 // duplicates (sidecar union) skip
              d += 1
            }
            while (row < n) {
              selBuf(selLen) = row
              selLen += 1
              row += 1
            }
            dvIdx = d
          } else {
            // gapped batch (FilterPredicate page/row skipping inside the
            // span): sorted-merge row positions against the mark list
            var i = 0
            while (i < n) {
              val pos = posVec.getLong(i)
              while (dvIdx < dv.length && dv(dvIdx) < pos) dvIdx += 1
              if (!(dvIdx < dv.length && dv(dvIdx) == pos)) {
                selBuf(selLen) = i
                selLen += 1
              }
              i += 1
            }
          }
        }
        // equality constraints compact the dv-surviving selection in
        // place — O(survivors) hash probes per batch, the MoR read
        // amplification optimize folds away
        if (eqProbes.nonEmpty && selLen > 0) {
          var w = 0
          var i = 0
          while (i < selLen) {
            if (!eqDead(selBuf(i))) {
              selBuf(w) = selBuf(i)
              w += 1
            }
            i += 1
          }
          selLen = w
        }
        if (selLen == n) {
          // full survival is always the identity selection: serve the
          // reader's vectors directly
          outFull.setNumRows(n)
          current = outFull
          return true
        } else if (selLen > 0) {
          GraftVectorizedAudit.selectedBatches.incrementAndGet()
          outSel.setNumRows(selLen)
          current = outSel
          return true
        }
        // every row of the batch is dead: fall through to the next
      }
    }
    false
  }

  override def get(): ColumnarBatch = current
  override def close(): Unit = vr.close()
}

object GraftColumnarReader {
  /** Batch capacity — Spark's vectorized-reader default. */
  val Capacity = 4096
  /** Spark's row-index temporary column: a requested column of this
    * name is filled by the vectorized reader with each row's FILE
    * ordinal from the page-store row-index offsets (exact under
    * row-group/page skipping) — the position space delete sidecars and
    * `_pos` speak.
    */
  val RowIdxName: String = org.apache.spark.sql.execution.datasources
    .parquet.ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
}

/** A columnar vector viewed through a row-selection: logical row `i`
  * reads the base vector's row `sel(i)` — how position-deleted rows
  * vanish from a `ColumnarBatch` without materializing rows or copying
  * vector data (the batch stays columnar through `ColumnarToRow`
  * codegen). The selection buffer is SHARED with the reader, which
  * rewrites it per batch; `numNulls` reports the base vector's count
  * (an upper bound — only advisory consumers read it).
  */
final class SelectedColumnVector(base: ColumnVector, sel: Array[Int])
  extends ColumnVector(base.dataType) {
  // lifecycle is owned by the wrapping reader (the base vectors are the
  // parquet reader's own, closed by it)
  override def close(): Unit = ()
  override def hasNull: Boolean = base.hasNull
  override def numNulls: Int = base.numNulls
  override def isNullAt(i: Int): Boolean = base.isNullAt(sel(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(sel(i))
  override def getByte(i: Int): Byte = base.getByte(sel(i))
  override def getShort(i: Int): Short = base.getShort(sel(i))
  override def getInt(i: Int): Int = base.getInt(sel(i))
  override def getLong(i: Int): Long = base.getLong(sel(i))
  override def getFloat(i: Int): Float = base.getFloat(sel(i))
  override def getDouble(i: Int): Double = base.getDouble(sel(i))
  override def getArray(i: Int): ColumnarArray = base.getArray(sel(i))
  override def getMap(i: Int): ColumnarMap = base.getMap(sel(i))
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    base.getDecimal(sel(i), precision, scale)
  override def getUTF8String(i: Int)
      : org.apache.spark.unsafe.types.UTF8String =
    base.getUTF8String(sel(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(sel(i))
  override def getChild(ordinal: Int): ColumnVector = base.getChild(ordinal)
}
