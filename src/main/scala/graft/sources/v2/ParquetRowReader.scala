package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side parquet → `InternalRow` reader for the graft DSv2
  * connector — parquet-mr's example `Group` materializer with a
  * column-pruned requested schema, converting each record to the
  * partition's required Spark schema:
  *
  *  - COLUMN PRUNING is real parquet projection (the requested
  *    `MessageType` is the subset of the file's own fields the scan
  *    needs), so an unprojected column's pages are never decoded;
  *  - ROW POSITION is the record ordinal (no row-group skipping is
  *    requested, so the stream covers every row in file order — the
  *    same positions `_metadata.row_index` yields), which is what
  *    position-delete sidecars anti-join on;
  *  - LOGICAL COLUMN MAPS (rename/widen) resolve per file: a logical
  *    column reads from the newest physical name present in THIS file's
  *    footer, and INT32→long / FLOAT→double / unit-scaled timestamps
  *    cast at conversion — the executor half of
  *    [[graft.sources.Snapshots.renameColumn]]/[[widenColumn]].
  *
  * Scalar columns (long/int/double/float/boolean/string/binary/
  * timestamp/date) plus ARRAY<scalar> via the 3-level parquet LIST —
  * the embedding-column shape, so ANN/semdedup tables serve through
  * the SQL surface; maps/structs stay refused at scan build.
  * Cited shape: the reference's scan surface is tabular records
  * (reference: tool_call_agent.py:132 — every step loads the CSV into
  * a flat DataFrame).
  */
object ParquetRowReader {

  /** The physical-name candidates of a logical column, newest first:
    * the logical name itself, then each older name walking the rename
    * chain backwards (a file written before `renameColumn(o, n)` holds
    * `o` physically).
    */
  def physicalCandidates(logical: String,
      maps: Seq[(String, String)]): Seq[String] = {
    var names = List(logical) // built oldest-first by prepending
    maps.reverse.foreach { case (o, n) =>
      if (names.head == n) names = o :: names
    }
    names.reverse // newest (the logical name itself) first
  }

  /** Per-field read plan: the group index in the REQUESTED schema and
    * the conversion from the parquet primitive to the Spark type; None
    * = the column is absent from this file (schema evolution) and reads
    * NULL.
    */
  private final case class FieldPlan(groupIdx: Int,
      convert: (org.apache.parquet.example.data.Group, Int) => Any)

  private def micros(scale: Long)(g: org.apache.parquet.example.data.Group,
      i: Int): Any = g.getLong(i, 0) * scale

  /** Conversion for one required field given the file's physical field
    * type — widening casts (int→long, float→double) are where
    * `#widen:` materializes on read.
    */
  private def converter(phys: Type, target: DataType)
      : (org.apache.parquet.example.data.Group, Int) => Any = {
    (phys, target) match {
      // 3-level parquet LIST (the Spark/pyarrow layout): column group
      // -> repeated holder -> element field; a holder with no element
      // is a NULL element
      case (gt, ArrayType(et, _)) if !gt.isPrimitive =>
        val holderType = gt.asGroupType().getType(0)
        require(!holderType.isPrimitive,
          s"graft scan reads 3-level parquet LISTs only, got $gt")
        val elType = holderType.asGroupType().getType(0)
        val elConvert = converter(elType, et)
        return (g, i) => {
          val listGroup = g.getGroup(i, 0)
          val n = listGroup.getFieldRepetitionCount(0)
          val out = new Array[Any](n)
          var j = 0
          while (j < n) {
            val holder = listGroup.getGroup(0, j)
            out(j) =
              if (holder.getFieldRepetitionCount(0) == 0) null
              else elConvert(holder, 0)
            j += 1
          }
          new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
        }
      case _ => ()
    }
    require(phys.isPrimitive,
      s"graft scan cannot read $phys as $target")
    val p = phys.asPrimitiveType()
    import PrimitiveType.PrimitiveTypeName._
    (p.getPrimitiveTypeName, target) match {
      case (INT64, LongType) => (g, i) => g.getLong(i, 0)
      case (INT32, LongType) => (g, i) => g.getInteger(i, 0).toLong
      case (INT64, TimestampType) =>
        p.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => micros(1000L)
              case LogicalTypeAnnotation.TimeUnit.MICROS => micros(1L)
              case LogicalTypeAnnotation.TimeUnit.NANOS =>
                (g, i) => g.getLong(i, 0) / 1000L
            }
          case _ => micros(1L) // bare INT64 read as micros
        }
      case (INT96, TimestampType) =>
        // Spark's legacy default timestamp encoding: 12 little-endian
        // bytes — nanos-of-day (8) + Julian day (4) → micros since epoch
        (g, i) => {
          val b = g.getInt96(i, 0).getBytes
          val buf = java.nio.ByteBuffer.wrap(b)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nanosOfDay = buf.getLong
          val julianDay = buf.getInt
          (julianDay.toLong - 2440588L) * 86400000000L + nanosOfDay / 1000L
        }
      case (INT32, IntegerType) => (g, i) => g.getInteger(i, 0)
      case (INT32, DateType) => (g, i) => g.getInteger(i, 0)
      case (INT32, ShortType) => (g, i) => g.getInteger(i, 0).toShort
      case (INT32, ByteType) => (g, i) => g.getInteger(i, 0).toByte
      case (DOUBLE, DoubleType) => (g, i) => g.getDouble(i, 0)
      case (FLOAT, DoubleType) => (g, i) => g.getFloat(i, 0).toDouble
      case (FLOAT, FloatType) => (g, i) => g.getFloat(i, 0)
      case (BOOLEAN, BooleanType) => (g, i) => g.getBoolean(i, 0)
      case (BINARY, StringType) =>
        (g, i) => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
      case (BINARY, BinaryType) => (g, i) => g.getBinary(i, 0).getBytes
      case (pt, st) => throw new IllegalArgumentException(
        s"graft scan cannot read parquet $pt as Spark $st " +
          s"(column ${phys.getName})")
    }
  }

  /** Open `path` and stream its records as `InternalRow`s of
    * `required`, skipping `deletedPositions` (sorted file ordinals from
    * position-delete sidecars) — or, when `emitOnly` is set, emitting
    * ONLY those sorted ordinals (the change-feed shape: a new sidecar's
    * freshly-marked rows ARE the delta). `rowsHint` (manifest
    * commit-time stats) lets a zero-column projection (COUNT(*) pruned
    * everything) answer from metadata without decoding a single page.
    */
  def open(path: String, conf: Configuration, required: StructType,
      maps: Seq[(String, String)], deletedPositions: Array[Long],
      rowsHint: Option[Long],
      emitOnly: Option[Array[Long]] = None,
      emitPos: Boolean = false,
      rowGroupFilters: Seq[org.apache.spark.sql.sources.Filter] =
        Seq.empty): CloseableRowIterator = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    def totalRows: Long = rowsHint.getOrElse {
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          hPath, conf))
      try rd.getRecordCount finally rd.close()
    }
    /** Live ordinals WITHOUT decoding a page (footer row count + the
      * sorted position lists) — the zero-data-column path when the
      * caller still needs `_pos` row positions: each emitted row is
      * `nullPrefix` nulls (absent data columns) followed by the
      * ordinal.
      */
    def ordinalIterator(nullPrefix: Int): CloseableRowIterator =
      new CloseableRowIterator {
        private val total = totalRows
        private var pos = -1L
        private var dvIdx = 0
        private var emitIdx = 0
        private var current: InternalRow = _
        override def next(): Boolean = {
          while (pos + 1 < total) {
            pos += 1
            val wanted = emitOnly match {
              case Some(ps) =>
                while (emitIdx < ps.length && ps(emitIdx) < pos)
                  emitIdx += 1
                emitIdx < ps.length && ps(emitIdx) == pos
              case None =>
                while (dvIdx < deletedPositions.length &&
                    deletedPositions(dvIdx) < pos) dvIdx += 1
                !(dvIdx < deletedPositions.length &&
                  deletedPositions(dvIdx) == pos)
            }
            if (wanted) {
              val values = new Array[Any](nullPrefix + 1)
              values(nullPrefix) = pos
              current = new GenericInternalRow(values)
              return true
            }
          }
          false
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    if (required.isEmpty) {
      if (emitPos) return ordinalIterator(0)
      // no columns needed: row COUNT from the manifest hint or one
      // footer open; emit empty rows (Spark counts them)
      lazy val total = totalRows
      val live = emitOnly match {
        case Some(ps) => ps.length.toLong
        case None => total - deletedPositions.count(_ < total)
      }
      return new CloseableRowIterator {
        private var remaining = live
        private val row = InternalRow.empty
        override def next(): Boolean =
          if (remaining > 0) { remaining -= 1; true } else false
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
    // the file's own schema decides physical names (rename chain) and
    // source types (widen casts)
    val fileSchema: MessageType = {
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hPath, conf))
      try rd.getFooter.getFileMetaData.getSchema finally rd.close()
    }
    val present = fileSchema.getFields
    import scala.jdk.CollectionConverters._
    val byName = present.asScala.map(f => f.getName -> f).toMap
    // requested projection: the file fields this partition's required
    // columns resolve to, in required order
    val resolved: Seq[Option[Type]] = required.fields.toSeq.map { f =>
      physicalCandidates(f.name, maps).collectFirst {
        case n if byName.contains(n) => byName(n)
      }
    }
    val requestedFields = resolved.flatten
    val plans: Array[Option[FieldPlan]] = {
      var gi = -1
      required.fields.toSeq.zip(resolved).map {
        case (f, Some(t)) =>
          gi += 1
          Some(FieldPlan(gi, converter(t, f.dataType)))
        case (_, None) => None
      }.toArray
    }
    val readConf = new Configuration(conf)
    if (requestedFields.isEmpty) {
      if (emitPos) return ordinalIterator(required.size)
      // every required column is absent from this file (pure schema
      // evolution): rows are all-null; count them via the footer
      lazy val total = totalRows
      val live = emitOnly match {
        case Some(ps) => ps.length.toLong
        case None => total - deletedPositions.count(_ < total)
      }
      return new CloseableRowIterator {
        private var remaining = live
        private val row: InternalRow =
          new GenericInternalRow(Array.fill[Any](required.size)(null))
        override def next(): Boolean =
          if (remaining > 0) { remaining -= 1; true } else false
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
    val requestedMessage =
      new MessageType(fileSchema.getName, requestedFields.asJava)
    // ROW-GROUP-WISE read with position reconstruction: the file opens
    // ONCE, each row group is either read (a RecordReader over its
    // pages) or SKIPPED WHOLE — pages never decoded — while row
    // positions stay exact because group start ordinals come from the
    // footer's block row counts. A group skips when
    //  - the pushed filters PROVE it empty from its column statistics
    //    (the same conservative mightMatch as file-level zones, one
    //    level down — Iceberg/Delta's row-group filtering), or
    //  - an emit-only read (change-feed marks) has no position inside
    //    it, or
    //  - every one of its rows is dv-deleted.
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        hPath, readConf))
    val blocks = rd.getFooter.getBlocks.asScala.toIndexedSeq
    val blockStarts: IndexedSeq[Long] =
      blocks.scanLeft(0L)(_ + _.getRowCount).init
    rd.setRequestedSchema(requestedMessage)
    val columnIO = new org.apache.parquet.io.ColumnIOFactory()
      .getColumnIO(requestedMessage, fileSchema, false)
    // logical filter column -> this file's physical name (rename chain)
    def physName(logical: String): Option[String] =
      physicalCandidates(logical, maps).find(byName.contains)
    def countInRange(ps: Array[Long], lo: Long, hiEx: Long): Long = {
      // sorted: first index >= lo and first index >= hiEx
      def lowerBound(k: Long): Int = {
        var a = 0; var b = ps.length
        while (a < b) {
          val m = (a + b) >>> 1
          if (ps(m) < k) a = m + 1 else b = m
        }
        a
      }
      (lowerBound(hiEx) - lowerBound(lo)).toLong
    }
    def shouldRead(bi: Int): Boolean = {
      val blk = blocks(bi)
      val start = blockStarts(bi)
      val n = blk.getRowCount
      emitOnly match {
        case Some(ps) => countInRange(ps, start, start + n) > 0
        case None =>
          if (deletedPositions.nonEmpty &&
              countInRange(deletedPositions, start, start + n) >= n)
            false // every row of the group is dead
          else if (rowGroupFilters.isEmpty) true
          else {
            val entry = blockEntry(blk, n, rowGroupFilters
              .flatMap(GraftZonePrune.filterColumnsOf)
              .distinct.flatMap(c => physName(c).map(c -> _)))
            rowGroupFilters.forall(f =>
              GraftZonePrune.mightMatch(entry, f))
          }
      }
    }
    new CloseableRowIterator {
      private var pos = -1L
      private var dvIdx = 0
      private var emitIdx = 0
      private var current: InternalRow = _
      private var blockIdx = 0
      private var groupRowsLeft = 0L
      private var recordReader
          : org.apache.parquet.io.RecordReader[
            org.apache.parquet.example.data.Group] = _
      /** Position the reader at the next selected group; false when the
        * file is exhausted. Skipped groups advance `pos` past their
        * whole row range without touching a page.
        */
      private def advanceGroup(): Boolean = {
        while (blockIdx < blocks.size) {
          val n = blocks(blockIdx).getRowCount
          if (shouldRead(blockIdx)) {
            val pages = rd.readNextRowGroup()
            recordReader = columnIO.getRecordReader(pages,
              new org.apache.parquet.example.data.simple.convert
                .GroupRecordConverter(requestedMessage))
            groupRowsLeft = n
            pos = blockStarts(blockIdx) - 1
            blockIdx += 1
            rowGroupsRead.incrementAndGet()
            return true
          } else {
            rd.skipNextRowGroup()
            rowGroupsSkipped.incrementAndGet()
            blockIdx += 1
          }
        }
        false
      }
      override def next(): Boolean = {
        while (true) {
          if (groupRowsLeft == 0L && !advanceGroup()) return false
          val g = recordReader.read()
          groupRowsLeft -= 1
          pos += 1
          // sorted-merge against the position lists: O(1) per row
          val wanted = emitOnly match {
            case Some(ps) =>
              while (emitIdx < ps.length && ps(emitIdx) < pos) emitIdx += 1
              emitIdx < ps.length && ps(emitIdx) == pos
            case None =>
              while (dvIdx < deletedPositions.length &&
                  deletedPositions(dvIdx) < pos) dvIdx += 1
              !(dvIdx < deletedPositions.length &&
                deletedPositions(dvIdx) == pos)
          }
          if (wanted) {
            // one trailing slot for the row's file ordinal when the
            // caller asked for positions (metadata-column reads)
            val values =
              new Array[Any](plans.length + (if (emitPos) 1 else 0))
            var j = 0
            while (j < plans.length) {
              plans(j) match {
                case Some(p) =>
                  values(j) =
                    if (g.getFieldRepetitionCount(p.groupIdx) == 0) null
                    else p.convert(g, p.groupIdx)
                case None => values(j) = null
              }
              j += 1
            }
            if (emitPos) values(plans.length) = pos
            current = new GenericInternalRow(values)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = rd.close()
    }
  }

  /** TEST/AUDIT counters: row groups whose pages were decoded vs
    * skipped whole — the falsifiable evidence that a pushed filter or
    * emit-only read never touched a non-matching group's pages (JVM-
    * global; local[*] runs executors in-process).
    */
  val rowGroupsRead = new java.util.concurrent.atomic.AtomicLong
  val rowGroupsSkipped = new java.util.concurrent.atomic.AtomicLong

  /** One row group's column statistics as a pseudo manifest entry under
    * LOGICAL names, so [[GraftZonePrune.mightMatch]] speaks block stats
    * with the same conservative contract: a column with missing or
    * unusable stats simply gets no zone (must-read). `cols` maps the
    * filter's logical names to this file's physical names.
    */
  private def blockEntry(
      blk: org.apache.parquet.hadoop.metadata.BlockMetaData, rows: Long,
      cols: Seq[(String, String)]): graft.sources.Snapshots.FileEntry = {
    import scala.jdk.CollectionConverters._
    val byPath = blk.getColumns.asScala
      .map(c => c.getPath.toDotString -> c).toMap
    var zones = Map.empty[String, (Long, Long)]
    var szones = Map.empty[String, graft.sources.Snapshots.StrZone]
    var nulls = Map.empty[String, Long]
    cols.foreach { case (logical, physical) =>
      byPath.get(physical).foreach { c =>
        val st = c.getStatistics
        if (st != null) {
          if (st.isNumNullsSet && st.getNumNulls >= 0L)
            nulls += logical -> st.getNumNulls
          if (st.hasNonNullValue)
            (st.genericGetMin, st.genericGetMax) match {
              case (mn: Number, mx: Number)
                  if !st.genericGetMin.isInstanceOf[java.lang.Double] &&
                    !st.genericGetMin.isInstanceOf[java.lang.Float] =>
                zones += logical -> (mn.longValue(), mx.longValue())
              case (mn: org.apache.parquet.io.api.Binary,
                  mx: org.apache.parquet.io.api.Binary) =>
                val b64 = java.util.Base64.getEncoder
                szones += logical -> graft.sources.Snapshots.StrZone(
                  b64.encodeToString(mn.getBytes), true,
                  b64.encodeToString(mx.getBytes), true)
              case _ => ()
            }
        }
      }
    }
    graft.sources.Snapshots.FileEntry("<rowgroup>", Some(rows), None,
      None, zones, szones, nulls)
  }

  /** The iterator contract `PartitionReader` needs, file-closeable. */
  trait CloseableRowIterator {
    def next(): Boolean
    def get(): InternalRow
    def close(): Unit
  }
}
