package graft.sources.v2

import graft.sources.{Bucketing, LakeFs, Snapshots}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DELTA-BASED row-level operations (`MERGE INTO`, `UPDATE`, and the
  * DELETE predicates [[GraftTable.canDeleteWhere]] refuses) — the
  * Iceberg v2 position-delta architecture expressed through Spark's
  * `SupportsDelta` planner contract:
  *
  *  - the operation's SCAN serves the table plus its `_file`/`_pos`
  *    METADATA COLUMNS ([[GraftMetaColumns]]) — the row identity is
  *    (data file, record ordinal), exactly the position space the MoR
  *    delete sidecars already speak;
  *  - Spark joins target and source, computes the delta, and feeds
  *    each task's [[GraftDeltaWriter]]: DELETEs buffer per-target-file
  *    position lists and land as a PARTITIONED sidecar directory
  *    (`file=<dataFile>/part-*.parquet`), INSERTs stream into fresh
  *    data files (updates arrive as delete+insert —
  *    `representUpdateAsDeleteAndInsert`), both written EXECUTOR-side
  *    straight into the store (no driver data movement, no
  *    `coalesce(1)` funnel);
  *  - the DELTA IS REBALANCED before the writers
  *    (`RequiresDistributionAndOrdering`: clustered by `_file` with an
  *    advisory partition size): under AQE a 100-row MERGE coalesces to
  *    ONE writer (one data file + one sidecar part, not one per task
  *    slot), a huge delta splits by size — and each target file's marks
  *    land in few tasks, so readers open few parts per file;
  *  - the driver commit is METADATA-ONLY: one manifest version
  *    appending the insert entries and one `#dv:` line per sidecar
  *    part ([[graft.sources.Snapshots.commitRowDelta]]), OCC-retried —
  *    with BOTH Delta/Iceberg conflict checks: a rival rewrite
  *    (optimize/COW) that DROPPED a marked file refuses (stale marks
  *    would un-delete its re-homed rows), and a rival ROW-LEVEL commit
  *    that marked positions in the same files since this statement's
  *    scanned snapshot refuses too (two MERGEs planned against the same
  *    snapshot would otherwise both commit — duplicate post-image rows,
  *    lost updates).
  *
  * Disjointness holds by construction: the scan serves LIVE rows only
  * (existing sidecars applied inside the readers), so a newly marked
  * position can never duplicate an existing mark.
  *
  * At 100 TB this is the MERGE that matters: a 10^4-row upsert into
  * 10^4 wide files costs KB of sidecar + KB of appended data — zero
  * rewrites — and the whole statement is `MERGE INTO` with no library
  * call in sight.
  */
class GraftRowLevelOperationBuilder(root: String, version: Int,
    tableSchema: StructType, info: RowLevelOperationInfo,
    scanDefaults: Map[String, String], writeDefaults: Map[String, String])
  extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(root, version, tableSchema,
      info.command(), scanDefaults, writeDefaults)
}

class GraftRowLevelOperation(root: String, version: Int,
    tableSchema: StructType, cmd: RowLevelOperation.Command,
    scanDefaults: Map[String, String], writeDefaults: Map[String, String])
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftRowLevel($cmd) $root"

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftScanBuilder(root, version, tableSchema,
      Option(options.get("auditId")).orElse(scanDefaults.get("auditId")))

  override def newWriteBuilder(info: LogicalWriteInfo)
      : DeltaWriteBuilder = new DeltaWriteBuilder {
    override def build(): DeltaWrite =
      new GraftDeltaWrite(root, version, info.schema(),
        writeDefaults.get("statsCols").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
        writeDefaults.get("deltaAdvisoryBytes").map(_.toLong)
          .getOrElse(64L * 1024 * 1024),
        // MERGE's NOT-MATCHED inserts were computed against the scanned
        // snapshot's full key set — rival appends since then could carry
        // those keys, so the commit must refuse them (Delta's
        // ConcurrentAppendException rule); DELETE/UPDATE stay
        // write-serializable (a missed concurrent append is snapshot
        // semantics, not duplication)
        refuseNewFiles = cmd == RowLevelOperation.Command.MERGE,
        // a bucketed table's MERGE inserts route per bucket id and
        // stamp `k=`, so MoR upserts keep storage-partitioned joins
        // ALIVE (delete sidecars never touch the stamps; only the new
        // files could break the all-stamped condition)
        bucketSpec = Snapshots.manifest(root, version).bucketSpec
          .filter { case (c, _) =>
            info.schema().fieldNames.contains(c) })
  }

  override def rowId(): Array[NamedReference] = Array(
    org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftMetaColumns.File),
    org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftMetaColumns.Pos))

  override def representUpdateAsDeleteAndInsert(): Boolean = true
}

/** `scannedVersion` is the snapshot the row-level scan planned against —
  * the base of the commit-time conflict window.
  */
class GraftDeltaWrite(root: String, scannedVersion: Int,
    rowSchema: StructType, statsCols: Seq[String],
    advisoryBytes: Long, refuseNewFiles: Boolean = false,
    bucketSpec: Option[(String, Int)] = None)
  extends DeltaWrite
  with RequiresDistributionAndOrdering {

  /** Cluster the delta by target file, size-bounded: with an advisory
    * size this plans as a `RebalancePartitions` — AQE coalesces a small
    * delta into one writer (the small-file guard) and SPLITS an
    * oversized bucket (a huge single-file erasure, or the null-`_file`
    * insert bucket of an insert-heavy MERGE), so the guard never caps
    * write parallelism. On a BUCKETED table the insert rows (null
    * `_file`) additionally cluster by their bucket id, so each bucket's
    * inserts co-locate and the writers' per-bucket split lands
    * ~nBuckets right-sized files instead of one per (task, bucket);
    * delete rows are unaffected — a stamped file holds one bucket
    * value, so (_file, bucket) clusters exactly like _file.
    */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val file = Expressions.column(GraftMetaColumns.File)
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      bucketSpec match {
        case Some((c, n)) if rowSchema.fieldNames.contains(c) =>
          Array(file, Expressions.bucket(n, c))
        case _ => Array(file)
      })
  }
  override def advisoryPartitionSizeInBytes(): Long = advisoryBytes
  override def requiredNumPartitions(): Int = 0
  /** Sort each writer's slice by (_file, _pos): a file's marks arrive
    * contiguous and ascending, so sidecar parts write sequentially and
    * encode tightly.
    */
  override def requiredOrdering(): Array[org.apache.spark.sql.connector
      .expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions._
    Array(
      Expressions.sort(Expressions.column(GraftMetaColumns.File),
        SortDirection.ASCENDING),
      Expressions.sort(Expressions.column(GraftMetaColumns.Pos),
        SortDirection.ASCENDING))
  }

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : DeltaWriterFactory = {
      val spark = org.apache.spark.sql.SparkSession.active
      import scala.jdk.CollectionConverters._
      val confEntries = spark.sessionState.newHadoopConf()
        .iterator().asScala.map(e => e.getKey -> e.getValue).toMap
      GraftDeltaWriterFactory(root, rowSchema,
        statsCols.filter(rowSchema.fieldNames.contains),
        java.util.UUID.randomUUID().toString.replace("-", "").take(12),
        confEntries, bucketSpec)
    }
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val ms = messages.toSeq.map(_.asInstanceOf[GraftDeltaCommitMessage])
      val entries = ms.flatMap(_.inserted.map(_._1))
      val sidecars = ms.flatMap(_.sidecar)
      val marked = ms.flatMap(_.markedFiles).toSet
      if (entries.nonEmpty || sidecars.nonEmpty) {
        Snapshots.commitRowDelta(root, entries, sidecars, marked,
          scannedVersion = scannedVersion,
          refuseNewFiles = refuseNewFiles)
        ()
      }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case m: GraftDeltaCommitMessage =>
          m.inserted.foreach(f => LakeFs.delete(f._2))
          m.sidecar.foreach(n =>
            LakeFs.deleteRecursively(s"$root/_deletes/$n"))
        case _ => ()
      }
  }
}

/** Per-task result: the inserted data files' manifest entries with
  * their store paths for abort cleanup (empty when the task inserted
  * nothing; one per bucket when the write maintains a bucket layout),
  * the task's sidecar part name + mark count (None/0 when it deleted
  * nothing), and the distinct data files it marked positions in (the
  * commit-time conflict check's working set — bounded by
  * files-per-task).
  */
case class GraftDeltaCommitMessage(
    inserted: Seq[(Snapshots.FileEntry, String)],
    sidecar: Option[String], marks: Long,
    markedFiles: Set[String]) extends WriterCommitMessage

case class GraftDeltaWriterFactory(root: String, rowSchema: StructType,
    statsCols: Seq[String], jobId: String,
    confEntries: Map[String, String],
    bucketSpec: Option[(String, Int)] = None) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] =
    new GraftDeltaWriter(root, rowSchema, statsCols,
      s"w_rl_${jobId}_p${partitionId}_a$taskId",
      s"dv_rl_${jobId}_p${partitionId}_a$taskId", confEntries,
      bucketSpec)
}

/** Executor task writer for one delta partition: inserts stream into
  * (lazily created) data files via the shared parquet writer path —
  * ONE file normally, one PER BUCKET ID when the table carries a
  * bucket layout (`k=`-stamped, so MoR upserts keep the
  * storage-partitioned-join report alive); deletes buffer per TARGET
  * FILE and land as a PARTITIONED sidecar directory
  * (`<dvName>/file=<dataFile>/part-<k>.parquet`, positions only) —
  * the layout [[GraftDvPositions.forFile]] resolves with an
  * existence probe + a scan of exactly one file's marks, so scan-side
  * read amplification is O(own marks), not O(all tasks' marks).
  * Buffers flush at [[GraftDeltaWriter.FlushMarks]] positions per file,
  * bounding task memory under pathological single-file erasures.
  * Zero-insert / zero-delete tasks leave no file behind.
  */
class GraftDeltaWriter(root: String, rowSchema: StructType,
    statsCols: Seq[String], dataPrefix: String, dvName: String,
    confEntries: Map[String, String],
    bucketSpec: Option[(String, Int)] = None)
  extends DeltaWriter[InternalRow] {

  private val conf: Configuration = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val dvDir = s"$root/_deletes/$dvName"

  // insert side — files created on first insert (a delete-only task
  // must not write an empty data file; DELETE commands may carry no
  // row schema at all)
  private lazy val dataFactory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(
      GraftParquetSchema.toMessageType(rowSchema))
  private lazy val appenders = GraftParquetSchema.appenders(rowSchema)

  /** Bucket id of an inserted row, or -1 when unbucketed —
    * [[GraftBucket.rowExtractor]], the shared stamping contract (lazy:
    * a schema-less DELETE must not resolve the field index).
    */
  private lazy val bucketOf: InternalRow => Int = bucketSpec match {
    case None => _ => -1
    case Some((c, n)) => GraftBucket.rowExtractor(rowSchema, c, n)
  }
  private final class DataSink(val name: String) {
    val path = s"$root/files/$name"
    val writer = GraftParquetSchema.newWriter(path, rowSchema, conf)
  }
  private val dataSinks =
    scala.collection.mutable.LinkedHashMap.empty[Int, DataSink]

  // delete side — per-target-file position buffers, flushed as one-row
  // COMPRESSED-BITMAP parquet parts under the partitioned layout
  private val bmSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("card",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("blob",
      org.apache.spark.sql.types.BinaryType, nullable = false)))
  private lazy val bmFactory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(
      GraftParquetSchema.toMessageType(bmSchema))
  private val dvBuf =
    scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Long]]()
  private val dvParts = scala.collection.mutable.Map[String, Int]()
  private var marks = 0L
  private var wroteSidecar = false

  override def insert(row: InternalRow): Unit = {
    val k = bucketOf(row)
    val sink = dataSinks.getOrElseUpdate(k, new DataSink(
      if (k >= 0) s"${dataPrefix}_k$k.parquet"
      else s"$dataPrefix.parquet"))
    val g = dataFactory.newGroup()
    var i = 0
    while (i < appenders.length) {
      if (!row.isNullAt(i)) appenders(i)(g, row)
      i += 1
    }
    sink.writer.write(g)
  }

  /** `id` is the rowId projection in declared order: (_file, _pos). */
  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val buf = dvBuf.getOrElseUpdate(file,
      scala.collection.mutable.ArrayBuffer[Long]())
    buf += id.getLong(1)
    marks += 1
    if (buf.length >= GraftDeltaWriter.FlushMarks) flushFile(file, buf)
  }

  private def flushFile(file: String,
      buf: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    if (buf.isEmpty) return
    val part = dvParts.getOrElse(file, 0)
    dvParts(file) = part + 1
    val path = s"$dvDir/file=$file/part-$part.parquet"
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val blob = graft.sources.GraftBitmap.encode(sorted)
    val w = GraftParquetSchema.newWriter(path, bmSchema, conf)
    try {
      val g = bmFactory.newGroup()
      // card from the blob's own header: the codec collapses duplicate
      // positions (set semantics), so the stored count must too
      g.add(0, graft.sources.GraftBitmap.cardinality(blob))
      g.add(1, org.apache.parquet.io.api.Binary
        .fromConstantByteArray(blob))
      w.write(g)
    } finally w.close()
    wroteSidecar = true
    buf.clear()
  }

  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "graft represents UPDATE as delete+insert")

  override def commit(): WriterCommitMessage = {
    dvBuf.foreach { case (f, b) => flushFile(f, b) }
    closeAll()
    val inserted = dataSinks.toSeq.map { case (k, s) =>
      val (rows, fp, zones, szones, nulls) =
        Bucketing.fileStatsEntryConf(s.path, conf, statsCols)
      (Snapshots.FileEntry(s.name, Some(rows),
        Some(LakeFs.fileLength(s.path)), Some(fp), zones, szones,
        nulls, bucket = if (k >= 0) Some(k) else None), s.path)
    }
    val sidecar = if (wroteSidecar) Some(dvName) else None
    GraftDeltaCommitMessage(inserted, sidecar, marks,
      dvBuf.keySet.toSet ++ dvParts.keySet)
  }

  override def abort(): Unit = {
    closeAll()
    dataSinks.values.foreach(s => LakeFs.delete(s.path))
    if (wroteSidecar) LakeFs.deleteRecursively(dvDir)
    ()
  }

  override def close(): Unit = closeAll()

  private var closed = false
  private def closeAll(): Unit = if (!closed) {
    closed = true
    dataSinks.values.foreach(_.writer.close())
  }
}

object GraftDeltaWriter {
  /** Per-file mark-buffer flush threshold — 4M positions ≈ 32 MB of
    * task memory per pathological file; ordinary MERGEs never reach it
    * and write one part per (task, file).
    */
  val FlushMarks: Int = 4 * 1024 * 1024
}
