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
  *    each task's [[GraftDeltaWriter]]: DELETEs append `(file, pos)`
  *    rows to a per-task position-delete SIDECAR part, INSERTs stream
  *    into fresh data files (updates arrive as delete+insert —
  *    `representUpdateAsDeleteAndInsert`), both written EXECUTOR-side
  *    straight into the store (no driver data movement, no
  *    `coalesce(1)` funnel: N tasks write N sidecar parts);
  *  - the driver commit is METADATA-ONLY: one manifest version
  *    appending the insert entries and one `#dv:` line per sidecar
  *    part ([[graft.sources.Snapshots.commitRowDelta]]), OCC-retried —
  *    with a CONFLICT CHECK: if a rival rewrite (optimize/COW) dropped
  *    any file this delta marked positions in, the marks would dangle
  *    against the rewritten rows, so the commit REFUSES instead of
  *    silently un-deleting (the Delta/Iceberg conflict-validation
  *    rule).
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
      new GraftDeltaWrite(root, info.schema(),
        writeDefaults.get("statsCols").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
  }

  override def rowId(): Array[NamedReference] = Array(
    org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftMetaColumns.File),
    org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftMetaColumns.Pos))

  override def representUpdateAsDeleteAndInsert(): Boolean = true
}

class GraftDeltaWrite(root: String, rowSchema: StructType,
    statsCols: Seq[String]) extends DeltaWrite {
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
        confEntries)
    }
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val ms = messages.toSeq.map(_.asInstanceOf[GraftDeltaCommitMessage])
      val entries = ms.flatMap(_.entry)
      val sidecars = ms.flatMap(_.sidecar)
      val marked = ms.flatMap(_.markedFiles).toSet
      if (entries.nonEmpty || sidecars.nonEmpty) {
        Snapshots.commitRowDelta(root, entries, sidecars, marked)
        ()
      }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case m: GraftDeltaCommitMessage =>
          m.entry.foreach(_ => LakeFs.delete(m.dataPath))
          m.sidecar.foreach(n => LakeFs.delete(s"$root/_deletes/$n"))
        case _ => ()
      }
  }
}

/** Per-task result: the inserted data file's manifest entry (None when
  * the task inserted nothing), its path for abort cleanup, the task's
  * sidecar part name + mark count (None/0 when it deleted nothing),
  * and the distinct data files it marked positions in (the commit-time
  * conflict check's working set — bounded by files-per-task).
  */
case class GraftDeltaCommitMessage(entry: Option[Snapshots.FileEntry],
    dataPath: String, sidecar: Option[String], marks: Long,
    markedFiles: Set[String]) extends WriterCommitMessage

case class GraftDeltaWriterFactory(root: String, rowSchema: StructType,
    statsCols: Seq[String], jobId: String,
    confEntries: Map[String, String]) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] =
    new GraftDeltaWriter(root, rowSchema, statsCols,
      s"w_rl_${jobId}_p${partitionId}_a$taskId.parquet",
      s"dv_rl_${jobId}_p${partitionId}_a$taskId.parquet", confEntries)
}

/** Executor task writer for one delta partition: inserts stream into a
  * (lazily created) data file via the shared parquet writer path;
  * deletes stream into a (lazily created) `(file, pos)` sidecar part.
  * Zero-insert / zero-delete tasks leave no file behind.
  */
class GraftDeltaWriter(root: String, rowSchema: StructType,
    statsCols: Seq[String], dataName: String, dvName: String,
    confEntries: Map[String, String]) extends DeltaWriter[InternalRow] {

  private val conf: Configuration = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val dataPath = s"$root/files/$dataName"
  private val dvPath = s"$root/_deletes/$dvName"

  // insert side — created on first insert (a delete-only task must not
  // write an empty data file; DELETE commands may carry no row schema
  // at all)
  private var dataWriter: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _
  private lazy val dataFactory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(
      GraftParquetSchema.toMessageType(rowSchema))
  private lazy val appenders = GraftParquetSchema.appenders(rowSchema)
  private var inserted = 0L

  // delete side — created on first delete
  private val dvSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType, nullable = false)))
  private var dvWriter: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _
  private lazy val dvFactory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(
      GraftParquetSchema.toMessageType(dvSchema))
  private var marks = 0L
  private val markedFiles = scala.collection.mutable.Set[String]()

  override def insert(row: InternalRow): Unit = {
    if (dataWriter == null)
      dataWriter = GraftParquetSchema.newWriter(dataPath, rowSchema, conf)
    val g = dataFactory.newGroup()
    var i = 0
    while (i < appenders.length) {
      if (!row.isNullAt(i)) appenders(i)(g, row)
      i += 1
    }
    dataWriter.write(g)
    inserted += 1
  }

  /** `id` is the rowId projection in declared order: (_file, _pos). */
  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (dvWriter == null)
      dvWriter = GraftParquetSchema.newWriter(dvPath, dvSchema, conf)
    val file = id.getUTF8String(0).toString
    val g = dvFactory.newGroup()
    g.add(0, org.apache.parquet.io.api.Binary.fromString(file))
    g.add(1, id.getLong(1))
    dvWriter.write(g)
    markedFiles += file
    marks += 1
  }

  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "graft represents UPDATE as delete+insert")

  override def commit(): WriterCommitMessage = {
    closeAll()
    val entry =
      if (inserted == 0L) {
        if (dataWriter != null) LakeFs.delete(dataPath)
        None
      } else {
        val (rows, fp, zones, szones, nulls) =
          Bucketing.fileStatsEntryConf(dataPath, conf, statsCols)
        Some(Snapshots.FileEntry(dataName, Some(rows),
          Some(LakeFs.fileLength(dataPath)), Some(fp), zones, szones,
          nulls))
      }
    val sidecar =
      if (marks == 0L) {
        if (dvWriter != null) LakeFs.delete(dvPath)
        None
      } else Some(dvName)
    GraftDeltaCommitMessage(entry, dataPath, sidecar, marks,
      markedFiles.toSet)
  }

  override def abort(): Unit = {
    closeAll()
    if (dataWriter != null) LakeFs.delete(dataPath)
    if (dvWriter != null) LakeFs.delete(dvPath)
    ()
  }

  override def close(): Unit = closeAll()

  private var closed = false
  private def closeAll(): Unit = if (!closed) {
    closed = true
    if (dataWriter != null) dataWriter.close()
    if (dvWriter != null) dvWriter.close()
  }
}
