package graft.sources.v2

import graft.sources.{Bucketing, LakeFs, Snapshots}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE path for graft snapshot tables — the half that
  * makes the connector a full table format rather than a read adapter:
  * `df.write.format("graft").option("path", root).mode("append"|
  * "overwrite").save()` and `df.writeStream.format("graft")` commit
  * through the manifest with the exact scale split production formats
  * use (the Delta/Iceberg write architecture):
  *
  *  - EXECUTORS write data files. Each task streams its partition's
  *    rows straight into the table's immutable file store under a
  *    job/task-unique name via parquet-mr (the writer twin of
  *    [[ParquetRowReader]]) — N tasks write N files in parallel, no
  *    funnel, no driver data movement, no second copy (the Scala
  *    `append` path writes to scratch then moves; here adoption is the
  *    name itself).
  *  - Each task stamps its own file's COMMIT-TIME STATS (rows, bytes,
  *    schema fingerprint, numeric + truncated-string zones) from ONE
  *    footer read of the file it just wrote — page-cache hot, executor
  *    side, via the same [[Bucketing.fileStatsEntryConf]] the Scala
  *    path uses, so manifest stats are BIT-IDENTICAL across write
  *    surfaces and the ms1 law (plans never open footers) holds for
  *    DSv2-written files too.
  *  - The DRIVER commit is METADATA ONLY: [[Snapshots.commitAdopted]]
  *    folds the per-task entries into the next manifest version under
  *    the optimistic exclusive-create, retrying (metadata-only — the
  *    files are already in place and immutable) when a rival lands
  *    first.
  *
  * Exactly-once STREAMING: the sink commits each epoch under its
  * `epochId` as the manifest `#batch:` id ([[Snapshots.appendBatch]]'s
  * idempotence) — a restarted query replaying an epoch resolves to a
  * skip and the replay's freshly-written files are deleted as orphans.
  * Aborted/zombie task files are deleted on abort; crash orphans are
  * invisible to every reader (manifests never list the directory) and
  * reclaimed by vacuum after its retention grace.
  *
  * Sorted writes: `.option("sortBy", col)` declares an
  * [[RequiresDistributionAndOrdering ordered distribution]] so Spark
  * RANGE-PARTITIONS + sorts before the writers run — each task's file
  * covers a disjoint key range and its zone stats are tight, the
  * `writeRangeSorted` layout expressed through the planner.
  * `.option("targetFileCount", n)` pins the partition (= file) count.
  *
  * Cited shape: the reference persists cleaned frames as versioned
  * artifacts, never overwriting the original (reference:
  * tool_call_agent.py:139-140 — save to a new `_clean` CSV, reload
  * from the latest) — here the versioned write surface is the
  * planner's own, at executor parallelism.
  */
class GraftWriteBuilder(root: String, tableSchema: StructType,
    info: LogicalWriteInfo, defaults: Map[String, String] = Map.empty)
  extends WriteBuilder with SupportsTruncate {
  private var truncateMode = false
  override def truncate(): WriteBuilder = { truncateMode = true; this }
  override def build(): Write = {
    // batch appends arrive pre-aligned (AppendData byName casts to the
    // table schema); STREAMING writes do not — enforce type equality on
    // same-named columns here, or mixed physical types would poison
    // uniform reads. Names compare CASE-INSENSITIVELY (SQL analysis
    // is), but a case-variant name must be rejected, not written: the
    // parquet column would carry the variant casing and readers
    // projecting the table name would null it out silently. Missing
    // columns (read NULL on new files) and new columns (schema
    // evolution) are legal, as in the Scala append.
    val byLower = tableSchema.fields
      .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f).toMap
    info.schema().fields.foreach { f =>
      byLower.get(f.name.toLowerCase(java.util.Locale.ROOT)).foreach {
        tf =>
          require(tf.name == f.name,
            s"column '${f.name}' matches table column '${tf.name}' " +
              "only case-insensitively — rename the query column to " +
              "the table's casing")
          require(tf.dataType == f.dataType,
            s"write schema mismatch on '${f.name}': table has " +
              s"${tf.dataType}, query writes ${f.dataType} — cast the " +
              "query to the table schema")
      }
    }
    new GraftWrite(root, info.schema(), info.options(), truncateMode,
      defaults, info.queryId())
  }
}

class GraftWrite(root: String, schema: StructType,
    options: CaseInsensitiveStringMap, truncate: Boolean,
    defaults: Map[String, String] = Map.empty, queryId: String = "")
  extends Write with RequiresDistributionAndOrdering {

  // write options win over table-level defaults (the catalog's `stats=`
  // property — planner-routed INSERTs carry no reader options)
  private def opt(key: String): Option[String] =
    Option(options.get(key)).orElse(defaults.get(key))
  private val sortBy: Option[String] = opt("sortBy")

  /** The table's live BUCKET layout, MAINTAINED by this write when the
    * bucket column is in the write schema: every task splits its rows
    * into one file per bucket id (`k=`-stamped), so an INSERT INTO a
    * bucketed table keeps storage-partitioned joins alive instead of
    * silently disabling them until the next relayout. A write missing
    * the bucket column lands unstamped files — the scan's
    * all-files-stamped check then disables the SPJ report SOUNDLY.
    */
  private val bucketSpec: Option[(String, Int)] = {
    // one KB-scale manifest resolution per write BUILD (driver,
    // metadata-only — the same cost class as the statement's scan and
    // commit resolutions; deliberately read from the LATEST version,
    // not the loaded table's pinned one, so a long-lived handle still
    // maintains a layout added after it loaded). A cross-surface
    // manifest cache was considered and rejected: manifests are
    // immutable per version, but vacuum DELETES them, and a cache
    // would serve vacuumed versions that must refuse.
    val v = Snapshots.latestVersion(root)
    if (v < 1) None
    else Snapshots.manifest(root, v).bucketSpec
      .filter { case (c, _) => schema.fieldNames.contains(c) }
  }
  private val statsCols: Seq[String] =
    opt("statsCols") match {
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => sortBy.toSeq
    }
  // an EXPLICIT statsCols option must name real columns; a defaulted
  // one (table property) silently intersects — a projected write is
  // not an error, its files just carry fewer zones
  Option(options.get("statsCols")).foreach(_ =>
    statsCols.foreach(c => require(schema.fieldNames.contains(c),
      s"statsCols column '$c' is not in the write schema " +
        s"${schema.fieldNames.mkString("[", ",", "]")}")))
  private val effectiveStatsCols: Seq[String] =
    statsCols.filter(schema.fieldNames.contains)

  // catalog-routed writes (INSERT INTO g.ns.t) can resolve the bucket
  // TRANSFORM through the FunctionCatalog, so they cluster rows by
  // bucket id before the writers (≤ ~n files per insert); path-based
  // writes cannot resolve the transform and skip the clustering — the
  // per-bucket FILE SPLIT in the writer maintains the layout either way
  private val viaCatalog = defaults.get("viaCatalog").contains("true")

  override def requiredDistribution(): Distribution =
    bucketSpec match {
      case Some((c, n)) if viaCatalog =>
        Distributions.clustered(Array(Expressions.bucket(n, c)))
      case _ =>
        sortBy.map(c => Distributions.ordered(Array(sortOrderOf(c))))
          .getOrElse(Distributions.unspecified())
    }
  override def requiredOrdering(): Array[SortOrder] =
    sortBy.map(c => Array(sortOrderOf(c))).getOrElse(Array.empty)
  // bucketed inserts take an ADVISORY size, never an exact partition
  // count: clustered + advisory plans as RebalancePartitions, so AQE
  // coalesces a trickle insert into one writer and SPLITS a bulk
  // insert's hot buckets across tasks (a pinned count of nBuckets
  // would cap a 1 TB insert at one task per bucket) — the writers'
  // per-bucket file split keeps every landed file pure either way
  override def requiredNumPartitions(): Int =
    if (bucketSpec.isDefined && viaCatalog) 0
    else options.getInt("targetFileCount", 0)
  override def advisoryPartitionSizeInBytes(): Long =
    if (bucketSpec.isDefined && viaCatalog)
      opt("advisoryBytes").map(_.toLong).getOrElse(64L * 1024 * 1024)
    else 0L
  private def sortOrderOf(c: String): SortOrder =
    Expressions.sort(Expressions.column(c), SortDirection.ASCENDING,
      NullOrdering.NULLS_FIRST)

  override def toBatch: BatchWrite =
    new GraftBatchWrite(root, schema, effectiveStatsCols, truncate,
      bucketSpec)
  override def toStreaming: StreamingWrite = {
    require(!truncate,
      "graft streaming sink supports append output mode only")
    new GraftStreamingWrite(root, schema, effectiveStatsCols, queryId,
      bucketSpec)
  }
}

/** Serializable result of one task's write: the manifest entries (one
  * per file — a bucket-maintaining task writes one file PER BUCKET it
  * saw; empty tasks contribute none) with their store paths for
  * abort/replay cleanup.
  */
case class GraftCommitMessage(files: Seq[(Snapshots.FileEntry, String)])
  extends WriterCommitMessage

object GraftWriteCommit {
  def entriesOf(messages: Array[WriterCommitMessage])
      : Seq[Snapshots.FileEntry] =
    messages.toSeq.collect {
      case GraftCommitMessage(fs) => fs.map(_._1)
    }.flatten
  def deleteFiles(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftCommitMessage(fs) => fs.foreach(f => LakeFs.delete(f._2))
      case _ => ()
    }
}

class GraftBatchWrite(root: String, schema: StructType,
    statsCols: Seq[String], truncate: Boolean,
    bucketSpec: Option[(String, Int)] = None) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    GraftWriterFactory.create(root, schema, statsCols, bucketSpec)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = GraftWriteCommit.entriesOf(messages)
    // an empty append is a no-op (no version churn); an empty OVERWRITE
    // is a real commit — it truncates the table, with a zero-row seed
    // file carrying the schema (a zero-FILE version would be unreadable:
    // the table's schema lives in its files)
    if (entries.nonEmpty || truncate) {
      val committed =
        if (entries.nonEmpty) entries
        else {
          val spark = org.apache.spark.sql.SparkSession.active
          val conf = spark.sessionState.newHadoopConf()
          val name = "w_truncate_seed_" +
            java.util.UUID.randomUUID().toString.replace("-", "")
              .take(12) + ".parquet"
          val path = s"$root/files/$name"
          GraftParquetSchema.newWriter(path, schema, conf).close()
          val (rows, fp, zones, szones, nulls) =
            Bucketing.fileStatsEntryConf(path, conf, Seq.empty)
          Seq(Snapshots.FileEntry(name, Some(rows),
            Some(new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
              .getFileStatus(new org.apache.hadoop.fs.Path(path))
              .getLen), Some(fp), zones, szones, nulls))
        }
      Snapshots.commitAdopted(root, committed, batchId = None,
        truncate = truncate, assumedBucket = bucketSpec)
      ()
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftWriteCommit.deleteFiles(messages)
}

class GraftStreamingWrite(root: String, schema: StructType,
    statsCols: Seq[String], queryId: String,
    bucketSpec: Option[(String, Int)] = None) extends StreamingWrite {
  // idempotence is scoped to THIS query: (queryId, epochId), kept as a
  // one-line #txn: high-water mark per query in the manifest. Keying on
  // the epoch alone would make a SECOND query's epoch 0 on the same
  // table look like a replay and silently drop its data.
  private val app = if (queryId.nonEmpty) queryId else "graft-stream"
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    GraftWriterFactory.create(root, schema, statsCols, bucketSpec)
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val entries = GraftWriteCommit.entriesOf(messages)
    // EMPTY epochs commit NOTHING — an idle source under a
    // processing-time trigger must not churn one manifest version per
    // trigger. Skipping is replay-safe without advancing the `#txn:`
    // mark: a replayed empty epoch re-executes to the same zero rows
    // (streaming sources replay an epoch from checkpointed offsets) and
    // skips again, and a later non-empty epoch advances the mark past
    // the gap (the mark is a high-water, not a contiguous set).
    if (entries.isEmpty) return
    Snapshots.commitAdopted(root, entries, batchId = Some(epochId),
      txnApp = Some(app), assumedBucket = bucketSpec) match {
      case None =>
        // replayed epoch (restart re-ran a committed batch): this run's
        // files are orphans — exactly-once means dropping them
        GraftWriteCommit.deleteFiles(messages)
      case Some(_) => ()
    }
  }
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftWriteCommit.deleteFiles(messages)
}

/** Factory shipped to executors — both the batch and the streaming
  * shape. File names are job/epoch/partition/attempt-unique, so rival
  * attempts never collide and a name is never reused (the immutability
  * the manifest layer assumes).
  */
case class GraftWriterFactory(root: String, schema: StructType,
    statsCols: Seq[String], jobId: String,
    confEntries: Map[String, String],
    bucketSpec: Option[(String, Int)] = None)
  extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftDataWriter(root, schema, statsCols,
      s"w_${jobId}_p${partitionId}_a$taskId", confEntries, bucketSpec)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new GraftDataWriter(root, schema, statsCols,
      s"w_${jobId}_e${epochId}_p${partitionId}_a$taskId",
      confEntries, bucketSpec)
}

object GraftWriterFactory {
  def create(root: String, schema: StructType, statsCols: Seq[String],
      bucketSpec: Option[(String, Int)] = None): GraftWriterFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    import scala.jdk.CollectionConverters._
    val confEntries = spark.sessionState.newHadoopConf()
      .iterator().asScala.map(e => e.getKey -> e.getValue).toMap
    GraftWriterFactory(root, schema, statsCols,
      java.util.UUID.randomUUID().toString.replace("-", "").take(12),
      confEntries, bucketSpec)
  }
}

/** Executor task writer: InternalRow → parquet via parquet-mr's example
  * Group model (the writer twin of [[ParquetRowReader]]'s reader),
  * directly at the files' final store locations. Files open LAZILY on
  * the first row they receive — a zero-row task creates nothing and
  * contributes no entries. Without a bucket spec the task writes ONE
  * file (`<prefix>.parquet`); with one it routes each row to a file
  * per [[GraftBucket.id]] value (`<prefix>_k<id>.parquet`, `k=`
  * stamped), so an append into a bucketed table MAINTAINS the
  * storage-partitioned-join layout. Catalog-routed inserts arrive
  * pre-clustered by the bucket transform (one bucket per task →
  * ~nBuckets files per insert); an unclustered path write still splits
  * correctly, just into more, smaller files — bin-pack compaction
  * re-coalesces within buckets. `commit()` closes every file and
  * stamps each one's manifest stats from one footer read of the
  * just-written file.
  */
class GraftDataWriter(root: String, schema: StructType,
    statsCols: Seq[String], namePrefix: String,
    confEntries: Map[String, String],
    bucketSpec: Option[(String, Int)] = None)
  extends DataWriter[InternalRow] {

  private val conf: Configuration = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val messageType = GraftParquetSchema.toMessageType(schema)
  private val factory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(
      messageType)
  private val appenders = GraftParquetSchema.appenders(schema)
  private var closed = false

  /** Bucket id of a row, or -1 when the write is unbucketed —
    * [[GraftBucket.rowExtractor]], the one definition every stamping
    * writer shares (NULL keys land in bucket 0).
    */
  private val bucketOf: InternalRow => Int = bucketSpec match {
    case None => _ => -1
    case Some((c, n)) => GraftBucket.rowExtractor(schema, c, n)
  }

  private final class Sink(val name: String) {
    val path = s"$root/files/$name"
    val writer = GraftParquetSchema.newWriter(path, schema, conf)
  }
  private val sinks =
    scala.collection.mutable.LinkedHashMap.empty[Int, Sink]

  override def write(row: InternalRow): Unit = {
    val k = bucketOf(row)
    val sink = sinks.getOrElseUpdate(k, new Sink(
      if (k >= 0) s"${namePrefix}_k$k.parquet"
      else s"$namePrefix.parquet"))
    val g = factory.newGroup()
    var i = 0
    while (i < appenders.length) {
      if (!row.isNullAt(i)) appenders(i)(g, row)
      i += 1
    }
    sink.writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    closeOnce()
    GraftCommitMessage(sinks.toSeq.map { case (k, s) =>
      val (rows, fp, zones, szones, nulls) =
        Bucketing.fileStatsEntryConf(s.path, conf, statsCols)
      val len = new org.apache.hadoop.fs.Path(s.path).getFileSystem(conf)
        .getFileStatus(new org.apache.hadoop.fs.Path(s.path)).getLen
      (Snapshots.FileEntry(s.name, Some(rows), Some(len), Some(fp),
        zones, szones, nulls,
        bucket = if (k >= 0) Some(k) else None), s.path)
    })
  }

  override def abort(): Unit = {
    closeOnce()
    sinks.values.foreach { s =>
      val fs = new org.apache.hadoop.fs.Path(s.path).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(s.path), false)
    }
  }

  override def close(): Unit = closeOnce()

  private def closeOnce(): Unit =
    if (!closed) { closed = true; sinks.values.foreach(_.writer.close()) }
}

/** Spark → parquet schema and row appenders for the primitive column
  * set the connector speaks (the same set [[ParquetRowReader]] reads;
  * nested types are refused at write build, matching the scan).
  */
object GraftParquetSchema {
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types => PT}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  /** The ONE writer construction every graft-written parquet file goes
    * through (task writers, truncate seeds, CREATE TABLE schema seeds)
    * — codec/mode/schema mapping can never drift between surfaces.
    */
  def newWriter(path: String, schema: StructType,
      conf: Configuration): org.apache.parquet.hadoop.ParquetWriter[
      org.apache.parquet.example.data.Group] =
    org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf))
      .withType(toMessageType(schema))
      .withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .withWriteMode(
        org.apache.parquet.hadoop.ParquetFileWriter.Mode.CREATE)
      .build()

  /** (physical primitive, logical annotation) of one scalar Spark type
    * — shared by top-level columns and LIST elements.
    */
  private def scalarMapping(dt: DataType, name: String)
      : (org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName,
        Option[LogicalTypeAnnotation]) = dt match {
    case LongType => (INT64, None)
    case IntegerType => (INT32, None)
    case ShortType => (INT32, Some(LogicalTypeAnnotation.intType(16, true)))
    case ByteType => (INT32, Some(LogicalTypeAnnotation.intType(8, true)))
    case DoubleType => (DOUBLE, None)
    case FloatType => (FLOAT, None)
    case BooleanType => (BOOLEAN, None)
    case StringType => (BINARY, Some(LogicalTypeAnnotation.stringType()))
    case BinaryType => (BINARY, None)
    case TimestampType => (INT64, Some(LogicalTypeAnnotation
      .timestampType(true, LogicalTypeAnnotation.TimeUnit.MICROS)))
    case DateType => (INT32, Some(LogicalTypeAnnotation.dateType()))
    case other => throw new IllegalArgumentException(
      s"graft DSv2 cannot write $name as $other")
  }

  def toMessageType(schema: StructType): MessageType = {
    val fields: Seq[Type] = schema.fields.toSeq.map { f =>
      f.dataType match {
        // arrays of scalars (embedding columns): the standard 3-level
        // parquet LIST — group (LIST) { repeated group list {
        // optional <elem> element } } — the layout Spark/pyarrow write
        case ArrayType(et, _) =>
          val (p, ann) = scalarMapping(et, s"${f.name} element")
          val el = ann.foldLeft(PT.optional(p))((b, a) => b.as(a))
          PT.optionalList().element(el.named("element")).named(f.name)
        case dt =>
          val (p, ann) = scalarMapping(dt, f.name)
          ann.foldLeft(PT.optional(p))((b, a) => b.as(a)).named(f.name)
      }
    }
    import scala.jdk.CollectionConverters._
    new MessageType("spark_schema", fields.asJava)
  }

  type Appender =
    (org.apache.parquet.example.data.Group, InternalRow) => Unit

  /** Typed add of one ARRAY element (ordinal `j` of `arr`) into an
    * element-holder group's field 0.
    */
  private def elementAdder(et: DataType, name: String)
      : (org.apache.parquet.example.data.Group,
        org.apache.spark.sql.catalyst.util.ArrayData, Int) => Unit =
    et match {
      case LongType | TimestampType => (g, a, j) => g.add(0, a.getLong(j))
      case IntegerType | DateType => (g, a, j) => g.add(0, a.getInt(j))
      case ShortType => (g, a, j) => g.add(0, a.getShort(j).toInt)
      case ByteType => (g, a, j) => g.add(0, a.getByte(j).toInt)
      case DoubleType => (g, a, j) => g.add(0, a.getDouble(j))
      case FloatType => (g, a, j) => g.add(0, a.getFloat(j))
      case BooleanType => (g, a, j) => g.add(0, a.getBoolean(j))
      case StringType => (g, a, j) => g.add(0,
        org.apache.parquet.io.api.Binary.fromConstantByteArray(
          a.getUTF8String(j).getBytes))
      case BinaryType => (g, a, j) => g.add(0,
        org.apache.parquet.io.api.Binary.fromConstantByteArray(
          a.getBinary(j)))
      case dt => throw new IllegalArgumentException(
        s"graft DSv2 cannot write array element $name as $dt")
    }

  def appenders(schema: StructType): Array[Appender] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val app: Appender = f.dataType match {
        case LongType | TimestampType => (g, r) => g.add(i, r.getLong(i))
        case IntegerType | DateType => (g, r) => g.add(i, r.getInt(i))
        case ShortType => (g, r) => g.add(i, r.getShort(i).toInt)
        case ByteType => (g, r) => g.add(i, r.getByte(i).toInt)
        case DoubleType => (g, r) => g.add(i, r.getDouble(i))
        case FloatType => (g, r) => g.add(i, r.getFloat(i))
        case BooleanType => (g, r) => g.add(i, r.getBoolean(i))
        case StringType => (g, r) => g.add(i,
          org.apache.parquet.io.api.Binary.fromConstantByteArray(
            r.getUTF8String(i).getBytes))
        case BinaryType => (g, r) => g.add(i,
          org.apache.parquet.io.api.Binary.fromConstantByteArray(
            r.getBinary(i)))
        case ArrayType(et, _) =>
          // 3-level LIST: column group -> repeated "list" holder per
          // element -> "element" (absent = null element)
          val addEl = elementAdder(et, f.name)
          (g, r) => {
            val arr = r.getArray(i)
            val listGroup = g.addGroup(i)
            var j = 0
            while (j < arr.numElements()) {
              val holder = listGroup.addGroup(0)
              if (!arr.isNullAt(j)) addEl(holder, arr, j)
              j += 1
            }
          }
        case dt => throw new IllegalArgumentException(
          s"graft DSv2 write supports primitive and array columns " +
            s"only: ${f.name} is $dt")
      }
      app
    }
}
