package graft.sources.v2

import graft.sources.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Manifest versions as STREAMING OFFSETS — the snapshot table as a
  * native Structured Streaming source
  * (`spark.readStream.format("graft").option("changeFeed", "true")`),
  * replacing [[graft.streaming.SnapshotFeed]]'s hand-rolled drain loop
  * with checkpointed offsets the engine owns:
  *
  *  - an OFFSET is a committed version number; a micro-batch covers the
  *    versions `(start, end]` and emits each version's FILE-GRANULAR
  *    delta (the [[graft.sources.Snapshots.netChanges]] shape before
  *    multiset cancellation), every row tagged `_graft_version` and
  *    `_graft_side` ∈ {add, remove};
  *  - per version: files added vs the parent stream as `add` (the
  *    parent-relative delta — an OPTIMIZE's rewritten survivors appear
  *    on both sides and cancel in the consumer's fold), files removed
  *    stream as `remove` with the PARENT's sidecar marks skipped (rows
  *    already dead must not be retracted twice), and freshly-marked
  *    sidecar positions on carried files stream as `remove` via the
  *    emit-only reader — a MoR delete's delta without touching the
  *    data files it marks;
  *  - exactly-once is the engine's: offsets live in the query
  *    checkpoint, a crashed batch replays the same `(start, end]`
  *    range, and an idempotent sink (foreachBatch overwrite-by-version,
  *    the ap1 convention) makes the replay invisible;
  *  - [[SupportsAdmissionControl]] bounds a deep backlog
  *    (`maxVersionsPerBatch`), and [[SupportsTriggerAvailableNow]] pins
  *    the catch-up target at query start.
  *
  * At 100 TB this is the consumer contract a mutating training-data
  * table needs: downstream indexes/replicas fold version deltas at cost
  * ∝ changed files with restart safety they do not have to build —
  * the Delta/Iceberg streaming-source shape (offsets = versions) with
  * the change feed first-class. Schema is pinned at stream start (the
  * same restriction Delta's source documents); mid-stream renames need
  * a stream restart.
  */
class GraftOffset(val version: Int) extends Offset {
  override def json(): String = version.toString
  override def equals(o: Any): Boolean = o match {
    case g: GraftOffset => g.version == version
    case _ => false
  }
  override def hashCode(): Int = version
}

class GraftMicroBatchStream(root: String, required: StructType,
    startingVersion: Int, maxVersionsPerBatch: Int,
    maxBytesPerBatch: Long = Long.MaxValue,
    auditId: Option[String] = None)
  extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  @volatile private var availableNowTarget: Option[Int] = None

  override def initialOffset(): Offset = new GraftOffset(startingVersion)
  override def latestOffset(): Offset =
    new GraftOffset(Snapshots.latestVersion(root))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s0 = start.asInstanceOf[GraftOffset].version
    val target = availableNowTarget
      .getOrElse(Snapshots.latestVersion(root))
    // long arithmetic: s0 + an unbounded per-batch cap must not wrap
    val capped = math.min(target.toLong,
      s0.toLong + maxVersionsPerBatch.toLong).toInt
    val end =
      if (maxBytesPerBatch == Long.MaxValue) capped
      else admitByBytes(s0, capped)
    new GraftOffset(math.max(s0, end))
  }

  /** BYTE-based admission (`maxBytesPerBatch`): versions vary 1000× in
    * delta size (a streaming trickle vs a backfill commit), so a
    * version-count cap alone can admit an unboundedly fat batch. Walk
    * candidate versions accumulating their `#dbytes:` stamps (ONE raw
    * metadata read each, written at commit) and stop before the budget
    * overflows — always admitting at least one version so the stream
    * can never stall, which also means a single version fatter than
    * the budget is admitted ALONE (the Delta maxBytesPerTrigger
    * semantics). A pre-stamp version's size is unknown → treated as
    * fat (admitted alone), never silently batched.
    */
  private def admitByBytes(s0: Int, capped: Int): Int = {
    var end = s0
    var budget = maxBytesPerBatch
    var v = s0 + 1
    while (v <= capped) {
      val b = Snapshots.versionDeltaBytes(root, v)
      val size = b.getOrElse(Long.MaxValue)
      if (end == s0) {
        // first version always admits (fat or unknown => alone)
        end = v
        budget = if (size >= budget) 0L else budget - size
      } else if (size <= budget) {
        end = v
        budget -= size
      } else return end
      v += 1
    }
    end
  }
  override def reportLatestOffset(): Offset =
    new GraftOffset(Snapshots.latestVersion(root))
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(Snapshots.latestVersion(root))
  override def deserializeOffset(json: String): Offset =
    new GraftOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s0 = start.asInstanceOf[GraftOffset].version
    val e = end.asInstanceOf[GraftOffset].version
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    import scala.jdk.CollectionConverters._
    val confEntries = conf.iterator().asScala
      .map(kv => kv.getKey -> kv.getValue).toMap
    val parts = ((s0 + 1) to e).flatMap { v =>
      val cur = Snapshots.manifest(root, v)
      // EQUALITY deletes have no positional delta to emit per file —
      // refuse loudly rather than stream resurrected rows; optimize
      // folds the #eq sidecars into data files and the stream resumes
      // (the eq path optimizes the WRITE side of CDC ingest; the READ
      // stream stays positional)
      require(cur.eqDeletes.isEmpty,
        s"graft change-feed streaming cannot diff version $v: it " +
          "carries live equality-delete sidecars — run optimize to " +
          "fold them first")
      def part(e: Snapshots.FileEntry, side: String,
          skipDv: Seq[String], emitDv: Option[Seq[String]],
          maps: Seq[(String, String)]): GraftStreamPartition =
        GraftStreamPartition(s"$root/files/${e.name}", e.name, root,
          skipDv, emitDv, maps, required, v, side, e.rows, confEntries,
          auditId)
      if (v == 1) {
        // the base snapshot: every referenced row is an add
        cur.entries.map(en =>
          part(en, "add", cur.dvNames.sorted, None, cur.columnMaps))
      } else {
        // a vacuumed parent fails loudly in manifest() — a stream
        // cannot diff against dropped history (Delta's startingVersion
        // has the same bound)
        val prev = Snapshots.manifest(root, v - 1)
        val prevNames = prev.files.toSet
        val curNames = cur.files.toSet
        val added = cur.entries.filterNot(en => prevNames(en.name))
          .map(en =>
            part(en, "add", cur.dvNames.sorted, None, cur.columnMaps))
        val removed = prev.entries.filterNot(en => curNames(en.name))
          .map(en =>
            part(en, "remove", prev.dvNames.sorted, None,
              prev.columnMaps))
        // freshly-marked positions on carried files: the MoR delta.
        // Fresh marks live ONLY in sidecars new to this version
        // (sidecars are immutable and disjoint by construction), so the
        // emit set is exactly the new names; which carried files they
        // touch is driver-side METADATA (directory listings / a
        // column-pruned distinct — O(marked files), never positions)
        val newDv = (cur.dvNames.toSet -- prev.dvNames.toSet)
          .toSeq.sorted
        val marked =
          if (newDv.isEmpty) Seq.empty
          else {
            val touched =
              GraftDvPositions.markedFiles(spark, root, newDv)
            prev.entries.filter(en =>
                curNames(en.name) && touched(en.name))
              .map(en => part(en, "remove", Seq.empty, Some(newDv),
                prev.columnMaps))
          }
        added ++ removed ++ marked
      }
    }
    parts.map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStreamReaderFactory()
}

/** One streamed file slice: `side`-tagged rows of one file at one
  * version — `skipDvNames` for adds/removes (the relevant version's
  * dead rows, positions resolved executor-side), `emitDvNames` for
  * fresh sidecar marks (emit ONLY this file's positions in those
  * sidecars).
  */
case class GraftStreamPartition(path: String, fileName: String,
    tableRoot: String, skipDvNames: Seq[String],
    emitDvNames: Option[Seq[String]],
    maps: Seq[(String, String)], required: StructType, version: Int,
    side: String, rowsHint: Option[Long],
    confEntries: Map[String, String], auditId: Option[String])
  extends InputPartition

class GraftStreamReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftStreamPartition]
    p.auditId.foreach(id =>
      GraftScanAudit.record(id, s"v${p.version}/${p.side}/${p.fileName}"))
    val conf = new org.apache.hadoop.conf.Configuration(false)
    p.confEntries.foreach { case (k, v) => conf.set(k, v) }
    // split the required schema into data columns (read from parquet)
    // and the tag columns (constants of this partition)
    val dataFields = p.required.fields.filterNot(f =>
      f.name == "_graft_version" || f.name == "_graft_side")
    val dataSchema = StructType(dataFields)
    val skip = GraftDvPositions.forFile(conf, p.tableRoot,
      p.skipDvNames, p.fileName)
    val emitOnly = p.emitDvNames.map(names =>
      GraftDvPositions.forFile(conf, p.tableRoot, names, p.fileName))
    val it = ParquetRowReader.open(p.path, conf, dataSchema, p.maps,
      skip, p.rowsHint, emitOnly)
    val version = p.version
    val side = UTF8String.fromString(p.side)
    // output ordinal -> data ordinal or tag
    val plan: Array[Int] = p.required.fields.map { f =>
      if (f.name == "_graft_version") -1
      else if (f.name == "_graft_side") -2
      else dataFields.indexWhere(_.name == f.name)
    }
    new PartitionReader[InternalRow] {
      override def next(): Boolean = it.next()
      override def get(): InternalRow = {
        val data = it.get()
        val out = new Array[Any](plan.length)
        var i = 0
        while (i < plan.length) {
          out(i) = plan(i) match {
            case -1 => version
            case -2 => side
            case j => data.get(j, dataSchema.fields(j).dataType)
          }
          i += 1
        }
        new GenericInternalRow(out)
      }
      override def close(): Unit = it.close()
    }
  }
}

/** Schema of the change-feed tag columns appended to the table schema
  * for streaming reads.
  */
object GraftChangeFeed {
  def schemaOf(table: StructType): StructType =
    table.add("_graft_version", IntegerType, nullable = false)
      .add("_graft_side", StringType, nullable = false)
}
