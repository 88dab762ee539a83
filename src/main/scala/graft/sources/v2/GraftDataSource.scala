package graft.sources.v2

import graft.sources.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 connector for graft SNAPSHOT tables — the planner
  * surface the bespoke Scala calls ([[graft.sources.Snapshots.readRange]]
  * / [[readRangeStr]] / [[readAsOf]]) cannot give a SQL user: with
  * {{{
  *   spark.read.format("graft")
  *     .option("path", root)
  *     .option("versionAsOf", "3")        // or timestampAsOf
  *     .load()
  * }}}
  * (or `CREATE TABLE ... USING graft OPTIONS (...)`) Catalyst drives the
  * table format directly:
  *
  *  - `SupportsPushDownFilters`: pushed range/equality conjuncts
  *    translate into manifest zone selection (numeric `z:` and truncated
  *    string `s:` commit-time stats) BEFORE any file is opened — the
  *    pp6/pp8 pruning, now reachable from a SQL `WHERE`. Every filter is
  *    also kept as a residual, so correctness never depends on the
  *    (conservative) pruning translation.
  *  - `SupportsPushDownRequiredColumns`: the pruned schema becomes a
  *    real parquet projection per file ([[ParquetRowReader]]); a
  *    zero-column COUNT(*) answers from manifest row stats without
  *    decoding a page.
  *  - `SupportsReportStatistics`: post-pruning size/row totals from the
  *    manifest's commit-time stats, so AQE sees honest numbers (join
  *    strategy, coalescing) instead of a blind default.
  *  - MoR position-delete sidecars apply INSIDE the scan (per-file
  *    sorted position skip), and logical rename/widen maps resolve per
  *    file — a reader of any option combination sees exactly what
  *    [[graft.sources.Snapshots.read]] serves.
  *
  * At 100 TB this is the difference between an engine with fast paths
  * and a table FORMAT: the planner (SQL, views, BI tools, AQE) reaches
  * the manifest economics without knowing any graft API — the reason
  * Delta/Iceberg ship as DSv2 connectors. One InputPartition per
  * selected file (the Delta/Iceberg granularity); Spark schedules and
  * re-packs tasks from there.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    if (options.getBoolean("history", false))
      return Snapshots.history(SparkSession.active,
        Option(options.get("path")).getOrElse(
          throw new IllegalArgumentException(
            "graft reads need .option(\"path\", <table root>)"))).schema
    val (root, version) = GraftDataSource.resolve(options)
    val base = Snapshots.read(SparkSession.active, root, version).schema
    if (options.getBoolean("changeFeed", false))
      GraftChangeFeed.schemaOf(base)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    if (opts.getBoolean("history", false))
      return new GraftHistoryTable(opts.get("path"), schema)
    val (root, version) = GraftDataSource.resolve(opts)
    new GraftTable(root, version, schema,
      changeFeed = opts.getBoolean("changeFeed", false),
      startingVersion = opts.getInt("startingVersion", 0),
      maxVersionsPerBatch = opts.getInt("maxVersionsPerBatch",
        Int.MaxValue),
      maxBytesPerBatch = opts.getLong("maxBytesPerBatch",
        Long.MaxValue),
      versionPinned = opts.containsKey("versionAsOf") ||
        opts.containsKey("timestampAsOf"),
      vectorize = opts.getBoolean("vectorize", true))
  }
}

object GraftDataSource {
  /** Resolve (root, version) from reader options: `path` required;
    * `versionAsOf` (version number) or `timestampAsOf` (epoch millis or
    * `yyyy-MM-dd HH:mm:ss`) optional — default the latest version, the
    * snapshot-isolation read every format defaults to.
    */
  def resolve(options: CaseInsensitiveStringMap): (String, Int) = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft reads need .option(\"path\", <table root>)"))
    val version = Option(options.get("versionAsOf")) match {
      case Some(v) => v.trim.toInt
      case None => Option(options.get("timestampAsOf")) match {
        case Some(t) =>
          val millis = scala.util.Try(t.trim.toLong).getOrElse(
            java.sql.Timestamp.valueOf(t.trim).getTime)
          Snapshots.versionAsOf(root, millis)
        case None => Snapshots.latestVersion(root)
      }
    }
    (root, version)
  }
}

/** One snapshot version as a DSv2 table — batch-readable always;
  * micro-batch-readable as the tagged change feed when `changeFeed` is
  * set (the streaming surface, [[GraftMicroBatchStream]]); batch- and
  * streaming-WRITABLE through the manifest ([[GraftWriteBuilder]]) —
  * refused when the read pinned a historical version (`versionAsOf`/
  * `timestampAsOf`): writes always extend the LATEST version, never
  * rewrite history.
  */
class GraftTable(root: String, version: Int, tableSchema: StructType,
    changeFeed: Boolean = false, startingVersion: Int = 0,
    maxVersionsPerBatch: Int = Int.MaxValue,
    maxBytesPerBatch: Long = Long.MaxValue,
    versionPinned: Boolean = false,
    scanDefaults: Map[String, String] = Map.empty,
    writeDefaults: Map[String, String] = Map.empty,
    vectorize: Boolean = true)
  extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog
      .SupportsRowLevelOperations {
  override def name(): String = s"graft.`$root` v$version"
  override def schema(): StructType = tableSchema

  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    GraftMetaColumns.columns

  /** MERGE INTO / UPDATE / fallback DELETE — the delta-based row-level
    * plan ([[GraftRowLevelOperation]]): position deletes + appended
    * rows in one conflict-checked manifest commit.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(!versionPinned,
      "cannot run row-level operations on a time-travel read: graft " +
        "writes always extend the latest version")
    new GraftRowLevelOperationBuilder(root, version, tableSchema, info,
      scanDefaults, writeDefaults)
  }

  /** SQL `DELETE FROM t WHERE ...` — accepted only when every
    * predicate translates EXACTLY ([[GraftZonePrune.fromV2Strict]]) and
    * [[graft.sources.Snapshots.canDeleteWhere]] confirms the columns
    * are applicable (present, rebuildable literal types, no pending
    * column mappings); the delete itself is the three-tier
    * metadata-drop / MoR-probe plan in
    * [[graft.sources.Snapshots.deleteWhereFilters]]. Refusing here is
    * SAFE: Spark raises a clear error (or routes to a row-level plan)
    * instead of this connector guessing at semantics it cannot honor.
    */
  override def canDeleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean = {
    if (versionPinned) return false // never rewrite history
    val fs = predicates.map(GraftZonePrune.fromV2Strict)
    fs.forall(_.nonEmpty) && Snapshots.canDeleteWhere(
      SparkSession.active, root, fs.toSeq.flatten,
      schemaHint = Some(tableSchema))
  }
  override def deleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    val fs = predicates.toSeq.map(p =>
      GraftZonePrune.fromV2Strict(p).getOrElse(throw
        new UnsupportedOperationException(
          s"graft DELETE cannot translate predicate $p exactly")))
    val r = Snapshots.deleteWhereFilters(SparkSession.active, root, fs)
    GraftDeleteAudit.record(root, r)
  }
  override def capabilities(): java.util.Set[TableCapability] =
    if (changeFeed)
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    else java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftScanBuilder(root, version, tableSchema,
      Option(options.get("auditId")).orElse(scanDefaults.get("auditId")),
      startingVersion, maxVersionsPerBatch, maxBytesPerBatch,
      vectorize && options.getBoolean("vectorize", true))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(!versionPinned,
      "cannot write to a time-travel read (versionAsOf/timestampAsOf): " +
        "graft writes always extend the latest version")
    new GraftWriteBuilder(root, tableSchema, info, writeDefaults)
  }
}

/** DESCRIBE HISTORY as a read surface:
  * `spark.read.format("graft").option("history", "true")` serves the
  * per-version commit log (version, timestamp, operation shape, file/
  * row counts — [[Snapshots.history]]'s O(versions) raw-line derivation)
  * as a driver-[[org.apache.spark.sql.connector.read.LocalScan local]]
  * relation: the log is manifest-sized metadata, never a distributed
  * scan.
  */
class GraftHistoryTable(root: String, historySchema: StructType)
  extends Table with SupportsRead {
  override def name(): String = s"graft.`$root` history"
  override def schema(): StructType = historySchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = historySchema
        override def rows()
            : Array[org.apache.spark.sql.catalyst.InternalRow] =
          Snapshots.history(SparkSession.active, root)
            .queryExecution.executedPlan.executeCollect()
        override def description(): String =
          s"GraftHistoryScan $root (manifest metadata only)"
      }
  }
}

/** Pushdown state: filters translate to manifest zone pruning (and stay
  * residual — the translation is conservative, Spark re-evaluates);
  * column pruning becomes the parquet projection; filterless
  * COUNT(* )/MIN/MAX aggregations push COMPLETELY into manifest stats —
  * the mf4 metadata-only aggregate, now planner-routed: the scan
  * answers from commit-time stats and opens ZERO files.
  */
class GraftScanBuilder(root: String, version: Int, tableSchema: StructType,
    auditId: Option[String], startingVersion: Int = 0,
    maxVersionsPerBatch: Int = Int.MaxValue,
    maxBytesPerBatch: Long = Long.MaxValue,
    vectorize: Boolean = true)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggRow: Option[(StructType, Seq[Any])] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // keep only deterministic shapes the zone translation understands;
    // EVERYTHING stays residual (return all), so pruning can only skip
    // files the stats PROVE empty for the predicate
    pushed = filters.filter(GraftZonePrune.translatable)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Complete pushdown or nothing: a metadata answer is either exactly
    * right or refused (the mf4 discipline) — there is no "partial"
    * manifest aggregate worth shipping rows for. Spark only attempts
    * this when every filter was fully pushed; this builder always keeps
    * filters residual, so aggregation arrives only on FILTERLESS scans,
    * where manifest row counts and exact zone extremes are the whole
    * truth (refused outright when live delete sidecars, rename/widen
    * maps, or missing stats could make them wrong).
    */
  // Spark probes supportCompletePushDown then calls pushAggregation
  // with the same Aggregation — memoize by reference so the manifest
  // (delta chain / parquet section) resolves ONCE per aggregate query
  private var aggMemo: Option[(AnyRef, Option[(StructType, Seq[Any])])] =
    None
  private def metadataAnswerMemo(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[(StructType, Seq[Any])] = aggMemo match {
    case Some((key, r)) if key eq agg => r
    case _ =>
      val r = metadataAnswer(agg)
      aggMemo = Some((agg, r))
      r
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    metadataAnswerMemo(agg).nonEmpty
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    aggRow = metadataAnswerMemo(agg)
    aggRow.nonEmpty
  }

  private def metadataAnswer(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return None
    val m = Snapshots.manifest(root, version)
    if (m.dvNames.nonEmpty || m.hasMappings ||
      m.eqDeletes.nonEmpty) return None
    if (!m.entries.forall(_.rows.nonEmpty)) return None
    val live = m.entries.filter(_.rows.exists(_ > 0L))
    val totalRows = m.entries.flatMap(_.rows).sum
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[org.apache.spark.sql.types.StructField] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        tableSchema.fields.find(_.name == f.fieldNames.head)
      case _ => None
    }
    /** The exact (min, max) of a column across live entries from
      * manifest stats, in the column's InternalRow representation —
      * None when any live file lacks exact bounds for it.
      */
    def extremes(f: org.apache.spark.sql.types.StructField)
        : Option[(Any, Any)] = {
      import org.apache.spark.sql.types._
      if (live.isEmpty) return Some((null, null)) // SQL min/max of empty
      f.dataType match {
        case LongType | IntegerType | ShortType | ByteType |
            TimestampType | DateType =>
          if (!live.forall(_.zones.contains(f.name))) None
          else {
            val zs = live.map(_.zones(f.name))
            val (mn, mx) = (zs.map(_._1).min, zs.map(_._2).max)
            def conv(v: Long): Any = f.dataType match {
              case LongType | TimestampType => v
              case IntegerType | DateType => v.toInt
              case ShortType => v.toShort
              case ByteType => v.toByte
              case _ => v
            }
            Some((conv(mn), conv(mx)))
          }
        case StringType =>
          // exact string extremes need UNtruncated bounds on every file
          if (!live.forall(_.szones.get(f.name).exists(z =>
            z.loExact && z.hiExact))) None
          else {
            val zs = live.map(_.szones(f.name))
            val ord: Ordering[Array[Byte]] = (a, b) =>
              java.util.Arrays.compareUnsigned(a, b)
            Some((
              org.apache.spark.unsafe.types.UTF8String.fromBytes(
                zs.map(_.lo).min(ord)),
              org.apache.spark.unsafe.types.UTF8String.fromBytes(
                zs.map(_.hi).max(ord))))
          }
        case _ => None
      }
    }
    val resolved = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        Some((org.apache.spark.sql.types.StructField("count(*)",
          org.apache.spark.sql.types.LongType, nullable = false),
          totalRows: Any))
      // COUNT(col) = rows − nulls, both commit-time exact — answerable
      // from the manifest alone when EVERY live file stamps the
      // column's null count (the `n:` stats written since they were
      // introduced; any unstamped file refuses the whole aggregate)
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).flatMap { f =>
          if (!live.forall(e => e.nulls.contains(f.name))) None
          else Some((org.apache.spark.sql.types.StructField(
            s"count(${f.name})", org.apache.spark.sql.types.LongType,
            nullable = false),
            live.map(e => e.rows.get - e.nulls(f.name)).sum: Any))
        }
      case mn: Min => fieldOf(mn.column).flatMap(f => extremes(f).map(x =>
        (f.copy(name = s"min(${f.name})", nullable = true), x._1)))
      case mx: Max => fieldOf(mx.column).flatMap(f => extremes(f).map(x =>
        (f.copy(name = s"max(${f.name})", nullable = true), x._2)))
      case _ => None
    }
    if (resolved.exists(_.isEmpty)) None
    else {
      val cols = resolved.flatten
      Some((StructType(cols.map(_._1)), cols.map(_._2)))
    }
  }

  override def build(): Scan = aggRow match {
    case Some((schema, values)) =>
      new GraftMetadataAggScan(root, version, schema, values, auditId)
    case None =>
      new GraftScan(root, version, tableSchema, required, pushed, auditId,
        startingVersion, maxVersionsPerBatch, maxBytesPerBatch,
        vectorize)
  }
}

/** The COMPLETE-pushdown scan: one partition, one row, computed on the
  * driver from the manifest alone — COUNT/MIN/MAX with zero file I/O.
  */
class GraftMetadataAggScan(root: String, version: Int,
    aggSchema: StructType, values: Seq[Any], auditId: Option[String])
  extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftMetadataAggScan $root v$version (manifest-only, 0 files)"
  override def planInputPartitions(): Array[InputPartition] = {
    auditId.foreach(id => GraftScanAudit.planned.put(id, Seq.empty))
    Array(GraftAggRowPartition(values.toArray))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition)
          : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
        val vs = partition.asInstanceOf[GraftAggRowPartition].values
        new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
          private var emitted = false
          override def next(): Boolean =
            if (emitted) false else { emitted = true; true }
          override def get(): org.apache.spark.sql.catalyst.InternalRow =
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(vs)
          override def close(): Unit = ()
        }
      }
    }
}

case class GraftAggRowPartition(values: Array[Any]) extends InputPartition

/** Zone translation of pushed source filters: `mightMatch(entry, f)` is
  * TRUE unless the file's commit-time stats PROVE no row can satisfy
  * `f` — the only direction that is always safe (a file without stats
  * for a column always might-match). Numeric zones compare in micros;
  * string zones compare unsigned UTF-8 bytes against the truncated
  * conservative bounds.
  */
object GraftZonePrune {
  def translatable(f: Filter): Boolean = f match {
    case _: sources.EqualTo | _: sources.GreaterThan |
         _: sources.GreaterThanOrEqual | _: sources.LessThan |
         _: sources.LessThanOrEqual | _: sources.In |
         _: sources.IsNull | _: sources.IsNotNull => true
    case sources.And(l, r) => translatable(l) || translatable(r)
    case sources.Or(l, r) => translatable(l) && translatable(r)
    case _ => false
  }

  /** Filter comparison value → micros/long for numeric zones; None for
    * types the zones do not speak (no pruning, never an error).
    */
  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case t: java.sql.Timestamp =>
      Some(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  private def asBytes(v: Any): Option[Array[Byte]] = v match {
    case s: String =>
      Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case _ => None
  }

  private def cmpU(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  /** True when the file's stamped stats prove EVERY row is null /
    * non-null in `c` — `n:` null counts + `r=` row counts, both
    * commit-time exact. Absent stats decide nothing (None).
    */
  private def allNull(e: Snapshots.FileEntry, c: String): Option[Boolean] =
    for (n <- e.nulls.get(c); r <- e.rows) yield n >= r
  private def noNulls(e: Snapshots.FileEntry, c: String): Boolean =
    e.nulls.get(c).contains(0L)

  def mightMatch(e: Snapshots.FileEntry, f: Filter): Boolean = f match {
    case sources.AlwaysFalse() => false
    case sources.IsNull(c) => !noNulls(e, c) // zero stamped nulls: skip
    case sources.IsNotNull(c) => !allNull(e, c).contains(true)
    // a value comparison can never match a row of an ALL-NULL column —
    // such files carry no zone (footers have no non-null value), so
    // without the null stats they would conservatively read
    case _ if valueColumnOf(f).exists(c =>
      allNull(e, c).contains(true)) => false
    case sources.EqualTo(c, v) =>
      (e.zones.get(c), asLong(v)) match {
        case (Some((mn, mx)), Some(k)) => k >= mn && k <= mx
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) =>
            cmpU(z.lo, b) <= 0 && cmpU(z.hi, b) >= 0
          case _ => true
        }
      }
    case sources.GreaterThan(c, v) =>
      (e.zones.get(c), asLong(v)) match {
        case (Some((_, mx)), Some(k)) => mx > k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) => cmpU(z.hi, b) > 0
          case _ => true
        }
      }
    case sources.GreaterThanOrEqual(c, v) =>
      (e.zones.get(c), asLong(v)) match {
        case (Some((_, mx)), Some(k)) => mx >= k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) => cmpU(z.hi, b) >= 0
          case _ => true
        }
      }
    case sources.LessThan(c, v) =>
      (e.zones.get(c), asLong(v)) match {
        case (Some((mn, _)), Some(k)) => mn < k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) => cmpU(z.lo, b) < 0
          case _ => true
        }
      }
    case sources.LessThanOrEqual(c, v) =>
      (e.zones.get(c), asLong(v)) match {
        case (Some((mn, _)), Some(k)) => mn <= k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) => cmpU(z.lo, b) <= 0
          case _ => true
        }
      }
    case sources.In(c, vs) =>
      vs.exists(v => mightMatch(e, sources.EqualTo(c, v)))
    case sources.And(l, r) => mightMatch(e, l) && mightMatch(e, r)
    case sources.Or(l, r) => mightMatch(e, l) || mightMatch(e, r)
    case _ => true
  }

  /** BUCKET pruning — the point-lookup complement zones cannot give a
    * bucketed layout: `floorMod` interleaves keys, so every file's
    * zone on the bucket column spans nearly the whole key range and
    * `k = 42` zone-prunes NOTHING — but the file's `k=` stamp names
    * the ONE bucket the key can live in, so an equality/IN filter on
    * the bucket column keeps 1/n of the files. True unless the stamp
    * PROVES every key the filter accepts hashes elsewhere; unstamped
    * files always might-match (sound — the same every-file-stamped
    * conservatism the SPJ report uses). NULL keys route to bucket 0
    * in every stamping writer ([[GraftBucket.id]]), so `IS NULL`
    * prunes to bucket 0 too.
    */
  def mightMatchBucket(e: Snapshots.FileEntry, f: Filter,
      bucketCol: String, n: Int): Boolean = e.bucket match {
    case None => true
    case Some(k) =>
      def keyHits(v: Any): Boolean = asLong(v) match {
        case Some(key) => GraftBucket.id(n, key) == k
        case None => true // non-integral comparison value: no claim
      }
      f match {
        case sources.EqualTo(c, v) if c == bucketCol => keyHits(v)
        case sources.In(c, vs) if c == bucketCol => vs.exists(keyHits)
        case sources.IsNull(c) if c == bucketCol =>
          GraftBucket.id(n, 0L) == k
        case sources.And(l, r) =>
          mightMatchBucket(e, l, bucketCol, n) &&
            mightMatchBucket(e, r, bucketCol, n)
        case sources.Or(l, r) =>
          mightMatchBucket(e, l, bucketCol, n) ||
            mightMatchBucket(e, r, bucketCol, n)
        case _ => true
      }
  }

  /** Every column a filter tree references — what a row-group pruner
    * needs block statistics for.
    */
  def filterColumnsOf(f: Filter): Seq[String] = f match {
    case sources.IsNull(c) => Seq(c)
    case sources.IsNotNull(c) => Seq(c)
    case sources.And(l, r) => filterColumnsOf(l) ++ filterColumnsOf(r)
    case sources.Or(l, r) => filterColumnsOf(l) ++ filterColumnsOf(r)
    case other => valueColumnOf(other).toSeq
  }

  /** The comparison column of a simple value predicate — None for
    * null tests, composites, and unknown shapes (the [[mightMatch]]
    * all-null guard must never intercept a structural case).
    */
  private def valueColumnOf(f: Filter): Option[String] = f match {
    case sources.EqualTo(c, _) => Some(c)
    case sources.GreaterThan(c, _) => Some(c)
    case sources.GreaterThanOrEqual(c, _) => Some(c)
    case sources.LessThan(c, _) => Some(c)
    case sources.LessThanOrEqual(c, _) => Some(c)
    case sources.In(c, _) => Some(c)
    case _ => None
  }

  /** The FULL-COVERAGE dual of [[mightMatch]]: true only when the
    * file's commit-time stats PROVE every row satisfies `f` — the proof
    * a metadata-only SQL DELETE drops a whole file on. Zone bounds
    * alone never suffice for a comparison: they describe NON-NULL
    * values, and a NULL row fails every comparison and must be KEPT —
    * so every value case additionally requires a stamped zero null
    * count. String bounds work asymmetrically under truncation: the
    * stored `lo` is a lower bound on all values whether or not it is
    * exact (a truncated lo is a PREFIX of the true min), and a
    * truncated `hi` is a STRICT upper bound (prefix-successor), so
    * `>=`/`>` prove from lo unconditionally while `=`/`<=` extremes
    * need the exact flags. Anything unprovable is false — the file
    * takes the exact-probe path instead, so a missed proof costs I/O,
    * never correctness.
    */
  def mustMatch(e: Snapshots.FileEntry, f: Filter): Boolean = f match {
    case sources.AlwaysTrue() => true
    case sources.IsNull(c) => allNull(e, c).contains(true)
    case sources.IsNotNull(c) => noNulls(e, c)
    case sources.EqualTo(c, v) => noNulls(e, c) &&
      ((e.zones.get(c), asLong(v)) match {
        case (Some((mn, mx)), Some(k)) => mn == k && mx == k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) => z.loExact && z.hiExact &&
            cmpU(z.lo, b) == 0 && cmpU(z.hi, b) == 0
          case _ => false
        }
      })
    case sources.GreaterThan(c, v) => noNulls(e, c) &&
      ((e.zones.get(c), asLong(v)) match {
        case (Some((mn, _)), Some(k)) => mn > k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) => cmpU(z.lo, b) > 0 // lo ≤ min always
          case _ => false
        }
      })
    case sources.GreaterThanOrEqual(c, v) => noNulls(e, c) &&
      ((e.zones.get(c), asLong(v)) match {
        case (Some((mn, _)), Some(k)) => mn >= k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) => cmpU(z.lo, b) >= 0
          case _ => false
        }
      })
    case sources.LessThan(c, v) => noNulls(e, c) &&
      ((e.zones.get(c), asLong(v)) match {
        case (Some((_, mx)), Some(k)) => mx < k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) =>
            // exact hi: values ≤ hi, need hi < b; truncated hi is a
            // strict bound (values < hi), so hi ≤ b suffices
            if (z.hiExact) cmpU(z.hi, b) < 0 else cmpU(z.hi, b) <= 0
          case _ => false
        }
      })
    case sources.LessThanOrEqual(c, v) => noNulls(e, c) &&
      ((e.zones.get(c), asLong(v)) match {
        case (Some((_, mx)), Some(k)) => mx <= k
        case _ => (e.szones.get(c), asBytes(v)) match {
          case (Some(z), Some(b)) => cmpU(z.hi, b) <= 0
          case _ => false
        }
      })
    case sources.In(c, vs) =>
      // provable only when the column is a stamped constant in the set
      vs.exists(v => mustMatch(e, sources.EqualTo(c, v)))
    case sources.And(l, r) => mustMatch(e, l) && mustMatch(e, r)
    case sources.Or(l, r) => mustMatch(e, l) || mustMatch(e, r)
    case _ => false
  }

  /** V2 `Predicate` (what runtime filtering delivers — DPP's IN over
    * the join keys) → the v1 `Filter` shapes [[mightMatch]] speaks.
    * Conservative: anything unrecognized translates to None (no
    * pruning), never to a wrong skip. Literal values arrive in
    * InternalRow representation (UTF8String, micros), which is exactly
    * what the zone comparisons expect after [[asLong]]/[[asBytes]]
    * normalization.
    */
  def fromV2(p: org.apache.spark.sql.connector.expressions.filter
      .Predicate): Option[sources.Filter] = {
    import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Or => VOr}
    p match {
      case a: VAnd =>
        (fromV2(a.left()), fromV2(a.right())) match {
          case (Some(l), Some(r)) => Some(sources.And(l, r))
          case (l, r) => l.orElse(r) // one conjunct still prunes soundly
        }
      case o: VOr =>
        for (l <- fromV2(o.left()); r <- fromV2(o.right()))
          yield sources.Or(l, r)
      case _ => leafFromV2(p)
    }
  }

  /** EXACT (lossless) translation of a V2 predicate tree — every node
    * must translate, or the whole tree refuses. [[fromV2]]'s partial
    * And fallback is sound for PRUNING (dropping a conjunct only
    * weakens the skip) but would be silent data corruption for a
    * DELETE, whose predicate must be applied exactly as written.
    */
  def fromV2Strict(p: org.apache.spark.sql.connector.expressions.filter
      .Predicate): Option[sources.Filter] = {
    import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Or => VOr}
    p match {
      case a: VAnd =>
        for (l <- fromV2Strict(a.left()); r <- fromV2Strict(a.right()))
          yield sources.And(l, r)
      case o: VOr =>
        for (l <- fromV2Strict(o.left()); r <- fromV2Strict(o.right()))
          yield sources.Or(l, r)
      case _ => leafFromV2(p)
    }
  }

  private def leafFromV2(p: org.apache.spark.sql.connector.expressions
      .filter.Predicate): Option[sources.Filter] = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    def field(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        Some(f.fieldNames.head)
      case _ => None
    }
    def value(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Any] = e match {
      case l: Literal[_] => l.value match {
        case u: org.apache.spark.unsafe.types.UTF8String =>
          Some(u.toString)
        case v => Some(v)
      }
      case _ => None
    }
    def binary(mk: (String, Any) => sources.Filter)
        : Option[sources.Filter] = {
      val c = p.children()
      if (c.length != 2) None
      else for (f <- field(c(0)); v <- value(c(1))) yield mk(f, v)
    }
    def unary(mk: String => sources.Filter): Option[sources.Filter] = {
      val c = p.children()
      if (c.length != 1) None else field(c(0)).map(mk)
    }
    p.name() match {
      case "IN" =>
        val c = p.children()
        if (c.length < 2) None
        else for {
          f <- field(c.head)
          vs <- Some(c.tail.toSeq.map(value))
          if vs.forall(_.nonEmpty)
        } yield sources.In(f, vs.flatten.toArray)
      case "=" => binary(sources.EqualTo.apply)
      case ">" => binary(sources.GreaterThan.apply)
      case ">=" => binary(sources.GreaterThanOrEqual.apply)
      case "<" => binary(sources.LessThan.apply)
      case "<=" => binary(sources.LessThanOrEqual.apply)
      case "IS_NULL" => unary(sources.IsNull.apply)
      case "IS_NOT_NULL" => unary(sources.IsNotNull.apply)
      case "ALWAYS_TRUE" => Some(sources.AlwaysTrue)
      case "ALWAYS_FALSE" => Some(sources.AlwaysFalse)
      case _ => None
    }
  }
}

/** EXECUTOR-side resolution of position-delete sidecars: each reader
  * loads ONLY its own file's positions, directly from the store —
  * driver memory stays O(files), never O(marked positions) (the
  *10^8-position GDPR erasure that would OOM a driver-side collect and
  * bloat every task's serialized partition). Speaks all three layouts:
  *
  *  - partitioned directories (`<name>/file=<dataFile>/part-*`): an
  *    existence probe + a scan of exactly this file's marks — each
  *    part is either `pos` ROWS or a one-row COMPRESSED BITMAP
  *    (`blob`, [[graft.sources.GraftBitmap]]); the reader requests
  *    both columns and the absent one reads null, so the two part
  *    formats coexist in one table's history;
  *  - legacy / per-task single parquet files: a column-pruned scan
  *    filtered to this file (KB-scale by construction).
  */
object GraftDvPositions {
  private val partSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("blob",
      org.apache.spark.sql.types.BinaryType)))
  private val filePosSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType)))

  /** Sorted deleted positions of `fileName` across `sidecarNames`. */
  def forFile(conf: org.apache.hadoop.conf.Configuration, root: String,
      sidecarNames: Seq[String], fileName: String): Array[Long] = {
    if (sidecarNames.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    sidecarNames.foreach { n =>
      val base = new org.apache.hadoop.fs.Path(s"$root/_deletes/$n")
      val fs = base.getFileSystem(conf)
      if (fs.getFileStatus(base).isDirectory) {
        val sub = new org.apache.hadoop.fs.Path(base, s"file=$fileName")
        if (fs.exists(sub)) {
          fs.listStatus(sub).filter(s => s.isFile &&
              s.getPath.getName.endsWith(".parquet")).foreach { part =>
            val it = ParquetRowReader.open(part.getPath.toString, conf,
              partSchema, Seq.empty, Array.empty, None)
            try while (it.next()) {
              val r = it.get()
              if (!r.isNullAt(1))
                out ++= graft.sources.GraftBitmap.decode(r.getBinary(1))
              else out += r.getLong(0)
            } finally it.close()
          }
        }
      } else {
        val it = ParquetRowReader.open(base.toString, conf,
          filePosSchema, Seq.empty, Array.empty, None)
        try while (it.next()) {
          val r = it.get()
          if (r.getUTF8String(0).toString == fileName)
            out += r.getLong(1)
        } finally it.close()
      }
    }
    out.sorted.toArray
  }

  /** DRIVER-side: the distinct data files a sidecar set marks —
    * O(marked files) metadata (directory listings for partitioned
    * sidecars, a column-pruned distinct for legacy files), used to plan
    * change-feed partitions without materializing one position.
    */
  def markedFiles(spark: SparkSession, root: String,
      sidecarNames: Seq[String]): Set[String] = {
    if (sidecarNames.isEmpty) return Set.empty
    val conf = spark.sessionState.newHadoopConf()
    val (dirs, files) = sidecarNames.partition { n =>
      val p = new org.apache.hadoop.fs.Path(s"$root/_deletes/$n")
      p.getFileSystem(conf).getFileStatus(p).isDirectory
    }
    val fromDirs = dirs.flatMap(n =>
      graft.sources.LakeFs.listDirNames(s"$root/_deletes/$n")
        .filter(_.startsWith("file="))
        .map(_.stripPrefix("file=")))
    val fromFiles =
      if (files.isEmpty) Seq.empty
      else spark.read.parquet(files.sorted
          .map(n => s"$root/_deletes/$n"): _*)
        .select(org.apache.spark.sql.functions.col("file"))
        .distinct().collect().map(_.getString(0)).toSeq
    (fromDirs ++ fromFiles).toSet
  }
}

/** EXECUTOR-side resolution of EQUALITY-delete key sets (the Iceberg v2
  * equality-delete role): each reader loads the KB-scale key sets of
  * the sidecars that scope over ITS file — one column-pruned parquet
  * read per sidecar, never a driver collect or a per-task broadcast of
  * someone else's keys. Returns one `(keyCol, isString, set)` per key
  * column (sidecars on the same column union).
  */
object GraftEqKeys {
  def forSidecars(conf: org.apache.hadoop.conf.Configuration,
      root: String, eqs: Seq[(String, String, Boolean)])
      : Seq[(String, Boolean, java.util.HashSet[AnyRef])] = {
    eqs.groupBy(e => (e._2, e._3)).toSeq.sortBy(_._1._1).map {
      case ((kc, isStr), es) =>
        val set = new java.util.HashSet[AnyRef]()
        val schema = StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            if (isStr) org.apache.spark.sql.types.StringType
            else org.apache.spark.sql.types.LongType)))
        es.foreach { case (name, _, _) =>
          val dir = new org.apache.hadoop.fs.Path(s"$root/_deletes/$name")
          val fs = dir.getFileSystem(conf)
          fs.listStatus(dir).filter(s => s.isFile &&
              s.getPath.getName.endsWith(".parquet")).foreach { part =>
            val it = ParquetRowReader.open(part.getPath.toString, conf,
              schema, Seq.empty, Array.empty, None)
            try while (it.next()) {
              val r = it.get()
              if (!r.isNullAt(0))
                set.add(if (isStr) r.getUTF8String(0).copy()
                  else java.lang.Long.valueOf(r.getLong(0)))
            } finally it.close()
          }
        }
        (kc, isStr, set)
    }
  }
}

/** One InputPartition per zone-selected file. Everything an executor
  * needs rides the partition: path, the version's live sidecar NAMES
  * (positions resolve executor-side via [[GraftDvPositions]]), the
  * rename chain, the required schema, the manifest row hint, and the
  * Hadoop conf entries.
  */
case class GraftInputPartition(path: String, fileName: String,
    tableRoot: String, dvNames: Seq[String],
    maps: Seq[(String, String)],
    required: StructType, rowsHint: Option[Long],
    confEntries: Map[String, String], auditId: Option[String],
    pushed: Seq[Filter] = Seq.empty,
    bytesHint: Option[Long] = None,
    vectorized: Boolean = false,
    /** Equality-delete sidecars APPLICABLE to this file (added-before
      * scoping already applied driver-side): (sidecar name, key column,
      * key-is-string) — readers resolve the KB-scale key sets
      * executor-side like dv positions.
      */
    eqDeletes: Seq[(String, String, Boolean)] = Seq.empty)
  extends InputPartition

/** A [[GraftInputPartition]] carrying its file's bucket id as the
  * partition key — what `KeyGroupedPartitioning` groups tasks by for
  * storage-partitioned joins (all rows of the wrapped file share this
  * `bucket(n, col)` value by the [[graft.sources.Snapshots
  * .optimizeBucketed]] layout).
  */
case class GraftBucketedPartition(base: GraftInputPartition,
    bucketId: Int)
  extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucketId))
  override def preferredLocations(): Array[String] =
    base.preferredLocations()
}

class GraftScan(root: String, version: Int, tableSchema: StructType,
    required: StructType, pushed: Array[Filter], auditId: Option[String],
    startingVersion: Int = 0, maxVersionsPerBatch: Int = Int.MaxValue,
    maxBytesPerBatch: Long = Long.MaxValue,
    vectorize: Boolean = true)
  extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  // resolved once per scan, driver-side: manifest + zone selection;
  // a provably EMPTY file (rows=0 commit-time stat — e.g. a CREATE
  // TABLE's schema seed) can never contribute a row and is skipped
  // unconditionally
  private lazy val m = Snapshots.manifest(root, version)
  /** Zone AND bucket-stamp admission of one file against one filter
    * (bucket pruning covers the point lookups a bucketed layout's
    * interleaved zones cannot — [[GraftZonePrune.mightMatchBucket]]).
    * The spec is parsed from the manifest meta ONCE per scan —
    * `ManifestData.bucketSpec` is a def over the meta lines, and
    * admits runs per (file, filter) on the plan hot path.
    */
  private lazy val liveBucketSpec: Option[(String, Int)] = m.bucketSpec
  private def admits(e: Snapshots.FileEntry, f: Filter): Boolean =
    GraftZonePrune.mightMatch(e, f) && (liveBucketSpec match {
      case Some((c, n)) => GraftZonePrune.mightMatchBucket(e, f, c, n)
      case None => true
    })
  private lazy val planSelected: Seq[Snapshots.FileEntry] =
    m.entries.filter(e => !e.rows.contains(0L) &&
      pushed.forall(f => admits(e, f)))
  // runtime filtering (DPP: Spark materializes a broadcast join's build
  // side and pushes IN over the probe keys) re-prunes the selection
  // against the same zone stats BEFORE partitions are planned — the
  // file-skipping a partitioned format gets from partition pruning,
  // from sorted zones instead
  @volatile private var runtimePruned
      : Option[Seq[Snapshots.FileEntry]] = None
  private def selected: Seq[Snapshots.FileEntry] =
    runtimePruned.getOrElse(planSelected)

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    m.entries.flatMap(e => e.zones.keysIterator ++ e.szones.keysIterator)
      .distinct
      // only columns in the scan OUTPUT — Spark resolves these against
      // the pruned projection, not the table schema
      .filter(required.fieldNames.contains)
      .map(c => org.apache.spark.sql.connector.expressions.Expressions
        .column(c)).toArray

  override def filter(predicates: Array[org.apache.spark.sql.connector
      .expressions.filter.Predicate]): Unit = {
    val fs = predicates.flatMap(GraftZonePrune.fromV2)
    if (fs.nonEmpty)
      runtimePruned = Some(selected.filter(e =>
        fs.forall(f => admits(e, f))))
  }

  /** The scan's BUCKET layout, trusted only when (a) the manifest
    * carries a `#bucket:` spec, (b) EVERY selected file is stamped with
    * its bucket (`k=` — un-bucketed appends since the relayout disable
    * the claim), and (c) the bucket column survives into the output
    * (the join key must be resolvable against this scan).
    */
  private def bucketLayout: Option[(String, Int)] =
    liveBucketSpec.filter { case (c, _) =>
      required.fieldNames.contains(c) && selected.nonEmpty &&
        selected.forall(_.bucket.isDefined)
    }

  /** STORAGE-PARTITIONED JOINS: report the bucketed layout as
    * `KeyGroupedPartitioning(bucket(n, col))` — with
    * `spark.sql.sources.v2.bucketing.enabled`, a join between two
    * tables bucketed by the SAME catalog function and count on the
    * join key groups this scan's partitions by bucket id and runs
    * WITHOUT an Exchange on either side (the planner resolves the
    * transform back to [[GraftBucketFunction]] through the catalog).
    * Non-bucketed layouts report unknown — the normal shuffle plan.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    bucketLayout match {
      case Some((c, n)) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            Array(org.apache.spark.sql.connector.expressions.Expressions
              .bucket(n, c)),
            selected.flatMap(_.bucket).distinct.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(root, required, startingVersion,
      maxVersionsPerBatch, maxBytesPerBatch, auditId)
  override def description(): String =
    s"GraftScan $root v$version files=${selected.size}/${m.entries.size} " +
      s"pushed=[${pushed.mkString(", ")}]"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      if (selected.forall(_.bytes.nonEmpty))
        java.util.OptionalLong.of(selected.flatMap(_.bytes).sum)
      else java.util.OptionalLong.empty()
    override def numRows(): java.util.OptionalLong =
      if (selected.forall(_.rows.nonEmpty))
        java.util.OptionalLong.of(selected.flatMap(_.rows).sum)
      else java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    require(required.fields.forall(f => f.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) => et match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: StructType => false
        case _ => true // array<scalar>: the embedding-column shape
      }
      case _: org.apache.spark.sql.types.MapType |
           _: StructType => false
      case _ => true
    }), "graft DSv2 scan supports primitive and array<scalar> columns")
    val conf = spark.sessionState.newHadoopConf()
    import scala.jdk.CollectionConverters._
    val confEntries = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    auditId.foreach(id =>
      GraftScanAudit.planned.put(id, selected.map(_.name)))
    // COLUMNAR path (Spark's vectorized parquet reader) — the DEFAULT
    // for every batch scan shape ([[GraftColumnarReader]]): delete
    // sidecars apply as a row-index selection, rename/widen maps and
    // mixed file schemas adapt PER FILE, `_file`/`_pos` metadata
    // columns serve as constant/row-index vectors, and pushed filters
    // translate to parquet FilterPredicates (the residual re-evaluates
    // above the scan). The row reader remains only for projections
    // with no data column at all (pure-count / pure-position reads,
    // which answer from footer metadata without decoding a page) and
    // explicit `vectorize=false`.
    val dataFields = required.fields.filterNot(f =>
      GraftMetaColumns.isMeta(f.name))
    val vectorized = vectorize && dataFields.nonEmpty &&
      dataFields.forall(f => f.name != GraftColumnarReader.RowIdxName &&
        (f.dataType match {
          case org.apache.spark.sql.types.ArrayType(et, _) => et match {
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 _: StructType => false
            case _ => true
          }
          case _: org.apache.spark.sql.types.MapType |
               _: StructType => false
          case _ => true
        }))
    // sidecar NAMES ride the partitions; each reader resolves its own
    // file's positions executor-side ([[GraftDvPositions]]) — the
    // driver never materializes a position. Equality deletes ship only
    // to the files they SCOPE over (added-before semantics).
    val bucketed = bucketLayout.isDefined
    def eqFor(e: Snapshots.FileEntry): Seq[(String, String, Boolean)] =
      m.eqDeletes.filter(_.appliesTo(e)).map { eq =>
        val isString = tableSchema.fields.find(_.name == eq.keyCol)
          .exists(_.dataType == org.apache.spark.sql.types.StringType)
        (eq.name, eq.keyCol, isString)
      }
    selected.map { e =>
      val p = GraftInputPartition(s"$root/files/${e.name}", e.name, root,
        m.dvNames.sorted,
        m.columnMaps, required, e.rows, confEntries, auditId,
        pushed.toSeq, e.bytes, vectorized, eqFor(e))
      // the partition key MUST accompany a KeyGroupedPartitioning
      // report — same bucketLayout decision as outputPartitioning()
      if (bucketed) GraftBucketedPartition(p, e.bucket.get)
      else p: InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory()
}

/** The connector's metadata columns — the row-identity pair every
  * row-level operation keys on (the Iceberg `_file`/`_pos` shape):
  * `_file` is the data file's store name, `_pos` its record ordinal
  * (the same positions delete sidecars mark). Served by the scan like
  * any column; consumed by [[GraftRowLevelOperation]] as the rowId.
  */
object GraftMetaColumns {
  val File = "_file"
  val Pos = "_pos"
  val names: Set[String] = Set(File, Pos)
  def isMeta(n: String): Boolean = names.contains(n)
  def columns: Array[org.apache.spark.sql.connector.catalog
      .MetadataColumn] = Array(
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = File
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment(): String = "data file store name"
    },
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = Pos
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "row position (file ordinal, the sidecar position space)"
    })
}

/** Executor factory: rebuilds the Hadoop conf from the shipped entries
  * and streams the file through [[ParquetRowReader]] (widen casts ride
  * the required schema's target types; the rename chain rides each
  * partition). `_file`/`_pos` metadata columns are filled here — the
  * file name is the partition's own, the position the reader's record
  * ordinal — at whatever slots the required schema puts them.
  */
class GraftReaderFactory() extends PartitionReaderFactory {

  /** Strip the [[GraftBucketedPartition]] key carrier — readers see the
    * plain file partition either way.
    */
  private def unwrap(partition: InputPartition): InputPartition =
    partition match {
      case b: GraftBucketedPartition => b.base
      case p => p
    }

  /** COLUMNAR reads via Spark's own `VectorizedParquetRecordReader` —
    * whole-stage codegen consumes `ColumnarBatch`es instead of one
    * boxed `Group` + `GenericInternalRow` per row, the 3-10× wide-scan
    * gap the row-at-a-time path cannot close. Planned per scan
    * ([[GraftScan.planInputPartitions]]'s `vectorized` decision), so
    * every partition of a scan answers identically (Spark requires a
    * scan to be all-columnar or all-row).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    unwrap(partition) match {
      case p: GraftInputPartition => p.vectorized
      case _ => false
    }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = unwrap(partition).asInstanceOf[GraftInputPartition]
    p.auditId.foreach(id => GraftScanAudit.record(id, p.fileName))
    GraftVectorizedAudit.batches.incrementAndGet()
    new GraftColumnarReader(p)
  }

  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = unwrap(partition).asInstanceOf[GraftInputPartition]
    p.auditId.foreach(id => GraftScanAudit.record(id, p.fileName))
    val conf = new org.apache.hadoop.conf.Configuration(false)
    p.confEntries.foreach { case (k, v) => conf.set(k, v) }
    val deletedPositions = GraftDvPositions.forFile(conf, p.tableRoot,
      p.dvNames, p.fileName)
    val eqSets =
      if (p.eqDeletes.isEmpty) Seq.empty
      else GraftEqKeys.forSidecars(conf, p.tableRoot, p.eqDeletes)
    val metaIdx = p.required.fields.zipWithIndex.collect {
      case (f, i) if GraftMetaColumns.isMeta(f.name) => (f.name, i)
    }
    if (metaIdx.isEmpty && eqSets.isEmpty) {
      val it = ParquetRowReader.open(p.path, conf, p.required, p.maps,
        deletedPositions, p.rowsHint, rowGroupFilters = p.pushed)
      new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
        override def next(): Boolean = it.next()
        override def get(): org.apache.spark.sql.catalyst.InternalRow =
          it.get()
        override def close(): Unit = it.close()
      }
    } else {
      val dataFields = p.required.fields.filterNot(f =>
        GraftMetaColumns.isMeta(f.name))
      val dataIdx = p.required.fields.zipWithIndex.collect {
        case (f, i) if !GraftMetaColumns.isMeta(f.name) => i
      }
      // equality-key columns the projection pruned away are read
      // INTERNALLY (appended after the data fields, dropped on output)
      val extraKeys = eqSets.map(k => (k._1, k._2)).distinct
        .filterNot { case (kc, _) => dataFields.exists(_.name == kc) }
        .map { case (kc, isStr) =>
          org.apache.spark.sql.types.StructField(kc,
            if (isStr) org.apache.spark.sql.types.StringType
            else org.apache.spark.sql.types.LongType, nullable = true)
        }
      val readFields = dataFields ++ extraKeys
      val fileVal = org.apache.spark.unsafe.types.UTF8String
        .fromString(p.fileName)
      val it = ParquetRowReader.open(p.path, conf,
        StructType(readFields), p.maps, deletedPositions, p.rowsHint,
        emitPos = metaIdx.nonEmpty, rowGroupFilters = p.pushed)
      val eqProbe = eqSets.map { case (kc, isStr, set) =>
        (readFields.indexWhere(_.name == kc), isStr, set)
      }.toArray
      def eqDead(in: org.apache.spark.sql.catalyst.InternalRow)
          : Boolean = {
        var i = 0
        while (i < eqProbe.length) {
          val (ord, isStr, set) = eqProbe(i)
          if (!in.isNullAt(ord)) {
            val v: AnyRef =
              if (isStr) in.getUTF8String(ord)
              else java.lang.Long.valueOf(in.getLong(ord))
            if (set.contains(v)) return true
          }
          i += 1
        }
        false
      }
      new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
        private var cur: org.apache.spark.sql.catalyst.InternalRow = _
        override def next(): Boolean = {
          while (it.next()) {
            val in = it.get()
            if (!eqDead(in)) {
              val out = new Array[Any](p.required.size)
              var j = 0
              while (j < dataIdx.length) {
                out(dataIdx(j)) = in.get(j, dataFields(j).dataType)
                j += 1
              }
              if (metaIdx.nonEmpty) {
                val pos = in.getLong(readFields.length)
                metaIdx.foreach {
                  case (GraftMetaColumns.File, i) => out(i) = fileVal
                  case (GraftMetaColumns.Pos, i) => out(i) = pos
                  case _ => ()
                }
              }
              cur = new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(out)
              return true
            }
          }
          false
        }
        override def get(): org.apache.spark.sql.catalyst.InternalRow =
          cur
        override def close(): Unit = it.close()
      }
    }
  }
}

/** LOCAL-MODE test hooks: `batches` counts partitions that opened the
  * COLUMNAR (vectorized) reader — the A/B evidence that a scan actually
  * took the fast path; `selectedBatches` counts batches that applied a
  * delete-vector row selection ([[SelectedColumnVector]]) — the
  * evidence that a MoR scan stayed columnar THROUGH its sidecars.
  */
object GraftVectorizedAudit {
  val batches = new java.util.concurrent.atomic.AtomicLong
  val selectedBatches = new java.util.concurrent.atomic.AtomicLong
  /** Parquet footer READS performed by columnar partition readers —
    * exactly ONE per file per scan (the same read serves name/filter
    * binding and the vectorized reader), even on mapped/filtered scans
    * that used to pay a second open. Specs pin `delta == files`.
    */
  val footerReads = new java.util.concurrent.atomic.AtomicLong
}

/** LOCAL-MODE test hook: the outcome of the last SQL DELETE per table
  * root — how many files dropped as pure metadata vs probed for
  * positions — so gates can assert the three-tier plan did what the
  * stats promised (a fully-covered file must NEVER take the probe
  * path).
  */
object GraftDeleteAudit {
  /** Retention bound: a long-lived session touching many table roots
    * keeps only the most recent ones (insertion-ordered eviction) —
    * the hook is per-root "last delete" introspection, not a log.
    */
  private val MaxRoots = 64
  private val order = new java.util.concurrent
    .ConcurrentLinkedQueue[String]()
  private val last: scala.collection.concurrent
      .TrieMap[String, Snapshots.SqlDeleteResult] =
    scala.collection.concurrent.TrieMap.empty
  def record(root: String, r: Snapshots.SqlDeleteResult): Unit = {
    if (last.put(root, r).isEmpty) {
      order.add(root)
      while (last.size > MaxRoots) {
        val oldest = order.poll()
        if (oldest != null) last.remove(oldest) else last.clear()
      }
    }
    ()
  }
  def lastResult(root: String): Option[Snapshots.SqlDeleteResult] =
    last.get(root)
  def clear(root: String): Unit = {
    last.remove(root)
    ()
  }
}

/** LOCAL-MODE test hook: per-`auditId` ground truth of what a scan
  * planned (driver) and what its readers actually opened (executors —
  * same JVM under local[*]); the pp6-style strictness gates for DSv2
  * reads, where `input_file_name()` is empty on custom readers.
  */
object GraftScanAudit {
  val planned: scala.collection.concurrent.TrieMap[String, Seq[String]] =
    scala.collection.concurrent.TrieMap.empty
  private val openedMap: scala.collection.concurrent
      .TrieMap[String, scala.collection.concurrent.TrieMap[String, Unit]] =
    scala.collection.concurrent.TrieMap.empty
  def record(auditId: String, file: String): Unit = {
    openedMap.getOrElseUpdate(auditId,
      scala.collection.concurrent.TrieMap.empty).put(file, ())
    ()
  }
  def opened(auditId: String): Set[String] =
    openedMap.get(auditId).map(_.keySet.toSet).getOrElse(Set.empty)
  def clear(auditId: String): Unit = {
    planned.remove(auditId)
    openedMap.remove(auditId)
    ()
  }
}
