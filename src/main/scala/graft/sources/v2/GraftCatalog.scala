package graft.sources.v2

import graft.sources.{LakeFs, Snapshots}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A filesystem-backed V2 `TableCatalog` over graft snapshot tables —
  * the last planner surface the format needs: with
  * {{{
  *   spark.sql.catalog.g = graft.sources.v2.GraftCatalog
  *   spark.sql.catalog.g.warehouse = /path/to/warehouse
  * }}}
  * SQL owns the table lifecycle end to end, no graft API in sight:
  *
  *  - `CREATE NAMESPACE g.ns` / `CREATE TABLE g.ns.t (...) USING graft
  *    TBLPROPERTIES ('stats'='k')` — the `stats` property persists as
  *    the table's `stats=` prop, so every planner-routed write stamps
  *    commit-time zones for those columns with no option in sight;
  *  - `INSERT INTO g.ns.t SELECT ...` / `INSERT OVERWRITE` — the DSv2
  *    write path ([[GraftWrite]]): executors write store files, the
  *    driver commit is a metadata-only OCC manifest create;
  *  - `SELECT ... FROM g.ns.t WHERE ...` — manifest zone pruning via
  *    the pushed filters ([[GraftScanBuilder]]);
  *  - `SELECT ... FROM g.ns.t VERSION AS OF 3` and
  *    `TIMESTAMP AS OF '...'` — Spark's native time-travel syntax
  *    resolving through `loadTable(ident, version|timestampMicros)` to
  *    the manifest history ([[Snapshots.versionAsOf]]); a time-travel
  *    relation is read-only (writes extend only the latest version);
  *  - CTAS (`CREATE TABLE g.ns.t2 AS SELECT ...`) — create + append.
  *
  * Layout: one directory per namespace level under the warehouse; a
  * table is any directory holding a `_manifests` child. Catalog
  * metadata IS the filesystem — no side database to drift from the
  * tables (the Delta "path is truth" stance), so a thousand writers on
  * a thousand executors coordinate only through each table's own
  * atomic manifest creates.
  *
  * Cited shape: the reference resolves tables by path convention and
  * bookkeeping files (reference: tool_call_agent.py:139-140 — `_clean`
  * suffixed artifacts in the source's own directory); the catalog is
  * that convention made a planner citizen.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  private var catalogName: String = _
  private var warehouse: String = _
  private var auditId: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse"))
    auditId = Option(options.get("auditId")) // test/audit hook
  }
  override def name(): String = catalogName

  private def dirOf(namespace: Array[String]): String =
    (warehouse +: namespace.toSeq).mkString("/")
  private def rootOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")
  private def isTableDir(dir: String): Boolean =
    LakeFs.exists(s"$dir/_manifests")

  // -------------------------------------------------------------------
  // Tables
  // -------------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace)
    if (!LakeFs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    LakeFs.listDirNames(dir).filter(d => isTableDir(s"$dir/$d"))
      .map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(rootOf(ident))

  override def loadTable(ident: Identifier): Table = tableAt(ident, None)

  /** `VERSION AS OF <v>` — Spark hands the version text through. */
  override def loadTable(ident: Identifier, version: String): Table =
    tableAt(ident, Some(
      scala.util.Try(version.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"graft VERSION AS OF takes an integer version, got '$version'"))))

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = rootOf(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    tableAt(ident, Some(Snapshots.versionAsOf(root,
      Math.floorDiv(timestampMicros, 1000L))))
  }

  private def tableAt(ident: Identifier, version: Option[Int])
      : GraftTable = {
    val root = rootOf(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    val v = version.getOrElse(Snapshots.latestVersion(root))
    val schema = Snapshots.read(spark, root, v).schema
    val stats = Snapshots.statsColsProp(root)
    new GraftTable(root, v, schema, versionPinned = version.nonEmpty,
      scanDefaults = auditId.map("auditId" -> _).toMap,
      // viaCatalog: this table can resolve the bucket TRANSFORM through
      // the session's FunctionCatalog, so a bucketed write may require
      // a clustered-by-bucket distribution (path-based writes cannot)
      writeDefaults = Map("viaCatalog" -> "true") ++
        (if (stats.nonEmpty) Map("statsCols" -> stats.mkString(","))
         else Map.empty))
  }

  /** CREATE TABLE: an EMPTY v1 whose schema rides a zero-row seed
    * parquet file (written driver-side through the same parquet schema
    * mapping the executors write with) — every read/write path then
    * works unchanged, no special empty-table state in the manifest
    * layer. The `stats` table property becomes the persistent default
    * stats columns for planner-routed writes.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables do not take PARTITIONED BY — layout is manifest-" +
        "planned (sorted writes + zone stats prune like partitions)")
    val root = rootOf(ident)
    if (isTableDir(root)) throw new TableAlreadyExistsException(ident)
    val spark = SparkSession.active
    val stats = Option(properties.get("stats")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    stats.foreach(c => require(schema.fieldNames.contains(c),
      s"stats property names unknown column '$c'"))
    val seedDir = s"$root/__create_seed"
    LakeFs.mkdirs(seedDir)
    val conf = spark.sessionState.newHadoopConf()
    GraftParquetSchema.newWriter(s"$seedDir/seed-00000.parquet", schema,
      conf).close() // zero rows: the file exists to carry the schema
    try Snapshots.init(spark, root, seedDir, statsCols = stats,
      extraProps =
        if (stats.nonEmpty) Seq(s"stats=${stats.mkString(",")}")
        else Seq.empty)
    finally {
      LakeFs.deleteRecursively(seedDir)
      ()
    }
    tableAt(ident, None)
  }

  /** ALTER TABLE — the evolutions the format carries: `RENAME COLUMN`
    * and `ALTER COLUMN ... TYPE` widening to BIGINT/DOUBLE are
    * metadata-only (`#map:`/`#widen:` manifest lines; zero files
    * touched, the se2 machinery); `ADD COLUMN` commits one ZERO-ROW
    * schema-seed file carrying the widened logical schema — the
    * table's schema is its files' union, so a new column becomes
    * representable by giving it a (rowless) physical file, and every
    * existing row reads it as NULL (the Delta ADD COLUMN semantics at
    * one KB-file of cost); `DROP COLUMN` is a metadata-only `#drop:`
    * tombstone — the schema hides the column, old versions still serve
    * it through time travel, and the NAME IS RETIRED (re-ADD and
    * RENAME onto a dropped name are refused: without field ids, a
    * reused name would resurrect retained physical values in files
    * written before the drop). Each change is its own manifest commit,
    * so it is time-travelable and OCC-safe like any write.
    * Nullability and comments stay refused.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val root = rootOf(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    // VALIDATE the whole change set before applying ANY of it — each
    // accepted change is its own durable manifest commit, so a late
    // rejection must not leave earlier changes half-applied behind a
    // statement Spark reports as failed. Validation tracks the LOGICAL
    // schema as the change set evolves it (a rename frees its old name
    // and claims its new one), so existence and collision checks hold
    // for each change in sequence, not just against the initial state.
    var logicalCols: Set[String] = {
      val spark = SparkSession.active
      Snapshots.read(spark, root, Snapshots.latestVersion(root))
        .schema.fieldNames.toSet
    }
    // RETIRED names — reusing any of them would resurrect stale
    // physical values (no field ids; resolution is by name):
    //  - `#drop:` tombstones (forever — unrewritten files keep data);
    //  - the OLD side of every LIVE `#map:` rename (files written
    //    before the rename still hold the old name physically; a new
    //    logical column under that name would read their bytes). Map
    //    retirements heal when optimize materializes the renames and
    //    drops the lines — the physical name is gone from every live
    //    file at that point.
    val curManifest = Snapshots
      .manifest(root, Snapshots.latestVersion(root))
    var retired: Set[String] = curManifest.droppedColumns.toSet ++
      curManifest.columnMaps.map(_._1)
    val statsProp = Snapshots.statsColsProp(root).toSet
    val apply: Seq[() => Unit] = changes.map {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames().length == 1,
          "graft columns are top-level only")
        val (from, to) = (r.fieldNames().head, r.newName())
        require(logicalCols.contains(from),
          s"RENAME COLUMN: no column '$from' in " +
            logicalCols.toSeq.sorted.mkString("[", ", ", "]"))
        require(!logicalCols.contains(to),
          s"RENAME COLUMN: '$to' already exists")
        require(!retired.contains(to),
          s"RENAME COLUMN: '$to' is retired (an earlier rename or drop " +
            "left physical data under that name in unrewritten files)")
        logicalCols = logicalCols - from + to
        retired += from // the old name's physical data stays in place
        () => {
          Snapshots.renameColumn(root, from, to)
          // keep the stats= default pointing at the renamed column, or
          // planner-routed writes would silently stop stamping zones
          Snapshots.renameInStatsProp(root, from, to)
        }
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames().length == 1,
          "graft columns are top-level only")
        val name = d.fieldNames().head
        require(logicalCols.contains(name),
          s"DROP COLUMN: no column '$name' in " +
            logicalCols.toSeq.sorted.mkString("[", ", ", "]"))
        require(logicalCols.size > 1,
          s"DROP COLUMN: cannot drop the last column '$name'")
        require(!statsProp.contains(name),
          s"DROP COLUMN: '$name' is a stats column (the table's zone/" +
            "pruning key) — re-sort the table on another column first")
        logicalCols -= name
        retired += name
        () => {
          Snapshots.dropColumn(SparkSession.active, root, name)
          ()
        }
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "graft columns are top-level only")
        val name = a.fieldNames().head
        require(!logicalCols.contains(name),
          s"ADD COLUMN: '$name' already exists")
        require(!retired.contains(name),
          s"ADD COLUMN: '$name' is retired (an earlier rename or drop " +
            "left physical data under that name in unrewritten files); " +
            "add it under a new name, or optimize first to materialize " +
            "renames")
        require(a.isNullable,
          "ADD COLUMN must be nullable: existing rows have no value")
        // fail early on types the parquet writer cannot render
        GraftParquetSchema.toMessageType(StructType(Seq(
          org.apache.spark.sql.types.StructField(name, a.dataType()))))
        logicalCols += name
        () => {
          val spark = SparkSession.active
          val cur = Snapshots.read(spark, root,
            Snapshots.latestVersion(root)).schema
          val widened = cur.add(name, a.dataType(), nullable = true)
          val conf = spark.sessionState.newHadoopConf()
          val seed = "w_addcol_" + java.util.UUID.randomUUID().toString
            .replace("-", "").take(12) + ".parquet"
          val p = s"$root/files/$seed"
          GraftParquetSchema.newWriter(p, widened, conf).close()
          val (rows, fp, zones, szones, nulls) =
            graft.sources.Bucketing.fileStatsEntryConf(p, conf, Seq.empty)
          Snapshots.commitRowDelta(root,
            Seq(Snapshots.FileEntry(seed, Some(rows),
              Some(LakeFs.fileLength(p)), Some(fp), zones, szones,
              nulls)),
            Seq.empty, Set.empty,
            scannedVersion = Snapshots.latestVersion(root))
          ()
        }
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames().length == 1,
          "graft columns are top-level only")
        require(logicalCols.contains(u.fieldNames().head),
          s"ALTER COLUMN: no column '${u.fieldNames().head}' in " +
            logicalCols.toSeq.sorted.mkString("[", ", ", "]"))
        val target = u.newDataType() match {
          case org.apache.spark.sql.types.LongType => "long"
          case org.apache.spark.sql.types.DoubleType => "double"
          case dt => throw new UnsupportedOperationException(
            s"graft widens to BIGINT or DOUBLE only, got $dt")
        }
        () => { Snapshots.widenColumn(root, u.fieldNames().head, target); () }
      case c => throw new UnsupportedOperationException(
        s"graft ALTER TABLE supports ADD/DROP/RENAME COLUMN and " +
          s"type widening only, got $c")
    }
    apply.foreach(_())
    tableAt(ident, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (!isTableDir(root)) false
    else LakeFs.deleteRecursively(root)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!isTableDir(rootOf(from))) throw new NoSuchTableException(from)
    if (isTableDir(rootOf(to))) throw new TableAlreadyExistsException(to)
    LakeFs.move(rootOf(from), rootOf(to))
  }

  // -------------------------------------------------------------------
  // Procedures — table maintenance via SQL CALL
  // -------------------------------------------------------------------

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftProcedures.names.map(Identifier.of(Array("system"), _))
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft procedures live in the `system` namespace, got $ident")
    GraftProcedures.load(ident.name(), warehouse)
  }

  // -------------------------------------------------------------------
  // Functions — the SPJ clustering function (storage-partitioned joins
  // resolve a scan's reported bucket transform back through here)
  // -------------------------------------------------------------------

  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array(Identifier.of(namespace, "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    // SPJ resolution looks the transform's name up in the EMPTY
    // namespace (V2ExpressionUtils); accept `system` for human CALLs
    if (ident.name() == "bucket" && (ident.namespace().isEmpty ||
        ident.namespace().sameElements(Array("system"))))
      GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  // -------------------------------------------------------------------
  // Namespaces (directories that are not tables)
  // -------------------------------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (LakeFs.exists(dirOf(namespace)) && !isTableDir(dirOf(namespace)))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val dir = dirOf(namespace)
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    if (!LakeFs.exists(dir)) Array.empty
    else LakeFs.listDirNames(dir)
      .filterNot(d => isTableDir(s"$dir/$d"))
      .map(d => namespace :+ d).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    // an existing path — namespace OR table — is a conflict either way
    // (creating a "namespace" over a table would let tables nest inside
    // another table's root)
    if (namespace.nonEmpty && LakeFs.exists(dirOf(namespace)))
      throw new NamespaceAlreadyExistsException(namespace)
    // and so is any ANCESTOR being a table: mkdirs would silently nest
    // the new namespace (and its future tables) inside that table's
    // root, where DROP TABLE / vacuum of the outer table destroys them
    (1 until namespace.length).foreach { n =>
      val ancestor = namespace.take(n)
      require(!isTableDir(dirOf(ancestor)),
        s"cannot create namespace ${namespace.mkString(".")}: " +
          s"'${ancestor.mkString(".")}' is a table, not a namespace")
    }
    LakeFs.mkdirs(dirOf(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*)
      : Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) false
    else {
      val dir = dirOf(namespace)
      if (!cascade && (LakeFs.listNames(dir).nonEmpty ||
          LakeFs.listDirNames(dir).nonEmpty))
        throw new NonEmptyNamespaceException(namespace)
      LakeFs.deleteRecursively(dir)
    }
  }
}
