package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table with copy-on-write AND merge-on-read mutation
  * — the snapshot-isolation mechanism of the table formats
  * (Iceberg/Delta), built from primitives this library already proves:
  * per-file zone maps ([[Manifest]] / [[Bucketing.fileZones]]) and
  * sorted re-layouts ([[Bucketing.writeRangeSorted]]). All path I/O goes
  * through [[LakeFs]] (`org.apache.hadoop.fs.FileSystem`), so the same
  * protocol runs on `file://`, HDFS, or any Hadoop-compatible store —
  * see [[LakeFs.createNewAtomic]] for the per-store commit-atomicity
  * contract (S3 needs a conditional PUT or commit service, the Delta
  * LogStore caveat).
  *
  * Layout:
  * {{{
  *   root/files/<name>.parquet        immutable data files (append-only)
  *   root/_deletes/<name>.parquet     position-delete sidecars (file, pos)
  *   root/_manifests/v<N>.txt         version N: metadata lines + file list
  * }}}
  *
  * A version IS its manifest: plain lines are data-file names; lines
  * starting with `#` are metadata —
  * {{{
  *   #batch:<id>        streaming batch committed (cumulative; exactly-once)
  *   #dv:<name>         live position-delete sidecar in _deletes/
  *   #map:<old>=<new>   logical column rename (applied at read)
  *   #widen:<col>=<t>   logical type widening to t ∈ {long, double}
  * }}}
  *
  * Readers resolve the file list for a version and read exactly those
  * files; writers never mutate a data file. Every data file and sidecar
  * name embeds a per-writer UUID, so two writers racing from the same
  * base version can never collide on a physical file — the manifest's
  * exclusive create is the ONLY contention point (the Delta/Iceberg
  * convention); the loser's orphaned files are reclaimed by [[vacuum]].
  *
  * At 100 TB this is the only sane mutation story: a GDPR deletion of
  * one user's 3-day window must not rewrite a year of data — zone
  * planning bounds a copy-on-write rewrite to the files that can contain
  * matches, [[deletePositions]] (merge-on-read) avoids even that by
  * committing a KB-scale position sidecar applied as an anti-join at
  * read time, reused files cost ZERO bytes of I/O (same physical file,
  * referenced twice), and concurrent readers of v1 are isolated from the
  * v2 commit.
  */
object Snapshots {

  /** Production row-group size for mutation rewrites; tests pass a small
    * value explicitly so tiny scale factors still span row groups.
    */
  val DefaultBlockSize: Int = 128 * 1024 * 1024

  private def manifestDir(root: String) = s"$root/_manifests"
  private def filesDir(root: String) = s"$root/files"
  private def deletesDir(root: String) = s"$root/_deletes"

  private def uuid8(): String =
    java.util.UUID.randomUUID().toString.take(8)

  // ---------------------------------------------------------------------
  // Manifest model
  // ---------------------------------------------------------------------

  /** Parsed manifest: `files` are the version's data-file names (sorted);
    * `meta` are the `#` lines in commit order (order matters for chained
    * column maps).
    */
  case class ManifestData(files: Seq[String], meta: Seq[String]) {
    def dvNames: Seq[String] =
      meta.filter(_.startsWith("#dv:")).map(_.stripPrefix("#dv:"))
    def batchIds: Seq[Long] =
      meta.filter(_.startsWith("#batch:"))
        .map(_.stripPrefix("#batch:").toLong)
    def columnMaps: Seq[(String, String)] =
      meta.filter(_.startsWith("#map:")).map { l =>
        val Array(o, n) = l.stripPrefix("#map:").split("=", 2)
        (o, n)
      }
    def widenings: Seq[(String, String)] =
      meta.filter(_.startsWith("#widen:")).map { l =>
        val Array(c, t) = l.stripPrefix("#widen:").split("=", 2)
        (c, t)
      }
    def hasMappings: Boolean = columnMaps.nonEmpty || widenings.nonEmpty
  }

  def latestVersion(root: String): Int =
    LakeFs.listNames(manifestDir(root), ".txt")
      .filter(_.startsWith("v"))
      .map(_.stripPrefix("v").stripSuffix(".txt").toInt)
      .foldLeft(0)(math.max)

  def manifest(root: String, version: Int): ManifestData = {
    val p = s"${manifestDir(root)}/v$version.txt"
    require(LakeFs.exists(p), s"no such version: $version at $root")
    val lines = LakeFs.readString(p).split("\n").toSeq.filter(_.nonEmpty)
    val (meta, files) = lines.partition(_.startsWith("#"))
    ManifestData(files.sorted, meta)
  }

  /** The data-file names a version references (sorted). */
  def resolve(root: String, version: Int): Seq[String] =
    manifest(root, version).files

  /** The live position-delete sidecar names of a version. */
  def deleteSidecars(root: String, version: Int): Seq[String] =
    manifest(root, version).dvNames

  /** Commit a version manifest with OPTIMISTIC CONCURRENCY: the create
    * is exclusive ([[LakeFs.createNewAtomic]]), so two writers committing
    * from the same base version race on the same manifest name and
    * exactly one wins — the loser gets a ConcurrentModificationException
    * and must re-plan against the new latest (the Delta/Iceberg commit
    * protocol). The loser's already-written data files are UUID-named
    * orphans, invisible to every reader and reclaimed by [[vacuum]] —
    * they can never overwrite the winner's files.
    */
  private def writeManifest(root: String, version: Int,
      names: Seq[String], meta: Seq[String] = Seq.empty): Unit = {
    LakeFs.mkdirs(manifestDir(root))
    val content = (meta ++ names.sorted).mkString("\n")
    try LakeFs.createNewAtomic(s"${manifestDir(root)}/v$version.txt", content)
    catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"version $version already committed at $root — " +
            "re-plan against the new latest", e)
    }
  }

  /** Metadata lines that carry forward across commits: live sidecars,
    * column mappings, and the cumulative batch-id set (kept in the
    * LATEST manifest so exactly-once survives [[vacuum]] dropping old
    * manifests — the Delta txn-map convention).
    */
  private def carryMeta(m: ManifestData): Seq[String] = m.meta

  // ---------------------------------------------------------------------
  // Read path
  // ---------------------------------------------------------------------

  def read(spark: SparkSession, root: String, version: Int): DataFrame = {
    val m = manifest(root, version)
    require(m.files.nonEmpty, s"version $version is empty")
    readFiles(spark, root, m, m.files, keepPos = false)
  }

  /** Plain parquet read of explicit paths with the schema-fingerprint
    * fast path: all files uniform → plain read (no `mergeSchema`
    * footer-union job); mixed physical schemas → `mergeSchema` (add-only
    * evolution). `withPos` projects the parquet metadata columns the
    * position-delete anti-join keys on.
    */
  private def rawRead(spark: SparkSession, paths: Seq[String],
      withPos: Boolean): DataFrame = {
    val uniform = paths.map(Bucketing.schemaFingerprint(spark, _))
      .toSet.size <= 1
    val rd = if (uniform) spark.read
      else spark.read.option("mergeSchema", "true")
    val df = rd.parquet(paths: _*)
    if (withPos) df
      .withColumn("__dv_file", col("_metadata.file_name"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
    else df
  }

  /** Read with logical column maps/widenings applied: files are grouped
    * by physical footer schema, each group read plainly, renamed/cast to
    * the logical schema, then unioned by name — the read-side half of
    * metadata-only RENAME/WIDEN ([[renameColumn]]/[[widenColumn]]);
    * `mergeSchema` cannot express either (a renamed column would come
    * back twice, a widened one fails the int/long merge).
    */
  private def groupedRead(spark: SparkSession, paths: Seq[String],
      maps: Seq[(String, String)], widens: Seq[(String, String)],
      withPos: Boolean): DataFrame = {
    val groups = paths.groupBy(Bucketing.schemaFingerprint(spark, _))
      .toSeq.sortBy(_._1)
    val aligned = groups.map { case (_, ps) =>
      var df = rawRead(spark, ps, withPos)
      maps.foreach { case (o, n) =>
        if (df.columns.contains(o) && !df.columns.contains(n))
          df = df.withColumnRenamed(o, n)
      }
      widens.foreach { case (c, t) =>
        if (df.columns.contains(c)) df = df.withColumn(c, col(c).cast(t))
      }
      df
    }
    aligned.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** The dv frame (file, pos) of a manifest's live sidecars. */
  private def dvFrame(spark: SparkSession, root: String,
      m: ManifestData): Option[DataFrame] =
    if (m.dvNames.isEmpty) None
    else Some(spark.read.parquet(
      m.dvNames.sorted.map(n => s"${deletesDir(root)}/$n"): _*))

  /** Read a subset of a version's files with the version's column maps
    * AND position deletes applied — the one read helper every consumer
    * (time travel, rewrites, change feeds) goes through, so merge-on-read
    * rows can never resurrect in any path. Stale dv rows pointing at
    * files outside `names` simply never match the anti-join (file names
    * are UUID-unique, never reused).
    */
  private def readFiles(spark: SparkSession, root: String, m: ManifestData,
      names: Seq[String], keepPos: Boolean): DataFrame = {
    val paths = names.map(n => s"${filesDir(root)}/$n")
    val needPos = keepPos || m.dvNames.nonEmpty
    val base =
      if (m.hasMappings)
        groupedRead(spark, paths, m.columnMaps, m.widenings, needPos)
      else rawRead(spark, paths, needPos)
    val undeleted = dvFrame(spark, root, m) match {
      case None => base
      case Some(dv) =>
        base.join(dv,
          base("__dv_file") === dv("file") && base("__dv_pos") === dv("pos"),
          "left_anti")
    }
    if (keepPos || m.dvNames.isEmpty) undeleted
    else undeleted.drop("__dv_file", "__dv_pos")
  }

  // ---------------------------------------------------------------------
  // Init / append
  // ---------------------------------------------------------------------

  /** Create version 1 by adopting the parquet files of `srcDir` (copied
    * into the table's immutable file store). Returns the version (1).
    */
  def init(spark: SparkSession, root: String, srcDir: String): Int = {
    LakeFs.mkdirs(filesDir(root))
    val names = Compaction.dataFileNames(srcDir).map { n =>
      LakeFs.copyFile(s"$srcDir/$n", s"${filesDir(root)}/$n")
      n
    }
    require(names.nonEmpty, s"no parquet files in $srcDir")
    writeManifest(root, 1, names)
    1
  }

  /** Write into a scratch dir via `write`, then adopt the produced
    * parquet files into the store under UUID-unique names — the one
    * physical-commit helper every mutation shares.
    */
  private def adoptFiles(root: String, v: Int, tag: String)
      (write: String => Unit): Seq[String] = {
    val fdir = filesDir(root)
    val u = uuid8()
    val tmp = s"$fdir/__${tag}_$u"
    write(tmp)
    val names = Compaction.dataFileNames(tmp).zipWithIndex.map {
      case (f, i) =>
        val name = s"${tag}_v${v}_${u}_$i.parquet"
        LakeFs.move(s"$tmp/$f", s"$fdir/$name")
        name
    }
    LakeFs.deleteRecursively(tmp)
    names
  }

  /** Range-sorted write of `df` into the file store under UUID-unique
    * names.
    */
  private def writeNewFiles(spark: SparkSession, root: String, v: Int,
      tag: String, df: DataFrame, sortCol: String, nFiles: Int,
      blockSize: Int): Seq[String] =
    adoptFiles(root, v, tag)(tmp =>
      Bucketing.writeRangeSorted(df, sortCol, nFiles, tmp, blockSize))

  /** APPEND: commit `df` as new range-sorted file(s) referenced by a new
    * version alongside everything the latest version holds — the ingest
    * path. Schema evolution is allowed: an appended batch may carry NEW
    * columns (readers see them as NULL on older files); it should carry
    * the table's sort column so zone planning keeps working. `base` is
    * the version the writer PLANNED against (its read snapshot);
    * committing base+1 under the exclusive create is the optimistic CAS
    * — if a rival landed base+1 first, this throws and the caller
    * re-plans. Returns the new version.
    */
  def append(spark: SparkSession, root: String, df: DataFrame,
      sortCol: String, nFiles: Int = 1, base: Int = -1,
      blockSize: Int = DefaultBlockSize): Int =
    appendWithMeta(spark, root, df, sortCol, nFiles, base, blockSize,
      Seq.empty)

  private def appendWithMeta(spark: SparkSession, root: String,
      df: DataFrame, sortCol: String, nFiles: Int, base: Int,
      blockSize: Int, extraMeta: Seq[String]): Int = {
    val v = if (base >= 1) base else latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    val names = writeNewFiles(spark, root, v + 1, "append", df, sortCol,
      nFiles, blockSize)
    writeManifest(root, v + 1, m.files ++ names, carryMeta(m) ++ extraMeta)
    v + 1
  }

  /** EXACTLY-ONCE streaming append: commit a micro-batch under its
    * `batchId`, skipping batches already committed — the idempotence
    * that turns foreachBatch's at-least-once replay into exactly-once
    * table semantics (the Delta txn-version pattern). The batch id is
    * part of the MANIFEST itself (`#batch:` line), so the data commit
    * and the idempotence marker are ONE atomic exclusive create — a
    * crash can never land the data without the marker or vice versa —
    * and the cumulative id set rides the latest manifest, surviving
    * [[vacuum]]. Returns false iff skipped.
    */
  def appendBatch(spark: SparkSession, root: String, df: DataFrame,
      sortCol: String, batchId: Long,
      blockSize: Int = DefaultBlockSize): Boolean =
    if (committedBatches(root).contains(batchId)) false
    else {
      appendWithMeta(spark, root, df, sortCol, 1, -1, blockSize,
        Seq(s"#batch:$batchId"))
      true
    }

  /** The batch ids committed so far (sorted, distinct) — from the
    * manifests' `#batch:` lines, plus legacy `_batch<id>` marker files
    * written by the pre-atomic layout.
    */
  def committedBatches(root: String): Seq[Long] = {
    val fromManifests = LakeFs.listNames(manifestDir(root), ".txt")
      .filter(_.startsWith("v"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toInt)
      .flatMap(v => manifest(root, v).batchIds)
    val legacy = LakeFs.listNames(manifestDir(root))
      .filter(_.startsWith("_batch"))
      .map(_.stripPrefix("_batch").toLong)
    (fromManifests ++ legacy).distinct.sorted
  }

  // ---------------------------------------------------------------------
  // Zone planning
  // ---------------------------------------------------------------------

  /** Exact micros of a column for zone math: `unix_micros` for
    * timestamps, the raw long otherwise.
    */
  private def microsOf(df: DataFrame, column: String): Column =
    df.schema(column).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        unix_micros(col(column))
      case _ => col(column).cast("long")
    }

  /** Footer zones of the CURRENT version's files ONLY (never the whole
    * store — planning must not grow with table history), with the
    * conservative contract: a file whose stats are missing or unusable
    * plans as `None` = must-touch, never an error.
    */
  private def planZones(spark: SparkSession, root: String,
      names: Seq[String], column: String)
      : Map[String, Option[(Long, Long)]] =
    Bucketing.fileZones(spark,
      names.map(n => s"${filesDir(root)}/$n"), column)
      .map { case (name, _, z) => name -> z }.toMap

  private def requireNoMappings(m: ManifestData, op: String): Unit =
    require(!m.hasMappings,
      s"$op plans zones on PHYSICAL columns; run optimize first to " +
        "materialize pending column renames/widenings")

  // ---------------------------------------------------------------------
  // Copy-on-write delete
  // ---------------------------------------------------------------------

  /** Result of a copy-on-write delete: the new version, how many files
    * were rewritten (their zone intersected the range), and how many were
    * re-referenced untouched.
    */
  case class DeleteResult(version: Int, rewritten: Int, reused: Int)

  /** Copy-on-write range delete on a long/timestamp-micros column: drop
    * every row with `lo <= column < hi` from the LATEST version, creating
    * a new version. Files are planned from their FOOTER zone (no data
    * scan): a file whose [min,max] misses the range is re-referenced
    * verbatim (zero I/O); the intersecting files are read as ONE frame
    * (position deletes applied, so merge-on-read rows never resurrect),
    * filtered, and rewritten as `touched.size` range-sorted files in ONE
    * Spark job — not a per-file driver loop. Live dv sidecars carry
    * forward verbatim: rewritten files get fresh UUID names the stale
    * positions can never re-match, untouched files keep their deletes.
    */
  def deleteRange(spark: SparkSession, root: String, column: String,
      lo: Long, hi: Long,
      blockSize: Int = DefaultBlockSize): DeleteResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "deleteRange")
    val zones = planZones(spark, root, m.files, column)
    val (touched, untouched) = m.files.partition { n =>
      zones(n) match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true // statless file: cannot prove it misses
      }
    }
    val newNames =
      if (touched.isEmpty) Seq.empty
      else {
        val df = readFiles(spark, root, m, touched, keepPos = false)
        val micros = microsOf(df, column)
        // null-safe: a NULL key is outside any range and must be KEPT —
        // a bare !(cond) would evaluate NULL and silently drop the row
        val kept = df.where(micros.isNull ||
          !(micros >= lit(lo) && micros < lit(hi)))
        if (kept.isEmpty) Seq.empty
        else writeNewFiles(spark, root, v + 1, "delete", kept, column,
          touched.size, blockSize)
      }
    writeManifest(root, v + 1, untouched ++ newNames, carryMeta(m))
    DeleteResult(v + 1, touched.size, untouched.size)
  }

  // ---------------------------------------------------------------------
  // Merge-on-read delete (position-delete sidecars)
  // ---------------------------------------------------------------------

  /** Result of a merge-on-read delete: the new version, how many row
    * positions the sidecar marks, how many files the predicate touched
    * (zone-planned, read for positions but NOT rewritten), and the
    * sidecar name (None when nothing matched).
    */
  case class MorDeleteResult(version: Int, markedPositions: Long,
      touchedFiles: Int, sidecar: Option[String])

  /** MERGE-ON-READ range delete: instead of rewriting every intersecting
    * file ([[deleteRange]], copy-on-write), commit a position-delete
    * SIDECAR — a KB-scale parquet of `(file, pos)` rows — referenced by
    * the new manifest and applied as an anti-join at read time. The data
    * files are untouched: v+1 references the SAME physical files as v
    * plus one `#dv:` line. [[optimize]] folds accumulated sidecars back
    * into data files (compaction pays the rewrite once, lazily).
    *
    * Positions come from the parquet reader's own row index
    * (`_metadata.row_index` — stable for immutable files); candidates
    * already marked by a live sidecar are excluded, so sidecars stay
    * DISJOINT (each deleted row appears in exactly one — the invariant
    * [[netChanges]] uses to report merge-on-read deletes exactly once).
    *
    * At 100 TB this is why every production format pairs COW with MoR:
    * a GDPR delete of 10 rows spread over 10 wide files costs 10 file
    * rewrites under COW, but one sidecar write here — read amplification
    * is one broadcast-size anti-join until the next compaction.
    */
  def deletePositions(spark: SparkSession, root: String, column: String,
      lo: Long, hi: Long): MorDeleteResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "deletePositions")
    val zones = planZones(spark, root, m.files, column)
    val touched = m.files.filter { n =>
      zones(n) match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true
      }
    }
    if (touched.isEmpty) {
      writeManifest(root, v + 1, m.files, carryMeta(m))
      return MorDeleteResult(v + 1, 0L, 0, None)
    }
    val df = rawRead(spark, touched.map(n => s"${filesDir(root)}/$n"),
      withPos = true)
    val micros = microsOf(df, column)
    val cand = df.where(micros >= lit(lo) && micros < lit(hi))
      .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
    val fresh = dvFrame(spark, root, m) match {
      case None => cand
      case Some(dv) =>
        cand.join(dv, cand("file") === dv("file") && cand("pos") === dv("pos"),
          "left_anti")
    }
    commitSidecar(spark, root, v, m, fresh, touched.size)
  }

  /** KEY-BASED merge-on-read delete — the GDPR erasure shape ("delete
    * every row of user X"): mark the positions of all rows whose
    * `keyCol` appears in `keys` (any multiplicity), across the whole
    * table, as one position-delete sidecar. Zone planning still helps
    * when it can: files whose `keyCol` footer zone misses the key
    * batch's [min, max] envelope are skipped outright; the rest get a
    * COLUMN-PRUNED probe (key column + row index only) with the keys
    * broadcast — on a time-sorted table the key zones are wide and the
    * probe honestly touches most files, but it reads one thin column,
    * not the data. Zero files rewritten either way; [[optimize]] folds
    * the marks later.
    */
  def deletePositionsByKey(spark: SparkSession, root: String,
      keyCol: String, keys: DataFrame): MorDeleteResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "deletePositionsByKey")
    val bounds = keys.agg(min(microsOf(keys, keyCol)),
      max(microsOf(keys, keyCol))).head()
    if (bounds.isNullAt(0)) {
      writeManifest(root, v + 1, m.files, carryMeta(m))
      return MorDeleteResult(v + 1, 0L, 0, None)
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val zones = planZones(spark, root, m.files, keyCol)
    val touched = m.files.filter { n =>
      zones(n) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    if (touched.isEmpty) {
      writeManifest(root, v + 1, m.files, carryMeta(m))
      return MorDeleteResult(v + 1, 0L, 0, None)
    }
    val probe = rawRead(spark, touched.map(n => s"${filesDir(root)}/$n"),
      withPos = true)
      .select(col(keyCol), col("__dv_file").as("file"),
        col("__dv_pos").as("pos"))
    val cand = probe
      .join(broadcast(keys.select(col(keyCol)).distinct()), Seq(keyCol),
        "left_semi")
      .select(col("file"), col("pos"))
    val fresh = dvFrame(spark, root, m) match {
      case None => cand
      case Some(dv) =>
        cand.join(dv, cand("file") === dv("file") && cand("pos") === dv("pos"),
          "left_anti")
    }
    commitSidecar(spark, root, v, m, fresh, touched.size)
  }

  /** Write `fresh` (file, pos) as a sidecar and commit v+1 — shared by
    * both merge-on-read deletes.
    */
  private def commitSidecar(spark: SparkSession, root: String, v: Int,
      m: ManifestData, fresh: DataFrame, touched: Int): MorDeleteResult = {
    val tmp = s"${deletesDir(root)}/__dv_${uuid8()}"
    fresh.coalesce(1).write.parquet(tmp)
    val name = s"dv_v${v + 1}_${uuid8()}.parquet"
    val n = Compaction.dataFileNames(tmp) match {
      case Seq(one) =>
        LakeFs.move(s"$tmp/$one", s"${deletesDir(root)}/$name")
        spark.read.parquet(s"${deletesDir(root)}/$name").count()
      case Seq() => 0L
      case other => sys.error(s"expected 1 sidecar file, got $other")
    }
    LakeFs.deleteRecursively(tmp)
    if (n == 0L) {
      LakeFs.delete(s"${deletesDir(root)}/$name")
      writeManifest(root, v + 1, m.files, carryMeta(m))
      MorDeleteResult(v + 1, 0L, touched, None)
    } else {
      writeManifest(root, v + 1, m.files, carryMeta(m) :+ s"#dv:$name")
      MorDeleteResult(v + 1, n, touched, Some(name))
    }
  }

  // ---------------------------------------------------------------------
  // Upsert (MERGE)
  // ---------------------------------------------------------------------

  /** Result of a copy-on-write MERGE: the new version, files rewritten
    * (zone-intersecting candidates plus any key-probe promotions), files
    * re-referenced untouched, and the number of update rows applied.
    */
  case class UpsertResult(version: Int, rewritten: Int, reused: Int,
      upserted: Long)

  /** Copy-on-write MERGE (upsert) into the LATEST version: every target
    * row whose `keyCol` appears in `updates` is REPLACED by the update
    * row; update rows matching nothing are INSERTED — the Delta/Iceberg
    * `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT` shape.
    *
    * The rewrite is ZONE-BOUNDED like [[deleteRange]]: update batches
    * carry the table's sort column (`zoneCol`), so files whose footer
    * zone misses the batch's [min, max] SHOULD contain no matches. That
    * is a layout invariant, not a law — a matched key whose stored row
    * drifted outside the batch's zone would silently survive next to its
    * replacement. So by default the zone plan is VERIFIED: a key-column
    * probe (column-pruned scan of the out-of-zone files, broadcast
    * semi-join against the batch keys) promotes any file that actually
    * holds a matched key into the rewrite set — correctness never
    * depends on the invariant, only the probe's cost does. Callers whose
    * layout guarantees the invariant (zoneCol == keyCol, or append-only
    * keys) pass `trustZones = true` to skip the probe.
    *
    * The batch itself is BROADCAST into the anti-join (an upsert batch
    * is operationally small; a batch the size of the table is a rewrite,
    * not a merge). All update rows land in fresh range-sorted files,
    * keeping the table's skippable layout.
    */
  def upsert(spark: SparkSession, root: String, keyCol: String,
      zoneCol: String, updates: DataFrame,
      blockSize: Int = DefaultBlockSize,
      trustZones: Boolean = false): UpsertResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "upsert")
    val bounds = updates
      .agg(min(microsOf(updates, zoneCol)), max(microsOf(updates, zoneCol)))
      .head()
    if (bounds.isNullAt(0)) { // empty batch: nothing to do but commit
      writeManifest(root, v + 1, m.files, carryMeta(m))
      return UpsertResult(v + 1, 0, m.files.size, 0L)
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val zones = planZones(spark, root, m.files, zoneCol)
    val (zoneTouched, zoneMissed) = m.files.partition { n =>
      zones(n) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    // verify the zone plan: promote out-of-zone files that hold a
    // matched key (key column + file name only — column-pruned)
    val promoted: Set[String] =
      if (trustZones || zoneMissed.isEmpty) Set.empty
      else {
        val probe = rawRead(spark,
          zoneMissed.map(n => s"${filesDir(root)}/$n"), withPos = true)
          .select(col(keyCol), col("__dv_file").as("__f"))
          .join(broadcast(updates.select(col(keyCol)).distinct()),
            Seq(keyCol), "left_semi")
        probe.select(col("__f")).distinct()
          .collect().map(_.getString(0)).toSet
      }
    val touched = zoneTouched ++ zoneMissed.filter(promoted.contains)
    val untouched = zoneMissed.filterNot(promoted.contains)
    val nUpd = updates.count()
    val keptNames =
      if (touched.isEmpty) Seq.empty
      else {
        val tgt = readFiles(spark, root, m, touched, keepPos = false)
        val kept = tgt.join(broadcast(updates.select(col(keyCol))),
          Seq(keyCol), "left_anti")
        if (kept.isEmpty) Seq.empty
        else writeNewFiles(spark, root, v + 1, "kept", kept, zoneCol,
          math.max(1, touched.size), blockSize)
      }
    val updNames = writeNewFiles(spark, root, v + 1, "upsert",
      updates, zoneCol, 1, blockSize)
    writeManifest(root, v + 1, untouched ++ keptNames ++ updNames,
      carryMeta(m))
    UpsertResult(v + 1, touched.size, untouched.size, nUpd)
  }

  // ---------------------------------------------------------------------
  // Schema evolution beyond add-only
  // ---------------------------------------------------------------------

  /** Metadata-only column RENAME: commits a new version referencing the
    * SAME files plus a `#map:old=new` line applied at read time (files
    * written after the rename carry the new name physically; groups are
    * aligned by [[groupedRead]]). [[optimize]] materializes the mapping
    * into the physical schema and drops the line. Zero data I/O — the
    * point of manifest-level evolution at 100 TB.
    */
  def renameColumn(root: String, oldName: String, newName: String): Int = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    writeManifest(root, v + 1, m.files,
      carryMeta(m) :+ s"#map:$oldName=$newName")
    v + 1
  }

  /** Metadata-only type WIDENING of `column` to `toType` ∈ {long,
    * double}: later appends may write the wide type physically; reads
    * cast every group to the target, so int32 and int64 files of the
    * same column coexist (plain `mergeSchema` refuses that union).
    * Materialized by [[optimize]] like [[renameColumn]].
    */
  def widenColumn(root: String, column: String, toType: String): Int = {
    require(Set("long", "double").contains(toType),
      s"widening target must be long or double, got $toType")
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    writeManifest(root, v + 1, m.files,
      carryMeta(m) :+ s"#widen:$column=$toType")
    v + 1
  }

  // ---------------------------------------------------------------------
  // Optimize / vacuum
  // ---------------------------------------------------------------------

  /** OPTIMIZE: rewrite the LATEST version as `nFiles` range-sorted files
    * (one new compacted version; the data is untouched). The snapshot
    * face of [[Compaction.compactSorted]] — after enough upsert/delete
    * churn the manifest accumulates small delta files, and scan cost
    * follows file count. Also the lazy half of merge-on-read and
    * metadata-only evolution: position-delete sidecars are FOLDED into
    * the data files (the read already applies them) and column
    * renames/widenings are materialized physically, so the new version
    * carries no `#dv:`/`#map:`/`#widen:` lines. Returns the new version.
    */
  def optimize(spark: SparkSession, root: String, sortCol: String,
      nFiles: Int, blockSize: Int = DefaultBlockSize): Int = {
    val v = latestVersion(root)
    val m = manifest(root, v)
    val names = writeNewFiles(spark, root, v + 1, "opt",
      read(spark, root, v), sortCol, nFiles, blockSize)
    writeManifest(root, v + 1, names,
      m.meta.filter(_.startsWith("#batch:")))
    v + 1
  }

  /** Result of an incremental bin-pack: the new version, small files
    * rewritten, right-sized files re-referenced verbatim, and the
    * version's file count after packing.
    */
  case class BinPackResult(version: Int, rewritten: Int, reused: Int,
      filesAfter: Int)

  /** INCREMENTAL bin-pack compaction — the maintenance [[optimize]]
    * deliberately is not: only files SMALLER than `targetBytes` are
    * rewritten (range-sorted into `ceil(smallBytes / targetBytes)`
    * right-sized files); every file already at size is re-referenced
    * verbatim (zero I/O — the same physical file serves both versions).
    * Position-delete marks on the rewritten small files fold in (the
    * read applies them); marks on reused files stay live via the
    * carried `#dv:` lines. Needs a mapping-free table like every
    * zone-planned mutation.
    *
    * At 100 TB this is the ONLY affordable compaction: a streaming
    * table accretes KB-scale commit files daily on top of TB of
    * already-right-sized history, and nightly maintenance must cost
    * ∝ the new small bytes, never a full-table rewrite — Delta's
    * OPTIMIZE bin-packing / Iceberg's binpack rewrite strategy.
    */
  def optimizeBinPack(spark: SparkSession, root: String, sortCol: String,
      targetBytes: Long,
      blockSize: Int = DefaultBlockSize): BinPackResult = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "optimizeBinPack")
    val sized = m.files.map(n =>
      n -> LakeFs.fileLength(s"${filesDir(root)}/$n"))
    val (small, big) = sized.partition(_._2 < targetBytes)
    if (small.size <= 1) { // nothing to pack: 0 or 1 undersized file
      writeManifest(root, v + 1, m.files, carryMeta(m))
      return BinPackResult(v + 1, 0, m.files.size, m.files.size)
    }
    val smallBytes = small.map(_._2).sum
    val nOut = math.max(1L,
      (smallBytes + targetBytes - 1) / targetBytes).toInt
    val df = readFiles(spark, root, m, small.map(_._1), keepPos = false)
    val names = writeNewFiles(spark, root, v + 1, "pack", df, sortCol,
      nOut, blockSize)
    writeManifest(root, v + 1, big.map(_._1) ++ names, carryMeta(m))
    BinPackResult(v + 1, small.size, big.size, big.size + names.size)
  }

  /** OPTIMIZE ... ZORDER BY — the Delta/Iceberg clustering rewrite: the
    * LATEST version rewritten as `nFiles` Morton-range files on TWO
    * dimension keys ([[Bucketing.writeZOrderedFiles]]), so every file's
    * min/max envelope is bounded on both at once and a conjunctive
    * predicate prunes files on their intersection (the layout
    * [[Manifest.buildTs2]] plans against). Folds sidecars and
    * materializes column mappings exactly like [[optimize]] — one range
    * shuffle of the live data either way; choosing the clustered layout
    * is free at compaction time. Returns the new version.
    */
  def optimizeZOrder(spark: SparkSession, root: String, colA: Column,
      colB: Column, nFiles: Int,
      blockSize: Int = DefaultBlockSize): Int = {
    val v = latestVersion(root)
    val m = manifest(root, v)
    val df = read(spark, root, v)
    val names = adoptFiles(root, v + 1, "zopt")(tmp =>
      Bucketing.writeZOrderedFiles(df, colA, colB, nFiles, tmp, blockSize))
    writeManifest(root, v + 1, names,
      m.meta.filter(_.startsWith("#batch:")))
    v + 1
  }

  /** The OCC commit loop every production writer wraps around an
    * optimistic commit: run `attempt` (which must plan against the
    * CURRENT latest — every mutation in this object does), and on a
    * lost race (ConcurrentModificationException) re-run it against the
    * new latest, up to `maxAttempts`. Linearizes concurrent writers
    * without locks: each retry replans from fresh state, so the commit
    * that lands is always consistent with the version it extends.
    */
  def commitWithRetry[A](maxAttempts: Int = 5)(attempt: => A): A = {
    var last: java.util.ConcurrentModificationException = null
    var i = 0
    while (i < maxAttempts) {
      try return attempt
      catch {
        case e: java.util.ConcurrentModificationException =>
          last = e
          i += 1
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"commit failed after $maxAttempts attempts: ${last.getMessage}")
  }

  /** VACUUM: drop every version below `keepFrom` and physically delete
    * the data files AND delete-sidecars no surviving manifest references
    * (including orphans a losing OCC writer left behind). Returns
    * (manifests dropped, files deleted). The retention half of
    * copy-on-write: old versions are free until you reclaim them, and
    * reclaiming must never touch a file a LIVE version still references.
    */
  def vacuum(root: String, keepFrom: Int): (Int, Int) = {
    val latest = latestVersion(root)
    require(keepFrom <= latest, s"keepFrom $keepFrom > latest $latest")
    val dropped = (1 until keepFrom).count { v =>
      LakeFs.delete(s"${manifestDir(root)}/v$v.txt")
    }
    val liveManifests = (keepFrom to latest)
      .filter(v => LakeFs.exists(s"${manifestDir(root)}/v$v.txt"))
      .map(v => manifest(root, v))
    val liveFiles = liveManifests.flatMap(_.files).toSet
    val liveDv = liveManifests.flatMap(_.dvNames).toSet
    val deletedData = Compaction.dataFileNames(filesDir(root))
      .filterNot(liveFiles.contains)
      .count(n => LakeFs.delete(s"${filesDir(root)}/$n"))
    val deletedDv = Compaction.dataFileNames(deletesDir(root))
      .filterNot(liveDv.contains)
      .count(n => LakeFs.delete(s"${deletesDir(root)}/$n"))
    (dropped, deletedData + deletedDv)
  }

  // ---------------------------------------------------------------------
  // Change feeds
  // ---------------------------------------------------------------------

  /** Null-pad and reorder `df` to the union schema of the two frames so
    * multiset `exceptAll`/`unionByName` stay legal across schema-evolved
    * version pairs.
    */
  private def alignPair(a: DataFrame, b: DataFrame)
      : (DataFrame, DataFrame) = {
    val fields = (a.schema.fields ++ b.schema.fields
      .filterNot(f => a.columns.contains(f.name))).toSeq
    def pad(df: DataFrame): DataFrame =
      df.select(fields.map { f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    (pad(a), pad(b))
  }

  /** FILE-GRANULAR CHANGE FEED between two versions: `(netAdded,
    * netRemoved)` as DataFrames. Copy-on-write makes this cheap and
    * exact: only files that CHANGED between the manifests are read
    * (reused files cancel by reference, rewritten survivors cancel via
    * multiset `exceptAll`), so a consumer replays the delta at cost
    * ∝ changed files — never a diff of two full table scans. A
    * merge-on-read delete changes NO files; its delta is the rows the
    * new sidecars mark on files both versions share (sidecars are
    * disjoint by construction, so each deleted row is reported exactly
    * once). For a pure delete, netRemoved IS the deleted rows and
    * netAdded is empty; for an upsert, netAdded carries the new row
    * versions and netRemoved the replaced ones — the CDC feed
    * incremental consumers subscribe to.
    */
  def netChanges(spark: SparkSession, root: String, from: Int, to: Int)
      : (DataFrame, DataFrame) = {
    val mFrom = manifest(root, from)
    val mTo = manifest(root, to)
    val fFrom = mFrom.files.toSet
    val fTo = mTo.files.toSet
    def readSet(names: Set[String], m: ManifestData): DataFrame =
      if (names.isEmpty) read(spark, root, to).limit(0)
      else readFiles(spark, root, m, names.toSeq.sorted, keepPos = false)
    val added = readSet(fTo -- fFrom, mTo)
    val removedFiles = readSet(fFrom -- fTo, mFrom)
    // merge-on-read deletes: rows newly marked on files BOTH versions
    // reference (marks on from-only files are inside removedFiles, and
    // readFiles applied from's own dv there)
    val newDv = mTo.dvNames.toSet -- mFrom.dvNames.toSet
    val common = (fFrom & fTo).toSeq.sorted
    val removed =
      if (newDv.isEmpty || common.isEmpty) removedFiles
      else {
        val dv = spark.read.parquet(
          newDv.toSeq.sorted.map(n => s"${deletesDir(root)}/$n"): _*)
        val rows = readFiles(spark, root,
          mFrom.copy(meta = mFrom.meta.filterNot(_.startsWith("#dv:"))),
          common, keepPos = true)
        val marked = rows.join(dv,
          rows("__dv_file") === dv("file") && rows("__dv_pos") === dv("pos"),
          "left_semi").drop("__dv_file", "__dv_pos")
        val (a, b) = alignPair(removedFiles, marked)
        a.unionByName(b)
      }
    val (aA, aR) = alignPair(added, removed)
    (aA.exceptAll(aR), aR.exceptAll(aA))
  }

  /** ROW-TAGGED change feed between two versions — the Delta-CDF
    * consumer contract: one frame with a `_change_type` column ∈
    * {insert, update_preimage, update_postimage, delete}, derived from
    * [[netChanges]] by pairing net-added and net-removed rows on the
    * table key: a key present on both sides is an UPDATE (the removed
    * row is its preimage, the added row its postimage); an added-only
    * key is an INSERT; a removed-only key is a DELETE. Assumes keyed
    * semantics (unique `keyCol` per version — the same contract MERGE
    * enforces). The key-set joins are on the DELTA only, never the
    * table.
    */
  def changeFeed(spark: SparkSession, root: String, from: Int, to: Int,
      keyCol: String): DataFrame = {
    val (added0, removed0) = netChanges(spark, root, from, to)
    val (added, removed) = alignPair(added0, removed0)
    val addedKeys = added.select(col(keyCol)).distinct()
    val removedKeys = removed.select(col(keyCol)).distinct()
    val taggedAdds = added
      .join(removedKeys.withColumn("__both", lit(1)), Seq(keyCol), "left")
      .withColumn("_change_type",
        when(col("__both").isNotNull, lit("update_postimage"))
          .otherwise(lit("insert")))
      .drop("__both")
    val taggedRemoves = removed
      .join(addedKeys.withColumn("__both", lit(1)), Seq(keyCol), "left")
      .withColumn("_change_type",
        when(col("__both").isNotNull, lit("update_preimage"))
          .otherwise(lit("delete")))
      .drop("__both")
    taggedAdds.unionByName(taggedRemoves)
  }
}
