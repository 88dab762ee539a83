package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table with copy-on-write file-level mutation — the
  * snapshot-isolation mechanism of the table formats (Iceberg/Delta),
  * built from two primitives this library already proves: per-file zone
  * maps ([[Manifest]]) and sorted re-layouts ([[Bucketing]]).
  *
  * Layout:
  * {{{
  *   root/files/<name>.parquet        immutable data files (append-only)
  *   root/_manifests/v<N>.txt         one file name per line = version N
  * }}}
  *
  * A version IS its manifest: readers resolve the file list for a version
  * and read exactly those files; writers never mutate a data file — a
  * delete REWRITES only the files whose zone intersects the predicate
  * (planned from footer stats, not by scanning) and re-references every
  * other file verbatim in the new manifest. Old versions stay readable
  * forever (time travel) until a retention job drops their manifests.
  *
  * At 100 TB this is the only sane mutation story: a GDPR deletion of one
  * user's 3-day window must not rewrite a year of data — zone planning
  * bounds the rewrite to the files that can contain matches, the reused
  * files cost ZERO bytes of I/O (same physical file, referenced twice),
  * and concurrent readers of v1 are isolated from the v2 commit.
  */
object Snapshots {

  private def manifestDir(root: String) = s"$root/_manifests"
  private def filesDir(root: String) = s"$root/files"

  def latestVersion(root: String): Int =
    Option(new java.io.File(manifestDir(root)).listFiles()).toSeq.flatten
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toInt)
      .foldLeft(0)(math.max)

  /** The file names a version references (sorted). */
  def resolve(root: String, version: Int): Seq[String] = {
    val f = new java.io.File(s"${manifestDir(root)}/v$version.txt")
    require(f.exists(), s"no such version: $version at $root")
    val src = scala.io.Source.fromFile(f)
    try src.getLines().filter(_.nonEmpty).toVector.sorted
    finally src.close()
  }

  def read(spark: SparkSession, root: String, version: Int): DataFrame = {
    val files = resolve(root, version).map(n => s"${filesDir(root)}/$n")
    require(files.nonEmpty, s"version $version is empty")
    // mergeSchema: appended files may carry EVOLVED schemas (added
    // columns); older files read the new columns as NULL. Cost is one
    // footer-schema union over the version's file list — driver-bounded.
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Commit a version manifest with OPTIMISTIC CONCURRENCY: the create
    * is atomic-exclusive (CREATE_NEW), so two writers committing from
    * the same base version race on the same manifest name and exactly
    * one wins — the loser gets a [[java.nio.file.FileAlreadyExistsException]]
    * wrapped as ConcurrentModificationException and must re-plan against
    * the new latest (the Delta/Iceberg commit protocol). Without this a
    * silent overwrite would lose the first writer's files from history.
    */
  private def writeManifest(root: String, version: Int,
      names: Seq[String]): Unit = {
    val dir = new java.io.File(manifestDir(root))
    dir.mkdirs()
    try
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"${manifestDir(root)}/v$version.txt"),
        names.sorted.mkString("\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"version $version already committed at $root — " +
            "re-plan against the new latest", e)
    }
  }

  /** Create version 1 by adopting the parquet files of `srcDir` (copied
    * into the table's immutable file store). Returns the version (1).
    */
  def init(spark: SparkSession, root: String, srcDir: String): Int = {
    val dst = new java.io.File(filesDir(root))
    dst.mkdirs()
    val names = Compaction.dataFiles(srcDir).map { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(dst, f.getName).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      f.getName
    }
    require(names.nonEmpty, s"no parquet files in $srcDir")
    writeManifest(root, 1, names)
    1
  }

  /** Result of a copy-on-write delete: the new version, how many files
    * were rewritten (their zone intersected the range), and how many were
    * re-referenced untouched.
    */
  case class DeleteResult(version: Int, rewritten: Int, reused: Int)

  /** Copy-on-write range delete on a long/timestamp-micros column: drop
    * every row with `lo <= column < hi` from the LATEST version, creating
    * a new version. Files are planned from their FOOTER zone (no data
    * scan): a file whose [min,max] misses the range is re-referenced
    * verbatim (zero I/O); an intersecting file is read, filtered, and
    * rewritten as one new immutable file (dropped entirely if the filter
    * empties it). Timestamps stay INT64 micros through the rewrite.
    */
  def deleteRange(spark: SparkSession, root: String, column: String,
      lo: Long, hi: Long): DeleteResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val current = resolve(root, v)
    val fdir = filesDir(root)
    val zones = Manifest.buildTs(spark, fdir, column)
      .map { case (path, _, _, mn, mx) =>
        path.substring(path.lastIndexOf('/') + 1) -> (mn, mx)
      }.toMap
    val (touched, untouched) = current.partition { n =>
      val (mn, mx) = zones(n)
      mx >= lo && mn < hi
    }
    // column may be a timestamp (micros on disk): compare in micros via
    // a cast to long-of-micros on the read frame
    val newNames = touched.flatMap { n =>
      val df = spark.read.parquet(s"$fdir/$n")
      // exact micros: unix_micros for timestamps (the zone unit), the
      // raw value for integral columns
      val micros = df.schema(column).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(col(column))
        case _ => col(column).cast("long")
      }
      // null-safe: a NULL key is outside any range and must be KEPT —
      // a bare !(cond) would evaluate NULL and silently drop the row
      val kept = df.where(micros.isNull ||
        !(micros >= lit(lo) && micros < lit(hi)))
      if (kept.isEmpty) None
      else {
        val stem = n.stripSuffix(".parquet")
        val tmp = s"$fdir/__rw_${java.util.UUID.randomUUID().toString.take(8)}"
        Bucketing.writeRangeSorted(kept, column, 1, tmp,
          blockSize = 16 * 1024)
        val out = Compaction.dataFiles(tmp) match {
          case Seq(one) => one
          case other => sys.error(s"expected 1 rewritten file, got $other")
        }
        val newName = s"${stem}_v${v + 1}.parquet"
        java.nio.file.Files.move(out.toPath,
          new java.io.File(fdir, newName).toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        org.apache.spark.network.util.JavaUtils
          .deleteRecursively(new java.io.File(tmp))
        Some(newName)
      }
    }
    writeManifest(root, v + 1, untouched ++ newNames)
    DeleteResult(v + 1, touched.size, untouched.size)
  }

  /** Exact micros of a column for zone math: `unix_micros` for
    * timestamps, the raw long otherwise.
    */
  private def microsOf(df: DataFrame, column: String) =
    df.schema(column).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(column))
      case _ => col(column).cast("long")
    }

  private def writeNewFiles(spark: SparkSession, root: String, v: Int,
      tag: String, df: DataFrame, sortCol: String, nFiles: Int)
      : Seq[String] = {
    val fdir = filesDir(root)
    val tmp = s"$fdir/__${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
    Bucketing.writeRangeSorted(df, sortCol, nFiles, tmp,
      blockSize = 16 * 1024)
    val names = Compaction.dataFiles(tmp).zipWithIndex.map { case (f, i) =>
      val name = s"${tag}_v${v}_$i.parquet"
      java.nio.file.Files.move(f.toPath,
        new java.io.File(fdir, name).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      name
    }
    org.apache.spark.network.util.JavaUtils
      .deleteRecursively(new java.io.File(tmp))
    names
  }

  /** Result of a copy-on-write MERGE: the new version, files rewritten
    * (zone-intersecting candidates), files re-referenced untouched, and
    * the number of update rows applied.
    */
  case class UpsertResult(version: Int, rewritten: Int, reused: Int,
      upserted: Long)

  /** Copy-on-write MERGE (upsert) into the LATEST version: every target
    * row whose `keyCol` appears in `updates` is REPLACED by the update
    * row; update rows matching nothing are INSERTED — the Delta/Iceberg
    * `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT` shape.
    *
    * The rewrite is ZONE-BOUNDED like [[deleteRange]]: update batches
    * carry the table's sort column (`zoneCol`), so only files whose
    * footer zone intersects the batch's [min, max] can contain matches —
    * everything else is re-referenced verbatim. The batch itself is
    * BROADCAST into the anti-join (an upsert batch is operationally
    * small; a batch the size of the table is a rewrite, not a merge).
    * All update rows land in fresh range-sorted files, keeping the
    * table's skippable layout.
    */
  def upsert(spark: SparkSession, root: String, keyCol: String,
      zoneCol: String, updates: DataFrame): UpsertResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val current = resolve(root, v)
    val fdir = filesDir(root)
    val bounds = updates
      .agg(min(microsOf(updates, zoneCol)), max(microsOf(updates, zoneCol)))
      .head()
    if (bounds.isNullAt(0)) // empty batch: nothing to do but commit
      { writeManifest(root, v + 1, current)
        return UpsertResult(v + 1, 0, current.size, 0L) }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val zones = Manifest.buildTs(spark, fdir, zoneCol)
      .map { case (path, _, _, mn, mx) =>
        path.substring(path.lastIndexOf('/') + 1) -> (mn, mx)
      }.toMap
    val (touched, untouched) = current.partition { n =>
      val (mn, mx) = zones(n)
      mx >= lo && mn <= hi
    }
    val nUpd = updates.count()
    val kept =
      if (touched.isEmpty) None
      else {
        val tgt = spark.read.parquet(touched.map(n => s"$fdir/$n"): _*)
        Some(tgt.join(broadcast(updates.select(col(keyCol))),
          Seq(keyCol), "left_anti"))
      }
    val keptNames = kept.toSeq.flatMap { df =>
      if (df.isEmpty) Seq.empty
      else writeNewFiles(spark, root, v + 1, "kept", df, zoneCol,
        math.max(1, touched.size))
    }
    val updNames = writeNewFiles(spark, root, v + 1, "upsert",
      updates, zoneCol, 1)
    writeManifest(root, v + 1, untouched ++ keptNames ++ updNames)
    UpsertResult(v + 1, touched.size, untouched.size, nUpd)
  }

  /** APPEND: commit `df` as new range-sorted file(s) referenced by a new
    * version alongside everything the latest version holds — the ingest
    * path. Schema evolution is allowed: an appended batch may carry NEW
    * columns (readers see them as NULL on older files via mergeSchema);
    * it should carry the table's sort column so zone planning keeps
    * working. Returns the new version.
    */
  def append(spark: SparkSession, root: String, df: DataFrame,
      sortCol: String, nFiles: Int = 1, base: Int = -1): Int = {
    // `base` is the version the writer PLANNED against (its read
    // snapshot); committing base+1 under CREATE_NEW is the optimistic
    // CAS — if a rival landed base+1 first, this throws and the caller
    // re-plans. Default: plan against the current latest.
    val v = if (base >= 1) base else latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val names = writeNewFiles(spark, root, v + 1, "append", df, sortCol,
      nFiles)
    writeManifest(root, v + 1, resolve(root, v) ++ names)
    v + 1
  }

  /** EXACTLY-ONCE streaming append: commit a micro-batch under its
    * `batchId`, skipping batches already committed — the idempotence
    * that turns foreachBatch's at-least-once replay into exactly-once
    * table semantics (the Delta txn-version pattern): after a crash the
    * source replays the last batch, the marker says it already landed,
    * and the replay is a no-op. Returns false iff skipped.
    */
  def appendBatch(spark: SparkSession, root: String, df: DataFrame,
      sortCol: String, batchId: Long): Boolean = {
    val marker = new java.io.File(s"${manifestDir(root)}/_batch$batchId")
    if (marker.exists()) false
    else {
      append(spark, root, df, sortCol)
      java.nio.file.Files.createFile(marker.toPath)
      true
    }
  }

  /** The batch ids committed so far (sorted). */
  def committedBatches(root: String): Seq[Long] =
    Option(new java.io.File(manifestDir(root)).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith("_batch"))
      .map(_.stripPrefix("_batch").toLong).sorted

  /** OPTIMIZE: rewrite the LATEST version as `nFiles` range-sorted files
    * (one new compacted version; the data is untouched). The snapshot
    * face of [[Compaction.compactSorted]] — after enough upsert/delete
    * churn the manifest accumulates small delta files, and scan cost
    * follows file count. Returns the new version.
    */
  def optimize(spark: SparkSession, root: String, sortCol: String,
      nFiles: Int): Int = {
    val v = latestVersion(root)
    val names = writeNewFiles(spark, root, v + 1, "opt",
      read(spark, root, v), sortCol, nFiles)
    writeManifest(root, v + 1, names)
    v + 1
  }

  /** FILE-GRANULAR CHANGE FEED between two versions: `(netAdded,
    * netRemoved)` as DataFrames. Copy-on-write makes this cheap and
    * exact: only files that CHANGED between the manifests are read
    * (reused files cancel by reference, rewritten survivors cancel via
    * multiset `exceptAll`), so a consumer replays the delta at cost
    * ∝ changed files — never a diff of two full table scans. For a pure
    * delete, netRemoved IS the deleted rows and netAdded is empty; for
    * an upsert, netAdded carries the new row versions and netRemoved the
    * replaced ones — the CDC feed incremental consumers subscribe to.
    */
  def netChanges(spark: SparkSession, root: String, from: Int, to: Int)
      : (DataFrame, DataFrame) = {
    val fFrom = resolve(root, from).toSet
    val fTo = resolve(root, to).toSet
    val fdir = filesDir(root)
    def readSet(names: Set[String]): DataFrame =
      if (names.isEmpty) read(spark, root, to).limit(0)
      else spark.read.option("mergeSchema", "true")
        .parquet(names.toSeq.sorted.map(n => s"$fdir/$n"): _*)
    val added = readSet(fTo -- fFrom)
    val removed = readSet(fFrom -- fTo)
    (added.exceptAll(removed), removed.exceptAll(added))
  }

  /** VACUUM: drop every version below `keepFrom` and physically delete
    * the data files no surviving manifest references. Returns
    * (manifests dropped, files deleted). The retention half of
    * copy-on-write: old versions are free until you reclaim them, and
    * reclaiming must never touch a file a LIVE version still references.
    */
  def vacuum(root: String, keepFrom: Int): (Int, Int) = {
    val latest = latestVersion(root)
    require(keepFrom <= latest, s"keepFrom $keepFrom > latest $latest")
    val dropped = (1 until keepFrom).flatMap { v =>
      val f = new java.io.File(s"${manifestDir(root)}/v$v.txt")
      if (f.exists()) { f.delete(); Some(v) } else None
    }
    val live = (keepFrom to latest)
      .flatMap(v => resolve(root, v)).toSet
    val deleted = Compaction.dataFiles(filesDir(root))
      .filterNot(f => live.contains(f.getName))
      .map { f => f.delete(); f.getName }
    (dropped.size, deleted.size)
  }
}
