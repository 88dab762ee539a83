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
  *   root/_deletes/<name>/file=<f>/…  position-delete sidecar: per marked
  *                                    data file, one-row (card, blob)
  *                                    COMPRESSED-BITMAP parts
  *                                    ([[GraftBitmap]]) — or legacy `pos`
  *                                    rows; `<name>.parquet` (file, pos)
  *                                    single-file sidecars stay readable
  *   root/_manifests/v<N>.txt         version N: metadata + file section
  *   root/_manifests/_ckpt_v<N>.txt   full file list materialized by vacuum
  *   root/_manifests/_latest.hint     advisory latest-version pointer
  *   root/_manifests/_props.txt       table properties (ckpt=<interval>)
  * }}}
  *
  * A version IS its manifest. Metadata lines (`#`-prefixed, carried
  * forward in FULL on every commit so the latest manifest is
  * self-sufficient):
  * {{{
  *   #ts:<epochMillis>  commit timestamp (monotone; timestamp time travel)
  *   #batch:<id>        streaming batch committed (cumulative; exactly-once)
  *   #dv:<name>         live position-delete sidecar in _deletes/
  *   #map:<old>=<new>   logical column rename (applied at read)
  *   #widen:<col>=<t>   logical type widening to t ∈ {long, double}
  * }}}
  *
  * The FILE SECTION is either a full list or an INCREMENTAL DELTA — the
  * fix for the one cost that would not scale: a full file list per
  * commit is O(table files) metadata I/O per KB-scale commit (~100 MB
  * per commit at 10^6 files). A delta manifest carries
  * {{{
  *   #parent:<v>        resolve against version v's file section
  *   -<name>            file removed vs the parent
  *   +<entry>           file added vs the parent (with its stats)
  * }}}
  * so commit bytes are ∝ CHANGED files. Every `checkpointInterval`-th
  * version (and v1) is written full, bounding resolution to one short
  * chain — the Delta checkpoint / Iceberg manifest-list economics.
  * [[vacuum]] materializes the oldest kept version as a `_ckpt_v<N>.txt`
  * sidecar before dropping its ancestors, so chains never dangle.
  *
  * Each data-file line carries COMMIT-TIME STATS —
  * `name|r=<rows>|b=<bytes>|fp=<schemaMd5>|z:<col>=<min>..<max>` —
  * stamped from ONE footer open when the file is adopted, so zone
  * planning ([[deleteRange]]/[[upsert]]/[[deletePositions]]) and the
  * uniform-schema read fast path parse the manifest instead of re-opening
  * parquet footers on every operation (files lacking a stat fall back to
  * a footer read — the conservative, format-compatible path). Plain
  * `name` lines (pre-stats manifests) stay readable.
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

  /** Every Nth version is a full (checkpoint) manifest; versions between
    * are deltas against their parent. Table-scoped via `_props.txt`
    * (set at [[init]]); 16 bounds resolution to ≤ 15 short text reads
    * while keeping >90% of commits delta-sized.
    */
  val DefaultCheckpointInterval: Int = 16

  /** Default [[vacuum]] retention grace: an unreferenced file younger
    * than this is NOT deleted — it may belong to a writer that has
    * adopted its files but not yet committed its manifest (the
    * Delta/Iceberg retention-window race guard).
    */
  val DefaultVacuumGraceMs: Long = 60L * 60L * 1000L

  /** Entry count above which a FULL manifest's file section is written
    * as a PARQUET side table (`_pqsec_v<N>_<uuid>`) instead of inline
    * text — the Delta parquet-checkpoint economics: a 10^6-file text
    * checkpoint is a ~10^2 MB driver-side string parse per cold resolve
    * (and per raw metadata read — committedBatches, versionAsOf probes
    * all pay it), where a parquet section keeps the manifest itself
    * KB-scale and the entries load as a DataFrame (distributed decode,
    * column-pruned). Table-scoped via `pqsec=` in `_props.txt` (set at
    * [[init]]). 100k keeps every small-to-mid table on the simpler
    * inline path.
    */
  val DefaultPqSectionThreshold: Int = 100000

  private def manifestDir(root: String) = s"$root/_manifests"
  private def filesDir(root: String) = s"$root/files"
  private def deletesDir(root: String) = s"$root/_deletes"
  private def manifestPath(root: String, v: Int) =
    s"${manifestDir(root)}/v$v.txt"
  private def ckptPath(root: String, v: Int) =
    s"${manifestDir(root)}/_ckpt_v$v.txt"
  private def hintPath(root: String) = s"${manifestDir(root)}/_latest.hint"
  private def propsPath(root: String) = s"${manifestDir(root)}/_props.txt"

  private def uuid8(): String =
    java.util.UUID.randomUUID().toString.take(8)

  // ---------------------------------------------------------------------
  // Manifest model
  // ---------------------------------------------------------------------

  /** STRING zone of one file's column — Iceberg-style TRUNCATED bounds:
    * `lo` is the UTF-8 byte PREFIX of the true minimum (a prefix is
    * bytewise ≤ the value — a valid lower bound), `hi` is the true
    * maximum when it fits the truncation budget, else the PREFIX
    * SUCCESSOR (last non-0xFF prefix byte incremented, tail dropped —
    * bytewise > every value sharing the prefix). Conservative by
    * construction: `lo ≤ min(col) ≤ max(col) ≤ hi`, so range pruning
    * can over-select but never wrong-skip. `loExact`/`hiExact` record
    * whether the bound IS the true extreme (untruncated) — what
    * metadata-only MIN/MAX needs and a truncated bound cannot answer.
    * Bounds are stored base64 (raw bytes may hold the manifest's own
    * delimiters); comparisons are unsigned-lexicographic on the bytes,
    * which equals code-point order for valid UTF-8 — the same order
    * Spark's UTF8String and binary-collation SQL compare with.
    */
  case class StrZone(loB64: String, loExact: Boolean,
      hiB64: String, hiExact: Boolean) {
    def lo: Array[Byte] = java.util.Base64.getDecoder.decode(loB64)
    def hi: Array[Byte] = java.util.Base64.getDecoder.decode(hiB64)
    /** Zone may intersect the byte range [lo, hi): no false skip under
      * the conservative-bound law above.
      */
    def intersects(qLo: Array[Byte], qHi: Array[Byte]): Boolean =
      java.util.Arrays.compareUnsigned(hi, qLo) >= 0 &&
        java.util.Arrays.compareUnsigned(lo, qHi) < 0
    def render: String =
      s"${if (loExact) "e" else "t"}$loB64..${if (hiExact) "e" else "t"}$hiB64"
  }

  object StrZone {
    /** Truncation budget — 16 bytes, the Iceberg `truncate(16)` default:
      * long ids/URLs stay prunable while a manifest line stays KB-free.
      */
    val TruncateBytes: Int = 16

    private def b64(b: Array[Byte]): String =
      java.util.Base64.getEncoder.encodeToString(b)

    /** Smallest byte string > every value with this prefix: increment
      * the last non-0xFF byte, drop the tail; None when all bytes are
      * 0xFF (no finite successor — the caller must drop the zone, the
      * conservative must-touch contract).
      */
    private[graft] def prefixSuccessor(prefix: Array[Byte])
        : Option[Array[Byte]] = {
      val i = prefix.lastIndexWhere(b => (b & 0xff) != 0xff)
      if (i < 0) None
      else {
        val out = prefix.take(i + 1)
        out(i) = (out(i) + 1).toByte
        Some(out)
      }
    }

    /** Zone from the TRUE min/max byte values (parquet footer stats),
      * truncated to the budget; None when no sound upper bound exists.
      */
    def ofBytes(min: Array[Byte], max: Array[Byte],
        budget: Int = TruncateBytes): Option[StrZone] = {
      val (lo, loExact) =
        if (min.length <= budget) (min, true) else (min.take(budget), false)
      if (max.length <= budget) Some(StrZone(b64(lo), loExact, b64(max), true))
      else prefixSuccessor(max.take(budget))
        .map(hi => StrZone(b64(lo), loExact, b64(hi), false))
    }

    def parse(s: String): StrZone = {
      val Array(l, h) = s.split("\\.\\.", 2)
      StrZone(l.tail, l.head == 'e', h.tail, h.head == 'e')
    }
  }

  /** One data-file line of a manifest: the name plus the commit-time
    * stats (row count, bytes, footer-schema fingerprint, per-column
    * min/max zones — numeric `z:` and string `s:`). Stats are all
    * optional — plain `name` lines from pre-stats manifests parse to an
    * entry with none, and every consumer falls back to footer I/O for
    * what the manifest does not carry.
    */
  case class FileEntry(name: String, rows: Option[Long] = None,
      bytes: Option[Long] = None, fp: Option[String] = None,
      zones: Map[String, (Long, Long)] = Map.empty,
      szones: Map[String, StrZone] = Map.empty,
      nulls: Map[String, Long] = Map.empty,
      bucket: Option[Int] = None,
      addedV: Option[Int] = None) {
    def render: String = {
      val parts = Seq(name) ++
        rows.map(r => s"r=$r") ++ bytes.map(b => s"b=$b") ++
        fp.map(f => s"fp=$f") ++
        bucket.map(k => s"k=$k") ++ addedV.map(v => s"av=$v") ++
        zones.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
          s"z:$c=$mn..$mx"
        } ++
        szones.toSeq.sortBy(_._1).map { case (c, z) =>
          s"s:$c=${z.render}"
        } ++
        nulls.toSeq.sortBy(_._1).map { case (c, n) => s"n:$c=$n" }
      parts.mkString("|")
    }
  }

  object FileEntry {
    def parse(line: String): FileEntry = {
      val parts = line.split("\\|").toSeq
      parts.tail.foldLeft(FileEntry(parts.head)) { (e, p) =>
        if (p.startsWith("r=")) e.copy(rows = Some(p.drop(2).toLong))
        else if (p.startsWith("b=")) e.copy(bytes = Some(p.drop(2).toLong))
        else if (p.startsWith("fp=")) e.copy(fp = Some(p.drop(3)))
        else if (p.startsWith("k=")) e.copy(bucket = Some(p.drop(2).toInt))
        else if (p.startsWith("av="))
          e.copy(addedV = Some(p.drop(3).toInt))
        else if (p.startsWith("z:")) {
          val Array(c, mm) = p.drop(2).split("=", 2)
          val Array(mn, mx) = mm.split("\\.\\.", 2)
          e.copy(zones = e.zones + (c -> (mn.toLong, mx.toLong)))
        } else if (p.startsWith("s:")) {
          val Array(c, zz) = p.drop(2).split("=", 2)
          e.copy(szones = e.szones + (c -> StrZone.parse(zz)))
        } else if (p.startsWith("n:")) {
          val Array(c, n) = p.drop(2).split("=", 2)
          e.copy(nulls = e.nulls + (c -> n.toLong))
        } else e // unknown stat: forward-compatible skip
      }
    }
  }

  /** Parsed + RESOLVED manifest: `entries` are the version's data files
    * with their stats (delta chains already applied, sorted by name);
    * `meta` are the carried `#` lines in commit order (order matters for
    * chained column maps); `commitTs` is the `#ts:` stamp (None on
    * pre-timestamp manifests); `isDelta` records whether the file
    * section was delta-encoded.
    */
  case class ManifestData(entries: Seq[FileEntry], meta: Seq[String],
      commitTs: Option[Long] = None, isDelta: Boolean = false) {
    def files: Seq[String] = entries.map(_.name)
    def dvNames: Seq[String] =
      meta.filter(_.startsWith("#dv:")).map(_.stripPrefix("#dv:"))
    /** Highest batch id W such that EVERY id in [0, W] is committed —
      * the watermark the sparse `#batch:` lines fold into so the meta
      * section stays bounded under unbounded streaming commits (-1 =
      * none).
      */
    def batchWatermark: Long =
      meta.find(_.startsWith("#batchwm:"))
        .map(_.stripPrefix("#batchwm:").toLong).getOrElse(-1L)
    private def sparseBatchIds: Seq[Long] =
      meta.filter(_.startsWith("#batch:"))
        .map(_.stripPrefix("#batch:").toLong)
    /** All committed batch ids, watermark range materialized — an
      * introspection surface; the O(1) membership check writers need is
      * [[isBatchCommitted]].
      */
    def batchIds: Seq[Long] =
      ((0L to batchWatermark) ++ sparseBatchIds).distinct.sorted
    def isBatchCommitted(id: Long): Boolean =
      id <= batchWatermark || sparseBatchIds.contains(id)
    /** Highest epoch committed under a writer APPLICATION id (`#txn:`
      * meta, ONE line per app holding its latest epoch — epochs are
      * monotone per app, so one line is the whole idempotence state;
      * the Delta setTransaction shape). Scopes streaming exactly-once
      * to (app, epoch): a DIFFERENT query's epoch 0 is a first write,
      * not a replay of this query's epoch 0.
      */
    def txnVersion(app: String): Option[Long] =
      meta.find(_.startsWith(s"#txn:$app="))
        .map(_.stripPrefix(s"#txn:$app=").toLong)
    def columnMaps: Seq[(String, String)] =
      meta.filter(_.startsWith("#map:")).map { l =>
        val Array(o, n) = l.stripPrefix("#map:").split("=", 2)
        (o, n)
      }
    /** Logically DROPPED columns (`#drop:` tombstones): hidden from the
      * current schema at read time, physical data retained (old
      * versions still serve it through time travel). Tombstones carry
      * forever — they are also the re-add refusal record, since a
      * re-added name would resurrect retained physical values in any
      * not-yet-rewritten file.
      */
    def droppedColumns: Seq[String] =
      meta.filter(_.startsWith("#drop:")).map(_.stripPrefix("#drop:"))
    def widenings: Seq[(String, String)] =
      meta.filter(_.startsWith("#widen:")).map { l =>
        val Array(c, t) = l.stripPrefix("#widen:").split("=", 2)
        (c, t)
      }
    def hasMappings: Boolean = columnMaps.nonEmpty || widenings.nonEmpty
    /** The table's default stats columns as VERSIONED state (`#stats:`
      * meta, carried like every read-state line): renames update it in
      * the SAME commit as their `#map:` line and RESTORE takes the
      * target's, so the zone-stamping default can never drift from the
      * schema the way a side file can (None on pre-feature manifests —
      * the `_props.txt stats=` fallback serves those).
      */
    def statsColsMeta: Option[Seq[String]] =
      meta.find(_.startsWith("#stats:")).map(_.stripPrefix("#stats:")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    /** The version's BUCKET layout (`#bucket:<col>=<n>` meta): every
      * data file holds exactly one `bucket(n, col)` value, stamped as
      * its `k=` stat — what the DSv2 scan reports as
      * KeyGroupedPartitioning so co-bucketed tables join WITHOUT a
      * shuffle. Dropped by rewrites that break the layout (optimize/
      * z-order); re-stamped by [[Snapshots.optimizeBucketed]]. The
      * DSv2 writers MAINTAIN the layout (INSERT/streaming appends and
      * MERGE inserts split per bucket id and stamp `k=` when the
      * bucket column is in the write schema); a scan still only trusts
      * the spec when EVERY selected file carries a `k=` stat, so any
      * surface that skips the split (the Scala [[Snapshots.append]],
      * a write missing the bucket column) soundly disables the report
      * instead of mis-joining.
      */
    def bucketSpec: Option[(String, Int)] =
      meta.find(_.startsWith("#bucket:")).map { l =>
        val Array(c, n) = l.stripPrefix("#bucket:").split("=", 2)
        (c, n.toInt)
      }
    /** Live EQUALITY-delete sidecars (`#eq:<name>=<col>@<v>` meta): a
      * key set in `_deletes/<name>` deleting every row of `keyCol` ∈
      * set from files ADDED BEFORE version `v` (`av=` stamp < v; a file
      * without a stamp predates the feature and always applies) — the
      * Iceberg-v2 equality-delete scoping, with the `av=` stamp playing
      * the sequence number. Files added at ≥ v (the committing upsert's
      * own inserts and everything later) are exempt, so an upsert's
      * post-image rows survive their own key set.
      */
    def eqDeletes: Seq[EqDelete] =
      meta.filter(_.startsWith("#eq:")).map { l =>
        val Array(n, rest) = l.stripPrefix("#eq:").split("=", 2)
        val Array(c, v) = rest.split("@", 2)
        EqDelete(n, c, v.toInt)
      }
  }

  /** One live equality-delete sidecar: key set `name` over `keyCol`,
    * applying to files added before `version`.
    */
  case class EqDelete(name: String, keyCol: String, version: Int) {
    def appliesTo(e: FileEntry): Boolean = e.addedV.forall(_ < version)
    def render: String = s"#eq:$name=$keyCol@$version"
  }

  /** Latest committed version — advisory-hint + forward-probe instead of
    * a directory listing: the `_latest.hint` written after each commit
    * points at (or just below) the true latest, and probing `exists`
    * forward from it costs O(gap+1) metadata calls instead of O(versions)
    * names per operation. A missing/garbled hint (legacy tables, torn
    * write) falls back to the full listing — the hint is never trusted
    * for correctness, only as a probe start.
    */
  def latestVersion(root: String): Int = {
    val hinted = LakeFs.readHint(hintPath(root))
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(v => v >= 1 && LakeFs.exists(manifestPath(root, v)))
    hinted match {
      case Some(start) =>
        var v = start
        while (LakeFs.exists(manifestPath(root, v + 1))) v += 1
        v
      case None =>
        LakeFs.listNames(manifestDir(root), ".txt")
          .filter(n => n.startsWith("v") && !n.contains("ckpt"))
          .map(_.stripPrefix("v").stripSuffix(".txt").toInt)
          .foldLeft(0)(math.max)
    }
  }

  private def rawLines(root: String, version: Int): Seq[String] = {
    val p = manifestPath(root, version)
    require(LakeFs.exists(p), s"no such version: $version at $root")
    LakeFs.readString(p).split("\n").toSeq.filter(_.nonEmpty)
  }

  def manifest(root: String, version: Int): ManifestData = {
    val lines = rawLines(root, version)
    val parent = lines.find(_.startsWith("#parent:"))
      .map(_.stripPrefix("#parent:").toInt)
    val commitTs = lines.find(_.startsWith("#ts:"))
      .map(_.stripPrefix("#ts:").toLong)
    val meta = lines.filter(l => l.startsWith("#") &&
      !l.startsWith("#parent:") && !l.startsWith("#ts:") &&
      !l.startsWith("#nfiles:") && !l.startsWith("#nrows:") &&
      !l.startsWith("#dbytes:") &&
      !l.startsWith("#pqsec:")) // per-version stamps, never carried
    val entries = parent match {
      case None =>
        lines.find(_.startsWith("#pqsec:")) match {
          case Some(p) => loadPqSection(root, p.stripPrefix("#pqsec:"))
          case None =>
            lines.filterNot(_.startsWith("#")).map(FileEntry.parse)
        }
      case Some(pv) =>
        val ck = ckptPath(root, version)
        if (LakeFs.exists(ck)) // vacuum materialized this version full
          LakeFs.readString(ck).split("\n").toSeq.filter(_.nonEmpty)
            .map(FileEntry.parse)
        else {
          val base = manifest(root, pv).entries // chain ≤ ckpt interval
          val removed = lines.filter(_.startsWith("-"))
            .map(_.stripPrefix("-")).toSet
          val added = lines.filter(_.startsWith("+"))
            .map(l => FileEntry.parse(l.stripPrefix("+")))
          base.filterNot(e => removed.contains(e.name)) ++ added
        }
    }
    ManifestData(entries.sortBy(_.name), meta, commitTs, parent.nonEmpty)
  }

  /** The data-file names a version references (sorted). */
  def resolve(root: String, version: Int): Seq[String] =
    manifest(root, version).files

  /** The live position-delete sidecar names of a version. */
  def deleteSidecars(root: String, version: Int): Seq[String] =
    manifest(root, version).dvNames

  /** The `#ts:` commit timestamp of a version (None on pre-timestamp
    * manifests) — parsed without resolving the file section.
    */
  def commitTimestamp(root: String, version: Int): Option[Long] =
    rawLines(root, version).find(_.startsWith("#ts:"))
      .map(_.stripPrefix("#ts:").toLong)

  private def tableProps(root: String): Map[String, String] =
    if (!LakeFs.exists(propsPath(root))) Map.empty
    else LakeFs.readString(propsPath(root)).split("\n").toSeq
      .filter(_.contains("=")).map { l =>
        val Array(k, v) = l.split("=", 2)
        k.trim -> v.trim
      }.toMap

  /** The table's default stats columns — what planner-routed writes
    * (INSERT INTO through [[graft.sources.v2.GraftCatalog]]) stamp
    * zones for when the write carries no explicit `statsCols` option.
    * Manifest-versioned `#stats:` meta first (atomic with renames and
    * restores — see [[ManifestData.statsColsMeta]]); the legacy
    * `_props.txt stats=` line serves pre-feature tables.
    */
  private[graft] def statsColsProp(root: String): Seq[String] = {
    val fromMeta =
      if (latestVersion(root) >= 1)
        manifest(root, latestVersion(root)).statsColsMeta
      else None
    fromMeta.getOrElse(tableProps(root).get("stats").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
  }

  /** Follow a column RENAME in the `stats=` property so planner-routed
    * writes keep stamping zones for the renamed column (a stale old
    * name would silently intersect to nothing). The rewrite is an
    * ATOMIC REPLACE ([[LakeFs.replaceAtomic]] — temp write + rename):
    * a crash or concurrent reader sees the old props or the new, never
    * a missing file that would silently reset checkpoint cadence,
    * parquet-section thresholds, and stats defaults to table defaults.
    */
  private[graft] def renameInStatsProp(root: String, oldName: String,
      newName: String): Unit = {
    val p = propsPath(root)
    if (!LakeFs.exists(p)) return
    val lines = LakeFs.readString(p).split("\n").toSeq
    val updated = lines.map { l =>
      if (l.trim.startsWith("stats=")) {
        val cols = l.trim.stripPrefix("stats=").split(",").map(_.trim)
          .map(c => if (c == oldName) newName else c)
        s"stats=${cols.mkString(",")}"
      } else l
    }
    if (updated != lines)
      LakeFs.replaceAtomic(p, updated.mkString("\n"))
  }

  private def checkpointIntervalOf(root: String): Int =
    tableProps(root).get("ckpt").map(_.toInt)
      .getOrElse(DefaultCheckpointInterval)

  private def pqSectionThresholdOf(root: String): Int =
    tableProps(root).get("pqsec").map(_.toInt)
      .getOrElse(DefaultPqSectionThreshold)

  /** Commit a version manifest with OPTIMISTIC CONCURRENCY: the create
    * is exclusive ([[LakeFs.createNewAtomic]]), so two writers committing
    * from the same base version race on the same manifest name and
    * exactly one wins — the loser gets a ConcurrentModificationException
    * and must re-plan against the new latest (the Delta/Iceberg commit
    * protocol). The loser's already-written data files are UUID-named
    * orphans, invisible to every reader and reclaimed by [[vacuum]] —
    * they can never overwrite the winner's files.
    *
    * The file section is written as a DELTA against `parent` unless this
    * version is a checkpoint (version % interval == 0) or has no parent
    * — commit bytes ∝ changed files. The `#ts:` stamp is forced strictly
    * above the parent's so [[versionAsOf]] is well-defined even under
    * clock skew between commits.
    */
  private def commitManifest(root: String, version: Int,
      entries: Seq[FileEntry], meta: Seq[String],
      parent: Option[(Int, ManifestData)]): Unit = {
    LakeFs.mkdirs(manifestDir(root))
    val ts = math.max(System.currentTimeMillis(),
      parent.flatMap(_._2.commitTs).map(_ + 1).getOrElse(Long.MinValue))
    val interval = checkpointIntervalOf(root)
    val asDelta = parent.exists(_._1 == version - 1) &&
      interval > 1 && version % interval != 0
    val body =
      if (!asDelta) fullBody(root, version, entries)
      else {
        val (pv, pm) = parent.get
        val newNames = entries.map(_.name).toSet
        val oldNames = pm.entries.map(_.name).toSet
        Seq(s"#parent:$pv") ++
          pm.entries.map(_.name).filterNot(newNames.contains).sorted
            .map("-" + _) ++
          entries.filterNot(e => oldNames.contains(e.name))
            .sortBy(_.name).map("+" + _.render)
      }
    // per-version summary stamps (NOT carried forward — manifest() and
    // carryMeta filter them): file count and, when every entry carries
    // row stats, the row sum — so history() answers per version from ONE
    // raw read instead of resolving each version's delta chain
    // (O(versions) vs O(versions × checkpoint interval) manifest reads)
    val stamps = Seq(s"#nfiles:${entries.size}") ++
      (if (entries.forall(_.rows.nonEmpty))
        Seq(s"#nrows:${entries.flatMap(_.rows).sum}")
      else Seq.empty) ++
      // delta BYTES of this commit (changed files vs the parent; the
      // whole table for roots) — what byte-based streaming admission
      // reads from one raw line instead of resolving two manifests
      deltaBytesStamp(entries, parent)
    val content = (Seq(s"#ts:$ts") ++ stamps ++ meta ++ body).mkString("\n")
    try LakeFs.createNewAtomic(manifestPath(root, version), content)
    catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"version $version already committed at $root — " +
            "re-plan against the new latest", e)
    }
    LakeFs.writeHint(hintPath(root), version.toString) // advisory only
  }

  /** `#dbytes:` stamp value — the byte size of THIS commit's change
    * feed slice (files added plus files removed vs the parent; the
    * full referenced set for rootless/first commits), omitted when any
    * involved entry lacks byte stats (pre-stats files — the consumer
    * treats absence as "unknown, admit alone").
    */
  private def deltaBytesStamp(entries: Seq[FileEntry],
      parent: Option[(Int, ManifestData)]): Seq[String] = {
    val changed = parent match {
      case Some((_, pm)) =>
        val newNames = entries.map(_.name).toSet
        val oldNames = pm.entries.map(_.name).toSet
        entries.filterNot(e => oldNames.contains(e.name)) ++
          pm.entries.filterNot(e => newNames.contains(e.name))
      case None => entries
    }
    if (changed.forall(_.bytes.nonEmpty))
      Seq(s"#dbytes:${changed.flatMap(_.bytes).sum}")
    else Seq.empty
  }

  /** The `#dbytes:` stamp of one version from ONE raw metadata read;
    * None on pre-stamp manifests.
    */
  private[graft] def versionDeltaBytes(root: String, version: Int)
      : Option[Long] =
    rawLines(root, version).find(_.startsWith("#dbytes:"))
      .map(_.stripPrefix("#dbytes:").toLong)

  /** FULL manifest file section: inline text below the table's pqsec
    * threshold; one `#pqsec:<dir>` pointer to a PARQUET side table above
    * it (the Delta parquet-checkpoint shape). The section is written
    * BEFORE the atomic manifest create — a losing OCC writer's section
    * is an orphan directory [[vacuum]] reclaims, never a dangling
    * reference. Falls back to inline when no SparkSession is reachable
    * (correctness never depends on the parquet form).
    */
  private def fullBody(root: String, version: Int,
      entries: Seq[FileEntry]): Seq[String] = {
    val sorted = entries.sortBy(_.name)
    val session = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    if (sorted.size <= pqSectionThresholdOf(root) || session.isEmpty)
      sorted.map(_.render)
    else {
      val spark = session.get
      import spark.implicits._
      // no leading underscore: Spark's file index treats `_`-prefixed
      // INPUT paths as hidden (warns and may skip); `_manifests/` already
      // shields the section from any data scan of the table root
      val name = s"pqsec_v${version}_${uuid8()}"
      sorted.map(e => (e.render, e.rows, e.bytes))
        .toDF("entry", "rows", "bytes")
        .write.parquet(s"${manifestDir(root)}/$name")
      Seq(s"#pqsec:$name")
    }
  }

  /** Load a `#pqsec:` parquet file section: distributed decode via the
    * session when one is reachable; sorted like every resolution.
    */
  private def loadPqSection(root: String, name: String): Seq[FileEntry] = {
    val dir = s"${manifestDir(root)}/$name"
    val spark = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(sys.error(
        s"parquet manifest section $name needs a SparkSession to load"))
    spark.read.parquet(dir).select("entry").collect()
      .map(r => FileEntry.parse(r.getString(0))).toSeq
  }

  /** Metadata lines that carry forward across commits: live sidecars,
    * column mappings, and the cumulative batch-id set (kept in the
    * LATEST manifest so exactly-once survives [[vacuum]] dropping old
    * manifests — the Delta txn-map convention). Batch ids are FOLDED
    * into a `#batchwm:` watermark each carry: sequential streaming ids
    * collapse to one line, so 10^6 commits cost one meta line, not 10^6
    * (sparse out-of-order ids stay listed until the gap below them
    * fills — the Delta setTransaction-retention idea without its
    * expiry caveat).
    */
  private def carryMeta(m: ManifestData,
      newBatchIds: Seq[Long] = Seq.empty): Seq[String] = {
    val ids = m.meta.filter(_.startsWith("#batch:"))
      .map(_.stripPrefix("#batch:").toLong) ++ newBatchIds
    var wm = m.batchWatermark
    val sparse = scala.collection.mutable.SortedSet(ids.filter(_ > wm): _*)
    while (sparse.contains(wm + 1)) { wm += 1; sparse.remove(wm) }
    m.meta.filterNot(l =>
      l.startsWith("#batch:") || l.startsWith("#batchwm:")) ++
      (if (wm >= 0) Seq(s"#batchwm:$wm") else Seq.empty) ++
      sparse.toSeq.map(id => s"#batch:$id")
  }

  // ---------------------------------------------------------------------
  // Read path
  // ---------------------------------------------------------------------

  def read(spark: SparkSession, root: String, version: Int): DataFrame = {
    val m = manifest(root, version)
    require(m.files.nonEmpty, s"version $version is empty")
    readFiles(spark, root, m, m.files, keepPos = false)
  }

  /** The latest version whose commit timestamp is ≤ `tsMillis` —
    * timestamp time travel (`TIMESTAMP AS OF`), the other half of the
    * snapshot contract next to version time travel. Commit stamps are
    * strictly monotone per table ([[commitManifest]]), so the scan from
    * the latest version down stops at the first match. A pre-timestamp
    * (legacy) manifest counts as infinitely old. Throws when `tsMillis`
    * predates the table's surviving history (including history dropped
    * by [[vacuum]]).
    */
  def versionAsOf(root: String, tsMillis: Long): Int = {
    val latest = latestVersion(root)
    require(latest >= 1, s"uninitialized snapshot table at $root")
    def tsOf(v: Int): Long =
      commitTimestamp(root, v).getOrElse(Long.MinValue)
    // surviving versions are a contiguous suffix [first, latest]
    // (vacuum drops only from the bottom): binary-search the boundary,
    // then the stamp — O(log versions) metadata reads, not a scan
    var a = 1
    var b = latest
    while (a < b) {
      val mid = (a + b) / 2
      if (LakeFs.exists(manifestPath(root, mid))) b = mid else a = mid + 1
    }
    val first = a
    if (tsOf(first) > tsMillis)
      throw new IllegalArgumentException(
        s"timestamp $tsMillis predates the surviving history at $root")
    a = first
    b = latest
    while (a < b) { // stamps are strictly monotone (commitManifest)
      val mid = (a + b + 1) / 2
      if (tsOf(mid) <= tsMillis) a = mid else b = mid - 1
    }
    a
  }

  /** Read the table as of a wall-clock instant — [[versionAsOf]] +
    * [[read]].
    */
  def readAsOf(spark: SparkSession, root: String, tsMillis: Long): DataFrame =
    read(spark, root, versionAsOf(root, tsMillis))

  /** Schema fingerprint lookup for a version's files: manifest stats
    * when stamped (zero footer I/O), [[Bucketing.schemaFingerprint]]
    * fallback otherwise.
    */
  private def fpLookup(spark: SparkSession, root: String,
      m: ManifestData): String => String = {
    val byPath = m.entries.flatMap(e =>
      e.fp.map(f => s"${filesDir(root)}/${e.name}" -> f)).toMap
    p => byPath.getOrElse(p, Bucketing.schemaFingerprint(spark, p))
  }

  /** Plain parquet read of explicit paths with the schema-fingerprint
    * fast path: all files uniform → plain read (no `mergeSchema`
    * footer-union job); mixed physical schemas → `mergeSchema` (add-only
    * evolution). `withPos` projects the parquet metadata columns the
    * position-delete anti-join keys on.
    */
  private def rawRead(spark: SparkSession, paths: Seq[String],
      withPos: Boolean, fpOf: String => String): DataFrame = {
    val uniform = paths.map(fpOf).toSet.size <= 1
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
      withPos: Boolean, fpOf: String => String): DataFrame = {
    val groups = paths.groupBy(fpOf).toSeq.sortBy(_._1)
    val aligned = groups.map { case (_, ps) =>
      var df = rawRead(spark, ps, withPos, fpOf)
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
    else Some(dvRead(spark, root, m.dvNames))

  /** Read a subset of a version's files with the version's column maps,
    * position deletes AND equality deletes applied — the one read
    * helper every consumer (time travel, rewrites, change feeds, the
    * mutation probes) goes through, so merge-on-read rows can never
    * resurrect in any path. Stale dv rows pointing at files outside
    * `names` simply never match the anti-join (file names are
    * UUID-unique, never reused). Equality deletes apply PER APPLICABLE
    * SET: files group by which live `#eq:` sidecars scope over them
    * (added-before semantics — [[EqDelete.appliesTo]]), each group
    * anti-joins its key sets, and the groups union back; in practice
    * there are ≤ live-eq-count+1 groups, each join a broadcast of a
    * KB-scale key set.
    */
  private def readFiles(spark: SparkSession, root: String, m: ManifestData,
      names: Seq[String], keepPos: Boolean): DataFrame = {
    val eqs = m.eqDeletes
    if (eqs.isEmpty) readFilesBase(spark, root, m, names, keepPos)
    else {
      val entryOf = m.entries.map(e => e.name -> e).toMap
      val groups = names.groupBy(n =>
        eqs.filter(_.appliesTo(entryOf(n))).map(_.name).sorted)
      groups.toSeq.sortBy(_._1.mkString(","))
        .map { case (eqNames, ns) =>
          val df = readFilesBase(spark, root, m, ns, keepPos)
          eqs.filter(e => eqNames.contains(e.name)).groupBy(_.keyCol)
            .toSeq.sortBy(_._1).foldLeft(df) {
              case (acc, (kc, es)) =>
                val keys = es.map(e => spark.read
                    .parquet(s"${deletesDir(root)}/${e.name}"))
                  .reduce(_ unionAll _).select(col("k")).distinct()
                // null keys never match: NULL comparisons keep the row,
                // the SQL DELETE semantics
                acc.join(broadcast(keys), acc(kc) === keys("k"),
                  "left_anti")
            }
        }.reduce((a, b) => a.unionByName(b))
    }
  }

  private def readFilesBase(spark: SparkSession, root: String,
      m: ManifestData, names: Seq[String], keepPos: Boolean): DataFrame = {
    val paths = names.map(n => s"${filesDir(root)}/$n")
    val needPos = keepPos || m.dvNames.nonEmpty
    val fpOf = fpLookup(spark, root, m)
    val base =
      if (m.hasMappings)
        groupedRead(spark, paths, m.columnMaps, m.widenings, needPos, fpOf)
      else rawRead(spark, paths, needPos, fpOf)
    val undeleted = dvFrame(spark, root, m) match {
      case None => base
      case Some(dv) =>
        base.join(dv,
          base("__dv_file") === dv("file") && base("__dv_pos") === dv("pos"),
          "left_anti")
    }
    val visible = m.droppedColumns.foldLeft(undeleted)(_ drop _)
    if (keepPos || m.dvNames.isEmpty) visible
    else visible.drop("__dv_file", "__dv_pos")
  }

  // ---------------------------------------------------------------------
  // Init / append
  // ---------------------------------------------------------------------

  /** One commit-time stats entry for an adopted file: ONE footer open
    * ([[Bucketing.fileStatsEntry]]) yields rows + schema fingerprint +
    * the zones of `statsCols`; bytes from the file status. This is the
    * only footer I/O in the table's life for that file — every later
    * plan parses the manifest.
    */
  private def statEntry(spark: SparkSession, root: String, name: String,
      statsCols: Seq[String], addedV: Option[Int] = None): FileEntry = {
    val p = s"${filesDir(root)}/$name"
    val (rows, fp, zones, szones, nulls) =
      Bucketing.fileStatsEntry(spark, p, statsCols)
    FileEntry(name, Some(rows), Some(LakeFs.fileLength(p)), Some(fp), zones,
      szones, nulls, addedV = addedV)
  }

  /** Create version 1 by adopting the parquet files of `srcDir` (copied
    * into the table's immutable file store), stamping commit-time stats
    * for `statsCols` into the manifest. `checkpointInterval` is a table
    * property (how often a full manifest interrupts the delta chain).
    * Returns the version (1).
    */
  def init(spark: SparkSession, root: String, srcDir: String,
      statsCols: Seq[String] = Seq.empty,
      checkpointInterval: Int = DefaultCheckpointInterval,
      pqSectionThreshold: Int = DefaultPqSectionThreshold,
      extraProps: Seq[String] = Seq.empty): Int = {
    require(checkpointInterval >= 1,
      s"checkpointInterval must be >= 1: $checkpointInterval")
    require(pqSectionThreshold >= 0,
      s"pqSectionThreshold must be >= 0: $pqSectionThreshold")
    LakeFs.mkdirs(filesDir(root))
    val names = Compaction.dataFileNames(srcDir).map { n =>
      LakeFs.copyFile(s"$srcDir/$n", s"${filesDir(root)}/$n")
      n
    }
    require(names.nonEmpty, s"no parquet files in $srcDir")
    LakeFs.mkdirs(manifestDir(root))
    val props =
      (if (checkpointInterval != DefaultCheckpointInterval)
        Seq(s"ckpt=$checkpointInterval") else Seq.empty) ++
      (if (pqSectionThreshold != DefaultPqSectionThreshold)
        Seq(s"pqsec=$pqSectionThreshold") else Seq.empty) ++
      extraProps
    if (props.nonEmpty)
      try LakeFs.createNewAtomic(propsPath(root), props.mkString("\n"))
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => () }
    // the stats DEFAULT also rides the manifest as carried `#stats:`
    // meta, so renames/restores keep it consistent ATOMICALLY with the
    // commit that changes the schema (the props line stays as the
    // legacy fallback read)
    val statsMeta = props.find(_.startsWith("stats="))
      .map(p => s"#stats:${p.stripPrefix("stats=")}").toSeq
    val entries = names.map(n =>
      statEntry(spark, root, n, statsCols, addedV = Some(1)))
    commitManifest(root, 1, entries, statsMeta, None)
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

  /** [[adoptFiles]] + commit-time stats for each adopted file. `v` is
    * the version the files will be committed under — stamped as their
    * `av=` added-at sequence number (a lost OCC race rebuilds the
    * entries against the new latest, so the stamp is always final).
    */
  private def adoptEntries(spark: SparkSession, root: String, v: Int,
      tag: String, statsCols: Seq[String])
      (write: String => Unit): Seq[FileEntry] =
    adoptFiles(root, v, tag)(write)
      .map(n => statEntry(spark, root, n, statsCols, addedV = Some(v)))

  /** Range-sorted write of `df` into the file store under UUID-unique
    * names, stats stamped for the sort column.
    */
  private def writeNewFiles(spark: SparkSession, root: String, v: Int,
      tag: String, df: DataFrame, sortCol: String, nFiles: Int,
      blockSize: Int): Seq[FileEntry] =
    adoptEntries(spark, root, v, tag, Seq(sortCol))(tmp =>
      Bucketing.writeRangeSorted(df, sortCol, nFiles, tmp, blockSize))

  /** BUCKET-MAINTAINING twin of [[writeNewFiles]]: split `df` into one
    * file per live `bucket(n, bucketCol)` id ([[graft.sources.v2
    * .GraftBucket.id]] — the layout contract every stamping surface
    * shares), `k=`-stamped and `av=`-stamped, rows sorted by `sortCol`
    * within each bucket. Keeps the storage-partitioned-join report
    * alive across library-level ingest verbs (the equality-delete
    * upsert) the way the DSv2 writers keep it across INSERT/MERGE.
    */
  private def writeNewFilesBucketed(spark: SparkSession, root: String,
      v: Int, tag: String, df: DataFrame, sortCol: String,
      blockSize: Int, bucketCol: String, nBuckets: Int): Seq[FileEntry] = {
    val bId = udf((k: java.lang.Long) =>
      graft.sources.v2.GraftBucket.idNullSafe(nBuckets, k))
    val fdir = filesDir(root)
    val u = uuid8()
    val tmp = s"$fdir/__${tag}_$u"
    df.withColumn("__gbucket", bId(col(bucketCol).cast("long")))
      .repartition(nBuckets, col("__gbucket"))
      .sortWithinPartitions(col(sortCol))
      .write.option("parquet.block.size", blockSize.toLong)
      .partitionBy("__gbucket").parquet(tmp)
    val cols = Seq(sortCol, bucketCol).distinct
    val entries = LakeFs.listDirNames(tmp)
      .filter(_.startsWith("__gbucket=")).sorted.flatMap { sub =>
        val id = sub.stripPrefix("__gbucket=").toInt
        Compaction.dataFileNames(s"$tmp/$sub").zipWithIndex.map {
          case (f, i) =>
            val name = s"${tag}_v${v}_${u}_k${id}_$i.parquet"
            LakeFs.move(s"$tmp/$sub/$f", s"$fdir/$name")
            statEntry(spark, root, name, cols, addedV = Some(v))
              .copy(bucket = Some(id))
        }
      }
    LakeFs.deleteRecursively(tmp)
    entries
  }

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
    val entries = writeNewFiles(spark, root, v + 1, "append", df, sortCol,
      nFiles, blockSize)
    commitManifest(root, v + 1, m.entries ++ entries,
      carryMeta(m) ++ extraMeta, Some((v, m)))
    v + 1
  }

  /** EXACTLY-ONCE streaming append: commit a micro-batch under its
    * `batchId`, skipping batches already committed — the idempotence
    * that turns foreachBatch's at-least-once replay into exactly-once
    * table semantics (the Delta txn-version pattern). The batch id is
    * part of the MANIFEST itself (`#batch:` line), so the data commit
    * and the idempotence marker are ONE atomic exclusive create — a
    * crash can never land the data without the marker or vice versa.
    *
    * The id check and the commit are PINNED to one snapshot: the ids are
    * read from the same latest manifest (the `#batch:` carry makes its
    * set cumulative) that the commit extends as base+1, so a rival
    * landing between check and commit forces
    * ConcurrentModificationException instead of a double-append — the
    * Delta txn appId/version validation inside the optimistic commit.
    * If the rival turn out to have committed THIS batch id, the replay
    * resolves to a clean skip. Returns false iff skipped.
    */
  def appendBatch(spark: SparkSession, root: String, df: DataFrame,
      sortCol: String, batchId: Long,
      blockSize: Int = DefaultBlockSize): Boolean = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    if (m.isBatchCommitted(batchId) ||
        legacyBatchIds(root).contains(batchId)) false
    else try {
      val entries = writeNewFiles(spark, root, v + 1, "append", df, sortCol,
        1, blockSize)
      commitManifest(root, v + 1, m.entries ++ entries,
        carryMeta(m, Seq(batchId)), Some((v, m)))
      true
    } catch {
      case e: java.util.ConcurrentModificationException =>
        // a rival commit landed first: if it carried this very batch id
        // the replay is a skip; otherwise surface the race for retry.
        // O(1) membership (watermark compare + sparse-line scan of the
        // new latest manifest) — committedBatches materializes the full
        // watermark RANGE, a multi-million-element Seq per contended
        // commit at exactly the streaming scale the watermark exists for
        if (isBatchCommittedLatest(root, batchId)) false else throw e
    }
  }

  /** OCC commit of files ALREADY adopted into the store (their
    * [[FileEntry]] stats pre-computed where they were written — the DSv2
    * write path, whose executors stream data files directly into
    * `files/` and stamp stats from one write-time footer read): the
    * driver's job here is METADATA ONLY. Appends the entries to the
    * latest version (or REPLACES the file section when `truncate` — the
    * overwrite mode; old files stay on disk for time travel until
    * vacuum). A rival commit raises ConcurrentModificationException and
    * this RETRIES against the new latest — sound because the data files
    * are immutable and name-unique, so only the manifest line set is
    * re-planned, never the data.
    *
    * `batchId` makes the commit EXACTLY-ONCE (the [[appendBatch]]
    * idempotence, for the streaming sink's epoch): an already-committed
    * id resolves to None — the caller must treat that as a replay and
    * drop its orphaned files. With `txnApp` (the streaming QUERY id),
    * idempotence is scoped to the (app, epoch) PAIR via a one-line
    * `#txn:` high-water mark per app — a different query's epoch 0 on
    * the same table is a first write, never a false replay (the global
    * `#batch:` id space stays the Scala [[appendBatch]] surface's).
    * Returns Some(newVersion) on commit.
    */
  private[graft] def commitAdopted(root: String, entries: Seq[FileEntry],
      batchId: Option[Long] = None, truncate: Boolean = false,
      maxRetries: Int = 20, txnApp: Option[String] = None,
      assumedBucket: Option[(String, Int)] = None): Option[Int] = {
    require(txnApp.isEmpty || batchId.nonEmpty,
      "txnApp needs the epoch in batchId")
    var attempt = 0
    while (true) {
      val v = latestVersion(root)
      require(v >= 1, s"uninitialized snapshot table at $root")
      val m = manifest(root, v)
      val replayed = txnApp match {
        case Some(app) => m.txnVersion(app).exists(_ >= batchId.get)
        case None => batchId.exists(id =>
          m.isBatchCommitted(id) || legacyBatchIds(root).contains(id))
      }
      if (replayed) return None
      val carried = carryMeta(m,
        if (txnApp.isEmpty) batchId.toSeq else Seq.empty)
      val withTxn = txnApp match {
        case Some(app) =>
          carried.filterNot(_.startsWith(s"#txn:$app=")) :+
            s"#txn:$app=${batchId.get}"
        case None => carried
      }
      // truncate drops data-bound meta (delete sidecars, column maps —
      // the new files are physically written under the logical schema)
      // but KEEPS the batch/txn idempotence lines: exactly-once must
      // survive an overwrite
      val meta =
        if (truncate) withTxn.filter(l =>
          l.startsWith("#batchwm:") || l.startsWith("#batch:") ||
            l.startsWith("#txn:") ||
            l.startsWith("#stats:") || // the stats default survives an
            // INSERT OVERWRITE like any table property would
            l.startsWith("#bucket:")) // the bucket LAYOUT is a table
            // property too: an overwrite whose writers maintained it
            // (stamped files) keeps SPJ alive; one that landed
            // unstamped files disables the report through the
            // every-file-stamped check — keeping the line is sound
            // either way, dropping it wasted the writers' split
        else withTxn
      // executor-written entries learn their added-at version only here
      // (the OCC loop decides the final version)
      val stampedAv = entries.map(e =>
        if (e.addedV.isEmpty) e.copy(addedV = Some(v + 1)) else e)
      // STALE-STAMP guard: the writers computed their `k=` stamps under
      // the bucket spec resolved at write BUILD time (`assumedBucket`).
      // Appends have no conflict checks — this retry loop happily lands
      // on top of a rival relayout — so if the LIVE spec differs (a
      // rival re-bucketed with another column/count, or dropped the
      // layout), those ids are meaningless under it: land the files
      // UNSTAMPED. The scan's every-file-stamped check then disables
      // the SPJ report soundly, instead of trusting wrong stamps into
      // a mis-grouped join. Same-spec retries keep their stamps.
      val stamped =
        if (m.bucketSpec == assumedBucket) stampedAv
        else stampedAv.map(e =>
          if (e.bucket.isEmpty) e else e.copy(bucket = None))
      val newEntries =
        if (truncate) stamped.sortBy(_.name)
        else m.entries ++ stamped
      try {
        commitManifest(root, v + 1, newEntries, meta, Some((v, m)))
        return Some(v + 1)
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxRetries) throw e
      }
    }
    None // unreachable
  }

  /** OCC commit of a ROW-LEVEL DELTA (the DSv2 MERGE/UPDATE/row-level
    * DELETE): append executor-written insert entries and reference the
    * per-task position-delete sidecar parts, metadata-only, retrying
    * against rival appends. CONFLICT CHECKS inside the retry loop (the
    * Delta/Iceberg conflict-validation rules — both throw instead of
    * committing; the caller re-runs the statement against the new
    * snapshot):
    *
    *  1. every data file this delta marked positions in must still be
    *     referenced by the latest manifest — a rival rewrite (optimize
    *     / COW mutation) that dropped one has re-homed its rows, and
    *     committing the stale marks would silently UN-delete them;
    *  2. no sidecar ADDED since `scannedVersion` (the snapshot this
    *     statement's scan planned against) may mark positions in the
    *     files this delta marks — a rival row-level commit touching the
    *     same files means both statements matched against the same
    *     pre-image, so letting the second commit would double-apply
    *     (duplicate post-image rows, lost updates). Checking FILE
    *     intersection is conservative (position-disjoint writes to the
    *     same file also refuse) but never wrong;
    *  3. with `refuseNewFiles` (set for MERGE, whose NOT-MATCHED inserts
    *     were computed against the scanned snapshot's FULL key set): no
    *     data file may have been ADDED since `scannedVersion` — a rival
    *     append (including another MERGE's insert files) could carry
    *     keys this statement decided to insert because it did not see
    *     them, and committing would duplicate those keys (the
    *     Delta ConcurrentAppendException rule for statements that read
    *     the table). DELETE/UPDATE skip this: missing a concurrent
    *     append is write-serializable snapshot semantics, not
    *     duplication.
    *
    * Returns the new version.
    *
    * No stale-BUCKET-stamp guard is needed here (unlike
    * [[commitAdopted]]): a rival relayout rewrites every file, so a
    * delta that marked anything refuses on the dropped files (check
    * 1), a MERGE refuses on the added ones (check 3), and
    * DELETE/UPDATE always mark what they matched — every path that
    * could land stamps computed under a dead spec refuses first.
    */
  private[graft] def commitRowDelta(root: String,
      entries: Seq[FileEntry], sidecarNames: Seq[String],
      markedFiles: Set[String], scannedVersion: Int,
      maxRetries: Int = 20, refuseNewFiles: Boolean = false): Int = {
    var attempt = 0
    while (true) {
      val v = latestVersion(root)
      require(v >= 1, s"uninitialized snapshot table at $root")
      val m = manifest(root, v)
      val missing = markedFiles -- m.files.toSet
      if (missing.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"row-level delta marked positions in ${missing.mkString(", ")} " +
            "which a concurrent rewrite dropped — re-run the statement " +
            "against the new snapshot")
      if (v != scannedVersion) {
        val scanned = manifest(root, scannedVersion)
        // READ-STATE REGRESSION: a rival RESTORE (or any commit that
        // removed sidecars or changed column maps/widenings/tombstones)
        // changed the rows and schema this statement's scan SAW — both
        // its matched set and its NOT-MATCHED inserts are stale (a
        // resurrected row duplicates the insert computed against its
        // absence), so refuse regardless of what this delta marked.
        val removedDvs = scanned.dvNames.toSet -- m.dvNames.toSet
        if (removedDvs.nonEmpty || scanned.columnMaps != m.columnMaps ||
            scanned.widenings != m.widenings ||
            scanned.droppedColumns != m.droppedColumns ||
            // equality deletes change the LIVE ROW SET of every file
            // they scope over — added or removed since the scan, the
            // statement's matched/not-matched split is stale
            scanned.eqDeletes != m.eqDeletes)
          throw new java.util.ConcurrentModificationException(
            s"the table's read state changed since this statement's " +
              s"scan (v$scannedVersion → v$v: sidecars removed or " +
              "schema mappings changed — e.g. a concurrent RESTORE/" +
              "OPTIMIZE/ALTER) — re-run the statement against the new " +
              "snapshot")
        if (refuseNewFiles) {
          val added = m.files.toSet -- scanned.files.toSet
          if (added.nonEmpty)
            throw new java.util.ConcurrentModificationException(
              s"data files were added since this statement's scan " +
                s"(v$scannedVersion → v$v: e.g. ${added.take(3)
                  .mkString(", ")}) — a MERGE's NOT-MATCHED inserts " +
                "were computed against their absence; re-run the " +
                "statement against the new snapshot")
        }
        if (markedFiles.nonEmpty) {
          val newDvs = m.dvNames.toSet -- scanned.dvNames.toSet
          if (newDvs.nonEmpty) {
            val rivalMarked = graft.sources.v2.GraftDvPositions.markedFiles(
              SparkSession.active, root, newDvs.toSeq.sorted)
            val clash = rivalMarked & markedFiles
            if (clash.nonEmpty)
              throw new java.util.ConcurrentModificationException(
                s"a concurrent row-level commit marked positions in " +
                  s"${clash.mkString(", ")} after this statement's scan " +
                  s"(v$scannedVersion) — re-run the statement against " +
                  "the new snapshot")
          }
        }
      }
      try {
        val stamped = entries.map(e =>
          if (e.addedV.isEmpty) e.copy(addedV = Some(v + 1)) else e)
        commitManifest(root, v + 1, m.entries ++ stamped,
          carryMeta(m) ++ sidecarNames.sorted.map("#dv:" + _),
          Some((v, m)))
        return v + 1
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxRetries) throw e
      }
    }
    -1 // unreachable
  }

  /** O(1)-in-watermark membership check against the LATEST manifest's
    * raw batch meta (no file-section resolution, no range
    * materialization) plus legacy markers — the contended-commit replay
    * check [[appendBatch]]'s ConcurrentModificationException handler
    * needs at 10^6-commit scale.
    */
  private def isBatchCommittedLatest(root: String, batchId: Long): Boolean = {
    val latest = latestVersion(root)
    val inLatest = latest >= 1 && {
      val lines = rawLines(root, latest)
      val wm = lines.find(_.startsWith("#batchwm:"))
        .map(_.stripPrefix("#batchwm:").toLong).getOrElse(-1L)
      batchId <= wm || lines.contains(s"#batch:$batchId")
    }
    inLatest || legacyBatchIds(root).contains(batchId)
  }

  private def legacyBatchIds(root: String): Seq[Long] =
    LakeFs.listNames(manifestDir(root))
      .filter(_.startsWith("_batch"))
      .map(_.stripPrefix("_batch").toLong)

  /** The batch ids committed so far (sorted, distinct; watermark range
    * materialized) — from the LATEST manifest's cumulative batch meta
    * ONLY (the carry makes the set complete there — reading every
    * manifest would be O(versions) driver I/O per streaming commit),
    * plus legacy `_batch<id>` marker files written by the pre-atomic
    * layout.
    */
  def committedBatches(root: String): Seq[Long] = {
    val latest = latestVersion(root)
    val fromLatest =
      if (latest < 1) Seq.empty
      else {
        val lines = rawLines(root, latest)
        val wm = lines.find(_.startsWith("#batchwm:"))
          .map(_.stripPrefix("#batchwm:").toLong).getOrElse(-1L)
        (0L to wm) ++ lines.filter(_.startsWith("#batch:"))
          .map(_.stripPrefix("#batch:").toLong)
      }
    (fromLatest ++ legacyBatchIds(root)).distinct.sorted
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

  /** Zones of the CURRENT version's files ONLY (never the whole store —
    * planning must not grow with table history), from the MANIFEST's
    * commit-time stats where stamped (zero footer I/O — the production
    * planning path) and parquet footers for the rest, with the
    * conservative contract: a file whose stats are missing or unusable
    * plans as `None` = must-touch, never an error.
    */
  private def planZones(spark: SparkSession, root: String,
      m: ManifestData, column: String)
      : Map[String, Option[(Long, Long)]] = {
    val (stamped, missing) = m.entries.partition(_.zones.contains(column))
    val fromManifest = stamped.map(e => e.name -> Some(e.zones(column)))
    val fromFooters =
      if (missing.isEmpty) Seq.empty
      else Bucketing.fileZones(spark,
        missing.map(e => s"${filesDir(root)}/${e.name}"), column)
        .map { case (name, _, z) => name -> z }
    (fromManifest ++ fromFooters).toMap
  }

  private def requireNoMappings(m: ManifestData, op: String): Unit =
    require(!m.hasMappings,
      s"$op plans zones on PHYSICAL columns; run optimize first to " +
        "materialize pending column renames/widenings")

  /** Refuse evolving a column a LIVE equality-delete keys on — the key
    * sets were written under this name and type, and reads resolve them
    * by name; optimize folds the sidecars first.
    */
  private def requireNoLiveEq(m: ManifestData, column: String,
      op: String): Unit = {
    val live = m.eqDeletes.filter(_.keyCol == column)
    require(live.isEmpty,
      s"$op: '$column' is the key of ${live.size} live equality-delete " +
        s"sidecar(s) (e.g. ${live.take(2).map(_.name).mkString(", ")}) " +
        "— run optimize first to fold them")
  }

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
    * a new version. Files are planned from their manifest/footer zone (no
    * data scan): a file whose [min,max] misses the range is re-referenced
    * verbatim (zero I/O); the intersecting files are read as ONE frame
    * (position deletes applied, so merge-on-read rows never resurrect),
    * filtered, and rewritten as `touched.size` range-sorted files in ONE
    * Spark job — not a per-file driver loop. Live dv sidecars carry
    * forward verbatim: rewritten files get fresh UUID names the stale
    * positions can never re-match, untouched files keep their deletes.
    *
    * On a BUCKETED layout the rewritten files land unstamped (a global
    * range-sorted rewrite cannot inherit per-bucket purity), so the
    * storage-partitioned-join report disables soundly until the next
    * relayout — prefer the MoR [[deletePositions]] there, which
    * touches no data file and keeps every stamp.
    */
  def deleteRange(spark: SparkSession, root: String, column: String,
      lo: Long, hi: Long,
      blockSize: Int = DefaultBlockSize): DeleteResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "deleteRange")
    val zones = planZones(spark, root, m, column)
    val (touched, untouched) = m.entries.partition { e =>
      zones(e.name) match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true // statless file: cannot prove it misses
      }
    }
    val newEntries =
      if (touched.isEmpty) Seq.empty
      else {
        val df = readFiles(spark, root, m, touched.map(_.name),
          keepPos = false)
        val micros = microsOf(df, column)
        // null-safe: a NULL key is outside any range and must be KEPT —
        // a bare !(cond) would evaluate NULL and silently drop the row
        val kept = df.where(micros.isNull ||
          !(micros >= lit(lo) && micros < lit(hi)))
        if (kept.isEmpty) Seq.empty
        else writeNewFiles(spark, root, v + 1, "delete", kept, column,
          touched.size, blockSize)
      }
    commitManifest(root, v + 1, untouched ++ newEntries, carryMeta(m),
      Some((v, m)))
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
    val zones = planZones(spark, root, m, column)
    val touched = m.files.filter { n =>
      zones(n) match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true
      }
    }
    if (touched.isEmpty) {
      commitManifest(root, v + 1, m.entries, carryMeta(m), Some((v, m)))
      return MorDeleteResult(v + 1, 0L, 0, None)
    }
    // probe the LIVE view (dv + equality deletes applied inside
    // readFiles), so new marks are always fresh and sidecars stay
    // DISJOINT — the exactly-once invariant the change feed needs
    val df = readFiles(spark, root, m, touched, keepPos = true)
    val micros = microsOf(df, column)
    val fresh = df.where(micros >= lit(lo) && micros < lit(hi))
      .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
    val sidecar = writeSidecarFile(spark, root, v, fresh)
    commitManifest(root, v + 1, m.entries,
      carryMeta(m) ++ sidecar.map(s => s"#dv:${s._1}"), Some((v, m)))
    MorDeleteResult(v + 1, sidecar.map(_._2).getOrElse(0L), touched.size,
      sidecar.map(_._1))
  }

  /** KEY-BASED merge-on-read delete — the GDPR erasure shape ("delete
    * every row of user X"): mark the positions of all rows whose
    * `keyCol` appears in `keys` (any multiplicity), across the whole
    * table, as one position-delete sidecar. Zone planning still helps
    * when it can: files whose `keyCol` zone misses the key batch's
    * [min, max] envelope are skipped outright; the rest get a
    * COLUMN-PRUNED probe (key column + row index only) with the keys
    * broadcast — on a time-sorted table the key zones are wide and the
    * probe honestly touches most files, but it reads one thin column,
    * not the data. A key batch whose values are non-numeric (no usable
    * envelope) probes every file rather than silently skipping. Zero
    * files rewritten either way; [[optimize]] folds the marks later.
    */
  def deletePositionsByKey(spark: SparkSession, root: String,
      keyCol: String, keys: DataFrame): MorDeleteResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "deletePositionsByKey")
    if (keys.isEmpty) {
      commitManifest(root, v + 1, m.entries, carryMeta(m), Some((v, m)))
      return MorDeleteResult(v + 1, 0L, 0, None)
    }
    val touched = keyEnvelopeTouched(spark, root, m, keyCol, keys)
    if (touched.isEmpty) {
      commitManifest(root, v + 1, m.entries, carryMeta(m), Some((v, m)))
      return MorDeleteResult(v + 1, 0L, 0, None)
    }
    // live-view probe (dv + eq applied in readFiles): Catalyst prunes
    // the scan to (key, position) below the joins, and the marks stay
    // disjoint from every existing sidecar
    val probe = readFiles(spark, root, m, touched, keepPos = true)
      .select(col(keyCol), col("__dv_file").as("file"),
        col("__dv_pos").as("pos"))
    val fresh = probe
      .join(broadcast(keys.select(col(keyCol)).distinct()), Seq(keyCol),
        "left_semi")
      .select(col("file"), col("pos"))
    val sidecar = writeSidecarFile(spark, root, v, fresh)
    commitManifest(root, v + 1, m.entries,
      carryMeta(m) ++ sidecar.map(s => s"#dv:${s._1}"), Some((v, m)))
    MorDeleteResult(v + 1, sidecar.map(_._2).getOrElse(0L), touched.size,
      sidecar.map(_._1))
  }

  /** The files a key batch might touch: zone-skip on the batch's
    * [min, max] key envelope when the keys are numeric; EVERY file when
    * they are not (a non-numeric key has no envelope — skipping would be
    * silent data corruption, not an optimization).
    */
  private def keyEnvelopeTouched(spark: SparkSession, root: String,
      m: ManifestData, keyCol: String, keys: DataFrame): Seq[String] = {
    val bounds = keys.agg(min(microsOf(keys, keyCol)),
      max(microsOf(keys, keyCol))).head()
    if (bounds.isNullAt(0)) m.files
    else {
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val zones = planZones(spark, root, m, keyCol)
      m.files.filter { n =>
        zones(n) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }
  }

  /** Write `fresh` (file, pos) as ONE sidecar — a parquet directory
    * PARTITIONED BY TARGET FILE (`<name>/file=<dataFile>/part-*`), so
    * (a) the write is executor-parallel with no single-task funnel (a
    * GDPR-scale erasure's positions never serialize through one
    * writer), and (b) a reader of data file F opens exactly F's
    * positions — an existence probe plus O(F's marks) bytes, never the
    * whole mark set. One repartition by file bounds the layout at one
    * part per (file, task). Legacy single-file sidecars
    * (`dv_*.parquet`) stay readable everywhere via [[dvRead]].
    * Returns (sidecar name, rows marked); None when empty.
    */
  /** Position-range width of one encode segment: the per-(file,
    * segment) `collect_list` below is bounded at this many positions
    * per task row (~32 MB of longs), so even a file whose ENTIRE
    * position space is marked encodes in bounded memory — the chunked-
    * encode escape hatch for straddling files beyond the single-task
    * bound other per-file-DV formats carry.
    */
  private[graft] val SidecarSegmentPositions: Long = 4L * 1024 * 1024

  /** Write a `(file, pos)` delete frame as a PARTITIONED sidecar of
    * per-file COMPRESSED BITMAPS: each `file=<dataFile>` directory
    * holds one-row parquet `(card, blob)` parts — the [[GraftBitmap]]
    * run-length encoding, ~100× smaller than `(file, pos)` rows at
    * range-erasure scale. Positions aggregate per (file, POSITION-RANGE
    * SEGMENT) — `collect_list` is bounded at [[SidecarSegmentPositions]]
    * positions per task row, so no file can exceed task memory however
    * many marks it takes (segments are disjoint ranges: every part is
    * an independent bitmap, and readers union parts per file). `card`
    * is derived from the encoded blob's own header, so duplicate
    * `(file, pos)` input rows (the codec collapses them — set
    * semantics) can never inflate the stored count. Returns the
    * sidecar name and total distinct marks.
    */
  private[graft] def writeSidecarFile(spark: SparkSession, root: String,
      v: Int, fresh: DataFrame,
      segmentPositions: Long = SidecarSegmentPositions)
      : Option[(String, Long)] = {
    val name = s"dv_v${v + 1}_${uuid8()}"
    val dir = s"${deletesDir(root)}/$name"
    val enc = udf((ps: Seq[Long]) => GraftBitmap.encode(ps.toArray))
    val cardOf = udf((b: Array[Byte]) => GraftBitmap.cardinality(b))
    fresh.groupBy(col("file"),
        floor(col("pos") / lit(segmentPositions)).as("__seg"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .select(col("file"), enc(col("ps")).as("blob"))
      .select(col("file"), cardOf(col("blob")).as("card"), col("blob"))
      .write.partitionBy("file").parquet(dir)
    if (LakeFs.listDirNames(dir).isEmpty) { // zero rows: no partitions
      LakeFs.deleteRecursively(dir)
      None
    } else {
      val n = spark.read.parquet(dir)
        .agg(coalesce(sum(col("card")), lit(0L))).head().getLong(0)
      Some((name, n))
    }
  }

  /** Uniform (file, pos) read over any mix of sidecar layouts: legacy
    * single parquet files, partitioned ROW directories (`file=` dirs of
    * `pos` rows), and partitioned BITMAP directories (`file=` dirs of
    * one-row `(card, blob)` parts — decoded and exploded). One scan per
    * sidecar, unioned — sidecar counts are bounded by compaction
    * cadence, never by data size.
    */
  private[graft] def dvRead(spark: SparkSession, root: String,
      names: Seq[String]): DataFrame = {
    require(names.nonEmpty, "dvRead needs at least one sidecar")
    // bitmaps decode to BOUNDED run chunks (≤64k positions each) and
    // expand via sequence() — a 10^9-position erasure never
    // materializes its flat position array in any single task row
    val runs = udf((b: Array[Byte]) =>
      GraftBitmap.decodeRunChunks(b, 64 * 1024))
    names.sorted.map { n =>
      val df = spark.read.parquet(s"${deletesDir(root)}/$n")
      if (df.columns.contains("blob"))
        df.select(col("file").cast("string").as("file"),
          explode(runs(col("blob"))).as("run"))
          .select(col("file"), explode(sequence(col("run._1"),
            col("run._1") + col("run._2").cast("long") - 1)).as("pos"))
      else
        df.select(col("file").cast("string").as("file"), col("pos"))
    }.reduce(_ unionAll _)
  }

  // ---------------------------------------------------------------------
  // SQL row-level DELETE (the DSv2 SupportsDelete surface)
  // ---------------------------------------------------------------------

  /** Result of a SQL (`DELETE FROM ... WHERE`) delete: the new version,
    * files DROPPED from the manifest because their stats prove every
    * row matches (metadata-only — zero data bytes read for them), files
    * PROBED exactly for matching positions (predicate straddles their
    * zone), positions marked in the resulting sidecar, and the sidecar
    * name (None when no straddler held a matching live row).
    */
  case class SqlDeleteResult(version: Int, droppedFiles: Int,
      probedFiles: Int, markedPositions: Long, sidecar: Option[String])

  /** The column dataTypes whose filter literals [[deleteWhereFilters]]
    * can rebuild exactly as Catalyst comparisons.
    */
  private val deletableTypes: Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Set(LongType, IntegerType, ShortType, ByteType, DoubleType,
      FloatType, BooleanType, StringType, TimestampType, DateType)
  }

  private def filterColumns(f: org.apache.spark.sql.sources.Filter)
      : Seq[String] = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(c, _) => Seq(c)
      case GreaterThan(c, _) => Seq(c)
      case GreaterThanOrEqual(c, _) => Seq(c)
      case LessThan(c, _) => Seq(c)
      case LessThanOrEqual(c, _) => Seq(c)
      case In(c, _) => Seq(c)
      case IsNull(c) => Seq(c)
      case IsNotNull(c) => Seq(c)
      case And(l, r) => filterColumns(l) ++ filterColumns(r)
      case Or(l, r) => filterColumns(l) ++ filterColumns(r)
      case AlwaysTrue() | AlwaysFalse() => Seq.empty
      case _ => Seq(" unsupported") // no real column has a space: refuses
    }
  }

  /** Whether [[deleteWhereFilters]] can apply `filters` EXACTLY: no
    * pending column mappings (zones/probes are physical), every filter
    * shape known, every referenced column present with a rebuildable
    * literal type. The DSv2 `canDeleteWhere` answer — false routes
    * Spark to an error (or a row-level rewrite plan) instead of a
    * silently-partial delete.
    */
  private[graft] def canDeleteWhere(spark: SparkSession, root: String,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : Boolean = {
    val v = latestVersion(root)
    if (v < 1) return false
    if (manifest(root, v).hasMappings) return false
    // the caller's already-resolved logical schema (the DSv2 table's)
    // avoids plan-time footer I/O; the fallback builds the read frame
    val schema = schemaHint.getOrElse(read(spark, root, v).schema)
    filters.flatMap(filterColumns).forall(c =>
      schema.fields.exists(f => f.name == c &&
        deletableTypes.contains(f.dataType)))
  }

  /** One v1 Filter tree → the EXACT Catalyst condition over `df` —
    * timestamps compare in micros (the representation filter literals
    * arrive in from the V2 predicate translation), everything else as
    * typed literals. SQL DELETE semantics: a row deletes iff the
    * condition is TRUE, so NULL comparisons keep the row (Catalyst's
    * three-valued `where` does exactly that).
    */
  private def filterCondition(df: DataFrame,
      f: org.apache.spark.sql.sources.Filter): Column = {
    import org.apache.spark.sql.sources._
    def side(c: String, v: Any): (Column, Column) =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          val micros = v match {
            case l: Long => l
            case t: java.sql.Timestamp =>
              Math.floorDiv(t.getTime, 1000L) * 1000000L +
                t.getNanos / 1000L
            case i: java.time.Instant =>
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            case other => sys.error(
              s"unsupported timestamp literal $other for column $c")
          }
          (unix_micros(col(c)), lit(micros))
        case org.apache.spark.sql.types.DateType =>
          val days = v match {
            case i: Int => i
            case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
            case d: java.time.LocalDate => d.toEpochDay.toInt
            case other => sys.error(
              s"unsupported date literal $other for column $c")
          }
          (datediff(col(c), lit(java.sql.Date.valueOf("1970-01-01"))),
            lit(days))
        case _ => (col(c), lit(v))
      }
    f match {
      case EqualTo(c, v) =>
        val (l, r) = side(c, v); l === r
      case GreaterThan(c, v) => val (l, r) = side(c, v); l > r
      case GreaterThanOrEqual(c, v) => val (l, r) = side(c, v); l >= r
      case LessThan(c, v) => val (l, r) = side(c, v); l < r
      case LessThanOrEqual(c, v) => val (l, r) = side(c, v); l <= r
      case In(c, vs) =>
        if (vs.isEmpty) lit(false)
        else vs.toSeq.map(v => { val (l, r) = side(c, v); l === r })
          .reduce(_ || _)
      case IsNull(c) => col(c).isNull
      case IsNotNull(c) => col(c).isNotNull
      case And(l, r) => filterCondition(df, l) && filterCondition(df, r)
      case Or(l, r) => filterCondition(df, l) || filterCondition(df, r)
      case AlwaysTrue() => lit(true)
      case AlwaysFalse() => lit(false)
      case other => sys.error(s"unsupported delete filter $other")
    }
  }

  /** SQL row-level DELETE (`DELETE FROM t WHERE <conjunction>`) against
    * the LATEST version, with the three-tier plan every production
    * format converges on:
    *
    *  1. files whose stats PROVE no row matches ([[graft.sources.v2
    *     .GraftZonePrune.mightMatch]] false) are re-referenced verbatim
    *     — zero I/O;
    *  2. files whose stats PROVE every row matches
    *     ([[graft.sources.v2.GraftZonePrune.mustMatch]]: zone bounds
    *     inside the predicate AND a stamped ZERO null count — nulls
    *     fail comparisons and must be kept) are DROPPED from the
    *     manifest — a metadata-only whole-file delete, zero data bytes
    *     read (the Delta/Iceberg "fully-covered file" fast path);
    *  3. straddling files take the merge-on-read path: an exact
    *     position probe (the predicate re-evaluated on the rows) marks
    *     matches in ONE sidecar, existing marks anti-joined away so
    *     sidecars stay disjoint.
    *
    * The filters are a CONJUNCTION (the DSv2 deleteWhere contract).
    * At 100 TB this split is the delete economics: a retention sweep
    * (`WHERE ts < cutoff`) on a time-sorted table drops almost every
    * touched file as pure metadata and probes only the cutoff-boundary
    * file.
    */
  private[graft] def deleteWhereFilters(spark: SparkSession, root: String,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : SqlDeleteResult = {
    import graft.sources.v2.GraftZonePrune
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "deleteWhere")
    val (dropped, kept) = m.entries.partition(e =>
      filters.nonEmpty && filters.forall(f =>
        GraftZonePrune.mustMatch(e, f)))
    // provably-empty entries (rows=0 commit stats — schema seeds) hold
    // no position to mark and never probe
    val straddle = kept.filter(e => !e.rows.contains(0L) &&
      filters.forall(f => GraftZonePrune.mightMatch(e, f)))
    val sidecar =
      if (straddle.isEmpty) None
      else {
        // live-view probe (dv + equality deletes applied in readFiles)
        val df = readFiles(spark, root, m, straddle.map(_.name),
          keepPos = true)
        val cond = filters.map(f => filterCondition(df, f))
          .reduceOption(_ && _).getOrElse(lit(true))
        val fresh = df.where(cond)
          .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
        writeSidecarFile(spark, root, v, fresh)
      }
    // a delete that drops EVERY file must leave a schema-bearing seed
    // (a zero-file version is unreadable: the table's schema lives in
    // its files)
    val newEntries =
      if (kept.nonEmpty) kept
      else adoptEntries(spark, root, v + 1, "delseed", Seq.empty)(tmp =>
        read(spark, root, v).limit(0).coalesce(1).write.parquet(tmp))
    commitManifest(root, v + 1, newEntries,
      carryMeta(m) ++ sidecar.map(s => s"#dv:${s._1}"), Some((v, m)))
    SqlDeleteResult(v + 1, dropped.size, straddle.size,
      sidecar.map(_._2).getOrElse(0L), sidecar.map(_._1))
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
    * carry the table's sort column (`zoneCol`), so files whose zone
    * misses the batch's [min, max] SHOULD contain no matches. That
    * is a layout invariant, not a law — a matched key whose stored row
    * drifted outside the batch's zone would silently survive next to its
    * replacement. So by default the zone plan is VERIFIED: a key-column
    * probe (column-pruned scan of the out-of-zone files, broadcast
    * semi-join against the batch keys, live position deletes applied so
    * a MoR-deleted match cannot promote a file for nothing) promotes any
    * file that actually holds a matched key into the rewrite set —
    * correctness never depends on the invariant, only the probe's cost
    * does. Callers whose layout guarantees the invariant (zoneCol ==
    * keyCol, or append-only keys) pass `trustZones = true` to skip the
    * probe.
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
      commitManifest(root, v + 1, m.entries, carryMeta(m), Some((v, m)))
      return UpsertResult(v + 1, 0, m.files.size, 0L)
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val zones = planZones(spark, root, m, zoneCol)
    val (zoneTouched, zoneMissed) = m.entries.partition { e =>
      zones(e.name) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    // verify the zone plan: promote out-of-zone files that hold a LIVE
    // matched key (key column + position only — column-pruned; position
    // and equality deletes applied so a deleted row cannot promote its
    // file)
    val promoted: Set[String] =
      if (trustZones || zoneMissed.isEmpty) Set.empty
      else {
        val live = readFiles(spark, root, m, zoneMissed.map(_.name),
          keepPos = true)
        val probe = live
          .select(col(keyCol), col("__dv_file").as("__f"))
          .join(broadcast(updates.select(col(keyCol)).distinct()),
            Seq(keyCol), "left_semi")
        probe.select(col("__f")).distinct()
          .collect().map(_.getString(0)).toSet
      }
    val touched = zoneTouched ++ zoneMissed.filter(e => promoted(e.name))
    val untouched = zoneMissed.filterNot(e => promoted(e.name))
    val nUpd = updates.count()
    val keptEntries =
      if (touched.isEmpty) Seq.empty
      else {
        val tgt = readFiles(spark, root, m, touched.map(_.name),
          keepPos = false)
        val kept = tgt.join(broadcast(updates.select(col(keyCol))),
          Seq(keyCol), "left_anti")
        if (kept.isEmpty) Seq.empty
        else writeNewFiles(spark, root, v + 1, "kept", kept, zoneCol,
          math.max(1, touched.size), blockSize)
      }
    val updEntries = writeNewFiles(spark, root, v + 1, "upsert",
      updates, zoneCol, 1, blockSize)
    commitManifest(root, v + 1, untouched ++ keptEntries ++ updEntries,
      carryMeta(m), Some((v, m)))
    UpsertResult(v + 1, touched.size, untouched.size, nUpd)
  }

  /** Result of a merge-on-read MERGE: the new version, positions marked
    * (matched target rows retracted via sidecar), update rows appended,
    * files probed for matches, and the sidecar name (None when the batch
    * matched nothing).
    */
  case class MorUpsertResult(version: Int, markedPositions: Long,
      appended: Long, touchedFiles: Int, sidecar: Option[String])

  /** MERGE-ON-READ MERGE (the Iceberg v2 upsert shape): instead of
    * rewriting every file holding a matched key ([[upsert]],
    * copy-on-write), mark the matched rows' positions in ONE sidecar and
    * APPEND the update rows as fresh files — one commit, ZERO existing
    * files rewritten. The read (old rows anti-joined against the marks,
    * plus the appended rows) is row-for-row the COW upsert's result;
    * [[optimize]] folds the marks physically, exactly like the MoR
    * deletes. Matched positions are found with the
    * [[deletePositionsByKey]] probe: key-envelope zone skip where the
    * keys are numeric, a column-pruned broadcast semi-join probe over the
    * rest; rows already dv-marked stay deleted (their keys' update rows
    * simply insert — MERGE semantics over the LIVE table).
    *
    * At 100 TB this is the MERGE economics that matter: a 10-row upsert
    * into 10 wide files costs 10 file rewrites under COW but one KB
    * sidecar + one KB append here — why Iceberg v2 made it the default
    * MERGE mode for high-churn tables.
    */
  def upsertPositions(spark: SparkSession, root: String, keyCol: String,
      zoneCol: String, updates: DataFrame,
      blockSize: Int = DefaultBlockSize): MorUpsertResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "upsertPositions")
    val nUpd = updates.count()
    if (nUpd == 0L) {
      commitManifest(root, v + 1, m.entries, carryMeta(m), Some((v, m)))
      return MorUpsertResult(v + 1, 0L, 0L, 0, None)
    }
    val touched = keyEnvelopeTouched(spark, root, m, keyCol, updates)
    val sidecar =
      if (touched.isEmpty) None // pure insert: no position can match
      else {
        // live-view probe: dv + equality deletes applied in readFiles,
        // so marks stay disjoint from every existing sidecar
        val probe = readFiles(spark, root, m, touched, keepPos = true)
          .select(col(keyCol), col("__dv_file").as("file"),
            col("__dv_pos").as("pos"))
        val fresh = probe
          .join(broadcast(updates.select(col(keyCol)).distinct()),
            Seq(keyCol), "left_semi")
          .select(col("file"), col("pos"))
        writeSidecarFile(spark, root, v, fresh)
      }
    val updEntries = writeNewFiles(spark, root, v + 1, "morup", updates,
      zoneCol, 1, blockSize)
    commitManifest(root, v + 1, m.entries ++ updEntries,
      carryMeta(m) ++ sidecar.map(s => s"#dv:${s._1}"), Some((v, m)))
    MorUpsertResult(v + 1, sidecar.map(_._2).getOrElse(0L), nUpd,
      touched.size, sidecar.map(_._1))
  }

  /** Result of an equality-delete MERGE: the new version, distinct keys
    * the sidecar carries, rows appended, and the sidecar name.
    */
  case class EqUpsertResult(version: Int, keys: Long, appended: Long,
      sidecar: Option[String])

  /** EQUALITY-DELETE MERGE — the streaming-upsert commit whose cost is
    * O(batch), ZERO target I/O: instead of PROBING the target for
    * matched positions ([[upsertPositions]] — a column-pruned scan
    * whose cost grows with TABLE size), commit the batch's KEY SET as
    * an equality-delete sidecar plus the batch rows as fresh files.
    * Reads apply the key set below the dv anti-join to every file
    * ADDED BEFORE this commit (the `av=` scoping — the upsert's own
    * insert files and all later appends are exempt), so the read
    * result is row-for-row the positional MERGE's; [[optimize]] folds
    * the sidecar exactly like position deletes (the rewrite reads
    * through [[readFiles]]), and [[compactSidecars]]-style maintenance
    * is unnecessary — optimize retires `#eq:` lines wholesale.
    *
    * At 100 TB this is the CDC-ingest economics (the Iceberg v2
    * equality-delete file): a MERGE-per-minute pipeline must commit at
    * batch cost, not table cost — 1440 commits a day that each scan
    * the fact table would BE the cluster's workload.
    *
    * Key column: LONG or STRING, not renamed/widened/dropped while the
    * sidecar lives (the evolution verbs refuse — run optimize first).
    */
  def upsertEquality(spark: SparkSession, root: String, keyCol: String,
      zoneCol: String, updates: DataFrame,
      blockSize: Int = DefaultBlockSize): EqUpsertResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    requireNoMappings(m, "upsertEquality")
    import org.apache.spark.sql.types._
    updates.schema(keyCol).dataType match {
      case LongType | StringType => ()
      case dt => sys.error(
        s"upsertEquality keys must be BIGINT or STRING, got $dt for " +
          s"'$keyCol'")
    }
    val nUpd = updates.count()
    if (nUpd == 0L) {
      commitManifest(root, v + 1, m.entries, carryMeta(m), Some((v, m)))
      return EqUpsertResult(v + 1, 0L, 0L, None)
    }
    val name = s"eq_v${v + 1}_${uuid8()}"
    val keysDf = updates.select(col(keyCol).as("k")).distinct()
    val nKeys = keysDf.count() // before the write: zero read-back I/O
    keysDf.write.parquet(s"${deletesDir(root)}/$name")
    // CDC ingest composes with storage-partitioned joins: on a
    // bucketed table the batch's insert files split per bucket id and
    // stamp `k=`, so a MERGE-per-minute pipeline never degrades the
    // fact join back to a two-sided shuffle
    val updEntries = m.bucketSpec.filter { case (c, _) =>
      updates.schema.fieldNames.contains(c) &&
        (updates.schema(c).dataType match {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        })
    } match {
      case Some((c, n)) => writeNewFilesBucketed(spark, root, v + 1,
        "equp", updates, zoneCol, blockSize, c, n)
      case None => writeNewFiles(spark, root, v + 1, "equp", updates,
        zoneCol, 1, blockSize)
    }
    commitManifest(root, v + 1, m.entries ++ updEntries,
      carryMeta(m) :+ EqDelete(name, keyCol, v + 1).render,
      Some((v, m)))
    EqUpsertResult(v + 1, nKeys, nUpd, Some(name))
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
    requireNoLiveEq(m, oldName, "RENAME COLUMN")
    // the `#stats:` default follows the rename IN THE SAME COMMIT — the
    // rename and the stats repair are one atomic manifest create, so no
    // crash window can leave the default naming a column the schema no
    // longer has (the legacy props-file follow-up in the catalog is
    // best-effort sync for pre-feature readers only)
    val meta = carryMeta(m).map { l =>
      if (l.startsWith("#stats:"))
        "#stats:" + l.stripPrefix("#stats:").split(",").toSeq
          .map(c => if (c.trim == oldName) newName else c.trim)
          .mkString(",")
      // the bucket layout FOLLOWS the rename in the same atomic commit:
      // the `k=` stamps are layout facts independent of the column's
      // name, so the spec tracks the logical name and SPJ stays alive
      // (leaving the old name would silently disable the report — the
      // scan requires the spec's column in its output)
      else if (l.startsWith(s"#bucket:$oldName="))
        s"#bucket:$newName=" + l.stripPrefix(s"#bucket:$oldName=")
      else l
    } :+ s"#map:$oldName=$newName"
    commitManifest(root, v + 1, m.entries, meta, Some((v, m)))
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
    requireNoLiveEq(m, column, "ALTER COLUMN TYPE")
    commitManifest(root, v + 1, m.entries,
      carryMeta(m) :+ s"#widen:$column=$toType", Some((v, m)))
    v + 1
  }

  /** Metadata-only logical DROP COLUMN: commits a `#drop:` tombstone —
    * the current schema hides the column at read time, physical data
    * stays in place, and every earlier version still serves it through
    * time travel (the missing quarter of the evolution surface next to
    * RENAME/widen/ADD). Refused for the table's zone/stats columns —
    * dropping the pruning key would strand the layout the scans plan
    * against — and for the last remaining column. The tombstone is
    * PERMANENT: re-adding the name is refused at the catalog, because a
    * name-mapped format (no Iceberg-style field ids) cannot tell a
    * re-added column from retained physical values in files written
    * before the drop. `optimize`/Z-ORDER materialize the drop
    * physically (the rewrite reads the hidden-column view) but KEEP the
    * tombstone as the refusal record.
    */
  def dropColumn(spark: SparkSession, root: String, column: String): Int = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    val schema = read(spark, root, v).schema
    require(schema.fieldNames.contains(column),
      s"DROP COLUMN: no column '$column' in " +
        schema.fieldNames.sorted.mkString("[", ", ", "]"))
    require(schema.length > 1,
      s"DROP COLUMN: cannot drop the last column '$column'")
    require(!statsColsProp(root).contains(column),
      s"DROP COLUMN: '$column' is a stats column (the table's zone/" +
        "pruning key) — re-sort the table on another column first")
    require(!m.entries.exists(e =>
      e.zones.contains(column) || e.szones.contains(column)),
      s"DROP COLUMN: '$column' carries commit-time zone stats (the " +
        "pruning key of existing files) — optimize onto another sort " +
        "column first")
    requireNoLiveEq(m, column, "DROP COLUMN")
    // dropping the bucket column retires the bucket layout with it (a
    // spec naming a hidden column could never be reported anyway —
    // this keeps the manifest from carrying a dangling claim)
    val meta = carryMeta(m).filterNot(l =>
      l.startsWith(s"#bucket:$column="))
    commitManifest(root, v + 1, m.entries,
      meta :+ s"#drop:$column", Some((v, m)))
    v + 1
  }

  /** RESTORE the table to an earlier version's state — the Delta
    * `RESTORE TABLE ... TO VERSION AS OF` verb: commits a NEW version
    * whose file set and read-state metadata (`#dv:`/`#map:`/`#widen:`/
    * `#drop:` lines) are the target version's, metadata-only (zero
    * data I/O — the files are still there; that is what snapshots
    * bought). History is preserved, not rewritten: the bad versions
    * stay time-travelable between the target and the restore commit,
    * and the restore itself is one more OCC commit on top.
    *
    * The CURRENT version's idempotence state (`#batch`/`#txn:` lines)
    * carries INSTEAD of the target's older view — restoring data must
    * not reopen a streaming sink's replay window (an epoch committed
    * after the target would otherwise re-commit as a "first" write).
    *
    * Refused when [[vacuum]] already reclaimed any file or sidecar the
    * target references — a restore either serves the exact old state
    * or does not happen.
    */
  def restore(spark: SparkSession, root: String, toVersion: Int): Int = {
    val cur = latestVersion(root)
    require(cur >= 1, s"uninitialized snapshot table at $root")
    require(toVersion >= 1 && toVersion <= cur,
      s"RESTORE: version $toVersion outside [1, $cur]")
    require(LakeFs.exists(manifestPath(root, toVersion)),
      s"RESTORE: version $toVersion was vacuumed from history at $root")
    val tgt = manifest(root, toVersion)
    val missing = tgt.entries.filterNot(e =>
      LakeFs.exists(s"${filesDir(root)}/${e.name}"))
    require(missing.isEmpty,
      s"RESTORE: ${missing.size} data files of v$toVersion were " +
        s"reclaimed by vacuum (e.g. ${missing.take(3).map(_.name)
          .mkString(", ")})")
    val missingDv = (tgt.dvNames ++ tgt.eqDeletes.map(_.name))
      .filterNot(n => LakeFs.exists(s"${deletesDir(root)}/$n"))
    require(missingDv.isEmpty,
      s"RESTORE: ${missingDv.size} delete sidecars of v$toVersion were " +
        s"reclaimed by vacuum (${missingDv.take(3).mkString(", ")})")
    val m = manifest(root, cur)
    val idem = m.meta.filter(l =>
      l.startsWith("#batch") || l.startsWith("#txn:"))
    val meta = tgt.meta.filterNot(l =>
      l.startsWith("#batch") || l.startsWith("#txn:")) ++ idem
    commitManifest(root, cur + 1, tgt.entries, meta, Some((cur, m)))
    // TOCTOU guard: a concurrent vacuum planned against the PRE-restore
    // latest could reclaim target-only files between the existence
    // checks above and the commit (it never sees cur+1 as live). Re-
    // verify AFTER the commit; on loss, roll FORWARD to the pre-restore
    // state (one more metadata commit — its files are still referenced
    // by cur, which every vacuum keeps when it keeps cur) and refuse,
    // so no committed version ever serves dangling references.
    val lostData = tgt.entries.filterNot(e =>
      LakeFs.exists(s"${filesDir(root)}/${e.name}")).map(_.name)
    val lostDv = (tgt.dvNames ++ tgt.eqDeletes.map(_.name))
      .filterNot(n => LakeFs.exists(s"${deletesDir(root)}/$n"))
    if (lostData.nonEmpty || lostDv.nonEmpty) {
      val mR = manifest(root, cur + 1)
      commitManifest(root, cur + 2, m.entries, m.meta,
        Some((cur + 1, mR)))
      throw new IllegalStateException(
        s"RESTORE to v$toVersion lost a race with vacuum: " +
          s"${(lostData ++ lostDv).take(3).mkString(", ")} reclaimed " +
          s"after the pre-commit checks — rolled forward to the " +
          s"pre-restore state as v${cur + 2}")
    }
    // `#stats:` meta restores ATOMICALLY with the manifest (it IS the
    // target's carried line). Only pre-feature tables (no `#stats:`)
    // still keep the default in `_props.txt`, where a restore across a
    // rename can leave it naming a column absent from the restored
    // schema. Walk each missing name BACK through the pre-restore
    // rename chain to the name the restored schema actually has; drop
    // it if nothing matches (visible degradation beats a silent wrong
    // name).
    if (manifest(root, cur + 1).statsColsMeta.isEmpty) {
      val prop = statsColsProp(root)
      if (prop.nonEmpty) {
        val restoredCols =
          read(spark, root, cur + 1).schema.fieldNames.toSet
        if (!prop.forall(restoredCols.contains)) {
          val fixed = prop.flatMap(s =>
            if (restoredCols.contains(s)) Some(s)
            else graft.sources.v2.ParquetRowReader
              .physicalCandidates(s, m.columnMaps)
              .find(restoredCols.contains))
          val p = propsPath(root)
          val lines = LakeFs.readString(p).split("\n").toSeq
          val updated = lines.flatMap { l =>
            if (!l.trim.startsWith("stats=")) Some(l)
            else if (fixed.isEmpty) None
            else Some(s"stats=${fixed.mkString(",")}")
          }
          LakeFs.replaceAtomic(p, updated.mkString("\n"))
        }
      }
    }
    cur + 1
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
    val entries = writeNewFiles(spark, root, v + 1, "opt",
      read(spark, root, v), sortCol, nFiles, blockSize)
    commitManifest(root, v + 1, entries, idempotenceMeta(m), Some((v, m)))
    v + 1
  }

  /** The metadata a REWRITE commit (optimize / z-order) must carry even
    * though it folds sidecars and materializes column maps: the
    * exactly-once state — `#batch`/`#batchwm` ids AND the per-query
    * `#txn:` high-water marks. Dropping the txn marks would erase a
    * streaming sink's replay protection: maintenance between epochs, a
    * query restart, and the replayed epoch re-commits as a "first"
    * write, duplicating rows.
    */
  private def idempotenceMeta(m: ManifestData): Seq[String] =
    m.meta.filter(l => l.startsWith("#batch") || l.startsWith("#txn:") ||
      l.startsWith("#drop:") || // tombstones outlive the rewrite: they
      // are the re-add refusal record, not a read-time mapping
      l.startsWith("#stats:")) // the zone-stamping default is table
      // state, not a read-time mapping — a rewrite must not reset it

  /** Result of an incremental bin-pack: the new version, small files
    * rewritten, files re-referenced verbatim (right-sized files, plus
    * — on a bucketed layout — any bucket's LONE small file, which a
    * solo rewrite could not improve), and the version's file count
    * after packing.
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
    * zone-planned mutation. File sizes come from the manifest's
    * commit-time stats (fs-stat fallback for pre-stats entries).
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
    val sized = m.entries.map(e => e -> e.bytes.getOrElse(
      LakeFs.fileLength(s"${filesDir(root)}/${e.name}")))
    val (small, big) = sized.partition(_._2 < targetBytes)
    if (small.size <= 1) { // nothing to pack: 0 or 1 undersized file
      commitManifest(root, v + 1, m.entries, carryMeta(m), Some((v, m)))
      return BinPackResult(v + 1, 0, m.files.size, m.files.size)
    }
    def packTogether(files: Seq[(FileEntry, Long)]): Seq[FileEntry] = {
      val bytes = files.map(_._2).sum
      val nOut = math.max(1L,
        (bytes + targetBytes - 1) / targetBytes).toInt
      val df = readFiles(spark, root, m, files.map(_._1.name),
        keepPos = false)
      writeNewFiles(spark, root, v + 1, "pack", df, sortCol, nOut,
        blockSize)
    }
    // a BUCKETED layout packs WITHIN buckets (each bucket's small
    // files rewrite into right-sized files stamped with that bucket —
    // purity is inherited, so the storage-partitioned-join report
    // SURVIVES nightly maintenance; the Iceberg partition-preserving
    // binpack). A bucket holding one small file is re-referenced
    // verbatim — rewriting it alone would gain nothing (it counts as
    // reused in the result). Mixed history (any unstamped small file)
    // falls back to the global pack, which soundly disables the
    // report like any unstamped write.
    val (rewritten, reusedSingles, packed) = m.bucketSpec match {
      case Some((c, n)) if small.forall(_._1.bucket.isDefined) =>
        val groups = small.groupBy(_._1.bucket.get).toSeq.sortBy(_._1)
        val (multi, single) = groups.partition(_._2.size > 1)
        // ONE partitioned Spark job packs every size-bounded bucket
        // (≤ targetBytes of small bytes → one right-sized-or-smaller
        // file per bucket — the nightly streaming-accretion case);
        // only the rare OVERSIZED bucket packs alone with ceil
        // sizing. Wall-clock is O(data + oversized buckets), never
        // O(buckets) job-submission overhead.
        val (bounded, oversized) =
          multi.partition(_._2.map(_._2).sum <= targetBytes)
        val boundedOut =
          if (bounded.isEmpty) Seq.empty
          else {
            val df = readFiles(spark, root, m,
              bounded.flatMap(_._2.map(_._1.name)), keepPos = false)
            writeNewFilesBucketed(spark, root, v + 1, "pack", df,
              sortCol, blockSize, c, n)
          }
        val overOut = oversized.flatMap { case (id, fs) =>
          packTogether(fs).map(_.copy(bucket = Some(id)))
        }
        (multi.map(_._2.size).sum, single.flatMap(_._2.map(_._1)),
          boundedOut ++ overOut)
      case _ => (small.size, Seq.empty[FileEntry], packTogether(small))
    }
    commitManifest(root, v + 1,
      big.map(_._1) ++ reusedSingles ++ packed, carryMeta(m),
      Some((v, m)))
    BinPackResult(v + 1, rewritten,
      big.size + reusedSingles.size,
      big.size + reusedSingles.size + packed.size)
  }

  /** Result of a bucketed relayout: the new version, the bucket count,
    * and the files written.
    */
  case class BucketizeResult(version: Int, nBuckets: Int, files: Int)

  /** BUCKETED relayout — the STORAGE-PARTITIONED-JOIN layout: rewrite
    * the LATEST version so every data file holds exactly ONE
    * `bucket(nBuckets, bucketCol)` value ([[graft.sources.v2
    * .GraftBucket.id]] — the same frozen function the catalog exposes
    * to the planner), each file's bucket stamped as its `k=` stat and
    * the spec as carried `#bucket:` meta. The DSv2 scan then reports
    * `KeyGroupedPartitioning(bucket(n, col))`, and a join between two
    * tables bucketed with the SAME (function, n) on the join key runs
    * with NO shuffle on either side — at 100 TB the fact-fact join
    * exchange this removes is the single most expensive stage the
    * engine would otherwise produce. Rows sort by `bucketCol` within
    * each bucket, so key zones stay prunable. Like optimize, folds
    * sidecars and materializes column mappings (the read applies
    * them); later UN-bucketed appends simply disable the partitioning
    * report until the next relayout (soundness never depends on the
    * meta alone — every selected file must carry a `k=` stamp).
    */
  def optimizeBucketed(spark: SparkSession, root: String,
      bucketCol: String, nBuckets: Int,
      blockSize: Int = DefaultBlockSize,
      statsCols: Seq[String] = Seq.empty): BucketizeResult = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    val df = read(spark, root, v)
    import org.apache.spark.sql.types._
    df.schema(bucketCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case dt => sys.error(
        s"optimizeBucketed needs an integral bucket key, got $dt " +
          s"for '$bucketCol'")
    }
    val bId = udf((k: java.lang.Long) =>
      graft.sources.v2.GraftBucket.idNullSafe(nBuckets, k))
    val fdir = filesDir(root)
    val u = uuid8()
    val tmp = s"$fdir/__bucketize_$u"
    df.withColumn("__gbucket", bId(col(bucketCol).cast("long")))
      .repartition(nBuckets, col("__gbucket"))
      .sortWithinPartitions(col(bucketCol))
      .write.option("parquet.block.size", blockSize.toLong)
      .partitionBy("__gbucket").parquet(tmp)
    val cols = statsCols :+ bucketCol
    val entries = LakeFs.listDirNames(tmp)
      .filter(_.startsWith("__gbucket=")).sorted.flatMap { sub =>
        val id = sub.stripPrefix("__gbucket=").toInt
        Compaction.dataFileNames(s"$tmp/$sub").zipWithIndex.map {
          case (f, i) =>
            val name = s"bk${id}_v${v + 1}_${u}_$i.parquet"
            LakeFs.move(s"$tmp/$sub/$f", s"$fdir/$name")
            statEntry(spark, root, name, cols.distinct,
              addedV = Some(v + 1)).copy(bucket = Some(id))
        }
      }
    LakeFs.deleteRecursively(tmp)
    require(entries.nonEmpty,
      s"optimizeBucketed on an empty table at $root")
    commitManifest(root, v + 1, entries,
      idempotenceMeta(m) :+ s"#bucket:$bucketCol=$nBuckets",
      Some((v, m)))
    BucketizeResult(v + 1, nBuckets, entries.size)
  }

  /** Result of a sidecar compaction: the new version, live sidecars
    * before and after (0 or 1), and the distinct positions the merged
    * sidecar carries.
    */
  case class CompactSidecarsResult(version: Int, sidecarsBefore: Int,
      sidecarsAfter: Int, markedPositions: Long)

  /** SIDECAR COMPACTION — fold K live position-delete sidecars into ONE
    * per-file-union sidecar WITHOUT touching a data file: reads only
    * the sidecars themselves (KB-scale), re-encodes the union as one
    * partitioned bitmap sidecar, and commits a manifest whose `#dv:`
    * set is that single name. The missing middle between per-statement
    * sidecar accrual and a FULL optimize rewrite: a MERGE-heavy table
    * accretes one sidecar per statement, and every read pays one
    * sidecar resolution per live name ([[dvRead]] unions one scan per
    * sidecar; the DSv2 readers probe one directory per name per file) —
    * this verb keeps that read cost FLAT between optimizes at metadata
    * cost, the Iceberg `rewrite_position_delete_files` role. Sidecars
    * are disjoint by construction, so the union is exact; old sidecars
    * stay referenced by old versions (time travel) until [[vacuum]].
    * No-op (no commit) when fewer than two sidecars are live.
    */
  def compactSidecars(spark: SparkSession, root: String)
      : CompactSidecarsResult = {
    val v = latestVersion(root)
    require(v >= 1, s"uninitialized snapshot table at $root")
    val m = manifest(root, v)
    if (m.dvNames.size <= 1)
      return CompactSidecarsResult(v, m.dvNames.size, m.dvNames.size,
        0L)
    val union = dvRead(spark, root, m.dvNames)
    val sidecar = writeSidecarFile(spark, root, v, union)
    val meta = carryMeta(m).filterNot(_.startsWith("#dv:")) ++
      sidecar.map(s => s"#dv:${s._1}")
    commitManifest(root, v + 1, m.entries, meta, Some((v, m)))
    CompactSidecarsResult(v + 1, m.dvNames.size,
      sidecar.size, sidecar.map(_._2).getOrElse(0L))
  }

  /** OPTIMIZE ... ZORDER BY — the Delta/Iceberg clustering rewrite: the
    * LATEST version rewritten as `nFiles` Morton-range files on TWO
    * dimension keys ([[Bucketing.writeZOrderedFiles]]), so every file's
    * min/max envelope is bounded on both at once and a conjunctive
    * predicate prunes files on their intersection (the layout
    * [[Manifest.buildTs2]] plans against). Folds sidecars and
    * materializes column mappings exactly like [[optimize]] — one range
    * shuffle of the live data either way; choosing the clustered layout
    * is free at compaction time. Z-dimensions may be computed
    * expressions, so zone stats are stamped only for the PHYSICAL
    * columns named in `statsCols` (pass the dimension column names when
    * they are plain references — [[readRange]]/mutation planning then
    * stays footer-free on the clustered layout; footer fallback covers
    * the rest). Returns the new version.
    */
  def optimizeZOrder(spark: SparkSession, root: String, colA: Column,
      colB: Column, nFiles: Int,
      blockSize: Int = DefaultBlockSize,
      statsCols: Seq[String] = Seq.empty): Int = {
    val v = latestVersion(root)
    val m = manifest(root, v)
    val df = read(spark, root, v)
    val entries = adoptEntries(spark, root, v + 1, "zopt", statsCols)(tmp =>
      Bucketing.writeZOrderedFiles(df, colA, colB, nFiles, tmp, blockSize))
    commitManifest(root, v + 1, entries, idempotenceMeta(m), Some((v, m)))
    v + 1
  }

  /** PLAN-TIME PRUNED read of a snapshot version: keep only the files
    * whose commit-time zone of `column` intersects `[lo, hi)` (a file
    * without stamped stats is conservatively read), read exactly those
    * files (position deletes applied), and filter exactly — the serving
    * read path for range queries on a mutating table. Differs from a
    * plain `read().where(...)` at the PLANNER level: Spark still opens
    * every file's footer for row-group pruning, but only after building
    * a file index over all of them — at 10^6 files the index and footer
    * fetches alone cost seconds-to-minutes; pruning from the manifest
    * hands the scan the short list. Needs a mapping-free table like
    * every zone-planned path (zones are stamped under physical names).
    */
  def readRange(spark: SparkSession, root: String, version: Int,
      column: String, lo: Long, hi: Long): DataFrame = {
    val m = manifest(root, version)
    requireNoMappings(m, "readRange")
    val selected = m.entries.filter { e =>
      e.zones.get(column) match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true // no stats: cannot prove it misses
      }
    }.map(_.name)
    val df =
      if (selected.isEmpty) read(spark, root, version).limit(0)
      else readFiles(spark, root, m, selected, keepPos = false)
    val micros = microsOf(df, column)
    df.where(micros >= lit(lo) && micros < lit(hi))
  }

  /** PLAN-TIME PRUNED read on a STRING key — [[readRange]] for the
    * columns 16 bytes of numeric zone cannot see (doc ids, URLs,
    * categories — the keys an LLM-data pipeline actually ranges on):
    * keep only the files whose TRUNCATED string zone ([[StrZone]]) of
    * `column` intersects `[lo, hi)` in unsigned UTF-8 byte order, read
    * exactly those (position deletes applied), filter exactly. The
    * stored bounds are conservative (prefix lower / prefix-successor
    * upper), so truncation can over-select but never wrong-skip; a file
    * without a stamped string zone is conservatively read. Needs a
    * mapping-free table like every zone-planned path.
    */
  def readRangeStr(spark: SparkSession, root: String, version: Int,
      column: String, lo: String, hi: String): DataFrame = {
    val m = manifest(root, version)
    requireNoMappings(m, "readRangeStr")
    val qLo = lo.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val qHi = hi.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val selected = m.entries.filter { e =>
      e.szones.get(column) match {
        case Some(z) => z.intersects(qLo, qHi)
        case None => true // no stats: cannot prove it misses
      }
    }.map(_.name)
    val df =
      if (selected.isEmpty) read(spark, root, version).limit(0)
      else readFiles(spark, root, m, selected, keepPos = false)
    df.where(col(column) >= lit(lo) && col(column) < lit(hi))
  }

  /** METADATA-ONLY aggregation on a STRING column — COUNT(*) / MIN /
    * MAX answered purely from the manifest's commit-time string zones.
    * Refuses (beyond [[metadataAgg]]'s sidecar/mapping/missing-stats
    * conditions) when ANY referenced file's bound is TRUNCATED
    * (`loExact`/`hiExact` false): a prefix lower bound or
    * prefix-successor upper bound is sound for PRUNING but is not the
    * column's true extreme — answering MIN/MAX from it would be wrong,
    * so the caller is told to read (Iceberg's lower_bounds/upper_bounds
    * have the same caveat). Returns one row `(n_rows, min_str,
    * max_str)`.
    */
  def metadataAggStr(spark: SparkSession, root: String, version: Int,
      column: String): DataFrame = {
    import spark.implicits._
    val m = manifest(root, version)
    require(m.dvNames.isEmpty && m.eqDeletes.isEmpty,
      "metadataAggStr needs a sidecar-free version (live position/" +
        "equality deletes make footer stats overcount); run optimize " +
        "first")
    requireNoMappings(m, "metadataAggStr")
    val stats = m.entries.map { e =>
      (e.rows, e.szones.get(column)) match {
        case (Some(r), Some(z)) if z.loExact && z.hiExact =>
          (r, new String(z.lo, java.nio.charset.StandardCharsets.UTF_8),
            new String(z.hi, java.nio.charset.StandardCharsets.UTF_8))
        case (Some(_), Some(_)) => sys.error(
          s"metadataAggStr: truncated bound for $column in ${e.name} — " +
            "a prefix is not the true extreme; read the data")
        case _ => sys.error(s"metadataAggStr: no commit-time stats for " +
          s"$column in ${e.name}; run optimize to stamp them")
      }
    }
    stats.toDF("rows", "mn", "mx")
      .agg(sum(col("rows")).as("n_rows"),
        min(col("mn")).as("min_str"),
        max(col("mx")).as("max_str"))
  }

  /** METADATA-ONLY aggregation over a snapshot version — COUNT(*) /
    * MIN / MAX of `column` answered from the manifest's commit-time
    * stats without reading ONE data byte (the Iceberg metadata-query
    * shape, now possible on snapshot tables because every adopted file
    * carries `rows` and zone envelopes): per-file rows sum to the
    * count, per-file zones fold to the global extremes. Refuses when
    * the answer could be wrong from metadata alone: live position
    * deletes (marked rows still count in footer stats), pending column
    * mappings, or any referenced file missing `rows`/zone stats for
    * `column` (pre-stats manifests) — run optimize first. Returns one
    * row `(n_rows, min_micros, max_micros)`.
    */
  def metadataAgg(spark: SparkSession, root: String, version: Int,
      column: String): DataFrame = {
    import spark.implicits._
    val m = manifest(root, version)
    require(m.dvNames.isEmpty && m.eqDeletes.isEmpty,
      "metadataAgg needs a sidecar-free version (live position/" +
        "equality deletes make footer stats overcount); run optimize " +
        "first")
    requireNoMappings(m, "metadataAgg")
    val stats = m.entries.map { e =>
      (e.rows, e.zones.get(column)) match {
        case (Some(r), Some((mn, mx))) => (r, mn, mx)
        case _ => sys.error(s"metadataAgg: no commit-time stats for " +
          s"$column in ${e.name}; run optimize to stamp them")
      }
    }
    stats.toDF("rows", "mn", "mx")
      .agg(sum(col("rows")).as("n_rows"),
        min(col("mn")).as("min_micros"),
        max(col("mx")).as("max_micros"))
  }

  /** CONJUNCTIVE two-column pruned read — [[readRange]] for the
    * z-ordered layout ([[optimizeZOrder]] with `statsCols`), where each
    * file carries a bounded envelope on BOTH dimensions and a
    * conjunctive predicate keeps only the files whose zones intersect
    * on BOTH (the interval-intersection law — strictly smaller than
    * either single-dimension selection on a clustered layout). Missing
    * stats on either column = must-read. Exact filters applied after
    * the pruned read.
    */
  def readRange2(spark: SparkSession, root: String, version: Int,
      colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long): DataFrame = {
    val m = manifest(root, version)
    requireNoMappings(m, "readRange2")
    def hits(e: FileEntry, c: String, lo: Long, hi: Long): Boolean =
      e.zones.get(c) match {
        case Some((mn, mx)) => mx >= lo && mn < hi
        case None => true
      }
    val selected = m.entries.filter(e =>
      hits(e, colA, loA, hiA) && hits(e, colB, loB, hiB)).map(_.name)
    val df =
      if (selected.isEmpty) read(spark, root, version).limit(0)
      else readFiles(spark, root, m, selected, keepPos = false)
    val a = microsOf(df, colA)
    val b = microsOf(df, colB)
    df.where(a >= lit(loA) && a < lit(hiA) &&
      b >= lit(loB) && b < lit(hiB))
  }

  private def bloomsDir(root: String) = s"$root/_blooms"
  private def bloomPath(root: String, version: Int, column: String) =
    s"${bloomsDir(root)}/v${version}_$column.parquet"

  /** Per-file BLOOM index for a version of the snapshot table — the
    * point-lookup stats zone envelopes cannot provide (on a time-sorted
    * table every file's key envelope spans the whole id space): ONE
    * distributed pass over the version's files
    * ([[Manifest.buildBloomDistributed]] machinery on explicit paths),
    * persisted under `_blooms/v<N>_<col>.parquet` and consumed by
    * [[readKeys]]. Filters are sized from the manifest's commit-time
    * row stats (largest file; an over-sized bloom keeps its fpp).
    * Returns the index path. Iceberg bloom columns / Delta bloom
    * indexes, version-pinned the way their metadata is.
    */
  def buildBloomIndex(spark: SparkSession, root: String, version: Int,
      column: String, fpp: Double = 0.001): String = {
    val m = manifest(root, version)
    requireNoMappings(m, "buildBloomIndex")
    val expected = m.entries.flatMap(_.rows) match {
      case rs if rs.nonEmpty => math.max(1L, rs.max)
      // pre-stats fallback: size for the LARGEST file, not the average —
      // an under-sized filter on a skewed file degrades toward
      // all-positive and silently defeats pruning on exactly the tables
      // (pre-stats, skewed) the fallback serves
      case _ => math.max(1L, spark.read
        .parquet(m.files.map(n => s"${filesDir(root)}/$n"): _*)
        .groupBy(col("_metadata.file_name")).count()
        .agg(max(col("count"))).head().getLong(0))
    }
    val out = bloomPath(root, version, column)
    // multi-file index write (no coalesce(1) single-task funnel — at
    // 10^6 files × ~1 KB blooms that is ~1 GB through one task); the
    // probe reads the directory, so the part count is free
    spark.read.parquet(m.files.map(n => s"${filesDir(root)}/$n"): _*)
      .select(col("_metadata.file_name").as("file"), col(column))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("rows"),
        graft.functions.BloomSketch.bloomAgg(col(column), expected, fpp)
          .as("bloom"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    out
  }

  /** POINT LOOKUP through the version's bloom index: prune the file
    * list in executors (no false negatives — every file truly holding a
    * key survives), read only the surviving files (position deletes
    * applied), and filter exactly. Requires [[buildBloomIndex]] for
    * this (version, column); refuses rather than silently scanning
    * everything.
    */
  def readKeys(spark: SparkSession, root: String, version: Int,
      column: String, keys: Seq[Long]): DataFrame = {
    val idx = bloomPath(root, version, column)
    require(LakeFs.exists(idx),
      s"no bloom index for v$version.$column — run buildBloomIndex")
    val m = manifest(root, version)
    if (keys.isEmpty) // zero keys match zero rows, not an error
      return read(spark, root, version).limit(0)
    val selected =
      Manifest.selectFilesBloomDistributed(spark, idx, keys)
        .filter(m.files.toSet) // tolerate a stale index superset
    val df =
      if (selected.isEmpty) read(spark, root, version).limit(0)
      else readFiles(spark, root, m, selected, keepPos = false)
    df.where(col(column).isin(keys: _*))
  }

  /** DESCRIBE HISTORY — one row per SURVIVING version: `(version,
    * commit_ts, is_delta, n_files, n_rows, n_dv)`. `commit_ts` is null
    * on pre-timestamp manifests; `n_rows` is the sum of the manifest's
    * commit-time row stats (null when any referenced file lacks them,
    * never a wrong number) and counts MoR-marked rows as live the way
    * footer stats do — subtract the sidecar sizes for exact live
    * counts. O(versions) manifest reads: each stamped manifest answers
    * from its own raw `#nfiles:`/`#nrows:` summary lines (ONE read per
    * version, no delta-chain resolution — at 10^5 commits the chain
    * walk costs O(versions × checkpoint interval) reads); pre-stamp
    * manifests fall back to full resolution. Driver-side, the same
    * bound every format's history listing has.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val latest = latestVersion(root)
    require(latest >= 1, s"uninitialized snapshot table at $root")
    (1 to latest)
      .filter(v => LakeFs.exists(manifestPath(root, v)))
      .map { v =>
        val lines = rawLines(root, v)
        val ts = lines.find(_.startsWith("#ts:"))
          .map(_.stripPrefix("#ts:").toLong)
        val isDelta = lines.exists(_.startsWith("#parent:"))
        val nDv = lines.count(_.startsWith("#dv:")).toLong
        lines.find(_.startsWith("#nfiles:"))
          .map(_.stripPrefix("#nfiles:").toLong) match {
          case Some(nf) => // stamped: answered from this one raw read
            val rows = lines.find(_.startsWith("#nrows:"))
              .map(_.stripPrefix("#nrows:").toLong)
            (v, ts, isDelta, nf, rows, nDv)
          case None => // pre-stamp manifest: resolve the chain
            val m = manifest(root, v)
            val rows =
              if (m.entries.forall(_.rows.nonEmpty))
                Some(m.entries.flatMap(_.rows).sum)
              else None
            (v, m.commitTs, m.isDelta, m.entries.size.toLong, rows,
              m.dvNames.size.toLong)
        }
      }
      .toDF("version", "commit_ts", "is_delta", "n_files", "n_rows",
        "n_dv")
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
    * (including orphans a losing OCC writer left behind) — PROVIDED they
    * are older than `graceMs`: a just-written unreferenced file may
    * belong to a writer between its file adoption and its manifest
    * commit, and deleting it would let that writer commit a manifest
    * referencing vanished files (the retention-window race every
    * production VACUUM guards with; tests pass 0 to reclaim
    * immediately). If `keepFrom`'s manifest is a delta whose chain
    * reaches below the cut, its full file list is first materialized as
    * a `_ckpt_v<keepFrom>.txt` sidecar so resolution never dangles.
    * Returns (manifests dropped, files deleted).
    */
  def vacuum(root: String, keepFrom: Int,
      graceMs: Long = DefaultVacuumGraceMs): (Int, Int) = {
    val latest = latestVersion(root)
    require(keepFrom <= latest, s"keepFrom $keepFrom > latest $latest")
    if (keepFrom > 1) {
      val mk = manifest(root, keepFrom) // resolve while the chain is intact
      if (mk.isDelta && !LakeFs.exists(ckptPath(root, keepFrom)))
        try LakeFs.createNewAtomic(ckptPath(root, keepFrom),
          mk.entries.sortBy(_.name).map(_.render).mkString("\n"))
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
        }
    }
    val dropped = (1 until keepFrom).count { v =>
      LakeFs.delete(ckptPath(root, v))
      LakeFs.delete(manifestPath(root, v))
    }
    // bloom indexes are version-pinned metadata: drop with their version
    LakeFs.listDirNames(bloomsDir(root)).foreach { n =>
      val v = n.stripPrefix("v").takeWhile(_.isDigit)
      if (n.startsWith("v") && v.nonEmpty && v.toInt < keepFrom)
        LakeFs.deleteRecursively(s"${bloomsDir(root)}/$n")
    }
    val survivors = (keepFrom to latest)
      .filter(v => LakeFs.exists(manifestPath(root, v)))
    val liveManifests = survivors.map(v => manifest(root, v))
    val liveFiles = liveManifests.flatMap(_.files).toSet
    val liveDv = liveManifests.flatMap(_.dvNames).toSet ++
      liveManifests.flatMap(_.eqDeletes.map(_.name)).toSet
    val now = System.currentTimeMillis()
    def reclaimable(p: String): Boolean =
      now - LakeFs.modificationTime(p) >= graceMs
    // parquet file sections: referenced only by their own version's
    // manifest — sections of dropped versions and a losing writer's
    // orphans reclaim past the grace window
    val livePq = survivors.flatMap(v =>
      rawLines(root, v).find(_.startsWith("#pqsec:"))
        .map(_.stripPrefix("#pqsec:"))).toSet
    LakeFs.listDirNames(manifestDir(root))
      .filter(_.startsWith("pqsec_"))
      .foreach { n =>
        val p = s"${manifestDir(root)}/$n"
        if (!livePq.contains(n) && reclaimable(p))
          LakeFs.deleteRecursively(p)
      }
    val deletedData = Compaction.dataFileNames(filesDir(root))
      .filterNot(liveFiles.contains)
      .count { n =>
        val p = s"${filesDir(root)}/$n"
        reclaimable(p) && LakeFs.delete(p)
      }
    val deletedDv = Compaction.dataFileNames(deletesDir(root))
      .filterNot(liveDv.contains)
      .count { n =>
        val p = s"${deletesDir(root)}/$n"
        reclaimable(p) && LakeFs.delete(p)
      }
    // partitioned-directory sidecars reclaim whole (they are one unit
    // of reference, like a legacy file)
    val deletedDvDirs = LakeFs.listDirNames(deletesDir(root))
      .filterNot(liveDv.contains)
      .count { n =>
        val p = s"${deletesDir(root)}/$n"
        reclaimable(p) && LakeFs.deleteRecursively(p)
      }
    (dropped, deletedData + deletedDv + deletedDvDirs)
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
    val withDvMarks =
      if (newDv.isEmpty || common.isEmpty) removedFiles
      else {
        val dv = dvRead(spark, root, newDv.toSeq.sorted)
        val rows = readFiles(spark, root,
          mFrom.copy(meta = mFrom.meta.filterNot(_.startsWith("#dv:"))),
          common, keepPos = true)
        val marked = rows.join(dv,
          rows("__dv_file") === dv("file") && rows("__dv_pos") === dv("pos"),
          "left_semi").drop("__dv_file", "__dv_pos")
        val (a, b) = alignPair(removedFiles, marked)
        a.unionByName(b)
      }
    // EQUALITY deletes added since `from` kill rows on common files by
    // key: report each row LIVE at `from` whose key joined a new key
    // set — deduped by position (two key columns could both match) and
    // excluding rows `to`'s position deletes already account for
    // (the dv slice above reports those)
    val newEq = mTo.eqDeletes.filterNot(mFrom.eqDeletes.toSet)
    val removed =
      if (newEq.isEmpty || common.isEmpty) withDvMarks
      else {
        val liveFrom = readFiles(spark, root, mFrom, common,
          keepPos = true)
        val eqMarked = newEq.groupBy(_.keyCol).toSeq.sortBy(_._1)
          .map { case (kc, es) =>
            val keys = es.map(e => spark.read
                .parquet(s"${deletesDir(root)}/${e.name}"))
              .reduce(_ unionAll _).select(col("k")).distinct()
            liveFrom.join(broadcast(keys), liveFrom(kc) === keys("k"),
              "left_semi")
          }.reduce(_ unionAll _)
          .dropDuplicates("__dv_file", "__dv_pos")
        val toDv =
          if (mTo.dvNames.isEmpty) eqMarked
          else {
            val dvTo = dvRead(spark, root, mTo.dvNames)
            eqMarked.join(dvTo,
              eqMarked("__dv_file") === dvTo("file") &&
                eqMarked("__dv_pos") === dvTo("pos"), "left_anti")
          }
        val (a, b) = alignPair(withDvMarks,
          toDv.drop("__dv_file", "__dv_pos"))
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
