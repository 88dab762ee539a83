package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, LocalFileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` file layer for the lakehouse ([[Snapshots]] /
  * [[Manifest]] / [[Compaction]]): every path operation the table format
  * needs, expressed against `org.apache.hadoop.fs.FileSystem` instead of
  * `java.io.File`, so the copy-on-write / optimistic-concurrency protocol
  * runs unchanged on `file://`, HDFS, or any Hadoop-compatible store
  * (S3A, ABFS, GCS connectors) — the reader/writer side is already
  * portable because it goes through Spark's own parquet I/O.
  *
  * ATOMICITY contract of [[createNewAtomic]] — the single OCC commit
  * point of the whole format:
  *  - `file://` — dispatched to java.nio `CREATE_NEW` (O_CREAT|O_EXCL),
  *    truly atomic on POSIX; Hadoop's `RawLocalFileSystem.create(f,
  *    overwrite=false)` is only check-then-create.
  *  - HDFS — `create(path, overwrite=false)` is atomic at the NameNode.
  *  - S3 — a bare S3A `create(false)` is check-then-PUT and NOT atomic;
  *    production deployments must back the manifest commit with a
  *    conditional PUT (`If-None-Match: *`), a DynamoDB-style lock table,
  *    or a commit service — the same caveat Delta Lake documents for its
  *    S3 LogStore. The caller-visible failure mode is identical either
  *    way: `FileAlreadyExistsException` when the version was taken.
  */
object LakeFs {

  /** Hadoop conf of the active Spark session; `getActiveSession` is
    * thread-local, so a non-Spark driver thread (an OCC retry pool, a
    * maintenance thread) falls back to the DEFAULT session before a bare
    * `Configuration` — losing `spark.hadoop.*` (S3 credentials,
    * endpoints) would silently resolve a different FileSystem for the
    * manifests than for the data.
    */
  def conf(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Thread-local count of [[readString]] calls — a TEST hook proving
    * metadata-read bounds (e.g. [[Snapshots.committedBatches]] reads ONE
    * manifest per call, not one per version). Thread-local because the
    * shared test JVM runs suites in parallel; all manifest I/O happens on
    * the calling driver thread.
    */
  val readStringCalls: ThreadLocal[java.util.concurrent.atomic.AtomicLong] =
    ThreadLocal.withInitial(() => new java.util.concurrent.atomic.AtomicLong)

  def fs(p: String): FileSystem = new Path(p).getFileSystem(conf())

  def exists(p: String): Boolean = fs(p).exists(new Path(p))

  def mkdirs(p: String): Unit = { fs(p).mkdirs(new Path(p)); () }

  /** File names (not paths) directly under `dir` ending in `suffix`,
    * sorted; empty for a missing dir.
    */
  def listNames(dir: String, suffix: String = ""): Seq[String] = {
    val f = fs(dir)
    val d = new Path(dir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.filter(_.isFile)
      .map(_.getPath.getName).filter(_.endsWith(suffix)).sorted
  }

  /** Directory names (not paths) directly under `dir`, sorted; empty
    * for a missing dir.
    */
  def listDirNames(dir: String): Seq[String] = {
    val f = fs(dir)
    val d = new Path(dir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }

  def fileLength(p: String): Long =
    fs(p).getFileStatus(new Path(p)).getLen

  def modificationTime(p: String): Long =
    fs(p).getFileStatus(new Path(p)).getModificationTime

  def readString(p: String): String = {
    readStringCalls.get().incrementAndGet()
    val in = fs(p).open(new Path(p))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Exclusive create — throws
    * [[org.apache.hadoop.fs.FileAlreadyExistsException]] (or the java.nio
    * twin on `file://`) when the path exists. See the object scaladoc for
    * the per-store atomicity contract.
    */
  def createNewAtomic(p: String, content: String = ""): Unit = {
    val f = fs(p)
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (f.isInstanceOf[LocalFileSystem]) {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(new Path(p).toUri.getPath), bytes,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        ()
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$p already exists")
      }
    } else {
      val out = f.create(new Path(p), false)
      try out.write(bytes) finally out.close()
    }
  }

  /** ATOMIC REPLACE of an existing (or absent) file: write the new
    * content to a hidden temp name in the same directory, then rename
    * over `p` in one step — a reader observes either the old content or
    * the new, never a missing or torn file. The overwrite counterpart of
    * [[createNewAtomic]], for mutable metadata like the table props
    * (delete-then-create would lose ALL properties to a crash or racing
    * reader in the window between the two calls).
    */
  def replaceAtomic(p: String, content: String): Unit = {
    val f = fs(p)
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmpName = s".${new Path(p).getName}.tmp" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    if (f.isInstanceOf[LocalFileSystem]) {
      val target = java.nio.file.Paths.get(new Path(p).toUri.getPath)
      val tmp = target.getParent.resolve(tmpName)
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } else {
      val tmp = new Path(new Path(p).getParent, tmpName)
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      // FileContext.rename supports OVERWRITE (FileSystem.rename does
      // not) — the HDFS-portable atomic replace
      org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, conf())
        .rename(tmp, new Path(p),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Best-effort ADVISORY write (plain overwrite, NOT atomic) — for hint
    * files whose loss or corruption readers must tolerate (e.g. the
    * latest-version hint: a stale/garbled hint only costs extra probes,
    * never correctness). Swallows every failure.
    */
  def writeHint(p: String, content: String): Unit =
    try {
      val out = fs(p).create(new Path(p), true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Read an advisory hint written by [[writeHint]]; None on any failure
    * (missing, unreadable, torn write).
    */
  def readHint(p: String): Option[String] =
    try {
      if (!exists(p)) None
      else {
        val in = fs(p).open(new Path(p))
        try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
          Some(new String(bos.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8))
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Rename `src` to `dst` (same filesystem), failing loudly on a false
    * return — a silent `rename=false` is how data files vanish.
    */
  def move(src: String, dst: String): Unit = {
    val f = fs(src)
    require(f.rename(new Path(src), new Path(dst)),
      s"rename failed: $src -> $dst")
  }

  def copyFile(src: String, dst: String): Unit = {
    val c = conf()
    require(FileUtil.copy(fs(src), new Path(src), fs(dst), new Path(dst),
      false, true, c), s"copy failed: $src -> $dst")
  }

  def delete(p: String): Boolean = fs(p).delete(new Path(p), false)

  def deleteRecursively(p: String): Boolean = fs(p).delete(new Path(p), true)
}
