package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared plumbing for durable index lineages ([[Dedup.LshIndex.save]],
  * [[Dedup.SemIndex.save]]): an index checkpoint is `path/epoch=N/` holding
  * the index frames as parquet plus an `index.json` geometry sidecar. Epochs
  * are append-only (never overwritten — the [[graft.sources.Versioned]]
  * discipline, single-writer semantics like the reference's versioned CSV
  * sink), and the sidecar is written last so the newest COMPLETE epoch is
  * the newest dir containing one: a save that died mid-write is invisible
  * to load. Paths resolve through the Hadoop FileSystem for their scheme,
  * so lineages live on local disk, `hdfs://`, or `s3a://` alike.
  */
private[operators] object IndexStore {

  val Sidecar = "index.json"

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Epoch numbers under `path` (complete or not). */
  private def epochs(f: FileSystem, base: Path): Seq[Long] =
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("epoch=") =>
        s.stripPrefix("epoch=").toLong }

  /** The next epoch dir to write (max existing + 1; 0 on a fresh path). */
  def nextEpochDir(spark: SparkSession, path: String): String = {
    val (f, base) = fs(spark, path)
    val n = epochs(f, base).foldLeft(-1L)(math.max) + 1
    s"$path/epoch=$n"
  }

  /** The newest COMPLETE epoch dir (one whose sidecar exists). */
  def latestEpochDir(spark: SparkSession, path: String): String = {
    val (f, base) = fs(spark, path)
    val done = epochs(f, base)
      .filter(n => f.exists(new Path(s"$path/epoch=$n/$Sidecar")))
    require(done.nonEmpty, s"no complete index epoch under $path")
    s"$path/epoch=${done.max}"
  }

  /** All complete epochs (number, sidecar json) in ascending order — the
    * snapshot+delta log form: a lineage refreshed by a streaming loop
    * holds a full snapshot plus per-batch delta epochs after it, and a
    * loader replays the newest snapshot then every later delta.
    */
  def completeEpochs(spark: SparkSession, path: String): Seq[(Long, String)] = {
    val (f, base) = fs(spark, path)
    epochs(f, base).sorted
      .filter(n => f.exists(new Path(s"$path/epoch=$n/$Sidecar")))
      .map(n => (n, readSidecar(spark, s"$path/epoch=$n")))
  }

  /** `true` when the sidecar marks a delta epoch (absent field = full
    * snapshot, the pre-delta sidecar shape).
    */
  def isDelta(json: String): Boolean =
    "\"delta\"\\s*:\\s*true".r.findFirstIn(json).isDefined

  /** The epoch dirs a load must replay — the newest complete FULL
    * snapshot, then every complete delta after it, in order — plus the
    * snapshot's sidecar (the geometry of record; all epochs of a lineage
    * share it). Validates the lineage kind.
    */
  def snapshotAndDeltas(spark: SparkSession, path: String,
      kind: String): (Seq[String], String) = {
    val done = completeEpochs(spark, path)
    done.foreach { case (n, meta) =>
      require(jsonString(meta, "kind") == kind,
        s"$path/epoch=$n is not a '$kind' lineage epoch") }
    val fulls = done.filterNot { case (_, meta) => isDelta(meta) }
    require(fulls.nonEmpty, s"no complete full snapshot under $path")
    val (fullN, fullMeta) = fulls.last
    val dirs = s"$path/epoch=$fullN" +:
      done.collect { case (n, meta) if n > fullN && isDelta(meta) =>
        s"$path/epoch=$n" }
    (dirs, fullMeta)
  }

  /** Delete every epoch a load no longer replays: anything BEFORE the
    * newest complete FULL snapshot (superseded snapshots, their deltas,
    * and torn epochs the sidecar discipline already hides). The newest
    * snapshot and every complete delta after it — exactly the
    * [[snapshotAndDeltas]] replay set — survive untouched, so a load
    * before and after vacuum sees identical data. Returns the deleted
    * epoch dirs. Run after a fresh full [[save]] (a compaction, a
    * periodic re-snapshot) to stop a long-lived lineage growing without
    * bound; single-writer semantics assumed, like every other write here.
    */
  def vacuum(spark: SparkSession, path: String, kind: String): Seq[String] = {
    val (dirs, _) = snapshotAndDeltas(spark, path, kind)
    val keep = dirs.map(d => d.stripPrefix(s"$path/")
      .stripPrefix("epoch=").toLong).toSet
    val (f, base) = fs(spark, path)
    val doomed = epochs(f, base).filterNot(keep).sorted
    doomed.map { n =>
      val dir = s"$path/epoch=$n"
      f.delete(new Path(dir), true)
      dir
    }
  }

  def writeSidecar(spark: SparkSession, epochDir: String, json: String): Unit = {
    val (f, _) = fs(spark, epochDir)
    val out = f.create(new Path(s"$epochDir/$Sidecar"), false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def readSidecar(spark: SparkSession, epochDir: String): String = {
    val (f, _) = fs(spark, epochDir)
    val in = f.open(new Path(s"$epochDir/$Sidecar"))
    try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  // The sidecars are written by this object with known flat shapes, so a
  // field grab is enough — no JSON library dependency.
  def jsonInt(json: String, key: String): Int =
    ("\"" + key + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"sidecar missing int field '$key': $json"))

  def jsonLong(json: String, key: String): Long =
    ("\"" + key + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"sidecar missing long field '$key': $json"))

  def jsonString(json: String, key: String): String =
    ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        s"sidecar missing string field '$key': $json"))
}
