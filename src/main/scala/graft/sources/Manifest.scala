package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted per-FILE zone map — the table-format planning mechanism
  * (Iceberg manifests / Delta data-skipping stats) that pp1–pp5 do not
  * cover: those prune with stats the reader finds at SCAN time (directory
  * names, parquet footers); a manifest lets the PLANNER pick the file
  * list from a KB-scale stats table without listing directories or
  * opening a single footer. At 100 TB the difference is real: a year-long
  * table holds ~10^5–10^6 files, and a query planner that must stat and
  * footer-read all of them pays seconds-to-minutes of metadata I/O per
  * query; a manifest read costs one small parquet scan.
  *
  * "Profile once, plan forever" (the p11d/nd2 durable-index convention):
  * the manifest is built ONCE from footers at write/compaction time and
  * persisted as parquet; every later query plans from the manifest alone.
  * Plan-time file lists are driver-sized BY NATURE in every engine
  * (Spark's own InMemoryFileIndex holds them on the driver), so the
  * `collect()` here is bounded by file count, not data size.
  */
object Manifest {

  /** Build the zone map of a flat parquet dir for one long-typed column
    * (INT64 / TIMESTAMP_MICROS): one row per FILE — absolute path, bytes,
    * row count, min/max of `column` — aggregated from the per-row-group
    * footer stats ([[Bucketing.rowGroupStats]]). Driver-side, bounded by
    * file count (footers only).
    */
  def buildTs(spark: SparkSession, dir: String, column: String)
      : Seq[(String, Long, Long, Long, Long)] = {
    val sizes = Compaction.dataFiles(dir)
      .map(f => f.getName -> f.length).toMap
    Bucketing.rowGroupStats(spark, dir, column)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (name, gs) =>
        (s"$dir/$name", sizes(name), gs.map(_._2).sum,
          gs.map(_._3).min, gs.map(_._4).max)
      }
  }

  /** Persist the zone map as a parquet manifest table
    * (`file, bytes, rows, min_v, max_v`).
    */
  def writeTs(spark: SparkSession, dir: String, column: String,
      outPath: String): Unit = {
    import spark.implicits._
    buildTs(spark, dir, column)
      .toDF("file", "bytes", "rows", "min_v", "max_v")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
  }

  /** Plan-time pruning: the files whose `[min_v, max_v]` zone intersects
    * `[lo, hi)` — read from the PERSISTED manifest, no directory listing,
    * no footers. Sorted for determinism.
    */
  def selectFiles(spark: SparkSession, manifestPath: String,
      lo: Long, hi: Long): Seq[String] =
    spark.read.parquet(manifestPath)
      .where(col("max_v") >= lit(lo) && col("min_v") < lit(hi))
      .select(col("file")).collect().map(_.getString(0)).toSeq.sorted

  /** Normalize a scan-reported file URI (`file:///tmp/x`) to the plain
    * path form the manifest stores — for comparing
    * [[Bucketing.filesRead]] ground truth against a selection.
    */
  def normalizePath(p: String): String =
    if (p.contains(":/")) new java.net.URI(p).getPath else p

  /** Read exactly the manifest-selected files (empty selection → empty
    * frame with the dir's schema).
    */
  def readSelected(spark: SparkSession, dir: String,
      files: Seq[String]): DataFrame =
    if (files.isEmpty) spark.read.parquet(dir).limit(0)
    else spark.read.parquet(files: _*)
}
