package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the lake-maintenance operator every streaming
  * ingest eventually needs: micro-batch sinks and over-parallel writers
  * leave thousands of KB-scale files per table, and at 100 TB the cost is
  * real (one scan task + one footer round-trip per file; a 1e6-file table
  * spends more time opening files than reading them). Compaction rewrites
  * a directory into `ceil(bytes / targetBytes)` right-sized files.
  *
  * This is the SORT-RESTORING flavor: output partitions are RANGE-split
  * on a sort column and sorted within, so each output file covers a
  * disjoint range and every row group carries tight min/max stats — i.e.
  * compaction re-establishes the pp2 row-group-skipping layout instead of
  * destroying it the way a plain round-robin `repartition(n)` rewrite
  * would. Cost: ONE range shuffle of the table, the same price as the
  * original sorted write.
  */
object Compaction {

  /** The parquet data-file NAMES of a flat directory (sorted), via the
    * Hadoop FileSystem ([[LakeFs]]) — the portable listing every
    * lakehouse path uses.
    */
  def dataFileNames(dir: String): Seq[String] =
    LakeFs.listNames(dir, ".parquet")

  /** The parquet data files of a flat LOCAL directory (names sorted) —
    * `java.io.File` convenience for specs and local fixtures; portable
    * callers use [[dataFileNames]]/[[LakeFs]].
    */
  def dataFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)

  /** `ceil(totalBytes / targetBytes)` — the file count a compaction to
    * `targetBytes`-sized files produces (>= 1).
    */
  def plannedFiles(dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val total = dataFiles(dir).map(_.length).sum
    math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite the parquet at `inDir` as `nFiles` range-partitioned files
    * sorted on `sortCol` (timestamps forced to TIMESTAMP_MICROS so the
    * restored layout actually carries parquet stats — Spark's INT96
    * default writes none). `blockSize` is small in tests so even tiny SFs
    * span multiple row groups per file; production keeps the 128 MB
    * default. Returns the number of files actually written.
    */
  def compactSorted(s: SparkSession, inDir: String, outDir: String,
      sortCol: String, nFiles: Int,
      blockSize: Int = 128 * 1024 * 1024): Int = {
    require(nFiles >= 1, s"nFiles must be >= 1: $nFiles")
    Bucketing.writeRangeSorted(
      s.read.parquet(inDir), sortCol, nFiles, outDir, blockSize)
    dataFiles(outDir).size
  }
}
