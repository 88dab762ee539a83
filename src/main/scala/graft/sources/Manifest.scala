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
    val names = Compaction.dataFileNames(dir)
    val paths = names.map(n => s"$dir/$n")
    Bucketing.fileZones(spark, paths, column).map {
      case (name, rows, Some((mn, mx))) =>
        (s"$dir/$name", LakeFs.fileLength(s"$dir/$name"), rows, mn, mx)
      case (name, _, None) =>
        sys.error(s"no usable stats for $column in $name — a manifest " +
          "built from missing stats would prune wrong")
    }
  }

  /** Two-column zone map: one row per FILE with the min/max envelope of
    * BOTH `colA` and `colB` — the composite manifest a z-ordered layout
    * ([[Bucketing.writeZOrdered]]) deserves, where each file carries a
    * tight-ish envelope on both dimensions at once and a conjunctive
    * predicate can prune on their intersection. Same footer-only,
    * driver-bounded cost as [[buildTs]].
    */
  def buildTs2(spark: SparkSession, dir: String, colA: String, colB: String)
      : Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val names = Compaction.dataFileNames(dir)
    val paths = names.map(n => s"$dir/$n")
    val za = Bucketing.fileZones(spark, paths, colA)
    val zb = Bucketing.fileZones(spark, paths, colB).map(z => z._1 -> z).toMap
    za.map {
      case (name, rows, Some((mnA, mxA))) =>
        zb(name) match {
          case (_, _, Some((mnB, mxB))) =>
            (s"$dir/$name", LakeFs.fileLength(s"$dir/$name"), rows,
              mnA, mxA, mnB, mxB)
          case _ => sys.error(s"no usable stats for $colB in $name")
        }
      case (name, _, None) =>
        sys.error(s"no usable stats for $colA in $name")
    }
  }

  /** Persist the two-column zone map as a parquet manifest table
    * (`file, bytes, rows, min_a, max_a, min_b, max_b`).
    */
  def writeTs2(spark: SparkSession, dir: String, colA: String, colB: String,
      outPath: String): Unit = {
    import spark.implicits._
    buildTs2(spark, dir, colA, colB)
      .toDF("file", "bytes", "rows", "min_a", "max_a", "min_b", "max_b")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
  }

  /** Plan-time pruning on ONE dimension of a persisted manifest: the
    * files whose `[minCol, maxCol]` zone intersects `[lo, hi)`.
    */
  def selectFilesOn(spark: SparkSession, manifestPath: String,
      minCol: String, maxCol: String, lo: Long, hi: Long): Seq[String] =
    spark.read.parquet(manifestPath)
      .where(col(maxCol) >= lit(lo) && col(minCol) < lit(hi))
      .select(col("file")).collect().map(_.getString(0)).toSeq.sorted

  /** CONJUNCTIVE plan-time pruning of a two-column manifest: the files
    * whose zones intersect BOTH `[loA, hiA)` on column A and `[loB,
    * hiB)` on column B — one manifest scan, one predicate; by the
    * interval-intersection law the result is exactly
    * `selectFilesOn(A) ∩ selectFilesOn(B)`, and on a z-ordered layout it
    * is strictly smaller than either single-dimension selection.
    */
  def selectFiles2(spark: SparkSession, manifestPath: String,
      loA: Long, hiA: Long, loB: Long, hiB: Long): Seq[String] =
    spark.read.parquet(manifestPath)
      .where(col("max_a") >= lit(loA) && col("min_a") < lit(hiA) &&
        col("max_b") >= lit(loB) && col("min_b") < lit(hiB))
      .select(col("file")).collect().map(_.getString(0)).toSeq.sorted

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

  /** Per-file BLOOM manifest for POINT-LOOKUP pruning — the stats a
    * min/max zone cannot provide: on a time-sorted table every file's
    * key envelope spans the whole id space, so a `key = X` predicate
    * prunes nothing by zones, while a per-file Bloom filter answers
    * "might this file contain X?" with NO false negatives (the pruning
    * safety law) and a tunable false-positive rate. One row per file:
    * `(file NAME, rows, bloom bytes)`. Expected-item counts come from
    * the parquet footers ([[Bucketing.fileZones]]) — no counting pass;
    * the build reads each file's key column once (column-pruned).
    * Iceberg/Delta ship exactly this as bloom columns / indexes; at
    * ~1 KB per file a 10^6-file table's bloom manifest is a ~GB side
    * table the planner scans instead of the 100 TB of data.
    */
  def buildBloom(spark: SparkSession, dir: String, column: String,
      fpp: Double = 0.001): Seq[(String, Long, Array[Byte])] = {
    val names = Compaction.dataFileNames(dir)
    val rowsOf = Bucketing
      .fileZones(spark, names.map(n => s"$dir/$n"), column)
      .map { case (n, rows, _) => n -> rows }.toMap
    names.map { n =>
      val bf = spark.read.parquet(s"$dir/$n")
        .stat.bloomFilter(column, math.max(1L, rowsOf(n)), fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      (n, rowsOf(n), bos.toByteArray)
    }
  }

  /** Persist the bloom manifest as parquet (`file, rows, bloom`). */
  def writeBloom(spark: SparkSession, dir: String, column: String,
      outPath: String, fpp: Double = 0.001): Unit = {
    import spark.implicits._
    buildBloom(spark, dir, column, fpp)
      .toDF("file", "rows", "bloom")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
  }

  /** Plan-time point-lookup pruning: the file NAMES whose bloom might
    * contain ANY of `keys` — a guaranteed SUPERSET of the files that do
    * (bloom filters have no false negatives), usually a small fraction
    * of the table for selective keys. Driver-side, bounded by file
    * count × key count.
    */
  def selectFilesBloom(spark: SparkSession, manifestPath: String,
      keys: Seq[Long]): Seq[String] =
    spark.read.parquet(manifestPath)
      .select(col("file"), col("bloom")).collect()
      .filter { r =>
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        keys.exists(bf.mightContainLong)
      }
      .map(_.getString(0)).toSeq.sorted

  /** DISTRIBUTED bloom-manifest build — the scale path [[buildBloom]]'s
    * driver loop is not: ONE Spark pass over the whole dir, column-pruned
    * to the key, grouped by the reader's own `_metadata.file_name` and
    * aggregated with [[graft.functions.BloomSketch.bloomAgg]] (partial
    * aggregation = bitwise OR, so the map-side combine is exact). One
    * job regardless of file count, vs one driver-launched job PER file —
    * at 10^6 files the difference is 10^6 scheduler round-trips. Row
    * counts ride the same pass (`count`). `expectedPerFile` sizes every
    * filter (use the largest file's row count — an over-sized bloom
    * keeps its fpp; an under-sized one degrades toward all-positive).
    * Returns `(file NAME, rows, bloom bytes)` — the same schema
    * [[writeBloom]] persists.
    */
  def buildBloomDistributed(spark: SparkSession, dir: String,
      column: String, expectedPerFile: Long,
      fpp: Double = 0.001): DataFrame =
    spark.read.parquet(dir)
      .select(col("_metadata.file_name").as("file"), col(column))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("rows"),
        graft.functions.BloomSketch.bloomAgg(col(column), expectedPerFile,
          fpp).as("bloom"))

  /** Persist the DISTRIBUTED bloom manifest as parquet
    * (`file, rows, bloom`) — one job, any file count. The write keeps
    * the aggregate's output partitioning (multi-file past one shuffle
    * partition): funneling through `coalesce(1)` would push 10^6 files
    * × ~1 KB of filters ≈ a GB through ONE task and one giant parquet
    * file; readers scan the directory, so the file count is free.
    */
  def writeBloomDistributed(spark: SparkSession, dir: String,
      column: String, outPath: String, expectedPerFile: Long,
      fpp: Double = 0.001): Unit =
    buildBloomDistributed(spark, dir, column, expectedPerFile, fpp)
      .write.mode(SaveMode.Overwrite).parquet(outPath)

  /** DISTRIBUTED plan-time point-lookup pruning: filter the bloom
    * manifest IN EXECUTORS ([[graft.functions.BloomSketch
    * .mightContainAny]] — ONE array-argument probe per manifest row,
    * one deserialization however many keys, not an O(keys) Or-chain of
    * per-key nodes) and collect only the surviving file names — the
    * driver never holds every filter (at 10^6 files × ~1 KB that is a
    * ~GB of driver heap [[selectFilesBloom]] would collect). Same
    * no-false-negative superset guarantee. An empty key batch can match
    * nothing → empty selection, not an error.
    */
  def selectFilesBloomDistributed(spark: SparkSession,
      manifestPath: String, keys: Seq[Long]): Seq[String] = {
    if (keys.isEmpty) return Seq.empty
    val man = spark.read.parquet(manifestPath)
    val hit = graft.functions.BloomSketch.mightContainAny(col("bloom"),
      lit(keys.toArray))
    man.where(hit).select(col("file"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

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
