package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table support: pre-shuffle fact tables once on their join key so
  * every subsequent equi-join/aggregation on that key is exchange-free.
  *
  * At 100 TB the dominant cost of q3/q5-style joins is the lineitem⋈orders
  * shuffle; bucketing both sides by the key (same bucket count) lets Spark's
  * planner elide both Exchanges — pay the shuffle once at ingest, never per
  * query. This is the managed-table flavor (`bucketBy` requires
  * `saveAsTable`); the session's warehouse dir points wherever the caller
  * wants the data.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKey: String,
      numBuckets: Int,
      sortKey: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketKey)
    sortKey.fold(w)(k => w.sortBy(k)).saveAsTable(table)
  }

  /** True iff the physical plan of `df` contains no shuffle Exchange —
    * the check that a bucketed join actually co-located.
    */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Time-partitioned fact layout: write `df` Hive-partitioned by the
    * calendar DAY of `tsCol` (`dt=YYYY-MM-DD` directories) — the standard
    * event/crawl layout at 100 TB, where a date predicate must prune to
    * directory listings BEFORE any file is opened. Bucketing co-locates
    * joins; this co-locates TIME, the other axis a fact table is always
    * filtered on. Day grain (not month) because partition counts should
    * track the query grain: a dashboard asks for days/weeks, and a day of
    * a 100 TB/year stream is still ~280 GB — plenty per directory.
    */
  def writePartitionedByDay(df: DataFrame, tsCol: String,
      path: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite).partitionBy("dt").parquet(path)

  /** The files a query ACTUALLY reads (distinct `input_file_name` over
    * the filtered frame) — the ground-truth pruning audit: a plan can
    * CLAIM PartitionFilters, this proves which directories were touched.
    * Driver-side result is bounded by the file count of the pruned scan.
    */
  def filesRead(df: DataFrame): Seq[String] =
    df.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSeq

  /** Sort-on-write flat re-layout: a GLOBAL `orderBy(tsCol)` (range
    * shuffle), so each output file covers a disjoint time range and —
    * the pp2 point — every parquet ROW GROUP inside each file carries
    * tight min/max statistics on `tsCol`. Directory partitioning (pp1)
    * prunes at the listing; this prunes INSIDE the files that survive:
    * a pushed time predicate lets the reader skip whole row groups from
    * the footer alone, the other half of the "scan ~1% of the year"
    * story. Timestamps are forced to INT64 TIMESTAMP_MICROS for the
    * write — Spark's default INT96 carries NO parquet statistics and
    * rejects predicate pushdown, which would silently disable skipping.
    * `blockSize` is deliberately small in tests so even the small SFs
    * span many row groups; production would keep the 128 MB default.
    */
  /** Serializes every writer that temporarily forces the session's
    * parquet timestamp type: the conf is SESSION-shared mutable state, so
    * two fixture builders interleaving could restore each other's value
    * or leak the temporary setting into unrelated writes. One lock per
    * JVM (fixture builds are rare, one-time, and not latency-sensitive).
    */
  private val timestampTypeLock = new Object

  private def withMicrosTimestamps[A](s: SparkSession)(body: => A): A =
    timestampTypeLock.synchronized {
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "TIMESTAMP_MICROS")
      try body
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }

  def writeTsSorted(df: DataFrame, tsCol: String, path: String,
      blockSize: Int = 128 * 1024 * 1024,
      pageRows: Int = 0, pageBytes: Int = 0): Unit =
    withMicrosTimestamps(df.sparkSession) {
      val w = df.orderBy(col(tsCol))
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", blockSize.toLong)
      val w2 = if (pageRows > 0)
        w.option("parquet.page.row.count.limit", pageRows.toLong) else w
      val w3 = if (pageBytes > 0)
        w2.option("parquet.page.size", pageBytes.toLong) else w2
      w3.parquet(path)
    }

  /** Range-partitioned sorted re-layout with an EXPLICIT file count: rows
    * are range-split on `sortCol` into `nFiles` partitions and sorted
    * within each, so every output file covers a disjoint range and every
    * row group carries tight min/max stats — [[writeTsSorted]]'s layout
    * with the file count under caller control (compaction needs to hit a
    * byte target; a global `orderBy` would leave the count to the shuffle
    * partition setting). Same TIMESTAMP_MICROS forcing (INT96 writes no
    * stats).
    */
  def writeRangeSorted(df: DataFrame, sortCol: String, nFiles: Int,
      path: String, blockSize: Int = 128 * 1024 * 1024): Unit =
    withMicrosTimestamps(df.sparkSession) {
      df.repartitionByRange(nFiles, col(sortCol))
        .sortWithinPartitions(col(sortCol))
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", blockSize.toLong)
        .parquet(path)
    }

  /** Bit-interleaved (Morton / Z-order) code of two non-negative integer
    * columns — `bits` low bits of each, column A on even positions. Pure
    * codegen'd builtins (shift/and/or fold), so the sort key costs one
    * projection.
    */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i)
        .bitwiseOR(shiftleft(
          shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Z-ORDERED flat re-layout: global sort on the Morton interleave of two
    * dimension keys, so row-group min/max stats are tight-ish on BOTH
    * columns at once — each gets ~√(full-sort) pruning power instead of
    * one column getting everything and the other nothing. This is the
    * layout for the two-filter access pattern (`user AND time window`,
    * `key AND day`) that a single-column sort (pp2) cannot serve. The
    * Morton key is computed, sorted on, and DROPPED — the written schema
    * is the input schema. Same TIMESTAMP_MICROS forcing as
    * [[writeTsSorted]] (INT96 would kill stats + pushdown).
    */
  def writeZOrdered(df: DataFrame, colA: Column, colB: Column, path: String,
      blockSize: Int = 128 * 1024 * 1024): Unit =
    withMicrosTimestamps(df.sparkSession) {
      df.withColumn("__z", mortonCode(colA, colB))
        .orderBy(col("__z")).drop("__z")
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", blockSize.toLong)
        .parquet(path)
    }

  /** Z-ordered MULTI-FILE re-layout: range-split on the Morton interleave
    * into exactly `nFiles` files, sorted within — the FILE-granular twin
    * of [[writeZOrdered]] (which optimizes row-group stats inside however
    * many files the sort emits). Each output file covers a contiguous
    * Morton range, so its min/max envelope is bounded on BOTH dimensions
    * at once — the layout a two-column file manifest
    * ([[Manifest.buildTs2]]) prunes with. One range shuffle, same price
    * as any sorted write.
    */
  def writeZOrderedFiles(df: DataFrame, colA: Column, colB: Column,
      nFiles: Int, path: String,
      blockSize: Int = 128 * 1024 * 1024): Unit =
    withMicrosTimestamps(df.sparkSession) {
      df.withColumn("__z", mortonCode(colA, colB))
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions(col("__z")).drop("__z")
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", blockSize.toLong)
        .parquet(path)
    }

  /** The PRODUCTION composite lake layout (pp4): Hive-partition by the
    * calendar day of `tsCol` AND z-order each partition's rows on the
    * Morton interleave of two dimension keys, so ONE scan composes every
    * pruning mechanism this library proves in isolation — runtime/static
    * directory pruning picks the `dt=` partitions (pp1/dpp1), then
    * row-group min/max stats inside each surviving partition skip groups
    * on BOTH z-order dimensions (pp2/pp3). `repartition(dt)` gives each
    * day exactly one task (one file per partition dir — at test scale;
    * production would hash into N files/day), and `sortWithinPartitions
    * (dt, z)` keeps the sort task-local: no global range shuffle, unlike
    * [[writeTsSorted]] — the write costs one hash shuffle regardless of
    * day count. Timestamps forced to TIMESTAMP_MICROS as everywhere else
    * (INT96 writes no stats).
    */
  def writePartitionedByDayZOrdered(df: DataFrame, tsCol: String,
      colA: Column, colB: Column, path: String,
      blockSize: Int = 128 * 1024 * 1024): Unit =
    withMicrosTimestamps(df.sparkSession) {
      df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
        .withColumn("__z", mortonCode(colA, colB))
        .repartition(col("dt"))
        .sortWithinPartitions(col("dt"), col("__z"))
        .drop("__z")
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", blockSize.toLong)
        .partitionBy("dt")
        .parquet(path)
    }

  /** PAGE-level footer audit (pp5): one `(file, rowCount, minMicros,
    * maxMicros)` per data PAGE of `column`, read from the parquet COLUMN
    * INDEX + OFFSET INDEX (parquet-format §ColumnIndex — the per-page
    * min/max structure written since parquet-mr 1.11) — the ground truth
    * for what a column-index-aware reader can skip INSIDE a row group,
    * one level below [[rowGroupStats]]. Page row counts come from the
    * offset index's first-row-index deltas. INT64 min/max decoded
    * little-endian (TIMESTAMP_MICROS / BIGINT columns).
    */
  def pageStats(spark: SparkSession, dir: String, column: String)
      : Seq[(String, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val files = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    files.flatMap { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try rd.getFooter.getBlocks.asScala.toSeq.flatMap { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .getOrElse(sys.error(s"column $column not in ${f.getName}"))
        val ci = rd.readColumnIndex(c)
        val oi = rd.readOffsetIndex(c)
        require(ci != null && oi != null,
          s"no column/offset index for $column in ${f.getName} — " +
            "page skipping impossible")
        def le64(buf: java.nio.ByteBuffer): Long =
          buf.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong(0)
        val n = oi.getPageCount
        (0 until n).map { i =>
          require(!ci.getNullPages.get(i), "all-null page in audit column")
          val first = oi.getFirstRowIndex(i)
          val rows =
            (if (i + 1 < n) oi.getFirstRowIndex(i + 1) else b.getRowCount) -
              first
          (f.getName, rows, le64(ci.getMinValues.get(i)),
            le64(ci.getMaxValues.get(i)))
        }
      } finally rd.close()
    }
  }

  /** Footer-level row-group audit for [[writeTsSorted]] layouts: one
    * `(file, rowCount, minMicros, maxMicros)` per row group of `column`,
    * read straight from the parquet footers — the ground truth for what
    * a min/max-pruning reader COULD skip, independent of any engine.
    * Driver-side work is proportional to file count (footers only, no
    * row data).
    */
  def rowGroupStats(spark: SparkSession, dir: String, column: String)
      : Seq[(String, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val files = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    files.flatMap { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try rd.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .getOrElse(sys.error(s"column $column not in ${f.getName}"))
        val st = c.getStatistics
        require(st != null && st.hasNonNullValue,
          s"no stats for $column in ${f.getName} — skipping impossible")
        (f.getName, b.getRowCount,
          st.genericGetMin.asInstanceOf[Number].longValue(),
          st.genericGetMax.asInstanceOf[Number].longValue())
      } finally rd.close()
    }
  }

  /** Per-FILE zone of `column` over explicit paths, Hadoop-portable
    * (footers via `HadoopInputFile`, no `java.io.File`): one
    * `(fileName, rowCount, Some((min, max)))` per path, or `None` when
    * the column is absent, carries no statistics, or is all-null in ANY
    * row group — callers must treat `None` as "cannot prune; touch the
    * file", never as an error (the conservative contract
    * [[graft.sources.Snapshots]] plans mutations with). Long-typed
    * columns only (INT64 / TIMESTAMP_MICROS / INT32 widened); a
    * non-numeric column yields `None` rather than throwing.
    */
  /** Thread-local count of driver-side parquet FOOTER opens — a TEST
    * hook proving plan-time metadata bounds (commit-time manifest stats
    * must make zone planning footer-free). Thread-local because the
    * shared test JVM runs suites in parallel; every footer open in this
    * object happens on the calling driver thread.
    */
  val footerReads: ThreadLocal[java.util.concurrent.atomic.AtomicLong] =
    ThreadLocal.withInitial(() => new java.util.concurrent.atomic.AtomicLong)

  /** ONE footer open computing everything a manifest file entry needs:
    * row count, schema fingerprint (MD5 of the footer schema), the
    * min/max zone of each requested long-typed column, and the
    * TRUNCATED string zone ([[graft.sources.Snapshots.StrZone]] —
    * Iceberg-style 16-byte prefix lower / prefix-successor upper bounds)
    * of each requested BINARY/UTF8 column. Columns whose stats are
    * missing or unusable are omitted from both maps — the conservative
    * must-touch contract. The commit-time twin of [[fileZones]]:
    * production formats stamp these stats into the manifest at commit so
    * PLANNING never re-opens a footer.
    */
  def fileStatsEntry(spark: SparkSession, path: String, cols: Seq[String])
      : (Long, String, Map[String, (Long, Long)],
        Map[String, Snapshots.StrZone], Map[String, Long]) = {
    footerReads.get().incrementAndGet()
    fileStatsEntryConf(path, spark.sessionState.newHadoopConf(), cols)
  }

  /** [[fileStatsEntry]] against an explicit Hadoop conf — the
    * EXECUTOR-side form the DSv2 write path stamps stats with (the task
    * that just wrote a file reads its own footer once, page-cache hot,
    * so the driver's commit is metadata-only). Does not bump
    * [[footerReads]]: that counter proves PLAN-time footer-freedom on
    * the driver thread; a write-time executor open is not plan I/O.
    */
  def fileStatsEntryConf(path: String,
      conf: org.apache.hadoop.conf.Configuration, cols: Seq[String])
      : (Long, String, Map[String, (Long, Long)],
        Map[String, Snapshots.StrZone], Map[String, Long]) = {
    import scala.jdk.CollectionConverters._
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf))
    try {
      val blocks = rd.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val fp = fingerprintOf(
        rd.getFooter.getFileMetaData.getSchema.toString)
      // per requested column: the exact NULL count summed over blocks —
      // stamped only when EVERY block's stats report it (parquet's
      // isNumNullsSet; a -1/unset count means unknown, never zero).
      // Null counts are what turn zone bounds into FULL-COVERAGE
      // proofs: "[min,max] inside the predicate" only proves every
      // NON-NULL row matches — a metadata-only SQL DELETE additionally
      // needs nulls == 0 (a NULL row never satisfies a comparison and
      // must be KEPT).
      val nulls: Map[String, Long] = cols.flatMap { column =>
        val per = blocks.map { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column) match {
            case Some(c) if c.getStatistics != null &&
                c.getStatistics.isNumNullsSet &&
                c.getStatistics.getNumNulls >= 0L =>
              Some(c.getStatistics.getNumNulls)
            case _ => None
          }
        }
        if (per.isEmpty || per.exists(_.isEmpty)) None
        else Some(column -> per.flatten.sum)
      }.toMap
      // per requested column: the per-block (min, max) stat values, or
      // None when any block lacks usable stats for it
      def blockStats(column: String): Option[Seq[(Any, Any)]] = {
        val zs = blocks.map { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column) match {
            case Some(c) if c.getStatistics != null &&
                c.getStatistics.hasNonNullValue =>
              Some((c.getStatistics.genericGetMin,
                c.getStatistics.genericGetMax))
            case _ => None
          }
        }
        if (zs.isEmpty || zs.exists(_.isEmpty)) None else Some(zs.flatten)
      }
      val zones = cols.flatMap { column =>
        blockStats(column).flatMap { zs =>
          val nums = zs.map {
            case (mn: Number, mx: Number) =>
              Some((mn.longValue(), mx.longValue()))
            case _ => None
          }
          if (nums.exists(_.isEmpty)) None
          else Some(column ->
            (nums.flatten.map(_._1).min, nums.flatten.map(_._2).max))
        }
      }.toMap
      val szones = cols.flatMap { column =>
        blockStats(column).flatMap { zs =>
          val bins = zs.map {
            case (mn: org.apache.parquet.io.api.Binary,
                mx: org.apache.parquet.io.api.Binary) =>
              Some((mn.getBytes, mx.getBytes))
            case _ => None
          }
          if (bins.exists(_.isEmpty)) None
          else {
            val min = bins.flatten.map(_._1)
              .minBy(identity)(byteOrdering)
            val max = bins.flatten.map(_._2)
              .maxBy(identity)(byteOrdering)
            Snapshots.StrZone.ofBytes(min, max).map(column -> _)
          }
        }
      }.toMap
      (rows, fp, zones, szones, nulls)
    } finally rd.close()
  }

  /** Unsigned lexicographic byte order — the UTF-8/binary collation the
    * string zones compare in.
    */
  private val byteOrdering: Ordering[Array[Byte]] =
    (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)

  private def fingerprintOf(schema: String): String =
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5")
        .digest(schema.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  def fileZones(spark: SparkSession, paths: Seq[String], column: String)
      : Seq[(String, Long, Option[(Long, Long)])] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    paths.map { p =>
      footerReads.get().incrementAndGet()
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), conf))
      try {
        val blocks = rd.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val zs = blocks.map { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column) match {
            case Some(c) if c.getStatistics != null &&
                c.getStatistics.hasNonNullValue =>
              (c.getStatistics.genericGetMin, c.getStatistics.genericGetMax)
                match {
                case (mn: Number, mx: Number) =>
                  Some((mn.longValue(), mx.longValue()))
                case _ => None
              }
            case _ => None
          }
        }
        val zone =
          if (zs.isEmpty || zs.exists(_.isEmpty)) None
          else Some((zs.flatten.map(_._1).min, zs.flatten.map(_._2).max))
        (new org.apache.hadoop.fs.Path(p).getName, rows, zone)
      } finally rd.close()
    }
  }

  /** Parquet footer-schema fingerprint of one file, memoized on
    * `(path, length, modificationTime)` — lakehouse data files are
    * write-once, but a PATH can be rebuilt under the same name (a
    * fixture dir regenerated in-JVM, a source re-copied), and a memo
    * keyed on path alone would then serve a stale uniform verdict and
    * silently misread evolved schemas. Used by
    * [[graft.sources.Snapshots.read]] to take the plain-read fast path
    * when every referenced file shares one physical schema — a
    * `mergeSchema` read on a uniform table pays a distributed
    * footer-union for nothing. Production table formats stamp this in
    * the manifest at commit time ([[graft.sources.Snapshots]] now does —
    * this footer fallback covers pre-stats manifests and bare dirs).
    */
  def schemaFingerprint(spark: SparkSession, path: String): String = {
    val st = LakeFs.fs(path).getFileStatus(
      new org.apache.hadoop.fs.Path(path))
    val key = s"$path|${st.getLen}|${st.getModificationTime}"
    // superseded keys (rebuilt paths) are never individually evicted;
    // cap the memo so a long-lived driver cannot grow it unboundedly —
    // a clear only costs re-reading footers once
    if (schemaFpMemo.size > 65536) schemaFpMemo.clear()
    schemaFpMemo.getOrElseUpdate(key, {
      footerReads.get().incrementAndGet()
      val conf = spark.sessionState.newHadoopConf()
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(path), conf))
      try fingerprintOf(rd.getFooter.getFileMetaData.getSchema.toString)
      finally rd.close()
    })
  }

  private val schemaFpMemo =
    scala.collection.concurrent.TrieMap.empty[String, String]
}
