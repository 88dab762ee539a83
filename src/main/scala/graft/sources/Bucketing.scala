package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
}
