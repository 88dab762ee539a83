package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
