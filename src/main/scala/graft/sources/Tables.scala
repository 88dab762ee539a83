package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf{N}/{table}.parquet`, see TESTDATA.md).
  *
  * Thin by design: `spark.read.parquet` already gives us vectorized columnar
  * scans, predicate pushdown, column pruning and partition pruning via
  * Catalyst — nothing to add for the 100 TB path except *not* getting in the
  * way (no eager caching, no collect).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
