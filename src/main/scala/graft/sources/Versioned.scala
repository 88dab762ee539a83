package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** The reference's never-overwrite versioned-output discipline
  * (`tool_call_agent.py:139-140`, re-expressed for CSV in [[Csv]]) applied
  * to the engine's native columnar outputs: each write lands beside its
  * input under the same `_<suffix>` lineage convention, `ErrorIfExists`
  * guarantees an existing version is never clobbered, and
  * [[latestVersion]] resolves the newest lineage member for re-reads.
  * Works for any directory-shaped Spark sink (parquet, ORC, JSON).
  */
object Versioned {

  /** Write the next lineage version of `inputPath`; returns the path
    * written. Fails (rather than overwrites) if that version exists —
    * race-free versioning needs a coordinator; this matches the
    * reference's single-writer semantics.
    */
  def writeVersioned(
      df: DataFrame,
      inputPath: String,
      suffix: String = "clean",
      format: String = "parquet"
  ): String = {
    val out = Csv.versionedPath(inputPath, suffix)
    df.write.mode(SaveMode.ErrorIfExists).format(format).save(out)
    out
  }

  /** Newest existing member of the lineage (`x.parquet`,
    * `x_clean.parquet`, `x_clean_clean.parquet`, …). Existence is probed
    * via the Hadoop FileSystem for the path's scheme, so any URI
    * [[writeVersioned]] can write (local, `hdfs://`, `s3a://`) resolves
    * consistently.
    */
  def latestVersion(inputPath: String, suffix: String = "clean"): String =
    Csv.latestVersion(inputPath, suffix)
}
