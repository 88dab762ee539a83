package graft.sources

import graft.operators.SequencePack
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Token-budget training-shard export: the materialized form of
  * [[graft.operators.SequencePack]] — documents land, in deterministic id
  * order, in numbered shards whose token mass stays within the greedy
  * concat-and-chunk bound (budget + one document), written one directory
  * per shard through Spark's native partitioned sink.
  *
  * Layout: `<root>/shard=<k>/part-*` — what a streaming training loader
  * consumes shard-by-shard, and still ONE partitioned table on re-read:
  * a `shard = k` predicate prunes to a single directory per loader rank
  * (partition pruning, no file listing beyond the hit).
  *
  * Scale: the assignment is the two-level chunked prefix sum (no
  * corpus-wide sort, no single-task window); the sink writes task-local
  * files inside each shard directory by default. `compact = true` adds
  * one shuffle on the shard id to get file-per-shard output — pay it only
  * when the loader insists on single files.
  *
  * Never-overwrite: `ErrorIfExists`, the [[Versioned]] discipline — an
  * existing export is never clobbered.
  */
object Shards {

  /** Write `docs` into token-budget shards under `root`; returns the
    * shard manifest (shard, n_docs, shard_tokens, first_doc, last_doc) —
    * what a loader needs to plan an epoch without re-deriving the packing.
    * `docs` must carry a unique non-negative long `idCol` (the pack
    * order) and a long `tokCol`.
    */
  def writeTokenShards(
      docs: DataFrame,
      idCol: String,
      tokCol: String,
      root: String,
      budget: Long,
      chunkWidth: Long = 65536L,
      format: String = "parquet",
      compact: Boolean = false): DataFrame = {
    // The assignment feeds BOTH the write and the manifest — cache it for
    // the pair of actions instead of running the prefix-sum plan twice.
    // EXECUTION CONTRACT (the minhashLsh contract): runs eagerly; the
    // returned manifest is cached and caller-owned; intermediates are
    // released before returning.
    val assigned = SequencePack
      .packAssignments(docs, idCol, tokCol, budget, chunkWidth)
      .withColumnRenamed("seq_id", "shard")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val writer = if (compact) assigned.repartition(col("shard")) else assigned
    writer.write.mode(SaveMode.ErrorIfExists)
      .partitionBy("shard").format(format).save(root)
    val manifest = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokCol)).as("shard_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
      .persist()
    manifest.count()
    assigned.unpersist(blocking = false)
    manifest
  }

  /** Read an export back as one partitioned table (the `shard` partition
    * column is reconstructed from the directory layout).
    */
  def readShards(spark: org.apache.spark.sql.SparkSession, root: String,
                 format: String = "parquet"): DataFrame =
    spark.read.format(format).load(root)
}
