package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Durable persistence for trained BPE merge tables — the tokenizer is the
  * third session-spanning artifact of a rolling corpus pipeline (alongside
  * [[Dedup.LshIndex]] / [[Dedup.SemIndex]]): token budgets (mix2b), packed
  * shards (sq1b) and fertility audits (tok2) are only comparable ACROSS
  * crawls if every session tokenizes with the same merge table, and
  * training one ([[graft.functions.BpeVocab.train]]) is a corpus-scan-
  * per-merge cost nobody wants to repay per session. Same lineage layout as
  * the index stores (`path/epoch=N/` + sidecar, append-only, sidecar
  * written last so torn saves are invisible); a merge table is KBs, so the
  * frame is written single-file and reloads driver-side.
  *
  * The reference has no tokenizer at all (whitespace splits in pandas,
  * `tool_call_agent.py:131-141`) — this is part of the training-data
  * surface the brief adds beyond it.
  */
object BpeStore {

  /** Write `merges` as the next epoch of `path`; returns the epoch dir.
    * Rank is the merge's position — the load order of record.
    */
  def save(spark: SparkSession, merges: Seq[(String, String)],
      path: String): String = {
    import spark.implicits._
    val dir = IndexStore.nextEpochDir(spark, path)
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1) // KB-sized by construction — one file per epoch
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$dir/merges")
    IndexStore.writeSidecar(spark, dir,
      s"""{"kind":"bpe","numMerges":${merges.size}}""")
    dir
  }

  /** Reload the newest complete epoch's merge table, in rank order. The
    * returned list feeds the BPE kernels directly; first use re-runs
    * [[graft.functions.BpeVocab.Table]]'s structural validation, so a
    * corrupted lineage fails loudly rather than tokenizing differently.
    */
  def load(spark: SparkSession, path: String): Seq[(String, String)] = {
    val (dirs, meta) = IndexStore.snapshotAndDeltas(spark, path, "bpe")
    val rows = spark.read.parquet(s"${dirs.head}/merges")
      .orderBy("rank").collect()
    val expected = IndexStore.jsonInt(meta, "numMerges")
    require(rows.length == expected,
      s"bpe lineage ${dirs.head}: ${rows.length} merges, sidecar says $expected")
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }
}
