package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents, in a deterministic global order, to
  * fixed token-budget training sequences (a doc lands in the sequence where
  * its running token count starts — the greedy concat-and-chunk policy every
  * LLM pretraining loader uses; cf. the reference's corpus-prep intent,
  * tool_call_agent.py:131-141, which stops at per-doc stats).
  *
  * The hard part at scale is the GLOBAL running sum: a single
  * `Window.orderBy(id)` with no partition spec plans as one task holding the
  * whole corpus — fine at sf0.1, dead at 100 TB. This implements the classic
  * two-level distributed prefix sum instead:
  *
  *   1. chunk docs by `id div chunkWidth` (map-only, order-aligned with id);
  *   2. one aggregate gives per-chunk token totals (corpus-size / chunkWidth
  *      rows — tiny by construction);
  *   3. an unpartitioned prefix window over ONLY that tiny chunk frame
  *      yields each chunk's global offset (single task over n/chunkWidth
  *      rows; at 10^10 docs and chunkWidth 10^5 that is 10^5 rows — trivial,
  *      and the construction recurses if it ever is not);
  *   4. broadcast the offsets back and run the within-chunk prefix window
  *      partitioned BY chunk — every task holds ≤ chunkWidth rows.
  *
  * Net: two scans of the (id, tok) projection, one tiny aggregate, zero
  * corpus-wide sorts. Every step is deterministic (no sampling-based range
  * partitioning), so the assignment is bit-stable across runs and engines —
  * the property that lets DuckDB replay it as a plain windowed running sum.
  */
object SequencePack {

  /** Per-doc sequence assignment. `docs` must have a unique non-negative
    * long `idCol` (the pack order) and a long `tokCol`; adds `seq_id` =
    * floor(prefix-sum-before / budget). Long arithmetic throughout: at
    * 10^10 docs × 10^4 tokens the running sum is 10^14 ≪ 2^63.
    */
  def packAssignments(docs: DataFrame, idCol: String, tokCol: String,
                      budget: Long, chunkWidth: Long): DataFrame = {
    require(budget > 0 && chunkWidth > 0, s"budget=$budget chunkWidth=$chunkWidth")
    val id: Column = col(idCol)
    val chunked = docs.withColumn("__chunk", expr(s"$idCol div $chunkWidth"))
    val chunkTotals = chunked.groupBy(col("__chunk"))
      .agg(sum(col(tokCol)).as("__ctot"))
    // Tiny frame (n/chunkWidth rows) — the one unpartitioned window, by design.
    val wChunks = Window.orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunkTotals
      .withColumn("__coff", coalesce(sum(col("__ctot")).over(wChunks), lit(0L)))
      .select(col("__chunk"), col("__coff"))
    val wIn = Window.partitionBy(col("__chunk")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunked.join(broadcast(offsets), "__chunk")
      .withColumn("__before",
        col("__coff") + coalesce(sum(col(tokCol)).over(wIn), lit(0L)))
      .withColumn("seq_id", expr(s"__before div ${budget}L"))
      .drop("__chunk", "__coff", "__before")
  }

  /** Per-sequence manifest: how many docs landed in each budget-sized
    * sequence, their token mass, and the id span — what a loader needs to
    * fetch a sequence's members without re-deriving the packing.
    */
  def packManifest(docs: DataFrame, idCol: String, tokCol: String,
                   budget: Long, chunkWidth: Long): DataFrame =
    packAssignments(docs, idCol, tokCol, budget, chunkWidth)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokCol)).as("seq_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Deterministic weight-proportional sampling WITHOUT randomness:
    * systematic (fixed-stride) selection over the id-ordered cumulative
    * weight axis. With `stride = totalWeight div k`, a row is selected iff
    * its weight interval `[before, before + w)` crosses a stride boundary
    * — so selection probability is proportional to weight, exactly `k`
    * (±1) rows come back, and reruns pick the identical set (the registry
    * reproducibility contract; random reservoir/A-ES sampling cannot be
    * replayed across engines).
    *
    * Scale shape: the global cumulative uses [[packAssignments]]'s
    * two-level chunked prefix decomposition — the only unpartitioned
    * window runs over the tiny chunk-totals frame; everything row-wise is
    * map-only after one broadcast join. Zero-weight rows are never
    * selected. Output: input columns + `sample_rank` (the 0-based index
    * of the crossed boundary).
    */
  def systematicSample(docs: DataFrame, idCol: String, wCol: String,
      k: Long, chunkWidth: Long = 100000L): DataFrame = {
    require(k > 0, s"k=$k")
    val id: Column = col(idCol)
    val chunked = docs.withColumn("__chunk", expr(s"$idCol div $chunkWidth"))
    // tiny (n/chunkWidth rows) but read twice (offsets window + grand
    // total) — checkpoint so the input is scanned once for the totals
    val chunkTotals = chunked.groupBy(col("__chunk"))
      .agg(sum(col(wCol)).as("__ctot"))
      .localCheckpoint()
    val wChunks = Window.orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunkTotals
      .withColumn("__coff", coalesce(sum(col("__ctot")).over(wChunks), lit(0L)))
      .select(col("__chunk"), col("__coff"))
    val total = chunkTotals.agg(sum(col("__ctot")).as("__tot"))
    val wIn = Window.partitionBy(col("__chunk")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunked.join(broadcast(offsets), "__chunk")
      .crossJoin(broadcast(total))
      .withColumn("__stride", expr(s"greatest(__tot div ${k}L, 1L)"))
      .withColumn("__before",
        col("__coff") + coalesce(sum(col(wCol)).over(wIn), lit(0L)))
      .where(expr(s"(__before + $wCol) div __stride") >
        expr("__before div __stride"))
      .withColumn("sample_rank", expr("__before div __stride"))
      .drop("__chunk", "__coff", "__tot", "__stride", "__before")
  }
}
