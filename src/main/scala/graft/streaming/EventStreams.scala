package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props — TESTDATA.md).
  *
  * The reference has no streaming surface (SURVEY.md §2.5 "absent"); this is
  * the north-star extension: watermarked windowed aggregation and custom
  * sessionization state, written Spark-first so the same code runs against
  * Kafka/files at scale by swapping the source.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  final case class SessionUpdate(user_id: Long, sessionStart: java.sql.Timestamp,
      nEvents: Long, totalValue: Double, closed: Boolean)
  final case class Sess(start: Long, last: Long, n: Long, total: Double)

  def readEventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window counts/sums per event type with a watermark: the
    * canonical streaming agg. State is bounded by (watermark horizon ×
    * event types).
    *
    * `exactScale = Some(s)` switches the value total to scaled-long exact
    * accumulation (floor(v*s+0.5) summed as BIGINT, divided once) — the
    * engine's `lsum` construction: associative, so the total is independent
    * of micro-batch arrival order AND bit-identical to the batch twin
    * (`Queries.e1HourlyTotals`), which StreamingSpec proves. The default
    * double sum is fine for dashboards; use the exact path when stream and
    * batch outputs must reconcile exactly.
    */
  def windowedTotals(events: DataFrame,
      windowLen: String = "1 hour", watermark: String = "2 hours",
      exactScale: Option[Double] = None): DataFrame = {
    val total = exactScale match {
      case Some(s) =>
        (sum(floor(col("value") * lit(s) + lit(0.5))).cast("double") / lit(s))
          .as("total_value")
      case None => sum(col("value")).as("total_value")
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), total)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Custom per-user session state via flatMapGroupsWithState: a session
    * closes after `gapMinutes` of event-time inactivity. Within each batch
    * the group's events are processed in event-time order; an event more
    * than the gap after the open session's last event closes it and starts a
    * new one. The still-open session stays in state (absorbing later
    * batches; a late event inside its span merges in) and is flushed by an
    * EVENT-TIME TIMEOUT once the watermark passes its last event + gap.
    *
    * Append-mode contract: only CLOSED sessions are ever emitted (each
    * exactly once) — Append sinks treat rows as final, so emitting an open
    * session every batch would double-count any consumer summing
    * nEvents/totalValue. Open-session progress reporting belongs to an
    * Update-mode sink, not here. A final session whose `last + gap` the
    * watermark never passes stays in state unemitted — the stream can't
    * prove it over. `closed` is retained in the schema (always true) so the
    * output unions cleanly with batch sessionizations that do report open
    * tails.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "0 seconds"): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L
    events.withWatermark("ts", watermark).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Sess, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Sess]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: no on-time event can extend it
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, new java.sql.Timestamp(s.start),
              s.n, s.total, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case Some(s) if t - s.last > gapMs =>
                  out += SessionUpdate(userId, new java.sql.Timestamp(s.start),
                    s.n, s.total, closed = true)
                  Some(Sess(t, t, 1L, e.value))
                case Some(s) =>
                  Some(Sess(math.min(s.start, t), math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case None => Some(Sess(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.iterator
          }
      }
      .toDF()
  }

  final case class FunnelProgress(reached: Int, lastTs: Long)
  final case class FunnelUpdate(user_id: Long, step: Long,
      event_type: String, reachedTs: java.sql.Timestamp)

  /** Streaming strictly-ordered funnel — the incremental face of
    * [[graft.operators.Funnel.funnel]]: per user, emit one row the moment
    * each NEXT funnel step is reached (an event of `steps(i)` strictly
    * after the step-(i−1) reach time), across micro-batches. State per
    * user is two numbers (steps reached, reach time) — bounded by user
    * cardinality, never event volume — and is removed once the funnel
    * completes.
    *
    * Same-batch cascades work (a batch containing sign-up → activate →
    * purchase in order emits all three); the strictly-after rule uses
    * event time, so an out-of-order straggler older than the current
    * reach time does not advance the funnel. Deterministic per-batch
    * processing order: `(ts, event_id)`.
    *
    * State hygiene (the 100 TB story): a user who never reaches step 0
    * registers NO state (their events cost a group invocation, not an
    * entry in the state store — at web scale most users never enter the
    * funnel, so this is the difference between state ∝ funnel entrants
    * and state ∝ all users). Completion removes state. For users who
    * enter and then stall forever, pass `evictAfter` (e.g. "30 days") to
    * evict their entry on a processing-time timeout — an evicted user who
    * later advances restarts from step 0, the standard re-entry
    * trade-off; None keeps stalled entrants indefinitely.
    */
  /** The per-group state transition behind [[funnelStream]], factored out
    * so the state-hygiene contract (no state for non-entrants, removal on
    * completion and on timeout, eviction-clock refresh) is unit-testable
    * with `TestGroupState` — a live ProcessingTimeTimeout cannot be
    * forced deterministically inside a streaming test.
    */
  private[graft] def funnelStep(stepArr: Array[String],
      evictAfter: Option[String])(
      userId: Long, rows: Iterator[Event],
      state: GroupState[FunnelProgress]): Iterator[FunnelUpdate] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var p = state.getOption.getOrElse(FunnelProgress(0, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[FunnelUpdate]
      sorted.foreach { e =>
        if (p.reached < stepArr.length &&
            e.event_type == stepArr(p.reached) &&
            (p.reached == 0 || e.ts.getTime > p.lastTs)) {
          p = FunnelProgress(p.reached + 1, e.ts.getTime)
          out += FunnelUpdate(userId, p.reached.toLong, e.event_type, e.ts)
        }
      }
      if (p.reached >= stepArr.length) state.remove()
      else if (p.reached > 0) {
        // Only funnel ENTRANTS hold state; refresh the eviction clock on
        // every batch that touches the user.
        if (!state.getOption.contains(p)) state.update(p)
        evictAfter.foreach(state.setTimeoutDuration)
      }
      out.iterator
    }

  def funnelStream(spark: SparkSession, events: DataFrame,
      steps: Seq[String], evictAfter: Option[String] = None): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty)
    val stepArr = steps.toArray
    val timeoutConf =
      if (evictAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.as[Event]
      .filter(e => stepArr.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelUpdate](
        OutputMode.Append(), timeoutConf)(funnelStep(stepArr, evictAfter))
      .toDF()
  }

  /** Streaming exact dedup: drop events already seen within the watermark
    * horizon (state is bounded by horizon × key cardinality — the streaming
    * face of the batch dedup family).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates(keyCols :+ "ts")

  /** STREAM-STREAM interval join — the attribution shape (each left
    * event matched to the right events of the same key in the trailing
    * `within` window): clicks⋈impressions, purchases⋈campaign touches.
    * Spark keeps BOTH sides' state; the watermark plus the closed time
    * interval is what lets it evict — state is bounded by
    * (watermark + within) × arrival rate, never the stream's history.
    * Inner join, so matches emit as soon as both rows have arrived; the
    * watermark only governs state cleanup, not result completeness.
    */
  def joinWithin(left: DataFrame, right: DataFrame,
      keyCol: String = "user_id", within: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    joinWithinImpl(left, right, keyCol, within, watermark, "inner")

  /** LEFT OUTER stream-stream interval join — the attribution shape users
    * actually run: every left event emits, matched rows as soon as both
    * sides arrive, UNMATCHED rows null-extended only once the watermark
    * proves no qualifying right row can still arrive (for this trailing
    * window that is watermark > left.ts — the interval's upper bound is
    * the left row's own time, so state for a left row closes exactly one
    * watermark delay after it). This is the semantically hard case: the
    * null results are emitted BY THE WATERMARK, not by data — a finite
    * stream that never advances its watermark past its last real rows
    * will hold the stragglers in state forever (correctly). Same state
    * bound as the inner flavor: (watermark + within) × arrival rate.
    */
  def joinWithinOuter(left: DataFrame, right: DataFrame,
      keyCol: String = "user_id", within: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    joinWithinImpl(left, right, keyCol, within, watermark, "left_outer")

  private def joinWithinImpl(left: DataFrame, right: DataFrame,
      keyCol: String, within: String, watermark: String,
      joinType: String): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
        s"l.$keyCol = r.$keyCol AND " +
          s"r.ts >= l.ts - INTERVAL $within AND r.ts <= l.ts"), joinType)
      .select(col(s"l.$keyCol").as(keyCol),
        col("l.event_id").as("left_id"), col("r.event_id").as("right_id"),
        col("l.ts").as("left_ts"), col("r.ts").as("right_ts"))
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension (user profile, allow/deny list, per-user aggregates). Spark
    * plans this without stream-side state — each micro-batch joins against
    * the static side, which should be broadcast when it is dimension-sized
    * (pass `broadcastDim = true`, the default). Left join keeps events with
    * no dimension row (the 100 TB norm: dims lag the stream).
    */
  def enrich(events: DataFrame, dim: DataFrame, on: Seq[String],
      broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    events.join(d, on, "left")
  }

  /** Streaming incremental dedup — the streaming face of
    * [[graft.operators.TextPipeline.incrementalDedup]]: each micro-batch's
    * documents are fingerprinted (map-only), dropped when the fingerprint
    * already exists in the static corpus index (stream-static anti-join —
    * NO stream-side state; the static side is re-read per batch and should
    * be a bucketed/broadcastable index table), then first-wins deduped
    * against fingerprints seen earlier in the stream (`dropDuplicates`
    * state — bound it by adding an ingest-time watermark column at scale,
    * as [[dedupStream]] does for events).
    *
    * Survivor policy differs from the batch operator BY DESIGN: a stream
    * cannot know a later smaller id is coming, so it keeps the FIRST
    * arrival per fingerprint, not the min id. The surviving fingerprint
    * SET is identical (StreamingSpec proves it against the batch twin);
    * only which duplicate represents the set can differ.
    */
  def incrementalDedupStream(docs: DataFrame, textCol: String,
      index: DataFrame): DataFrame =
    docs.withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .join(index.select(col("fp")), Seq("fp"), "left_anti")
      .dropDuplicates(Seq("fp"))

  /** Streaming incremental NEAR-dedup — the streaming face of
    * [[graft.operators.Dedup.incrementalNearDup]]: each micro-batch runs
    * the full batch operator against the static [[graft.operators.Dedup
    * .LshIndex]] (guarded bucket probe + Jaccard verify + within-batch
    * keep-first) and `onBatch` receives the batch's SURVIVORS. foreachBatch
    * is the right seam here, not a streaming join: near-dedup needs a
    * bucket self-join plus candidate verification — shapes append-mode
    * streaming joins cannot express without unbounded state — and per-batch
    * execution is exactly how a rolling crawl consumes the index anyway.
    *
    * Cross-batch near-dups are caught against the INDEX only — this
    * static-index variant never refreshes, so two near-dup docs arriving
    * in DIFFERENT batches both survive. When the stream should dedup
    * against everything it has already admitted, use
    * [[incrementalNearDupStreamWithRefresh]], which appends each batch's
    * survivors to the index before the next batch runs.
    */
  def incrementalNearDupStream(docs: DataFrame, idCol: String, textCol: String,
      index: graft.operators.Dedup.LshIndex, threshold: Double = 0.9)(
      onBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val m = graft.operators.Dedup.incrementalNearDup(
          batch, idCol, textCol, index, threshold)
        val survivors = batch.join(
          m.select(col("batch_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
        onBatch(survivors)
        m.unpersist(blocking = false)
        ()
      }
      .start()

  /** Mutable handle for the streaming index-refresh loop: foreachBatch
    * swaps in the appended index after each micro-batch (micro-batches run
    * serially, so the swap is race-free; volatile makes the final handle
    * visible to the caller's thread after the query terminates). The
    * caller owns whatever index the ref holds — close it when done.
    */
  final class LshIndexRef(@volatile var index: graft.operators.Dedup.LshIndex)

  /** [[incrementalNearDupStream]] plus the in-engine index-refresh loop:
    * after each micro-batch's survivors are emitted, their signatures are
    * appended to the index ([[graft.operators.Dedup.LshIndex.append]] —
    * one scan of the batch text, the corpus side untouched), so a
    * near-dup arriving in a LATER batch is caught against an EARLIER
    * batch's survivor, not just against the original corpus. Dropped docs
    * are NOT appended — greedy keep-first semantics: the index only ever
    * holds admitted representatives. StreamingSpec proves the two-batch
    * cross-batch catch.
    */
  def incrementalNearDupStreamWithRefresh(
      docs: DataFrame, idCol: String, textCol: String,
      indexRef: LshIndexRef, threshold: Double = 0.9,
      // A lineage path makes the refresh DURABLE: each batch's survivors
      // are checkpointed as a delta epoch inside foreachBatch (batch-sized
      // I/O), so a restarted stream rebuilds its ref from
      // [[graft.operators.Dedup.loadLshIndex]] and resumes with every
      // prior batch's admissions intact — the index no longer dies with
      // the session. None = in-session refresh only (the prior behavior).
      checkpointTo: Option[String] = None)(
      onBatch: DataFrame => Unit): StreamingQuery =
    // Default (processing-time) trigger, not AvailableNow: the refresh
    // loop's point is to keep serving batches as the crawl produces them;
    // the caller stops the query.
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val idx = indexRef.index
        val m = graft.operators.Dedup.incrementalNearDup(
          batch, idCol, textCol, idx, threshold)
        val survivors = batch.join(
          m.select(col("batch_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
        onBatch(survivors)
        indexRef.index = idx.append(survivors, idCol, textCol, checkpointTo)
        m.unpersist(blocking = false)
        ()
      }
      .start()

  /** Mutable handle for the FUZZY index-refresh loop — the [[LshIndexRef]]
    * twin for [[graft.operators.FuzzyJoin.FuzzyIndex]].
    */
  final class FuzzyIndexRef(
    @volatile var index: graft.operators.FuzzyJoin.FuzzyIndex)

  /** Streaming incremental FUZZY dedup with the in-engine refresh loop —
    * the edit-distance member of the refresh family (near-dup lexical,
    * SemDeDup semantic): each micro-batch runs [[graft.operators.FuzzyJoin
    * .incrementalFuzzyDedup]] against the current deletion-variant index,
    * `onBatch` receives the survivors, and the survivors are appended
    * (batch-sized variant explode; indexed strings untouched) before the
    * next batch runs — a typo variant arriving later is caught against an
    * earlier batch's admitted string. Same durable-refresh contract:
    * with `checkpointTo`, each batch's admissions land as a delta epoch
    * and a restarted stream resumes from
    * [[graft.operators.FuzzyJoin.loadFuzzyIndex]].
    */
  def incrementalFuzzyDedupStreamWithRefresh(
      docs: DataFrame, idCol: String, strCol: String,
      indexRef: FuzzyIndexRef,
      checkpointTo: Option[String] = None)(
      onBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val idx = indexRef.index
        val m = graft.operators.FuzzyJoin.incrementalFuzzyDedup(
          batch, idCol, strCol, idx)
        val survivors = batch.join(
          m.select(col("batch_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
        onBatch(survivors)
        indexRef.index = idx.append(survivors, idCol, strCol, checkpointTo)
        m.unpersist(blocking = false)
        ()
      }
      .start()

  /** Streaming distribution-drift monitor: every micro-batch's categorical
    * distribution on `column` is compared against a FIXED reference
    * snapshot through [[graft.operators.Drift.categoricalDrift]] —
    * `onBatch` receives `(batchId, evidence frame)` with per-category
    * counts, shares, and the rational divergence term, the alerting seam
    * a crawl pipeline uses to notice a source/language-mix shift BEFORE
    * admitting a batch to the corpus. The reference side is batch-scope
    * static (tiny per-category counts recomputed per micro-batch against
    * a cached snapshot frame); state never accumulates in the stream.
    */
  def driftMonitorStream(docs: DataFrame, column: String,
      reference: DataFrame)(
      onBatch: (Long, DataFrame) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onBatch(id,
          graft.operators.Drift.categoricalDrift(reference, batch, column))
        ()
      }
      .start()

  /** Mutable handle for the rolling snapshot in [[changeFeedStream]]. */
  final class SnapshotRef(@volatile var snapshot: DataFrame)

  /** Streaming change-data feed: each micro-batch of keyed upserts is
    * diffed against the ROLLING snapshot ([[graft.operators.ChangeCapture
    * .snapshotDiff]] — one co-partitioned full-outer join), `onBatch`
    * receives the added/changed rows (removals cannot be observed from an
    * upsert stream; a batch missing a key is not a delete), and the
    * snapshot is advanced by last-writer-wins merge before the next batch
    * runs — so a key that changes across micro-batches is reported per
    * change, not vs the original base. The snapshot advance
    * `localCheckpoint`s (eager) to keep the plan from growing per batch
    * (the refresh-loop discipline), releasing the previous checkpoint.
    *
    * At scale the rolling snapshot is a table and this seam writes a
    * MERGE; the diff/merge shapes are identical.
    */
  def changeFeedStream(updates: DataFrame, base: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String],
      ref: SnapshotRef)(
      onBatch: (Long, DataFrame) => Unit): StreamingQuery = {
    ref.snapshot = base.localCheckpoint(true)
    updates.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val cols = keyCols ++ compareCols
        val b = batch.select(cols.map(col): _*)
          // last-writer-wins within the batch: keep the max tuple per key
          // (deterministic; callers with an ordering column should
          // pre-collapse the batch instead)
          .groupBy(keyCols.map(col): _*)
          .agg(max(struct(compareCols.map(col): _*)).as("__v"))
          .select(keyCols.map(col) ++
            compareCols.map(c => col(s"__v.$c").as(c)): _*)
        onBatch(id, graft.operators.ChangeCapture.snapshotDiff(
          ref.snapshot, b, keyCols, compareCols)
          .where(col("change_type") =!= "removed"))
        val prev = ref.snapshot
        val merged = ref.snapshot.join(b, keyCols, "left_anti")
          .select(cols.map(col): _*)
          .unionAll(b.select(cols.map(col): _*))
        ref.snapshot = merged.localCheckpoint(true)
        prev.rdd.unpersist(false)
        ()
      }
      .start()
  }

  /** Mutable handle for the SEMANTIC index-refresh loop — the
    * [[LshIndexRef]] twin for [[graft.operators.Dedup.SemIndex]].
    */
  final class SemIndexRef(@volatile var index: graft.operators.Dedup.SemIndex)

  /** Streaming SemDeDup with the in-engine refresh loop: each micro-batch
    * runs [[graft.operators.Dedup.incrementalSemDedup]] against the
    * current index, `onBatch` receives the survivors, and the survivors'
    * vectors are appended to the index ([[graft.operators.Dedup.SemIndex
    * .append]] — batch-sized work; the centroid geometry is frozen, so
    * prior members never move) before the next batch runs. A paraphrase
    * arriving in a later batch is therefore caught against an earlier
    * batch's admitted representative, not just the original corpus —
    * greedy keep-first across the whole stream. Same foreachBatch seam and
    * caller-stops contract as [[incrementalNearDupStreamWithRefresh]].
    */
  def incrementalSemDedupStreamWithRefresh(
      docs: DataFrame, idCol: String, vecCol: String,
      indexRef: SemIndexRef, threshold: Double = 0.99,
      // Same durable-refresh contract as
      // [[incrementalNearDupStreamWithRefresh]]: delta epochs of admitted
      // members per batch; restart resumes via
      // [[graft.operators.Dedup.loadSemIndex]].
      checkpointTo: Option[String] = None,
      // > 0 = run [[graft.operators.Dedup.SemIndex.compact]] every N
      // micro-batches (a crawl concentrated in one embedding region is
      // exactly the streaming workload that skews a frozen geometry). A
      // compaction that actually split writes a fresh FULL snapshot to the
      // lineage — geometry changed, so member deltas can no longer
      // describe it; later batches resume delta-epoch appends on top of
      // the new snapshot. 0 = never (the prior behavior).
      compactEvery: Int = 0,
      compactFactor: Double = 4.0)(
      onBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val idx = indexRef.index
        val m = graft.operators.Dedup.incrementalSemDedup(
          batch, idCol, vecCol, idx, threshold)
        val survivors = batch.join(
          m.select(col("batch_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
        onBatch(survivors)
        var next = idx.append(survivors, idCol, vecCol, checkpointTo)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          val compacted = next.compact(compactFactor)
          if (compacted ne next) {
            checkpointTo.foreach(compacted.save)
            next = compacted
          }
        }
        indexRef.index = next
        m.unpersist(blocking = false)
        ()
      }
      .start()

  /** STREAMING durable sketch index — the streaming face of the batch
    * "profile once, answer distinct-count questions forever" contract
    * (p11d): every micro-batch aggregates per-shard HLL partials from its
    * OWN rows only and APPENDS them to a durable parquet index
    * (`shard, sk, batch_id`); readers union-merge all partials at
    * question time (`hll_union_agg`), never rescanning the stream.
    *
    * Why the naive append sink is exactly right here: HLL union is
    * associative, commutative AND idempotent (register-wise max), so the
    * merged estimate is independent of how rows were split into batches
    * and shards — a streaming build answers exactly what a batch build
    * answers (p11e gates this) — and a replayed batch after a crash
    * re-appends partials that change NOTHING when merged. At-least-once
    * delivery gives exactly-once answers with no transactional sink,
    * which is the whole reason to index a 100 TB stream with sketches
    * instead of counts. Pass `checkpointDir` so a restarted stream
    * resumes from committed source offsets instead of re-reading the
    * world (StreamingSketchSpec proves the kill-and-restart path).
    *
    * `Trigger.AvailableNow` drains what exists then stops — run the
    * builder per ingest epoch (cron-shaped); a continuous deployment
    * would drop the trigger and let batches append forever.
    */
  def sketchIndexStream(rows: DataFrame, keyCol: String, indexDir: String,
      checkpointDir: Option[String] = None, lgK: Int = 12,
      nShards: Int = 8): StreamingQuery = {
    val w = rows.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch
          .groupBy(pmod(xxhash64(col(keyCol)), lit(nShards)).as("shard"))
          .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sk"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(indexDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start()
  }

  /** Drive a streaming query to completion over a static directory (memory
    * sink) — the local smoke-test harness.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Update()): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
