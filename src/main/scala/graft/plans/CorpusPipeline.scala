package graft.plans

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composition a 100 TB
  * LLM-data pipeline actually runs, built from the engine's own operators —
  *
  *   quality/token gates → language filter → exact dedup → MinHash-LSH
  *   near-dedup → typed corpus with per-doc metadata.
  *
  * Scale shape: the gates and metadata are one narrow map over the scan
  * (Catalyst fuses them; nothing shuffles until dedup), exact dedup is one
  * fingerprint shuffle, and near-dedup's only all-to-all movement is the
  * LSH bucket shuffle. Stats counts are optional actions (`audit = false`
  * skips them; the near-dup pair computation itself is eager by
  * [[Dedup.minhashLsh]]'s contract).
  */
object CorpusPipeline {

  /** How verified near-dup PAIRS become a drop set.
    *
    *  - [[KeepFirst]] (default, the classic policy): drop `id_b` of every
    *    pair. Cheap — no extra pass — but over-drops transitively: in a
    *    chain 5~6, 1~6, doc 5's only near-dup (6) is itself dropped, yet 5
    *    is dropped anyway IF it ever appears as an `id_b`, and kept if not —
    *    the survivor set depends on pair orientation, not cluster shape.
    *  - [[Components]]: cluster pairs into connected components
    *    ([[Dedup.connectedComponents]]) and keep exactly the component-
    *    minimum id — one survivor per near-dup FAMILY, independent of how
    *    the family was discovered. Costs O(diameter) extra distributed
    *    rounds over the (pair-bounded) edge list.
    */
  sealed trait NearDupPolicy
  case object KeepFirst extends NearDupPolicy
  case object Components extends NearDupPolicy

  final case class Config(
      // Crawl stage 0 ([[graft.operators.Html.mainContent]]): the text
      // column holds raw HTML; replace it with the extracted main content
      // (tag/script/style/comment strip + link-density boilerplate
      // filter) BEFORE any gate sees it — C4/CCNet stage order. Rides the
      // same fused narrow pass as the gates: map-only, no extra scan.
      htmlExtract: Boolean = false,
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      minQuality: Double = 0.3,
      langs: Seq[String] = Nil, // empty = keep all
      nearDupThreshold: Double = 0.9,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleSize: Int = 3,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      audit: Boolean = true,
      // Materialize (persist + count) the cleaned corpus before returning,
      // so the whole pipeline runs exactly one upstream scan and downstream
      // actions read the cache. [[Dedup.minhashLsh]]'s contract: the CALLER
      // owns the returned cache and should unpersist it when done. Default
      // false = lazy result that re-derives gates+dedup per action.
      materializeResult: Boolean = false,
      nearDupPolicy: NearDupPolicy = KeepFirst,
      // Optional LEARNED quality gate (see [[graft.operators
      // .QualityClassifier]]): docs whose badness score reaches the model
      // threshold are dropped after the heuristic gates. None (default)
      // keeps the pipeline's historical behavior.
      classifier: Option[graft.operators.QualityClassifier.Model] = None,
      // CCNet-style LM-tier gate ([[graft.operators.TextPipeline
      // .qualityBuckets]]): train the corpus bigram LM on the gated docs,
      // split into 3 equal tiers, keep only these labels — CCNet keeps
      // "head", optionally "middle" (arXiv:1911.00359 §4.4). Nil = off.
      lmKeepTiers: Seq[String] = Nil,
      // Moore–Lewis / DSIR domain selection ([[graft.operators
      // .TextPipeline.dsirSelect]]): keep docs whose target-domain bigram
      // model beats the raw-corpus model; the predicate marks the
      // in-domain seed over the pipeline's metadata columns (e.g.
      // col("lang") === "en" — `lang` exists by this stage). None = off.
      dsirTarget: Option[org.apache.spark.sql.Column] = None,
      // Lee-et-al. duplicated-SPAN rewrite ([[graft.operators.TextPipeline
      // .dedupSpansRewrite]]), Some(k) = the span width: runs on the GATED
      // corpus (junk drops before paying the span shuffle), replaces the
      // text with the rewritten form, recomputes (lang, n_tokens, quality)
      // on it and re-applies the heuristic gates — a doc whose surviving
      // text falls under minTokens (e.g. a whole-document duplicate
      // rewritten to '') drops here. Downstream dedup stages then see the
      // REWRITTEN text. None = off.
      spanRewriteK: Option[Int] = None,
      // Benchmark n-gram decontamination ([[graft.operators.TextPipeline
      // .contaminatedIds]] — the dc1/GPT-3 eval-leakage filter as a
      // pipeline stage): drop any gated doc sharing >=
      // `decontaminateMinShared` distinct `decontaminateNgram`-gram with
      // this frame (must carry the pipeline's textCol). Runs AFTER the
      // gates/rewrite and BEFORE dedup — a contaminated doc must never
      // survive as a dedup family's representative. None = off.
      decontaminateBench: Option[DataFrame] = None,
      decontaminateNgram: Int = 5,
      decontaminateMinShared: Long = 1L,
      // Flesch readability gate ([[graft.operators.TextPipeline
      // .fleschScore]]): drop docs scoring under the threshold (or with
      // no words). Rides the same fused narrow pass as the heuristic
      // gates — three more codegen'd regex counts, no shuffle. None = off.
      minFlesch: Option[Double] = None,
      // Deterministic weight-proportional downsampling of the FINAL
      // corpus ([[graft.operators.SequencePack.systematicSample]] over
      // n_tokens): Some(k) keeps ~k docs chosen by fixed-stride crossings
      // of the token-mass cumulative — the "train on a reproducible
      // slice" stage; adds `sample_rank`. None = off.
      sampleK: Option[Long] = None,
      // Muennighoff repeat-cap mixture REPORT ([[graft.operators
      // .TextPipeline.repeatCapMixture]]), Some(maxEpochs): after dedup,
      // the data-constrained allocation over the FINAL corpus (stratified
      // by lang, sized by n_tokens) lands on [[Stats.mixture]]. A report,
      // not a filter — the corpus returns unchanged. Lazy like the corpus:
      // derived from the returned frame, so set materializeResult when the
      // report will be acted on separately. None = off.
      repeatCapEpochs: Option[Int] = None)

  final case class Stats(
      input: Long,
      afterGates: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      // the repeat-cap allocation table when Config.repeatCapEpochs is
      // set — computed over the RETURNED frame, i.e. the sampled corpus
      // when Config.sampleK is set, the deduped corpus otherwise
      mixture: Option[DataFrame] = None,
      // rows in the RETURNED frame after Config.sampleK systematic
      // sampling; equals afterNearDedup when sampling is off (-1 when
      // audit = false, like the other counts)
      afterSample: Long = -1L)

  /** Run the pipeline. Returns the cleaned corpus — original columns plus
    * (lang, n_tokens, quality) — and per-stage counts (-1s when
    * `audit = false`).
    *
    * Near-dup policy is the standard greedy keep-first: for every verified
    * pair (id_a < id_b) the larger id is dropped, so each near-dup cluster
    * keeps at least its minimum id (a chain a~b~c keeps `a`, drops `b`,`c`;
    * transitive near-dups of the survivor may survive if they never paired
    * with it directly — exact duplicate groups always collapse to one).
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): (DataFrame, Stats) = {
    def n(df: DataFrame): Long = if (cfg.audit) df.count() else -1L

    val nInput = n(docs)

    // 0. HTML main-content extraction (optional): the raw column holds
    // markup; swap in the extracted main text so every downstream stage
    // (gates, rewrite, dedup) sees CONTENT, not boilerplate — and two
    // pages differing only in stripped regions (head, scripts, comments,
    // nav/footer chrome) become the exact duplicates they really are.
    val docs0 =
      if (cfg.htmlExtract)
        docs.withColumn(textCol,
          graft.operators.Html.mainContent(col(textCol)))
      else docs

    // 1. metadata + gates: one fused narrow pass, no shuffle
    val withMeta = docs0
      .withColumn("lang", TextFunctions.langId(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
    val gated0 = withMeta.where(
      col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
        col("quality") >= cfg.minQuality)
    val gated0f = cfg.minFlesch match {
      case Some(f) => gated0.where(
        graft.operators.TextPipeline.fleschScore(col(textCol)) >= f)
      case None => gated0
    }
    val gated1 =
      if (cfg.langs.isEmpty) gated0f
      else gated0f.where(col("lang").isin(cfg.langs: _*))
    // 1b. learned gate (optional): featurize + broadcast-weights scoring —
    // one extra groupBy(id) + anti-join, still upstream of any dedup shuffle
    val gated2 = cfg.classifier match {
      case Some(m) =>
        graft.operators.QualityClassifier.gate(gated1, idCol, textCol, m)
      case None => gated1
    }
    // The selection stages below each consume their input SEVERAL times
    // (train a model on it, then semi-join the keep set back against it —
    // and the model internals fan out further). Caching is NOT enough:
    // cache substitution happens after analysis, so the pre-substitution
    // plan tree still doubles per reuse and the driver dies in
    // explainString/analysis long before a task runs (observed at 500
    // docs). localCheckpoint is the iterative-algorithm fix — it
    // materializes the stage and TRUNCATES lineage to a LogicalRDD, so
    // every downstream plan is bounded by one stage's depth. Trade-off:
    // truncated stages cannot recompute from source on block loss; a
    // long-lived cluster deployment would use reliable checkpoint(). The
    // checkpointed blocks live exactly as long as the returned frame
    // references them (GC-cleaned; cacheManager-based clearCache leaves
    // them alone, which is what the lazy result needs).
    val stageCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pinned(df: DataFrame): DataFrame = df.localCheckpoint()
    // 1c. CCNet LM-tier gate (optional): corpus-trained bigram terciles
    // over the gated docs; keep the configured labels. The LM projection
    // shuffles bigram counts, never the corpus; the keep set comes back as
    // one semi-join on the id.
    val gated3 =
      if (cfg.lmKeepTiers.isEmpty) gated2
      else {
        val in = pinned(gated2)
        in.join(
          graft.operators.TextPipeline
            .qualityBuckets(in, idCol, textCol, nBuckets = 3)
            .where(col("bucket").isin(cfg.lmKeepTiers: _*))
            .select(col(idCol)),
          Seq(idCol), "left_semi")
      }
    // 1d. DSIR selection (optional): two contrastive bigram models over
    // ONE projection of the tier-kept corpus (dsirSelect is eager and
    // returns a caller-owned cache — released with the stage caches;
    // recompute after release re-runs from the checkpointed input).
    val gated = cfg.dsirTarget match {
      case Some(pred) =>
        val in = pinned(gated3)
        val sel = graft.operators.TextPipeline
          .dsirSelect(in, idCol, textCol, pred)
        stageCaches += sel
        in.join(sel.where(col("selected")).select(col(idCol)),
          Seq(idCol), "left_semi")
      case None => gated3
    }
    val nGated = n(gated)

    // 1e. duplicated-span rewrite (optional): corpus-wide span removal on
    // the gated docs, metadata recomputed on the rewritten text, heuristic
    // gates re-applied. The rewrite is eager and caller-owned (the
    // minhashLsh contract) — released with the stage caches; non-text
    // columns rejoin on the id (the rewrite emits only id + clean_text).
    val gatedR = cfg.spanRewriteK match {
      case Some(k) =>
        val in = pinned(gated)
        val rw = graft.operators.TextPipeline
          .dedupSpansRewrite(in, idCol, textCol, k)
        stageCaches += rw
        val re = in.drop(textCol, "lang", "n_tokens", "quality")
          .join(rw.select(col(idCol), col("clean_text").as(textCol)),
            Seq(idCol))
          .withColumn("lang", TextFunctions.langId(col(textCol)))
          .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
          .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
          .where(col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
            col("quality") >= cfg.minQuality)
        if (cfg.langs.isEmpty) re else re.where(col("lang").isin(cfg.langs: _*))
      case None => gated
    }

    // 1f. benchmark decontamination (optional): the bench gram set is
    // bench-sized and broadcasts; the corpus side is one map-only gram
    // explode + broadcast join feeding a per-doc count — ordered BEFORE
    // dedup so a contaminated doc can never be the surviving
    // representative of a family whose other members were clean.
    val gatedC = cfg.decontaminateBench match {
      case Some(bench) =>
        val in = pinned(gatedR)
        in.join(graft.operators.TextPipeline.contaminatedIds(
            in, idCol, textCol, bench, textCol,
            cfg.decontaminateNgram, cfg.decontaminateMinShared),
          Seq(idCol), "left_anti")
      case None => gatedR
    }

    // 2. exact dedup: one fingerprint shuffle, deterministic min-id survivor.
    // Persisted for the DURATION of the run: near-dedup below materializes
    // one projection of it and the drop set, and without the cache each of
    // those would re-run the scan + gates + dedup shuffle. Released before
    // returning — the returned corpus is lazy and re-derives this stage on
    // each downstream action (callers doing several actions should persist
    // the result themselves).
    val exact = Dedup.exactDedup(gatedC, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = n(exact)

    // 3. near-dedup: LSH-bucketed candidate pairs, exact-Jaccard verified;
    //    drop the id_b side of every pair (see policy above). The drop set
    //    is usually orders of magnitude smaller than the corpus, but "much
    //    smaller than 10B docs" can still be past the broadcast ceiling —
    //    so no explicit broadcast() hint: AQE sees the materialized size and
    //    broadcasts the anti-join side only when it actually fits.
    val pairs = Dedup.minhashLsh(exact, idCol, textCol,
        threshold = cfg.nearDupThreshold, numHashes = cfg.numHashes,
        bands = cfg.bands, shingleSize = cfg.shingleSize,
        maxBucket = cfg.maxBucket)
    // Materialize the (near-dup-bounded) drop-id set, then release the pair
    // set minhashLsh cached — per its contract the caller owns that cache,
    // and repeated runs in a long-lived session must not accumulate blocks.
    // dropIds itself stays cached: the returned lazy corpus re-reads it on
    // every downstream action, and it is bounded by the near-dup count, not
    // the corpus size.
    val (dropIds0, compCache) = cfg.nearDupPolicy match {
      case KeepFirst =>
        (pairs.select(col("id_b").as("__drop_id")).distinct(), None)
      case Components =>
        // one survivor (the component min) per near-dup family; everything
        // else in the family drops — orientation-independent
        val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
        (comp.where(col("id") =!= col("component"))
          .select(col("id").as("__drop_id")), Some(comp))
    }
    val dropIds = dropIds0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dropIds.count()
    compCache.foreach(_.unpersist(blocking = false))
    pairs.unpersist(blocking = false)
    val deduped0 = exact.join(dropIds, exact(idCol) === col("__drop_id"), "left_anti")
    val deduped =
      if (cfg.materializeResult) {
        val out = deduped0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        out
      } else deduped0
    val nFinal = n(deduped)

    // 4. deterministic downsample (optional): systematic stride selection
    // over the deduped corpus's token mass — reproducible, map-only after
    // the chunked prefix decomposition. Runs LAST so the sample is drawn
    // from the fully cleaned corpus. The prefix machinery reads its input
    // THREE times (chunk totals, offsets join-back, grand total), so the
    // final corpus is localCheckpoint'ed first — while the exact-dedup
    // cache is still live — or the whole gates+dedup+LSH plan would
    // replay per pass (measured 83 s → ~30 s at the 100× stress).
    val sampled = cfg.sampleK match {
      case Some(k) =>
        graft.operators.SequencePack.systematicSample(
          deduped.localCheckpoint(), idCol, "n_tokens", k)
      case None => deduped
    }
    // afterSample counts the RETURNED frame; afterNearDedup keeps the
    // pre-sample deduped count so the two stages are separately visible.
    val nSampled = if (cfg.sampleK.isDefined) n(sampled) else nFinal
    exact.unpersist(blocking = false)
    stageCaches.foreach(_.unpersist(blocking = false))

    // 5. repeat-cap mixture report (optional): the allocation table over
    // the final corpus — one groupBy(lang) plus tiny windowed water-fill,
    // all bounded by the domain count, not the corpus.
    val mixture = cfg.repeatCapEpochs.map { epochs =>
      graft.operators.TextPipeline.repeatCapMixture(
        sampled, "lang", col("n_tokens"), maxEpochs = epochs)
    }

    (sampled, Stats(nInput, nGated, nExact, nFinal, mixture, nSampled))
  }
}
