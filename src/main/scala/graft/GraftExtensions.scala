package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get the codegen'd
  * kernels too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT graft_cosine_dot(a.vec, b.vec) / (graft_vec_norm(a.vec) * graft_vec_norm(b.vec)) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))

    register("graft_vec_dot", "dot product of two float vectors (double fold)") {
      args => FloatVecDot(args(0), args(1))
    }
    register("graft_vec_norm", "L2 norm of a float vector") {
      args => FloatVecNorm(args(0))
    }
    register("graft_shingles", "(text, n) -> distinct word n-gram shingles") {
      args => WordShingles(args(0), intArg(args(1), "n"))
    }
    register("graft_shingles_all",
      "(text, n) -> every word n-gram occurrence (multiset, document order)") {
      args => WordShinglesAll(args(0), intArg(args(1), "n"))
    }
    register("graft_minhash", "(shingles, k) -> k-minhash signature") {
      args => MinHashSig(args(0), intArg(args(1), "k"))
    }
    register("graft_jaccard", "jaccard similarity of two distinct-element string arrays") {
      args => ArrayJaccard(args(0), args(1))
    }
    register("graft_simhash", "64-bit simhash of a text document") {
      args => SimHash64(args(0))
    }
    register("graft_lsh_bucket", "(vec, bits, seed) -> random-hyperplane LSH bucket") {
      args => HyperplaneLshBucket(args(0), intArg(args(1), "bits"), intArg(args(2), "seed").toLong)
    }
    register("graft_langid", "marker-profile language id of a text ('und' if unknown/null)") {
      args => LangIdExpr(args(0))
    }
    register("graft_vec_distsq", "squared L2 distance of two float vectors") {
      args => FloatVecDistSq(args(0), args(1))
    }
    register("graft_block_argmin",
      "(vec, array<struct<cluster,centroid>>) -> struct(d2, cluster) of the nearest centroid") {
      args => FloatVecBlockArgmin(args(0), args(1))
    }
    register("graft_block_cosine_match",
      "(vec, array<struct<bid,bvec,bnorm>>, threshold) -> struct(matched_bench_id, n_matches) or NULL") {
      args => FloatVecBlockCosineMatch(args(0), args(1), args(2) match {
        // SQL `0.99` parses as a Decimal literal, not Double — accept any
        // numeric literal form
        case Literal(v: Double, _) => v
        case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
        case Literal(v: Number, _) => v.doubleValue()
        case other => throw new IllegalArgumentException(
          s"threshold must be a numeric literal, got $other")
      })
    }
    register("graft_bpe_count", "true-BPE subword token count under the committed merge fixture") {
      args => BpeTokenCount(args(0), BpeVocab.Fixture)
    }
    register("graft_bpe_tokens", "BPE subword token stream under the committed merge fixture") {
      args => BpeTokens(args(0), BpeVocab.Fixture)
    }

    // Column-composition kernels surfaced to SQL through the Column<->
    // Expression bridge (the composition is itself codegen'd built-ins, so
    // SQL callers lose nothing vs the Scala API).
    import org.apache.spark.sql.GraftSqlBridge.{column, expressionEager}
    register("graft_redact_pii", "scrub emails/phones/IPv4 from a text") {
      args => expressionEager(graft.operators.TextPipeline.redactPii(column(args(0))))
    }
    register("graft_extract_domain", "first URL host in a text, NULL if none") {
      args => expressionEager(graft.operators.TextPipeline.extractDomain(column(args(0))))
    }
    register("graft_fingerprint", "normalized-content md5 fingerprint of a text") {
      args => expressionEager(TextFunctions.fingerprint(column(args(0))))
    }
    register("graft_token_count", "whitespace token count of a text") {
      args => expressionEager(TextFunctions.tokenCount(column(args(0))))
    }

    // Mergeable sketch aggregates (the analyzer wraps a bare
    // AggregateFunction into its AggregateExpression, so these register
    // like any builtin agg)
    register("graft_freq_sketch_agg",
      "(item, maxMapSize) -> frequent-items sketch partial (binary)") {
      args => StringFreqSketchAgg(args(0), intArg(args(1), "maxMapSize"))
    }
    register("graft_freq_sketch_merge",
      "(sketch, maxMapSize) -> union-merged frequent-items sketch") {
      args => StringFreqSketchMergeAgg(args(0), intArg(args(1), "maxMapSize"))
    }
    register("graft_freq_sketch_items",
      "sketch -> array<struct<item,estimate,lower_bound,upper_bound>>") {
      args => FreqSketchItems(args(0))
    }
    register("graft_freq_sketch_max_error",
      "sketch -> a-posteriori maximum estimate error (0 = exact)") {
      args => FreqSketchMaxError(args(0))
    }
    register("graft_theta_sketch_agg",
      "(item, nominalEntries) -> theta sketch partial (binary)") {
      args => ThetaSketchAgg(args(0), intArg(args(1), "nominalEntries"))
    }
    register("graft_theta_union_agg",
      "(sketch, nominalEntries) -> union-merged theta sketch") {
      args => ThetaUnionAgg(args(0), intArg(args(1), "nominalEntries"))
    }
    register("graft_theta_estimate", "theta sketch -> distinct estimate") {
      args => ThetaEstimate(args(0))
    }
    register("graft_theta_is_estimation",
      "theta sketch -> TRUE iff hashes were discarded (estimation mode)") {
      args => ThetaIsEstimation(args(0))
    }
    register("graft_kll_sketch_agg",
      "(value, k) -> KLL quantile sketch partial (binary)") {
      args => KllSketchAgg(args(0), intArg(args(1), "k"))
    }
    register("graft_kll_merge",
      "(sketch, k) -> union-merged KLL sketch") {
      args => KllMergeAgg(args(0), intArg(args(1), "k"))
    }
    register("graft_kll_quantile",
      "(sketch, rank) -> quantile estimate at a literal normalized rank") {
      args => KllQuantile(args(0), args(1) match {
        case Literal(v: Double, _) => v
        case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
        case Literal(v: Number, _) => v.doubleValue()
        case other => throw new IllegalArgumentException(
          s"rank must be a numeric literal, got $other")
      })
    }
    register("graft_kll_rank",
      "(sketch, value) -> normalized-rank estimate of value") {
      args => KllRank(args(0), args(1))
    }
    register("graft_kll_summary",
      "sketch -> struct(n,min_item,max_item,num_retained,rank_error,is_estimation)") {
      args => KllSummary(args(0))
    }
    register("graft_reservoir_sketch_agg",
      "(value, k) -> uniform-sample reservoir sketch partial (binary)") {
      args => ReservoirSketchAgg(args(0), intArg(args(1), "k"))
    }
    register("graft_reservoir_merge",
      "(sketch, k) -> union-merged reservoir sketch") {
      args => ReservoirMergeAgg(args(0), intArg(args(1), "k"))
    }
    register("graft_reservoir_n",
      "reservoir sketch -> exact stream length") {
      args => ReservoirN(args(0))
    }
    register("graft_reservoir_samples",
      "reservoir sketch -> ascending array<long> of retained samples") {
      args => ReservoirSamples(args(0))
    }
    register("graft_varopt_sketch_agg",
      "(item, weight, k) -> weighted-sample VarOpt sketch partial (binary)") {
      args => VarOptSketchAgg(args(0), args(1), intArg(args(2), "k"))
    }
    register("graft_varopt_merge",
      "(sketch, k) -> union-merged VarOpt sketch") {
      args => VarOptMergeAgg(args(0), intArg(args(1), "k"))
    }
    register("graft_varopt_summary",
      "VarOpt sketch -> struct(n,num_samples,total_weight)") {
      args => VarOptSummary(args(0))
    }
    register("graft_varopt_samples",
      "VarOpt sketch -> array<struct<item,weight>> ascending by item") {
      args => VarOptSamples(args(0))
    }
    register("graft_theta_set_estimate",
      "(a, b, 'union'|'intersect'|'anotb') -> set-algebra estimate") {
      args => ThetaSetEstimate(args(0), args(1), args(2) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"op must be a string literal, got $other")
      })
    }
  }
}
