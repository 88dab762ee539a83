package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine linear quality classifier over hashed unigram-presence
  * features — the fasttext-style learned gate that replaces a heuristic
  * quality score once labels exist (CCNet/GPT-3 style quality filtering,
  * arXiv:2005.14165 §A; fastText, arXiv:1607.01759). Everything is Spark
  * aggregates + one bounded driver-side solve:
  *
  *  - features: token → md5-derived bucket (portable: the sp1 hash
  *    construction), PRESENCE-valued (0/1) — robust to length skew and
  *    exactly replayable by an independent engine;
  *  - training: ridge least squares. X'X and X'y are distributed
  *    aggregates over the long-form feature frame (X'X via a per-doc
  *    self-join — cost is nnz² per doc, nnz ≤ per-doc distinct tokens,
  *    never corpus²); only the (dim+1)² Gram matrix reaches the driver
  *    (a few KB at any corpus size), which solves it by Gaussian
  *    elimination with partial pivoting;
  *  - scoring: one broadcast weights join + per-doc sum — map-side,
  *    shuffle only on the doc id already produced by featurize.
  *
  * Determinism note: Gram-matrix double sums vary in the last ulp with
  * partitioning, so WEIGHTS are deterministic only to ~1e-12 — the
  * classifier contract is therefore the thresholded LABEL, which is stable
  * for any non-degenerate margin (the qc1 fixture's margin is ~1.0).
  */
object QualityClassifier {

  /** Trained model: `weights(dim)` is the intercept (the constant feature
    * is bucket `dim`).
    */
  final case class Model(dim: Int, weights: Array[Double], threshold: Double = 0.5)

  /** Portable hashed-unigram bucket in [0, dim). */
  def tokenBucket(tok: Column, dim: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % dim

  /** Long-form presence features: (idCol, __b, __v=1.0) per (doc, bucket),
    * plus the constant intercept feature at bucket `dim`.
    */
  def featurize(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("__tok"))
    toks.select(col(idCol), tokenBucket(col("__tok"), dim).as("__b"))
      .distinct()
      .withColumn("__v", lit(1.0))
      .unionAll(docs.select(col(idCol), lit(dim).cast("long").as("__b"),
        lit(1.0).as("__v")))
  }

  /** Ridge least squares over long-form features + (idCol, y) labels:
    * w = (X'X + λI)⁻¹ X'y.
    */
  def trainRidge(feats: DataFrame, labels: DataFrame, idCol: String,
      dim: Int, lambda: Double = 1e-6, threshold: Double = 0.5): Model = {
    val d1 = dim + 1
    // Gram matrix: per-doc feature self-join, summed — (d1)² cells max
    val xtx = feats.as("a").join(feats.as("b"), col(s"a.$idCol") === col(s"b.$idCol"))
      .groupBy(col("a.__b").as("i"), col("b.__b").as("j"))
      .agg(sum(col("a.__v") * col("b.__v")).as("s"))
      .collect()
    val xty = feats.join(labels, idCol)
      .groupBy(col("__b").as("i"))
      .agg(sum(col("__v") * col("y")).as("s"))
      .collect()
    val a = Array.ofDim[Double](d1, d1)
    xtx.foreach(r => a(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2))
    var i = 0
    while (i < d1) { a(i)(i) += lambda; i += 1 }
    val b = new Array[Double](d1)
    xty.foreach(r => b(r.getLong(0).toInt) = r.getDouble(1))
    Model(dim, solve(a, b), threshold)
  }

  /** Gaussian elimination with partial pivoting (in place; a is (n)(n)). */
  private[graft] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var col = 0
    while (col < n) {
      var p = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      require(math.abs(a(p)(col)) > 0, s"singular system at column $col")
      if (p != col) { val t = a(p); a(p) = a(col); a(col) = t
        val tb = b(p); b(p) = b(col); b(col) = tb }
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          var k = col
          while (k < n) { a(r)(k) -= f * a(col)(k); k += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var k = i + 1
      while (k < n) { s -= a(i)(k) * x(k); k += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Per-doc scores from long-form features: broadcast weights join + one
    * per-doc sum. Output (idCol, score).
    */
  def score(feats: DataFrame, model: Model, idCol: String): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val w = model.weights.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("__b", "__w")
    feats.join(broadcast(w), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__v") * col("__w")).as("score"))
  }

  /** Gate a corpus: keep docs whose badness score stays BELOW the model
    * threshold. One featurize pass + broadcast-weights scoring join.
    */
  def gate(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val scores = score(featurize(docs, idCol, textCol, model.dim), model, idCol)
    docs.join(scores.where(col("score") >= model.threshold)
        .select(col(idCol)), Seq(idCol), "left_anti")
  }
}
