package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` / `array<double>`
  * embedding columns, built on Spark's higher-order functions (`zip_with`,
  * `aggregate`) so they stay inside codegen — no UDF, no serialization of
  * the array to the JVM heap per row beyond what the expression needs.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — double accumulator regardless of input element type. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; null-safe zero-vector guard -> null. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(null).cast("double"))
  }

  /** Squared Euclidean distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Unit-normalize (zero vector maps to itself). */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n > 0, transform(a, v => v.cast("double") / n)).otherwise(transform(a, _.cast("double")))
  }

  /** Random-hyperplane (SimHash) LSH bucket for a vector: `bits` sign bits
    * of projections onto pseudo-random hyperplanes derived deterministically
    * from (seed, bitIndex, dimIndex) via a hash — no stored projection
    * matrix, so executors need no broadcast and the expression is pure
    * codegen. Used by the ANN path in [[graft.operators.Similarity]].
    */
  def hyperplaneBucket(vec: Column, bits: Int, seed: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      // projection_b(v) = Σ_d v[d] * h(seed,b,d), h in [-1,1)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, d) => {
          val h = pmod(xxhash64(lit(seed), lit(b), d), lit(2000000L)).cast("double")
          v.cast("double") * (h / 1000000.0 - 1.0)
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
