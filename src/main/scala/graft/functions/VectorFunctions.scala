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

  /** Random-hyperplane (SimHash-style) LSH bucket for a float vector:
    * `bits` sign bits of projections onto pseudo-random hyperplanes derived
    * deterministically from (seed, bitIndex, dimIndex) — no stored
    * projection matrix, so executors need no broadcast. Backed by the
    * codegen'd [[HyperplaneLshBucket]] kernel (the higher-order-function
    * formulation evaluates interpreted, per element per bit).
    */
  def hyperplaneBucket(vec: Column, bits: Int, seed: Int): Column =
    HyperplaneLshBucket.bucket(vec, bits, seed.toLong)
}
