package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — pairs of half-open intervals `[start, end)`
  * sharing a key that overlap in time. Spark has no built-in range/overlap
  * join (the naive form is a per-key cross join with an overlap filter —
  * quadratic in events-per-key); this is the bucketed decomposition that
  * keeps it linear in (interval length / bucket) per row.
  *
  * Plan shape: each side explodes its interval into the coarse time
  * buckets it touches (map-only `sequence`), the join runs on
  * `(key, bucket)` — an equi-join Spark shuffles or broadcasts like any
  * other — and the exact overlap predicate filters the bucket-collision
  * candidates. A pair overlapping k shared buckets would duplicate k
  * times; instead of a `distinct`, each pair is emitted ONLY in the
  * bucket containing `max(lStart, rStart)` — the first instant both
  * intervals are live, which both sides' explodes provably cover — so
  * the output is exactly-once with no dedup shuffle.
  *
  * `bucketSeconds` tunes explode-volume vs candidate-collisions: pick it
  * near the typical SHORTER side's interval length (explode factor ~1-2
  * there) — long intervals on the other side pay length/bucket rows,
  * which is the linear cost that replaces the quadratic per-key blowup.
  * All four bound columns are LONG epoch seconds; `end > start` required
  * (empty intervals never match).
  */
object IntervalJoin {

  def overlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val b = bucketSeconds
    val lb = left.withColumn("__b", explode(sequence(
      expr(s"$lStart div $b"), expr(s"($lEnd - 1) div $b"))))
    val rb = right.withColumn("__b", explode(sequence(
      expr(s"$rStart div $b"), expr(s"($rEnd - 1) div $b"))))
    lb.join(rb, Seq(keyCol, "__b"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(col("__b") === expr(s"greatest($lStart, $rStart) div $b"))
      .drop("__b")
  }
}
