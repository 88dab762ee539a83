package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join handles most cases at runtime; salting is the explicit
  * fallback when one side has a few pathological hot keys and the other
  * side is small enough to replicate: the big side gets a deterministic
  * salt in [0, factor), the small side is exploded once per salt value, and
  * the join key becomes (key, salt) — hot keys now spread over `factor`
  * reducers instead of one straggler.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, salted `factor` ways.
    *
    * The salt on the big side derives from a hash of the whole row (via
    * monotonically increasing ids would break determinism across runs;
    * xxhash64 of all columns is stable for a stable input), so results are
    * reproducible. The small side is replicated `factor`× — keep it the
    * dimension side.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    val saltExpr: Column =
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int")
    val b = big.withColumn("__salt", saltExpr)
    val s = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N hot keys of a column with their frequencies — the diagnostic to
    * decide whether salting (or AQE alone) is warranted.
    */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key))
      .limit(topN)
}
