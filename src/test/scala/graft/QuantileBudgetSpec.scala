package graft

import graft.operators.Cleaning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-side bound of the exact-quantile plan: however many rows the
  * column has, the values collected to the driver stay within the window
  * budget — adaptive ε when a single bracket pass suffices, iterative
  * re-bracketing when even the sketch floor would overflow the budget.
  */
class QuantileBudgetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val n = 300000
  private lazy val df = spark.range(n)
    .select((((col("id") * 2654435761L) % 1000003L).cast("double") / 1000.0).as("x"))

  // ground truth by local sort, same interpolation formula as the engine
  private lazy val sorted: Array[Double] = {
    import spark.implicits._
    df.as[Double].collect().sorted
  }
  private def truth(p: Double): Double = {
    val h = (n - 1) * p
    val lo = math.floor(h).toInt
    val f = h - lo
    if (math.ceil(h).toInt == lo) sorted(lo)
    else sorted(lo) * (1 - f) + sorted(lo + 1) * f
  }

  test("adaptive eps: single bracket pass stays within ~budget and is exact") {
    val budget = 2000L
    val (q, win) = Cleaning.exactQuantilesMultiStats(df, Seq("x"), 0.5, budget)
    assert(q("x") == truth(0.5))
    // window spans ~5εn = budget ranks; allow 2x slack for sketch error
    assert(win("x") <= 2 * budget, s"collected ${win("x")} values for budget $budget")
  }

  test("iterative re-bracketing: budget below the sketch floor still holds the bound") {
    val budget = 5L // forces ε to its floor, then the refinement loop
    val (q, win) = Cleaning.exactQuantilesMultiStats(df, Seq("x"), 0.5, budget)
    assert(q("x") == truth(0.5))
    assert(win("x") <= budget, s"collected ${win("x")} values for budget $budget")
  }

  test("quantiles at the edges survive the budgeted path") {
    for (p <- Seq(0.05, 0.95)) {
      val (q, _) = Cleaning.exactQuantilesMultiStats(df, Seq("x"), p, 1000L)
      assert(q("x") == truth(p), s"p=$p")
    }
  }
}
