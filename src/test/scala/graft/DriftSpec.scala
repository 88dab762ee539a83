package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Drift]] — per-bin drift evidence and the PSI convenience. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("binOf clamps underflow, overflow and the exact upper edge") {
    import spark.implicits._
    val rows = Seq(-5.0, 0.0, 9.99, 10.0, 55.0, 100.0, 1e9).toDF("v")
      .select(Drift.binOf(col("v"), 0.0, 100.0, 10).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(0L, 0L, 0L, 1L, 5L, 9L, 9L))
  }

  test("numericDrift zero-fills bins, shares sum to 1, nulls excluded") {
    import spark.implicits._
    val a = Seq(Some(5.0), Some(15.0), Some(15.0), None).toDF("v")
    val b = Seq(Some(95.0)).toDF("v")
    val out = Drift.numericDrift(a, b, "v", 0.0, 100.0, 10)
      .orderBy("bin").collect()
    assert(out.length == 10)
    val byBin = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(byBin(0L) == ((1L, 0L, 1.0 / 3, 0.0)))
    assert(byBin(1L)._1 == 2L)
    assert(byBin(9L) == ((0L, 1L, 0.0, 1.0)))
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-12)
  }

  test("identical snapshots: zero divergence everywhere, PSI ~ 0") {
    import spark.implicits._
    val a = Seq.tabulate(100)(i => i.toDouble).toDF("v")
    val d = Drift.numericDrift(a, a, "v", 0.0, 100.0, 10)
    assert(d.agg(sum(abs(col("divergence")))).collect()(0).getDouble(0) == 0.0)
    assert(math.abs(Drift.psi(d)) < 1e-12)
  }

  test("a shifted snapshot scores strictly higher than a jittered one") {
    import spark.implicits._
    val base = Seq.tabulate(200)(i => (i % 100).toDouble).toDF("v")
    val jitter = Seq.tabulate(200)(i => ((i + 1) % 100).toDouble).toDF("v")
    val shifted = Seq.tabulate(200)(i => (i % 100) / 2.0 + 50.0).toDF("v")
    val small = Drift.psi(Drift.numericDrift(base, jitter, "v", 0.0, 100.0, 10))
    val big = Drift.psi(Drift.numericDrift(base, shifted, "v", 0.0, 100.0, 10))
    assert(big > small + 0.1, s"psi shifted=$big jitter=$small")
  }

  test("numericDriftMulti == per-column numericDrift, in one scan per side") {
    import spark.implicits._
    import graft.operators.Drift.ColSpec
    val a = Seq((1.0, 10.0), (2.0, 20.0), (9.0, 90.0)).toDF("x", "y")
    val b = Seq((5.0, 50.0), (6.0, 60.0)).toDF("x", "y")
    val multi = Drift.numericDriftMulti(a, b,
      Seq(ColSpec("x", 0.0, 10.0, 5), ColSpec("y", 0.0, 100.0, 4)))
    val got = multi.collect().map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))).toMap
    for ((c, lo, hi, n) <- Seq(("x", 0.0, 10.0, 5), ("y", 0.0, 100.0, 4))) {
      val single = Drift.numericDrift(a, b, c, lo, hi, n).collect()
        .map(r => (c, r.getLong(0)) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
      single.foreach { case (k, v) => assert(got(k) == v, s"$k") }
    }
    // the evidence frame was localized: the output plan must not embed
    // the snapshot subtrees at all (their columns x/y would appear) —
    // the one scan per side happened at materialization time
    val plan = multi.queryExecution.optimizedPlan.toString
    assert(!plan.contains("x#") && !plan.contains("y#"), plan)
  }

  test("categoricalDrift covers categories unique to either side") {
    import spark.implicits._
    val a = Seq("x", "x", "y").toDF("c")
    val b = Seq("y", "z").toDF("c")
    val m = Drift.categoricalDrift(a, b, "c").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map("x" -> ((2L, 0L)), "y" -> ((1L, 1L)), "z" -> ((0L, 1L))))
  }

  test("ksDrift: exact CDF gaps by hand, KS = max gap") {
    import spark.implicits._
    val a = Seq(Some(5.0), Some(15.0), Some(15.0), None).toDF("v")
    val b = Seq(Some(95.0)).toDF("v")
    val out = Drift.ksDrift(a, b, "v", 0.0, 100.0, 10).collect()
    assert(out.length == 10)
    val byBin = out.map(r => r.getLong(0) ->
      ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(byBin(0L) == ((1.0 / 3, 0.0, 1.0 / 3)))
    assert(byBin(1L) == ((1.0, 0.0, 1.0)))
    assert(byBin(8L) == ((1.0, 0.0, 1.0)))
    assert(byBin(9L) == ((1.0, 1.0, 0.0)))
    assert(Drift.ks(Drift.ksDrift(a, b, "v", 0.0, 100.0, 10)) == 1.0)
  }

  test("numericDriftBy: per-segment normalization isolates the shifted segment") {
    import spark.implicits._
    // opposite shifts: segment p moves low->high, q moves high->low, in
    // equal volume — the POOLED halves are identical (drift reads 0),
    // only the per-segment view catches both shifts (Simpson's paradox)
    val a = (Seq.fill(50)(("p", 10.0)) ++ Seq.fill(50)(("q", 90.0)) ++
      Seq.fill(20)(("r", 50.0))).toDF("seg", "v")
    val b = (Seq.fill(50)(("p", 90.0)) ++ Seq.fill(50)(("q", 10.0)) ++
      Seq.fill(20)(("r", 50.0))).toDF("seg", "v")
    val pooled = Drift.numericDrift(a, b, "v", 0.0, 100.0, 10)
      .agg(sum(col("divergence"))).collect()(0).getDouble(0)
    assert(pooled == 0.0, s"pooled drift should cancel, got $pooled")
    val by = Drift.numericDriftBy(a, b, "seg", "v", 0.0, 100.0, 10)
      .groupBy(col("segment")).agg(sum(col("divergence")).as("d"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(by("r") == 0.0)
    assert(by("p") == 2.0 && by("q") == 2.0,
      s"disjoint shifts score 2 each, got $by")
  }

  test("numericDriftBy: zero-fills (segment x bin) over both sides' segments") {
    import spark.implicits._
    val a = Seq(("only_a", 5.0)).toDF("seg", "v")
    val b = Seq(("only_b", 95.0)).toDF("seg", "v")
    val f = Drift.numericDriftBy(a, b, "seg", "v", 0.0, 100.0, 4)
    assert(f.count() == 8) // 2 segments x 4 bins
    val oa = f.where(col("segment") === "only_a" && col("bin") === 0)
      .collect()(0)
    assert(oa.getLong(2) == 1L && oa.getLong(3) == 0L)
  }

  test("ksDrift: identical snapshots give zero gap everywhere") {
    import spark.implicits._
    val a = Seq.tabulate(100)(i => i.toDouble).toDF("v")
    val f = Drift.ksDrift(a, a, "v", 0.0, 100.0, 10)
    assert(f.agg(sum(abs(col("gap")))).collect()(0).getDouble(0) == 0.0)
  }

  test("ksDrift: shift scores higher than jitter, CDFs end at 1") {
    import spark.implicits._
    val base = Seq.tabulate(200)(i => (i % 100).toDouble).toDF("v")
    val jitter = Seq.tabulate(200)(i => ((i + 1) % 100).toDouble).toDF("v")
    val shifted = Seq.tabulate(200)(i => (i % 100) / 2.0 + 50.0).toDF("v")
    val ksJ = Drift.ks(Drift.ksDrift(base, jitter, "v", 0.0, 100.0, 10))
    val ksS = Drift.ks(Drift.ksDrift(base, shifted, "v", 0.0, 100.0, 10))
    assert(ksS > ksJ + 0.2, s"ks shifted=$ksS jitter=$ksJ")
    val last = Drift.ksDrift(base, shifted, "v", 0.0, 100.0, 10)
      .orderBy(col("bin").desc).limit(1).collect()(0)
    assert(last.getDouble(3) == 1.0 && last.getDouble(4) == 1.0)
  }
}
