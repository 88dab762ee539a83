package graft

import graft.sources.Snapshots
import graft.sources.v2.GraftVectorizedAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 COLUMNAR fast path: a clean scan (no sidecars, no maps, no
  * pushed filters, scalar columns, uniform file schema) reads through
  * Spark's vectorized parquet reader into `ColumnarBatch`es; every
  * complication falls back to the row reader — values identical either
  * way.
  */
class Dsv2VectorizedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(nulls: Boolean = false): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_vec").toString
    val src = s"$d/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 20000L).map(k => (k, k % 7,
        if (nulls && k % 11 == 0) null else s"tag$k"))
        .toDF("k", "grp", "tag"), "k", 4, src, 64 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    root
  }

  private def vectorizedDelta[A](body: => A): (A, Long) = {
    val v0 = GraftVectorizedAudit.batches.get()
    val a = body
    (a, GraftVectorizedAudit.batches.get() - v0)
  }

  test("a clean full scan takes the columnar path and matches the " +
      "Scala read exactly") {
    val root = freshTable(nulls = true)
    val df = spark.read.format("graft").option("path", root).load()
    val ((n, sk, nNull), vec) = vectorizedDelta {
      val r = df.agg(count(lit(1)), sum(col("k")),
        sum(when(col("tag").isNull, 1L).otherwise(0L))).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(vec == 4, s"all 4 partitions must open the vectorized reader")
    assert(n == 20000L && sk == (0L until 20000L).sum)
    assert(nNull == (0L until 20000L).count(_ % 11 == 0))
    // the plan is columnar end to end
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow") || plan.contains("Columnar"),
      s"expected a columnar scan in:\n$plan")
  }

  test("complications fall back to the row reader with identical " +
      "values: sidecars and mixed schemas (filtered scans vectorize " +
      "WITH parquet predicate skipping)") {
    val root = freshTable()
    // pushed filter -> columnar path with a parquet FilterPredicate:
    // exact values, and only the zone-selected files open at all
    val (nRange, vec1) = vectorizedDelta {
      spark.read.format("graft").option("path", root).load()
        .where(col("k") >= 100 && col("k") < 300).count()
    }
    assert(vec1 >= 1, "filtered scans vectorize with predicate pushdown")
    assert(nRange == 200L)
    // sidecar -> row path
    Snapshots.deletePositions(spark, root, "k", 0L, 10L)
    val (nAfter, vec2) = vectorizedDelta {
      spark.read.format("graft").option("path", root).load().count()
    }
    assert(vec2 == 0, "a live sidecar forces the row path")
    assert(nAfter == 19990L)
    // optimize folds the sidecar -> columnar again
    Snapshots.optimize(spark, root, "k", 2)
    val (nOpt, vec3) = vectorizedDelta {
      spark.read.format("graft").option("path", root).load()
        .agg(count(lit(1)), sum(col("k"))).collect().head
    }
    assert(vec3 == 2, "a folded table vectorizes again")
    assert(nOpt.getLong(0) == 19990L)
    assert(nOpt.getLong(1) == (10L until 20000L).sum)
  }

  test("schema-evolved tables (mixed fingerprints) stay on the row " +
      "path and read correctly") {
    val root = freshTable()
    // append with a NEW column: fp differs across files
    Snapshots.append(spark, root,
      Seq((50000L, 1L, "x", 3.5)).toDF("k", "grp", "tag", "score"), "k")
    val df = spark.read.format("graft").option("path", root).load()
    val (r, vec) = vectorizedDelta {
      df.agg(count(lit(1)), sum(col("score"))).collect().head
    }
    assert(vec == 0, "mixed fingerprints must not vectorize")
    assert(r.getLong(0) == 20001L && r.getDouble(1) == 3.5)
  }
}
