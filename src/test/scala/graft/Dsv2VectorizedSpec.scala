package graft

import graft.sources.Snapshots
import graft.sources.v2.GraftVectorizedAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 COLUMNAR path — since r18 the default for EVERY batch scan
  * shape: clean scans, scans with live delete sidecars (row-index
  * selection), schema-evolved tables (per-file adaptation: missing
  * columns null-fill, renames resolve, widens cast in the batch),
  * array<scalar> columns, and `_file`/`_pos` metadata columns. Values
  * must match the row reader (`vectorize=false`) exactly in every case.
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

  test("scans with live delete sidecars STAY columnar: positions apply " +
      "as a row-index selection with values identical to the row path") {
    val root = freshTable()
    // pushed filter -> columnar path with a parquet FilterPredicate:
    // exact values, and only the zone-selected files open at all
    val (nRange, vec1) = vectorizedDelta {
      spark.read.format("graft").option("path", root).load()
        .where(col("k") >= 100 && col("k") < 300).count()
    }
    assert(vec1 >= 1, "filtered scans vectorize with predicate pushdown")
    assert(nRange == 200L)
    // sidecar -> STILL columnar (the r17 row-path fallback is gone):
    // the marked rows vanish through the dv selection
    Snapshots.deletePositions(spark, root, "k", 0L, 10L)
    val sel0 = GraftVectorizedAudit.selectedBatches.get()
    val (rMor, vec2) = vectorizedDelta {
      spark.read.format("graft").option("path", root).load()
        .agg(count(lit(1)), sum(col("k"))).collect().head
    }
    assert(vec2 == 4, "a live sidecar must NOT force the row path")
    assert(GraftVectorizedAudit.selectedBatches.get() > sel0,
      "at least one batch must have applied the dv selection")
    assert(rMor.getLong(0) == 19990L)
    assert(rMor.getLong(1) == (10L until 20000L).sum)
    // row path agrees exactly
    val (rRow, vecRow) = vectorizedDelta {
      spark.read.format("graft").option("path", root)
        .option("vectorize", "false").load()
        .agg(count(lit(1)), sum(col("k"))).collect().head
    }
    assert(vecRow == 0)
    assert(rRow.getLong(0) == rMor.getLong(0) &&
      rRow.getLong(1) == rMor.getLong(1))
    // a filtered scan over the dv'd table: FilterPredicate row-group
    // skipping and the dv selection compose (row indexes stay exact)
    val (nF, vec3) = vectorizedDelta {
      spark.read.format("graft").option("path", root).load()
        .where(col("k") < 100).count()
    }
    assert(vec3 >= 1)
    assert(nF == 90L, "positions 0..9 deleted, 10..99 live")
    // optimize folds the sidecar -> still columnar, marks gone
    Snapshots.optimize(spark, root, "k", 2)
    val (nOpt, vec4) = vectorizedDelta {
      spark.read.format("graft").option("path", root).load()
        .agg(count(lit(1)), sum(col("k"))).collect().head
    }
    assert(vec4 == 2)
    assert(nOpt.getLong(0) == 19990L)
    assert(nOpt.getLong(1) == (10L until 20000L).sum)
  }

  test("schema-evolved tables (mixed fingerprints: ADD COLUMN history) " +
      "vectorize with per-file adaptation — absent columns read NULL") {
    val root = freshTable()
    // append with a NEW column: fp differs across files
    Snapshots.append(spark, root,
      Seq((50000L, 1L, "x", 3.5)).toDF("k", "grp", "tag", "score"), "k")
    val df = spark.read.format("graft").option("path", root).load()
    val (r, vec) = vectorizedDelta {
      df.agg(count(lit(1)), sum(col("score")),
        sum(when(col("score").isNull, 1L).otherwise(0L))).collect().head
    }
    assert(vec == 5, "mixed fingerprints must still vectorize (4+1 files)")
    assert(r.getLong(0) == 20001L && r.getDouble(1) == 3.5)
    assert(r.getLong(2) == 20000L, "old-schema rows read NULL score")
  }

  test("renamed and widened columns vectorize: physical names resolve " +
      "per file, widening casts in the batch, filters still push") {
    val root = freshTable()
    Snapshots.renameColumn(root, "grp", "bucket")
    Snapshots.widenColumn(root, "grp", "long") // no-op: grp renamed
    val df = spark.read.format("graft").option("path", root).load()
    val (r, vec) = vectorizedDelta {
      df.where(col("k") >= 1000 && col("k") < 3000)
        .agg(count(lit(1)), sum(col("bucket"))).collect().head
    }
    assert(vec >= 1, "a mapped table must still vectorize")
    assert(r.getLong(0) == 2000L)
    assert(r.getLong(1) == (1000L until 3000L).map(_ % 7).sum)
    // row path agrees
    val rRow = spark.read.format("graft").option("path", root)
      .option("vectorize", "false").load()
      .where(col("k") >= 1000 && col("k") < 3000)
      .agg(count(lit(1)), sum(col("bucket"))).collect().head
    assert(rRow.getLong(0) == r.getLong(0) &&
      rRow.getLong(1) == r.getLong(1))
  }

  test("mapped and filtered scans read each file's footer EXACTLY once " +
      "(the one read serves name/filter binding and the reader itself)") {
    val root = freshTable()
    Snapshots.renameColumn(root, "grp", "bucket")
    def footerPerFile(body: => Long): (Long, Long, Long) = {
      val f0 = GraftVectorizedAudit.footerReads.get()
      val (n, vec) = vectorizedDelta(body)
      (n, vec, GraftVectorizedAudit.footerReads.get() - f0)
    }
    // mapped + filtered: the r18 reader paid 2 footer opens per file here
    val (n1, vec1, foot1) = footerPerFile {
      spark.read.format("graft").option("path", root).load()
        .where(col("k") >= 1000 && col("k") < 3000)
        .agg(sum(col("bucket"))).head().getLong(0)
    }
    assert(vec1 >= 1)
    assert(foot1 == vec1,
      s"one footer read per opened file, got $foot1 for $vec1 files")
    assert(n1 == (1000L until 3000L).map(_ % 7).sum)
    // unfiltered full scan of a data column: still exactly one per file
    val (n2, vec2, foot2) = footerPerFile {
      spark.read.format("graft").option("path", root).load()
        .agg(sum(col("k"))).head().getLong(0)
    }
    assert(vec2 == 4 && foot2 == 4, s"got $foot2 footer reads, $vec2 files")
    assert(n2 == (0L until 20000L).sum)
  }

  test("array<scalar> columns (the embedding shape) vectorize") {
    val d = java.nio.file.Files.createTempDirectory("graft_vecarr").toString
    val src = s"$d/src"
    (0L until 5000L).map(k => (k, Array.tabulate(8)(j => (k + j).toFloat)))
      .toDF("id", "emb").repartition(2).write.parquet(src)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("id"))
    val df = spark.read.format("graft").option("path", root).load()
    val (r, vec) = vectorizedDelta {
      df.agg(count(lit(1)),
        sum(element_at(col("emb"), 3).cast("double"))).collect().head
    }
    assert(vec >= 1, "array<float> scans must vectorize")
    assert(r.getLong(0) == 5000L)
    assert(r.getDouble(1) == (0L until 5000L).map(_ + 2.0).sum)
  }

  test("`_file`/`_pos` metadata columns serve columnar (constant + " +
      "row-index vectors) with exact positions") {
    val root = freshTable()
    val df = spark.read.format("graft").option("path", root).load()
      .select(col("k"), col("_file"), col("_pos"))
    val (rows, vec) = vectorizedDelta {
      df.where(col("k") < 50).collect()
    }
    assert(vec >= 1, "metadata-column scans must vectorize")
    assert(rows.length == 50)
    // the table is range-sorted by k with 4 files; positions within the
    // first file equal k (row ordinal), file name is a real store name
    assert(rows.forall(r => r.getLong(2) >= 0 &&
      r.getString(1).endsWith(".parquet")))
    val rRow = spark.read.format("graft").option("path", root)
      .option("vectorize", "false").load()
      .select(col("k"), col("_file"), col("_pos"))
      .where(col("k") < 50).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq ==
      rRow.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq,
      "metadata columns must match the row path exactly")
  }

  test("projections with no data column still take the row path " +
      "(metadata count, zero pages decoded)") {
    val root = freshTable()
    val (n, vec) = vectorizedDelta {
      spark.read.format("graft").option("path", root).load()
        .select(col("_pos")).where(col("_pos") >= 0).count()
    }
    assert(vec == 0, "a position-only projection stays on the row path")
    assert(n == 20000L)
  }
}
