package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the DSv2 read paths on a WIDE scan: the same snapshot table
  * aggregated over every column through (A) the COLUMNAR path (Spark's
  * vectorized parquet reader — the clean-scan default) and (B) the
  * row-at-a-time Group reader (`.option("vectorize", false)`). One
  * warm-up per path, then alternating timed runs, medians reported —
  * the evidence that the vectorized path carries wide scans.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.VecAbMain' }}}
  */
object VecAbMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val rows = sys.env.getOrElse("SPARK_GRAFT_VECAB_ROWS", "4000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // wide fixture: 10 columns (4 longs, 3 doubles, 2 strings, 1 bool)
    val d = java.nio.file.Files.createTempDirectory("graft_vecab")
    try {
      val df = spark.range(rows).select(
        col("id").as("k"),
        (col("id") % 97).as("a"),
        (col("id") % 1009).as("b"),
        (col("id") * 31 % 7919).as("c"),
        (col("id") % 1000 / 7.0).as("x"),
        (col("id") % 313 * 1.5).as("y"),
        (col("id") % 71 / 3.0).as("z"),
        concat(lit("user"), col("id") % 100000).as("u"),
        concat(lit("tag"), col("id") % 64).as("t"),
        (col("id") % 2 === 0).as("flag"))
      graft.sources.Bucketing.writeRangeSorted(df, "k", cpus.toInt,
        s"$d/seed", 8 * 1024 * 1024)
      val root = s"$d/t"
      graft.sources.Snapshots.init(spark, root, s"$d/seed",
        statsCols = Seq("k"))

      def scan(vectorize: Boolean): Unit =
        spark.read.format("graft").option("path", root)
          .option("vectorize", vectorize.toString).load()
          .agg(count(lit(1)), sum(col("a")), sum(col("b")), sum(col("c")),
            sum(col("x")), sum(col("y")), sum(col("z")),
            sum(length(col("u"))), sum(length(col("t"))),
            sum(when(col("flag"), 1L).otherwise(0L)))
          .write.format("noop").mode("overwrite").save()
      def time(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      // FILTERED wide scan (a ~10% slice pushed into the scan): the
      // vectorized path takes it through a parquet FilterPredicate
      // (row-group + page skipping), the row path through its own
      // block-stat group skipping — both end-to-end row-exact
      def scanFiltered(vectorize: Boolean): Unit =
        spark.read.format("graft").option("path", root)
          .option("vectorize", vectorize.toString).load()
          .where(col("k") >= rows / 2 && col("k") < rows / 2 + rows / 10)
          .agg(count(lit(1)), sum(col("a")), sum(col("x")),
            sum(length(col("u"))))
          .write.format("noop").mode("overwrite").save()
      scan(true); scan(false) // warm both paths
      scanFiltered(true); scanFiltered(false)
      val (vec, row) = (Array.ofDim[Double](runs), Array.ofDim[Double](runs))
      val (vecF, rowF) = (Array.ofDim[Double](runs), Array.ofDim[Double](runs))
      (0 until runs).foreach { i =>
        vec(i) = time(scan(true))
        row(i) = time(scan(false))
        vecF(i) = time(scanFiltered(true))
        rowF(i) = time(scanFiltered(false))
      }
      // DV'D wide scans — the post-MERGE/erasure steady state, both
      // mark shapes. Since r18 the columnar path serves these through
      // the row-index selection; before, every post-mutation scan paid
      // the row path for the WHOLE table.
      //  - RANGE erasure (the GDPR/retention shape): 1% contiguous —
      //    all-dead batches skip whole, fully-live batches pass raw
      //    vectors through, only the two boundary batches pay the
      //    selection indirection → ~clean-scan speed;
      //  - SCATTERED marks (every 101st row): every 4096-row batch
      //    holds ~40 marks, so EVERY batch pays the per-access
      //    selection indirection — the adversarial density.
      graft.sources.Snapshots.deletePositions(spark, root, "k",
        rows / 2, rows / 2 + rows / 100)
      scan(true); scan(false) // re-warm on the dv'd table
      val (vecR, rowR) = (Array.ofDim[Double](runs), Array.ofDim[Double](runs))
      (0 until runs).foreach { i =>
        vecR(i) = time(scan(true))
        rowR(i) = time(scan(false))
      }
      // fold the range sidecar first so the scatter leg measures the
      // pure scattered shape, not two stacked sidecars
      graft.sources.Snapshots.optimize(spark, root, "k", cpus.toInt)
      graft.sources.Snapshots.deletePositionsByKey(spark, root, "k",
        spark.range(rows).select(col("id"))
          .where(col("id") % 101 === 0).select(col("id").as("k")))
      scan(true); scan(false)
      val (vecD, rowD) = (Array.ofDim[Double](runs), Array.ofDim[Double](runs))
      (0 until runs).foreach { i =>
        vecD(i) = time(scan(true))
        rowD(i) = time(scan(false))
      }
      def med(a: Array[Double]): Double = a.sorted.apply(a.length / 2)
      println(f"""{"metric":"vec_ab","rows":$rows,"cols":10,""" +
        f""""vectorized_sec":${med(vec)}%.3f,""" +
        f""""row_reader_sec":${med(row)}%.3f,""" +
        f""""speedup":${med(row) / med(vec)}%.2f,""" +
        f""""filtered_vectorized_sec":${med(vecF)}%.3f,""" +
        f""""filtered_row_sec":${med(rowF)}%.3f,""" +
        f""""filtered_speedup":${med(rowF) / med(vecF)}%.2f,""" +
        f""""dv_range_vectorized_sec":${med(vecR)}%.3f,""" +
        f""""dv_range_row_sec":${med(rowR)}%.3f,""" +
        f""""dv_range_speedup":${med(rowR) / med(vecR)}%.2f,""" +
        f""""dv_scatter_vectorized_sec":${med(vecD)}%.3f,""" +
        f""""dv_scatter_row_sec":${med(rowD)}%.3f,""" +
        f""""dv_scatter_speedup":${med(rowD) / med(vecD)}%.2f}""")
    } finally {
      graft.sources.LakeFs.deleteRecursively(d.toString)
      ()
    }
    spark.stop()
  }
}
