package graft

import graft.sources.{Bucketing, Compaction}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.sources.Compaction]] — small-file compaction with the sort
  * layout RESTORED: file-count law (ceil(bytes/target)), losslessness,
  * approximate size balance, and the footer-level proof that the rewrite
  * re-established pp2-style row-group skipping (tight, ordered min/max
  * stats) instead of destroying it like a round-robin rewrite would.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.01")

  private lazy val fragDir = Queries.fragmentedEventsPath(spark, sfDir)
  private lazy val compDir = Queries.compactedEventsPath(spark, sfDir)

  test("fragmented fixture really is the small-file problem: 64 files") {
    assert(Compaction.dataFiles(fragDir).size == 64)
  }

  test("plannedFiles is the ceil law") {
    val total = Compaction.dataFiles(fragDir).map(_.length).sum
    assert(Compaction.plannedFiles(fragDir, total) == 1)
    assert(Compaction.plannedFiles(fragDir, total / 4 + 1) == 4)
    assert(Compaction.plannedFiles(fragDir, Long.MaxValue) == 1)
    assert(Compaction.plannedFiles(fragDir, 1) == total)
  }

  test("compaction hits the requested file count, preserves every row, " +
      "and roughly balances bytes") {
    val files = Compaction.dataFiles(compDir)
    assert(files.size == 4)
    val nFrag = spark.read.parquet(fragDir).count()
    val nComp = spark.read.parquet(compDir).count()
    assert(nComp == nFrag && nComp > 0)
    // range split of near-uniform event times: no file should hold more
    // than ~double its fair byte share (loose, but catches a degenerate
    // all-in-one-partition split)
    val sizes = files.map(_.length.toDouble)
    assert(sizes.max <= sizes.sum / 4 * 2.25,
      s"unbalanced compaction: ${sizes.mkString(",")}")
  }

  test("compaction restores the skippable layout: per-file ranges " +
      "disjoint AND row groups ordered with tight stats (footer audit)") {
    val groups = Bucketing.rowGroupStats(spark, compDir, "ts")
    assert(groups.size > 4, "each file should span multiple row groups")
    // within a file: sorted => consecutive groups non-overlapping
    groups.groupBy(_._1).foreach { case (f, gs) =>
      gs.sliding(2).foreach {
        case Seq((_, _, _, hi1), (_, _, lo2, _)) =>
          assert(hi1 <= lo2, s"overlapping row groups in $f")
        case _ => ()
      }
    }
    // across files: the per-file [min,max] envelopes are pairwise disjoint
    val envelopes = groups.groupBy(_._1).map { case (f, gs) =>
      (f, gs.map(_._3).min, gs.map(_._4).max)
    }.toSeq.sortBy(_._2)
    envelopes.sliding(2).foreach {
      case Seq((_, _, hi1), (f2, lo2, _)) =>
        assert(hi1 <= lo2, s"file range overlaps previous: $f2")
      case _ => ()
    }
  }

  test("a plain round-robin rewrite does NOT restore the layout — the " +
      "contrast that justifies the range shuffle") {
    val rr = java.nio.file.Files
      .createTempDirectory("graft_cf_rr").toString + "/d"
    // isolated session: the contrast write needs TIMESTAMP_MICROS (INT96
    // carries no stats at all — that's a different failure than the one
    // this test demonstrates) without racing parallel suites on the
    // shared session conf
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    s2.read.parquet(fragDir).repartition(4)
      .write.option("parquet.block.size", 16 * 1024L).parquet(rr)
    val envelopes = Bucketing.rowGroupStats(spark, rr, "ts")
      .groupBy(_._1).map { case (f, gs) =>
        (f, gs.map(_._3).min, gs.map(_._4).max)
      }.toSeq.sortBy(_._2)
    // every round-robin file spans ~the full time range: envelopes overlap
    val overlaps = envelopes.sliding(2).count {
      case Seq((_, _, hi1), (_, lo2, _)) => hi1 > lo2
      case _ => false
    }
    assert(overlaps == envelopes.size - 1,
      "round-robin rewrite unexpectedly produced disjoint files")
  }
}
