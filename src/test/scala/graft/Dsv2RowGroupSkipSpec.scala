package graft

import graft.sources.Snapshots
import graft.sources.v2.ParquetRowReader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Row-group skipping INSIDE selected files
  * ([[graft.sources.v2.ParquetRowReader]]'s row-group-wise read): a
  * pushed filter prunes FILES from manifest zones and then prunes ROW
  * GROUPS from block statistics — pages of non-matching groups are
  * never decoded (reader-level counters) — while row POSITIONS stay
  * exact (group start ordinals from footer row counts), so
  * position-delete sidecars keep applying to the right rows.
  */
class Dsv2RowGroupSkipSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** ONE file of 50k sorted rows with ~16 KB row groups (many groups). */
  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_rgs").toString
    val src = s"$d/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 50000L).map(k => (k, k % 7)).toDF("k", "grp"), "k", 1,
      src, 16 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    root
  }

  private def groupCounts[A](body: => A): (A, Long, Long) = {
    val r0 = ParquetRowReader.rowGroupsRead.get()
    val s0 = ParquetRowReader.rowGroupsSkipped.get()
    val a = body
    (a, ParquetRowReader.rowGroupsRead.get() - r0,
      ParquetRowReader.rowGroupsSkipped.get() - s0)
  }

  test("a pushed range filter skips non-matching row groups whole; " +
      "positions and DV application stay exact") {
    val root = freshTable()
    // mark [10000, 10050) dead — inside the range the filter selects
    val del = Snapshots.deletePositions(spark, root, "k", 10000L, 10050L)
    assert(del.markedPositions == 50L)
    // drive the ROW reader explicitly — dv'd scans default to the
    // columnar path since r18, and this spec gates the row reader's
    // group-skip counters
    val (rows, read, skipped) = groupCounts {
      spark.read.format("graft").option("path", root)
        .option("vectorize", "false").load()
        .where(col("k") >= 9900 && col("k") < 10200)
        .select(col("k")).collect().map(_.getLong(0)).sorted
    }
    assert(skipped > 0, "non-matching row groups must be skipped whole")
    assert(read > 0 && read < read + skipped)
    assert(read <= 4,
      s"a 300-key slice of ~16KB groups must read a handful, read $read")
    // exactness: the slice minus the dv-marked window
    val expect = ((9900L until 10000L) ++ (10050L until 10200L)).sorted
    assert(rows.toSeq == expect,
      "row positions must survive group skipping (DV applied exactly)")
    // the default (columnar) path returns the identical slice — its
    // positions come from the row-index generator, exact under the
    // parquet FilterPredicate's own group skipping
    val colRows = spark.read.format("graft").option("path", root).load()
      .where(col("k") >= 9900 && col("k") < 10200)
      .select(col("k")).collect().map(_.getLong(0)).sorted
    assert(colRows.toSeq == expect)
  }

  test("an emit-only read (change-feed marks) decodes only the groups " +
      "holding marked positions") {
    val root = freshTable()
    Snapshots.deletePositions(spark, root, "k", 42000L, 42010L)
    val m = Snapshots.manifest(root, 2)
    val file = m.files.head
    val conf = spark.sessionState.newHadoopConf()
    val marks = graft.sources.v2.GraftDvPositions.forFile(conf, root,
      m.dvNames, file)
    assert(marks.length == 10)
    val (got, read, skipped) = groupCounts {
      val it = ParquetRowReader.open(s"$root/files/$file", conf,
        StructType(Seq(StructField("k", LongType))), Seq.empty,
        Array.empty, None, emitOnly = Some(marks))
      val buf = scala.collection.mutable.ArrayBuffer[Long]()
      try while (it.next()) buf += it.get().getLong(0)
      finally it.close()
      buf.toSeq
    }
    assert(got == (42000L until 42010L).toSeq)
    assert(read <= 2 && skipped > 0,
      s"only the groups holding the 10 marks decode: read=$read " +
        s"skipped=$skipped")
  }

  test("conservative contract: a filter on a column without block " +
      "stats reads every group (no wrong skip)") {
    val root = freshTable()
    // grp is NOT a stats column in the manifest, but parquet blocks
    // still carry its stats; filter instead on a column parquet cannot
    // decide: an Or with one side on a missing-stat shape is still
    // exact because the residual filter re-evaluates rows
    val df = spark.read.format("graft").option("path", root).load()
      .where(col("k") >= 49990 || col("grp") === 3)
    assert(df.count() ==
      10L + (0L until 49990L).count(_ % 7 == 3))
  }
}
