package graft

import graft.sources.{LakeFs, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `compactSidecars` / `CALL g.system.compact_sidecars` — K live
  * position-delete sidecars fold into ONE per-file-union sidecar with
  * ZERO data-file I/O: the read result is identical, the data file set
  * is untouched, time travel still serves every intermediate state, and
  * vacuum reclaims the superseded sidecars with their versions.
  */
class SidecarCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sc").toString
    val src = s"$d/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 20000L).map(k => (k, k % 7)).toDF("k", "grp"),
      "k", 4, src, 64 * 1024)
    val root = s"$d/t"
    Snapshots.init(spark, root, src, statsCols = Seq("k"))
    root
  }

  test("three MoR deletes -> one merged sidecar: identical reads, " +
      "untouched data files, time travel intact, vacuum reclaims") {
    val root = freshTable()
    Snapshots.deletePositions(spark, root, "k", 0L, 100L)      // v2
    Snapshots.deletePositions(spark, root, "k", 5000L, 5100L)  // v3
    Snapshots.deletePositions(spark, root, "k", 19900L, 20000L) // v4
    val v = Snapshots.latestVersion(root)
    val before = Snapshots.deleteSidecars(root, v)
    assert(before.size == 3)
    val filesBefore = Snapshots.resolve(root, v)
    val survivors = (0L until 20000L)
      .filterNot(k => k < 100L || (k >= 5000L && k < 5100L) || k >= 19900L)

    val r = Snapshots.compactSidecars(spark, root)
    assert(r.version == v + 1)
    assert(r.sidecarsBefore == 3 && r.sidecarsAfter == 1)
    assert(r.markedPositions == 300L)
    assert(Snapshots.deleteSidecars(root, r.version).size == 1)
    // METADATA-ONLY: the data file set is byte-for-byte the same list
    assert(Snapshots.resolve(root, r.version) == filesBefore)
    // reads identical through both the Scala and the DSv2 path
    val got = Snapshots.read(spark, root, r.version)
      .agg(count(lit(1)), sum(col("k"))).collect().head
    assert(got.getLong(0) == survivors.size.toLong)
    assert(got.getLong(1) == survivors.sum)
    val dsv2 = spark.read.format("graft").option("path", root).load()
      .agg(count(lit(1)), sum(col("k"))).collect().head
    assert(dsv2.getLong(0) == got.getLong(0) &&
      dsv2.getLong(1) == got.getLong(1))
    // time travel: the pre-compaction version still serves its state
    assert(Snapshots.read(spark, root, v).count() == survivors.size.toLong)
    assert(Snapshots.read(spark, root, 2).count() == 19900L)
    // vacuum past the old versions reclaims the 3 superseded sidecars
    Snapshots.vacuum(root, r.version, graceMs = 0L)
    before.foreach(n =>
      assert(!LakeFs.exists(s"$root/_deletes/$n"),
        s"superseded sidecar $n must be reclaimed"))
    assert(Snapshots.read(spark, root, r.version).count() ==
      survivors.size.toLong, "the merged sidecar survives vacuum")
  }

  test("no-op below two sidecars; SQL CALL surface returns the outcome") {
    val root = freshTable()
    // zero sidecars: no commit
    val v1 = Snapshots.latestVersion(root)
    val r0 = Snapshots.compactSidecars(spark, root)
    assert(r0.version == v1 && r0.sidecarsBefore == 0)
    assert(Snapshots.latestVersion(root) == v1)
    // via SQL CALL on a catalog table
    val wh = java.nio.file.Files.createTempDirectory("graft_scc").toString
    val cat = "gc" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.t (k BIGINT, grp BIGINT)
                 |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.ns.t SELECT id, id % 5 FROM range(1000)")
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k >= 10 AND k < 20")
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k >= 500 AND k < 520")
    val root2 = s"$wh/ns/t"
    assert(Snapshots.deleteSidecars(root2,
      Snapshots.latestVersion(root2)).size == 2)
    val row = spark.sql(
      s"CALL $cat.system.compact_sidecars(table => 'ns.t')")
      .collect().head
    assert(row.getInt(1) == 2 && row.getInt(2) == 1)
    assert(row.getLong(3) == 30L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t")
      .head().getLong(0) == 970L)
  }
}
