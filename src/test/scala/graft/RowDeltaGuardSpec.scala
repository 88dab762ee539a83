package graft

import graft.sources.{LakeFs, Snapshots}
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 row-level delta hardening:
  *
  *  1. CONCURRENT-WRITER conflict: two row-level statements planned
  *     against the SAME snapshot whose marks touch the same data file
  *     must not both commit (the second would double-apply — duplicate
  *     post-image rows / lost updates); disjoint-file deltas commit.
  *  2. SMALL-FILE guard: the delta is rebalanced before the writers
  *     (clustered by `_file`, advisory-sized), so a small MERGE lands a
  *     handful of files, not one per task slot.
  *  3. Sidecar parts use the PARTITIONED `file=` layout, so readers
  *     resolve only their own file's marks.
  */
class RowDeltaGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_rdg").toString
    val cat = "gr" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    (cat, wh)
  }

  private def seed(cat: String, table: String): Unit = {
    spark.sql(s"""CREATE TABLE $cat.ns.$table (k BIGINT, grp BIGINT)
                 |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    spark.sql(s"""INSERT INTO $cat.ns.$table
      |SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id % 7
      |FROM range(10000)""".stripMargin)
  }

  test("a row-level delta whose marked files were ALSO marked by a " +
      "commit since its scanned snapshot refuses; disjoint files commit") {
    val (cat, wh) = freshCatalog()
    seed(cat, "c")
    val root = s"$wh/ns/c"
    val scanned = Snapshots.latestVersion(root)
    val files = Snapshots.resolve(root, scanned)
    assert(files.size >= 4, "4 data files + the CREATE TABLE seed")
    // rival statement commits first, marking rows in the FIRST file
    spark.sql(s"UPDATE $cat.ns.c SET grp = -1 WHERE k < 10")
    val v2 = Snapshots.latestVersion(root)
    assert(v2 == scanned + 1)
    val rivalMarked = graft.sources.v2.GraftDvPositions.markedFiles(
      spark, root, Snapshots.deleteSidecars(root, v2))
    assert(rivalMarked.size == 1)
    // a delta planned against `scanned` marking the SAME file refuses
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitRowDelta(root, Seq.empty, Seq.empty,
        markedFiles = rivalMarked, scannedVersion = scanned)
    }
    // ... while a delta marking a DIFFERENT file commits fine
    val other = files.filterNot(rivalMarked.contains).head
    val v3 = Snapshots.commitRowDelta(root, Seq.empty, Seq.empty,
      markedFiles = Set(other), scannedVersion = scanned)
    assert(v3 == v2 + 1)
  }

  test("a delta planned before a rival RESTORE refuses: removed " +
      "sidecars mean the scan's pre-image is gone (resurrected rows " +
      "would duplicate its inserts)") {
    val (cat, wh) = freshCatalog()
    seed(cat, "r")
    val root = s"$wh/ns/r"
    spark.sql(s"UPDATE $cat.ns.r SET grp = -1 WHERE k < 10") // adds a dv
    val scanned = Snapshots.latestVersion(root)
    assert(Snapshots.deleteSidecars(root, scanned).nonEmpty)
    // rival RESTORE removes the sidecar (rows resurrect)
    Snapshots.restore(spark, root, scanned - 1)
    // any delta planned against `scanned` refuses — even insert-only
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitRowDelta(root, Seq.empty, Seq.empty,
        markedFiles = Set.empty, scannedVersion = scanned)
    }
    // a fresh statement against the restored snapshot commits fine
    val now = Snapshots.latestVersion(root)
    assert(Snapshots.commitRowDelta(root, Seq.empty, Seq.empty,
      markedFiles = Set.empty, scannedVersion = now) == now + 1)
  }

  test("a MERGE-mode delta refuses rival APPENDS since its scanned " +
      "snapshot (insert duplication window); DELETE/UPDATE-mode commits") {
    val (cat, wh) = freshCatalog()
    seed(cat, "a")
    val root = s"$wh/ns/a"
    val scanned = Snapshots.latestVersion(root)
    // rival plain append lands after the statement's scan
    spark.sql(s"INSERT INTO $cat.ns.a VALUES (90001, 1)")
    assert(Snapshots.latestVersion(root) == scanned + 1)
    // MERGE semantics (refuseNewFiles): the rival's insert files could
    // carry keys this statement decided to NOT-MATCH-insert — refuse
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitRowDelta(root, Seq.empty, Seq.empty,
        markedFiles = Set.empty, scannedVersion = scanned,
        refuseNewFiles = true)
    }
    // DELETE/UPDATE semantics: a missed concurrent append is
    // write-serializable snapshot behavior, not duplication — commits
    val v = Snapshots.commitRowDelta(root, Seq.empty, Seq.empty,
      markedFiles = Set.empty, scannedVersion = scanned)
    assert(v == scanned + 2)
  }

  test("sidecar card comes from the blob header (duplicate (file,pos) " +
      "rows collapse) and straddling files encode in bounded segments") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    seed(cat, "s")
    val root = s"$wh/ns/s"
    val v = Snapshots.latestVersion(root)
    val f = Snapshots.resolve(root, v).head
    // 5000 distinct positions, every row duplicated, spanning 5 encode
    // segments of 1000 positions each
    val fresh = (0L until 5000L).flatMap(p => Seq((f, p), (f, p)))
      .toDF("file", "pos")
    val Some((name, card)) = Snapshots.writeSidecarFile(spark, root, v,
      fresh, segmentPositions = 1000L)
    assert(card == 5000L, s"duplicates must not inflate card: $card")
    // bounded segments: >1 one-row (card, blob) part for the file
    val parts = spark.read.parquet(s"$root/_deletes/$name")
    assert(parts.count() >= 5L,
      "5 position-range segments must yield >= 5 bitmap parts")
    assert(parts.agg(org.apache.spark.sql.functions.sum("card"))
      .head().getLong(0) == 5000L)
    // readers union parts per file: exactly the distinct positions
    val got = graft.sources.v2.GraftDvPositions.forFile(
      spark.sessionState.newHadoopConf(), root, Seq(name), f)
    assert(got.toSeq == (0L until 5000L).toSeq)
  }

  test("a 100-row MERGE lands a handful of files (delta rebalanced " +
      "before the writers) and partitioned `file=` sidecar parts") {
    val (cat, wh) = freshCatalog()
    seed(cat, "g")
    val root = s"$wh/ns/g"
    val vBefore = Snapshots.latestVersion(root)
    val filesBefore = Snapshots.resolve(root, vBefore).toSet
    // 100 updates spread across ALL 4 files + 10 inserts
    ((0L until 10000L by 100L).map(k => (k, -7L)) ++
      (90000L until 90010L).map(k => (k, 1L)))
      .toDF("k", "grp").createOrReplaceTempView("guard_src")
    spark.sql(s"""MERGE INTO $cat.ns.g t USING guard_src s ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET t.grp = s.grp
                 |WHEN NOT MATCHED THEN INSERT (k, grp)
                 |VALUES (s.k, s.grp)""".stripMargin)
    val vAfter = Snapshots.latestVersion(root)
    val newFiles = Snapshots.resolve(root, vAfter).toSet -- filesBefore
    assert(newFiles.nonEmpty)
    assert(newFiles.size <= 2,
      s"a 110-row delta must coalesce to ~1 insert file, got " +
        s"${newFiles.size}: $newFiles")
    val sidecars = Snapshots.deleteSidecars(root, vAfter)
    assert(sidecars.nonEmpty && sidecars.size <= 2,
      s"marks must coalesce into few sidecar parts, got $sidecars")
    // partitioned layout: every sidecar is a directory of file= subdirs
    sidecars.foreach { n =>
      val dir = s"$root/_deletes/$n"
      val subs = LakeFs.listDirNames(dir)
      assert(subs.nonEmpty && subs.forall(_.startsWith("file=")),
        s"sidecar $n must use the partitioned layout, got $subs")
    }
    // values: 100 updates applied, 10 inserts present
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.g WHERE grp = -7")
      .head().getLong(0) == 100L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.g")
      .head().getLong(0) == 10010L)
  }
}
