package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `MERGE INTO` / `UPDATE` through the delta-based row-level
  * operation ([[graft.sources.v2.GraftRowLevelOperation]]): matched
  * rows retract as position-delete sidecar parts, replacement/insert
  * rows append as fresh files, existing files are NEVER rewritten, and
  * the result equals the Scala merge-on-read twin
  * ([[graft.sources.Snapshots.upsertPositions]]) row for row.
  */
class SqlMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sqlmerge")
      .toString
    val cat = "gm" +
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

  test("MERGE INTO: matched rows update, unmatched insert, zero files " +
      "rewritten, equals the Scala MoR upsert twin") {
    val (cat, wh) = freshCatalog()
    seed(cat, "t")
    val root = s"$wh/ns/t"
    val vBefore = Snapshots.latestVersion(root)
    val filesBefore = Snapshots.resolve(root, vBefore).toSet
    ((100L until 200L).map(k => (k, 42L)) ++
      (20000L until 20010L).map(k => (k, 9L)))
      .toDF("k", "grp").createOrReplaceTempView("merge_src")
    spark.sql(s"""MERGE INTO $cat.ns.t t USING merge_src s ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET t.grp = s.grp
                 |WHEN NOT MATCHED THEN INSERT (k, grp)
                 |VALUES (s.k, s.grp)""".stripMargin)
    val vAfter = Snapshots.latestVersion(root)
    assert(vAfter == vBefore + 1, "one manifest commit")
    // zero rewrites: every pre-merge file survives verbatim
    assert(filesBefore.subsetOf(Snapshots.resolve(root, vAfter).toSet))
    assert(Snapshots.deleteSidecars(root, vAfter).nonEmpty,
      "matched rows retract via sidecar parts")
    // result equality vs the Scala MoR upsert on a twin table
    seed(cat, "tw")
    val twinRoot = s"$wh/ns/tw"
    Snapshots.upsertPositions(spark, twinRoot, "k", "k",
      spark.table("merge_src"))
    val a = spark.sql(s"SELECT * FROM $cat.ns.t")
    val b = Snapshots.read(spark, twinRoot,
      Snapshots.latestVersion(twinRoot))
    assert(a.count() == 10010L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "SQL MERGE must equal the Scala MoR upsert as a multiset")
    // spot semantics: updated window carries grp=42, inserts present
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t " +
      "WHERE k >= 100 AND k < 200 AND grp <> 42").head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t WHERE k >= 20000")
      .head().getLong(0) == 10L)
  }

  test("UPDATE statement routes through delete+insert delta; time " +
      "travel still serves the pre-update image") {
    val (cat, wh) = freshCatalog()
    seed(cat, "tu")
    val root = s"$wh/ns/tu"
    val v = Snapshots.latestVersion(root)
    spark.sql(s"UPDATE $cat.ns.tu SET grp = -1 WHERE k >= 500 AND k < 600")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.tu WHERE grp = -1")
      .head().getLong(0) == 100L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.tu").head()
      .getLong(0) == 10000L)
    // the old image is intact at the previous version
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns.tu VERSION AS OF $v WHERE grp = -1")
      .head().getLong(0) == 0L)
    // files of v survive verbatim (no rewrite)
    assert(Snapshots.resolve(root, v).toSet
      .subsetOf(Snapshots.resolve(root, v + 1).toSet))
  }

  test("DELETE with a predicate the metadata path refuses falls back " +
      "to the row-level plan") {
    val (cat, wh) = freshCatalog()
    seed(cat, "td")
    val root = s"$wh/ns/td"
    // modulo predicate: not zone-translatable -> canDeleteWhere false
    // -> row-level DELETE (delete-only delta)
    spark.sql(s"DELETE FROM $cat.ns.td WHERE k % 100 = 7")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.td").head()
      .getLong(0) == 9900L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns.td WHERE k % 100 = 7").head()
      .getLong(0) == 0L)
    assert(Snapshots.deleteSidecars(root,
      Snapshots.latestVersion(root)).nonEmpty)
  }

  test("optimize folds row-level sidecars; a stale delta against a " +
      "rewritten file refuses to commit") {
    val (cat, wh) = freshCatalog()
    seed(cat, "tc")
    val root = s"$wh/ns/tc"
    spark.sql(s"UPDATE $cat.ns.tc SET grp = -5 WHERE k < 50")
    val v = Snapshots.latestVersion(root)
    assert(Snapshots.deleteSidecars(root, v).nonEmpty)
    val ov = Snapshots.optimize(spark, root, "k", 2)
    assert(Snapshots.deleteSidecars(root, ov).isEmpty, "marks folded")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.tc WHERE grp = -5")
      .head().getLong(0) == 50L)
    // conflict check: a delta whose marked file vanished must refuse
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitRowDelta(root, Seq.empty, Seq("dv_fake.parquet"),
        Set("no_such_file.parquet"),
        scannedVersion = Snapshots.latestVersion(root))
    }
  }
}
