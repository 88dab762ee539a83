package graft

import graft.sources.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** The zone-stamping DEFAULT (`stats` table property) as VERSIONED
  * manifest state (`#stats:` meta) — atomic with the commits that
  * change the schema:
  *
  *  - RENAME COLUMN updates the default in the SAME manifest create as
  *    its `#map:` line (no crash window naming a dead column);
  *  - RESTORE takes the target version's line (no post-commit repair);
  *  - rewrites (optimize) and INSERT OVERWRITE carry it.
  */
class StatsMetaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sm").toString
    val cat = "gs" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    (cat, wh)
  }

  test("rename updates #stats atomically; restore across the rename " +
      "brings the old default back with the old schema") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.ns.t (k BIGINT, v DOUBLE)
                 |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    val root = s"$wh/ns/t"
    spark.sql(s"INSERT INTO $cat.ns.t SELECT id, id * 1.5 FROM range(100)")
    assert(Snapshots.statsColsProp(root) == Seq("k"))
    val vBefore = Snapshots.latestVersion(root)
    spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN k TO key")
    // the rename commit itself carries the repaired default
    val vRen = Snapshots.latestVersion(root)
    assert(Snapshots.manifest(root, vRen).statsColsMeta ==
      Some(Seq("key")))
    assert(Snapshots.statsColsProp(root) == Seq("key"))
    // restore to the pre-rename version: the default follows the schema
    // back — one atomic manifest, no side-file repair involved
    Snapshots.restore(spark, root, vBefore)
    assert(Snapshots.statsColsProp(root) == Seq("k"))
    val cols = Snapshots.read(spark, root,
      Snapshots.latestVersion(root)).columns.toSeq
    assert(cols.contains("k") && !cols.contains("key"))
  }

  test("#stats survives optimize and INSERT OVERWRITE, and new writes " +
      "keep stamping zones for the default column") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.ns.o (k BIGINT, v DOUBLE)
                 |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    val root = s"$wh/ns/o"
    spark.sql(s"INSERT INTO $cat.ns.o SELECT id, id * 0.5 FROM range(500)")
    Snapshots.optimize(spark, root, "k", 2)
    assert(Snapshots.statsColsProp(root) == Seq("k"),
      "a rewrite must not reset the stats default")
    spark.sql(s"INSERT OVERWRITE $cat.ns.o " +
      s"SELECT id, id * 2.0 FROM range(300)")
    assert(Snapshots.statsColsProp(root) == Seq("k"),
      "INSERT OVERWRITE must not reset the stats default")
    spark.sql(s"INSERT INTO $cat.ns.o SELECT id + 1000, 0.0 FROM range(10)")
    val m = Snapshots.manifest(root, Snapshots.latestVersion(root))
    assert(m.entries.exists(e => e.zones.contains("k")),
      "planner-routed writes still stamp zones for the default column")
  }
}
