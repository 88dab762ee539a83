package graft

import graft.sources.Snapshots
import graft.sources.v2.GraftDeleteAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level DELETE through the DSv2 connector
  * (`SupportsDeleteV2` on [[graft.sources.v2.GraftTable]]): the
  * three-tier plan — untouched files re-referenced, fully-covered
  * files dropped as PURE METADATA (zone bounds inside the predicate +
  * stamped zero null counts), straddling files probed exactly into a
  * MoR position sidecar — and its equivalence to the Scala twins.
  */
class SqlDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sqldel")
      .toString
    val cat = "gd" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    (cat, wh)
  }

  test("DELETE FROM: covered files drop metadata-only, straddlers take " +
      "a sidecar, result equals the Scala deleteRange twin") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.ns.t (k BIGINT, v BIGINT)
                 |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    // 4 sorted files of 2500 keys each (0..9999)
    spark.sql(s"""INSERT INTO $cat.ns.t
      |SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id * 10
      |FROM range(10000)""".stripMargin)
    val root = s"$wh/ns/t"
    val m0 = Snapshots.manifest(root, Snapshots.latestVersion(root))
    val dataFiles = m0.entries.filter(_.rows.exists(_ > 0L))
    assert(dataFiles.size == 4)
    assert(dataFiles.forall(_.nulls.get("k").contains(0L)),
      "write path must stamp null counts for stats columns")
    // the range partitioner samples its boundaries, so derive the
    // predicate FROM the committed zones: [file2.lo, mid(file3)) fully
    // covers file 2, straddles file 3, misses files 1 and 4
    val zs = dataFiles.flatMap(_.zones.get("k")).sortBy(_._1)
    val lo = zs(1)._1
    val hi = (zs(2)._1 + zs(2)._2) / 2 + 1
    assert(hi > zs(2)._1 && hi <= zs(2)._2, s"need a real straddle: $zs")
    GraftDeleteAudit.clear(root)
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k >= $lo AND k < $hi")
    val r = GraftDeleteAudit.lastResult(root).get
    assert(r.droppedFiles == 1,
      s"exactly the fully-covered file drops, got $r with zones $zs")
    assert(r.probedFiles == 1,
      s"exactly the straddling file probes, got $r")
    assert(r.markedPositions == hi - zs(2)._1,
      s"[${zs(2)._1}, $hi) marked, got $r")
    assert(r.sidecar.nonEmpty)
    val m1 = Snapshots.manifest(root, r.version)
    assert(m1.entries.count(_.rows.exists(_ > 0L)) == 3)
    // remaining data is exact
    assert(spark.sql(s"SELECT count(*), sum(k) FROM $cat.ns.t").head()
      == spark.sql(
        s"""SELECT count(*), sum(id) FROM range(10000)
          |WHERE id < $lo OR id >= $hi""".stripMargin).head())
    // twin check: Scala deleteRange on an identical table
    val root2 = s"$wh/ns/t2"
    spark.sql(s"""CREATE TABLE $cat.ns.t2 (k BIGINT, v BIGINT)
                 |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    spark.sql(s"""INSERT INTO $cat.ns.t2
      |SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id * 10
      |FROM range(10000)""".stripMargin)
    Snapshots.deleteRange(spark, root2, "k", lo, hi)
    val a = spark.sql(s"SELECT * FROM $cat.ns.t")
    val b = spark.sql(s"SELECT * FROM $cat.ns.t2")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "SQL DELETE must equal the Scala deleteRange as a multiset")
  }

  test("a delete wholly inside one file's zone probes only that file; " +
      "a second DELETE composes with the live sidecar") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.ns.t (k BIGINT, v BIGINT)
                 |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    spark.sql(s"""INSERT INTO $cat.ns.t
      |SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id
      |FROM range(10000)""".stripMargin)
    val root = s"$wh/ns/t"
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k >= 100 AND k < 200")
    val r1 = GraftDeleteAudit.lastResult(root).get
    assert(r1.droppedFiles == 0 && r1.probedFiles == 1 &&
      r1.markedPositions == 100L)
    // overlapping second delete: already-marked positions must not
    // re-mark (sidecars stay disjoint)
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k >= 150 AND k < 300")
    val r2 = GraftDeleteAudit.lastResult(root).get
    assert(r2.markedPositions == 100L,
      s"only 200..299 are fresh marks, got $r2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head().getLong(0)
      == 10000L - 300L + 100L)
  }

  test("IS NULL / IS NOT NULL and string equality delete exactly; " +
      "a predicate on an unknown column refuses") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.ns.tn (k BIGINT, tag STRING)
                 |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    spark.sql(s"""INSERT INTO $cat.ns.tn
      |SELECT id, CASE WHEN id % 3 = 0 THEN NULL
      |  ELSE concat('t', id % 5) END
      |FROM range(900)""".stripMargin)
    spark.sql(s"DELETE FROM $cat.ns.tn WHERE tag IS NULL")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.tn " +
      "WHERE tag IS NULL").head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.tn").head()
      .getLong(0) == 600L)
    spark.sql(s"DELETE FROM $cat.ns.tn WHERE tag = 't1'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.tn").head()
      .getLong(0) == 480L)
    intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.ns.tn WHERE nope = 1")
    }
  }

  test("deleting every row leaves a readable schema-bearing table") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.te (k BIGINT) USING graft " +
      "TBLPROPERTIES ('stats'='k')")
    spark.sql(s"INSERT INTO $cat.ns.te SELECT id FROM range(100)")
    spark.sql(s"DELETE FROM $cat.ns.te WHERE k >= 0")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.te").head()
      .getLong(0) == 0L)
    spark.sql(s"INSERT INTO $cat.ns.te SELECT id FROM range(5)")
    assert(spark.sql(s"SELECT sum(k) FROM $cat.ns.te").head()
      .getLong(0) == 10L)
  }
}
