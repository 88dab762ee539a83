package graft

import graft.sources.Snapshots
import graft.sources.v2.GraftScanAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The V2 catalog ([[graft.sources.v2.GraftCatalog]]): SQL DDL + DML +
  * time travel over graft tables with no library call in sight, and the
  * catalog's `stats` table property driving commit-time zones on
  * planner-routed INSERTs.
  */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_cat").toString
  private val auditId = s"cat-${java.util.UUID.randomUUID()}"

  private def sql(q: String) = spark.sql(q)

  private lazy val init: Unit = {
    spark.conf.set("spark.sql.catalog.gtest",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.warehouse", warehouse)
    spark.conf.set("spark.sql.catalog.gtest.auditId", auditId)
    sql("CREATE NAMESPACE IF NOT EXISTS gtest.ns")
    ()
  }

  test("CREATE TABLE + INSERT INTO: empty v1, data lands as v2, the " +
      "stats property stamps zones with no write option") {
    init
    sql("""CREATE TABLE gtest.ns.t1 (k BIGINT, grp BIGINT, tag STRING)
          |USING graft TBLPROPERTIES ('stats'='k,tag')""".stripMargin)
    assert(sql("SELECT count(*) FROM gtest.ns.t1").head().getLong(0) == 0L)
    sql("""INSERT INTO gtest.ns.t1
          |SELECT id AS k, id % 7 AS grp,
          |  concat('tag', lpad(CAST(id AS STRING), 5, '0')) AS tag
          |FROM range(10000)""".stripMargin)
    assert(sql("SELECT count(*), sum(k) FROM gtest.ns.t1").head()
      .getLong(0) == 10000L)
    val root = s"$warehouse/ns/t1"
    assert(Snapshots.latestVersion(root) == 2)
    val m = Snapshots.manifest(root, 2)
    val dataE = m.entries.filter(_.name.startsWith("w_"))
    assert(dataE.nonEmpty)
    dataE.foreach { e =>
      assert(e.rows.nonEmpty && e.zones.contains("k") &&
        e.szones.contains("tag"))
    }
    // the zero-row seed is still listed and harmless
    assert(m.entries.flatMap(_.rows).sum == 10000L)
  }

  test("SQL WHERE prunes files from manifest zones through the catalog " +
      "(executor audit ground truth)") {
    init
    sql("""CREATE TABLE gtest.ns.t2 (k BIGINT, v DOUBLE)
          |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    // 4 sorted inserts → 4 files with disjoint zones
    (0 until 4).foreach { i =>
      sql(s"""INSERT INTO gtest.ns.t2
             |SELECT id AS k, CAST(id AS DOUBLE) / 8 AS v
             |FROM range(${i * 2500}, ${(i + 1) * 2500})""".stripMargin)
    }
    GraftScanAudit.clear(auditId)
    val got = sql("""SELECT count(*) AS n, sum(k) AS sk FROM gtest.ns.t2
                    |WHERE k >= 2600 AND k < 2700""".stripMargin).head()
    assert(got.getLong(0) == 100L && got.getLong(1) ==
      (2600L until 2700L).sum)
    val opened = GraftScanAudit.opened(auditId)
    GraftScanAudit.clear(auditId)
    assert(opened.size == 1) // one zone held [2500, 5000)
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve through the catalog; " +
      "a pinned relation is read-only") {
    init
    sql("""CREATE TABLE gtest.ns.t3 (k BIGINT) USING graft
          |TBLPROPERTIES ('stats'='k')""".stripMargin)
    sql("INSERT INTO gtest.ns.t3 SELECT id FROM range(100)") // v2
    sql("INSERT INTO gtest.ns.t3 SELECT id FROM range(100, 150)") // v3
    assert(sql("SELECT count(*) FROM gtest.ns.t3").head().getLong(0)
      == 150L)
    assert(sql("SELECT count(*) FROM gtest.ns.t3 VERSION AS OF 2")
      .head().getLong(0) == 100L)
    assert(sql("SELECT count(*) FROM gtest.ns.t3 VERSION AS OF 1")
      .head().getLong(0) == 0L)
    val root = s"$warehouse/ns/t3"
    val ts2 = Snapshots.commitTimestamp(root, 2).get
    val t2 = new java.sql.Timestamp(ts2)
    assert(sql(s"SELECT count(*) FROM gtest.ns.t3 TIMESTAMP AS OF '$t2'")
      .head().getLong(0) == 100L)
  }

  test("INSERT OVERWRITE truncates to the new image; history intact") {
    init
    sql("CREATE TABLE gtest.ns.t4 (k BIGINT) USING graft")
    sql("INSERT INTO gtest.ns.t4 SELECT id FROM range(50)") // v2
    sql("INSERT OVERWRITE gtest.ns.t4 SELECT id FROM range(7)") // v3
    assert(sql("SELECT count(*) FROM gtest.ns.t4").head().getLong(0) == 7L)
    assert(sql("SELECT count(*) FROM gtest.ns.t4 VERSION AS OF 2")
      .head().getLong(0) == 50L)
  }

  test("CTAS, listTables, rename, drop") {
    init
    sql("CREATE TABLE gtest.ns.t5 USING graft AS SELECT id AS k " +
      "FROM range(25)")
    assert(sql("SELECT count(*) FROM gtest.ns.t5").head().getLong(0)
      == 25L)
    val names = sql("SHOW TABLES IN gtest.ns").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("t5"))
    sql("ALTER TABLE gtest.ns.t5 RENAME TO ns.t5r") // target is
    // catalog-relative (Spark resolves RENAME TO in the same catalog)
    assert(sql("SELECT count(*) FROM gtest.ns.t5r").head().getLong(0)
      == 25L)
    sql("DROP TABLE gtest.ns.t5r")
    assert(!sql("SHOW TABLES IN gtest.ns").collect()
      .map(_.getString(1)).contains("t5r"))
    intercept[Exception] { sql("SELECT * FROM gtest.ns.t5r").collect() }
  }

  test("ALTER TABLE: RENAME COLUMN and widening TYPE are metadata-only " +
      "manifest commits; unsupported changes are refused") {
    init
    sql("""CREATE TABLE gtest.ns.t7 (k BIGINT, cnt INT, tag STRING)
          |USING graft""".stripMargin)
    sql("""INSERT INTO gtest.ns.t7 SELECT id, CAST(id % 5 AS INT),
          |concat('x', id) FROM range(100)""".stripMargin)
    val root = s"$warehouse/ns/t7"
    val filesBefore = Snapshots.resolve(root, Snapshots.latestVersion(root))
    sql("ALTER TABLE gtest.ns.t7 RENAME COLUMN tag TO label")
    sql("ALTER TABLE gtest.ns.t7 ALTER COLUMN cnt TYPE BIGINT")
    val df = sql("SELECT label, cnt FROM gtest.ns.t7 WHERE k = 3")
    assert(df.schema("cnt").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.head().getString(0) == "x3" && df.head().getLong(1) == 3L)
    // zero files rewritten — evolution is manifest lines
    val filesAfter = Snapshots.resolve(root, Snapshots.latestVersion(root))
    assert(filesAfter == filesBefore)
    // still-unsupported shapes refuse (comments)
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.t7 ALTER COLUMN cnt COMMENT 'nope'")
    }
  }

  test("DESCRIBE HISTORY surface: option(\"history\") serves the commit " +
      "log as a local metadata relation") {
    init
    sql("CREATE TABLE gtest.ns.t8 (k BIGINT) USING graft")
    sql("INSERT INTO gtest.ns.t8 SELECT id FROM range(10)")
    sql("INSERT INTO gtest.ns.t8 SELECT id FROM range(10, 30)")
    val h = spark.read.format("graft")
      .option("path", s"$warehouse/ns/t8").option("history", "true")
      .load().orderBy("version").collect()
    assert(h.length == 3)
    assert(h.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3))
    val rows = h.map(_.getAs[Long]("n_rows"))
    assert(rows.toSeq == Seq(0L, 10L, 30L))
  }

  test("CALL procedures: optimize compacts to n_files, zorder relayouts " +
      "with 2-d stats, vacuum reclaims history — all from SQL") {
    init
    sql("""CREATE TABLE gtest.ns.t9 (k BIGINT, g BIGINT, v DOUBLE)
          |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    (0 until 6).foreach { i =>
      sql(s"""INSERT INTO gtest.ns.t9
             |SELECT id, id % 10, CAST(id AS DOUBLE)
             |FROM range(${i * 500}, ${(i + 1) * 500})""".stripMargin)
    }
    val root = s"$warehouse/ns/t9"
    val before = sql("SELECT count(*), sum(k) FROM gtest.ns.t9").head()
    // 6 inserts + seed → many small files; compact to 2
    val opt = sql("CALL gtest.system.optimize(table => 'ns.t9', " +
      "sort_col => 'k', n_files => 2)").head()
    assert(opt.getInt(0) == Snapshots.latestVersion(root))
    assert(Snapshots.resolve(root, opt.getInt(0)).size == 2)
    assert(sql("SELECT count(*), sum(k) FROM gtest.ns.t9").head()
      == before)
    // z-order relayout stamps 2-d zones
    val zv = sql("CALL gtest.system.zorder(table => 'ns.t9', " +
      "col_a => 'k', col_b => 'g', n_files => 4)").head().getInt(0)
    val zm = Snapshots.manifest(root, zv)
    assert(zm.entries.size == 4)
    assert(zm.entries.forall(e =>
      e.zones.contains("k") && e.zones.contains("g")))
    // vacuum drops pre-optimize history and reclaims their files
    val vac = sql("CALL gtest.system.vacuum(table => 'ns.t9', " +
      s"keep_from => $zv, grace_ms => 0)").head()
    assert(vac.getInt(0) > 0 && vac.getInt(1) > 0)
    assert(sql("SELECT count(*), sum(k) FROM gtest.ns.t9").head()
      == before)
    intercept[Exception] {
      sql("SELECT count(*) FROM gtest.ns.t9 VERSION AS OF 2").collect()
    }
  }

  test("catalog reads compose with the library: a Scala-API mutation " +
      "is visible to the next SQL query (one source of truth)") {
    init
    sql("""CREATE TABLE gtest.ns.t6 (k BIGINT, v DOUBLE) USING graft
          |TBLPROPERTIES ('stats'='k')""".stripMargin)
    sql("""INSERT INTO gtest.ns.t6
          |SELECT id, CAST(id AS DOUBLE) FROM range(1000)""".stripMargin)
    val root = s"$warehouse/ns/t6"
    Snapshots.deletePositions(spark, root, "k", 100L, 200L)
    assert(sql("SELECT count(*) FROM gtest.ns.t6").head().getLong(0)
      == 900L)
    assert(sql("SELECT count(*) FROM gtest.ns.t6 WHERE k >= 100 AND " +
      "k < 200").head().getLong(0) == 0L)
  }

  test("ALTER TABLE ADD COLUMN: one zero-row schema seed, old rows " +
      "read NULL, inserts carry it, old versions keep the old schema") {
    init
    sql("""CREATE TABLE gtest.ns.tadd (k BIGINT) USING graft
          |TBLPROPERTIES ('stats'='k')""".stripMargin)
    sql("INSERT INTO gtest.ns.tadd SELECT id FROM range(100)") // v2
    sql("ALTER TABLE gtest.ns.tadd ADD COLUMN score DOUBLE") // v3
    assert(sql("SELECT count(*) FROM gtest.ns.tadd " +
      "WHERE score IS NULL").head().getLong(0) == 100L)
    sql("INSERT INTO gtest.ns.tadd SELECT id, CAST(id AS DOUBLE) / 2 " +
      "FROM range(100, 110)")
    assert(sql("SELECT count(score), sum(score) FROM gtest.ns.tadd")
      .head() == org.apache.spark.sql.Row(10L, (100 until 110)
        .map(_ / 2.0).sum))
    assert(sql("SELECT count(*) FROM gtest.ns.tadd").head()
      .getLong(0) == 110L)
    // time travel below the evolution sees the old schema
    assert(!sql("SELECT * FROM gtest.ns.tadd VERSION AS OF 2")
      .columns.contains("score"))
    // duplicates and non-nullable adds refuse without committing
    val root = s"$warehouse/ns/tadd"
    val v = Snapshots.latestVersion(root)
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.tadd ADD COLUMN k BIGINT")
    }
    assert(Snapshots.latestVersion(root) == v)
  }

  test("ALTER TABLE DROP COLUMN: metadata-only tombstone — the schema " +
      "hides it, time travel serves it, the name is retired") {
    init
    sql("""CREATE TABLE gtest.ns.tdrop (k BIGINT, tag STRING, x DOUBLE)
          |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    sql("INSERT INTO gtest.ns.tdrop " +
      "SELECT id, concat('t', id), CAST(id AS DOUBLE) FROM range(100)")
    val root = s"$warehouse/ns/tdrop"
    val filesBefore = Snapshots.resolve(root,
      Snapshots.latestVersion(root)).toSet
    sql("ALTER TABLE gtest.ns.tdrop DROP COLUMN tag") // v3
    // metadata-only: same files, new version
    assert(Snapshots.resolve(root, Snapshots.latestVersion(root)).toSet
      == filesBefore)
    assert(!sql("SELECT * FROM gtest.ns.tdrop").columns.contains("tag"))
    assert(sql("SELECT count(*), sum(x) FROM gtest.ns.tdrop").head()
      == org.apache.spark.sql.Row(100L, (0 until 100).map(_.toDouble).sum))
    // time travel below the drop still serves the column
    assert(sql("SELECT count(tag) FROM gtest.ns.tdrop VERSION AS OF 2")
      .head().getLong(0) == 100L)
    // inserts after the drop carry the narrowed schema
    sql("INSERT INTO gtest.ns.tdrop SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(100, 110)")
    assert(sql("SELECT count(*) FROM gtest.ns.tdrop").head()
      .getLong(0) == 110L)
    // the name is retired: re-ADD and RENAME-onto both refuse, and a
    // failed statement commits nothing
    val v = Snapshots.latestVersion(root)
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.tdrop ADD COLUMN tag STRING")
    }
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.tdrop RENAME COLUMN x TO tag")
    }
    // the stats column and the last column refuse
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.tdrop DROP COLUMN k")
    }
    assert(Snapshots.latestVersion(root) == v)
    // optimize materializes the drop physically, keeps the tombstone
    sql(s"CALL gtest.system.optimize(`table` => 'ns.tdrop', " +
      s"sort_col => 'k', n_files => 2)")
    val vOpt = Snapshots.latestVersion(root)
    assert(Snapshots.manifest(root, vOpt).droppedColumns == Seq("tag"))
    assert(!spark.read.parquet(Snapshots.resolve(root, vOpt)
      .map(n => s"$root/files/$n"): _*).columns.contains("tag"))
    assert(sql("SELECT count(*) FROM gtest.ns.tdrop").head()
      .getLong(0) == 110L)
    intercept[Exception] { // still retired after materialization
      sql("ALTER TABLE gtest.ns.tdrop ADD COLUMN tag STRING")
    }
  }

  test("names freed by RENAME are retired while the map is live " +
      "(stale physical data would resurrect); optimize heals them") {
    init
    sql("""CREATE TABLE gtest.ns.tren (k BIGINT, a BIGINT) USING graft
          |TBLPROPERTIES ('stats'='k')""".stripMargin)
    sql("INSERT INTO gtest.ns.tren SELECT id, id * 10 FROM range(100)")
    sql("ALTER TABLE gtest.ns.tren RENAME COLUMN a TO b")
    // old files still hold physical 'a' (b's data): the name is retired
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.tren ADD COLUMN a BIGINT")
    }
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.tren RENAME COLUMN k TO a")
    }
    // optimize materializes the rename: physical 'a' is gone from every
    // live file, so the name becomes safely reusable
    sql("CALL gtest.system.optimize(`table` => 'ns.tren', " +
      "sort_col => 'k', n_files => 2)")
    sql("ALTER TABLE gtest.ns.tren ADD COLUMN a DOUBLE")
    assert(sql("SELECT count(a) FROM gtest.ns.tren").head()
      .getLong(0) == 0L, "the re-added column reads NULL, never b's data")
    assert(sql("SELECT sum(b) FROM gtest.ns.tren").head()
      .getLong(0) == (0 until 100).map(_ * 10L).sum)
  }

  test("CALL restore rolls the table back to an earlier version as one " +
      "metadata commit; history preserved; vacuumed targets refuse") {
    init
    sql("""CREATE TABLE gtest.ns.trst (k BIGINT, v BIGINT) USING graft
          |TBLPROPERTIES ('stats'='k')""".stripMargin)
    sql("INSERT INTO gtest.ns.trst SELECT id, id % 7 FROM range(1000)")
    val root = s"$warehouse/ns/trst"
    val vGood = Snapshots.latestVersion(root)
    sql("DELETE FROM gtest.ns.trst WHERE k < 900") // the bad write
    assert(sql("SELECT count(*) FROM gtest.ns.trst").head()
      .getLong(0) == 100L)
    val r = sql(s"CALL gtest.system.restore(`table` => 'ns.trst', " +
      s"version => $vGood)").head()
    assert(r.getInt(1) == vGood)
    assert(sql("SELECT count(*) FROM gtest.ns.trst").head()
      .getLong(0) == 1000L)
    // metadata-only: the restored version references vGood's exact files
    assert(Snapshots.resolve(root, r.getInt(0)) ==
      Snapshots.resolve(root, vGood))
    // the bad version stays time-travelable
    assert(sql(s"SELECT count(*) FROM gtest.ns.trst VERSION AS OF " +
      s"${vGood + 1}").head().getLong(0) == 100L)
    // vacuum away vGood's history, then a restore below it refuses
    val keepFrom = Snapshots.latestVersion(root)
    Snapshots.vacuum(root, keepFrom, graceMs = 0L)
    intercept[Exception] {
      sql(s"CALL gtest.system.restore(`table` => 'ns.trst', " +
        s"version => 1)")
    }
    assert(sql("SELECT count(*) FROM gtest.ns.trst").head()
      .getLong(0) == 1000L)
  }

  test("restore across a rename walks the stats= prop back to the " +
      "restored schema's column name") {
    init
    sql("""CREATE TABLE gtest.ns.trsp (k BIGINT, v BIGINT) USING graft
          |TBLPROPERTIES ('stats'='k')""".stripMargin)
    sql("INSERT INTO gtest.ns.trsp SELECT id, id FROM range(100)")
    val root = s"$warehouse/ns/trsp"
    val vPre = Snapshots.latestVersion(root)
    sql("ALTER TABLE gtest.ns.trsp RENAME COLUMN k TO key")
    assert(Snapshots.statsColsProp(root) == Seq("key"))
    Snapshots.restore(spark, root, vPre)
    // the restored schema has 'k' again; the prop must follow back, or
    // planner-routed writes would stamp zones for a nonexistent column
    assert(Snapshots.statsColsProp(root) == Seq("k"))
    assert(sql("SELECT sum(k) FROM gtest.ns.trsp").head()
      .getLong(0) == (0 until 100).map(_.toLong).sum)
  }

  test("CALL changes registers the row-tagged change feed as a temp " +
      "view — CDC through SQL, distributed (no driver collect)") {
    init
    sql("""CREATE TABLE gtest.ns.tcdc (k BIGINT, v BIGINT)
          |USING graft TBLPROPERTIES ('stats'='k')""".stripMargin)
    sql("""INSERT INTO gtest.ns.tcdc
          |SELECT id, id * 10 FROM range(1000)""".stripMargin) // v2
    // v3: MERGE — 50 updates (+1) and 10 inserts
    sql("""SELECT id AS k, id * 10 + 1 AS v FROM range(50)
          |UNION ALL
          |SELECT id + 5000 AS k, id AS v FROM range(10)""".stripMargin)
      .createOrReplaceTempView("tcdc_src")
    sql("""MERGE INTO gtest.ns.tcdc t USING tcdc_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
      .stripMargin)
    val row = sql("CALL gtest.system.changes(table => 'ns.tcdc', " +
      "from_version => 2, to_version => 3, key_col => 'k', " +
      "view_name => 'tcdc_changes')").head()
    assert(row.getString(0) == "tcdc_changes")
    val tags = sql("""SELECT _change_type, count(*) AS n
                     |FROM tcdc_changes GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags.getOrElse("insert", 0L) == 10L, s"tags=$tags")
    assert(tags.getOrElse("update_preimage", 0L) == 50L)
    assert(tags.getOrElse("update_postimage", 0L) == 50L)
    assert(tags.getOrElse("delete", 0L) == 0L)
    // value-exact pairing: post = pre + 50 (one +1 per updated key)
    val pp = sql("""SELECT
      |sum(CASE WHEN _change_type = 'update_postimage' THEN v END) -
      |sum(CASE WHEN _change_type = 'update_preimage' THEN v END)
      |FROM tcdc_changes""".stripMargin).head().getLong(0)
    assert(pp == 50L)
  }

  test("CREATE NAMESPACE under a table path is rejected (no namespaces " +
      "nested inside a table's root)") {
    init
    sql("""CREATE TABLE gtest.ns.tguard (k BIGINT) USING graft""")
    val e = intercept[Exception] {
      sql("CREATE NAMESPACE gtest.ns.tguard.sub")
    }
    assert(e.getMessage.contains("is a table") ||
      Option(e.getCause).exists(_.getMessage.contains("is a table")),
      s"expected the table-ancestor rejection, got: ${e.getMessage}")
    assert(!graft.sources.LakeFs.exists(s"$warehouse/ns/tguard/sub"),
      "no directory may appear inside the table root")
  }

  test("ALTER TABLE validates the whole change set up front: an " +
      "invalid rename commits nothing") {
    init
    sql("""CREATE TABLE gtest.ns.talter (a BIGINT, b BIGINT)
          |USING graft""".stripMargin)
    sql("INSERT INTO gtest.ns.talter SELECT id, id * 2 FROM range(10)")
    val root = s"$warehouse/ns/talter"
    val v = Snapshots.latestVersion(root)
    // rename of a nonexistent column: rejected, no version committed
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.talter RENAME COLUMN nope TO c")
    }
    assert(Snapshots.latestVersion(root) == v,
      "a rejected rename must not commit a manifest version")
    // rename colliding with an existing column: rejected, no commit
    intercept[Exception] {
      sql("ALTER TABLE gtest.ns.talter RENAME COLUMN a TO b")
    }
    assert(Snapshots.latestVersion(root) == v)
    // a valid rename still works after the rejections
    sql("ALTER TABLE gtest.ns.talter RENAME COLUMN a TO k")
    assert(sql("SELECT sum(k) FROM gtest.ns.talter").head().getLong(0)
      == 45L)
  }
}
