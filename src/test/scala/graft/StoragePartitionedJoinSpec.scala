package graft

import graft.sources.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** STORAGE-PARTITIONED JOINS: two snapshot tables bucketed with the
  * SAME catalog function (`graft.bucket`) and count on their join keys
  * join with NO shuffle Exchange on either side — the scan reports
  * `KeyGroupedPartitioning(bucket(n, key))` and Spark groups the
  * partitions by bucket id instead of exchanging both inputs. Values
  * must hash-match the shuffled plan exactly.
  */
class StoragePartitionedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Hash-exchange count of the FINAL physical plan (AQE hides
    * exchanges inside query stages that tree-collect does not enter —
    * the rendered final plan shows them all).
    */
  private def shuffles(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    // FINAL plan only — AQE's rendering appends the pre-adaptive
    // "Initial Plan", whose exchanges never ran
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "Exchange hashpartitioning".r.findAllIn(plan).size
  }

  private def withSpjConfs[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-bucketed tables join with ZERO shuffle exchanges; values " +
      "equal the shuffled twin; catalog INSERTs MAINTAIN the layout " +
      "so SPJ survives appends") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj").toString
    val cat = "gj" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.fact (k BIGINT, amt DOUBLE)
                 |USING graft""".stripMargin)
    spark.sql(s"""CREATE TABLE $cat.ns.dim (k BIGINT, grp BIGINT)
                 |USING graft""".stripMargin)
    spark.sql(s"INSERT INTO $cat.ns.fact " +
      "SELECT id % 1000, id * 0.5 FROM range(20000)")
    spark.sql(s"INSERT INTO $cat.ns.dim SELECT id, id % 7 FROM range(1000)")
    // bucket BOTH sides on the join key with the same count via SQL
    val b1 = spark.sql(
      s"CALL $cat.system.bucket(table => 'ns.fact', col => 'k', " +
        "n_buckets => 8)").collect().head
    assert(b1.getInt(1) == 8 && b1.getInt(2) >= 8)
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.dim', col => 'k', " +
      "n_buckets => 8)")

    val q = s"""SELECT f.k AS k, sum(f.amt) AS amt, max(d.grp) AS grp
               |FROM $cat.ns.fact f JOIN $cat.ns.dim d ON f.k = d.k
               |GROUP BY f.k""".stripMargin
    val (spjRows, spjShuffles) = withSpjConfs {
      val df = spark.sql(q)
      val n = shuffles(df)
      (df.collect().map(_.toString).sorted.toSeq, n)
    }
    // the shuffled twin: same query with SPJ disabled
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val twin = spark.sql(q)
    val twinShuffles = shuffles(twin)
    val twinRows = twin.collect().map(_.toString).sorted.toSeq
    spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(spjRows == twinRows, "SPJ values must equal the shuffled plan")
    assert(spjRows.size == 1000)
    // the JOIN ran without exchanging either side: at most the final
    // GROUP BY's shuffle survives under SPJ (AQE may remove even
    // that); the shuffled twin pays a hash exchange per join input
    assert(spjShuffles <= 1,
      s"expected no join exchanges under SPJ, got $spjShuffles")
    assert(twinShuffles >= 2,
      s"twin should shuffle both join inputs, got $twinShuffles")
    assert(spjShuffles < twinShuffles)

    // LAYOUT MAINTENANCE: an INSERT INTO the bucketed table splits its
    // rows per bucket id in the writers and stamps every new file's
    // `k=`, so SPJ stays ALIVE after the append instead of silently
    // degrading to a full two-sided shuffle until the next relayout
    spark.sql(s"INSERT INTO $cat.ns.fact VALUES (5, 100.0), (1003, 2.5)")
    val factRoot = s"$wh/ns/fact"
    val mAfter = Snapshots.manifest(factRoot,
      Snapshots.latestVersion(factRoot))
    assert(mAfter.bucketSpec == Some(("k", 8)))
    assert(mAfter.entries.forall(_.bucket.isDefined),
      "a catalog INSERT must stamp its files' buckets")
    // the appended rows landed in their keys' buckets
    Seq(5L, 1003L).foreach { key =>
      val b = graft.sources.v2.GraftBucket.id(8, key)
      assert(mAfter.entries.filter(_.bucket.contains(b)).exists { e =>
        spark.read.parquet(s"$factRoot/files/${e.name}")
          .filter(col("k") === key).count() >= 1
      }, s"key $key must be readable from a bucket-$b file")
    }
    val (rows2, shuffles2) = withSpjConfs {
      val df = spark.sql(
        s"SELECT sum(f.amt) AS s FROM $cat.ns.fact f " +
          s"JOIN $cat.ns.dim d ON f.k = d.k")
      (df.collect().head.getDouble(0), shuffles(df))
    }
    val expected = (0L until 20000L)
      .map(id => (id % 1000, id * 0.5)).map(_._2).sum + 100.0
    assert(math.abs(rows2 - expected) < 1e-6) // key 1003 has no dim row
    assert(shuffles2 == 0,
      s"SPJ must survive a bucket-maintaining INSERT, got $shuffles2 " +
        "exchanges")
  }

  test("MERGE inserts keep the bucket layout: a MoR upsert leaves " +
      "every file stamped and SPJ alive") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj3").toString
    val cat = "gm" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.fact (k BIGINT, amt DOUBLE)
                 |USING graft""".stripMargin)
    spark.sql(s"""CREATE TABLE $cat.ns.dim (k BIGINT, grp BIGINT)
                 |USING graft""".stripMargin)
    spark.sql(s"INSERT INTO $cat.ns.fact " +
      "SELECT id % 100, CAST(id AS DOUBLE) FROM range(1000)")
    spark.sql(s"INSERT INTO $cat.ns.dim SELECT id, id % 5 FROM range(100)")
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.fact', col => 'k', " +
      "n_buckets => 4)")
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.dim', col => 'k', " +
      "n_buckets => 4)")
    // the upsert: update every k < 3 row's amt, insert two NEW keys
    // (no dim match — the SPJ join result gains nothing from them)
    spark.sql(s"""MERGE INTO $cat.ns.fact t
                 |USING (SELECT * FROM VALUES
                 |  (CAST(0 AS BIGINT), 1.0), (1, 1.0), (2, 1.0),
                 |  (200, 7.0), (205, 7.0) AS s(k, amt)) s
                 |ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET amt = s.amt
                 |WHEN NOT MATCHED THEN INSERT (k, amt)
                 |  VALUES (s.k, s.amt)""".stripMargin)
    val factRoot = s"$wh/ns/fact"
    val m = Snapshots.manifest(factRoot,
      Snapshots.latestVersion(factRoot))
    assert(m.bucketSpec == Some(("k", 4)))
    assert(m.entries.forall(_.bucket.isDefined),
      "MERGE insert files must carry bucket stamps")
    assert(m.dvNames.nonEmpty, "the matched updates must be MoR deltas")
    // re-inserted update rows and fresh inserts landed in their buckets
    m.entries.filter(_.name.contains("_rl_")).foreach { e =>
      val ks = spark.read.parquet(s"$factRoot/files/${e.name}")
        .select(col("k")).collect().map(_.getLong(0))
      assert(ks.nonEmpty && ks.forall(k =>
        graft.sources.v2.GraftBucket.id(4, k) == e.bucket.get))
    }
    val (got, nShuffles) = withSpjConfs {
      val df = spark.sql(
        s"""SELECT f.k AS k, sum(f.amt) AS amt
           |FROM $cat.ns.fact f JOIN $cat.ns.dim d ON f.k = d.k
           |GROUP BY f.k""".stripMargin)
      (df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap,
        shuffles(df))
    }
    // post-merge truth: k in 0..99, ten source rows each of value k +
    // 100*j for j in 0..9; k < 3 rows were all updated to amt = 1.0
    (0L until 100L).foreach { k =>
      val expected =
        if (k < 3) 10.0
        else (0 until 10).map(j => (k + 100L * j).toDouble).sum
      assert(math.abs(got(k) - expected) < 1e-6, s"k=$k")
    }
    assert(!got.contains(200L) && !got.contains(205L))
    // the join itself ran without exchanging either side: at most the
    // GROUP BY's exchange survives
    assert(nShuffles <= 1,
      s"SPJ must survive a MoR MERGE, got $nShuffles exchanges")
  }

  test("the bucket layout FOLLOWS a column rename — SPJ stays alive " +
      "on the new name over files physically carrying the old one") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj4").toString
    val cat = "gr" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.fact (k BIGINT, amt DOUBLE)
                 |USING graft""".stripMargin)
    spark.sql(s"""CREATE TABLE $cat.ns.dim (k BIGINT, grp BIGINT)
                 |USING graft""".stripMargin)
    spark.sql(s"INSERT INTO $cat.ns.fact " +
      "SELECT id % 50, CAST(id AS DOUBLE) FROM range(500)")
    spark.sql(s"INSERT INTO $cat.ns.dim SELECT id, id % 3 FROM range(50)")
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.fact', col => 'k', " +
      "n_buckets => 4)")
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.dim', col => 'k', " +
      "n_buckets => 4)")
    spark.sql(s"ALTER TABLE $cat.ns.fact RENAME COLUMN k TO fk")
    val factRoot = s"$wh/ns/fact"
    val m = Snapshots.manifest(factRoot,
      Snapshots.latestVersion(factRoot))
    assert(m.bucketSpec == Some(("fk", 4)),
      "the bucket spec must track the rename in the same commit")
    val (got, nShuffles) = withSpjConfs {
      val df = spark.sql(
        s"""SELECT f.fk AS k, sum(f.amt) AS amt
           |FROM $cat.ns.fact f JOIN $cat.ns.dim d ON f.fk = d.k
           |GROUP BY f.fk""".stripMargin)
      (df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap,
        shuffles(df))
    }
    (0L until 50L).foreach { k =>
      val expected = (0 until 10).map(j => (k + 50L * j).toDouble).sum
      assert(math.abs(got(k) - expected) < 1e-6, s"k=$k")
    }
    assert(nShuffles <= 1,
      s"SPJ must survive the rename, got $nShuffles exchanges")
  }

  test("the scan reports KeyGroupedPartitioning only when every " +
      "selected file carries a bucket stamp and the key is in output") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj2").toString
    import spark.implicits._
    val src = s"$wh/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 5000L).map(k => (k, k % 3)).toDF("k", "grp"),
      "k", 4, src, 64 * 1024)
    val root = s"$wh/t"
    Snapshots.init(spark, root, src)
    val r = Snapshots.optimizeBucketed(spark, root, "k", 4)
    assert(r.nBuckets == 4 && r.files >= 4)
    val m = Snapshots.manifest(root, r.version)
    assert(m.bucketSpec == Some(("k", 4)))
    assert(m.entries.forall(_.bucket.isDefined))
    // every file holds EXACTLY its stamped bucket's keys
    m.entries.foreach { e =>
      val ks = spark.read.parquet(s"$root/files/${e.name}")
        .select(col("k")).as[Long].collect()
      assert(ks.nonEmpty)
      assert(ks.forall(k =>
        graft.sources.v2.GraftBucket.id(4, k) == e.bucket.get),
        s"file ${e.name} leaks keys outside bucket ${e.bucket.get}")
    }
    // values identical through the snapshot read after the relayout
    assert(Snapshots.read(spark, root, r.version)
      .agg(sum(col("k"))).head().getLong(0) == (0L until 5000L).sum)
    // a plain append drops the all-bucketed condition
    Snapshots.append(spark, root, Seq((9999L, 1L)).toDF("k", "grp"), "k")
    val m2 = Snapshots.manifest(root, Snapshots.latestVersion(root))
    assert(m2.bucketSpec.nonEmpty &&
      !m2.entries.forall(_.bucket.isDefined),
      "appended files must not carry a bucket stamp")
  }

  test("CALL g.system.layout reports SPJ health: no spec, live, and " +
      "degraded-by-unstamped-append states") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj9").toString
    val cat = "gl" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.fact (k BIGINT, amt DOUBLE)
                 |USING graft""".stripMargin)
    spark.sql(s"INSERT INTO $cat.ns.fact " +
      "SELECT id % 10, 1.0 FROM range(100)")
    def layout() = spark.sql(
      s"CALL $cat.system.layout(table => 'ns.fact')").collect().head
    val r0 = layout()
    assert(r0.isNullAt(1) && r0.isNullAt(2) && !r0.getBoolean(5),
      "an unbucketed table must report no spec and spj_live = false")
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.fact', col => 'k', " +
      "n_buckets => 4)")
    val r1 = layout()
    assert(r1.getString(1) == "k" && r1.getInt(2) == 4)
    assert(r1.getInt(3) == r1.getInt(4) && r1.getBoolean(5),
      "a fresh relayout must report every file stamped and spj_live")
    // a library-level (unstamped) append degrades — and the report
    // SHOWS it instead of the user discovering a shuffle in a plan
    import spark.implicits._
    Snapshots.append(spark, s"$wh/ns/fact",
      Seq((999L, 1.0)).toDF("k", "amt"), "k")
    val r2 = layout()
    assert(r2.getInt(4) == r2.getInt(3) - 1 && !r2.getBoolean(5),
      "an unstamped file must flip spj_live off with the counts " +
        "showing why")
  }

  test("INSERT OVERWRITE keeps the bucket spec: the layout is a table " +
      "property, and a maintained overwrite leaves SPJ alive") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj8").toString
    val cat = "go" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.fact (k BIGINT, amt DOUBLE)
                 |USING graft""".stripMargin)
    spark.sql(s"INSERT INTO $cat.ns.fact " +
      "SELECT id % 10, CAST(id AS DOUBLE) FROM range(100)")
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.fact', col => 'k', " +
      "n_buckets => 4)")
    spark.sql(s"INSERT OVERWRITE $cat.ns.fact " +
      "SELECT id % 10, 2.0 FROM range(50)")
    val root = s"$wh/ns/fact"
    val m = Snapshots.manifest(root, Snapshots.latestVersion(root))
    assert(m.bucketSpec == Some(("k", 4)),
      "the bucket spec must survive INSERT OVERWRITE like any table " +
        "property")
    assert(m.entries.forall(_.bucket.isDefined),
      "the overwrite's writers must have maintained the layout")
    m.entries.foreach { e =>
      val ks = spark.read.parquet(s"$root/files/${e.name}")
        .select(col("k")).collect().map(_.getLong(0))
      assert(ks.forall(k =>
        graft.sources.v2.GraftBucket.id(4, k) == e.bucket.get))
    }
    val df = spark.sql(s"SELECT sum(amt) FROM $cat.ns.fact")
    assert(df.collect().head.getDouble(0) == 100.0) // 50 rows x 2.0
  }

  test("streaming epochs into a bucketed table land stamped, pure " +
      "files — the exactly-once sink maintains SPJ too") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj7").toString
    import spark.implicits._
    val src = s"$wh/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 1000L).map(k => (k, k % 3)).toDF("k", "grp"),
      "k", 2, src, 64 * 1024)
    val root = s"$wh/t"
    Snapshots.init(spark, root, src)
    Snapshots.optimizeBucketed(spark, root, "k", 4)
    val cp = java.nio.file.Files.createTempDirectory("graft_spj7cp")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("k", "grp")
      .writeStream.format("graft").option("path", root)
      .option("checkpointLocation", cp.toString).start()
    mem.addData((2001L, 1L), (2002L, 2L), (2003L, 0L))
    q.processAllAvailable()
    mem.addData((2004L, 1L))
    q.processAllAvailable()
    q.stop()
    val m = Snapshots.manifest(root, Snapshots.latestVersion(root))
    assert(m.bucketSpec == Some(("k", 4)))
    assert(m.entries.forall(_.bucket.isDefined),
      "streaming epochs must stamp their files' buckets")
    m.entries.filter(_.name.startsWith("w_")).foreach { e =>
      val ks = spark.read.parquet(s"$root/files/${e.name}")
        .select(col("k")).collect().map(_.getLong(0))
      assert(ks.nonEmpty && ks.forall(k =>
        graft.sources.v2.GraftBucket.id(4, k) == e.bucket.get),
        s"${e.name} leaks keys outside bucket ${e.bucket.get}")
    }
    val got = spark.read.format("graft").option("path", root).load()
    assert(got.count() == 1004L)
    assert(got.where(col("k") >= 2001L).count() == 4L)
  }

  test("bin-pack on a bucketed table packs WITHIN buckets: stamps and " +
      "SPJ survive nightly maintenance instead of dying until the " +
      "next full relayout") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj6").toString
    val cat = "gp" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"""CREATE TABLE $cat.ns.fact (k BIGINT, amt DOUBLE)
                 |USING graft""".stripMargin)
    spark.sql(s"""CREATE TABLE $cat.ns.dim (k BIGINT, grp BIGINT)
                 |USING graft""".stripMargin)
    spark.sql(s"INSERT INTO $cat.ns.fact " +
      "SELECT id % 20, CAST(id AS DOUBLE) FROM range(2000)")
    spark.sql(s"INSERT INTO $cat.ns.dim SELECT id, id % 3 FROM range(20)")
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.fact', col => 'k', " +
      "n_buckets => 4)")
    spark.sql(s"CALL $cat.system.bucket(table => 'ns.dim', col => 'k', " +
      "n_buckets => 4)")
    val factRoot = s"$wh/ns/fact"
    val bigSize = Snapshots.manifest(factRoot,
      Snapshots.latestVersion(factRoot)).entries.flatMap(_.bytes).min
    // streaming-accretion shape: three tiny stamped appends per bucket
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO $cat.ns.fact VALUES " +
        s"(100, 0.0), (101, 0.0), (102, 0.0), (103, 0.0)")
    }
    val mPre = Snapshots.manifest(factRoot,
      Snapshots.latestVersion(factRoot))
    assert(mPre.entries.forall(_.bucket.isDefined))
    val smallPre = mPre.entries.count(_.bytes.exists(_ < bigSize))
    assert(smallPre >= 12, s"expected >=12 small stamped files, got " +
      s"$smallPre")

    val r = Snapshots.optimizeBinPack(spark, factRoot, "k", bigSize)
    val mPost = Snapshots.manifest(factRoot, r.version)
    assert(mPost.bucketSpec == Some(("k", 4)))
    assert(mPost.entries.forall(_.bucket.isDefined),
      "packed files must inherit their bucket's stamp")
    assert(r.rewritten == smallPre)
    // per-bucket purity of every packed file
    mPost.entries.filter(_.name.startsWith("pack_")).foreach { e =>
      val ks = spark.read.parquet(s"$factRoot/files/${e.name}")
        .select(col("k")).collect().map(_.getLong(0))
      assert(ks.nonEmpty && ks.forall(k =>
        graft.sources.v2.GraftBucket.id(4, k) == e.bucket.get))
    }
    // lossless, and the join STILL runs without exchanging either side
    val (total, nShuffles) = withSpjConfs {
      val df = spark.sql(
        s"SELECT sum(f.amt * (d.grp + 1)) AS s FROM $cat.ns.fact f " +
          s"JOIN $cat.ns.dim d ON f.k = d.k")
      (df.collect().head.getDouble(0), shuffles(df))
    }
    // the inserted keys 100-103 have no dim row (dim keys are 0..19)
    // and zero amt — they prove stamping, not value mass
    val expected = (0L until 2000L)
      .map(id => id.toDouble * (id % 20 % 3 + 1)).sum
    assert(math.abs(total - expected) < 1e-6)
    assert(nShuffles == 0,
      s"SPJ must survive the bucketed bin-pack, got $nShuffles")
  }

  test("bucket stamps PRUNE point lookups: an equality filter on the " +
      "bucket column plans only that bucket's files (zones cannot — " +
      "floorMod interleaves every file's key range)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_spj5").toString
    import spark.implicits._
    val src = s"$wh/src"
    graft.sources.Bucketing.writeRangeSorted(
      (0L until 4000L).map(k => (k, k % 5)).toDF("k", "grp"),
      "k", 4, src, 64 * 1024)
    val root = s"$wh/t"
    Snapshots.init(spark, root, src)
    val r = Snapshots.optimizeBucketed(spark, root, "k", 4)
    val m = Snapshots.manifest(root, r.version)
    // zones are useless here BY CONSTRUCTION: every file's k-range
    // spans nearly the whole table
    val b3 = m.entries.filter(_.bucket.contains(
      graft.sources.v2.GraftBucket.id(4, 7L))).map(_.name).toSet
    assert(b3.nonEmpty && b3.size < m.entries.size)
    def lookup(tag: String): (Seq[Long], Set[String]) = {
      val audit = s"bp-$tag-${java.util.UUID.randomUUID()}"
      val df = spark.read.format("graft").option("path", root)
        .option("auditId", audit).load().where(col("k") === 7L)
      val rows = df.collect().map(_.getLong(0)).toSeq
      val planned = graft.sources.v2.GraftScanAudit.planned(audit).toSet
      graft.sources.v2.GraftScanAudit.clear(audit)
      (rows, planned)
    }
    val (rows1, planned1) = lookup("stamped")
    assert(rows1 == Seq(7L))
    assert(planned1.nonEmpty && planned1.subsetOf(b3),
      s"point lookup must plan only bucket files: $planned1 vs $b3")
    // soundness: an UNSTAMPED append carrying the key is always
    // planned — bucket pruning may only use proofs the stamps give
    Snapshots.append(spark, root, Seq((7L, 9L)).toDF("k", "grp"), "k")
    val (rows2, planned2) = lookup("mixed")
    assert(rows2 == Seq(7L, 7L))
    assert(planned2.size == planned1.size + 1,
      "the unstamped file must stay planned")
  }
}
