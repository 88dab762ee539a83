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
      "equal the shuffled twin; un-bucketed appends disable the claim " +
      "soundly") {
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

    // soundness: an UN-bucketed append disables the report (no wrong
    // co-location claim) and values stay correct
    spark.sql(s"INSERT INTO $cat.ns.fact VALUES (5, 100.0)")
    val (rows2, _) = withSpjConfs {
      val df = spark.sql(
        s"SELECT sum(f.amt) FROM $cat.ns.fact f " +
          s"JOIN $cat.ns.dim d ON f.k = d.k")
      (df.collect().head.getDouble(0), 0)
    }
    val expected = (0L until 20000L).filter(_ % 1000 < 1000)
      .map(id => (id % 1000, id * 0.5)).filter(_._1 < 1000)
      .map(_._2).sum + 100.0
    assert(math.abs(rows2 - expected) < 1e-6)
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
}
