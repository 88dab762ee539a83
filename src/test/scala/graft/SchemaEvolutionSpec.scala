package graft

import graft.sources.{Compaction, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.sources.Snapshots.renameColumn]] /
  * [[graft.sources.Snapshots.widenColumn]] — schema evolution BEYOND
  * add-only: metadata-only column rename and int→long widening via
  * manifest `#map`/`#widen` lines, applied by the grouped read and
  * materialized physically by optimize.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_se").toString
    val out = s"$d/t"
    new java.io.File(out).mkdirs()
    (0 until 2).foreach { i =>
      (i * 5000 until (i + 1) * 5000).map(k => (k.toLong, k % 7))
        .toDF("k", "grp").coalesce(1)
        .write.parquet(s"$out/__part$i")
      val one = Compaction.dataFiles(s"$out/__part$i") match {
        case Seq(f) => f
      }
      java.nio.file.Files.move(one.toPath,
        new java.io.File(out, f"part-$i%05d.parquet").toPath)
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(s"$out/__part$i"))
    }
    out
  }

  test("rename is metadata-only: same physical files, logical name at " +
      "the new version, old versions keep the old name") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_se1").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    val v2 = Snapshots.renameColumn(root, "grp", "category")
    assert(v2 == 2)
    assert(Snapshots.resolve(root, 1) == Snapshots.resolve(root, 2))
    val r2 = Snapshots.read(spark, root, 2)
    assert(r2.columns.toSeq.sorted == Seq("category", "k"))
    assert(r2.agg(sum(col("category"))).head().getLong(0) ==
      (0 until 10000).map(k => (k % 7).toLong).sum)
    // old version untouched (time travel across the rename)
    assert(Snapshots.read(spark, root, 1).columns.contains("grp"))
    // appends after the rename carry the NEW name physically and align
    Snapshots.append(spark, root,
      Seq((20000L, 9L)).toDF("k", "category"), "k")
    val r3 = Snapshots.read(spark, root, 3)
    assert(r3.count() == 10001L)
    assert(r3.where(col("k") === 20000L).select(col("category"))
      .head().getLong(0) == 9L)
  }

  test("chained renames apply in commit order") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_se2").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    Snapshots.renameColumn(root, "grp", "cat")
    Snapshots.renameColumn(root, "cat", "category")
    val r = Snapshots.read(spark, root, 3)
    assert(r.columns.toSeq.sorted == Seq("category", "k"))
    assert(r.agg(sum(col("category"))).head().getLong(0) ==
      (0 until 10000).map(k => (k % 7).toLong).sum)
  }

  test("widening lets int32 and int64 files of one column coexist — " +
      "the union mergeSchema refuses — and reads as the wide type") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_se3").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    // v2: a batch introduces 'flag' as INT
    Snapshots.append(spark, root,
      (0 until 10).map(i => (30000L + i, 1, 7)).toDF("k", "grp", "flag"),
      "k")
    // v3: widen flag to long; v4: a batch writes flag as LONG physically
    Snapshots.widenColumn(root, "flag", "long")
    Snapshots.append(spark, root,
      (0 until 5).map(i => (40000L + i, 2, 9L)).toDF("k", "grp", "flag"),
      "k")
    val r = Snapshots.read(spark, root, 4)
    assert(r.schema("flag").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(r.count() == 10015L)
    assert(r.agg(sum(col("flag"))).head().getLong(0) == 10L * 7 + 5L * 9)
    assert(r.where(col("flag").isNull).count() == 10000L)
    // the plain mergeSchema read of the same files refuses the union —
    // the contrast that justifies the manifest-level widening
    val paths = Snapshots.resolve(root, 4).map(n => s"$root/files/$n")
    intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(paths: _*).schema
    }
  }

  test("optimize materializes pending renames/widenings: physical " +
      "schema normalized, meta lines dropped, values identical") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_se4").toString + "/t"
    Snapshots.init(spark, root, freshTable())
    Snapshots.append(spark, root,
      (0 until 10).map(i => (30000L + i, 1, 7)).toDF("k", "grp", "flag"),
      "k")
    Snapshots.widenColumn(root, "flag", "long")
    Snapshots.renameColumn(root, "grp", "category")
    val pre = Snapshots.read(spark, root, 4)
      .agg(count(lit(1)), sum(col("category")), sum(col("flag"))).head()
    // zone-planned mutations refuse a MAPPED table (they address
    // physical columns) — optimize first is the documented contract
    intercept[IllegalArgumentException](
      Snapshots.deleteRange(spark, root, "k", 0L, 10L))
    val v5 = Snapshots.optimize(spark, root, "k", 2)
    val m = Snapshots.manifest(root, v5)
    assert(!m.hasMappings && m.dvNames.isEmpty)
    val post = Snapshots.read(spark, root, v5)
    assert(post.schema("flag").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(post.columns.contains("category") &&
      !post.columns.contains("grp"))
    assert(post.agg(count(lit(1)), sum(col("category")), sum(col("flag")))
      .head() == pre)
    // ...and work again once materialized
    val r = Snapshots.deleteRange(spark, root, "k", 0L, 10L)
    assert(Snapshots.read(spark, root, r.version).count() ==
      pre.getLong(0) - 10L)
  }
}
