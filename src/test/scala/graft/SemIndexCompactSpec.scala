package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** [[Dedup.SemIndex.compact]] — the index-maintenance leg of the rolling
  * crawl: appends freeze geometry, so a region-concentrated crawl must be
  * re-balanceable without a global re-cluster. The spec plants a
  * concentrated blob, proves the split is cluster-local (untouched
  * clusters keep ids and members bit-identically), bounded (hot population
  * drops), and probe-consistent (identical twin probes still catch).
  */
class SemIndexCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // spread base: 4 well-separated axis directions in 8-d, 40 points each
  private def baseDf = {
    import spark.implicits._
    (0L until 160L).map { i =>
      val axis = (i % 4).toInt
      val v = Array.fill(8)(0.05f)
      v(axis * 2) = 1f + 0.001f * (i / 4 % 10)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  // concentrated blob near axis 6 (none of the base axes): ids 1000+
  private def blobDf(n: Int) = {
    import spark.implicits._
    (0 until n).map { j =>
      val v = Array.fill(8)(0.05f)
      v(6) = 1f + 0.01f * j
      (1000L + j, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("compact splits only the oversized cluster; members and untouched " +
      "clusters survive bit-identically; twin probes still catch") {
    val idx0 = Dedup.buildSemIndex(baseDf, "vec_id", "embedding",
      nClusters = 4, iterations = 3)
    val idx1 = idx0.append(blobDf(200), "vec_id", "embedding")
    val before = idx1.members.groupBy("cluster").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val hot = before.maxBy(_._2)._1
    assert(before(hot) >= 200) // the blob landed together

    val beforeUntouched = idx1.members.where(col("cluster") =!= hot)
      .select("sid", "cluster").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val beforeIds = idx1.members.select("sid").collect().map(_.getLong(0)).toSet

    val idx2 = idx1.compact(maxFactor = 2.0)
    val after = idx2.members.groupBy("cluster").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // geometry grew, hot population dropped, nothing lost
    assert(idx2.nClusters > 4)
    assert(after.size == idx2.nClusters)
    assert(after.getOrElse(hot, 0L) < before(hot))
    assert(idx2.members.select("sid").collect().map(_.getLong(0)).toSet == beforeIds)
    // untouched clusters: identical (sid, cluster) pairs
    val afterUntouched = idx2.members
      .where(col("cluster") =!= hot && col("cluster") < 4)
      .select("sid", "cluster").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(afterUntouched == beforeUntouched)

    // identical twins of blob members probe into the twin's sub-cluster
    val twins = blobDf(200).where(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 9000L).as("vec_id"), col("embedding"))
    val matches = Dedup.incrementalSemDedup(twins, "vec_id", "embedding",
      idx2, threshold = 0.999)
    val caught = matches.select("batch_id").distinct().count()
    assert(caught == twins.count()) // every twin found its original
    matches.unpersist(blocking = false)
    idx2.close()
  }

  test("the nd4 registry fixture really splits (compact is not a no-op there)") {
    import spark.implicits._
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val existing = e.where(col("vec_id") % 10 =!= 0)
    val anchor = existing.where(col("vec_id") === 1)
      .select(col("embedding").as("__a"))
    val blob = existing.where(col("vec_id") % 2 === 0)
      .crossJoin(broadcast(anchor))
      .select((col("vec_id") + 3000000L).as("vec_id"),
        concat(
          array((element_at(col("__a"), 1).cast("double") *
            (lit(1.0) + lit(0.0001) * col("vec_id").cast("double")))
            .cast("float")),
          slice(col("__a"), 2, 63)).as("embedding"))
    val built = Dedup.buildSemIndex(existing, "vec_id", "embedding",
      nClusters = 16, iterations = 3)
    val appended = built.append(blob, "vec_id", "embedding")
    val compacted = appended.compact(maxFactor = 1.5)
    assert(compacted.nClusters > 16) // the blob really concentrated and split
    compacted.close()
  }

  test("compact with no oversized cluster is the identity handle") {
    val idx = Dedup.buildSemIndex(baseDf, "vec_id", "embedding",
      nClusters = 4, iterations = 2)
    assert(idx.compact(maxFactor = 4.0) eq idx)
    idx.close()
  }
}
