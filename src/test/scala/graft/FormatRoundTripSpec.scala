package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Source-format breadth: the engine's tables round-trip through every
  * columnar/row format the Spark distribution ships (parquet, ORC, JSON
  * lines, CSV) without loss. JSON and CSV are read back with the explicit
  * schema — schema inference is a convenience, not part of the round-trip
  * contract (CSV carries no types at all).
  */
class FormatRoundTripSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType), StructField("n_chars", LongType)))

  test("parquet / orc / json / csv round-trips preserve rows exactly") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString

    def assertSame(got: org.apache.spark.sql.DataFrame, fmt: String): Unit = {
      assert(got.schema == schema, s"$fmt schema drifted: ${got.schema}")
      assert(got.exceptAll(docs).isEmpty && docs.exceptAll(got).isEmpty,
        s"$fmt round-trip lost or mutated rows")
    }

    Seq("parquet", "orc").foreach { fmt =>
      docs.write.mode("overwrite").format(fmt).save(s"$base/$fmt")
      assertSame(spark.read.format(fmt).load(s"$base/$fmt"), fmt)
    }
    docs.write.mode("overwrite").json(s"$base/json")
    assertSame(spark.read.schema(schema).json(s"$base/json"), "json")
    // CSV: quote/escape defaults must survive arbitrary text content
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    assertSame(
      spark.read.schema(schema).option("header", "true").csv(s"$base/csv"),
      "csv")
  }

  test("orc1: the ORC re-layout pushes its date predicate into the scan") {
    val df = Queries.orc1OrcRelayout(spark, SparkTestSession.sfDir)
    val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val scan = leaves.find(_.contains("OrcScan")).orElse(
      leaves.find(s => s.toLowerCase.contains("orc")))
      .getOrElse(fail(s"no ORC scan leaf in:\n${leaves.mkString("\n")}"))
    assert(scan.contains("l_shipdate"),
      s"l_shipdate predicate not pushed to the ORC scan:\n$scan")
    assert(df.collect().nonEmpty)
  }

  test("versioned parquet sink: lineage grows, never overwrites, latest resolves") {
    import graft.sources.Versioned
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val base = java.nio.file.Files.createTempDirectory("graft_ver").toString
    val orig = s"$base/corpus.parquet"
    docs.write.parquet(orig)
    val v1 = Versioned.writeVersioned(docs.where(col("doc_id") % 2 === 0), orig)
    assert(v1 == s"$base/corpus_clean.parquet")
    val v2 = Versioned.writeVersioned(
      docs.where(col("doc_id") % 4 === 0), Versioned.latestVersion(orig))
    assert(v2 == s"$base/corpus_clean_clean.parquet")
    assert(Versioned.latestVersion(orig) == v2)
    // never-overwrite: writing the same version again must FAIL loudly
    intercept[Exception] { Versioned.writeVersioned(docs, orig) }
    // and each lineage member still reads back exactly
    assert(spark.read.parquet(v2).count() == docs.where(col("doc_id") % 4 === 0).count())
    assert(spark.read.parquet(v1).count() == docs.where(col("doc_id") % 2 === 0).count())
  }
}
