package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    java.nio.file.Files.writeString(dir.resolve("part0.jsonl"),
      lines.mkString("", "\n", "\n"))
    dir.toString
  }

  test("explicit-schema read + corrupt-line quarantine") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """{oops not json""",
      """{"doc_id": 3, "text": "ok", "lang": "en"}"""))
    val (clean, corrupt) = Jsonl.quarantine(spark, path, schema)
    assert(clean.count() == 3 && corrupt.count() == 1)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(corrupt.head().getString(0).startsWith("{oops"))
    // clean rows parse with the declared types
    assert(clean.where(col("doc_id") === 2L).head().getString(2) == "fr")
  }

  test("sampled-schema exploration read") {
    val path = writeLines(Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2, "b": "y"}"""))
    val df = Jsonl.readSampledSchema(spark, path)
    assert(df.select("a", "b").count() == 2)
  }

  test("a document field named _corrupt is data, not a quarantine trigger") {
    val withCorruptField = StructType(schema.fields :+ StructField("_corrupt", StringType))
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "t", "lang": "en", "_corrupt": "just a field"}""",
      """{broken"""))
    val (clean, corrupt) = Jsonl.quarantine(spark, path, withCorruptField)
    assert(clean.count() == 1 && corrupt.count() == 1)
    assert(clean.head().getString(3) == "just a field")
  }

  test("schema carrying the reserved capture column is rejected loudly") {
    val bad = StructType(schema.fields :+ StructField("__graft_corrupt__", StringType))
    intercept[IllegalArgumentException] { Jsonl.quarantine(spark, "/nonexistent", bad) }
    intercept[IllegalArgumentException] { Jsonl.read(spark, "/nonexistent", bad) }
  }

  test("sink round-trips and never overwrites by default") {
    import spark.implicits._
    val df = Seq((1L, "t1", "en"), (2L, "t2", "fr")).toDF("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl_out").toString + "/docs"
    Jsonl.write(df, out)
    assert(Jsonl.quarantine(spark, out, schema)._1.count() == 2)
    intercept[Exception] { Jsonl.write(df, out) } // ErrorIfExists
    Jsonl.write(df, out, overwrite = true) // explicit opt-in
  }
}
