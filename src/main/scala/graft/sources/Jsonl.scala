package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** JSON-lines source/sink — the interchange format of LLM training-data
  * pipelines (one document per line, schema known up front).
  *
  * Scale design:
  *  - Always read with an EXPLICIT schema: schema inference is a full extra
  *    pass over the data (fatal at 100 TB) and silently widens types on
  *    dirty corpora. `readSampledSchema` exists for exploration — it infers
  *    from a bounded sample, never the full dataset.
  *  - PERMISSIVE mode with a `_corrupt` capture column: a 100 TB crawl
  *    always carries malformed lines; failing the job on line 3 billion or
  *    silently dropping rows are both wrong. Corrupt rows stay quarantined
  *    and countable; `quarantine` splits them off as data.
  *  - The sink writes compressed multi-part output (one file per task) —
  *    the only sane layout at scale; `singleFile` exists for compat.
  */
object Jsonl {

  // Collision-proof capture name: a crawl document could legitimately carry
  // a "_corrupt" field, which would be misclassified as malformed (or break
  // the reader with a duplicate column). The dunder-namespaced name cannot
  // appear in real data by accident; schemas that somehow do carry it are
  // rejected loudly below rather than silently mangled.
  private val corruptCol = "__graft_corrupt__"

  private def requireNoCapture(schema: StructType): Unit =
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains the corrupt-capture column '$corruptCol'")

  /** Read JSONL with a known schema; malformed lines land whole in the
    * capture column instead of killing the job or vanishing.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    requireNoCapture(schema)
    spark.read
      .schema(schema.add(corruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Exploration-only: infer the schema from a bounded sample of lines
    * (one extra bounded read, never a full-data inference pass).
    */
  def readSampledSchema(spark: SparkSession, path: String, sampleLines: Int = 10000): DataFrame = {
    val sample = spark.read.text(path).limit(sampleLines)
    val schema = spark.read.json(sample.select(col("value").as("json")).as[String](
      org.apache.spark.sql.Encoders.STRING)).schema
    read(spark, path, schema)
  }

  /** Split a JSONL path into (clean typed rows, corrupt raw lines), both
    * lazy. Built on `from_json` over a text scan rather than the reader's
    * capture column: Spark refuses any plan whose scan references only the
    * corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — which column
    * pruning produces for counts and corrupt-side projections), and the
    * suggested cache() workaround is a non-starter at 100 TB. A malformed
    * line parses to a null struct; the split is a plain filter.
    */
  def quarantine(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    requireNoCapture(schema)
    // from_json under PERMISSIVE yields an all-null struct for malformed
    // input (indistinguishable from a legitimately-null row), so the
    // capture field rides INSIDE the parse schema instead
    val withCapture = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(col("value"),
        from_json(col("value"), withCapture,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol).asJava)
          .as("__parsed"))
    val bad = col(s"__parsed.$corruptCol").isNotNull
    val clean = parsed.where(!bad)
      .select(schema.fieldNames.toIndexedSeq.map(f => col(s"__parsed.$f")): _*)
    val corrupt = parsed.where(bad).select(col("value").as("raw_line"))
    (clean, corrupt)
  }

  /** Write JSONL (gzip by default). Never overwrites unless told to. */
  def write(df: DataFrame, path: String, compression: String = "gzip",
      overwrite: Boolean = false, singleFile: Boolean = false): Unit = {
    val target = if (singleFile) df.coalesce(1) else df
    target.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .option("compression", compression)
      .json(path)
  }
}
