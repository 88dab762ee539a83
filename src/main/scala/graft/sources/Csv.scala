package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** CSV ingestion & versioned sink, re-expressing the reference's S1–S6
  * (SURVEY.md §2.1).
  *
  * Reference semantics:
  *  - S1: `pd.read_csv(csv_path)` with header + type inference
  *    (`tool_call_agent.py:132`). Sentinel `"N/A"` reads as null (C14) so the
  *    numeric cast survives — pandas does this natively, Spark needs the
  *    `nullValue` option.
  *  - S3: versioned write `<base>_clean.csv`, never overwriting the original
  *    (`tool_call_agent.py:139-140`).
  *
  * Scale note: `singleFile = true` reproduces the reference's one-file output
  * (compat mode, small data only). The default keeps Spark's one-file-per-task
  * layout, which is the only sane layout at 100 TB.
  */
object Csv {

  def read(
      spark: SparkSession,
      path: String,
      nullValues: Seq[String] = Seq("N/A", "NA", "", "null")
  ): DataFrame = {
    // Spark's CSV reader accepts a single `nullValue`; parse with the first
    // sentinel (the dominant one, so it can't break numeric inference), then
    // null out the remaining sentinels in the string columns post-read. A
    // column whose cells are ONLY secondary sentinels plus numbers still
    // infers as string — callers needing a numeric type after that apply
    // Cleaning.castNumeric (AutoClean does).
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("nullValue", nullValues.headOption.orNull)
      .option("nanValue", "NaN")
      .csv(path)
    val rest = nullValues.drop(1)
    val strCols = raw.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
    }.toSeq
    if (rest.isEmpty || strCols.isEmpty) raw
    else graft.operators.Cleaning.sentinelToNull(strCols, rest)(raw)
  }

  /** Next version name in the reference's lineage convention:
    * `x.csv -> x_clean.csv -> x_clean_clean.csv` style suffixing
    * (`dirty_hr.csv` -> `dirty_hr_clean.csv` -> `dirty_hr_further_clean.csv`
    * in the committed artifacts; suffix is caller-chosen).
    */
  def versionedPath(inputPath: String, suffix: String = "clean"): String = {
    val dot = inputPath.lastIndexOf('.')
    if (dot < 0) s"${inputPath}_$suffix"
    else s"${inputPath.substring(0, dot)}_$suffix${inputPath.substring(dot)}"
  }

  /** S4: resolve the newest version in a lineage (`x.csv`, `x_clean.csv`,
    * `x_clean_clean.csv`, …) — the reference's "always reload the DataFrame
    * from the latest clean CSV" (`tool_call_agent.py:140`).
    *
    * Existence is resolved through the Hadoop FileSystem for the path's
    * scheme, so lineages on `hdfs://`/`s3a://` resolve the same way local
    * ones do (bare paths go to the configured default FS, matching where
    * Spark would have written them).
    */
  def latestVersion(inputPath: String, suffix: String = "clean"): String = {
    var cur = inputPath
    var next = versionedPath(cur, suffix)
    while (exists(next)) { cur = next; next = versionedPath(cur, suffix) }
    cur
  }

  /** Scheme-aware existence probe (Hadoop FileSystem API). */
  private[sources] def exists(path: String): Boolean = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** S3: write a cleaned frame beside its input, never overwriting. */
  def writeVersioned(
      df: DataFrame,
      inputPath: String,
      suffix: String = "clean",
      singleFile: Boolean = false
  ): String = {
    val out = versionedPath(inputPath, suffix)
    val target = if (singleFile) df.coalesce(1) else df
    target.write
      .mode(SaveMode.ErrorIfExists)
      .option("header", "true")
      .csv(out)
    out
  }
}
