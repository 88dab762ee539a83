package graft.sources.v2

import graft.sources.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Table MAINTENANCE as SQL `CALL` procedures (the connector Procedure
  * API — the Iceberg `CALL catalog.system.rewrite_data_files` shape):
  * {{{
  *   CALL g.system.optimize(table => 'lake.ev',
  *                          sort_col => 'event_id', n_files => 4)
  *   CALL g.system.zorder(table => 'lake.ev',
  *                        col_a => 'user_id', col_b => 'day',
  *                        n_files => 16)
  *   CALL g.system.vacuum(table => 'lake.ev', keep_from => 3,
  *                        grace_ms => 0)
  * }}}
  * With these, the LAST library-only surfaces a table's operator needs
  * — compaction after streaming churn, z-order relayout, history
  * retention — are SQL statements a scheduler can own. Each procedure
  * returns its outcome as one row (the new version / reclaim counts) so
  * orchestration can assert on it.
  */
object GraftProcedures {
  val names: Array[String] =
    Array("optimize", "zorder", "vacuum", "changes", "restore",
      "compact_sidecars", "bucket", "layout")

  private def rootOf(warehouse: String, table: String): String =
    (warehouse +: table.split('.').toSeq).mkString("/")

  private def oneRowScan(schema: StructType, values: Seq[Any])
      : java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(values.toArray))
      override def description(): String = "GraftProcedureResult"
    }
    java.util.List.of(scan).iterator()
  }

  private abstract class GraftProc(procName: String, desc: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  def load(name: String, warehouse: String): UnboundProcedure =
    name match {
      case "optimize" => new GraftProc("optimize",
        "rewrite the latest version as n_files range-sorted files " +
          "(small-file compaction; folds MoR sidecars)") {
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("sort_col", StringType).build(),
          ProcedureParameter.in("n_files", IntegerType)
            .defaultValue("4").build())
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val root = rootOf(warehouse, input.getUTF8String(0).toString)
          val v = Snapshots.optimize(SparkSession.active, root,
            input.getUTF8String(1).toString, input.getInt(2))
          oneRowScan(StructType(Seq(
            StructField("new_version", IntegerType, nullable = false))),
            Seq(v))
        }
      }
      case "zorder" => new GraftProc("zorder",
        "rewrite the latest version z-ordered on (col_a, col_b) with " +
          "two-dimension commit-time stats") {
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("col_a", StringType).build(),
          ProcedureParameter.in("col_b", StringType).build(),
          ProcedureParameter.in("n_files", IntegerType)
            .defaultValue("16").build())
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val root = rootOf(warehouse, input.getUTF8String(0).toString)
          val (a, b) = (input.getUTF8String(1).toString,
            input.getUTF8String(2).toString)
          val v = Snapshots.optimizeZOrder(SparkSession.active, root,
            col(a), col(b), input.getInt(3), statsCols = Seq(a, b))
          oneRowScan(StructType(Seq(
            StructField("new_version", IntegerType, nullable = false))),
            Seq(v))
        }
      }
      case "vacuum" => new GraftProc("vacuum",
        "drop manifest history before keep_from and reclaim " +
          "unreferenced store files older than grace_ms") {
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("keep_from", IntegerType).build(),
          ProcedureParameter.in("grace_ms", LongType)
            .defaultValue(Snapshots.DefaultVacuumGraceMs.toString)
            .build())
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val root = rootOf(warehouse, input.getUTF8String(0).toString)
          val (dropped, reclaimed) = Snapshots.vacuum(root,
            input.getInt(1), input.getLong(2))
          oneRowScan(StructType(Seq(
            StructField("dropped_manifests", IntegerType,
              nullable = false),
            StructField("reclaimed_files", IntegerType,
              nullable = false))), Seq(dropped, reclaimed))
        }
      }
      case "changes" => new GraftProc("changes",
        "register the row-tagged change feed between two versions " +
          "(_change_type ∈ insert/update_preimage/update_postimage/" +
          "delete) as a temp view — CDC through SQL") {
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("from_version", IntegerType).build(),
          ProcedureParameter.in("to_version", IntegerType).build(),
          ProcedureParameter.in("key_col", StringType).build(),
          ProcedureParameter.in("view_name", StringType)
            .defaultValue("'graft_changes'").build())
        /** Spark's CALL executes only `LocalScan` results (driver
          * rows), so returning the feed itself would collect data-
          * sized output to the driver — the one anti-pattern a CDC
          * surface must not have. Instead the DISTRIBUTED feed plan
          * ([[graft.sources.Snapshots.changeFeed]] — delta-only joins,
          * never a table scan) registers as a session TEMP VIEW and
          * the returned row names it: `CALL g.system.changes(...)`
          * then `SELECT ... FROM graft_changes` is the whole consumer
          * workflow, lazily executed at SELECT time (Delta's
          * `table_changes` TVF shape within the procedure API's
          * bounds).
          */
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val spark = SparkSession.active
          val root = rootOf(warehouse, input.getUTF8String(0).toString)
          val (from, to) = (input.getInt(1), input.getInt(2))
          val keyCol = input.getUTF8String(3).toString
          val view = input.getUTF8String(4).toString
          val feed = Snapshots.changeFeed(spark, root, from, to, keyCol)
          feed.createOrReplaceTempView(view)
          oneRowScan(StructType(Seq(
            StructField("view_name", StringType, nullable = false),
            StructField("from_version", IntegerType, nullable = false),
            StructField("to_version", IntegerType, nullable = false))),
            Seq(org.apache.spark.unsafe.types.UTF8String.fromString(view),
              from, to))
        }
      }
      case "restore" => new GraftProc("restore",
        "commit a new version whose file set and read state are an " +
          "earlier version's (metadata-only rollback; history " +
          "preserved; refused when vacuum reclaimed the target's " +
          "files)") {
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", IntegerType).build())
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val root = rootOf(warehouse, input.getUTF8String(0).toString)
          val v = Snapshots.restore(SparkSession.active, root,
            input.getInt(1))
          oneRowScan(StructType(Seq(
            StructField("new_version", IntegerType, nullable = false),
            StructField("restored_version", IntegerType,
              nullable = false))), Seq(v, input.getInt(1)))
        }
      }
      case "compact_sidecars" => new GraftProc("compact_sidecars",
        "merge all live position-delete sidecars into one per-file-" +
          "union sidecar — metadata-only (no data file rewritten), " +
          "keeping MoR read cost flat between optimizes") {
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build())
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val root = rootOf(warehouse, input.getUTF8String(0).toString)
          val r = Snapshots.compactSidecars(SparkSession.active, root)
          oneRowScan(StructType(Seq(
            StructField("new_version", IntegerType, nullable = false),
            StructField("sidecars_before", IntegerType, nullable = false),
            StructField("sidecars_after", IntegerType, nullable = false),
            StructField("marked_positions", LongType, nullable = false))),
            // box explicitly: Seq(Int, …, Long) would weak-LUB to
            // Seq[Long] and widen every Int, breaking the IntegerType
            // fields' unboxing
            Seq[Any](Int.box(r.version), Int.box(r.sidecarsBefore),
              Int.box(r.sidecarsAfter), Long.box(r.markedPositions)))
        }
      }
      case "bucket" => new GraftProc("bucket",
        "rewrite the latest version into a BUCKETED layout (one " +
          "bucket(n_buckets, col) value per file) so co-bucketed " +
          "tables join without a shuffle (storage-partitioned joins)") {
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("col", StringType).build(),
          ProcedureParameter.in("n_buckets", IntegerType).build())
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val root = rootOf(warehouse, input.getUTF8String(0).toString)
          val r = Snapshots.optimizeBucketed(SparkSession.active, root,
            input.getUTF8String(1).toString, input.getInt(2))
          oneRowScan(StructType(Seq(
            StructField("new_version", IntegerType, nullable = false),
            StructField("n_buckets", IntegerType, nullable = false),
            StructField("files", IntegerType, nullable = false))),
            Seq[Any](Int.box(r.version), Int.box(r.nBuckets),
              Int.box(r.files)))
        }
      }
      case "layout" => new GraftProc("layout",
        "report the table's bucket-layout state: the #bucket: spec, " +
          "file/stamp counts, and whether the storage-partitioned-" +
          "join report is LIVE (spec present, every file stamped) — " +
          "the observability half of the layout-maintenance contract") {
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build())
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val root = rootOf(warehouse, input.getUTF8String(0).toString)
          val v = Snapshots.latestVersion(root)
          require(v >= 1, s"uninitialized snapshot table at $root")
          val m = Snapshots.manifest(root, v)
          val spec = m.bucketSpec
          val stamped = m.entries.count(_.bucket.isDefined)
          val live = spec.isDefined && m.entries.nonEmpty &&
            stamped == m.entries.size
          oneRowScan(StructType(Seq(
            StructField("version", IntegerType, nullable = false),
            StructField("bucket_col", StringType, nullable = true),
            StructField("n_buckets", IntegerType, nullable = true),
            StructField("files", IntegerType, nullable = false),
            StructField("stamped_files", IntegerType, nullable = false),
            StructField("spj_live", BooleanType, nullable = false))),
            Seq[Any](Int.box(v),
              spec.map(s => org.apache.spark.unsafe.types.UTF8String
                .fromString(s._1)).orNull,
              spec.map(s => Int.box(s._2)).orNull,
              Int.box(m.entries.size), Int.box(stamped),
              Boolean.box(live)))
        }
      }
      case other => throw new IllegalArgumentException(
        s"unknown graft procedure '$other' — one of " +
          names.mkString("[", ", ", "]"))
    }
}
