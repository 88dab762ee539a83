package graft.streaming

import graft.sources.{LakeFs, Snapshots}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The snapshot table as an INCREMENTAL STREAMING SOURCE — the read-side
  * twin of the exactly-once sink ([[graft.sources.Snapshots.appendBatch]]):
  * a consumer drains each committed version's delta
  * ([[graft.sources.Snapshots.netChanges]]) exactly once, surviving
  * kill-and-restart, by deriving its cursor FROM its own durable commits
  * instead of keeping a separate offset file that could diverge from the
  * processed state (the Structured-Streaming checkpoint idea applied to
  * manifest versions).
  *
  * Protocol per version v in (cursor, latest]:
  *  1. compute `(netAdded, netRemoved) = netChanges(v-1, v)` — cost
  *     ∝ changed files, never a table scan;
  *  2. hand it to `apply`, which writes its output/state for v at the
  *     provided path IDEMPOTENTLY (overwrite — a replay of a crashed
  *     attempt rewrites the same content);
  *  3. commit the marker `_v<v>.done` via the exclusive create
  *     ([[LakeFs.createNewAtomic]]).
  *
  * A crash between 2 and 3 leaves no marker, so the restart re-runs
  * `apply` for v — the overwrite makes the retry invisible and the
  * marker commit makes it final: at-least-once execution, exactly-once
  * EFFECT (the same marker-after-idempotent-write contract foreachBatch
  * sinks use). The cursor is `max(committed markers)`, so there is no
  * separate offset state to lose or double-advance.
  *
  * At 100 TB the point is the delta economics: a downstream index or
  * aggregate over a mutating table cannot re-scan per version; this
  * hands it exactly the rows that changed, tagged by version, with
  * restart safety the consumer does not have to reason about.
  */
object SnapshotFeed {

  /** Versions with a committed marker under `stateDir` (sorted). */
  def committedVersions(stateDir: String): Seq[Int] =
    LakeFs.listNames(stateDir)
      .filter(n => n.startsWith("_v") && n.endsWith(".done"))
      .map(n => n.stripPrefix("_v").stripSuffix(".done").toInt)
      .sorted

  /** The next version to process: one past the highest committed marker
    * (version 1 is the base snapshot, not a delta).
    */
  def cursor(stateDir: String): Int =
    (1 +: committedVersions(stateDir)).max

  /** Apply a row-tagged change feed ([[graft.sources.Snapshots
    * .changeFeed]]) to a keyed replica — the downstream MATERIALIZATION
    * contract of a CDC stream: retract every key the feed deletes or
    * re-images (`delete` / `update_preimage`), then add the new row
    * versions (`insert` / `update_postimage`). Applying each version's
    * feed in order reproduces the source table row-for-row — the way a
    * search index, feature store, or cross-region replica follows a
    * mutating lakehouse table without ever re-scanning it. Key joins run
    * on the DELTA's key set; schema evolution rides `unionByName`
    * (missing columns null-fill on the old replica rows).
    */
  def applyChangeFeed(replica: DataFrame, feed: DataFrame,
      keyCol: String): DataFrame = {
    val gone = feed
      .where(col("_change_type").isin("delete", "update_preimage"))
      .select(col(keyCol)).distinct()
    val incoming = feed
      .where(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type")
    replica.join(gone, Seq(keyCol), "left_anti")
      .unionByName(incoming, allowMissingColumns = true)
  }

  /** The consumer's UNPROCESSED BACKLOG, sized from manifests alone —
    * what a consumer inspects BEFORE choosing its `maxVersions` bound:
    * one row per pending version with `(version, files_added,
    * files_removed, rows_added, rows_removed, new_dv_sidecars)`, where
    * the row counts come from the manifests' commit-time file stats
    * (null when a changed file predates stats — never a wrong number).
    * File-granular by design: a rewrite's surviving rows appear on both
    * sides, exactly like the files [[graft.sources.Snapshots
    * .netChanges]] will read — this measures the DRAIN COST, which is
    * what backpressure needs. Zero data I/O.
    */
  def backlog(spark: SparkSession, root: String,
      stateDir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val from = cursor(stateDir)
    val latest = Snapshots.latestVersion(root)
    ((from + 1) to latest).map { v =>
      val prev = Snapshots.manifest(root, v - 1)
      val cur = Snapshots.manifest(root, v)
      val prevNames = prev.files.toSet
      val curNames = cur.files.toSet
      def rowsOf(m: Snapshots.ManifestData, names: Set[String])
          : Option[Long] = {
        val es = m.entries.filter(e => names.contains(e.name))
        if (es.forall(_.rows.nonEmpty)) Some(es.flatMap(_.rows).sum)
        else None
      }
      val added = curNames -- prevNames
      val removed = prevNames -- curNames
      (v, added.size.toLong, removed.size.toLong,
        rowsOf(cur, added), rowsOf(prev, removed),
        (cur.dvNames.toSet -- prev.dvNames.toSet).size.toLong)
    }.toDF("version", "files_added", "files_removed", "rows_added",
      "rows_removed", "new_dv_sidecars")
  }

  /** Drain unprocessed version deltas exactly once, at most
    * `maxVersions` per call — the BACKPRESSURE bound a restarted
    * consumer with a deep backlog needs: without it, one drain hands the
    * consumer the entire backlog in a single call (memory/latency spike
    * ∝ downtime); with it, the consumer catches up in bounded steps and
    * every step is individually restart-safe (each version commits its
    * own marker, so a kill between steps loses nothing). `apply`
    * receives `(netAdded, netRemoved, version, outPath)` and must write
    * anything durable at `outPath` idempotently (e.g. a parquet
    * overwrite); the marker commits only after it returns. Returns the
    * versions processed by THIS call (empty when caught up).
    */
  def drain(spark: SparkSession, root: String, stateDir: String,
      maxVersions: Int = Int.MaxValue)
      (apply: (DataFrame, DataFrame, Int, String) => Unit): Seq[Int] = {
    require(maxVersions >= 1, s"maxVersions must be >= 1: $maxVersions")
    LakeFs.mkdirs(stateDir)
    val from = cursor(stateDir)
    val latest = Snapshots.latestVersion(root)
    ((from + 1) to latest).take(maxVersions).map { v =>
      val (added, removed) = Snapshots.netChanges(spark, root, v - 1, v)
      apply(added, removed, v, s"$stateDir/delta_v$v")
      LakeFs.createNewAtomic(s"$stateDir/_v$v.done")
      v
    }
  }
}
