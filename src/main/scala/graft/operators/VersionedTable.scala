package graft.operators

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.not

/** Delta-flavored table surface over the [[DirSwap]] commit protocol:
  * `merge` / `delete` / `optimize` / `history` / time-travel reads on a
  * plain parquet directory.
  *
  * BASELINE.json declares "Spark SQL + Delta/Iceberg table operations"
  * as the reference's approach; those jars are unavailable in this
  * offline build, so this class exposes the same USER surface over the
  * hand-rolled transaction slice DirSwap already provides — single-
  * writer lock, monotonic `_graft_version`, last-writer check,
  * crash-safe swap with `_SUCCESS`-gated recovery. Reference
  * consumption pattern: src/utils/bucket.py:63-89 (read-merge-
  * overwrite, no versioning, no lock).
  *
  * Versioning model (the Delta analogy, directory-shaped):
  *   - the LIVE version is the target directory itself, stamped with
  *     `_graft_version` (Delta: the latest snapshot);
  *   - every commit renames the displaced version to a dot-prefixed
  *     sibling `.{name}__v{N}` — a metadata-only move, invisible to
  *     partition discovery (Delta: retained snapshots in the log);
  *   - [[readAt]] reads a retained (or the live) version by number
  *     (Delta: `VERSION AS OF`);
  *   - at most `retain` displaced versions are kept; older ones are
  *     pruned at commit (Delta: `VACUUM`, here eager with a bounded
  *     window — [[vacuum]] tightens it further on demand).
  *
  * Every mutation runs under the single-writer lock and re-checks the
  * version it read at commit, so two concurrent writers serialize or
  * abort cleanly (OpsSpec pins the abort). Reads are lock-free: the
  * swap keeps a complete table at the target at every recoverable
  * instant.
  *
  * Scale: all mutations are full-snapshot rewrites — the plan a
  * MERGE INTO lowers to when touched-file pruning cannot help; the
  * versioning layer itself is O(1) renames regardless of table size.
  */
final class VersionedTable private (spark: SparkSession, path: String,
                                    retain: Int) {

  private val target = new Path(path)
  private val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def retainedPath(v: Long): Path =
    DirSwap.hiddenSibling(target, s"__v$v")

  /** Current committed version (0 = unversioned or absent). */
  def version(): Long = DirSwap.readVersion(fs, target)

  /** The live table. */
  def read(): DataFrame = spark.read.parquet(path)

  /** Time travel: read version `v` — the live version or any retained
    * one. Throws with the available window when `v` was pruned.
    *
    * Resolution order closes the check-then-read race with a concurrent
    * writer: the RETAINED sibling is preferred when it exists (it is
    * immutable once parked), and only otherwise is the live directory
    * used — with the version re-checked AFTER the plan's eager file
    * listing, re-resolving to the just-parked sibling if a commit slid
    * in between. The residual window (commit after the re-check but
    * before the scan executes) fails LOUDLY, not wrongly: the listing
    * is pinned at analysis time and commit renames the listed files
    * away, so the scan hits FileNotFound instead of silently serving a
    * different version's rows.
    */
  def readAt(v: Long): DataFrame = {
    val p = retainedPath(v)
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else if (v == version()) {
      val df = read() // eager file listing happens here
      val now = version()
      if (now == v) df
      else if (fs.exists(p)) spark.read.parquet(p.toString)
      else throw new IOException(
        s"version $v of $path was displaced by a concurrent commit " +
          s"(live is now $now) and is not retained; raise `retain`")
    } else
      throw new IOException(
        s"version $v of $path is not retained (available: " +
          s"${retainedVersions().mkString(",")} + live ${version()}); " +
          "raise `retain` or time-travel sooner")
  }

  /** Versions currently retained on disk (ascending), live excluded. */
  def retainedVersions(): Seq[Long] = {
    val prefix = "." + target.getName + "__v"
    if (!fs.exists(target.getParent)) Seq.empty
    else fs.listStatus(target.getParent).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => n.stripPrefix(prefix).toLongOption)
      .sorted
  }

  /** Commit log view: one row per readable version —
    * (version, timestamp_ms, bytes, is_live) — newest first. Driver-side
    * listing of ≤ retain+1 directories, never a data scan.
    */
  def history(): DataFrame = {
    import spark.implicits._
    val rows = (retainedVersions().map(v => (v, retainedPath(v), false)) :+
      ((version(), target, true)))
      .filter { case (_, p, _) => fs.exists(p) }
      .map { case (v, p, live) =>
        val st = fs.getFileStatus(p)
        (v, st.getModificationTime, fs.getContentSummary(p).getLength, live)
      }
      .sortBy(-_._1)
    rows.toDF("version", "timestamp_ms", "bytes", "is_live")
  }

  /** MERGE INTO: upsert `incoming` by `keys` (incoming wins per key —
    * [[MergeUpsert.merge]] semantics, deterministic survivor).
    */
  def merge(incoming: DataFrame, keys: Seq[String]): Unit =
    mutate { existing =>
      existing.map(MergeUpsert.merge(_, incoming, keys))
        .getOrElse(incoming)
    }

  /** Overwrite the table with `df` as a new version. */
  def overwrite(df: DataFrame): Unit = mutate(_ => df)

  /** DELETE WHERE: drop rows matching `predicate` as a new version. */
  def delete(predicate: Column): Unit =
    mutate {
      case Some(existing) => existing.filter(not(predicate))
      case None => throw new IOException(s"delete on missing table $path")
    }

  /** OPTIMIZE: rewrite into ~`targetBytes` files (round-robin — layout,
    * not clustering). A new version like any other mutation, so a bad
    * compaction is time-travel recoverable too.
    */
  def optimize(targetBytes: Long = 128L * 1024 * 1024): Unit =
    mutate {
      case Some(existing) =>
        val bytes = fs.getContentSummary(target).getLength
        val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        existing.repartition(n)
      case None => throw new IOException(s"optimize on missing table $path")
    }

  /** OPTIMIZE ZORDER BY (x, y): rewrite the table clustered by Morton
    * z-value so every output file covers a tight axis-aligned cell in
    * BOTH dimensions — the file-footer min/max stats then prune scans
    * filtered on either column (or both), which a single-dim sort only
    * provides for its leading key. `repartitionByRange` on the z-value
    * gives contiguous z-ranges per file (a range shuffle over the
    * sampled z distribution — no global sort), and the within-file
    * sort keeps row groups tight. A new version like any mutation, so
    * a bad layout is time-travel recoverable. The Delta analogy:
    * `OPTIMIZE t ZORDER BY (x, y)`; pruning math pinned in ZOrderSpec.
    */
  def optimizeZOrder(x: Column, y: Column,
                     targetBytes: Long = 128L * 1024 * 1024,
                     numFiles: Option[Int] = None): Unit =
    mutate {
      case Some(existing) =>
        val bytes = fs.getContentSummary(target).getLength
        val n = numFiles.getOrElse(
          math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt))
        existing
          .withColumn("__graft_z", ZOrder.zValue(x, y))
          .repartitionByRange(n, org.apache.spark.sql.functions.col("__graft_z"))
          .sortWithinPartitions("__graft_z")
          .drop("__graft_z")
      case None =>
        throw new IOException(s"optimizeZOrder on missing table $path")
    }

  /** RESTORE TABLE ... TO VERSION AS OF `v`: commit snapshot `v`'s rows
    * as a NEW version — Delta's RESTORE semantics, where a rollback is
    * itself a commit, so history is preserved and a bad restore is
    * time-travel recoverable like any other mutation. Runs under the
    * writer lock, so the snapshot read cannot race a concurrent commit
    * (unlike lock-free [[readAt]], no re-check dance is needed); the
    * snapshot is fully copied to the staging directory before the old
    * live version is displaced, so a crash mid-restore recovers to a
    * complete table either way.
    */
  def restore(v: Long): Unit = mutate { _ =>
    val p = retainedPath(v)
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else if (v == version()) read()
    else throw new IOException(
      s"restore: version $v of $path is not retained (available: " +
        s"${retainedVersions().mkString(",")} + live ${version()}); " +
        "raise `retain` or restore sooner")
  }

  /** Prune retained versions beyond the newest `keepLast`. No default:
    * `keepLast = 0` deletes the ENTIRE time-travel window, and that
    * must be something the caller typed, not something a bare
    * `vacuum()` did (Delta's VACUUM guards zero retention the same
    * way).
    */
  def vacuum(keepLast: Int): Unit = {
    val vs = retainedVersions()
    vs.dropRight(keepLast).foreach(v => fs.delete(retainedPath(v), true))
  }

  /** The shared transaction shape: lock → recover → read v → transform
    * → write tmp(v+1) → last-writer-checked swap retaining v → prune.
    */
  private def mutate(f: Option[DataFrame] => DataFrame): Unit = {
    val tmp = DirSwap.hiddenSibling(target, "__tmp_swap")
    val old = DirSwap.hiddenSibling(target, "__old_swap")
    DirSwap.acquireLock(fs, target)
    try {
      // retainDisplaced: a crash between commit's renames must park the
      // displaced version under its own retained name, not delete it
      DirSwap.recover(fs, target, tmp, old, retainDisplaced = true)
      val v0 = DirSwap.readVersion(fs, target)
      val result =
        f(if (fs.exists(target)) Some(spark.read.parquet(path)) else None)
      result.write.mode("overwrite").parquet(tmp.toString)
      DirSwap.writeVersion(fs, tmp, v0 + 1)
      DirSwap.commit(fs, target, tmp, old, expectedVersion = v0,
        retainOldAs = if (fs.exists(target)) Some(retainedPath(v0)) else None)
      vacuum(retain)
    } finally DirSwap.releaseLock(fs, target)
  }
}

object VersionedTable {
  /** Open (or create-on-first-write) the versioned table at `path`,
    * keeping up to `retain` displaced versions for time travel.
    */
  def apply(spark: SparkSession, path: String,
            retain: Int = 3): VersionedTable =
    new VersionedTable(spark, path, retain)
}
