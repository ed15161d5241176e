package graft

import scala.collection.mutable

import org.apache.spark.sql.Dataset

/** Tracks every DataFrame the library persists so callers can release
  * them deterministically.
  *
  * Operators like [[operators.Dedup.lshVerifiedPairs]] persist shared
  * intermediates (signatures, shingle sets) because several downstream
  * stages of one logical result read them. The returned DataFrames are
  * lazy, so the operator itself cannot know when the caller is done —
  * unpersisting inside the operator would evict the cache before the
  * caller's action ran. The contract instead:
  *
  *   - every `persist` in library code goes through [[register]];
  *   - callers invoke [[Graft.releaseCaches]] (→ [[releaseAll]]) once
  *     they have materialized what they need;
  *   - a long-lived session that never releases leaks nothing NEW per
  *     call with identical inputs (Spark's CacheManager dedups by plan),
  *     but distinct inputs accumulate — hence the explicit hook.
  *
  * DOCUMENTED EXCEPTION: `localCheckpoint()` blocks (the BFS/TextRank
  * lineage truncations, round 14) live on a SECOND lifecycle this
  * registry does not own — Spark's ContextCleaner unpersists them when
  * the checkpointed RDD becomes unreachable (per-invocation locals, so
  * after each query's DataFrame is dropped). They are invisible to
  * [[releaseAll]] by design: there is no public handle to free them
  * earlier, and holding the Dataset here would only DELAY the GC that
  * releases them.
  *
  * Thread-safe; unpersist is non-blocking (async block cleanup).
  */
object CacheRegistry {

  // keyed by the analyzed plan's semantic hash: repeated calls with
  // identical inputs share one CacheManager entry (plan-deduped by
  // Spark), so keeping one handle per PLAN — not per call — stops the
  // registry itself from growing in a long-lived serving process
  private val handles = mutable.LinkedHashMap.empty[Int, Dataset[_]]

  /** Record a persisted Dataset for later release; returns it unchanged. */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    handles.put(ds.queryExecution.analyzed.semanticHash(), ds)
    ds
  }

  // scratch directories whose lifetime is "until releaseCaches": used by
  // per-instance slots (e.g. DedupPlan's lineage-truncation parquet) that
  // cannot ride StageDirs' two-generation rotation because an older
  // instance may still be live while newer ones are constructed
  private val scratchDirs = mutable.LinkedHashSet.empty[String]

  /** Record a scratch dir for deletion at [[releaseAll]]; returns it. */
  def registerScratch(dir: String): String = synchronized {
    scratchDirs += dir
    dir
  }

  /** Unpersist every registered Dataset, delete every registered scratch
    * dir, and clear the registry.
    *
    * Deletion goes through the Hadoop FileSystem resolved from each
    * path — NOT java.nio — because `SPARK_GRAFT_STAGE_DIR` may point at
    * shared/cluster storage (the documented cluster use) where the
    * parquet was written through Hadoop FS and a local-FS delete would
    * silently no-op and leak (ADVICE r13). Empty per-plan parent dirs
    * (e.g. `dedup_plan_N/` after its `survivors`/`pairs` slots go) are
    * swept too.
    */
  def releaseAll(): Unit = synchronized {
    handles.values.foreach(_.unpersist(blocking = false))
    handles.clear()
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    scratchDirs.foreach { d =>
      // best-effort per dir: a transient FS error (outage, permission,
      // concurrent delete between exists and listStatus) must not
      // abort the sweep or crash the caller mid-Verify/Bench — the
      // contract the pre-r14 java.nio path had (review, round 14)
      try {
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.delete(p, true)
        val parent = p.getParent
        if (parent != null && fs.exists(parent) &&
            fs.listStatus(parent).isEmpty)
          fs.delete(parent, false)
      } catch {
        // NonFatal, not just IOException: Path() throws
        // IllegalArgumentException on a malformed dir string and FS
        // impls surface unchecked RuntimeExceptions — any per-dir
        // failure must leave the sweep (and scratchDirs.clear()) intact
        // (ADVICE r14)
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[cache-registry] scratch sweep of $d " +
            s"failed (left behind): ${e.getMessage}")
      }
    }
    scratchDirs.clear()
  }

  /** Number of currently registered handles (for specs/diagnostics). */
  def size: Int = synchronized(handles.size)
}
