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
    */
  def releaseAll(): Unit = synchronized {
    handles.values.foreach(_.unpersist(blocking = false))
    handles.clear()
    scratchDirs.foreach(d =>
      StageDirs.deleteRecursively(java.nio.file.Paths.get(d)))
    scratchDirs.clear()
  }

  /** Number of currently registered handles (for specs/diagnostics). */
  def size: Int = synchronized(handles.size)
}
