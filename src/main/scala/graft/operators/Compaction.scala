package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction for parquet directories.
  *
  * Incremental pipelines (daily appends, streaming micro-batches) strew
  * small files; at scale every reader then pays per-file open cost and
  * the NameNode/object-store pays listing cost. Compaction rewrites a
  * directory to ⌈bytes / targetBytes⌉ files via a round-robin
  * repartition (no key skew — this is layout, not clustering), writes to
  * a temp sibling and swaps with the same crash-safe dance as the merge
  * ([[MergeUpsert.recover]] semantics).
  */
object Compaction {

  /** Rewrite `path` into files of ~`targetBytes`. Returns file count.
    * Self-heals an interrupted prior compaction on entry and commits via
    * the shared crash-safe swap ([[DirSwap]]).
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              lockStaleMs: Long = 10L * 60 * 1000): Int = {
    val fsPath = new Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = DirSwap.hiddenSibling(fsPath, "__compact_tmp")
    val old = DirSwap.hiddenSibling(fsPath, "__compact_old")
    // same lock as the merge: a compaction racing a merge on one path
    // would interleave renames, so they serialize (or fail fast)
    DirSwap.acquireLock(fs, fsPath, lockStaleMs)
    try {
      DirSwap.recover(fs, fsPath, tmp, old)
      val v0 = DirSwap.readVersion(fs, fsPath)
      val bytes = fs.getContentSummary(fsPath).getLength
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      spark.read.parquet(path)
        .repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
      DirSwap.writeVersion(fs, tmp, v0 + 1)
      DirSwap.commit(fs, fsPath, tmp, old, expectedVersion = v0)
      nFiles
    } finally DirSwap.releaseLock(fs, fsPath)
  }
}
