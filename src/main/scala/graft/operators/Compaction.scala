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

  /** Rewrite `path` into files of ~`targetBytes`. Returns file count. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fsPath = new Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(fsPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val tmp = new Path(path + "__compact_tmp")
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(path + "__compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(fsPath, old))
      throw new java.io.IOException(s"compact swap failed: $fsPath -> $old")
    if (!fs.rename(tmp, fsPath)) {
      fs.rename(old, fsPath)
      throw new java.io.IOException(s"compact swap failed: $tmp -> $fsPath")
    }
    fs.delete(old, true)
    nFiles
  }
}
