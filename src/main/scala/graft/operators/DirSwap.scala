package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory replacement shared by the merge upsert and
  * compaction: write-new(tmp) happens before calling [[commit]], which
  * then renames old-away, new-in, drops old. [[recover]] finishes or
  * rolls back an interrupted swap from whichever sibling dirs survive:
  *   - target exists → swap completed (or never started): drop leftovers;
  *   - no target, tmp exists → tmp is a COMPLETE new version (written
  *     before any rename): promote it, drop old;
  *   - no target, only old → restore old.
  */
private[operators] object DirSwap {

  def commit(fs: FileSystem, target: Path, tmp: Path, old: Path): Unit = {
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"swap failed: $target -> $old")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // roll back so readers still see a table
      throw new java.io.IOException(s"swap failed: $tmp -> $target")
    }
    fs.delete(old, true)
  }

  def recover(fs: FileSystem, target: Path, tmp: Path, old: Path): Unit = {
    if (fs.exists(target)) {
      fs.delete(tmp, true)
      fs.delete(old, true)
    } else if (fs.exists(tmp)) {
      fs.rename(tmp, target)
      fs.delete(old, true)
    } else if (fs.exists(old)) {
      fs.rename(old, target)
    }
  }
}
