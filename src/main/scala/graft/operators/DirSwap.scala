package graft.operators

import java.io.IOException
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory replacement shared by the merge upsert and
  * compaction: write-new(tmp) happens before calling [[commit]], which
  * then renames old-away, new-in, drops old. [[recover]] finishes or
  * rolls back an interrupted swap from whichever sibling dirs survive:
  *   - target exists → swap completed (or never started): drop leftovers;
  *   - no target, tmp exists AND is complete (`_SUCCESS` marker — Spark's
  *     committer writes it last) → promote it, drop old;
  *   - no target, tmp exists but INCOMPLETE → a crash landed mid-write:
  *     drop the partial tmp and restore old;
  *   - no target, only old → restore old.
  *
  * Two writer-coordination layers close the gaps a bare swap leaves
  * (this is the minimal slice of what a Delta/Iceberg commit protocol
  * provides; those jars are unavailable offline — see
  * [[MergeUpsert.saveOrUpdate]]):
  *
  *   1. '''Single-writer lock''' — [[acquireLock]] creates
  *      `<target>__swap_lock` with create-if-absent (atomic on HDFS and
  *      object stores with preconditions; best-effort on a raw local
  *      FS). Two concurrent writers interleaving renames would corrupt
  *      the state machine ([[recover]] assumes one writer), so the
  *      second writer fails fast instead. A crashed holder leaves a
  *      stale lock; locks older than `staleMs` are broken automatically,
  *      and [[breakLock]] is the manual override once the operator knows
  *      the holder is dead.
  *   2. '''Monotonic version file''' — the writer stamps
  *      `_graft_version` (= read version + 1) into tmp before commit,
  *      and [[commit]] re-checks the live table still holds the version
  *      the writer read (last-writer check). A writer that lost the
  *      lock-break race gets a clean abort instead of silently
  *      overwriting a newer table.
  */
private[graft] object DirSwap {

  private val LOCK_SUFFIX = "__swap_lock"
  val VERSION_FILE = "_graft_version"
  private val SUCCESS_FILE = "_SUCCESS"

  /** Dot-prefixed sibling of `path` — the naming rule for every swap
    * artifact (tmp dir, old dir, lock file). The leading dot matters
    * when the target is a PARTITION directory inside a discovered table:
    * Spark's file index skips dot/underscore-prefixed paths, so a crash
    * leftover like `.approach_date=D__tmp_swap` is invisible to readers,
    * whereas `approach_date=D__tmp_swap` would be picked up as a bogus
    * partition value and its rows double-counted.
    */
  def hiddenSibling(path: Path, suffix: String): Path =
    new Path(path.getParent, "." + path.getName + suffix)

  def lockPath(target: Path): Path = hiddenSibling(target, LOCK_SUFFIX)

  /** Current committed version of the table at `dir` (0 = unversioned —
    * either no table yet or one written before versioning existed).
    */
  def readVersion(fs: FileSystem, dir: Path): Long = {
    val f = new Path(dir, VERSION_FILE)
    if (!fs.exists(f)) 0L
    else {
      val in = fs.open(f)
      try {
        // read to EOF — a short read would mis-parse (or drop digits
        // from) the version on filesystems that chunk small reads
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, UTF_8).trim.toLong
      } finally in.close()
    }
  }

  /** Stamp `dir/_graft_version`; called on the COMPLETE tmp dir before
    * [[commit]] so the version travels with the data through the swap.
    */
  def writeVersion(fs: FileSystem, dir: Path, version: Long): Unit = {
    val out = fs.create(new Path(dir, VERSION_FILE), true)
    try out.write(version.toString.getBytes(UTF_8)) finally out.close()
  }

  /** Acquire the single-writer lock for `target`, breaking locks older
    * than `staleMs` (a crashed writer cannot release; a live writer
    * should finish a swap in seconds). Throws IOException on live
    * contention.
    */
  def acquireLock(fs: FileSystem, target: Path,
                  staleMs: Long = 10L * 60 * 1000): Unit = {
    val lock = lockPath(target)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lock, false)
        try out.write(
          s"${java.util.UUID.randomUUID()} ${System.currentTimeMillis()}"
            .getBytes(UTF_8))
        finally out.close()
        true
      } catch {
        case _: IOException if fs.exists(lock) => false
      }
    if (!tryCreate()) {
      val ageMs =
        try System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      if (ageMs <= staleMs)
        throw new IOException(
          s"concurrent writer on $target: lock $lock is ${ageMs / 1000}s " +
            "old (< stale threshold). If the holder is known dead, " +
            "DirSwap.breakLock or wait out the threshold.")
      fs.delete(lock, false)
      if (!tryCreate())
        throw new IOException(
          s"concurrent writer on $target: lock $lock recreated during " +
            "stale-lock takeover")
    }
  }

  def releaseLock(fs: FileSystem, target: Path): Unit =
    fs.delete(lockPath(target), false)

  /** Manual stale-lock override — only when the holder is known dead. */
  def breakLock(fs: FileSystem, target: Path): Unit =
    releaseLock(fs, target)

  /** Swap tmp into place. When `expectedVersion >= 0`, abort unless the
    * live table still holds exactly that version (last-writer check).
    * When `retainOldAs` is set, the displaced version is RENAMED there
    * (a metadata op) instead of deleted — the hook [[VersionedTable]]'s
    * time travel builds on; plain callers keep the delete.
    */
  def commit(fs: FileSystem, target: Path, tmp: Path, old: Path,
             expectedVersion: Long = -1L,
             retainOldAs: Option[Path] = None): Unit = {
    if (expectedVersion >= 0L) {
      val live = readVersion(fs, target)
      if (live != expectedVersion)
        throw new IOException(
          s"lost update on $target: read version $expectedVersion but " +
            s"live table is now $live — another writer committed; " +
            "re-read and retry")
    }
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new IOException(s"swap failed: $target -> $old")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // roll back so readers still see a table
      throw new IOException(s"swap failed: $tmp -> $target")
    }
    retainOldAs match {
      case Some(r) if fs.exists(old) => parkDir(fs, old, r)
      case _ => fs.delete(old, true)
    }
  }

  /** Move `old` to `dest` (replacing any stale occupant); if the rename
    * fails, fall back to deleting `old` so the swap machinery never
    * leaves a visible leftover. The ONE copy of the park protocol —
    * commit's retainOldAs and recover's retainDisplaced both use it.
    */
  private def parkDir(fs: FileSystem, old: Path, dest: Path): Unit = {
    fs.delete(dest, true)
    if (!fs.rename(old, dest)) fs.delete(old, true)
  }

  /** Drop a displaced `old` dir — or, for versioned tables
    * (`retainDisplaced`), rename it to the retained-version sibling its
    * own `_graft_version` stamp names, so a crash between [[commit]]'s
    * renames cannot silently shrink the time-travel window.
    */
  private def discardOld(fs: FileSystem, target: Path, old: Path,
                         retainDisplaced: Boolean): Unit =
    if (fs.exists(old)) {
      if (retainDisplaced)
        parkDir(fs, old, hiddenSibling(target, s"__v${readVersion(fs, old)}"))
      else fs.delete(old, true)
    }

  def recover(fs: FileSystem, target: Path, tmp: Path, old: Path,
              retainDisplaced: Boolean = false): Unit = {
    if (fs.exists(target)) {
      fs.delete(tmp, true)
      discardOld(fs, target, old, retainDisplaced)
    } else if (fs.exists(tmp) &&
        fs.exists(new Path(tmp, SUCCESS_FILE))) {
      // tmp is a COMPLETE new version (committer marker present, and
      // renames only start after the write finishes) → promote it
      fs.rename(tmp, target)
      discardOld(fs, target, old, retainDisplaced)
    } else if (fs.exists(tmp)) {
      // partial tmp from a crash mid-write: discard, restore old if any
      fs.delete(tmp, true)
      if (fs.exists(old)) fs.rename(old, target)
    } else if (fs.exists(old)) {
      fs.rename(old, target)
    }
  }
}
