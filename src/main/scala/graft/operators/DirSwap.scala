package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory replacement for single-writer store maintenance
  * (compaction, flat-store deletes): the replacement content is staged at a
  * DOT-PREFIXED sibling (invisible to Hive-style partition discovery and to
  * this engine's own leaf walks, so a half-written stage can never poison a
  * lake root read), then swapped in rename-rename-delete order:
  *
  *   1. rename(target, .target.old)   — the original moves ASIDE, not away
  *   2. rename(staged, target)
  *   3. delete(.target.old)
  *
  * The pre-round-8 delete-then-rename order had a window (between deleting
  * the old leaf and renaming the stage in) where the partition's ONLY copy
  * lived at a non-dot sibling — a crash there both lost the partition from
  * reads and left `day=1.compact` for partition discovery to trip over.
  * Here every crash state keeps the data in a discoverable-or-recoverable
  * place: before step 1 nothing changed; between 1 and 2 the target is
  * briefly absent but the original is intact at the dot sibling (a
  * metadata-op-sized window, and [[recoverIn]] restores it); after 2 the
  * swap is effective and the worst leftover is a stale `.old` copy that
  * [[recoverIn]] clears.
  */
object DirSwap {

  /** The staging sibling for `target` — dot-prefixed so discovery skips it. */
  def stagePath(target: Path): Path =
    new Path(target.getParent, s".${target.getName}.stage")

  private def oldPath(target: Path): Path =
    new Path(target.getParent, s".${target.getName}.old")

  /** Swap fully-written `staged` into place at `target` (which may not yet
    * exist — first build). On a failed step-2 rename the original is moved
    * back before throwing, so the caller never observes a missing target
    * beyond the crash case [[recoverIn]] handles.
    */
  def swapInto(fs: FileSystem, staged: Path, target: Path): Unit = {
    val old = oldPath(target)
    fs.delete(old, true) // stale leftover from a prior COMPLETED swap
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, old))
      throw new java.io.IOException(s"rename $target -> $old failed")
    if (!fs.rename(staged, target)) {
      if (hadTarget) fs.rename(old, target)
      throw new java.io.IOException(s"rename $staged -> $target failed")
    }
    fs.delete(old, true)
  }

  /** Repair `dir`'s children after a crashed [[swapInto]]: a `.X.old`
    * sibling whose `X` is missing is the mid-swap crash state — rename it
    * back; one whose `X` exists is post-swap residue — delete it. Stale
    * `.X.stage` dirs are incomplete by definition and are removed. Call
    * before walking `dir` for maintenance.
    */
  def recoverIn(fs: FileSystem, dir: Path): Unit = {
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(".") && n.endsWith(".old")) {
        val orig = new Path(dir, n.drop(1).dropRight(".old".length))
        if (!fs.exists(orig)) {
          if (!fs.rename(st.getPath, orig))
            throw new java.io.IOException(s"recovery rename ${st.getPath} -> $orig failed")
        } else fs.delete(st.getPath, true)
      } else if (st.isDirectory && n.startsWith(".") && n.endsWith(".stage")) {
        fs.delete(st.getPath, true)
      }
    }
  }
}
