package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe replacement of a small metadata DIRECTORY (tombstone
  * sets, marker dirs): a plain `mode("overwrite")` deletes the live dir
  * before the new content commits, so a mid-write failure — or a
  * concurrent reader landing in the window — silently loses the set.
  * Here the new content is written BESIDE the live dir and swapped in
  * with renames:
  *
  *  1. recover any previous crash (live missing + retired present →
  *     restore; stale temp → drop),
  *  2. caller writes the new content to `<target>__new`,
  *  3. live renames to `<target>__old`, new renames to live, old drops.
  *
  * [[readable]] prefers the live dir and falls back to the retired copy
  * — a reader can never observe "no set at all" unless none was ever
  * written. Single-writer contract, like every other maintenance op. */
private[graft] object AtomicDir {

  private def tmp(target: Path) = new Path(target.getParent, target.getName + "__new")
  private def old(target: Path) = new Path(target.getParent, target.getName + "__old")

  /** Restore a crashed previous swap; drop stale temp content. */
  def recover(fs: FileSystem, target: Path): Unit = {
    if (!fs.exists(target) && fs.exists(old(target))) {
      if (!fs.rename(old(target), target))
        throw new java.io.IOException(s"AtomicDir: could not restore ${old(target)}")
    }
    fs.delete(tmp(target), true)
    fs.delete(old(target), true)
  }

  /** Replace `target` with content the caller writes into the temp dir.
    * The live set stays readable (directly, or via the retired copy)
    * through every crash point. */
  def replace(fs: FileSystem, target: Path)(write: Path => Unit): Unit = {
    recover(fs, target)
    write(tmp(target))
    if (fs.exists(target) && !fs.rename(target, old(target)))
      throw new java.io.IOException(s"AtomicDir: could not retire $target")
    if (!fs.rename(tmp(target), target))
      throw new java.io.IOException(s"AtomicDir: could not install ${tmp(target)}")
    fs.delete(old(target), true)
  }

  /** The current readable copy: the live dir, or the retired copy a
    * crashed swap left behind. */
  def readable(fs: FileSystem, target: Path): Option[Path] =
    if (fs.exists(target)) Some(target)
    else if (fs.exists(old(target))) Some(old(target))
    else None

  /** Resolve-and-read with a bounded retry: a concurrent [[replace]]
    * can rename the resolved dir away between the existence check and
    * the read (the TOCTOU window renames cannot close) — re-resolving
    * and retrying turns that race into a few-millisecond hiccup instead
    * of a failed serving query. `read` must consume the dir EAGERLY
    * (materialize, don't return a lazy plan over it). */
  def readRetrying[T](fs: FileSystem, target: Path)(read: Path => T): Option[T] = {
    var attempt = 0
    while (attempt < 3) {
      readable(fs, target) match {
        case None => return None
        case Some(dir) =>
          try return Some(read(dir))
          catch {
            case e: Throwable
                if attempt < 2 && {
                  def fnf(t: Throwable): Boolean = t != null &&
                    (t.isInstanceOf[java.io.FileNotFoundException] || fnf(t.getCause))
                  fnf(e)
                } => attempt += 1 // swapped under us — re-resolve
          }
      }
    }
    None // unreachable: the last attempt either returns or rethrows
  }
}
