package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared staged-swap machinery of the partition-surgical maintenance
  * ops (`IvfIndex.reassignIndex`/`deleteFromIndex`/`upsertIndex`,
  * `Hnsw.upsertIndexSharded`): a sibling staging dir written first, a
  * `_plan.json` manifest (rewrite/drain partition lists) as the commit
  * point, idempotent retire-then-install renames, and a deterministic
  * roll-forward recovery every maintenance op runs on entry — so a
  * crashed op is finished by the next one regardless of which op it
  * was (all share the same `__maint_*` sibling names). Single-writer
  * contract, like the append family.
  *
  * `partPrefix` names the partition-dir scheme being swapped —
  * `cell=` for the IVF family, `shard=` for the HNSW graph stores.
  * `sidecarName`/the manifest's `"sidecar"` field carry an op's new
  * root sidecar (a reassign's centroid matrix) through recovery so no
  * crash point leaves the data moved under a stale sidecar.
  * `legacySuffixes` lists earlier sibling-name prefixes (pre-rename
  * `__reassign`) whose crashed swaps must still roll forward. */
private[graft] final class StagedSwap(fs: FileSystem, root: Path, op: String,
                                      partPrefix: String = "cell=",
                                      sidecarName: String = "_centroids.json",
                                      legacySuffixes: Seq[String] = Seq.empty) {
  val staging = new Path(root.getParent, root.getName + "__maint_staging")
  val retired = new Path(root.getParent, root.getName + "__maint_retired")
  val planFile = new Path(staging, "_plan.json")

  def swapFromPlan(rewrite: Seq[Int], drain: Seq[Int]): Unit =
    swapDirs(staging, retired, rewrite, drain)

  private def swapDirs(stg: Path, ret: Path,
                       rewrite: Seq[Int], drain: Seq[Int]): Unit = {
    fs.mkdirs(ret)
    // idempotent per partition, so a crashed swap re-runs from the
    // manifest: a staged dir still present has not been installed; a
    // live dest for a drain partition has not been removed
    rewrite.foreach { c =>
      val dest = new Path(root, s"$partPrefix$c")
      val stage = new Path(stg, s"$partPrefix$c")
      if (fs.exists(stage)) {
        if (fs.exists(dest) && !fs.rename(dest, new Path(ret, s"$partPrefix$c")))
          throw new java.io.IOException(s"$op: could not retire $dest")
        if (!fs.rename(stage, dest))
          throw new java.io.IOException(s"$op: could not install $stage")
      } // staged dir gone => this partition's install already completed
    }
    drain.foreach { c =>
      val dest = new Path(root, s"$partPrefix$c")
      if (fs.exists(dest) && !fs.rename(dest, new Path(ret, s"$partPrefix$c")))
        throw new java.io.IOException(s"$op: could not drain $dest")
    }
    // staging before retired: "retired without staging" then always
    // means every install ran and the retire dir holds only superseded
    // copies — safe to drop wholesale on recovery
    fs.delete(stg, true)
    fs.delete(ret, true)
  }

  /** The manifest of a committed-but-unfinished swap, if one is
    * pending under the CURRENT or any LEGACY staging name — the
    * read-side staleness signal (readers refuse loud; [[recover]]
    * clears it). Owned here so gate and recovery can never disagree
    * on which paths count as pending. */
  def pendingPlan: Option[Path] =
    (planFile +: legacySuffixes.map(s =>
      new Path(root.getParent, root.getName + s + "_staging/_plan.json")))
      .find(fs.exists)

  /** Crash recovery — finish the previous attempt before a new one.
    * Also scans any `legacySuffixes` sibling names, so a store that
    * crashed mid-swap under an old naming is still rolled forward
    * instead of silently losing its un-installed partitions. */
  def recover(): Unit = {
    val namePairs = (staging, retired) +: legacySuffixes.map { s =>
      (new Path(root.getParent, root.getName + s + "_staging"),
       new Path(root.getParent, root.getName + s + "_retired"))
    }
    namePairs.foreach { case (stg, ret) =>
      val plan = new Path(stg, "_plan.json")
      if (fs.exists(stg)) {
        if (fs.exists(plan)) {
          // manifest present = the previous swap may have started:
          // roll it FORWARD (the staged batch is the complete new
          // content of every partition it names; installing the
          // remainder is the only state that loses nothing regardless
          // of where the crash hit). A reassign manifest carries the
          // NEW centroids — restore the sidecar FIRST (idempotent), so
          // no crash point leaves the data moved under stale centroids.
          val txt = {
            val in = fs.open(plan)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          }
          def ints(key: String): Seq[Int] =
            (s""""$key"\\s*:\\s*\\[([0-9,\\s]*)\\]""").r.findFirstMatchIn(txt)
              .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
              .getOrElse(Seq.empty)
          ("\"sidecar\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(txt)
            .foreach(m => writeRootFile(sidecarName, m.group(1)))
          swapDirs(stg, ret, ints("rewrite"), ints("drain"))
        } else {
          // no manifest = the staging write itself crashed; the store
          // was never touched
          fs.delete(stg, true)
        }
      }
      if (fs.exists(ret)) fs.delete(ret, true)
    }
  }

  private def writeRootFile(name: String, content: String): Unit = {
    val out = fs.create(new Path(root, name), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** List staged partitions, write the manifest (the commit point),
    * then the new sidecar when the op changes it (a reassign's
    * centroid matrix rides INSIDE the manifest so recovery can restore
    * it — the JSON matrix has no quotes or backslashes, so raw
    * embedding is safe), then swap. Ordering matters: once the
    * manifest exists, every later crash point is repaired by
    * [[recover]], including a crash between the sidecar write and the
    * renames. Returns (rewrite, drain). */
  def commit(changed: Set[Int],
             sidecarJson: Option[String] = None): (Seq[Int], Seq[Int]) = {
    val stagedCells: Set[Int] = fs.listStatus(staging)
      .map(_.getPath.getName).collect { case n if n.startsWith(partPrefix) =>
        n.stripPrefix(partPrefix).toInt }.toSet
    val rewrite = changed.intersect(stagedCells).toSeq.sorted
    val drain = (changed -- stagedCells).toSeq.sorted
    val sidecarField = sidecarJson.fold("")(j => s""","sidecar":"$j"""")
    val out = fs.create(planFile, true)
    try out.write(
      s"""{"rewrite":[${rewrite.mkString(",")}],"drain":[${drain.mkString(",")}]$sidecarField}"""
        .getBytes("UTF-8"))
    finally out.close()
    sidecarJson.foreach(writeRootFile(sidecarName, _))
    swapFromPlan(rewrite, drain)
    (rewrite, drain)
  }
}
