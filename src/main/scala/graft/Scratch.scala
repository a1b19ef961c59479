package graft

/** Root for all scratch/materialization state (bucketed-table
  * materializations, format-demo caches, streaming checkpoints and
  * replay files, the ngram truth cache, spark.local.dir).
  *
  * One knob (round-12 ask #5): the `graft.scratch.dir` JVM system
  * property, falling back to the `GRAFT_SCRATCH_DIR` env var, default
  * `/dev/shm` — tmpfs, which is what keeps the bench's shuffle and
  * cache traffic off this VM's stall-prone disk. On a real cluster set
  * it per-JVM via `spark.driver.extraJavaOptions` /
  * `spark.executor.extraJavaOptions` (all consumers are driver-side
  * paths today, so the driver option is the operative one).
  */
object Scratch {
  val root: String =
    sys.props.get("graft.scratch.dir")
      .orElse(sys.env.get("GRAFT_SCRATCH_DIR"))
      .map(_.stripSuffix("/"))
      .getOrElse("/dev/shm")

  def dir(sub: String): String = s"$root/$sub"

  /** LRU prune of sibling cache dirs under `parent` with the
    * VICTIM-LOCK discipline (round 14, extending the r13 ngram-cache
    * fix to every scratch LRU): the caller holds only its OWN
    * fingerprint's lock, so deleting another fingerprint's dir
    * unguarded could yank parquet files out from under a second JVM
    * that is mid-use of that fingerprint. Each victim's sibling
    * `<dir>.lock` is try-locked non-blockingly first; a held lock
    * means the dir is live in another process — skip it this round
    * (it ages further and is pruned once unlocked). Keeps the
    * `keep` most-recently-used siblings besides `exclude` (callers
    * touch-on-use, so lastModified ranks by last use).
    */
  def pruneLocked(parent: java.io.File, prefix: String,
      exclude: String, keep: Int): Unit =
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith(prefix) &&
        f.getName != exclude &&
        // never prune .lock files: a re-created lock file is a new
        // inode, and two processes would then "hold" the same lock
        !f.getName.endsWith(".lock"))
      .sortBy(-_.lastModified).drop(keep)
      .foreach { victim =>
        val vch = java.nio.channels.FileChannel.open(
          new java.io.File(victim.getPath + ".lock").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val vlk = vch.tryLock()
          if (vlk != null) {
            try org.apache.commons.io.FileUtils.deleteQuietly(victim)
            finally vlk.release()
          }
        } catch { case _: Throwable => () } finally vch.close()
      }
}
