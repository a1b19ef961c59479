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

  /** One cached, never-closed channel per victim-lock file (round-15
    * ADVICE fix). POSIX fcntl semantics release ALL of a process's
    * locks on a file when ANY channel/fd to it is closed (the FileLock
    * javadoc's platform-dependence warning), so the old
    * open-try-close-per-scan pattern could silently drop a lock a
    * sibling THREAD of this process still holds (tryLock throws
    * OverlappingFileLockException, the finally close fires, the OS
    * drops the live holder's cross-process lock). Channels live for
    * the JVM; the set is bounded by the number of distinct cache dirs
    * (single digits), so the fd cost is negligible.
    */
  private val lockChannels =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.channels.FileChannel]()

  private[graft] def lockChannelFor(path: String): java.nio.channels.FileChannel =
    lockChannels.compute(path, (p, existing) =>
      if (existing != null && existing.isOpen) existing
      else java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(p),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE))

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
        // The channel is cached and NEVER closed here: closing it on
        // the OverlappingFileLockException path (another thread of
        // THIS process holds the victim lock) could release that live
        // holder's OS-level lock on POSIX. tryLock returning null =
        // held by another process; throwing Overlapping... = held by
        // this process — both mean "skip this victim this round".
        try {
          val vch = lockChannelFor(victim.getPath + ".lock")
          val vlk = vch.tryLock()
          if (vlk != null) {
            try org.apache.commons.io.FileUtils.deleteQuietly(victim)
            finally vlk.release()
          }
        } catch { case _: Throwable => () }
      }
}
