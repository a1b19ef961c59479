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
}
