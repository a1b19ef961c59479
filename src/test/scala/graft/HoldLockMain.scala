package graft

/** Test helper: a second JVM that takes an exclusive FileLock on
  * args(0), announces it, and holds it until stdin closes — lets
  * ScratchLruLockSpec exercise the CROSS-PROCESS victim-lock contract
  * with a real OS file lock instead of the same-JVM overlapping path.
  */
object HoldLockMain {
  def main(args: Array[String]): Unit = {
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(args(0)),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lk = ch.lock()
    println("LOCKED")
    Console.flush()
    // hold until the parent closes our stdin
    while (System.in.read() != -1) ()
    lk.release()
    ch.close()
  }
}
