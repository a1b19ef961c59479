package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scratch-LRU victim-lock discipline (round 14, closing the
  * ADVICE item carried since r12): `Scratch.pruneLocked` must skip a
  * victim dir whose sibling `.lock` is held by ANOTHER PROCESS — that
  * lock means the dir is live (being published or mid-use) over
  * there, and deleting it would yank parquet files out from under the
  * other JVM. Covered two ways: a REAL second JVM holding the lock
  * (the actual cross-process contract, via OS file locks), and the
  * same-JVM overlapping-lock path (what a concurrent thread of this
  * process observes).
  */
class ScratchLruLockSpec extends AnyFunSuite {

  private def mkSiblings(parent: java.io.File, n: Int): Unit = {
    parent.mkdirs()
    (0 until n).foreach { i =>
      val d = new java.io.File(parent, s"tst_b_$i")
      d.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(d, "part-0.parquet").toPath, "x")
      // staggered mtimes: tst_b_0 oldest … tst_b_{n-1} newest
      d.setLastModified(System.currentTimeMillis() - (n - i) * 60000L)
      ()
    }
  }

  test("pruneLocked skips a victim whose lock is held by a second " +
    "PROCESS, and prunes it once the process exits") {
    val parent = new java.io.File(
      s"${Scratch.root}/graft_test_lru_${
        java.util.UUID.randomUUID().toString.take(8)}")
    try {
      mkSiblings(parent, 5)
      val victim = new java.io.File(parent, "tst_b_0")
      val lockPath = victim.getPath + ".lock"
      // a REAL second JVM takes the victim's lock and holds it until
      // its stdin closes — the cross-process flock the discipline is
      // actually about
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"),
        "java").getPath
      val p = new ProcessBuilder(javaBin, "-cp",
        System.getProperty("java.class.path"),
        "graft.HoldLockMain", lockPath)
        .redirectErrorStream(true).start()
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      val line = reader.readLine()
      assert(line == "LOCKED",
        s"lock-holder subprocess failed to start: $line")
      try {
        // keep=2 over siblings {0,1,2,3} (4 excluded): victims are the
        // two oldest, 0 and 1 — but 0 is locked by the other process
        Scratch.pruneLocked(parent, "tst_b_", "tst_b_4", 2)
        assert(new java.io.File(parent, "tst_b_0").exists(),
          "locked victim was deleted under the other process")
        assert(!new java.io.File(parent, "tst_b_1").exists(),
          "unlocked victim must still be pruned")
        assert(Seq(2, 3, 4).forall(i =>
          new java.io.File(parent, s"tst_b_$i").exists()))
      } finally {
        p.getOutputStream.close() // holder exits on stdin EOF
        p.waitFor()
      }
      // the other process is gone: the survivor is prunable now
      Scratch.pruneLocked(parent, "tst_b_", "tst_b_4", 2)
      assert(!new java.io.File(parent, "tst_b_0").exists(),
        "victim must be pruned once its holder released the lock")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(parent)
  }

  test("pruneLocked treats a lock held elsewhere in THIS process as " +
    "live too (overlapping-lock path)") {
    val parent = new java.io.File(
      s"${Scratch.root}/graft_test_lru_${
        java.util.UUID.randomUUID().toString.take(8)}")
    try {
      mkSiblings(parent, 4)
      val victim = new java.io.File(parent, "tst_b_0")
      val ch = java.nio.channels.FileChannel.open(
        new java.io.File(victim.getPath + ".lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lk = ch.lock()
      try {
        // keep=1 over siblings {0,1,2}: victims 0 (locked) and 1
        Scratch.pruneLocked(parent, "tst_b_", "tst_b_3", 1)
        assert(victim.exists(), "locked victim deleted in-process")
        assert(!new java.io.File(parent, "tst_b_1").exists())
      } finally { lk.release(); ch.close() }
      Scratch.pruneLocked(parent, "tst_b_", "tst_b_3", 1)
      assert(!victim.exists())
    } finally org.apache.commons.io.FileUtils.deleteQuietly(parent)
  }
}
