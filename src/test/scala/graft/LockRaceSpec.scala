package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit
import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS writer-lock race proof (verdict r15 item 5): the
  * conditional-create acquire was spec-pinned in-process; here two
  * separate JVMs ([[graft.tools.LockRaceChild]]) race `acquire` on the
  * same table dir — classpaths pre-warmed, released simultaneously by
  * a barrier file, with the winner holding the lock until the loser
  * reports contention (timeout as fallback) so the loser's attempt
  * always lands inside the critical section — and exactly one must win while
  * the other maps to lock contention (not an opaque I/O failure). Run
  * on both admission branches: the local-FS scheme allowlist
  * (createNewFile arbiter) and a simulated capability-advertising
  * conditional-create store ([[graft.tools.CondCreateFs]], the
  * builder-`must` PUT arbiter).
  */
class LockRaceSpec extends AnyFunSuite {

  /** Returns (exitCodes sorted, combined output). */
  private def race(dirUri: String, tmp: String): (Seq[Int], String) = {
    val barrier = s"$tmp/go"
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    // 15 s is a timeout-only fallback: the winner releases as soon as
    // the loser's contention marker appears, so the normal race
    // resolves in well under a second after the barrier drops.
    def spawn(id: String) = new ProcessBuilder(
      javaBin, "-Xmx256m", "-cp", cp, "graft.tools.LockRaceChild",
      dirUri, barrier, id, "15000").redirectErrorStream(true).start()
    val p1 = spawn("a")
    val p2 = spawn("b")
    // wait for both JVMs to boot and park at the barrier, then drop it
    val deadline = System.currentTimeMillis() + 60000
    while (!(new File(s"$barrier.ready.a").exists() &&
             new File(s"$barrier.ready.b").exists())) {
      assert(System.currentTimeMillis() < deadline, "children failed to boot")
      Thread.sleep(10)
    }
    Files.writeString(Paths.get(barrier), "go")
    assert(p1.waitFor(60, TimeUnit.SECONDS), "child a did not exit")
    assert(p2.waitFor(60, TimeUnit.SECONDS), "child b did not exit")
    val out = new String(p1.getInputStream.readAllBytes(), "UTF-8") +
      new String(p2.getInputStream.readAllBytes(), "UTF-8")
    (Seq(p1.exitValue(), p2.exitValue()).sorted, out)
  }

  test("two JVMs racing the writer lock on local FS: exactly one wins, " +
      "the loser maps to contention, and the marker is released") {
    val tmp = Files.createTempDirectory("graft_lockrace_file").toString
    val dir = s"$tmp/t"
    val (codes, out) = race(dir, tmp)
    assert(codes === Seq(0, 2), s"exit codes $codes\n$out")
    assert(out.contains("ACQUIRED") && out.contains("CONTENTION"), out)
    // the loser's failure names the holder (actionable contention error;
    // "held by <identity>" normally, "held (holder unreadable)" in the
    // identity-stamp race window)
    assert(out.contains("held"), out)
    // winner's release actually removed the marker
    assert(!new File(dir + "__lock").exists(), "lock marker leaked")
  }

  test("two JVMs racing on a capability-advertising conditional-create " +
      "store: the PUT arbiter picks exactly one winner") {
    val tmp = Files.createTempDirectory("graft_lockrace_cond").toString
    val dir = s"$tmp/t"
    val (codes, out) = race(s"condfs:$dir", tmp)
    assert(codes === Seq(0, 2), s"exit codes $codes\n$out")
    assert(out.contains("ACQUIRED") && out.contains("CONTENTION"), out)
    assert(!new File(dir + "__lock").exists(), "lock marker leaked")
  }
}
