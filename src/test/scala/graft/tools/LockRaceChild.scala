package graft.tools

/** Child JVM for the cross-process writer-lock race proof
  * (LockRaceSpec; verdict r15 item 5). Protocol:
  *  args = (tableDir, barrierFile, childId, holdMs)
  *  1. touch `<barrier>.ready.<childId>` so the parent knows this JVM
  *     is fully booted and poised at the barrier;
  *  2. spin until the barrier file appears (both children released as
  *     close to simultaneously as a filesystem can manage);
  *  3. race `Lakehouse.withTableLock` on the table dir, holding the
  *     lock `holdMs` — long enough that the loser's attempt lands
  *     inside the winner's critical section.
  * Exit codes: 0 = acquired+released, 2 = mapped to lock contention,
  * 3 = barrier timeout, 4 = unexpected error. A `condfs:` dir scheme
  * exercises the capability-admitted conditional-create branch via
  * [[CondCreateFs]] (registered here, same as the parent would via
  * spark.hadoop conf).
  */
object LockRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, barrier, childId, holdMsStr) = args
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.condfs.impl", classOf[CondCreateFs].getName)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(barrier + ".ready." + childId), "up")
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!new java.io.File(barrier).exists()) {
      if (System.nanoTime() > deadline) { println("BARRIER_TIMEOUT"); sys.exit(3) }
      Thread.sleep(1)
    }
    try {
      graft.operators.Lakehouse.withTableLock(conf, dir, "lock-race-test") {
        println(s"ACQUIRED $childId")
        Thread.sleep(holdMsStr.toLong)
      }
      println(s"RELEASED $childId")
      sys.exit(0)
    } catch {
      case e: java.util.ConcurrentModificationException =>
        println(s"CONTENTION $childId: ${e.getMessage.take(120)}")
        sys.exit(2)
      case e: Throwable =>
        println(s"ERROR $childId: $e")
        sys.exit(4)
    }
  }
}
