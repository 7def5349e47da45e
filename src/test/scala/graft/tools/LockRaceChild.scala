package graft.tools

/** Child JVM for the cross-process writer-lock race proof
  * (LockRaceSpec; verdict r15 item 5). Protocol:
  *  args = (tableDir, barrierFile, childId, holdMs)
  *  1. WARM UP: run a full lock cycle on a child-private scratch dir
  *     so the Hadoop FileSystem classpath is loaded BEFORE the race —
  *     cold class loading after the barrier skewed the two acquires by
  *     seconds and let both win back-to-back without overlapping;
  *  2. touch `<barrier>.ready.<childId>` so the parent knows this JVM
  *     is fully booted and poised at the barrier;
  *  3. spin until the barrier file appears (both children released as
  *     close to simultaneously as a filesystem can manage);
  *  4. race `Lakehouse.withTableLock` on the table dir. The winner
  *     holds until the loser REPORTS contention (a
  *     `<barrier>.contended.<id>` marker) — adaptive, so the critical
  *     section always covers the loser's attempt — with `holdMs` as
  *     the timeout-only fallback.
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
    // warm-up on a private dir: same scheme, so the exact FileSystem
    // impl (and the whole acquire path) is hot before the barrier
    graft.operators.Lakehouse.withTableLock(
      conf, dir + "_warm_" + childId, "lock-race-warmup") { () }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(barrier + ".ready." + childId), "up")
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!new java.io.File(barrier).exists()) {
      if (System.nanoTime() > deadline) { println("BARRIER_TIMEOUT"); sys.exit(3) }
      Thread.sleep(1)
    }
    val barrierPath = java.nio.file.Paths.get(barrier)
    val contendedPrefix = barrierPath.getFileName.toString + ".contended."
    def loserReported: Boolean = {
      val sibs = barrierPath.getParent.toFile.list()
      sibs != null && sibs.exists(n =>
        n.startsWith(contendedPrefix) && !n.endsWith("." + childId))
    }
    try {
      graft.operators.Lakehouse.withTableLock(conf, dir, "lock-race-test") {
        println(s"ACQUIRED $childId")
        val holdDeadline = System.nanoTime() + holdMsStr.toLong * 1000000L
        while (System.nanoTime() < holdDeadline && !loserReported)
          Thread.sleep(5)
      }
      println(s"RELEASED $childId")
      sys.exit(0)
    } catch {
      case e: java.util.ConcurrentModificationException =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(barrier + ".contended." + childId), "x")
        println(s"CONTENTION $childId: ${e.getMessage.take(120)}")
        sys.exit(2)
      case e: Throwable =>
        println(s"ERROR $childId: $e")
        sys.exit(4)
    }
  }
}
