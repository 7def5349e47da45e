package graft.core

import org.apache.spark.sql.SparkSession

/** Session-validated per-directory memo for shared cross-query
  * artifacts — the pattern the graph tier proved out (prepared
  * edge/degree tables shared by eight queries) generalized so the
  * text tier can reuse it verbatim.
  *
  * Entries carry the OWNING session and are validated by reference
  * identity + context liveness on every hit: a different or stopped
  * session REPLACES the entry (the old checkpoint blocks become
  * unreachable and the ContextCleaner reclaims them), so the memo
  * never grows past one entry per dir, never resurrects a dead
  * session's blocks, and cannot collide. Assumes raw input dirs are
  * immutable within a session (every gate/bench corpus is); mutable
  * lakehouse tables go through their own read paths, and
  * snapshot-stamped corpora (the embeddings family) use
  * VectorQueries' stamp-keyed memos instead.
  *
  * Build time lands in [[MemoStats]] so the bench reports the
  * amortized artifact cost next to the warm per-query minima.
  */
final class SessionMemo[T] {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, T)]()

  def get(spark: SparkSession, dir: String)(build: => T): T = {
    // loudness symmetry with the clustering failure doctrine: building
    // against a stopped session would fail deep inside the build with
    // an opaque context error — refuse up front instead (unreachable
    // from a query actually running on that session, but an API caller
    // holding a stale session reference should hear why)
    require(!spark.sparkContext.isStopped,
      s"SessionMemo($dir): the calling SparkSession is stopped; shared " +
        "artifacts must be built on a live session")
    m.compute(dir, (_, old) =>
      if (old != null && (old._1 eq spark)) old
      else (spark, MemoStats.timed(build)))._2
  }
}
