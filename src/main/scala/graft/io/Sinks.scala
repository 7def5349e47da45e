package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Datamart sinks (SURVEY §2.1 S5-S7).
  *
  * Mirrors the reference's write semantics (reference
  * src/spark/collector.py:543-557, src/spark/mover.py:107-112):
  * partitioned gzip parquet; try errorifexists first and fall back to
  * overwrite with a warning.
  *
  * Scale notes: the reference repartition(1)s every datamart — fine
  * for KB-scale marts, catastrophic at 100 TB. Here single-file output
  * is an explicit opt-in (`singleFile`), default off; normal writes
  * leave parallelism to AQE coalescing.
  */
object Sinks {

  /** S5: partitioned parquet write. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       compression: String = "gzip"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .option("compression", compression)
      .parquet(path)

  /** S6+S7: datamart write with the reference's errorifexists→overwrite
    * contract (reference src/spark/collector.py:543-557): returns true
    * iff data pre-existed and was overwritten (the daily idempotent
    * re-run path), false on a fresh write.
    *
    * The write is STAGED: the full mart lands in a hidden sibling dir,
    * then swaps into place with one atomic rename. A direct
    * errorifexists write gives a torn mart under concurrent writers —
    * Spark's existence check runs at job start, so two racing daily
    * runs can both pass it and interleave part-files (duplicated
    * rows). With the staged swap each writer publishes a COMPLETE
    * mart or nothing; last writer wins whole. In-JVM writers
    * serialize on a per-path lock; rename atomicity covers separate
    * drivers on POSIX/HDFS (object stores need a committer/catalog
    * for the same guarantee — same caveat as every rename-based
    * publish).
    */
  def writeDatamart(df: DataFrame, path: String, singleFile: Boolean = false): Boolean = {
    val out = if (singleFile) df.coalesce(1) else df
    val target = new java.io.File(path).getAbsoluteFile
    val staging = new java.io.File(target.getParentFile,
      s".${target.getName}_staging_${java.util.UUID.randomUUID()}")
    out.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val lock = pathLocks.computeIfAbsent(target.toString, _ => new Object)
    lock.synchronized {
      val existed = target.exists()
      if (existed) deleteRecursively(target.toPath)
      java.nio.file.Files.move(staging.toPath, target.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      existed
    }
  }

  private val pathLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  /** Fingerprint-guarded write-once for at-rest serving layouts
    * (IVF-bucketed corpus, zone-mapped tables, training shards): run
    * `write` only when `layoutId` — a caller-computed digest of the
    * layout's inputs — differs from the id recorded in the marker
    * file, then record it. The marker lives INSIDE the layout dir
    * under a `_`-prefixed name, so Spark's file listing never sees it;
    * one shared implementation keeps the three call sites' freshness
    * protocol from drifting apart. Returns true when a rewrite ran.
    */
  def writeOnce(restDir: String, layoutId: String)(write: => Unit): Boolean = {
    val marker = new java.io.File(restDir, "_graft_layout")
    val fresh = marker.isFile && new String(
      java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == layoutId
    if (!fresh) {
      write
      java.nio.file.Files.write(marker.toPath, layoutId.getBytes("UTF-8"))
    }
    !fresh
  }
}
