package graft.io

import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode}

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

  /** S6+S7: datamart write with errorifexists→overwrite fallback.
    * Returns true if the fallback path was taken (pre-existing data).
    */
  def writeDatamart(df: DataFrame, path: String, singleFile: Boolean = false): Boolean = {
    val out = if (singleFile) df.coalesce(1) else df
    try {
      out.write.mode(SaveMode.ErrorIfExists).parquet(path)
      false
    } catch {
      case _: AnalysisException =>
        out.write.mode(SaveMode.Overwrite).parquet(path)
        true
    }
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
