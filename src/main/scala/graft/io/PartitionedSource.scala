package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Partition-window source (SURVEY §2.1 S1): read a sliding window of
  * `depth` daily partitions ending at `date` from a Hive-layout lake
  * (`root/event_type=X/date=YYYY-MM-DD`).
  *
  * The reference enumerates candidate paths and probes object storage
  * for existence before reading (reference src/helper/helper.py:169-231)
  * because spark.read.parquet(paths) throws on missing paths. We keep
  * that probe (Hadoop FileSystem — works for s3a/hdfs/file) AND read
  * via the table root + partition-column filters, so Catalyst's
  * PruneFileSourcePartitions does the pruning and the scan stays a
  * single datasource relation (partition discovery, predicate
  * pushdown, and AQE all apply).
  */
object PartitionedSource {

  private val fmt = DateTimeFormatter.ISO_LOCAL_DATE

  /** The `depth` dates ending at `date` (inclusive), newest first. */
  def window(date: LocalDate, depth: Int): Seq[String] =
    (0 until depth).map(i => date.minusDays(i.toLong).format(fmt))

  /** Existing partition paths for an event type + date window. */
  def existingPaths(spark: SparkSession, root: String, eventType: String,
                    date: LocalDate, depth: Int): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    window(date, depth).map(d => s"$root/event_type=$eventType/date=$d")
      .filter { p =>
        val path = new Path(p)
        path.getFileSystem(conf).exists(path)
      }
  }

  /** Read the window via root-scan + partition filters (Catalyst
    * partition pruning; `mergeSchema` tolerates drift across dates).
    */
  def readWindow(spark: SparkSession, root: String, eventType: String,
                 date: LocalDate, depth: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dates = window(date, depth)
    spark.read
      .option("mergeSchema", "true")
      .option("basePath", root)
      .parquet(root)
      .where(col("event_type") === eventType && col("date").isin(dates: _*))
  }
}
