package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sinks

/** STG mover (reference src/spark/mover.py:42-112): reads the raw
  * layer where every event field is nested under one `event` struct
  * (with a further-nested `media` struct), flattens 18 struct fields
  * to top-level columns, parses string timestamps (stripping fractional
  * seconds via split — F6/F7), derives the `date` partition column
  * (F8), and writes partitioned gzip parquet (S5).
  *
  * Scale notes: flattening is a pure projection; the only data movement
  * is the partitioned write. The reference's repartition(56) (S8,
  * mover.py:47) is replaced by AQE-governed parallelism.
  */
object StgMoverJob {

  /** Build a raw-layer frame (nested `event` struct) from a flat events
    * table — the inverse of the mover, used to exercise round-trips.
    */
  def nest(flat: DataFrame): DataFrame =
    flat.select(
      struct(
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").as("datetime"),
        col("value"),
        struct(
          col("event_type").as("media_type"),
          concat(lit("src://"), col("event_id")).as("src")).as("media"),
        col("props")).as("event"),
      col("event_type"),
      col("event_id"))

  /** Flatten the raw nested layer back to STG columns.
    *
    * try_to_timestamp, not to_timestamp: under Spark 4's default ANSI
    * mode one malformed datetime string would abort the entire mover
    * run, where the (non-ANSI, Spark-3) reference this job mirrors
    * produced a null ts and a null date partition for that row — the
    * try_ variant preserves the documented reference behavior.
    */
  def flatten(raw: DataFrame): DataFrame = {
    val ts = try_to_timestamp(split(col("event.datetime"), "\\.").getItem(0),
      lit("yyyy-MM-dd HH:mm:ss"))
    raw.select(
      col("event_id"),
      col("event.user_id").as("user_id"),
      ts.as("ts"),
      col("event.value").as("value"),
      col("event.media.media_type").as("media_type"),
      col("event.media.src").as("media_src"),
      col("event.props").as("props"),
      col("event_type"),
      date_format(ts, "yyyy-MM-dd").as("date"))
  }

  /** Full mover: nest→flatten is identity on the shared columns; the
    * write lands Hive-partitioned by (event_type, date).
    */
  def run(spark: SparkSession, raw: DataFrame, outPath: String): Unit =
    Sinks.writePartitioned(flatten(raw), outPath, Seq("event_type", "date"))
}
