package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Shared fixtures used by both the Spark queries and their DuckDB
  * oracles. The reference's geo-events world (events with lat/lon + a
  * small cities dictionary, reference src/spark/collector.py:135-166)
  * is reconstructed over the driver's `events` table by deriving
  * deterministic coordinates from `event_id` — the SAME arithmetic
  * expression is emitted on the Spark side and in the oracle SQL, so
  * results agree bit-for-bit.
  */
object Fixtures {

  /** city_id, city_name, city_lat, city_lon, timezone — mirrors the
    * reference's cities dict shape (collector.py:148-161).
    */
  val cities: Seq[(Int, String, Double, Double, String)] = Seq(
    (1, "Sydney", -33.87, 151.21, "Australia/Sydney"),
    (2, "Melbourne", -37.81, 144.96, "Australia/Melbourne"),
    (3, "Brisbane", -27.47, 153.03, "Australia/Brisbane"),
    (4, "Perth", -31.95, 115.86, "Australia/Perth"),
    (5, "Adelaide", -34.93, 138.6, "Australia/Adelaide"),
    (6, "Canberra", -35.28, 149.13, "Australia/Canberra"),
    (7, "Hobart", -42.88, 147.33, "Australia/Hobart"),
    (8, "Darwin", -12.46, 130.84, "Australia/Darwin"))

  def citiesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cities.toDF("city_id", "city_name", "city_lat", "city_lon", "timezone")
  }

  /** DuckDB CTE body defining the identical cities relation. Use as:
    * s"WITH $citiesCte, ... SELECT ...".
    */
  val citiesCte: String = {
    val rows = cities
      .map { case (id, n, la, lo, tz) => s"($id, '$n', $la, $lo, '$tz')" }
      .mkString(", ")
    s"cities(city_id, city_name, city_lat, city_lon, timezone) AS (VALUES $rows)"
  }

  // Derived deterministic event coordinates (same IEEE ops both engines):
  // lat spans ~[-44, -26.7], lon ~[113, 152.6] — the cities' bounding box.
  def geoEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // the geo world is TIME-windowed end to end (last position,
      // travel chronology, week/month rollups) — a timestamp-less
      // event has no place on any of those timelines, and Spark/
      // DuckDB order null ts at opposite ends of every window
      .where(col("ts").isNotNull)
      .withColumn("lat", lit(-44.0) + (col("event_id") % 97) * 0.18)
      .withColumn("lon", lit(113.0) + (col("event_id") % 89) * 0.45)

  /** DuckDB CTE body for the identical geo-events relation. */
  val geoEventsCte: String =
    "geo_events AS (SELECT *, -44.0 + (event_id % 97) * 0.18 AS lat, " +
      "113.0 + (event_id % 89) * 0.45 AS lon FROM events " +
      "WHERE ts IS NOT NULL)"
}
