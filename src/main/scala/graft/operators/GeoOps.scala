package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geo

/** Nearest-city tagging (the reference's shared geo kernel,
  * src/spark/collector.py:168-256: cross join events × cities dict,
  * haversine, row_number over distance, keep rank 1).
  *
  * Two implementations with identical semantics:
  *
  *   - [[tagNearestCity]] — the 100 TB path. The dictionary is tiny
  *     (10s of rows, reference config/config.yaml:30), so we fold it
  *     into a literal array-of-structs and take `array_min` of
  *     (distance, city_id, ...) structs: a pure per-row projection.
  *     Zero shuffle, zero join, whole-stage codegen; scales linearly
  *     with events and is embarrassingly parallel across executors.
  *
  *   - [[tagNearestCityWindowed]] — the reference-shaped plan
  *     (crossJoin + window argmin) kept for operator parity (J1+W1).
  *     Costs a |events|×|cities| intermediate plus a shuffle per
  *     window partitioning — correct but strictly worse; do not use
  *     at scale.
  *
  * Both forms rank by the UNROUNDED distance (ties broken by city_id)
  * and round only the reported dist_km — the DuckDB oracles rank the
  * same way with the same double formula, and the fixture's minimum
  * best-vs-2nd-city gap (0.087 km) dwarfs any cross-engine libm ulp.
  * round() itself stays off the per-row hot path (BigDecimal-backed).
  */
object GeoOps {

  /** One dictionary entry. */
  final case class City(id: Int, name: String, lat: Double, lon: Double, timezone: String)

  /** True iff (lat, lon) is a usable WGS84 coordinate: non-null,
    * non-NaN, |lat| ≤ 90, |lon| ≤ 180. The quarantine predicate for
    * geo inputs sourced from DATA rather than synthesized — a single
    * corrupt row (sensor glitch, unit confusion, null-as-999 sentinel)
    * must not abort a corpus-scale job at
    * [[GeoBlocking.pairsWithinKmAuto]]'s measured-extreme guard or
    * poison the blocking grid's cell sizing. Codegen-friendly
    * conjunction; apply BEFORE blocking/argmin, count what it drops
    * ([[Observe]]) rather than silently discarding at the source.
    */
  def validCoords(lat: Column, lon: Column): Column =
    lat.isNotNull && lon.isNotNull &&
      !isnan(lat) && !isnan(lon) &&
      abs(lat) <= 90.0 && abs(lon) <= 180.0

  /** Scale path: per-row argmin over a literal city array — no shuffle.
    *
    * The argmin compares UNROUNDED distances and rounds only the
    * winner: Spark's round() on double goes through BigDecimal, and 8
    * of them per row measured ~4× the cost of the 8 haversines
    * themselves. Equivalent to rounded-first comparison whenever no
    * two cities' rounded distances tie for an event — verified on the
    * fixtures (min best-vs-2nd gap ≈ 0.087 km ≫ the 1e-4 km rounding
    * quantum), and ties of real geography are broken by city_id below.
    */
  def tagNearestCity(events: DataFrame, cities: Seq[City], lat: Column, lon: Column): DataFrame = {
    require(cities.nonEmpty, "city dictionary must not be empty")
    val cityStructs = cities.map { c =>
      struct(
        Geo.haversineKm(lat, lon, lit(c.lat), lit(c.lon)).as("dist"),
        lit(c.id).as("city_id"),
        lit(c.name).as("city_name"),
        lit(c.timezone).as("timezone"))
    }
    val best = array_min(array(cityStructs: _*))
    events
      .withColumn("__best", best)
      .withColumn("city_id", col("__best.city_id"))
      .withColumn("city_name", col("__best.city_name"))
      .withColumn("timezone", col("__best.timezone"))
      .withColumn("dist_km", round(col("__best.dist"), 4))
      .drop("__best")
  }

  /** Parity path: crossJoin(broadcast(cities)) + row_number window.
    * Same unrounded-compare / round-the-winner scheme as
    * [[tagNearestCity]] (one BigDecimal round per event, not per pair).
    */
  def tagNearestCityWindowed(events: DataFrame, cities: DataFrame,
                             lat: Column, lon: Column, eventKey: Column): DataFrame = {
    val dist = Geo.haversineKm(lat, lon, col("city_lat"), col("city_lon"))
    val w = Window.partitionBy(eventKey).orderBy(col("__dist").asc, col("city_id").asc)
    events
      .crossJoin(broadcast(cities))
      .withColumn("__dist", dist)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .withColumn("dist_km", round(col("__dist"), 4))
      .drop("__rn", "__dist", "city_lat", "city_lon")
  }
}
