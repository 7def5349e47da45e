package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic distance kernels.
  *
  * The reference composes haversine from built-in column expressions
  * (reference src/spark/collector.py:120-133) — we do the same so the
  * whole expression stays inside whole-stage codegen; no UDF.
  *
  * NOTE the reference's formula uses `2R*sin(sqrt(a))` (collector.py:130)
  * instead of the correct `2R*asin(sqrt(a))`. Our engine semantic is the
  * correct asin haversine (SURVEY §7.4.1); [[referenceDistanceKm]]
  * reproduces the reference quirk behind a separate name for strict
  * compatibility runs.
  */
object Geo {

  val EarthRadiusKm: Double = 6371.0

  private def halfAngleTerm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    pow(sin(dLat), 2.0) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
  }

  /** Correct haversine great-circle distance in km. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    lit(2.0 * EarthRadiusKm) * asin(sqrt(halfAngleTerm(lat1, lon1, lat2, lon2)))

  /** Reference-compatible variant (`sin` where haversine needs `asin`,
    * collector.py:130). Nearly identical for small distances, and
    * always ≤ the correct distance (sin x ≤ x ≤ asin x on [0, 1]) —
    * which is what keeps grid blocking sized for the correct formula
    * COMPLETE under the compat formula too.
    */
  def referenceDistanceKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    lit(2.0 * EarthRadiusKm) * sin(sqrt(halfAngleTerm(lat1, lon1, lat2, lon2)))

  /** Session-selected distance kernel: the strict-compat flag
    * (`spark.graft.refCompat=true`) flips every distance-FILTER site
    * to the reference's sin formula. Nearest-city argmin sites are
    * deliberately NOT flipped: both formulas are strictly increasing
    * in the half-angle term over its [0, 1] domain, so the argmin (and
    * any distance RANKING) is provably identical under either — only
    * absolute thresholds can differ.
    */
  def distanceKm(refCompat: Boolean): (Column, Column, Column, Column) => Column =
    if (refCompat) referenceDistanceKm else haversineKm

  /** True when the session requests reference-exact quirks. */
  def refCompat(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("spark.graft.refCompat").exists(_.toBoolean)

  /** The same correct-haversine formula as DuckDB SQL text, for oracle
    * queries. Must stay expression-for-expression identical to
    * [[haversineKm]] so both engines run the same IEEE double ops.
    */
  def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"(2.0 * 6371.0 * asin(sqrt(" +
      s"pow(sin(radians(($lat2) - ($lat1)) / 2.0), 2.0) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"pow(sin(radians(($lon2) - ($lon1)) / 2.0), 2.0))))"
}
