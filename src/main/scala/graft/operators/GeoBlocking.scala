package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Geo

/** Proximity-pair generation by spatial grid blocking.
  *
  * The reference computes user-pair distances on ALL candidate pairs
  * and filters afterwards (reference src/spark/collector.py:1081-1091)
  * — quadratic in users. At scale the proximity predicate must prune
  * pair GENERATION: bucket points into a lat/lon grid sized so any
  * pair within `maxKm` falls in the same or an adjacent cell, explode
  * one side to its 3×3 neighborhood, equi-join on cell, then apply the
  * exact haversine filter. Join volume drops from |P|² to
  * Σ|cell|·|neighborhood| — linear for bounded densities.
  *
  * Each qualifying pair is emitted exactly once (the left side
  * explodes to neighbors, the right side keeps its home cell; a pair's
  * right-cell appears exactly once in the left's neighborhood).
  *
  * `minCosLat` bounds the longitude-degree shrink across the domain
  * (cos of the highest |latitude| expected); it only affects cell
  * SIZING, never correctness of the final exact filter.
  */
object GeoBlocking {

  /** `distanceKm` selects the exact-filter kernel (default: correct
    * haversine). The reference-compat sin variant UNDERESTIMATES the
    * correct distance, so it can admit pairs whose true span exceeds
    * maxKm by up to maxKm³/(24R²) (sin x = x − x³/6 + …); cells are
    * therefore sized on that inflated bound, which makes blocking
    * provably complete for BOTH kernels at any maxKm — the inflation
    * is ~0.01% at 300 km and still <2% at 5000 km.
    *
    * Rows whose |lat| exceeds the `minCosLat` domain would silently
    * shrink longitude cells below the guarantee, so the cell key
    * raises at execution instead of quietly dropping pairs.
    */
  def pairsWithinKm(points: DataFrame, idCol: String, latCol: String, lonCol: String,
                    maxKm: Double, minCosLat: Double = 0.5,
                    distanceKm: (Column, Column, Column, Column) => Column =
                      Geo.haversineKm): DataFrame = {
    require(maxKm > 0 && minCosLat > 0)
    val earthR = Geo.EarthRadiusKm
    val sizingKm = maxKm * (1.0 + (maxKm * maxKm) / (24.0 * earthR * earthR))
    val latCellDeg = sizingKm / 111.0
    val lonCellDeg = sizingKm / (111.0 * minCosLat)
    val maxLatDeg = math.toDegrees(math.acos(minCosLat))
    def cellX(lon: Column): Column = floor(lon / lonCellDeg).cast("long")
    def cellY(lat: Column): Column =
      when(abs(lat) > maxLatDeg, raise_error(concat(
        lit(f"GeoBlocking: |lat| beyond the minCosLat=$minCosLat%s domain " +
          f"(max $maxLatDeg%.2f deg): "), lat.cast("string"))))
        .otherwise(floor(lat / latCellDeg)).cast("long")

    val base = points.select(
      col(idCol).as("id"), col(latCol).as("lat"), col(lonCol).as("lon"),
      cellX(col(lonCol)).as("cx"), cellY(col(latCol)).as("cy"))

    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val l = base.select(
      col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
      }: _*)).as("cell"))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    val r = base.select(
      col("cx"), col("cy"),
      col("id").as("id_b"), col("lat").as("lat_b"), col("lon").as("lon_b"))

    // Filter on the UNROUNDED distance (engine convention: round is
    // BigDecimal-backed and boundary behavior must match the oracles,
    // which also compare unrounded); only the REPORTED distance rounds.
    l.join(r, Seq("cx", "cy"))
      .where(col("id_a") < col("id_b"))
      .withColumn("__d", distanceKm(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")))
      .where(col("__d") <= maxKm)
      .select(col("id_a"), col("id_b"), round(col("__d"), 4).as("dist_km"))
    // no dedup needed: b's single home cell appears exactly once in
    // a's 3×3 neighborhood, and id_a < id_b kills the mirrored role.
  }

  /** [[pairsWithinKm]] with the longitude-shrink bound DERIVED from
    * the input instead of asserted by the caller: one scalar
    * min/max-latitude aggregate (bounded driver work — a single row,
    * the same legitimacy class as the IVF quantizer sample) sizes the
    * cells from the domain the data actually occupies. A hardcoded
    * `minCosLat` is a silent-pair-loss hazard the moment the input
    * outgrows the latitude band it was tuned for; deriving it makes
    * the completeness guarantee unconditional.
    *
    * Polar guard: within 1° of a pole the longitude-grid approach
    * degenerates (cells collapse, and the ±180 wrap this blocking
    * deliberately ignores starts mattering at any longitude), so
    * inputs beyond ±89° are rejected loudly. The derived cosine is
    * nudged down one part in 1e6 so a point exactly AT the measured
    * extreme can never trip [[pairsWithinKm]]'s domain guard through
    * acos/cos rounding.
    *
    * Contract: `points` must be DETERMINISTIC across evaluations — the
    * bound is measured in its own action and the pair join
    * re-evaluates the plan; an input containing rand()/sampling could
    * materialize a latitude above the measured extreme on the second
    * pass and die at the domain guard. Checkpoint nondeterministic
    * inputs first (FriendRecsJob feeds a localCheckpointed frame).
    */
  def pairsWithinKmAuto(points: DataFrame, idCol: String, latCol: String, lonCol: String,
                        maxKm: Double,
                        distanceKm: (Column, Column, Column, Column) => Column =
                          Geo.haversineKm): DataFrame = {
    // cast("double") so the extreme reads correctly whatever numeric
    // type the latitude column arrives as (float/decimal/double)
    val row = points.agg(max(abs(col(latCol))).cast("double")).collect()(0)
    val maxAbsLat = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    require(maxAbsLat <= 89.0,
      f"pairsWithinKmAuto: |lat| up to $maxAbsLat%.4f deg — longitude-grid " +
        "blocking degenerates near the poles; use a polar-cap strategy")
    val minCos = math.max(math.cos(math.toRadians(maxAbsLat)) * (1.0 - 1e-6), 1e-3)
    pairsWithinKm(points, idCol, latCol, lonCol, maxKm, minCos, distanceKm)
  }
}
