package graft

import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.operators.GeoBlocking
import graft.queries.Fixtures

class GeoBlockingSpec extends SparkSpec {

  private def points = Fixtures.geoEvents(spark, sfDir)
    .groupBy("user_id")
    .agg(max_by(struct(col("lat"), col("lon")), struct(col("ts"), col("event_id"))).as("p"))
    .select(col("user_id").as("id"), col("p.lat").as("lat"), col("p.lon").as("lon"))

  test("grid-blocked pairs equal brute-force pairs") {
    val maxKm = 500.0
    val pts = points
    // fixture latitudes reach 44°S → cos ≈ 0.719
    val blocked = GeoBlocking.pairsWithinKm(pts, "id", "lat", "lon", maxKm, minCosLat = 0.7)
    val l = pts.select(col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"))
    val r = pts.select(col("id").as("id_b"), col("lat").as("lat_b"), col("lon").as("lon_b"))
    val brute = l.crossJoin(r)
      .where(col("id_a") < col("id_b"))
      .withColumn("dist_km",
        round(Geo.haversineKm(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")), 4))
      .where(col("dist_km") <= maxKm)
      .select("id_a", "id_b", "dist_km")
    assert(brute.count() > 0, "test needs qualifying pairs")
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty)
  }

  test("blocking emits each pair exactly once") {
    val blocked = GeoBlocking.pairsWithinKm(points, "id", "lat", "lon", 500.0, minCosLat = 0.7)
    assert(blocked.groupBy("id_a", "id_b").count().where(col("count") > 1).isEmpty)
  }
}
