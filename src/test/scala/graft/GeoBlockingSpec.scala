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

  test("compat sin kernel stays complete under the inflated cell sizing") {
    // the sin variant underestimates distance, so it can ADMIT pairs
    // farther apart than maxKm — the inflated sizing must still land
    // them in adjacent cells. Differential vs brute force at a large
    // radius where the underestimate is at its worst for the fixture.
    val maxKm = 2000.0
    val pts = points
    val blocked = GeoBlocking.pairsWithinKm(pts, "id", "lat", "lon", maxKm,
      minCosLat = 0.7, distanceKm = Geo.referenceDistanceKm)
    val l = pts.select(col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"))
    val r = pts.select(col("id").as("id_b"), col("lat").as("lat_b"), col("lon").as("lon_b"))
    val brute = l.crossJoin(r)
      .where(col("id_a") < col("id_b"))
      .withColumn("__d", Geo.referenceDistanceKm(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")))
      .where(col("__d") <= maxKm)
      .select(col("id_a"), col("id_b"), round(col("__d"), 4).as("dist_km"))
    assert(brute.count() > 0)
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty)
  }

  test("auto-derived cos bound loses no pairs on a high-latitude fixture") {
    import spark.implicits._
    // 66–74°N: cos ≈ 0.28–0.40, far outside any mid-latitude hardcode
    // (0.71 would under-size longitude cells ~2.5× here). Deterministic
    // scatter; 300 km radius leaves a nontrivial pair set.
    val pts = (0 until 120).map { i =>
      (i.toLong, 66.0 + (i * 37 % 80) / 10.0, -20.0 + (i * 53 % 400) / 10.0)
    }.toDF("id", "lat", "lon")
    val blocked = GeoBlocking.pairsWithinKmAuto(pts, "id", "lat", "lon", 300.0)
    val l = pts.select(col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"))
    val r = pts.select(col("id").as("id_b"), col("lat").as("lat_b"), col("lon").as("lon_b"))
    val brute = l.crossJoin(r)
      .where(col("id_a") < col("id_b"))
      .withColumn("__d", Geo.haversineKm(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")))
      .where(col("__d") <= 300.0)
      .select(col("id_a"), col("id_b"), round(col("__d"), 4).as("dist_km"))
    assert(brute.count() > 0, "test needs qualifying pairs")
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty)
    // a point exactly AT the measured extreme must not trip the domain
    // guard through acos/cos rounding (the 1e-6 nudge)
    val edge = Seq((1L, 74.0, 0.0), (2L, 74.0, 0.1), (3L, -74.0, 0.0))
      .toDF("id", "lat", "lon")
    assert(GeoBlocking.pairsWithinKmAuto(edge, "id", "lat", "lon", 50.0).count() === 1L)
  }

  test("auto-derived bound rejects polar inputs loudly") {
    import spark.implicits._
    val pts = Seq((1L, 89.5, 10.0), (2L, 89.6, 11.0)).toDF("id", "lat", "lon")
    val e = intercept[IllegalArgumentException] {
      GeoBlocking.pairsWithinKmAuto(pts, "id", "lat", "lon", 100.0)
    }
    assert(e.getMessage.contains("polar"))
  }

  test("latitudes beyond the minCosLat domain fail loudly, not silently") {
    import spark.implicits._
    val pts = Seq((1L, -60.0, 100.0), (2L, -60.1, 100.0)).toDF("id", "lat", "lon")
    val e = intercept[Exception] {
      GeoBlocking.pairsWithinKm(pts, "id", "lat", "lon", 100.0, minCosLat = 0.71).collect()
    }
    assert(e.getMessage != null)
  }

  test("validCoords quarantine lets blocking survive poisoned rows") {
    import spark.implicits._
    // one sensor-glitch row per failure mode, amid valid points that
    // form exactly one qualifying pair
    val dirty = Seq(
      (1L, Some(52.00), Some(13.00)),
      (2L, Some(52.05), Some(13.05)),
      (3L, Some(999.0), Some(13.0)), // unit confusion / sentinel
      (4L, Some(52.0), Some(-720.0)), // wrapped longitude
      (5L, Some(Double.NaN), Some(13.0)), // NaN lat
      (6L, None, Some(13.0)), // null lat
      (7L, Some(10.0), None) // null lon
    ).toDF("id", "lat", "lon")
    // raw poisoned frame aborts at the measured-extreme guard...
    intercept[IllegalArgumentException] {
      graft.operators.GeoBlocking.pairsWithinKmAuto(dirty, "id", "lat", "lon", 10.0)
    }
    // ...the quarantine predicate drops exactly the five poisoned rows
    // and blocking proceeds with the valid pair intact
    val clean = dirty.where(graft.operators.GeoOps.validCoords(col("lat"), col("lon")))
    assert(clean.count() === 2L)
    val pairs = graft.operators.GeoBlocking
      .pairsWithinKmAuto(clean, "id", "lat", "lon", 10.0).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("friend-recs observes its quarantine drop count in-flight") {
    // the metric rides the job's own pass (CollectMetrics node — no
    // second scan); on the clean fixture it must report zero drops
    // and a positive user count, so a feed-wide corruption would be
    // visible as n_dropped > 0 rather than a silent candidate shrink
    val df = graft.jobs.FriendRecsJob.run(spark, sfDir)
    df.collect()
    val m = df.queryExecution.observedMetrics("friend_recs_coord_quarantine")
    assert(m.getAs[Long]("n_dropped") === 0L)
    assert(m.getAs[Long]("n_users") > 0L)
  }
}
