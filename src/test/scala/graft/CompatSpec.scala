package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.jobs.{FriendRecsJob, UsersDemographicJob}
import graft.operators.GeoOps
import graft.queries.Fixtures

/** Differential pins for the strict-compat session flag
  * (`spark.graft.refCompat=true`): compat mode must reproduce the
  * reference's sin-haversine and earliest-message-coordinates quirks
  * exactly, while default mode keeps the engine semantics (the default
  * path is separately held to the dm_friend_recs oracle).
  */
class CompatSpec extends SparkSpec {

  test("referenceDistanceKm is the reference sin formula, bounded by correct haversine") {
    import spark.implicits._
    val pts = Seq(
      (-33.87, 151.21, -37.81, 144.96),
      (-27.47, 153.03, -42.88, 147.33),
      (-31.95, 115.86, -12.46, 130.84)).toDF("la1", "lo1", "la2", "lo2")
    val rows = pts.select(
      Geo.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")).as("h"),
      Geo.referenceDistanceKm(col("la1"), col("lo1"), col("la2"), col("lo2")).as("r"),
      col("la1"), col("lo1"), col("la2"), col("lo2")).collect()
    rows.foreach { row =>
      val (h, r) = (row.getDouble(0), row.getDouble(1))
      // independent recompute of 2R*sin(sqrt(a)) (collector.py:130)
      val (la1, lo1, la2, lo2) = (row.getDouble(2), row.getDouble(3),
        row.getDouble(4), row.getDouble(5))
      val a = math.pow(math.sin(math.toRadians(la2 - la1) / 2), 2) +
        math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
          math.pow(math.sin(math.toRadians(lo2 - lo1) / 2), 2)
      val expected = 2 * 6371.0 * math.sin(math.sqrt(a))
      assert(math.abs(r - expected) < 1e-9, s"sin variant mismatch: $r vs $expected")
      assert(r < h, "sin variant must underestimate the correct distance")
    }
    // distanceKm(false) is the correct kernel, distanceKm(true) the quirk
    val sel = pts.select(
      Geo.distanceKm(false)(col("la1"), col("lo1"), col("la2"), col("lo2")) ===
        Geo.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")),
      Geo.distanceKm(true)(col("la1"), col("lo1"), col("la2"), col("lo2")) ===
        Geo.referenceDistanceKm(col("la1"), col("lo1"), col("la2"), col("lo2"))).collect()
    assert(sel.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("refCompat mode decorates from the EARLIEST event; default from the latest") {
    assert(!Geo.refCompat(spark))
    val default = FriendRecsJob.run(spark, sfDir).localCheckpoint(true)
    spark.conf.set("spark.graft.refCompat", "true")
    try {
      assert(Geo.refCompat(spark))
      val compat = FriendRecsJob.run(spark, sfDir).localCheckpoint(true)
      // independent rebuild of the reference's asc/first coords quirk
      val geo = Fixtures.geoEvents(spark, sfDir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val earliest = geo.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      val expectedZone = GeoOps.tagNearestCity(earliest,
        UsersDemographicJob.cityObjs, col("lat"), col("lon"))
        .select(col("user_id").as("user_id"), col("city_id").as("expected_zone"))
      val mismatches = compat.select(col("user_id"), col("zone_id")).distinct()
        .join(expectedZone, Seq("user_id"))
        .where(col("zone_id") =!= col("expected_zone"))
      assert(mismatches.isEmpty, "compat zone must come from the earliest event")
      // and the two modes genuinely differ on this fixture
      assert(compat.exceptAll(default).count() > 0)
    } finally spark.conf.unset("spark.graft.refCompat")
  }
}
