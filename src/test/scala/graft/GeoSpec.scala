package graft

import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.operators.GeoOps
import graft.queries.Fixtures

class GeoSpec extends SparkSpec {

  test("haversine matches known city distances") {
    import spark.implicits._
    val df = Seq((-33.87, 151.21, -37.81, 144.96)).toDF("la1", "lo1", "la2", "lo2")
    val d = df.select(Geo.haversineKm($"la1", $"lo1", $"la2", $"lo2").as("d"))
      .head().getDouble(0)
    // Sydney–Melbourne great-circle ≈ 713 km
    assert(math.abs(d - 713.0) < 5.0, s"got $d")
  }

  test("haversine is symmetric and zero at identity") {
    import spark.implicits._
    val df = Seq((-33.87, 151.21, -12.46, 130.84)).toDF("la1", "lo1", "la2", "lo2")
    val Array(ab, ba, aa) = df.select(
      Geo.haversineKm($"la1", $"lo1", $"la2", $"lo2"),
      Geo.haversineKm($"la2", $"lo2", $"la1", $"lo1"),
      Geo.haversineKm($"la1", $"lo1", $"la1", $"lo1")).head().toSeq.toArray.map(_.asInstanceOf[Double])
    assert(ab === ba)
    assert(aa === 0.0)
  }

  test("literal-array argmin and windowed crossJoin argmin agree") {
    val events = Fixtures.geoEvents(spark, sfDir)
    val cities = Fixtures.cities.map { case (id, n, la, lo, tz) => GeoOps.City(id, n, la, lo, tz) }
    val fast = GeoOps.tagNearestCity(events, cities, col("lat"), col("lon"))
      .select("event_id", "city_id")
    val slow = GeoOps.tagNearestCityWindowed(events, Fixtures.citiesDF(spark),
      col("lat"), col("lon"), col("event_id"))
      .select("event_id", "city_id")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("argmin is invariant under city-dictionary permutation") {
    val events = Fixtures.geoEvents(spark, sfDir)
    val cities = Fixtures.cities.map { case (id, n, la, lo, tz) => GeoOps.City(id, n, la, lo, tz) }
    val a = GeoOps.tagNearestCity(events, cities, col("lat"), col("lon"))
      .select("event_id", "city_id")
    val b = GeoOps.tagNearestCity(events, scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(cities), col("lat"), col("lon"))
      .select("event_id", "city_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("reference sin-variant stays close to asin haversine at small distance") {
    import spark.implicits._
    val df = Seq((-33.87, 151.21, -33.88, 151.22)).toDF("la1", "lo1", "la2", "lo2")
    val row = df.select(
      Geo.haversineKm($"la1", $"lo1", $"la2", $"lo2"),
      Geo.referenceDistanceKm($"la1", $"lo1", $"la2", $"lo2")).head()
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 0.001)
  }
}
