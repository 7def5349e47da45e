package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GeoOps
import graft.queries.Fixtures

/** Datamart 1 — users demographic (reference
  * src/spark/collector.py:378-560), re-expressed Spark-first over the
  * geo-events world:
  *
  *   act_city      city of the user's latest event (W2 analog; we use
  *                 row_number desc, deterministic tie-break event_id)
  *   local_time    latest event ts converted to the act city's timezone
  *                 (from_utc_timestamp with a COLUMN timezone, F4)
  *   travel_*      lag-based city-change runs (W3) → ordered visit list
  *                 (A1, sorted explicitly — SURVEY §7.4.2)
  *   home_city     previous city of the first stay longer than
  *                 `minStayDays` (W4/W5 + datediff F5; the reference's
  *                 27-day rule scaled to the fixture's 30-day span)
  *
  * Scale notes: geo tagging is a zero-shuffle projection
  * (GeoOps.tagNearestCity); every window partitions by user_id, so the
  * plan needs exactly one hash exchange of the tagged events which
  * Spark's ReuseExchange shares across the act/travel/home branches.
  * No repartition(1): output parallelism is left to AQE.
  */
object UsersDemographicJob {

  val MinStayDays = 1

  def cityObjs: Seq[GeoOps.City] = Fixtures.cities.map {
    case (id, n, la, lo, tz) => GeoOps.City(id, n, la, lo, tz)
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tagged = GeoOps.tagNearestCity(
      Fixtures.geoEvents(spark, dir), cityObjs, col("lat"), col("lon"))
      .select("user_id", "event_id", "ts", "city_id", "city_name", "timezone")

    // -- actual city: latest event per user --------------------------
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val act = tagged
      .withColumn("__rn", row_number().over(wDesc))
      .where(col("__rn") === 1)
      .select(
        col("user_id"),
        col("city_name").as("act_city"),
        col("city_id").as("act_city_id"),
        col("timezone"),
        col("ts").as("last_ts"))
      .withColumn("local_time",
        date_format(from_utc_timestamp(col("last_ts"), col("timezone")),
          "yyyy-MM-dd HH:mm:ss"))

    // -- travels: city-change runs ----------------------------------
    val wAsc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val travels = tagged
      .withColumn("prev_city", lag(col("city_name"), 1).over(wAsc))
      .where(col("prev_city").isNull || col("prev_city") =!= col("city_name"))

    val travelAgg = travels
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("travel_count"),
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("city_name")))),
            x => x.getField("city_name"))).as("travel_array"))

    // -- home city: previous city of first long stay ----------------
    val wTrav = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val home = travels
      .select(col("user_id"), col("ts"), col("event_id"), col("city_name"))
      .withColumn("prev_travel_city", lag(col("city_name"), 1).over(wTrav))
      .withColumn("prev_travel_ts", lag(col("ts"), 1).over(wTrav))
      .where(col("prev_travel_city").isNotNull &&
        datediff(col("ts").cast("date"), col("prev_travel_ts").cast("date")) > MinStayDays)
      .withColumn("__rn", row_number().over(wTrav))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("prev_travel_city").as("home_city"))

    act
      .join(travelAgg, Seq("user_id"), "left")
      .join(home, Seq("user_id"), "left")
      .na.fill(Map("home_city" -> "unknown"))
      .select(col("user_id"), col("act_city"), col("home_city"),
        col("local_time"), col("travel_count"), col("travel_array"))
  }
}
