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
  *   act_city      city of the user's latest event (W2 analog)
  *   local_time    latest event ts converted to the act city's timezone
  *                 (from_utc_timestamp with a COLUMN timezone, F4)
  *   travel_*      lag-based city-change runs (W3) → ordered visit list
  *                 (A1, sorted explicitly — SURVEY §7.4.2)
  *   home_city     previous city of the first stay longer than
  *                 `MinStayDays` (W4/W5 + datediff F5; the reference's
  *                 27-day rule scaled to the fixture's 30-day span)
  *
  * 100 TB plan shape (vs the reference's one-window-per-step chain,
  * which costs a shuffle per distinct window): geo tagging is a
  * zero-shuffle projection; then the events shuffle by user_id exactly
  * ONCE — a single window pass computes the city-change flag, and one
  * hash aggregation (already co-partitioned, so no second exchange)
  * folds act-city (max_by), the visit list (filtered collect_list),
  * and home-city (pure array expressions over the sorted visits).
  */
object UsersDemographicJob {

  val MinStayDays = 1

  def cityObjs: Seq[GeoOps.City] = Fixtures.cities.map {
    case (id, n, la, lo, tz) => GeoOps.City(id, n, la, lo, tz)
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tagged = GeoOps.tagNearestCity(
      Fixtures.geoEvents(spark, dir), cityObjs, col("lat"), col("lon"))
      .select("user_id", "event_id", "ts", "city_name", "timezone")

    val wAsc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)

    val flagged = tagged
      .withColumn("prev_city", lag(col("city_name"), 1).over(wAsc))
      .withColumn("is_visit",
        col("prev_city").isNull || col("prev_city") =!= col("city_name"))

    val assembled = flagged
      .groupBy("user_id")
      .agg(
        max_by(struct(col("city_name"), col("timezone"), col("ts")),
          struct(col("ts"), col("event_id"))).as("act"),
        array_sort(collect_list(
          when(col("is_visit"), struct(col("ts"), col("event_id"), col("city_name")))))
          .as("visits"))

    // Stay lengths between consecutive visits; home = city of the first
    // stay longer than MinStayDays (all scalar array expressions).
    val stays = when(size(col("visits")) < 2, array().cast("array<struct<c:string,d:int>>"))
      .otherwise(transform(
        sequence(lit(1), size(col("visits")) - 1),
        i => struct(
          element_at(col("visits"), i).getField("city_name").as("c"),
          datediff(
            element_at(col("visits"), i + 1).getField("ts").cast("date"),
            element_at(col("visits"), i).getField("ts").cast("date")).as("d"))))

    assembled
      .withColumn("__stays", filter(stays, s => s.getField("d") > MinStayDays))
      .select(
        col("user_id"),
        col("act.city_name").as("act_city"),
        coalesce(try_element_at(col("__stays"), lit(1)).getField("c"), lit("unknown")).as("home_city"),
        date_format(from_utc_timestamp(col("act.ts"), col("act.timezone")),
          "yyyy-MM-dd HH:mm:ss").as("local_time"),
        size(col("visits")).cast("long").as("travel_count"),
        concat_ws(",", transform(col("visits"), v => v.getField("city_name"))).as("travel_array"))
  }
}
