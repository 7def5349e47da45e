package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.operators.GeoOps
import graft.queries.Fixtures

/** Datamart 3 — friend recommendations (reference
  * src/spark/collector.py:896-1150):
  *
  *   1. real contacts: bidirectional edge expansion of (user, partner)
  *      pairs via explode(array(...)) (F10), distinct;
  *   2. candidate pairs: self equi join of per-channel subscribers
  *      (J5) with left != right;
  *   3. minus contacts: left anti join (J6);
  *   4. per-user latest-event coordinates (we use LATEST — the
  *      reference's asc/first "last message" quirk is documented in
  *      SURVEY §7.4.3 and not reproduced), joined to both sides (J7);
  *   5. haversine proximity filter (the 1 km rule scaled to the
  *      fixture's synthetic coordinate spread);
  *   6. decorate with zone + local time (J8, F4).
  *
  * "Messages" are click events whose partner id comes from the props
  * JSON payload; "channels" are signup/view event types. Scale notes:
  * the per-channel self join is the quadratic hot spot (SURVEY §7.3) —
  * its both-sides input is deduped first, and at 100 TB channel-level
  * salting or LSH blocking replaces it (see graft.operators.Dedup).
  * The anti join and coordinate joins shuffle on the same (left_user)
  * key so AQE can reuse the exchange.
  */
object FriendRecsJob {

  val MaxDistKm = 300.0
  val ProcessedDttm = "2026-08-12 00:00:00"

  def run(spark: SparkSession, dir: String): DataFrame = {
    val geo = Fixtures.geoEvents(spark, dir)

    // 1. Real contacts from "messages" (click events, partner from props).
    val msgs = geo
      .where(col("event_type") === "click")
      .select(
        col("user_id"),
        (get_json_object(col("props"), "$.k").cast("long") % 100L).as("partner"))
      .where(col("partner").isNotNull && col("partner") =!= col("user_id"))
    // Contact exclusion is direction-symmetric (the reference expands
    // every message edge in both directions, F10), so candidates are
    // generated and deduped as UNDIRECTED (lo < hi) pairs — half the
    // distinct/anti volume — and both directions are emitted at the end.
    val contacts = msgs
      .select(
        least(col("user_id"), col("partner")).as("lo"),
        greatest(col("user_id"), col("partner")).as("hi"))
      .distinct()

    // 2. Candidate pairs: users sharing a "channel" (signup/view type).
    val subs = geo
      .where(col("event_type").isin("signup", "view"))
      .select(col("event_type").as("channel"), col("user_id"))
      .distinct()
    // The join key ("channel") has tiny cardinality — a shuffle join
    // would collapse onto a handful of partitions (skew). Broadcast the
    // deduped right side instead: parallelism follows the left side.
    val pairs = subs.select(col("channel"), col("user_id").as("lo"))
      .join(broadcast(subs.select(col("channel"), col("user_id").as("hi"))), Seq("channel"))
      .where(col("lo") < col("hi"))
      .select("lo", "hi")
      .distinct()

    // 3. Remove pairs that already messaged each other. Contacts are
    // bounded by the message count (≪ pairs): broadcast the anti side
    // so the pair table never shuffles here. Then expand to both
    // directions (the datamart recommends symmetrically).
    val fresh = pairs
      .join(broadcast(contacts), Seq("lo", "hi"), "left_anti")
      .select(explode(array(
        struct(col("lo").as("left_user"), col("hi").as("right_user")),
        struct(col("hi").as("left_user"), col("lo").as("right_user")))).as("e"))
      .select(col("e.left_user"), col("e.right_user"))

    // 4. Latest-event coordinates + act city per user.
    val tagged = GeoOps.tagNearestCity(geo, UsersDemographicJob.cityObjs,
      col("lat"), col("lon"))
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastCoords = tagged
      .withColumn("__rn", row_number().over(wDesc))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("lat"), col("lon"),
        col("city_id"), col("timezone"), col("ts").as("last_ts"))

    // 5-6. Proximity filter + decoration.
    val left = lastCoords.select(
      col("user_id").as("left_user"), col("lat").as("l_lat"), col("lon").as("l_lon"),
      col("city_id").as("zone_id"), col("timezone"), col("last_ts"))
    val right = lastCoords.select(
      col("user_id").as("right_user"), col("lat").as("r_lat"), col("lon").as("r_lon"))

    // lastCoords is one row per user (dimension-sized) — broadcast both
    // decorations so the pair table streams map-side.
    fresh
      .join(broadcast(left), Seq("left_user"))
      .join(broadcast(right), Seq("right_user"))
      .withColumn("dist_km",
        round(Geo.haversineKm(col("l_lat"), col("l_lon"), col("r_lat"), col("r_lon")), 4))
      .where(col("dist_km") <= MaxDistKm)
      .select(
        col("left_user").as("user_id"),
        col("right_user").as("rec_to_add_user_id"),
        lit(ProcessedDttm).as("processed_dttm"),
        col("zone_id"),
        date_format(from_utc_timestamp(col("last_ts"), col("timezone")),
          "yyyy-MM-dd HH:mm:ss").as("local_time"))
  }
}
