package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // Channel cardinality is tiny here, so the reference's per-channel
    // equi join (J5) degenerates: it emits a quadratic intermediate
    // that the following distinct must shuffle. Instead aggregate one
    // boolean per channel per user (map-side combined), then a
    // broadcast theta self-join on lo < hi keeping overlapping flags —
    // each undirected pair is emitted exactly once, no distinct pass.
    // With many selective channels the equi-join form wins instead;
    // j5_self_join_pairs keeps the general set-intersect variant.
    // One per-user aggregation carries BOTH the channel flags and the
    // latest-event coordinates (step 4) — a single scan+tag+shuffle
    // where separate subFlags/lastCoords passes would cost two.
    val tagged = GeoOps.tagNearestCity(geo, UsersDemographicJob.cityObjs,
      col("lat"), col("lon"))
    val perUser = tagged
      .groupBy(col("user_id"))
      .agg(
        max(col("event_type") === "signup").as("has_signup"),
        max(col("event_type") === "view").as("has_view"),
        max_by(
          struct(col("lat"), col("lon"), col("city_id"), col("timezone"),
            col("ts").as("last_ts")),
          struct(col("ts"), col("event_id"))).as("b"))
      // One row per user (dimension-sized) and referenced five times
      // downstream (both theta-join sides, both coordinate
      // attachments, the decoration) — materialize once instead of
      // re-running scan+tag+agg per reference. localCheckpoint over
      // persist: no cache-registry entry for callers to leak.
      .localCheckpoint(true)

    // Users with neither channel flag can never satisfy the overlap
    // predicate — the theta join below filters them naturally.
    val pairs = perUser
      .select(col("user_id").as("lo"), col("has_signup").as("s_lo"), col("has_view").as("v_lo"))
      .join(broadcast(perUser.select(
        col("user_id").as("hi"), col("has_signup").as("s_hi"), col("has_view").as("v_hi"))),
        col("lo") < col("hi"))
      .where((col("s_lo") && col("s_hi")) || (col("v_lo") && col("v_hi")))
      .select("lo", "hi")

    // 3. Remove pairs that already messaged each other. Contacts are
    // bounded by the message count (≪ pairs): broadcast the anti side
    // so the pair table never shuffles here.
    val fresh = pairs.join(broadcast(contacts), Seq("lo", "hi"), "left_anti")

    // 4. Latest-event coordinates + act city per user — from the same
    // perUser aggregation as the channel flags above (max_by, not a
    // row_number window: only map-side-combined rows move).
    val lastCoords = perUser
      .select(col("user_id"), col("b.lat"), col("b.lon"),
        col("b.city_id"), col("b.timezone"), col("b.last_ts").as("last_ts"))

    // 5. Proximity filter on UNDIRECTED pairs (haversine is symmetric,
    // including bit-exactly after rounding), so the distance is
    // computed once per pair — half the coordinate joins and distance
    // evaluations of a filter-after-expansion plan. lastCoords is one
    // row per user (dimension-sized): broadcast, pairs stream map-side.
    val nearby = fresh
      .join(broadcast(lastCoords.select(
        col("user_id").as("lo"), col("lat").as("lo_lat"), col("lon").as("lo_lon"))), Seq("lo"))
      .join(broadcast(lastCoords.select(
        col("user_id").as("hi"), col("lat").as("hi_lat"), col("lon").as("hi_lon"))), Seq("hi"))
      // UNROUNDED distance filter, matching the oracle's unrounded
      // predicate: round() is BigDecimal-backed and this runs once per
      // candidate pair. Cross-engine agreement is safe — the nearest
      // pair distance to the 300 km boundary over ALL grid coordinate
      // pairs is 1.7e-3 km away, dwarfing libm ulp differences.
      .where(Geo.haversineKm(
        col("lo_lat"), col("lo_lon"), col("hi_lat"), col("hi_lon")) <= MaxDistKm)
      .select("lo", "hi")

    // 6. Expand survivors to both directions (the datamart recommends
    // symmetrically) and decorate from the left user's latest event.
    nearby
      .select(explode(array(
        struct(col("lo").as("left_user"), col("hi").as("right_user")),
        struct(col("hi").as("left_user"), col("lo").as("right_user")))).as("e"))
      .select(col("e.left_user"), col("e.right_user"))
      .join(broadcast(lastCoords.select(
        col("user_id").as("left_user"), col("city_id").as("zone_id"),
        col("timezone"), col("last_ts"))), Seq("left_user"))
      .select(
        col("left_user").as("user_id"),
        col("right_user").as("rec_to_add_user_id"),
        lit(ProcessedDttm).as("processed_dttm"),
        col("zone_id"),
        date_format(from_utc_timestamp(col("last_ts"), col("timezone")),
          "yyyy-MM-dd HH:mm:ss").as("local_time"))
  }
}
