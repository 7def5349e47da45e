package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Geo
import graft.operators.GeoOps

/** Join operators (SURVEY §2.3 J1-J8), each with a DuckDB oracle.
  * Broadcast hints are explicit wherever one side is dimension-sized,
  * so the physical plan is BroadcastHashJoin rather than a shuffle.
  */
object JoinQueries {

  type Q = (SparkSession, String) => DataFrame

  private def cityObjs = Fixtures.cities.map {
    case (id, n, la, lo, tz) => GeoOps.City(id, n, la, lo, tz)
  }

  /** Shared oracle for both nearest-city forms. */
  private val nearestCityOracle: String =
    s"""WITH ${Fixtures.citiesCte}, ${Fixtures.geoEventsCte}
       |SELECT event_id, city_id, city_name FROM (
       |  SELECT e.event_id, c.city_id, c.city_name,
       |    row_number() OVER (
       |      PARTITION BY e.event_id
       |      ORDER BY round(${Geo.haversineSql("e.lat", "e.lon", "c.city_lat", "c.city_lon")}, 4) ASC,
       |        c.city_id ASC) AS rn
       |  FROM geo_events e CROSS JOIN cities c
       |) WHERE rn = 1""".stripMargin

  val queries: Map[String, Q] = Map(
    // J1+W1 (parity plan): cross join dict + row_number argmin.
    "j1_cross_nearest_city" -> ((spark, dir) => {
      GeoOps.tagNearestCityWindowed(
        Fixtures.geoEvents(spark, dir), Fixtures.citiesDF(spark),
        col("lat"), col("lon"), col("event_id"))
        .select(col("event_id"), col("city_id"), col("city_name"))
    }),

    // Same semantics, scale plan: literal-array argmin, zero shuffle.
    "geo_nearest_city_minby" -> ((spark, dir) => {
      GeoOps.tagNearestCity(
        Fixtures.geoEvents(spark, dir), cityObjs, col("lat"), col("lon"))
        .select(col("event_id"), col("city_id"), col("city_name"))
    }),

    // J2: left equi join onto a broadcast dimension, with null fill.
    "j2_left_join" -> ((spark, dir) => {
      val richCust = Tables.customer(spark, dir)
        .where(col("c_acctbal") > 8000)
        .select(col("c_custkey"), col("c_mktsegment"))
      Tables.orders(spark, dir)
        .join(broadcast(richCust), col("o_custkey") === col("c_custkey"), "left")
        .na.fill(Map("c_mktsegment" -> "NONE"))
        .select(col("o_orderkey"), col("c_mktsegment").as("segment"))
    }),

    // J3: multi-way equi join (fact → dim → dim) + aggregation.
    "j3_multiway_join" -> ((spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // J4: inner join of two aggregates on a composite key.
    "j4_composite_key_join" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
        .withColumn("week", date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
      val counts = ev.groupBy("week", "event_type").agg(count(lit(1)).as("n"))
      val vals = ev.groupBy("week", "event_type").agg(round(sum("value"), 4).as("total_value"))
      counts.join(vals, Seq("week", "event_type"))
        .select(col("week"), col("event_type"), col("n"), col("total_value"))
    }),

    // J5: self equi join generating user pairs sharing an event_type
    // (reference's channel co-subscriber pairs, collector.py:1000-1008).
    "j5_self_join_pairs" -> ((spark, dir) => {
      val ue = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type")).distinct()
      val l = ue.select(col("event_type"), col("user_id").as("left_user"))
      val r = ue.select(col("event_type"), col("user_id").as("right_user"))
      // event_type has ~5 values: a shuffle join would skew onto 5
      // partitions; broadcasting the deduped right side keeps the
      // left side's parallelism. If the deduped side outgrew broadcast
      // range, graft.operators.Skew.saltedJoin is the fallback.
      l.join(broadcast(r), Seq("event_type"))
        .where(col("left_user") < col("right_user"))
        .groupBy("left_user", "right_user")
        .agg(count(lit(1)).as("shared_types"))
    }),

    // J6: left anti join — customers with no order above 400k.
    "j6_anti_join" -> ((spark, dir) => {
      val bigOrders = Tables.orders(spark, dir)
        .where(col("o_totalprice") > 400000)
      Tables.customer(spark, dir)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment").as("segment"))
    }),

    // Left semi join — customers having at least one order.
    "j7_semi_join" -> ((spark, dir) => {
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey").as("custkey"))
    }),

    // Full outer join of two per-user aggregates (beyond-reference op).
    "j8_full_outer_join" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
      val buys = ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("n_buys"))
      clicks.join(buys, Seq("user_id"), "full_outer")
        .na.fill(0, Seq("n_clicks", "n_buys"))
        .select(col("user_id"), col("n_clicks"), col("n_buys"))
    })
  )

  val oracles: Map[String, String] = Map(
    "j1_cross_nearest_city" -> nearestCityOracle,
    "geo_nearest_city_minby" -> nearestCityOracle,

    "j2_left_join" ->
      """SELECT o_orderkey, coalesce(c_mktsegment, 'NONE') AS segment
        |FROM orders LEFT JOIN (
        |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 8000
        |) rich ON o_custkey = rich.c_custkey""".stripMargin,

    "j3_multiway_join" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    "j4_composite_key_join" ->
      """WITH ev AS (
        |  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, event_type, value
        |  FROM events
        |), counts AS (
        |  SELECT week, event_type, count(*) AS n FROM ev GROUP BY 1, 2
        |), vals AS (
        |  SELECT week, event_type, round(sum(value), 4) AS total_value FROM ev GROUP BY 1, 2
        |)
        |SELECT counts.week, counts.event_type, n, total_value
        |FROM counts JOIN vals USING (week, event_type)""".stripMargin,

    "j5_self_join_pairs" ->
      """WITH ue AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT l.user_id AS left_user, r.user_id AS right_user, count(*) AS shared_types
        |FROM ue l JOIN ue r ON l.event_type = r.event_type AND l.user_id < r.user_id
        |GROUP BY 1, 2""".stripMargin,

    "j6_anti_join" ->
      """SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin,

    "j7_semi_join" ->
      """SELECT c_custkey AS custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "j8_full_outer_join" ->
      """WITH clicks AS (
        |  SELECT user_id, count(*) AS n_clicks FROM events WHERE event_type = 'click' GROUP BY 1
        |), buys AS (
        |  SELECT user_id, count(*) AS n_buys FROM events WHERE event_type = 'purchase' GROUP BY 1
        |)
        |SELECT coalesce(clicks.user_id, buys.user_id) AS user_id,
        |  coalesce(n_clicks, 0) AS n_clicks, coalesce(n_buys, 0) AS n_buys
        |FROM clicks FULL OUTER JOIN buys ON clicks.user_id = buys.user_id""".stripMargin
  )
}
