package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Geo
import graft.jobs.{EventTotalsJob, FriendRecsJob, UsersDemographicJob}

/** The three reference datamarts (SURVEY §3.2-§3.4) as end-to-end
  * queries with full DuckDB oracles. These are the flagship composite
  * pipelines — each exercises a large slice of the operator inventory
  * in one plan.
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Geo-tagged events CTE (argmin city per event), shared by oracles.
    * ts is cast to µs TIMESTAMP to match Spark's precision; ranking is
    * by the UNROUNDED distance, matching the Spark kernels (same
    * double formula; fixture min gap 0.087 km ≫ libm ulp).
    */
  private val taggedCte: String =
    s"""tagged AS (
       |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
       |    lat, lon, city_id, city_name, timezone
       |  FROM (
       |    SELECT e.*, c.city_id, c.city_name, c.timezone,
       |      row_number() OVER (PARTITION BY e.event_id
       |        ORDER BY ${Geo.haversineSql("e.lat", "e.lon", "c.city_lat", "c.city_lon")} ASC,
       |          c.city_id ASC) AS rn
       |    FROM geo_events e CROSS JOIN cities c
       |  ) WHERE rn = 1)""".stripMargin

  private val prelude: String =
    s"WITH ${Fixtures.citiesCte},\n${Fixtures.geoEventsCte},\n$taggedCte"

  val queries: Map[String, Q] = Map(
    "dm_users_demographic" -> ((spark, dir) => UsersDemographicJob.run(spark, dir)),
    "dm_events_wk_mnth" -> ((spark, dir) => EventTotalsJob.run(spark, dir)),
    "dm_friend_recs" -> ((spark, dir) => FriendRecsJob.run(spark, dir))
  )

  val oracles: Map[String, String] = Map(
    "dm_users_demographic" ->
      s"""$prelude,
         |act AS (
         |  SELECT user_id, city_name AS act_city, timezone, ts AS last_ts FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM tagged
         |  ) WHERE rn = 1),
         |travels AS (
         |  SELECT user_id, ts, event_id, city_name FROM (
         |    SELECT user_id, ts, event_id, city_name,
         |      lag(city_name) OVER (
         |        PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_city
         |    FROM tagged
         |  ) WHERE prev_city IS NULL OR prev_city <> city_name),
         |trav_agg AS (
         |  SELECT user_id, count(*) AS travel_count,
         |    string_agg(city_name, ',' ORDER BY ts ASC, event_id ASC) AS travel_array
         |  FROM travels GROUP BY 1),
         |home AS (
         |  SELECT user_id, prev_travel_city AS home_city FROM (
         |    SELECT user_id, ts, event_id, prev_travel_city,
         |      row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
         |    FROM (
         |      SELECT user_id, ts, event_id,
         |        lag(city_name) OVER w AS prev_travel_city,
         |        lag(ts) OVER w AS prev_travel_ts
         |      FROM travels
         |      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         |    )
         |    WHERE prev_travel_city IS NOT NULL
         |      AND date_diff('day', CAST(prev_travel_ts AS DATE), CAST(ts AS DATE)) > ${UsersDemographicJob.MinStayDays}
         |  ) WHERE rn = 1)
         |SELECT a.user_id, act_city, coalesce(home_city, 'unknown') AS home_city,
         |  strftime(timezone(a.timezone, timezone('UTC', a.last_ts)), '%Y-%m-%d %H:%M:%S') AS local_time,
         |  travel_count, travel_array
         |FROM act a
         |LEFT JOIN trav_agg t USING (user_id)
         |LEFT JOIN home h USING (user_id)""".stripMargin,

    "dm_events_wk_mnth" ->
      s"""$prelude,
         |base AS (
         |  SELECT city_id AS zone_id,
         |    strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         |    strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
         |    event_type, user_id, event_id, ts
         |  FROM tagged),
         |weekly AS (
         |  SELECT zone_id, week, month,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS week_click,
         |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS week_view,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS week_purchase
         |  FROM base GROUP BY 1, 2, 3),
         |regs AS (
         |  SELECT zone_id, week, month, count(*) AS week_user FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
         |    FROM base
         |  ) WHERE rn = 1 GROUP BY 1, 2, 3)
         |SELECT w.zone_id, w.week, w.month, week_click, week_view, week_purchase,
         |  coalesce(week_user, 0) AS week_user,
         |  CAST(sum(week_click) OVER m AS BIGINT) AS month_click,
         |  CAST(sum(week_view) OVER m AS BIGINT) AS month_view,
         |  CAST(sum(week_purchase) OVER m AS BIGINT) AS month_purchase,
         |  CAST(sum(coalesce(week_user, 0)) OVER m AS BIGINT) AS month_user
         |FROM weekly w LEFT JOIN regs USING (zone_id, week, month)
         |WINDOW m AS (PARTITION BY w.zone_id, w.month)""".stripMargin,

    "dm_friend_recs" ->
      s"""$prelude,
         |msgs AS (
         |  SELECT user_id,
         |    ${graft.core.Tables.jsonBigintSql("props", "$.k")} % 100 AS partner
         |  FROM geo_events WHERE event_type = 'click'),
         |msgs2 AS (SELECT * FROM msgs WHERE partner IS NOT NULL AND partner <> user_id),
         |contacts AS (
         |  SELECT DISTINCT left_user, right_user FROM (
         |    SELECT user_id AS left_user, partner AS right_user FROM msgs2
         |    UNION ALL
         |    SELECT partner AS left_user, user_id AS right_user FROM msgs2)),
         |subs AS (
         |  -- geo_events, not raw events: the engine derives channel
         |  -- flags from the same per-user aggregate over the
         |  -- time-windowed geo world, so a timestamp-less signup/view
         |  -- must not subscribe a user on the oracle side only
         |  SELECT DISTINCT event_type AS channel, user_id FROM geo_events
         |  WHERE event_type IN ('signup', 'view')),
         |pairs AS (
         |  SELECT DISTINCT l.user_id AS left_user, r.user_id AS right_user
         |  FROM subs l JOIN subs r
         |    ON l.channel = r.channel AND l.user_id <> r.user_id),
         |fresh AS (
         |  SELECT * FROM pairs p WHERE NOT EXISTS (
         |    SELECT 1 FROM contacts c
         |    WHERE c.left_user = p.left_user AND c.right_user = p.right_user)),
         |last_coords AS (
         |  SELECT user_id, lat, lon, city_id, timezone, ts AS last_ts FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM tagged
         |  ) WHERE rn = 1)
         |SELECT f.left_user AS user_id, f.right_user AS rec_to_add_user_id,
         |  '${FriendRecsJob.ProcessedDttm}' AS processed_dttm,
         |  l.city_id AS zone_id,
         |  strftime(timezone(l.timezone, timezone('UTC', l.last_ts)), '%Y-%m-%d %H:%M:%S') AS local_time
         |FROM fresh f
         |JOIN last_coords l ON f.left_user = l.user_id
         |JOIN last_coords r ON f.right_user = r.user_id
         |WHERE ${Geo.haversineSql("l.lat", "l.lon", "r.lat", "r.lon")} <= ${FriendRecsJob.MaxDistKm}""".stripMargin
  )
}
