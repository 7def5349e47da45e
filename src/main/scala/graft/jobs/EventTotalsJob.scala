package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GeoOps
import graft.queries.Fixtures

/** Datamart 2 — per-zone weekly/monthly event totals (reference
  * src/spark/collector.py:562-894): weekly grain with monthly rollups
  * replicated onto the weekly rows (W6).
  *
  * The reference runs four separate scan→geo-tag→aggregate pipelines
  * (messages / reactions / registrations / subscriptions) and joins
  * them on [zone, week, month]. We fold the per-class weekly counts
  * into ONE conditional aggregation over a single geo-tagged pass —
  * one scan and one shuffle instead of four of each — and compute
  * "registrations" (each user's first event, W7) as the only extra
  * branch, left-joined and zero-filled. Monthly totals are window sums
  * over (zone, month) exactly like the reference.
  */
object EventTotalsJob {

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tagged = GeoOps.tagNearestCity(
      Fixtures.geoEvents(spark, dir), UsersDemographicJob.cityObjs,
      col("lat"), col("lon"))
      .select(
        col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("city_id").as("zone_id"))
      .withColumn("week", date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
      .withColumn("month", date_format(date_trunc("month", col("ts")), "yyyy-MM-dd"))

    // One conditional aggregation replaces the reference's 3 parallel
    // count pipelines (messages/reactions/subscriptions analogs).
    val weekly = tagged
      .groupBy("zone_id", "week", "month")
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("week_click"),
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("week_view"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("week_purchase"))

    // Registrations: each user's first event (W7), geo-tagged. min_by
    // instead of a window: the per-user shuffle then moves only
    // map-side-combined (user, first-event) rows, not all events.
    val regs = tagged
      .groupBy("user_id")
      .agg(min_by(struct(col("zone_id"), col("week"), col("month")),
        struct(col("ts"), col("event_id"))).as("first"))
      .select(col("first.zone_id"), col("first.week"), col("first.month"))
      .groupBy("zone_id", "week", "month")
      .agg(count(lit(1)).as("week_user"))

    val wMonth = org.apache.spark.sql.expressions.Window
      .partitionBy(col("zone_id"), col("month"))
    weekly
      .join(regs, Seq("zone_id", "week", "month"), "left")
      .na.fill(0, Seq("week_user"))
      .withColumn("month_click", sum(col("week_click")).over(wMonth))
      .withColumn("month_view", sum(col("week_view")).over(wMonth))
      .withColumn("month_purchase", sum(col("week_purchase")).over(wMonth))
      .withColumn("month_user", sum(col("week_user")).over(wMonth))
      .orderBy(col("zone_id"), col("week"), col("month"))
  }
}
