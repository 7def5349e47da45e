package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Aggregation and window operators (SURVEY §2.4 A1-A6, §2.5 W1-W7),
  * each with a DuckDB oracle. collect_list results are sorted before
  * emission (SURVEY §7.4.2 — the reference relies on undefined
  * post-shuffle ordering; we make order explicit and oracle-checkable).
  */
object AggWindowQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Dirty-measurement guard for the value-statistics family: a
    * statistic has no bucket for NaN/±Infinity, and Spark's floor()
    * SILENTLY saturates non-finite doubles to 0 / ±Long.MaxValue —
    * the saturated sentinel then poisons every downstream sum or
    * difference into an ANSI ARITHMETIC_OVERFLOW abort (found by
    * EventsDirtySpec: winsorized/MAD/equi-depth/EWMA all died on one
    * NaN row). Contract: only FINITE, NON-NULL measurements enter a
    * value statistic; oracles mirror with `WHERE isfinite(value)`
    * (NULL is not finite on either engine).
    */
  private def finiteMeasure(c: org.apache.spark.sql.Column) =
    !isnan(c) && abs(c) =!= Double.PositiveInfinity

  val queries: Map[String, Q] = Map(
    // A1+A2: per-user ordered collect_list + size (travel_array analog).
    "a1_collect_list" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .groupBy("user_id")
        .agg(
          concat_ws(",", array_sort(collect_list(col("event_type")))).as("types_sorted"),
          // count(*), not size(collect_list): collect_list SKIPS null
          // elements, so a type-less event silently vanished from
          // n_events while the oracle's count(*) kept it
          count(lit(1)).as("n_events"))
    }),

    // A3+W6: weekly counts with monthly totals replicated per week
    // (the reference's wk/mnth datamart grain, collector.py:668-673).
    "a3_weekly_monthly" -> ((spark, dir) => {
      // group on DATE keys; render strings at output cardinality
      val wk = Tables.events(spark, dir)
        .withColumn("week", date_trunc("week", col("ts")).cast("date"))
        .withColumn("month", date_trunc("month", col("ts")).cast("date"))
        .groupBy("month", "week", "event_type")
        .agg(count(lit(1)).as("week_cnt"))
      wk.withColumn("month_cnt",
        sum(col("week_cnt")).over(Window.partitionBy(col("month"), col("event_type"))))
        .withColumn("week", date_format(col("week"), "yyyy-MM-dd"))
        .withColumn("month", date_format(col("month"), "yyyy-MM-dd"))
    }),

    // A4: distinct projection.
    "a4_distinct" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type")).distinct()
    }),

    // A5: dedup-by-key with a deterministic keeper (latest ts, then
    // highest event_id) — the well-defined form of drop_duplicates.
    "a5_dedup_by_key" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, dir)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"))
    }),

    // A6: argmax via max_by — top-spending user per event_type.
    "a6_argmax" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .groupBy("user_id", "event_type")
        .agg(round(sum("value"), 4).as("total"))
        .groupBy("event_type")
        .agg(max_by(col("user_id"), struct(col("total"), col("user_id"))).as("top_user"),
          round(max(col("total")), 4).as("top_total"))
    }),

    // Exact distinct count (reference does dedup-then-count; we add the
    // direct aggregate for completeness).
    "a7_count_distinct" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    }),

    // Value histogram via aligned-width binning — the profiling shape
    // that scales: one map-side-combined agg, bucket count bounded by
    // the value range, never by row count.
    "agg_histogram" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .where(finiteMeasure(col("value")))
        .groupBy(floor(col("value") / 10.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 4).as("bucket_sum"))
    }),

    // Per-column profiling (Deequ-style): melt the numeric measures to
    // long format, one agg computes count/NDV/min/max/mean per column —
    // a fixed-size result regardless of table width × row count.
    // In-session funnel conversion: sessionize by 1800 s inactivity
    // gap (gaps-and-islands under the total (s, event_id) order),
    // then require the ORDERED stage chain view → click → purchase
    // WITHIN each session (click at-or-after first view, purchase
    // at-or-after that click — time-respecting, not mere presence).
    // Per-session work is three conditional mins; output is the
    // 1-row funnel with exact ppm conversion rates.
    "events_session_funnel" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
        // time-ordered analytics exclude timestamp-less rows: Spark
        // sorts null ts FIRST, DuckDB LAST, so an unguarded window
        // silently diverges across engines on exactly one dirty row
      val ev = Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("s"))
      val w = Window.partitionBy("user_id").orderBy(col("s"), col("event_id"))
      val sess = ev
        .withColumn("gap",
          when(col("s") - lag(col("s"), 1).over(w) > 1800L, 1L)
            .otherwise(when(lag(col("s"), 1).over(w).isNull, 1L).otherwise(0L)))
        .withColumn("sid", sum(col("gap")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      // r16: the three dependent stage minima run as STACKED whole-
      // partition windows over (user_id, sid) instead of three
      // aggregate+join-back passes (each of which re-derived the
      // sessionized stream — the join form re-ran the window subtree
      // per consumer). The session partitioning is a superset of the
      // user partitioning already established, so no new exchange is
      // planned; each window sees the previous stage's column, which
      // keeps the time-respecting chain (click at-or-after first view,
      // purchase at-or-after that click) identical.
      val ws = Window.partitionBy("user_id", "sid")
      val perP = sess
        .withColumn("v",
          min(when(col("event_type") === "view", col("s"))).over(ws))
        .withColumn("c",
          min(when(col("event_type") === "click" && col("s") >= col("v"),
            col("s"))).over(ws))
        .withColumn("p",
          min(when(col("event_type") === "purchase" && col("s") >= col("c"),
            col("s"))).over(ws))
        .groupBy("user_id", "sid")
        .agg(min(col("v")).as("v"), min(col("c")).as("c"),
          min(col("p")).as("p"))
      perP.agg(
          count(lit(1)).as("n_sessions"),
          sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_view_click"),
          sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n_full_funnel"))
        // counts here are GLOBAL session tallies — at a 1e13-event
        // corpus n_view·1e6 passes BIGINT, so the ppm products run
        // 128-bit (quotients are ≤ 1e6 by construction)
        .withColumn("view_ppm",
          expr("(CAST(n_view AS DECIMAL(38,0)) * 1000000) div n_sessions"))
        .withColumn("purchase_ppm",
          expr("(CAST(n_full_funnel AS DECIMAL(38,0)) * 1000000) div n_sessions"))
    }),

    // Median/MAD anomaly detection (the robust z-score): per group,
    // EXACT median and median-absolute-deviation via two passes of
    // the group-partitioned histogram-cumsum rank test (2·cum >= n ⇔
    // cum >= ceil(n/2)), then flag values with |v − med| > 10·MAD.
    // Robust where mean/stddev launder the outliers into the
    // threshold itself. All integer fixed-point; group-cardinality
    // med/mad tables broadcast back.
    "events_anomaly_mad" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      def groupMedian(df: DataFrame, valCol: String, out: String) = {
        val wc = Window.partitionBy("g").orderBy(valCol)
          .rowsBetween(Window.unboundedPreceding, 0)
        df.groupBy("g", valCol).agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(wc))
          .withColumn("n", sum(col("c")).over(Window.partitionBy("g")))
          .groupBy("g")
          .agg(min(when(col("cum") * 2 >= col("n"), col(valCol))).as(out))
      }
      val v = Tables.events(spark, dir)
        .where(finiteMeasure(col("value")))
        .select(col("event_type").as("g"),
          floor(col("value") * 10000).cast("long").as("vq"))
      val med = groupMedian(v, "vq", "med")
      val dev = v.join(broadcast(med), Seq("g"))
        .withColumn("dv", abs(col("vq") - col("med")))
      val mad = groupMedian(dev.select(col("g"), col("dv")), "dv", "mad")
      dev.join(broadcast(mad), Seq("g"))
        .groupBy(col("g").as("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("med")).as("med_x1e4"), min(col("mad")).as("mad_x1e4"),
          sum(when(col("dv") > col("mad") * 10, 1L).otherwise(0L))
            .as("n_anomalies"))
    }),

    // Per-group winsorized mean (robust stats): clamp each group's
    // values to its own EXACT p05/p95 rank cuts, then integer means —
    // the outlier-resistant aggregate a metrics pipeline publishes
    // next to the raw mean. Values quantized once (IEEE multiply +
    // floor); cuts via group-PARTITIONED cumsum windows over the
    // per-group value histogram (each partition is one group's
    // distinct values — never a global sort); group-cardinality cut
    // table joins back broadcast.
    "agg_winsorized" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.events(spark, dir)
        .where(finiteMeasure(col("value")))
        .select(col("event_type").as("g"),
          floor(col("value") * 10000).cast("long").as("vq"))
      val hist = v.groupBy("g", "vq").agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy("g").orderBy("vq")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = hist.withColumn("cum", sum(col("c")).over(wcum))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("g")))
      // integer rank test: cum >= ceil(a/20)  ⇔  20·cum >= a
      val cuts = cum.groupBy("g").agg(
        min(when(col("cum") * 20 >= col("n"), col("vq"))).as("lo"),
        min(when(col("cum") * 20 >= col("n") * 19, col("vq"))).as("hi"))
      v.join(broadcast(cuts), Seq("g"))
        .groupBy(col("g").as("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("lo")).as("lo_x1e4"), min(col("hi")).as("hi_x1e4"),
          sum(col("vq")).as("__sraw"),
          sum(greatest(col("lo"), least(col("hi"), col("vq")))).as("__wsum"))
        .withColumn("mean_x1e4", expr("__sraw div n"))
        .withColumn("wmean_x1e4", expr("__wsum div n"))
        .drop("__sraw", "__wsum")
    }),

    // Equi-depth histogram statistics (the ANALYZE-TABLE artifact an
    // optimizer estimates selectivity from): 8 equal-mass buckets of
    // events.value with EXACT boundary values. Values quantized once
    // (one IEEE multiply + floor — deterministic on every engine);
    // the 7 rank cuts come from Quantiles.exactCutsByRank (two-level
    // prefix sum — no corpus-wide ordered window); rows then bucket
    // by VALUE against the broadcast cut row so ties land
    // deterministically. Equal depth holds up to tie mass.
    "profile_equidepth" -> ((spark, dir) => {
      import graft.operators.Quantiles
      val v = Tables.events(spark, dir)
        .where(finiteMeasure(col("value")))
        .select(floor(col("value") * 10000).cast("long").as("vq"))
      val n = v.count() // corpus scalar, known pre-plan
      val b = 8
      val ranks = (1 until b).map(k => (k.toLong * n + b - 1) / b)
      val cuts = Quantiles.exactCutsByRank(v, "vq", ranks)
      val cutCols = ranks.distinct.sorted.zipWithIndex.map { case (r, i) =>
        min(when(col("rank") === r, col("cut"))).as(s"c$i")
      }
      val one = cuts.agg(cutCols.head, cutCols.tail: _*)
      val nCuts = ranks.distinct.size
      val bucket = (0 until nCuts).foldRight(lit(nCuts): org.apache.spark.sql.Column) {
        case (i, rest) => when(col("vq") <= col(s"c$i"), i).otherwise(rest)
      }
      v.crossJoin(broadcast(one))
        .select(bucket.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
        .join(
          // hi edge per bucket (last bucket open-ended → NULL)
          one.select(explode(array((0 until nCuts).map(i =>
            struct(lit(i).as("bucket"), col(s"c$i").as("hi_x1e4"))) :+
            struct(lit(nCuts).as("bucket"),
              lit(null).cast("long").as("hi_x1e4")): _*)).as("s"))
            .select(col("s.bucket"), col("s.hi_x1e4")),
          Seq("bucket"), "left")
        .select(col("bucket"), col("hi_x1e4"), col("n_rows"))
    }),

    "profile_columns" -> ((spark, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      Tables.lineitem(spark, dir)
        .select(cols.map(col): _*)
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          cols.map(col).toArray, "column", "v")
        // finite measurements only (the events-profile contract): a
        // NaN measure aborted the exact fixed-point sum with ANSI
        // CAST_OVERFLOW (RelationalDirtySpec)
        .where(finiteMeasure(col("v")))
        // TWO-LEVEL aggregate (r16: the approx twin's shape applied to
        // the exact profile): collapse to distinct (column, value)
        // groups first — map-side combine kills duplicates before the
        // shuffle — then derive every statistic from the distinct
        // groups. The single-level form with count_distinct mixed into
        // plain aggregates planned an Expand(×2) that doubled the
        // unpivoted stream through both aggregation levels.
        .groupBy("column", "v")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("column")
        .agg(
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("ndv"),
          round(min(col("v")), 4).as("vmin"),
          round(max(col("v")), 4).as("vmax"),
          // exact fixed-point sum (measures are 2-decimal): float avg()
          // is never hash-compared across engines — summation order
          // diverges at some grouping cell (dataset_card precedent).
          // Per-term value·count products run 128-bit (a 1e7-cent value
          // times a 1e12 duplicate count wraps long); the sum lands
          // back in the BIGINT output column with an ANSI-loud cast at
          // its honest representability cap (the approx twin's rule).
          sum(round(col("v") * 100).cast("decimal(38,0)") * col("cnt"))
            .cast("long").as("vsum_x100"))
        // 128-bit product: vsum_x100 approaches BIGINT on its own at
        // ~1e12 high-value rows, so vsum·100 would wrap long before
        // the sum column itself overflows its (honest, ANSI-loud)
        // BIGINT output cap.
        .withColumn("vmean_x1e4",
          expr("(CAST(vsum_x100 AS DECIMAL(38,0)) * 100) div n_rows"))
    }),

    // Profiling, scale form: NDV via HyperLogLog sketch instead of the
    // exact count_distinct. The exact NDV rides along ONLY to
    // oracle-check the sketch's error bound (a8 pattern) — at 100 TB
    // you emit the approx column alone and this is a single
    // map-side-combined pass. Structured as a TWO-LEVEL aggregate:
    // collapse to distinct (column, value) groups first (map-side
    // combine kills duplicates before the shuffle), then derive
    // n_rows/ndv/min/max/mean AND the sketch from the distinct values.
    // That sidesteps the Expand(×2) the planner emits when exact
    // count_distinct mixes with plain aggregates, and updates the HLL
    // once per DISTINCT value instead of once per row — which is why
    // this form beats the exact profile even at bench scale, not just
    // asymptotically. The mean is emitted as exact fixed-point
    // (sum of 2-decimal values ×100 as long, one integral division) —
    // float means are never hash-compared across engines.
    "profile_columns_approx" -> ((spark, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      Tables.lineitem(spark, dir)
        .select(cols.map(col): _*)
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          cols.map(col).toArray, "column", "v")
        // NULL measures: drop them BEFORE grouping so ndv doesn't gain
        // a null group and the mean's denominator matches avg()
        // semantics (and DuckDB's UNPIVOT, which excludes nulls) on
        // nullable columns — latent on the all-non-null fixture, but
        // the profiler must not change meaning the day it meets one
        // (finiteMeasure also drops NaN/±Inf, the events-profile
        // contract — its exact twin above does the same)
        .where(finiteMeasure(col("v")))
        .groupBy("column", "v")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("column")
        .agg(
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("ndv"),
          approx_count_distinct(col("v")).as("andv"),
          round(min(col("v")), 4).as("vmin"),
          round(max(col("v")), 4).as("vmax"),
          // per-term value·count products run 128-bit (a 1e7-cent
          // value times a 1e12 duplicate count wraps long); the sum
          // lands back in the BIGINT output column with an ANSI-loud
          // cast at its honest representability cap
          sum(round(col("v") * 100).cast("decimal(38,0)") * col("cnt"))
            .cast("long").as("vsum_x100"))
        .select(col("column"), col("n_rows"), col("ndv"),
          (abs(col("andv") - col("ndv")) <=
            greatest(col("ndv") * 0.1, lit(2.0))).as("ndv_in_tolerance"),
          col("vmin"), col("vmax"), col("vsum_x100"),
          expr("(CAST(vsum_x100 AS DECIMAL(38,0)) * 100) div n_rows")
            .as("vmean_x1e4"))
    }),

    // Ordered string aggregation (listagg): deterministic via numeric
    // sort before rendering; distinct collapses map-side.
    "agg_string_agg" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(concat_ws(",",
          transform(array_sort(collect_set(col("user_id"))), u => u.cast("string")))
          .as("users_csv"))
    }),

    // Unpivot (wide → long): aggregate to one row per flag, then melt
    // the measure columns — the Spark 4 unpivot operator.
    "agg_unpivot" -> ((spark, dir) => {
      Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(
          round(sum(col("l_quantity")), 4).as("qty"),
          round(sum(col("l_discount")), 4).as("disc"),
          round(sum(col("l_tax")), 4).as("tax"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("qty"), col("disc"), col("tax")),
          "measure", "val")
    }),

    // Ordered conversion funnel view→click→purchase: each stage's
    // first timestamp must follow the previous stage's. Three
    // conditional-min aggregations chained by PLAIN equi-joins — no
    // window over the full event stream, so each stage shuffles only
    // its own event-type slice; the per-user stage tables are
    // user-cardinality, so the planner (not a forced hint) decides
    // whether they broadcast.
    // Daily resample + forward fill (gap filling): each user gets a
    // dense day grid over their active span; days without an event
    // carry the previous observation forward. "Last event of the day"
    // is defined by max event_id — a deterministic, engine-agnostic
    // tiebreak (ns-vs-µs timestamp precision differs across engines).
    // Scale: the per-(user, day) reduction is map-side combinable, the
    // grid explode is bounded by span/grain, and the fill window
    // partitions per user (≤ span-days rows each) — nothing global.
    "ts_resample_ffill" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
        // result-identity (a null day never matches a spine day), but
        // it drops a useless null window partition and mirrors the
        // oracle's determinism guard (DuckDB null-partition bug)
        .where(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("value"),
          date_trunc("day", col("ts")).cast("date").as("day"))
      val lastPerDay = ev
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("day"))
            .orderBy(col("event_id").desc)))
        .where(col("rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("day_value"))
      val grid = ev.groupBy("user_id")
        .agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
        .select(col("user_id"),
          explode(sequence(col("dmin"), col("dmax"),
            expr("INTERVAL 1 DAY"))).as("day"))
      grid.join(lastPerDay, Seq("user_id", "day"), "left")
        .withColumn("value_ffill",
          last(col("day_value"), ignoreNulls = true).over(
            Window.partitionBy(col("user_id")).orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("value_ffill"), 4).as("value_ffill"),
          col("day_value").isNotNull.as("observed"))
    }),

    "funnel_stages" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_type"))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val c = ev.where(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .where(col("ts") >= col("v_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .where(col("ts") >= col("c_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
      ev.select(col("user_id")).distinct()
        .join(v, Seq("user_id"), "left")
        .join(c.select(col("user_id"), col("c_ts")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), col("p_ts")), Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("p_ts").isNotNull, 3)
            .when(col("c_ts").isNotNull, 2)
            .when(col("v_ts").isNotNull, 1)
            .otherwise(0).cast("long").as("stage"))
    }),

    // Approximate aggregates (HLL count-distinct + KLL quantile) —
    // sketch outputs can't be equality-checked across engines, but
    // their error bounds can (booleans below).
    // HLL set-INTERSECTION estimation by inclusion-exclusion
    // (est_A + est_B − est_A∪B) — the audience-overlap question HLL
    // unions alone can't answer. Intersection compounds three
    // sketches' error, so the tolerance is 3× the union rsd with an
    // absolute floor; the exact companions are DuckDB-reproducible
    // and the contract is the boolean (the a8 harness pattern).
    "sketch_hll_intersection" -> ((spark, dir) => {
      // membership is USER-level (has any even-id event / any
      // purchase), so pre-aggregate per user before sketching
      val m = Tables.events(spark, dir).groupBy("user_id").agg(
        max(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("ia"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("ib"))
      m.agg(
          sum(col("ia")).as("exact_a"),
          sum(col("ib")).as("exact_b"),
          sum(col("ia") * col("ib")).as("exact_inter"),
          approx_count_distinct(when(col("ia") === 1L, col("user_id"))).as("ea"),
          approx_count_distinct(when(col("ib") === 1L, col("user_id"))).as("eb"),
          approx_count_distinct(when(col("ia") === 1L || col("ib") === 1L,
            col("user_id"))).as("eu"))
        .select(col("exact_a"), col("exact_b"), col("exact_inter"),
          (abs(col("ea") + col("eb") - col("eu") - col("exact_inter")) <=
            greatest((col("exact_a") + col("exact_b")) * 0.15, lit(5.0)))
            .as("inter_in_tolerance"))
    }),

    "a8_approx_agg" -> ((spark, dir) => {
      // Sketch outputs can't be equality-checked across engines, but
      // their ERROR BOUNDS can: emit the exact values plus booleans
      // asserting the approximations landed inside tolerance (HLL rsd
      // 5% default → 10% + slack; KLL at accuracy 1000 → 5% of range).
      // Distinct and value aggregates split into two small aggs joined
      // on the 5-value key: one grouped agg mixing count_distinct with
      // sort-based percentiles plans an Expand over every column —
      // 2× the shuffled rows for no benefit.
      val ev = Tables.events(spark, dir)
        // per-type report: unlabeled events can't be attributed, and
        // the two-agg equi-join would silently drop the null group
        // the oracle's single GROUP BY keeps
        .where(col("event_type").isNotNull && finiteMeasure(col("value")))
      val users = ev.groupBy("event_type").agg(
        count_distinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("au"))
      val values = ev.groupBy("event_type").agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"),
        (max(col("value")) - min(col("value"))).as("vrange"))
      users.join(values, Seq("event_type"))
        .select(col("event_type"), col("exact_users"), col("p50"),
          (abs(col("au") - col("exact_users")) <=
            greatest(col("exact_users") * 0.1, lit(2.0))).as("ndv_in_tolerance"),
          (abs(col("ap50") - col("p50")) <= col("vrange") * 0.05)
            .as("p50_in_tolerance"))
    }),

    // Mergeable sketch partials — the incremental-stats pattern a lake
    // runs at 100 TB: per-week HLL sketches are built ONCE (at ingest
    // they'd be persisted), then any rollup (here monthly) UNIONS the
    // partials instead of rescanning history. a8 checks one sketch's
    // bound; this checks the merge path: union-of-partials estimate
    // vs an exact NDV computed independently. DataSketches HLL at the
    // default lgK=12 has rsd ~1.6%; 5% + small-count slack is safe.
    "sketch_hll_union" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
        // weekly partials are time-keyed: a timestamp-less row has no
        // partial (count(DISTINCT wk) in the oracle skips NULL weeks
        // while the engine's groupBy would mint a null-week partial)
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .select(col("event_type"),
          date_trunc("week", col("ts")).cast("date").as("wk"), col("user_id"))
      val weekly = ev.groupBy("event_type", "wk")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val rolled = weekly.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
          count(lit(1)).as("n_partials"))
      val exact = ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("exact_users"))
      exact.join(rolled, Seq("event_type"))
        .select(col("event_type"), col("exact_users"), col("n_partials"),
          (abs(col("est") - col("exact_users")) <=
            greatest(col("exact_users") * 0.05, lit(2.0)))
            .as("est_in_tolerance"))
    }),

    // Mergeable KLL quantile sketch — the hll_union shape for
    // quantiles, which percentile_approx can't do (no storable
    // partial): weekly per-type sketches union into a corpus sketch.
    // The deterministic compactor carries its own worst-case rank
    // bound, so the harness is self-certifying: each estimate's EXACT
    // rank (recomputed corpus-side) must land within err+1 of the
    // target rank under any partial-merge order; the sketch's total
    // mass n must equal the exact count (oracle cross-checks it).
    "sketch_quantiles" -> ((spark, dir) => {
      import spark.implicits._
      import graft.operators.QuantileSketch
      import graft.operators.QuantileSketch.Kll
      val ev = Tables.events(spark, dir)
        .where(col("event_type").isNotNull && col("ts").isNotNull &&
          finiteMeasure(col("value")))
        .select(col("event_type"),
          date_trunc("week", col("ts")).cast("date").as("wk"), col("value"))
      val kllAgg = udaf(new QuantileSketch.KllAgg(256))
      val kllUnion = udaf(new QuantileSketch.KllUnionAgg(256),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Kll]())
      val weekly = ev.groupBy("event_type", "wk")
        .agg(kllAgg(col("value")).as("sk"))
      // product-typed aggregator input rides as its flattened fields
      // (the TopKAgg convention)
      val rolled = weekly.groupBy("event_type")
        .agg(kllUnion(col("sk.k"), col("sk.n"), col("sk.err"),
          col("sk.levels")).as("sk"), count(lit(1)).as("n_partials"))
      // estimate extraction runs at ROLLUP cardinality (one row per
      // event_type), never the corpus
      val phis = Seq(0.25, 0.5, 0.75, 0.95)
      val est = rolled.as[(String, Kll, Long)].map { case (et, sk, np) =>
        (et, np, sk.n, sk.err,
          QuantileSketch.query(sk, phis(0)), QuantileSketch.query(sk, phis(1)),
          QuantileSketch.query(sk, phis(2)), QuantileSketch.query(sk, phis(3)))
      }.toDF("event_type", "n_partials", "n", "err", "e25", "e50", "e75", "e95")
      // est is a stored value: with ties its rank is the INTERVAL
      // [count(<est)+1, count(<=est)] — the bound asserts the target
      // sits within err+1 of that interval (a single-rank check would
      // misread a tie run's whole mass as sketch error)
      val exact = ev.join(broadcast(est), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_exact"),
          sum(when(col("value") <= col("e25"), 1L).otherwise(0L)).as("r25"),
          sum(when(col("value") <= col("e50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") <= col("e75"), 1L).otherwise(0L)).as("r75"),
          sum(when(col("value") <= col("e95"), 1L).otherwise(0L)).as("r95"),
          sum(when(col("value") < col("e25"), 1L).otherwise(0L)).as("s25"),
          sum(when(col("value") < col("e50"), 1L).otherwise(0L)).as("s50"),
          sum(when(col("value") < col("e75"), 1L).otherwise(0L)).as("s75"),
          sum(when(col("value") < col("e95"), 1L).otherwise(0L)).as("s95"))
      def rankOk(r: String, s: String, phi: Double) = {
        val target = ceil(lit(phi) * col("n_exact"))
        target >= col(s) + 1L - (col("err") + 1L) &&
          target <= col(r) + col("err") + 1L
      }
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_partials"), col("n_exact"),
          (col("n") === col("n_exact")).as("mass_exact"),
          rankOk("r25", "s25", 0.25).as("r25_ok"), rankOk("r50", "s50", 0.5).as("r50_ok"),
          rankOk("r75", "s75", 0.75).as("r75_ok"), rankOk("r95", "s95", 0.95).as("r95_ok"),
          (col("e25") <= col("e50") && col("e50") <= col("e75") &&
            col("e75") <= col("e95")).as("monotone"))
    }),

    // Statistical aggregates (corr/covar/stddev) — the stat-function
    // family the reference lacks. Regressors are small-magnitude
    // (days, not epochs) so 4-decimal rounding sits far above fp
    // accumulation error on both engines.
    "agg_stats" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .where(finiteMeasure(col("value")))
        .withColumn("days",
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("double"))
        .groupBy("event_type")
        .agg(
          round(corr(col("value"), col("days")), 4).as("corr_vd"),
          round(covar_samp(col("value"), col("days")), 4).as("covar_vd"),
          round(stddev_samp(col("value")), 4).as("sd_value"),
          round(avg(col("value")), 4).as("avg_value"))
    }),

    // Exact percentiles (interpolated, matches quantile_cont).
    "agg_percentile" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .where(finiteMeasure(col("value")))
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"))
    }),

    // F9 literal form: arrays_zip + explode of parallel arrays.
    "f9_arrays_zip" -> ((spark, dir) => {
      graft.core.Tables.documents(spark, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("lens", transform(col("toks"), t => length(t)))
        .select(col("doc_id"), explode(arrays_zip(col("toks"), col("lens"))).as("z"))
        .select(col("doc_id"), col("z.toks").as("word"), col("z.lens").cast("long").as("wlen"))
        .where(col("word") =!= "")
        .groupBy("wlen")
        .agg(count(lit(1)).as("n"), countDistinct(col("word")).as("n_words"))
    }),

    // W1: row_number top-k per group (top-2 events by value per user).
    "w1_rownum_topk" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select(col("user_id"), col("rn").cast("long").as("rn"), col("event_id"), round(col("value"), 4).as("value"))
    }),

    // W2: first(ignoreNulls) over desc order — latest non-null value
    // per user (act_city analog, collector.py:337-353).
    "w2_first_ignorenulls" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .withColumn("maybe_val",
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")))
        .withColumn("last_good_val", first(col("maybe_val"), ignoreNulls = true).over(w))
        .groupBy("user_id")
        .agg(round(max(col("last_good_val")), 4).as("last_good_val"))
        // a user whose events are ALL 'error' has no non-null value; the
        // oracle's WHERE drops such users entirely, so we must too.
        .where(col("last_good_val").isNotNull)
    }),

    // W3: lag-based change detection (travel city-change kernel,
    // collector.py:442-448): count event_type changes per user.
    "w3_lag_changes" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("changed",
          // null-SAFE inequality: a null event_type must register as a
          // change exactly like the oracle's IS DISTINCT FROM (the
          // null-unsafe =!= evaluated NULL -> 0 against a typed
          // neighbor); <=> also covers the first-row null-lag arm
          when(!(col("prev_type") <=> col("event_type")), 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum(col("changed")).as("n_changes"))
    }),

    // Join-key skew diagnosis — the report you run BEFORE shuffling a
    // 100 TB join: top-10 heaviest keys with exact ppm share and
    // cumulative share (decides between AQE skew-join, salting, or a
    // hot-key broadcast split). TakeOrdered top-10 (no full sort);
    // the rank/cumulative windows run over the 10-row result only.
    "diag_key_skew" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
      val total = ev.count() // corpus scalar, known pre-plan
      val top = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("user_id")).limit(10)
      val ord = Window.orderBy(col("c").desc, col("user_id"))
      val cum = Window.orderBy(col("c").desc, col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top
        .withColumn("rank", row_number().over(ord).cast("long"))
        // the whole point of this query is a pathologically hot key —
        // exactly the input where c·1e6 (and the cumulative sum ×1e6)
        // passes BIGINT at a 1e13-event table, so the ppm products
        // run 128-bit; quotients are ≤ 1e6 by construction
        .withColumn("share_ppm",
          expr(s"(CAST(c AS DECIMAL(38,0)) * 1000000) div ${total}L"))
        .withColumn("cum_ppm",
          sum(col("c")).over(cum).cast("decimal(38,0)") * lit(1000000L))
        .withColumn("cum_ppm", expr(s"cum_ppm div ${total}L"))
        .select(col("rank"), col("user_id"), col("c"),
          col("share_ppm"), col("cum_ppm"))
    }),

    // Behavioral anomaly flags composed from the Markov matrix: per
    // user, the count of rare transitions (corpus probability below
    // 2%) and the minimum transition probability seen — the
    // bot/fraud-screen shape. All integer/fixed-point (min of exact
    // x1e4 probs), so the composition stays engine-exact. Scale: the
    // matrix is |types|²-sized → broadcast back onto the transition
    // stream; one user-keyed aggregation.
    "events_rare_transitions" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val tr = Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
        .select(col("user_id"), col("prev_type"), col("event_type"))
      val counts = tr.groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
      val w2 = Window.partitionBy(col("prev_type"))
      val matrix = counts.withColumn("row_total", sum(col("n")).over(w2))
        .withColumn("prob_x1e4", expr("(n * 10000) div row_total"))
        .select(col("prev_type"), col("event_type"), col("prob_x1e4"))
      tr.join(broadcast(matrix), Seq("prev_type", "event_type"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_transitions"),
          sum(when(col("prob_x1e4") < 200, 1L).otherwise(0L)).as("n_rare"),
          min(col("prob_x1e4")).as("min_prob_x1e4"))
    }),

    // Interval coalescing (the batch interval-union / gaps-and-islands
    // operator): each event opens a 300 s activity interval; per user,
    // overlapping intervals merge into maximal islands and the output
    // is the per-user coverage profile — the timeline-utilization
    // analytics sessionizers can't express (a session resets on GAP
    // from the last event; an island ends only when NOTHING overlaps).
    // All arithmetic in epoch seconds (BIGINT; never raw timestamps —
    // the ns-precision gotcha), windows ordered by the total
    // (s, event_id) key so ties are engine-stable, and every window
    // partitions by user — no corpus-wide sort.
    "events_interval_coalesce" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val iv = Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("s"))
        .withColumn("e", col("s") + 300L)
      val w = Window.partitionBy("user_id").orderBy(col("s"), col("event_id"))
      val prevMax = max(col("e"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      iv.withColumn("new_isl",
          when(col("s") > coalesce(prevMax, lit(Long.MinValue)), 1L)
            .otherwise(0L))
        .withColumn("island",
          sum(col("new_isl")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("cs"), max(col("e")).as("ce"),
          count(lit(1)).as("n_ev"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("ce") - col("cs")).as("covered_s"),
          max(col("n_ev")).as("max_interval_events"))
    }),

    // Per-user EWMA (α = 1/2) — the sequential smoothing recurrence
    // windows can't express: s ← (s + v) div 2 folded over the user's
    // events in the total (s, event_id) order, ENTIRELY in integer
    // fixed-point so the fold is bit-deterministic on both engines
    // (a float EWMA would drift per step). The recurrence is
    // inherently order-dependent, so it runs as a per-user local fold
    // (collect bounded by the user's event count) — the only honest
    // distributed shape for per-key sequential state outside
    // streaming (where mapGroupsWithState holds it incrementally).
    "ts_ewma" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .where(col("ts").isNotNull && finiteMeasure(col("value")))
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("s"),
          floor(col("value") * 10000).cast("long").as("vq"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(
          struct(col("s"), col("event_id"), col("vq")))).as("seq"))
        .select(col("user_id"),
          size(col("seq")).cast("long").as("n_events"),
          expr("aggregate(transform(seq, x -> x.vq), CAST(0 AS BIGINT)," +
            " (acc, v) -> (acc + v) div 2)").as("ewma_x1e4"))
    }),

    // Last-touch conversion attribution (the marketing-analytics
    // staple): each purchase is credited to the user's most recent
    // PRIOR non-purchase event; purchases with no prior touch credit
    // 'none'. One user-partitioned window under the total
    // (s, event_id) order (epoch seconds — never raw timestamps),
    // then a touch-type-cardinality rollup with fixed-point share.
    "events_attribution" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
        // time-ordered analytics exclude timestamp-less rows: Spark
        // sorts null ts FIRST, DuckDB LAST, so an unguarded window
        // silently diverges across engines on exactly one dirty row
      val ev = Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("s"))
      val w = Window.partitionBy("user_id").orderBy(col("s"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touched = ev.withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")), true).over(w))
      touched.where(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"))
        // global purchase tallies: the ·1e6 product runs 128-bit so a
        // 1e13-event corpus can't wrap it (quotient ≤ 1e6 always)
        .withColumn("share_ppm",
          expr("CAST(n_purchases AS DECIMAL(38,0)) * 1000000" +
            " div sum(n_purchases) OVER ()"))
    }),

    // Retention cohort matrix: users grouped by first-active week,
    // per-cohort distinct-active counts at each week offset, retention
    // as an exact ppm-free fixed-point ratio. The product-analytics
    // staple. Scale: one distinct (user, week) projection, one
    // user-keyed min, one cohort-keyed count — all map-side
    // combinable; output is |cohorts| × |weeks|.
    "events_retention_cohorts" -> ((spark, dir) => {
      val act = Tables.events(spark, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val cohort = act.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      val sizes = cohort.groupBy("cohort_wk")
        .agg(count(lit(1)).as("cohort_size"))
      act.join(cohort, "user_id")
        .withColumn("week_n", expr("datediff(wk, cohort_wk) div 7"))
        .groupBy("cohort_wk", "week_n")
        .agg(count_distinct(col("user_id")).as("n_active"))
        .join(broadcast(sizes), "cohort_wk")
        .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort"),
          col("week_n"), col("n_active"), col("cohort_size"),
          expr("(n_active * 10000) div cohort_size").as("retention_x1e4"))
    }),

    // Markov transition matrix over per-user event journeys: exact
    // transition counts (lag over (ts, event_id) — engine-deterministic
    // order) + fixed-point row-normalized probabilities. The
    // session-behavior model a funnel/recommendation pipeline fits.
    // Scale: one user-keyed window (partitions are per-user journeys)
    // + one |types|²-sized aggregation.
    "events_markov_transitions" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val counts = Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
      val w2 = Window.partitionBy(col("prev_type"))
      counts.withColumn("row_total", sum(col("n")).over(w2))
        .withColumn("prob_x1e4", expr("(n * 10000) div row_total"))
        .select(col("prev_type"), col("event_type"), col("n"),
          col("row_total"), col("prob_x1e4"))
    }),

    // W7: first over asc = registration timestamp (collector.py:746-755).
    "w7_first_event" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .withColumn("reg_date",
          date_format(first(col("ts")).over(w), "yyyy-MM-dd"))
        .groupBy("user_id", "reg_date")
        .agg(count(lit(1)).as("n_events"))
    }),

    // lead + rank + dense_rank (beyond-reference window completeness).
    "w8_rank_lead" -> ((spark, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id").asc)
      Tables.events(spark, dir)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("next_event", lead(col("event_id"), 1).over(w))
        .where(col("rnk") <= 5)
        .select(col("event_type"), col("rnk").cast("long").as("rnk"), col("drnk").cast("long").as("drnk"),
          col("event_id"), col("next_event"))
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist
    // / nth_value (completes the window family beyond w8's ranks).
    "w11_distribution" -> ((spark, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      // value-ORDERED stats: a null value sorts FIRST in Spark asc and
      // LAST in DuckDB, shifting every ntile/percent_rank/nth_value in
      // the partition — the finite-measure contract excludes it
      Tables.events(spark, dir)
        .where(finiteMeasure(col("value")))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 4))
        .withColumn("cume", round(cume_dist().over(w), 4))
        .withColumn("third_id", nth_value(col("event_id"), 3).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("event_type"),
          col("quartile"), col("pct_rank"), col("cume"), col("third_id"))
    }),

    // RANGE frame: rolling 1-hour event-value sum per user, ordered by
    // epoch seconds (beyond-reference; true sliding-window semantics).
    "w10_range_frame" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-3600, 0)
      Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .withColumn("rolling_1h", round(sum(col("value")).over(w), 4))
        .groupBy("user_id")
        .agg(round(max(col("rolling_1h")), 4).as("max_rolling_1h"))
    }),

    // Array-function family: contains/slice/zip_with arithmetic.
    "f_array_family" -> ((spark, dir) => {
      Tables.embeddings(spark, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          // try_element_at: ANSI element_at ABORTS on an empty array
          // while DuckDB's list index yields NULL — try_ aligns the
          // engines on a zero-length (corrupt) embedding row
          round(try_element_at(col("embedding"), lit(1)).cast("double"), 4)
            .as("first_val"),
          round(aggregate(slice(col("embedding"), 1, 8).cast("array<double>"),
            lit(0.0), (acc, v) => acc + v), 4).as("head8_sum"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              col("embedding").cast("array<double>"), (a, b) => a * b),
            lit(0.0), (acc, v) => acc + v), 4).as("self_dot"))
    }),

    // Explicit ROWS frame: running sum per user (beyond-reference).
    "w9_running_sum" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .withColumn("running_value", round(sum(col("value")).over(w), 4))
        .select(col("event_id"), col("user_id"), col("running_value"))
    }),

    // Linear-regression aggregates (slope/intercept/R²) — one pass,
    // partial-aggregable moment sketches, per return flag.
    "agg_regr" -> ((spark, dir) => {
      Tables.lineitem(spark, dir)
        // regression moments need FINITE regressors on both axes (one
        // Inf price overflows DuckDB's VARPOP and NaNs Spark's slope)
        .where(finiteMeasure(col("l_extendedprice")) &&
          finiteMeasure(col("l_quantity")))
        .groupBy("l_returnflag")
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
    }),

    // Boolean/conditional aggregate family: count_if, bool_and/bool_or,
    // interpolated median — all map-side-combinable.
    "agg_bool_median" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .where(finiteMeasure(col("value")))
        .groupBy("event_type")
        .agg(
          count_if(col("value") > 50).as("n_gt50"),
          bool_and(col("value") >= 0).as("all_nonneg"),
          bool_or(col("value") > 99).as("any_gt99"),
          round(median(col("value")), 4).as("med_value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "a1_collect_list" ->
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS types_sorted,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "a3_weekly_monthly" ->
      """WITH wk AS (
        |  SELECT strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
        |    strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
        |    event_type, count(*) AS week_cnt
        |  FROM events GROUP BY 1, 2, 3
        |)
        |SELECT month, week, event_type, week_cnt,
        |  CAST(sum(week_cnt) OVER (PARTITION BY month, event_type) AS BIGINT) AS month_cnt
        |FROM wk""".stripMargin,

    "a4_distinct" -> "SELECT DISTINCT user_id, event_type FROM events",

    "a5_dedup_by_key" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "a6_argmax" ->
      """WITH totals AS (
        |  SELECT user_id, event_type, round(sum(value), 4) AS total
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, user_id AS top_user, total AS top_total FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY total DESC, user_id DESC) AS rn
        |  FROM totals
        |) WHERE rn = 1""".stripMargin,

    "a7_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "agg_stats" ->
      """SELECT event_type,
        |  round(corr(value, days), 4) AS corr_vd,
        |  round(covar_samp(value, days), 4) AS covar_vd,
        |  round(stddev_samp(value), 4) AS sd_value,
        |  round(avg(value), 4) AS avg_value
        |FROM (
        |  SELECT event_type, value,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS days
        |  FROM events WHERE isfinite(value)
        |) GROUP BY 1""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
        |  count(*) AS n, round(sum(value), 4) AS bucket_sum
        |FROM events WHERE isfinite(value) GROUP BY 1""".stripMargin,

    // Same gap-sessionization and time-respecting conditional mins.
    "events_session_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s
        |  FROM events WHERE ts IS NOT NULL
        |), g AS (
        |  SELECT user_id, event_id, event_type, s,
        |    CASE WHEN lag(s) OVER w IS NULL
        |              OR s - lag(s) OVER w > 1800 THEN 1 ELSE 0 END AS gap
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
        |), sess AS (
        |  SELECT user_id, event_type, s,
        |    sum(gap) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), pv AS (
        |  SELECT user_id, sid,
        |    min(CASE WHEN event_type = 'view' THEN s END) AS v
        |  FROM sess GROUP BY 1, 2
        |), pc AS (
        |  SELECT sess.user_id, sess.sid, min(pv.v) AS v,
        |    min(CASE WHEN event_type = 'click' AND s >= pv.v THEN s END) AS c
        |  FROM sess JOIN pv ON sess.user_id = pv.user_id AND sess.sid = pv.sid
        |  GROUP BY 1, 2
        |), pp AS (
        |  SELECT sess.user_id, sess.sid, min(pc.v) AS v, min(pc.c) AS c,
        |    min(CASE WHEN event_type = 'purchase' AND s >= pc.c THEN s END) AS p
        |  FROM sess JOIN pc ON sess.user_id = pc.user_id AND sess.sid = pc.sid
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view,
        |  CAST(sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view_click,
        |  CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_full_funnel,
        |  CAST((sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS BIGINT) AS view_ppm,
        |  CAST((sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS BIGINT) AS purchase_ppm
        |FROM pp""".stripMargin,

    // Same two-pass group-partitioned histogram median (2·cum >= n),
    // same 10·MAD flag.
    "events_anomaly_mad" ->
      """WITH v AS MATERIALIZED (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 10000) AS BIGINT) AS vq
        |  FROM events WHERE isfinite(value)
        |), med AS (
        |  SELECT g, min(CASE WHEN cum * 2 >= n THEN vq END) AS med FROM (
        |    SELECT g, vq,
        |      sum(count(*)) OVER (PARTITION BY g ORDER BY vq) AS cum,
        |      sum(count(*)) OVER (PARTITION BY g) AS n
        |    FROM v GROUP BY g, vq
        |  ) GROUP BY 1
        |), dev AS MATERIALIZED (
        |  SELECT v.g, vq, med, abs(vq - med) AS dv
        |  FROM v JOIN med ON v.g = med.g
        |), mad AS (
        |  SELECT g, min(CASE WHEN cum * 2 >= n THEN dv END) AS mad FROM (
        |    SELECT g, dv,
        |      sum(count(*)) OVER (PARTITION BY g ORDER BY dv) AS cum,
        |      sum(count(*)) OVER (PARTITION BY g) AS n
        |    FROM dev GROUP BY g, dv
        |  ) GROUP BY 1
        |)
        |SELECT dev.g AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(med) AS BIGINT) AS med_x1e4,
        |  CAST(min(mad.mad) AS BIGINT) AS mad_x1e4,
        |  CAST(sum(CASE WHEN dv > mad.mad * 10 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_anomalies
        |FROM dev JOIN mad ON dev.g = mad.g
        |GROUP BY 1""".stripMargin,

    // Same group-partitioned histogram cumsum, same 20·cum >= a
    // integer rank test, same clamp-then-integer-mean.
    "agg_winsorized" ->
      """WITH v AS MATERIALIZED (
        |  SELECT event_type AS g,
        |    CAST(floor(value * 10000) AS BIGINT) AS vq
        |  FROM events WHERE isfinite(value)
        |), cum AS (
        |  SELECT g, vq,
        |    sum(count(*)) OVER (PARTITION BY g ORDER BY vq) AS cum,
        |    sum(count(*)) OVER (PARTITION BY g) AS n
        |  FROM v GROUP BY g, vq
        |), cuts AS (
        |  SELECT g,
        |    min(CASE WHEN cum * 20 >= n THEN vq END) AS lo,
        |    min(CASE WHEN cum * 20 >= n * 19 THEN vq END) AS hi
        |  FROM cum GROUP BY 1
        |)
        |SELECT v.g AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(lo) AS BIGINT) AS lo_x1e4,
        |  CAST(min(hi) AS BIGINT) AS hi_x1e4,
        |  CAST(sum(vq) // count(*) AS BIGINT) AS mean_x1e4,
        |  CAST(sum(greatest(lo, least(hi, vq))) // count(*) AS BIGINT)
        |    AS wmean_x1e4
        |FROM v JOIN cuts ON v.g = cuts.g
        |GROUP BY 1""".stripMargin,

    // Same quantization, same ceil(k·n/8) rank cuts (window cumsum
    // over the value histogram), same value-vs-cut bucketing.
    "profile_equidepth" -> equidepthSql,

    "profile_columns" ->
      """WITH u AS (
        |  SELECT measure AS "column", v FROM (
        |    SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem
        |  ) UNPIVOT (v FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
        |  WHERE isfinite(v)
        |)
        |SELECT "column", count(*) AS n_rows, count(DISTINCT v) AS ndv,
        |  round(min(v), 4) AS vmin, round(max(v), 4) AS vmax,
        |  CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS vsum_x100,
        |  CAST((sum(CAST(round(v * 100) AS BIGINT)) * 100) // count(*) AS BIGINT)
        |    AS vmean_x1e4
        |FROM u GROUP BY 1""".stripMargin,

    "profile_columns_approx" ->
      """WITH u AS (
        |  SELECT measure AS "column", v FROM (
        |    SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem
        |  ) UNPIVOT (v FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
        |  WHERE isfinite(v)
        |)
        |SELECT "column", count(*) AS n_rows, count(DISTINCT v) AS ndv,
        |  true AS ndv_in_tolerance,
        |  round(min(v), 4) AS vmin, round(max(v), 4) AS vmax,
        |  CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS vsum_x100,
        |  CAST((sum(CAST(round(v * 100) AS BIGINT)) * 100) // count(*) AS BIGINT)
        |    AS vmean_x1e4
        |FROM u GROUP BY 1""".stripMargin,

    "agg_string_agg" ->
      """SELECT event_type,
        |  array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users_csv
        |FROM events GROUP BY 1""".stripMargin,

    "agg_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity), 4) AS qty,
        |    round(sum(l_discount), 4) AS disc,
        |    round(sum(l_tax), 4) AS tax
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l_returnflag, measure, val
        |FROM a UNPIVOT (val FOR measure IN (qty, disc, tax))""".stripMargin,

    "ts_resample_ffill" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    CAST(date_trunc('day', ts) AS DATE) AS day
        |  -- ts IS NOT NULL is result-identity here (a null day never
        |  -- matches a spine day; min/max skip nulls) — but it is
        |  -- REQUIRED for determinism: DuckDB 1.0's parallel window
        |  -- splits a NULL partition key across threads, emitting
        |  -- MULTIPLE rn=1 rows per null partition (measured: 812 true
        |  -- groups, 812-844 returned, varying run to run)
        |  FROM events WHERE ts IS NOT NULL
        |), l AS (
        |  SELECT user_id, day, value AS day_value FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, day ORDER BY event_id DESC) AS rn
        |    FROM e
        |  ) WHERE rn = 1
        |), b AS (
        |  SELECT user_id, min(day) AS dmin, max(day) AS dmax
        |  FROM e GROUP BY 1
        |), g AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b
        |)
        |, lv AS (
        |  SELECT user_id, day, day_value FROM l WHERE day_value IS NOT NULL
        |)
        |-- ASOF ffill, NO window: forward-fill IS an as-of lookup (the
        |-- latest observed day <= the spine day). DuckDB 1.0's parallel
        |-- windows returned UNSTABLE results over this (inf-bearing,
        |-- join-produced) input — 17/19 repeat runs differed; stable
        |-- only at SET threads=1. Both window forms (last_value IGNORE
        |-- NULLS and gaps-and-islands count+max) flapped; the ASOF plan
        |-- avoids the parallel window operator entirely.
        |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
        |  round(lv.day_value, 4) AS value_ffill,
        |  l.day_value IS NOT NULL AS observed
        |FROM g
        |ASOF LEFT JOIN lv ON g.user_id = lv.user_id AND g.day >= lv.day
        |LEFT JOIN l ON g.user_id = l.user_id AND g.day = l.day""".stripMargin,

    "funnel_stages" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON e.user_id = v.user_id AND e.ts >= v.v_ts
        |  WHERE e.event_type = 'click' GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON e.user_id = c.user_id AND e.ts >= c.c_ts
        |  WHERE e.event_type = 'purchase' GROUP BY 1
        |)
        |SELECT u.user_id,
        |  CAST(CASE WHEN p_ts IS NOT NULL THEN 3
        |            WHEN c_ts IS NOT NULL THEN 2
        |            WHEN v_ts IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN v ON u.user_id = v.user_id
        |LEFT JOIN c ON u.user_id = c.user_id
        |LEFT JOIN p ON u.user_id = p.user_id""".stripMargin,

    "a8_approx_agg" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  true AS ndv_in_tolerance,
        |  true AS p50_in_tolerance
        |FROM events
        |WHERE event_type IS NOT NULL AND isfinite(value)
        |GROUP BY 1""".stripMargin,

    "sketch_hll_intersection" ->
      """WITH m AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS ia,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ib
        |  FROM events GROUP BY 1
        |)
        |SELECT CAST(sum(ia) AS BIGINT) AS exact_a,
        |  CAST(sum(ib) AS BIGINT) AS exact_b,
        |  CAST(sum(ia * ib) AS BIGINT) AS exact_inter,
        |  true AS inter_in_tolerance
        |FROM m""".stripMargin,

    "sketch_hll_union" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  count(DISTINCT date_trunc('week', ts)) AS n_partials,
        |  true AS est_in_tolerance
        |FROM events
        |WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "sketch_quantiles" ->
      """SELECT event_type,
        |  count(DISTINCT date_trunc('week', ts)) AS n_partials,
        |  count(*) AS n_exact,
        |  true AS mass_exact,
        |  true AS r25_ok, true AS r50_ok, true AS r75_ok, true AS r95_ok,
        |  true AS monotone
        |FROM events
        |WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  AND isfinite(value)
        |GROUP BY 1""".stripMargin,

    "agg_percentile" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90
        |FROM events WHERE isfinite(value) GROUP BY 1""".stripMargin,

    "f9_arrays_zip" ->
      """SELECT length(word) AS wlen, count(*) AS n, count(DISTINCT word) AS n_words
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY 1""".stripMargin,

    "w1_rownum_topk" ->
      """SELECT user_id, rn, event_id, round(value, 4) AS value FROM (
        |  SELECT user_id, event_id, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events
        |) WHERE rn <= 2""".stripMargin,

    "w2_first_ignorenulls" ->
      """SELECT user_id, round(maybe_val, 4) AS last_good_val FROM (
        |  -- the engine's first(ignoreNulls) SKIPS null values: the
        |  -- candidate set is rows with a non-null value that are not
        |  -- 'error'-typed (null-TYPED rows stay candidates — the
        |  -- engine's === 'error' is false for null). rn=1 over only
        |  -- those rows is the exact mirror; the old <> 'error' form
        |  -- dropped null-typed rows and kept null-valued firsts.
        |  SELECT user_id, value AS maybe_val,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE event_type IS DISTINCT FROM 'error' AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |) WHERE rn = 1""".stripMargin,

    "w3_lag_changes" ->
      """SELECT user_id, CAST(sum(changed) AS BIGINT) AS n_changes FROM (
        |  SELECT user_id,
        |    CASE WHEN lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS DISTINCT FROM event_type
        |    THEN 1 ELSE 0 END AS changed
        |  FROM events WHERE ts IS NOT NULL
        |) GROUP BY 1""".stripMargin,

    "diag_key_skew" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS c FROM events GROUP BY 1
        |), t AS (
        |  SELECT count(*) AS n FROM events
        |), r AS (
        |  SELECT user_id, c,
        |    row_number() OVER (ORDER BY c DESC, user_id) AS rank,
        |    sum(c) OVER (
        |      ORDER BY c DESC, user_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c
        |)
        |SELECT CAST(rank AS BIGINT) AS rank, user_id, c,
        |  CAST((c::HUGEINT * 1000000) // (SELECT n FROM t) AS BIGINT) AS share_ppm,
        |  CAST((cum::HUGEINT * 1000000) // (SELECT n FROM t) AS BIGINT) AS cum_ppm
        |FROM r WHERE rank <= 10""".stripMargin,

    "events_rare_transitions" ->
      """WITH t AS (
        |  SELECT user_id,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev_type,
        |    event_type
        |  FROM events WHERE ts IS NOT NULL
        |), tr AS (
        |  SELECT user_id, prev_type, event_type FROM t
        |  WHERE prev_type IS NOT NULL
        |), c AS (
        |  SELECT prev_type, event_type, count(*) AS n
        |  FROM tr GROUP BY 1, 2
        |), m AS (
        |  SELECT prev_type, event_type,
        |    (n * 10000) // sum(n) OVER (PARTITION BY prev_type) AS p
        |  FROM c
        |)
        |SELECT tr.user_id, count(*) AS n_transitions,
        |  CAST(sum(CASE WHEN m.p < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  CAST(min(m.p) AS BIGINT) AS min_prob_x1e4
        |FROM tr JOIN m USING (prev_type, event_type)
        |GROUP BY 1""".stripMargin,

    // Same (s, event_id)-ordered fold: list_reduce with a prepended 0
    // initial accumulator equals Spark's aggregate(…, 0, …).
    "ts_ewma" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list(CAST(floor(value * 10000) AS BIGINT)
        |        ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT),
        |                 event_id)),
        |    (acc, v) -> (acc + v) // 2) AS BIGINT) AS ewma_x1e4
        |FROM events WHERE ts IS NOT NULL AND isfinite(value)
        |GROUP BY 1""".stripMargin,

    // Same (s, event_id)-ordered preceding-frame last-touch window.
    "events_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s
        |  FROM events WHERE ts IS NOT NULL
        |), t AS (
        |  SELECT user_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |                    THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY s, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM ev
        |), conv AS (
        |  SELECT coalesce(touch, 'none') AS touch_type,
        |    CAST(count(*) AS BIGINT) AS n_purchases
        |  FROM t WHERE event_type = 'purchase' GROUP BY 1
        |)
        |SELECT touch_type, n_purchases,
        |  CAST(n_purchases::HUGEINT * 1000000 // sum(n_purchases) OVER ()
        |    AS BIGINT) AS share_ppm
        |FROM conv""".stripMargin,

    // Same (s, event_id)-ordered two-level gaps-and-islands: prev-max
    // end over the preceding frame, island = running sum of the
    // new-island flag, then per-island spans rolled up per user.
    "events_interval_coalesce" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 300 AS e
        |  FROM events WHERE ts IS NOT NULL
        |), m AS (
        |  SELECT user_id, event_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv
        |), f AS (
        |  SELECT user_id, event_id, s, e,
        |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS new_isl
        |  FROM m
        |), isl AS (
        |  SELECT user_id, s, e,
        |    sum(new_isl) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f
        |), g AS (
        |  SELECT user_id, island, min(s) AS cs, max(e) AS ce,
        |    count(*) AS n_ev
        |  FROM isl GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(ce - cs) AS BIGINT) AS covered_s,
        |  CAST(max(n_ev) AS BIGINT) AS max_interval_events
        |FROM g GROUP BY 1""".stripMargin,

    "events_retention_cohorts" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY 1
        |), sizes AS (
        |  SELECT cohort_wk, count(*) AS cohort_size FROM cohort GROUP BY 1
        |), m AS (
        |  SELECT c.cohort_wk,
        |    date_diff('day', c.cohort_wk, a.wk) // 7 AS week_n,
        |    count(DISTINCT a.user_id) AS n_active
        |  FROM act a JOIN cohort c USING (user_id)
        |  GROUP BY 1, 2
        |)
        |SELECT strftime(m.cohort_wk, '%Y-%m-%d') AS cohort,
        |  CAST(week_n AS BIGINT) AS week_n, n_active, s.cohort_size,
        |  CAST((n_active * 10000) // s.cohort_size AS BIGINT)
        |    AS retention_x1e4
        |FROM m JOIN sizes s USING (cohort_wk)""".stripMargin,

    "events_markov_transitions" ->
      """WITH t AS (
        |  SELECT lag(event_type) OVER (
        |      PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev_type,
        |    event_type
        |  FROM events WHERE ts IS NOT NULL
        |), c AS (
        |  SELECT prev_type, event_type, count(*) AS n
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
        |), r AS (
        |  SELECT prev_type, sum(n) AS row_total FROM c GROUP BY 1
        |)
        |SELECT c.prev_type, c.event_type, c.n,
        |  CAST(r.row_total AS BIGINT) AS row_total,
        |  CAST((c.n * 10000) // r.row_total AS BIGINT) AS prob_x1e4
        |FROM c JOIN r USING (prev_type)""".stripMargin,

    "w7_first_event" ->
      """SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d') AS reg_date,
        |  count(*) AS n_events
        |FROM events WHERE ts IS NOT NULL GROUP BY 1""".stripMargin,

    "w8_rank_lead" ->
      """SELECT event_type, rnk, drnk, event_id, next_event FROM (
        |  SELECT event_type, event_id,
        |    rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk,
        |    lead(event_id, 1) OVER w AS next_event
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
        |) WHERE rnk <= 5""".stripMargin,

    "w11_distribution" ->
      """SELECT event_id, event_type,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cume,
        |  nth_value(event_id, 3) OVER (
        |    PARTITION BY event_type ORDER BY value ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_id
        |FROM events WHERE isfinite(value)
        |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)""".stripMargin,

    "w10_range_frame" ->
      """SELECT user_id, round(max(rolling_1h), 4) AS max_rolling_1h FROM (
        |  SELECT user_id,
        |    round(sum(value) OVER (
        |      PARTITION BY user_id ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS rolling_1h
        |  FROM events WHERE ts IS NOT NULL
        |) GROUP BY 1""".stripMargin,

    "f_array_family" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        |  round(list_sum(embedding[1:8]::DOUBLE[]), 4) AS head8_sum,
        |  round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 4) AS self_dot
        |FROM embeddings""".stripMargin,

    "w9_running_sum" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
        |FROM events WHERE ts IS NOT NULL""".stripMargin,

    "agg_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem
        |WHERE isfinite(l_extendedprice) AND isfinite(l_quantity)
        |GROUP BY 1""".stripMargin,

    "agg_bool_median" ->
      """SELECT event_type,
        |  CAST(count_if(value > 50) AS BIGINT) AS n_gt50,
        |  bool_and(value >= 0) AS all_nonneg,
        |  bool_or(value > 99) AS any_gt99,
        |  round(median(value), 4) AS med_value
        |FROM events WHERE isfinite(value) GROUP BY 1""".stripMargin
  )

  /** Generated twin of profile_equidepth: 7 exact rank cuts at
    * ceil(k·n/8) via a window cumsum over the value histogram, then
    * value-vs-cut bucketing with the hi edge attached per bucket.
    */
  private lazy val equidepthSql: String = {
    val b = 8
    val cutDefs = (0 until b - 1).map { i =>
      s"""min(CASE WHEN cum >= (SELECT (${i + 1} * n + ${b - 1}) // $b FROM n)
         |        THEN vq END) AS c$i""".stripMargin
    }.mkString(",\n")
    val bucketCase = (0 until b - 1)
      .map(i => s"WHEN vq <= c$i THEN $i").mkString(" ")
    val hiCase = (0 until b - 1)
      .map(i => s"WHEN $i THEN (SELECT c$i FROM cuts)").mkString(" ")
    s"""WITH v AS MATERIALIZED (
       |  SELECT CAST(floor(value * 10000) AS BIGINT) AS vq
       |  FROM events WHERE isfinite(value)
       |), n AS (
       |  SELECT count(*) AS n FROM v
       |), cum AS (
       |  SELECT vq, sum(count(*)) OVER (ORDER BY vq) AS cum
       |  FROM v GROUP BY vq
       |), cuts AS MATERIALIZED (
       |  SELECT $cutDefs
       |  FROM cum
       |)
       |SELECT CAST(bucket AS INT) AS bucket,
       |  CAST(CASE bucket $hiCase ELSE NULL END AS BIGINT) AS hi_x1e4,
       |  CAST(n_rows AS BIGINT) AS n_rows
       |FROM (
       |  SELECT bucket, count(*) AS n_rows FROM (
       |    SELECT CASE $bucketCase ELSE ${b - 1} END AS bucket
       |    FROM v, cuts
       |  ) GROUP BY bucket
       |)""".stripMargin
  }
}
