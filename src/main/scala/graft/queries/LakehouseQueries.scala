package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Lakehouse

/** Table-maintenance semantics over the fixture star schema: keyed
  * MERGE-upsert of a dimension snapshot and SCD Type-2 historization
  * of an attribute change log (graft.operators.Lakehouse).
  */
object LakehouseQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Per-customer order rollup for one date half-space — the
    * "dimension snapshot" both lakehouse queries merge/compare.
    */
  private def custSnapshot(spark: SparkSession, dir: String, before: Boolean): DataFrame = {
    val cut = lit("1996-01-01").cast("date")
    val o = Tables.orders(spark, dir)
    val side = if (before) col("o_orderdate").cast("date") < cut
               else col("o_orderdate").cast("date") >= cut
    o.where(side)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("total_spend"))
  }

  val queries: Map[String, Q] = Map(
    // MERGE INTO semantics: the post-cutoff snapshot upserts into the
    // pre-cutoff snapshot; source columns win, unmatched rows tagged.
    "merge_upsert" -> ((spark, dir) => {
      val target = custSnapshot(spark, dir, before = true)
      val source = custSnapshot(spark, dir, before = false)
      Lakehouse.mergeUpsert(target, source, Seq("custkey"))
    }),

    // SCD Type-2: historize each user's value-band changes from the
    // event log — one row per band run with [from, to) validity.
    "scd2_history" -> ((spark, dir) => {
      val band = when(col("value") > 100, lit("high"))
        .when(col("value") > 50, lit("mid"))
        .otherwise(lit("low"))
      Lakehouse.scd2(Tables.events(spark, dir).where(col("ts").isNotNull),
          "user_id", "ts", "event_id", band)
        .select(col("user_id"), col("attr_value").as("band"),
          unix_timestamp(col("valid_from")).as("from_s"),
          unix_timestamp(col("valid_to")).as("to_s"),
          col("is_current"))
    }),

    // Point-in-time (as-of) lookup against the SCD2 dimension: each
    // order reads the customer's band version valid AT ORDER TIME —
    // the canonical versioned-dimension join. Because SCD2 versions
    // are CONTIGUOUS per key (valid_to = next valid_from), the
    // interval predicate valid_from <= t < valid_to reduces to a
    // backward as-of join on valid_from, which the engine plans as
    // the union+carry single-shuffle AsofJoin — no range join, no
    // per-version explosion. Orders before a customer's first version
    // (or for users with no events) surface as 'none'.
    "scd2_point_in_time" -> ((spark, dir) => {
      val band = when(col("value") > 100, lit("high"))
        .when(col("value") > 50, lit("mid"))
        .otherwise(lit("low"))
      val versions = Lakehouse.scd2(
        Tables.events(spark, dir).where(col("ts").isNotNull),
        "user_id", "ts", "event_id", band)
        .select(col("user_id"), col("valid_from").as("v_ts"),
          col("attr_value").as("band"))
      val probes = Tables.orders(spark, dir)
        // as-of probes need a probe time (the j10 DuckDB-ASOF-quirk
        // rule): an undated order cannot read a versioned dimension
        .where(col("o_orderdate").isNotNull)
        .select(
          col("o_orderkey"), col("o_custkey").as("user_id"),
          col("o_orderdate").cast("timestamp").as("o_ts"))
      graft.operators.AsofJoin.backward(probes, versions,
        key = "user_id", leftTime = "o_ts", rightTime = "v_ts",
        payloadCols = Seq("band"))
        .select(col("o_orderkey"), col("user_id"),
          coalesce(col("band"), lit("none")).as("band_at_order"))
    }),

    // Snapshot diff: reconcile two corpus versions — a nightly
    // re-crawl (rows dropped, rows added, lang/n_chars mutated on
    // deterministic id classes) against yesterday's lake. Emits only
    // the delta with per-row changed-column lists.
    "lake_diff" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val old = docs.where(col("doc_id") % 10 =!= 3)
      val neu = docs.where(col("doc_id") % 7 =!= 2)
        .withColumn("lang",
          when(col("doc_id") % 5 === 0, upper(col("lang"))).otherwise(col("lang")))
        .withColumn("n_chars",
          when(col("doc_id") % 11 === 0, col("n_chars") + 10).otherwise(col("n_chars")))
      Lakehouse.snapshotDiff(old, neu, Seq("doc_id"),
        Seq("lang", "n_chars", "source", "text"))
    }),

    // Change-data-feed between the same two corpus versions lake_diff
    // reconciles: inserts/deletes emit one row, updates emit BOTH
    // images (the retract/apply contract incremental consumers need).
    "merge_cdf" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val old = docs.where(col("doc_id") % 10 =!= 3)
      val neu = docs.where(col("doc_id") % 7 =!= 2)
        .withColumn("lang",
          when(col("doc_id") % 5 === 0, upper(col("lang"))).otherwise(col("lang")))
        .withColumn("n_chars",
          when(col("doc_id") % 11 === 0, col("n_chars") + 10).otherwise(col("n_chars")))
      Lakehouse.changeDataFeed(old, neu, Seq("doc_id"), Seq("lang", "n_chars"))
        .withColumnRenamed("_change_type", "change_type")
    }),

    // Incremental aggregate maintenance — the CDF consumer contract:
    // a per-lang (count, sum_chars) materialized view is maintained by
    // RETRACT/APPLY over the change feed (preimage subtracts, postimage
    // adds, moves across groups handled by sign), never rescanning the
    // corpus. The oracle recomputes the view directly from the NEW
    // snapshot — equality proves the incremental path is exact.
    // Scale: the base aggregate is the view already at rest; the
    // update touches delta-sized data only.
    "cdf_incremental_agg" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val old = docs.where(col("doc_id") % 10 =!= 3)
      val neu = docs.where(col("doc_id") % 7 =!= 2)
        .withColumn("lang",
          when(col("doc_id") % 5 === 0, upper(col("lang"))).otherwise(col("lang")))
        .withColumn("n_chars",
          when(col("doc_id") % 11 === 0, col("n_chars") + 10).otherwise(col("n_chars")))
      val base = old.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val sign = when(col("change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L)
      val delta = Lakehouse.changeDataFeed(old, neu, Seq("doc_id"), Seq("lang", "n_chars"))
        .withColumnRenamed("_change_type", "change_type")
        .groupBy("lang")
        .agg(sum(sign).as("dn"), sum(sign * col("n_chars")).as("dchars"))
      // null-SAFE reconciliation join: a change feed carries null
      // dimension values, and a plain equi-join on lang would split
      // the null group into two output rows (base-only + delta-only)
      // instead of reconciling them — the invariant base+delta = new
      // must hold for the null bucket too
      base.alias("b").join(delta.alias("d"),
          col("b.lang") <=> col("d.lang"), "full_outer")
        .select(coalesce(col("b.lang"), col("d.lang")).as("lang"),
          (coalesce(col("n_docs"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_docs"),
          (coalesce(col("sum_chars"), lit(0L)) + coalesce(col("dchars"), lit(0L))).as("sum_chars"))
        .where(col("n_docs") > 0)
    }),

    // Time-travel read: base snapshot + two delta versions (full-row
    // upserts and tombstones on deterministic id classes) replayed
    // AS OF version 2 in ONE per-key latest-version selection — the
    // MVCC read path of every lake table format, without iterating
    // the log.
    "lake_time_travel" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val v1 = docs.where(col("doc_id") % 5 === 0 || col("doc_id") % 17 === 0)
        .withColumn("n_chars", col("n_chars") + 100)
        .withColumn("deleted", col("doc_id") % 17 === 0)
      val v2 = docs.where(col("doc_id") % 7 === 0 || col("doc_id") % 13 === 0)
        .withColumn("lang", upper(col("lang")))
        .withColumn("deleted", col("doc_id") % 13 === 0)
      Lakehouse.timeTravel(docs, Seq(1L -> v1, 2L -> v2), Seq("doc_id"),
        asOfVersion = 2L)
    }),

    // Distribution-drift monitor between the same two corpus versions
    // the CDF family reconciles — the check a curation pipeline runs
    // before accepting a re-crawl: population stability index of the
    // n_chars distribution over FIXED bucket edges (drift math over
    // moving quantile buckets self-launders; fixed edges don't), with
    // add-one smoothing so empty buckets stay finite. Per-bucket
    // counts are exact integers; PSI is one 13-term double sum.
    // Scale: two bucket-count aggregations (map-side combinable) and
    // a 13-row join — nothing corpus-sized past the first pass.
    "drift_psi" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val old = docs.where(col("doc_id") % 10 =!= 3)
      val neu = docs.where(col("doc_id") % 7 =!= 2)
        .withColumn("n_chars",
          when(col("doc_id") % 11 === 0, col("n_chars") + 10).otherwise(col("n_chars")))
      def bucket(c: Column) = least(floor(c / 50), lit(12L)).cast("long")
      def counts(df: DataFrame, out: String) =
        df.groupBy(bucket(col("n_chars")).as("b")).agg(count(lit(1)).as(out))
      val nb = 13.0
      val j = counts(old, "n_o").join(counts(neu, "n_n"), Seq("b"), "full_outer")
        .na.fill(0L, Seq("n_o", "n_n"))
      val tot = j.agg(sum(col("n_o")).as("t_o"), sum(col("n_n")).as("t_n"))
      j.crossJoin(tot)
        .select(((col("n_o") + 1) / (col("t_o") + nb)).as("p"),
          ((col("n_n") + 1) / (col("t_n") + nb)).as("q"),
          col("t_o"), col("t_n"))
        .agg(round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 4).as("psi"),
          first(col("t_o")).as("total_old"), first(col("t_n")).as("total_new"))
        .select(lit("n_chars").as("metric"), col("psi"),
          (col("psi") > 0.25).as("drifted"), col("total_old"), col("total_new"))
    }),

    // Three-way branch merge: two curation branches edited the same
    // base snapshot — A re-scores some docs and deletes a slice, B
    // re-scores a different (overlapping) set and appends new docs.
    // The merge keeps single-sided changes, collapses identical
    // concurrent changes, and flags divergent ones (mod≠mod at
    // doc_id%77, mod-vs-del where %13-deletes meet %11-mods) with
    // both candidate images. Exact full-outer-join arithmetic.
    "lake_branch_merge" -> ((spark, dir) => {
      val base = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val aBr = base.where(col("doc_id") % 13 =!= 5)
        .withColumn("n_chars",
          when(col("doc_id") % 7 === 0, col("n_chars") + 5).otherwise(col("n_chars")))
      val bAdd = base.where(col("doc_id") % 17 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          col("lang"), (col("n_chars") + 1).as("n_chars"))
      val bBr = base
        // B independently deletes the EVEN half of A's deleted slice —
        // identical concurrent deletes must merge cleanly ('both')
        .where(col("doc_id") % 13 =!= 5 || col("doc_id") % 2 =!= 0)
        .withColumn("n_chars",
          when(col("doc_id") % 11 === 0, col("n_chars") + 9).otherwise(col("n_chars")))
        .unionByName(bAdd)
      Lakehouse.threeWayMerge(base, aBr, bBr,
        Seq("doc_id"), Seq("lang", "n_chars"))
    }),

    // Privacy release gate: k-anonymity + l-diversity audit over the
    // customer table's quasi-identifiers (nation × market segment ×
    // a generalized balance band), sensitive value = exact balance.
    // One map-side-combinable aggregation; class count bounded by the
    // generalized QI space. Complements content-level text_pii_redact.
    "privacy_k_anonymity" -> ((spark, dir) => {
      import graft.operators.Privacy
      Privacy.kAnonymityAudit(Tables.customer(spark, dir),
        quasi = Seq(col("c_nationkey"),
          col("c_mktsegment"),
          // a non-finite balance has no band: floor() would silently
          // saturate it into band 0 while the oracle's CAST aborts —
          // both sides generalize it to a NULL band instead
          when(!isnan(col("c_acctbal")) &&
              abs(col("c_acctbal")) =!= Double.PositiveInfinity,
            floor(col("c_acctbal") / 2000)).cast("long").as("bal_band")),
        sensitive = col("c_acctbal"), k = 5, l = 3)
    }),

    // Entropy l-diversity over the same (priority × year) classes:
    // the stricter diversity form — Shannon entropy of the status
    // distribution >= ln(l), so a dominant value can't hide behind
    // rare ones. DSIR-pattern quantized logs (per-term BIGINT floor),
    // division-free verdict.
    "privacy_entropy_l" -> ((spark, dir) => {
      import graft.operators.Privacy
      Privacy.entropyLDiversityAudit(Tables.orders(spark, dir),
        quasi = Seq(col("o_orderpriority").as("qi_priority"),
          year(col("o_orderdate")).cast("long").as("qi_year")),
        sensitive = col("o_orderstatus"), l = 2)
    }),

    // t-closeness release gate over the orders table: per
    // (order priority × order year) class, the total-variation
    // distance between the class's status distribution and the global
    // one, exact ppm fixed point — the distributional companion to
    // the k/l audit above (a class can be large AND diverse yet still
    // leak through a skewed sensitive distribution). Absent values
    // contribute algebraically; no class × domain grid.
    "privacy_t_closeness" -> ((spark, dir) => {
      import graft.operators.Privacy
      Privacy.tClosenessAudit(Tables.orders(spark, dir),
        quasi = Seq(col("o_orderpriority").as("qi_priority"),
          year(col("o_orderdate")).cast("long").as("qi_year")),
        sensitive = col("o_orderstatus"), tPpm = 60000L)
    }),

    // Expectation-suite validation (the Deequ/dbt-test shape): the
    // publish gate on the orders table — completeness, domain, bounds
    // (one deliberately failing so the report is non-trivial), key
    // uniqueness, and referential integrity against customer. Row
    // checks share ONE aggregation pass.
    "quality_expectations" -> ((spark, dir) => {
      import graft.operators.Expectations
      import graft.operators.Expectations.RowCheck
      val orders = Tables.orders(spark, dir)
      Expectations.suite(
        Expectations.rowChecks(orders, Seq(
          RowCheck("complete_custkey", col("o_custkey").isNull),
          RowCheck("status_domain", !col("o_orderstatus").isin("O", "F", "P")),
          RowCheck("price_positive", col("o_totalprice") <= 0),
          RowCheck("price_le_250k", col("o_totalprice") > 250000))),
        Expectations.uniqueness(orders, "unique_orderkey", Seq("o_orderkey")),
        Expectations.referential(orders, "ri_custkey", "o_custkey",
          Tables.customer(spark, dir), "c_custkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "merge_upsert" ->
      """WITH t AS (
        |  SELECT o_custkey AS custkey, count(*) AS n_orders,
        |    round(sum(o_totalprice), 4) AS total_spend
        |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1996-01-01'
        |  GROUP BY 1
        |), s AS (
        |  SELECT o_custkey AS custkey, count(*) AS n_orders,
        |    round(sum(o_totalprice), 4) AS total_spend
        |  FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  GROUP BY 1
        |)
        |SELECT coalesce(s.custkey, t.custkey) AS custkey,
        |  coalesce(s.n_orders, t.n_orders) AS n_orders,
        |  coalesce(s.total_spend, t.total_spend) AS total_spend,
        |  CASE WHEN t.custkey IS NULL THEN 'insert'
        |       WHEN s.custkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS merge_action
        |FROM t FULL OUTER JOIN s ON t.custkey = s.custkey""".stripMargin,

    "scd2_history" ->
      """WITH b AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN value > 100 THEN 'high'
        |         WHEN value > 50 THEN 'mid' ELSE 'low' END AS band
        |  FROM events WHERE ts IS NOT NULL
        |), c AS (
        |  SELECT user_id, event_id, ts, band,
        |    lag(band) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM b
        |), ch AS (
        |  SELECT user_id, event_id, ts, band FROM c
        |  WHERE prev IS NULL OR band <> prev
        |)
        |SELECT user_id, band,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS from_s,
        |  CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS to_s,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "scd2_point_in_time" ->
      """WITH b AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN value > 100 THEN 'high'
        |         WHEN value > 50 THEN 'mid' ELSE 'low' END AS band
        |  FROM events WHERE ts IS NOT NULL
        |), c AS (
        |  SELECT user_id, event_id, ts, band,
        |    lag(band) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM b
        |), ch AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts, band FROM c
        |  WHERE prev IS NULL OR band <> prev
        |)
        |SELECT o_orderkey, o.o_custkey AS user_id,
        |  coalesce(ch.band, 'none') AS band_at_order
        |FROM orders o ASOF LEFT JOIN ch
        |  ON o.o_custkey = ch.user_id
        |  AND CAST(o.o_orderdate AS TIMESTAMP) >= ch.v_ts
        |WHERE o.o_orderdate IS NOT NULL""".stripMargin,

    "lake_diff" ->
      """WITH o AS (
        |  SELECT * FROM documents WHERE doc_id % 10 <> 3
        |), n AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN upper(lang) ELSE lang END AS lang,
        |    source,
        |    CASE WHEN doc_id % 11 = 0 THEN n_chars + 10 ELSE n_chars END AS n_chars,
        |    text
        |  FROM documents WHERE doc_id % 7 <> 2
        |), j AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    o.doc_id IS NULL AS added, n.doc_id IS NULL AS removed,
        |    concat_ws(',',
        |      CASE WHEN o.lang IS DISTINCT FROM n.lang THEN 'lang' END,
        |      CASE WHEN o.n_chars IS DISTINCT FROM n.n_chars THEN 'n_chars' END,
        |      CASE WHEN o.source IS DISTINCT FROM n.source THEN 'source' END,
        |      CASE WHEN o.text IS DISTINCT FROM n.text THEN 'text' END) AS mask
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |)
        |SELECT doc_id,
        |  CASE WHEN added THEN 'added' WHEN removed THEN 'removed'
        |       ELSE 'changed' END AS status,
        |  CASE WHEN NOT added AND NOT removed THEN mask ELSE '' END
        |    AS changed_cols
        |FROM j WHERE added OR removed OR mask <> ''""".stripMargin,

    "merge_cdf" ->
      """WITH o AS (
        |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 10 <> 3
        |), n AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN upper(lang) ELSE lang END AS lang,
        |    CASE WHEN doc_id % 11 = 0 THEN n_chars + 10 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 7 <> 2
        |), j AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    o.doc_id IS NOT NULL AS o_p, n.doc_id IS NOT NULL AS n_p,
        |    o.lang AS o_lang, o.n_chars AS o_nc,
        |    n.lang AS n_lang, n.n_chars AS n_nc,
        |    (o.lang IS DISTINCT FROM n.lang
        |      OR o.n_chars IS DISTINCT FROM n.n_chars) AS chg
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |)
        |SELECT doc_id, 'insert' AS change_type, n_lang AS lang, n_nc AS n_chars
        |  FROM j WHERE NOT o_p
        |UNION ALL SELECT doc_id, 'delete', o_lang, o_nc FROM j WHERE NOT n_p
        |UNION ALL SELECT doc_id, 'update_preimage', o_lang, o_nc
        |  FROM j WHERE o_p AND n_p AND chg
        |UNION ALL SELECT doc_id, 'update_postimage', n_lang, n_nc
        |  FROM j WHERE o_p AND n_p AND chg""".stripMargin,

    "drift_psi" ->
      """WITH o AS (
        |  SELECT least(CAST(floor(n_chars / 50) AS BIGINT), 12) AS b,
        |    count(*) AS n_o
        |  FROM documents WHERE doc_id % 10 <> 3 GROUP BY 1
        |), n AS (
        |  SELECT least(CAST(floor(n_chars / 50) AS BIGINT), 12) AS b,
        |    count(*) AS n_n
        |  FROM (
        |    SELECT CASE WHEN doc_id % 11 = 0 THEN n_chars + 10
        |      ELSE n_chars END AS n_chars
        |    FROM documents WHERE doc_id % 7 <> 2
        |  ) GROUP BY 1
        |), j AS (
        |  SELECT coalesce(o.b, n.b) AS b,
        |    coalesce(n_o, 0) AS n_o, coalesce(n_n, 0) AS n_n
        |  FROM o FULL OUTER JOIN n ON o.b = n.b
        |), t AS (
        |  SELECT sum(n_o) AS t_o, sum(n_n) AS t_n FROM j
        |), s AS (
        |  SELECT round(sum(
        |      ((n_o + 1) / (t_o + 13.0) - (n_n + 1) / (t_n + 13.0)) *
        |      ln(((n_o + 1) / (t_o + 13.0)) / ((n_n + 1) / (t_n + 13.0)))), 4)
        |    AS psi,
        |    CAST(first(t_o) AS BIGINT) AS total_old,
        |    CAST(first(t_n) AS BIGINT) AS total_new
        |  FROM j, t
        |)
        |SELECT 'n_chars' AS metric, psi, psi > 0.25 AS drifted,
        |  total_old, total_new
        |FROM s""".stripMargin,

    "cdf_incremental_agg" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN upper(lang) ELSE lang END AS lang,
        |    CASE WHEN doc_id % 11 = 0 THEN n_chars + 10 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 7 <> 2
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM n GROUP BY 1""".stripMargin,

    "lake_time_travel" ->
      """WITH v0 AS (
        |  SELECT doc_id, lang, n_chars, 0 AS v, FALSE AS del FROM documents
        |), v1 AS (
        |  SELECT doc_id, lang, n_chars + 100 AS n_chars, 1 AS v,
        |    doc_id % 17 = 0 AS del
        |  FROM documents WHERE doc_id % 5 = 0 OR doc_id % 17 = 0
        |), v2 AS (
        |  SELECT doc_id, upper(lang) AS lang, n_chars, 2 AS v,
        |    doc_id % 13 = 0 AS del
        |  FROM documents WHERE doc_id % 7 = 0 OR doc_id % 13 = 0
        |), u AS (
        |  SELECT * FROM v0 UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY v DESC) AS rn
        |  FROM u
        |)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn = 1 AND NOT del""".stripMargin,

    "lake_branch_merge" ->
      """WITH base AS (
        |  SELECT doc_id, lang, n_chars, true AS pb FROM documents
        |), a AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars,
        |    true AS pa
        |  FROM documents WHERE doc_id % 13 <> 5
        |), b AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 11 = 0 THEN n_chars + 9 ELSE n_chars END AS n_chars,
        |    true AS p2
        |  FROM documents WHERE doc_id % 13 <> 5 OR doc_id % 2 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, lang, n_chars + 1, true FROM documents
        |  WHERE doc_id % 17 = 0
        |), j AS (
        |  SELECT doc_id,
        |    base.lang AS bl, base.n_chars AS bn, pb,
        |    a.lang AS al, a.n_chars AS an, pa,
        |    b.lang AS l2, b.n_chars AS n2, p2
        |  FROM base
        |  FULL JOIN a USING (doc_id)
        |  FULL JOIN b USING (doc_id)
        |), s AS (
        |  SELECT *,
        |    CASE WHEN pa IS NOT NULL AND pb IS NOT NULL
        |           AND al IS NOT DISTINCT FROM bl
        |           AND an IS NOT DISTINCT FROM bn THEN 'same'
        |      WHEN pa IS NOT NULL AND pb IS NOT NULL THEN 'mod'
        |      WHEN pa IS NOT NULL THEN 'add'
        |      WHEN pb IS NOT NULL THEN 'del'
        |      ELSE 'absent' END AS sa,
        |    CASE WHEN p2 IS NOT NULL AND pb IS NOT NULL
        |           AND l2 IS NOT DISTINCT FROM bl
        |           AND n2 IS NOT DISTINCT FROM bn THEN 'same'
        |      WHEN p2 IS NOT NULL AND pb IS NOT NULL THEN 'mod'
        |      WHEN p2 IS NOT NULL THEN 'add'
        |      WHEN pb IS NOT NULL THEN 'del'
        |      ELSE 'absent' END AS sb,
        |    (al IS NOT DISTINCT FROM l2
        |     AND an IS NOT DISTINCT FROM n2) AS eqab
        |  FROM j
        |), o AS (
        |  SELECT *,
        |    CASE WHEN sa IN ('same', 'absent') AND sb IN ('same', 'absent')
        |           THEN 'base'
        |      WHEN sb IN ('same', 'absent') THEN 'a'
        |      WHEN sa IN ('same', 'absent') THEN 'b'
        |      WHEN sa = sb AND eqab THEN 'both'
        |      ELSE 'conflict' END AS outcome
        |  FROM s
        |)
        |SELECT doc_id, outcome, outcome = 'conflict' AS is_conflict,
        |  CASE WHEN outcome = 'base' THEN pb IS NOT NULL
        |    WHEN outcome IN ('a', 'both') THEN pa IS NOT NULL
        |    WHEN outcome = 'b' THEN p2 IS NOT NULL
        |    ELSE false END AS merged_present,
        |  CASE WHEN outcome = 'base' THEN bl
        |    WHEN outcome IN ('a', 'both') THEN al
        |    WHEN outcome = 'b' THEN l2 END AS merged_lang,
        |  CASE WHEN outcome = 'base' THEN bn
        |    WHEN outcome IN ('a', 'both') THEN an
        |    WHEN outcome = 'b' THEN n2 END AS merged_n_chars,
        |  CASE WHEN outcome = 'conflict' THEN al END AS a_lang,
        |  CASE WHEN outcome = 'conflict' THEN an END AS a_n_chars,
        |  CASE WHEN outcome = 'conflict' THEN l2 END AS b_lang,
        |  CASE WHEN outcome = 'conflict' THEN n2 END AS b_n_chars
        |FROM o""".stripMargin,

    "privacy_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CASE WHEN isfinite(c_acctbal)
        |       THEN CAST(floor(c_acctbal / 2000) AS BIGINT) END AS bal_band,
        |  count(*) AS class_size,
        |  count(DISTINCT c_acctbal) AS l_diversity,
        |  count(*) >= 5 AS meets_k,
        |  count(DISTINCT c_acctbal) >= 3 AS meets_l
        |FROM customer
        |GROUP BY 1, 2, 3""".stripMargin,

    // Same quantized-log fold: per-(class, value) BIGINT term
    // ncv * floor(1e6 * ln(nc/ncv)), division-free verdict against
    // class_size * floor(1e6 * ln(2)) = 693147.
    "privacy_entropy_l" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS qi_priority,
        |         CAST(year(o_orderdate) AS BIGINT) AS qi_year,
        |         o_orderstatus AS s
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
        |), cs AS MATERIALIZED (
        |  SELECT qi_priority, qi_year, s, count(*) AS ncv
        |  FROM base GROUP BY 1, 2, 3
        |), cls AS (
        |  SELECT qi_priority, qi_year, CAST(sum(ncv) AS BIGINT) AS class_size
        |  FROM cs GROUP BY 1, 2
        |), e AS (
        |  -- snap-to-integer guard band, mirroring the engine kernel:
        |  -- a quantized log within 1e-7 of an integer becomes that
        |  -- integer (cross-engine ulp divergence can no longer flip
        |  -- the floor at the integer boundary)
        |  SELECT qi_priority, qi_year, class_size,
        |    CAST(sum(ncv * (CASE WHEN abs(y - round(y, 0)) <= 1e-7
        |      THEN CAST(round(y, 0) AS BIGINT)
        |      ELSE CAST(floor(y) AS BIGINT) END)) AS BIGINT) AS esum
        |  FROM (
        |    SELECT cs.qi_priority, cs.qi_year, cls.class_size, cs.ncv,
        |      1000000.0 * ln(cls.class_size::DOUBLE / cs.ncv) AS y
        |    FROM cs JOIN cls ON cs.qi_priority = cls.qi_priority
        |                    AND cs.qi_year = cls.qi_year
        |  )
        |  GROUP BY 1, 2, 3
        |)
        |SELECT qi_priority, qi_year, class_size,
        |  esum // class_size AS entropy_x1e6,
        |  esum >= class_size * 693147 AS meets_el
        |FROM e""".stripMargin,

    // Same exact integral TVD: per-class deviation over PRESENT
    // values plus the algebraic absent-value remainder, staged
    // HUGEINT products, one `//` at the end (mirrors the engine's
    // DECIMAL(38,0) div). Null statuses are their own category
    // (IS NOT DISTINCT FROM); null-QI rows excluded on both sides.
    "privacy_t_closeness" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS qi_priority,
        |         CAST(year(o_orderdate) AS BIGINT) AS qi_year,
        |         o_orderstatus AS s
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
        |), g AS MATERIALIZED (
        |  SELECT s, count(*) AS nv FROM base GROUP BY 1
        |), t AS (SELECT count(*) AS n FROM base
        |), cs AS MATERIALIZED (
        |  SELECT qi_priority, qi_year, s, count(*) AS ncv
        |  FROM base GROUP BY 1, 2, 3
        |), cls AS (
        |  SELECT qi_priority, qi_year, CAST(sum(ncv) AS BIGINT) AS class_size
        |  FROM cs GROUP BY 1, 2
        |), dev AS (
        |  SELECT cs.qi_priority, cs.qi_year, cls.class_size, t.n,
        |    sum(abs(cs.ncv::HUGEINT * t.n - g.nv::HUGEINT * cls.class_size))
        |      AS dev_present,
        |    sum(g.nv) AS nv_present
        |  FROM cs
        |  JOIN g ON cs.s IS NOT DISTINCT FROM g.s
        |  JOIN cls ON cs.qi_priority = cls.qi_priority
        |          AND cs.qi_year = cls.qi_year, t
        |  GROUP BY 1, 2, 3, 4
        |)
        |SELECT qi_priority, qi_year, class_size,
        |  CAST(((dev_present + class_size::HUGEINT * (n - nv_present))
        |          * 1000000)
        |       // (2::HUGEINT * class_size * n) AS BIGINT) AS tvd_ppm,
        |  CAST(((dev_present + class_size::HUGEINT * (n - nv_present))
        |          * 1000000)
        |       // (2::HUGEINT * class_size * n) AS BIGINT) <= 60000 AS meets_t
        |FROM dev""".stripMargin,

    "quality_expectations" ->
      """WITH rc AS (
        |  SELECT count(*) AS total,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS complete_custkey,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS status_domain,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS price_positive,
        |    CAST(sum(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS price_le_250k
        |  FROM orders
        |), u AS (
        |  SELECT count(*) AS total,
        |    count(*) - count(DISTINCT o_orderkey) AS viol FROM orders
        |), ri AS (
        |  SELECT count(*) AS total,
        |    CAST(sum(CASE WHEN o_custkey IS NOT NULL AND c.c_custkey IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS viol
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey
        |)
        |SELECT 'complete_custkey' AS check_name, complete_custkey AS violations,
        |  total, complete_custkey = 0 AS passed FROM rc
        |UNION ALL SELECT 'status_domain', status_domain, total,
        |  status_domain = 0 FROM rc
        |UNION ALL SELECT 'price_positive', price_positive, total,
        |  price_positive = 0 FROM rc
        |UNION ALL SELECT 'price_le_250k', price_le_250k, total,
        |  price_le_250k = 0 FROM rc
        |UNION ALL SELECT 'unique_orderkey', viol, total, viol = 0 FROM u
        |UNION ALL SELECT 'ri_custkey', viol, total, viol = 0 FROM ri""".stripMargin
  )
}
