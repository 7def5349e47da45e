package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Geo

/** Projection / filter / scalar-function / sort / set-op operators
  * (SURVEY §2.2 P1-P9, §2.6 O1, §2.7, §2.8 F1-F11), each with a DuckDB
  * oracle. Filters and projections are written scan-adjacent so Catalyst
  * pushes them into the parquet reader (PushedFilters / ReadSchema).
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S1/S2: filter-pushed scan — predicate + projection reach the reader.
    "s1_pruned_scan" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .where(col("event_type").isin("click", "view") &&
          col("ts") >= lit("2024-01-08").cast("timestamp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"))
    }),

    // P1: column select + rename (collector.py:311-318 analog).
    "p1_project_rename" -> ((spark, dir) => {
      Tables.customer(spark, dir)
        .select(
          col("c_custkey").as("user_id"),
          col("c_name").as("user_name"),
          col("c_mktsegment").as("segment"),
          round(col("c_acctbal"), 4).as("balance"))
    }),

    // P2: nested-struct flatten (mover.py:49-80 analog) — build a nested
    // struct, then project nested fields back to top level.
    "p2_nested_flatten" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(struct(
          col("user_id"),
          struct(col("event_type"), col("value")).as("inner")).as("evt"))
        .select(
          col("evt.user_id").as("user_id"),
          col("evt.inner.event_type").as("event_type"),
          round(col("evt.inner.value"), 4).as("value"))
    }),

    // P3: null-guard filters (collector.py:310 analog; nulls derived).
    "p3_null_filter" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .withColumn("maybe_type", nullif(col("event_type"), lit("click")))
        .where(col("maybe_type").isNotNull)
        .groupBy("maybe_type")
        .agg(count(lit(1)).as("n"))
    }),

    // P4: equality / inequality / range predicates (collector.py:247,491,...).
    "p4_predicates" -> ((spark, dir) => {
      Tables.lineitem(spark, dir)
        .where(col("l_quantity") > 30 && col("l_discount") <= 0.05 &&
          col("l_returnflag") =!= "A" && col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_partkey"), round(col("l_extendedprice"), 4).as("price"))
    }),

    // P5: CASE WHEN + coalesce (collector.py:319-325, 450-456 analog).
    "p5_case_when" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          when(col("value") > 100, lit("high"))
            .when(col("value") > 50, lit("mid"))
            .otherwise(lit("low")).as("value_band"),
          coalesce(nullif(col("event_type"), lit("error")), lit("ok")).as("type_or_ok"))
    }),

    // P7/P8: casts + literal columns (collector.py:1101-1107 analog).
    "p7_cast_lit" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(
          col("event_id").cast("int").as("event_id_i32"),
          // floor-then-cast, not bare cast: cast("long") truncates toward
          // zero while the oracle floors toward -inf; differs on negatives.
          // Non-finite guard: floor() silently saturates NaN/±Inf to
          // 0/±Long.MaxValue while the oracle's CAST aborts — both
          // sides emit NULL instead.
          when(!isnan(col("value")) &&
              abs(col("value")) =!= Double.PositiveInfinity,
            floor(col("value"))).cast("long").as("value_floor"),
          col("ts").cast("date").cast("string").as("event_date"),
          lit(1).as("batch_flag"))
    }),

    // P9: na.fill + na.drop (collector.py:516, 838 analog; nulls derived).
    "p9_na_fill_drop" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .withColumn("maybe_type", nullif(col("event_type"), lit("view")))
        .withColumn("maybe_val", when(col("value") < 20, lit(null).cast("double")).otherwise(col("value")))
        .na.fill(Map("maybe_type" -> "unknown"))
        .na.drop(Seq("maybe_val"))
        .groupBy("maybe_type")
        .agg(count(lit(1)).as("n"), round(sum("maybe_val"), 4).as("sum_val"))
    }),

    // F1/F2: haversine composed from built-ins (collector.py:120-133).
    "f1_haversine" -> ((spark, dir) => {
      Fixtures.geoEvents(spark, dir)
        .select(
          col("event_id"),
          round(Geo.haversineKm(col("lat"), col("lon"), lit(-33.87), lit(151.21)), 4)
            .as("km_to_sydney"))
    }),

    // F3/F5/F8: date/time kernel — trunc week/month, date_format, datediff.
    "f3_datetime" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
          date_format(date_trunc("month", col("ts")), "yyyy-MM-dd").as("month"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("days_since"))
    }),

    // F6/F7 + string kernel: split/substring/lower/length/regexp.
    "f7_string_ops" -> ((spark, dir) => {
      Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          split(col("text"), " ").getItem(0).as("first_word"),
          substring(col("text"), 1, 10).as("prefix10"),
          length(col("text")).cast("long").as("text_len"),
          upper(col("lang")).as("lang_uc"),
          // try_cast: regexp_extract yields '' when source carries no
          // digits, and ANSI CAST('' AS INT) aborts the job — a
          // dirty-source crash the fixture can't reach (oracle
          // mirrors with TRY_CAST → NULL on both engines)
          expr("try_cast(regexp_extract(source, '([0-9]+)', 1) AS INT)")
            .as("source_num"))
    }),

    // Extended string family: edit distance, padding, reverse, repeat.
    "f7b_string_family" -> ((spark, dir) => {
      Tables.documents(spark, dir)
        .withColumn("w1", split(col("text"), " ").getItem(0))
        .select(
          col("doc_id"),
          // char-level distance is only cross-engine checkable where
          // bytes == chars (DuckDB's levenshtein is byte-granular on
          // multi-byte input, Spark's char-granular) — the contract
          // reports NULL for multi-byte words on both engines
          when(octet_length(col("w1")) === length(col("w1")),
            levenshtein(col("w1"), lit("spark"))).cast("long").as("dist_spark"),
          lpad(col("w1"), 8, "_").as("padded"),
          reverse(col("w1")).as("reversed"),
          concat(col("w1"), lit("|"), col("w1")).as("doubled"))
    }),

    // JSON scalar functions over the events.props column.
    "f_json_extract" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          // try_cast: one non-numeric props value would abort the
          // whole scan under ANSI (the FriendRecsJob precedent)
          expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
    }),

    // Semi-structured VARIANT path (Spark 4): parse once, then typed
    // path extraction — the shredded-at-scan lakehouse pattern. A
    // missing path through try_variant_get yields NULL, not an error
    // — and try_parse_json extends the same contract to the PARSE:
    // one malformed props row must degrade to a NULL variant, not
    // abort the scan (parse_json is FAILFAST; found by
    // EventsDirtySpec). Oracle mirrors via json_valid.
    "f_variant" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .withColumn("vr", expr("try_parse_json(props)"))
        .select(
          col("event_id"),
          // extract as STRING then try_cast: a string/boolean/decimal
          // k nulls out IDENTICALLY on both engines (a direct
          // 'bigint' variant_get would truncate 12.5 to 12 where the
          // oracle's TRY_CAST('12.5') is NULL — silent divergence;
          // and the strict form throws INVALID_VARIANT_CAST)
          expr("try_cast(try_variant_get(vr, '$.k', 'string') AS bigint)")
            .as("k"),
          expr("try_variant_get(vr, '$.missing', 'bigint')").as("missing_k"))
    }),

    // F9/F10: explode over split words (generator), word frequencies.
    "f9_explode_words" -> ((spark, dir) => {
      Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .where(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("freq"))
    }),

    // F4: per-row timezone conversion (tz is a COLUMN, collector.py:361-366).
    "f4_from_utc_timestamp" -> ((spark, dir) => {
      Tables.events(spark, dir)
        // pmod, not %: a negative user_id would index ≤ 0 and ANSI
        // element_at aborts on index 0 (identity for positive ids)
        .withColumn("tz", element_at(
          array(lit("Australia/Sydney"), lit("Asia/Tokyo"), lit("UTC")),
          (pmod(col("user_id"), lit(3L)) + 1).cast("int")))
        .select(
          col("event_id"), col("tz"),
          date_format(from_utc_timestamp(col("ts"), col("tz")),
            "yyyy-MM-dd HH:mm:ss").as("local_time"))
    }),

    // F6+F7: strip fractional seconds via split, then parse
    // (mover.py:64-70's to_timestamp(split(s, "\\.")[0]) pattern).
    "f6_parse_timestamp" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .withColumn("raw", concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), lit(".123")))
        .select(
          col("event_id"),
          unix_timestamp(
            to_timestamp(split(col("raw"), "\\.").getItem(0), "yyyy-MM-dd HH:mm:ss"))
            .as("epoch_s"))
    }),

    // Map-type functions (beyond reference — SURVEY §1.2 notes the
    // reference uses no maps): construct, extract, keys, cardinality.
    "f_map_family" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .withColumn("m", map(
          lit("base"), col("value"),
          lit("double"), col("value") * 2))
        .select(
          col("event_id"),
          round(element_at(col("m"), "double"), 4).as("double_val"),
          size(col("m")).cast("long").as("n_keys"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys_sorted"))
    }),

    // Calendar arithmetic family: add_months (end-of-month clamping),
    // last_day, quarter, day-of-week name.
    "f_date_arith" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          date_format(add_months(col("ts").cast("date"), 1), "yyyy-MM-dd").as("plus_month"),
          date_format(last_day(col("ts").cast("date")), "yyyy-MM-dd").as("month_end"),
          quarter(col("ts")).cast("long").as("qtr"),
          date_format(col("ts"), "E").as("dow"))
    }),

    // Rollup aggregation (beyond-reference completeness).
    "agg_rollup" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .withColumn("band", when(col("value") > 100, "high").otherwise("low"))
        .rollup(col("event_type"), col("band"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("band"), lit("ALL")).as("band"),
          col("n"), col("total"))
    }),

    // Cube over two dimensions (beyond-reference).
    "agg_cube" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .withColumn("band", when(col("value") > 100, "high").otherwise("low"))
        .cube(col("event_type"), col("band"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("band"), lit("ALL")).as("band"),
          col("n"))
    }),

    // GROUPING SETS through the SQL surface (spark.sql entry point) —
    // the reference's wk/mnth datamart is a hand-rolled version of this
    // (SURVEY §3.3).
    "agg_grouping_sets" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .withColumn("week", date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
        .createOrReplaceTempView("ev_gs")
      spark.sql(
        """SELECT coalesce(event_type, 'ALL') AS event_type,
          |  coalesce(week, 'ALL') AS week,
          |  count(*) AS n, round(sum(value), 4) AS total
          |FROM ev_gs
          |GROUP BY GROUPING SETS ((event_type, week), (event_type), (week))""".stripMargin)
    }),

    // Pivot (wide conditional aggregation, beyond-reference).
    "agg_pivot" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(round(sum("value"), 4))
    }),

    // O1: global sort + deterministic top-k (orderBy + limit).
    "o1_sort_limit" -> ((spark, dir) => {
      Tables.orders(spark, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("total"))
    }),

    // Set operations (not in the reference — completeness): union/except.
    "set_union_except" -> ((spark, dir) => {
      val c = Tables.customer(spark, dir)
      val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val auto = c.where(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      val rich = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
      building.union(auto).except(rich).distinct()
        .select(col("c_custkey").as("custkey"))
    }),

    // Set intersection.
    "set_intersect" -> ((spark, dir) => {
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir)
      c.where(col("c_acctbal") > 0).select(col("c_custkey"))
        .intersect(o.select(col("o_custkey").as("c_custkey")))
        .select(col("c_custkey").as("custkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_pruned_scan" ->
      """SELECT event_type, count(*) AS n_events FROM events
        |WHERE event_type IN ('click','view') AND ts >= TIMESTAMP '2024-01-08'
        |GROUP BY 1""".stripMargin,

    "p1_project_rename" ->
      """SELECT c_custkey AS user_id, c_name AS user_name,
        |  c_mktsegment AS segment, round(c_acctbal, 4) AS balance
        |FROM customer""".stripMargin,

    "p2_nested_flatten" ->
      "SELECT user_id, event_type, round(value, 4) AS value FROM events",

    "p3_null_filter" ->
      """SELECT nullif(event_type, 'click') AS maybe_type, count(*) AS n
        |FROM events WHERE nullif(event_type, 'click') IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "p4_predicates" ->
      """SELECT l_orderkey, l_partkey, round(l_extendedprice, 4) AS price
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_discount <= 0.05
        |  AND l_returnflag <> 'A' AND l_linenumber = 1""".stripMargin,

    "p5_case_when" ->
      """SELECT event_id,
        |  CASE WHEN value > 100 THEN 'high' WHEN value > 50 THEN 'mid' ELSE 'low' END AS value_band,
        |  coalesce(nullif(event_type, 'error'), 'ok') AS type_or_ok
        |FROM events""".stripMargin,

    "p7_cast_lit" ->
      """SELECT CAST(event_id AS INTEGER) AS event_id_i32,
        |  CASE WHEN isfinite(value) THEN CAST(floor(value) AS BIGINT)
        |       END AS value_floor,
        |  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
        |  1 AS batch_flag
        |FROM events""".stripMargin,

    "p9_na_fill_drop" ->
      """SELECT coalesce(nullif(event_type, 'view'), 'unknown') AS maybe_type,
        |  count(*) AS n,
        |  round(sum(value), 4) AS sum_val
        |FROM events WHERE value >= 20 AND NOT isnan(value)
        |GROUP BY 1""".stripMargin,

    "f1_haversine" ->
      ("WITH " + Fixtures.geoEventsCte +
        " SELECT event_id, round(" +
        Geo.haversineSql("lat", "lon", "-33.87", "151.21") +
        ", 4) AS km_to_sydney FROM geo_events"),

    "f3_datetime" ->
      """SELECT event_id,
        |  strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
        |  strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
        |FROM events""".stripMargin,

    "f7_string_ops" ->
      """SELECT doc_id,
        |  -- DuckDB's split_part is NOT null-propagating (NULL in,
        |  -- '' out) — the CASE restores the Spark/SQL convention
        |  CASE WHEN text IS NULL THEN NULL
        |       ELSE split_part(text, ' ', 1) END AS first_word,
        |  substring(text, 1, 10) AS prefix10,
        |  length(text) AS text_len,
        |  upper(lang) AS lang_uc,
        |  TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) AS source_num
        |FROM documents""".stripMargin,

    "f7b_string_family" ->
      """WITH fw AS (
        |  -- split_part is not null-propagating in DuckDB (NULL → '');
        |  -- the CASE restores null-in-null-out so every derived
        |  -- column below propagates like the engine's split().getItem
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL THEN NULL
        |         ELSE split_part(text, ' ', 1) END AS w1
        |  FROM documents
        |)
        |SELECT doc_id,
        |  -- char-level edit distance only where bytes == chars:
        |  -- DuckDB's levenshtein counts BYTES on multi-byte input
        |  -- while Spark's counts CHARS — the engine carries the same
        |  -- single-byte predicate so both report NULL there
        |  CASE WHEN strlen(w1) = length(w1)
        |       THEN levenshtein(w1, 'spark') END AS dist_spark,
        |  lpad(w1, 8, '_') AS padded,
        |  reverse(w1) AS reversed,
        |  w1 || '|' || w1 AS doubled
        |FROM fw""".stripMargin,

    // Integral-string guard on BOTH json oracles: DuckDB's
    // TRY_CAST(VARCHAR AS INTEGER) goes through the numeric path and
    // ROUNDS a decimal string ('36.97' → 37) where Spark's try_cast
    // is a strict integer parse (NULL) — a float-valued k is not an
    // integer k on either engine.
    // Both JSON oracles parse a SANITIZED argument (invalid JSON
    // nulled INSIDE the call): json_extract_string ERRORS on
    // malformed input and DuckDB's vectorized evaluation can reach a
    // guarded conjunct/branch on rows json_valid excluded — the sf0.1
    // fuzz corpus caught f_variant doing exactly that on '{'.
    "f_json_extract" ->
      """WITH e AS (
        |  SELECT event_id,
        |    CASE WHEN json_valid(props) THEN props END AS jp
        |  FROM events
        |)
        |SELECT event_id,
        |  CASE WHEN regexp_matches(
        |          coalesce(json_extract_string(jp, '$.k'), ''),
        |          '^-?[0-9]+$') THEN
        |    TRY_CAST(json_extract_string(jp, '$.k') AS INTEGER) END AS k
        |FROM e""".stripMargin,

    "f_variant" ->
      """WITH e AS (
        |  SELECT event_id,
        |    CASE WHEN json_valid(props) THEN props END AS jp
        |  FROM events
        |)
        |SELECT event_id,
        |  CASE WHEN regexp_matches(
        |          coalesce(json_extract_string(jp, '$.k'), ''),
        |          '^-?[0-9]+$') THEN
        |    TRY_CAST(json_extract_string(jp, '$.k') AS BIGINT) END AS k,
        |  TRY_CAST(json_extract_string(jp, '$.missing') AS BIGINT)
        |    AS missing_k
        |FROM e""".stripMargin,

    "f9_explode_words" ->
      """SELECT word, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY 1""".stripMargin,

    "f4_from_utc_timestamp" ->
      """SELECT event_id,
        |  (['Australia/Sydney', 'Asia/Tokyo', 'UTC'])[((user_id % 3) + 3) % 3 + 1] AS tz,
        |  strftime(timezone(
        |    (['Australia/Sydney', 'Asia/Tokyo', 'UTC'])[((user_id % 3) + 3) % 3 + 1],
        |    timezone('UTC', CAST(ts AS TIMESTAMP))), '%Y-%m-%d %H:%M:%S') AS local_time
        |FROM events""".stripMargin,

    "f6_parse_timestamp" ->
      """SELECT event_id,
        |  CASE WHEN ts IS NOT NULL THEN
        |    CAST(epoch(strptime(
        |      split_part(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') || '.123', '.', 1),
        |      '%Y-%m-%d %H:%M:%S')) AS BIGINT)
        |  END AS epoch_s
        |FROM events""".stripMargin,

    "f_map_family" ->
      """SELECT event_id,
        |  round((MAP {'base': value, 'double': value * 2})['double'][1], 4) AS double_val,
        |  CAST(cardinality(MAP {'base': value, 'double': value * 2}) AS BIGINT) AS n_keys,
        |  array_to_string(list_sort(map_keys(MAP {'base': value, 'double': value * 2})), ',') AS keys_sorted
        |FROM events""".stripMargin,

    "f_date_arith" ->
      """SELECT event_id,
        |  strftime(CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE), '%Y-%m-%d') AS plus_month,
        |  strftime(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end,
        |  CAST(quarter(CAST(ts AS DATE)) AS BIGINT) AS qtr,
        |  strftime(CAST(ts AS DATE), '%a') AS dow
        |FROM events""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(band, 'ALL') AS band,
        |  count(*) AS n, round(sum(value), 4) AS total
        |FROM (
        |  SELECT event_type,
        |    CASE WHEN value > 100 THEN 'high' ELSE 'low' END AS band,
        |    value
        |  FROM events
        |) GROUP BY ROLLUP (event_type, band)""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(band, 'ALL') AS band,
        |  count(*) AS n
        |FROM (
        |  SELECT event_type,
        |    CASE WHEN value > 100 THEN 'high' ELSE 'low' END AS band
        |  FROM events
        |) GROUP BY CUBE (event_type, band)""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(week, 'ALL') AS week,
        |  count(*) AS n, round(sum(value), 4) AS total
        |FROM (
        |  SELECT event_type,
        |    strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, value
        |  FROM events
        |) GROUP BY GROUPING SETS ((event_type, week), (event_type), (week))""".stripMargin,

    "agg_pivot" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS view,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase
        |FROM events GROUP BY 1""".stripMargin,

    "o1_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS total
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "set_union_except" ->
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |) EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000""".stripMargin,

    "set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
        |INTERSECT SELECT o_custkey FROM orders""".stripMargin
  )
}
