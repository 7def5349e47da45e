package graft

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.StreamingQueries
import graft.streaming.StreamingOps

/** Batch ≡ stream for EVERY stream_* gate query (verdict r14 item 7).
  *
  * The correctness gate executes most stream_* queries on the batch
  * path (same plan, bounded input); this spec drives each transform
  * through a REAL streaming execution — file-source readStream →
  * AvailableNow trigger → memory-sink drain — and asserts multiset
  * equality with the gate query's batch result on the same corpus.
  * (cdc_apply and dropdup_watermark stream IN the gate already; for
  * those the equivalence runs the other way: a batch twin of the same
  * transform must equal the gate's streamed result.)
  *
  * Watermark-finalized operators (left-outer interval join, session
  * windows) only emit their last rows once the watermark PASSES the
  * data — a single AvailableNow batch never advances the watermark
  * past its own max event time. The spec stages the corpus as
  * multiple source files with `maxFilesPerTrigger = 1` and appends
  * two far-future sentinel files (user_id = −1, filtered from the
  * comparison): batch N's watermark reflects batch N−1's max event
  * time, so by the third trigger the watermark has passed every real
  * row and the engine must have flushed every real result. This is
  * the same contract a production stream meets over time; the
  * sentinels just compress "time passes" into two extra triggers.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {

  private val allStreamQueries = StreamingQueries.queries.keySet

  /** The 5 normalized event columns every staged file carries. The
    * LTZ cast matters: the fixture parquet is NTZ and watermarks
    * reject TIMESTAMP_NTZ — session tz is pinned UTC, so epoch values
    * (all the comparisons below) are unchanged.
    */
  private def ev: DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))

  private lazy val maxTs: java.sql.Timestamp =
    ev.agg(max("ts")).head().getTimestamp(0)

  private def plusDays(t: java.sql.Timestamp, d: Int) =
    new java.sql.Timestamp(t.getTime + d.toLong * 24 * 3600 * 1000)

  /** Far-future watermark-advance rows (one per event type the query
    * filters on, so every watermark node sees the advance).
    */
  private def sentinelFile(days: Int, types: Seq[String]): DataFrame = {
    import spark.implicits._
    types.map(t => (-1L, plusDays(maxTs, days), -1L, t, 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  /** Write each frame as ONE plain parquet file with increasing
    * mtime (the file-stream source processes oldest-first), return a
    * maxFilesPerTrigger=1 readStream over the directory.
    */
  private def stagedStream(files: Seq[DataFrame]): DataFrame = {
    val dir = Files.createTempDirectory("sbe_src").toFile
    val base = System.currentTimeMillis() - 3600 * 1000
    files.zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory("sbe_w").toFile
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = new File(dir, f"f$i%03d.parquet")
      Files.move(part.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING)
      assert(dest.setLastModified(base + i * 60000L))
    }
    spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"${dir.getAbsolutePath}/*.parquet")
  }

  private def bag(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col).toIndexedSeq: _*)
      .collect().map(_.toString).sorted.toSeq
  }

  private def batchResult(name: String): DataFrame =
    StreamingQueries.queries(name)(spark, sfDir)

  private def assertEquiv(name: String, streamed: DataFrame): Unit = {
    val b = bag(batchResult(name))
    val s = bag(streamed)
    assert(b.nonEmpty, s"$name: empty batch result proves nothing")
    assert(s === b, s"$name: stream result diverges from batch " +
      s"(stream ${s.size} rows, batch ${b.size} rows)")
  }

  test("the equivalence inventory covers every stream_* gate query") {
    val covered = Set(
      "stream_windowed_counts", "stream_trending_topk",
      "stream_interval_join", "stream_interval_outer",
      "stream_session_window", "stream_static_join",
      "stream_cdc_apply", "stream_dropdup_watermark",
      "stream_sessionize", "stream_tws_sessionize")
    assert(covered === allStreamQueries,
      s"gate added/removed stream queries; update this spec: " +
        s"missing=${allStreamQueries -- covered} stale=${covered -- allStreamQueries}")
  }

  test("stream_windowed_counts: sliding-window agg streams to the batch relation") {
    val out = StreamingOps.windowedTypeCounts(
        stagedStream(Seq(ev)), "10 minutes", "5 minutes", "15 minutes")
      .select(unix_timestamp(col("window_start")).as("win_start_s"),
        col("event_type"), col("n_events"), col("total_value"))
    assertEquiv("stream_windowed_counts",
      StreamingOps.runAvailableNowComplete(out, "sbe_wc"))
  }

  test("stream_trending_topk: the stateful windowed count streams; the rank tail is stateless") {
    val counts = stagedStream(Seq(ev))
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(window(col("ts"), "10 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("win.start")).as("win_start_s"),
        col("event_type"), col("n"))
    val drained = StreamingOps.runAvailableNowComplete(counts, "sbe_topk")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("win_start_s"))
      .orderBy(col("n").desc, col("event_type"))
    val ranked = drained.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("win_start_s"), col("rank").cast("long").as("rank"),
        col("event_type"), col("n"))
    assertEquiv("stream_trending_topk", ranked)
  }

  test("stream_interval_join: inner stream-stream interval join streams to the batch relation") {
    val src = stagedStream(Seq(ev))
    val out = StreamingOps.clicksToPurchases(
        src.where(col("event_type") === "click"),
        src.where(col("event_type") === "purchase"),
        withinSeconds = 600)
      .select(col("user_id"),
        unix_timestamp(col("click_ts")).as("click_s"),
        unix_timestamp(col("purchase_ts")).as("purchase_s"),
        col("purchase_value"))
    assertEquiv("stream_interval_join",
      StreamingOps.runAvailableNow(out, "sbe_ij"))
  }

  test("stream_interval_outer: watermark-flushed null rows equal the batch left outer") {
    // sentinel click+purchase pairs advance BOTH sides' watermark;
    // their self-join rows carry user_id −1 and are excluded
    val src = stagedStream(Seq(ev,
      sentinelFile(2, Seq("click", "purchase")),
      sentinelFile(4, Seq("click", "purchase"))))
    val out = StreamingOps.clicksToPurchases(
        src.where(col("event_type") === "click"),
        src.where(col("event_type") === "purchase"),
        withinSeconds = 600, joinType = "left_outer")
      .select(col("user_id"),
        unix_timestamp(col("click_ts")).as("click_s"),
        unix_timestamp(col("purchase_ts")).as("purchase_s"),
        col("purchase_value"))
    val drained = StreamingOps.runAvailableNow(out, "sbe_ioj")
      .where(col("user_id") >= 0)
    assertEquiv("stream_interval_outer", drained)
  }

  test("stream_session_window: watermark-flushed native session windows equal the batch form") {
    val src = stagedStream(Seq(ev,
      sentinelFile(2, Seq("wm")), sentinelFile(4, Seq("wm"))))
    val out = src.where(col("ts").isNotNull)
      .withWatermark("ts", "15 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        col("n_events"), col("total_value"))
    val drained = StreamingOps.runAvailableNow(out, "sbe_sw")
      .where(col("user_id") >= 0)
    assertEquiv("stream_session_window", drained)
  }

  test("stream_static_join: per-micro-batch broadcast enrichment streams to the batch relation") {
    val out = StreamingOps.enrichWithStatic(
        stagedStream(Seq(ev)),
        Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id"), col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
    assertEquiv("stream_static_join",
      StreamingOps.runAvailableNowComplete(out, "sbe_sj"))
  }

  test("stream_cdc_apply: the gate's streamed state table equals the batch twin") {
    // the gate query IS a real AvailableNow stream; the batch twin
    // runs the identical transform over the batch frame
    val batchTwin = StreamingOps.cdcApply(
      Tables.events(spark, sfDir)
        .select((col("user_id") % 100).as("k"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          col("value").as("payload"),
          unix_timestamp(col("ts")).as("s"), col("event_id")),
      col("k"), struct(col("s"), col("event_id")), col("op"), col("payload"))
    val streamed = bag(batchResult("stream_cdc_apply"))
    assert(streamed.nonEmpty && streamed === bag(batchTwin),
      "cdc stream state diverges from the batch argmax twin")
  }

  test("stream_dropdup_watermark: the gate's streamed dedup equals batch key distinct") {
    val batchTwin = Tables.events(spark, sfDir)
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("event_type")).distinct()
    val streamed = bag(batchResult("stream_dropdup_watermark"))
    assert(streamed.nonEmpty && streamed === bag(batchTwin),
      "watermark dedup stream diverges from batch distinct")
  }

  test("stream_sessionize: fMGWS over a real stream (sentinel-flushed) equals the batch plan") {
    import spark.implicits._
    val base = ev.where(col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"))
    val sentinels = base.groupBy("user_id").agg(max(col("ts")).as("mx"))
      .select(col("user_id"), (col("mx") + expr("INTERVAL 1 DAY")).as("ts"),
        lit("__flush").as("event_type"), lit(0.0).as("value"))
    // stage (events, per-user flush sentinels) with the 5-column
    // schema, then project down to Ev's fields on the stream
    def pad(df: DataFrame) = df.select(lit(-1L).as("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"))
    val src = stagedStream(Seq(pad(base), pad(sentinels)))
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[StreamingOps.Ev]
    val out = StreamingOps.sessionize(src, StreamingQueries.GapMs).toDF()
      .select(col("user_id"),
        unix_timestamp(col("start_ts")).as("start_s"),
        unix_timestamp(col("end_ts")).as("end_s"),
        col("n_events").cast("long").as("n_events"),
        round(col("total_value"), 4).as("total_value"))
    assertEquiv("stream_sessionize", StreamingOps.runAvailableNow(out, "sbe_sess"))
  }

  test("stream_tws_sessionize: transformWithState over a real stream equals the batch plan") {
    import spark.implicits._
    // transformWithState's typed state needs column families — HDFS-
    // backed state store refuses; pin RocksDB for this query only
    val old = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val base = ev.where(col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"))
    val sentinels = base.groupBy("user_id").agg(max(col("ts")).as("mx"))
      .select(col("user_id"), (col("mx") + expr("INTERVAL 1 DAY")).as("ts"),
        lit("__flush").as("event_type"), lit(0.0).as("value"))
    def pad(df: DataFrame) = df.select(lit(-1L).as("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"))
    val src = stagedStream(Seq(pad(base), pad(sentinels)))
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[StreamingOps.Ev]
    val out = StreamingOps.sessionizeTws(src, StreamingQueries.GapMs).toDF()
      .select(col("user_id"),
        unix_timestamp(col("start_ts")).as("start_s"),
        unix_timestamp(col("end_ts")).as("end_s"),
        col("n_events").cast("long").as("n_events"),
        round(col("total_value"), 4).as("total_value"))
    assertEquiv("stream_tws_sessionize", StreamingOps.runAvailableNow(out, "sbe_tws"))
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
