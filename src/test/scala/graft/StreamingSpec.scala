package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("sessionize splits on gap and holds the open session in state") {
    import spark.implicits._
    val evs = Seq(
      Ev(1L, ts(0), "click", 1.0),
      Ev(1L, ts(2), "view", 2.0),
      Ev(1L, ts(30), "click", 3.0), // > 10 min gap → new session
      Ev(2L, ts(5), "view", 5.0),
      // sentinel far in the future flushes every open session
      Ev(1L, Timestamp.valueOf("2024-01-02 00:00:00"), "flush", 0.0),
      Ev(2L, Timestamp.valueOf("2024-01-02 00:00:00"), "flush", 0.0)
    ).toDS()
    val sessions = StreamingOps.sessionize(evs, gapMs = 10 * 60 * 1000)
      .where(col("n_events") > 0 && col("total_value") > 0)
      .collect()
    val u1 = sessions.filter(_.user_id == 1L).sortBy(_.start_ts.getTime)
    assert(u1.length === 2)
    assert(u1(0).n_events === 2 && u1(0).total_value === 3.0)
    assert(u1(1).n_events === 1 && u1(1).total_value === 3.0)
    val u2 = sessions.filter(_.user_id == 2L)
    assert(u2.length === 1 && u2(0).n_events === 1)
  }

  test("a late cross-batch event before the stored session forms its own session") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.sessionize(ms.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      // batch 1 stores an open session at 10:30
      ms.addData(Ev(1L, ts(30), "click", 3.0))
      q.processAllAvailable()
      // batch 2 delivers a LATE event at 10:00 — 30 min before the
      // stored session, triple the gap: it must close as its OWN
      // session, not vacuously merge into [10:30, 10:30]
      ms.addData(Ev(1L, ts(0), "view", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(1L, Timestamp.valueOf("2024-01-02 00:00:00"), "flush", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("late_sessions")
        .where(col("total_value") > 0).orderBy("start_ts").collect()
      assert(sessions.length === 2, sessions.mkString(","))
      assert(sessions(0).getTimestamp(1) === ts(0) &&
        sessions(0).getInt(3) === 1 && sessions(0).getDouble(4) === 1.0)
      assert(sessions(1).getTimestamp(1) === ts(30) &&
        sessions(1).getInt(3) === 1 && sessions(1).getDouble(4) === 3.0)
    } finally q.stop()
  }

  test("transformWithState sessionizer equals the fMGWS sessionizer in batch") {
    import spark.implicits._
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Ev]
    val a = StreamingOps.sessionize(evs, gapMs = 30 * 60 * 1000).toDF()
    val b = StreamingOps.sessionizeTws(evs, gapMs = 30 * 60 * 1000).toDF()
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("transformWithState runs as a REAL stream on the RocksDB state store") {
    import spark.implicits._
    val old = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[Ev]
      val q = StreamingOps.sessionizeTws(ms.toDS(), gapMs = 10 * 60 * 1000)
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        // batch 1 opens two sessions; batch 2's far-future events close
        // them (state survives across microbatches in RocksDB)
        ms.addData(Ev(1L, ts(0), "click", 1.0), Ev(1L, ts(2), "view", 2.0),
          Ev(2L, ts(5), "view", 5.0))
        q.processAllAvailable()
        ms.addData(
          Ev(1L, Timestamp.valueOf("2024-01-02 00:00:00"), "flush", 0.0),
          Ev(2L, Timestamp.valueOf("2024-01-02 00:00:00"), "flush", 0.0))
        q.processAllAvailable()
        val sessions = spark.table("tws_sessions")
          .where(col("total_value") > 0).collect()
        assert(sessions.length === 2)
        val u1 = sessions.find(_.getLong(0) == 1L).get
        assert(u1.getInt(3) === 2 && u1.getDouble(4) === 3.0)
      } finally q.stop()
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("file-source readStream → windowed agg → file sink round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val (in, out, chk) = (s"$dir/in", s"$dir/out", s"$dir/chk")
    // batch 1: two clicks inside the first 10-min window
    Seq((ts(1), "click", 1.0), (ts(4), "click", 2.0))
      .toDF("ts", "event_type", "value").write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val agg = StreamingOps.windowedTypeCounts(stream, "10 minutes", "10 minutes", "5 minutes")
    val q = agg.writeStream
      .format("parquet").option("path", out).option("checkpointLocation", chk)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: a late-hour event pushes the watermark past the first
      // window's end; the no-data batch then flushes it (append mode)
      Seq((Timestamp.valueOf("2024-01-01 11:30:00"), "view", 3.0))
        .toDF("ts", "event_type", "value").write.mode("append").parquet(in)
      q.processAllAvailable()
      val res = spark.read.parquet(out)
      assert(res.where(col("event_type") === "click")
        .agg(sum("n_events")).head().getLong(0) === 2L)
    } finally q.stop()
  }

  test("stream-stream interval join: purchases within 10 min of a click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingOps.clicksToPurchases(
      clicks.toDF().toDF("user_id", "ts", "value"),
      buys.toDF().toDF("user_id", "ts", "value"),
      withinSeconds = 600)
    val q = joined.writeStream.format("memory").queryName("cp_join")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), 1.0), (2L, ts(5), 1.0))
      buys.addData((1L, ts(4), 9.99), (1L, ts(40), 5.0), (2L, ts(6), 3.5))
      q.processAllAvailable()
      val rows = spark.table("cp_join")
        .select("user_id", "purchase_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      // user 1's 10:40 purchase is outside the 10-min window
      assert(rows === Set((1L, 9.99), (2L, 3.5)))
    } finally q.stop()
  }

  test("left-outer interval join emits null rows once the watermark closes the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingOps.clicksToPurchases(
      clicks.toDF().toDF("user_id", "ts", "value"),
      buys.toDF().toDF("user_id", "ts", "value"),
      withinSeconds = 600, watermark = "10 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("cp_outer")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), 1.0), (2L, ts(0), 1.0))
      buys.addData((1L, ts(4), 9.99))
      q.processAllAvailable()
      // advance both watermarks far past click+600s+10min so user 2's
      // window is provably closed and its null row can emit
      clicks.addData((9L, ts(120), 1.0))
      buys.addData((9L, ts(121), 1.0))
      q.processAllAvailable()
      val rows = spark.table("cp_outer")
        .where(col("user_id").isin(1L, 2L))
        .select("user_id", "purchase_value").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(rows === Set((1L, Some(9.99)), (2L, None)))
    } finally q.stop()
  }

  test("cdcApply: delete wins over earlier upsert; later upsert resurrects; order by seq not arrival") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)] // (k, seq, op, payload)
    val out = graft.streaming.StreamingOps.cdcApply(
      mem.toDF().toDF("k", "seq", "op", "payload"),
      col("k"), col("seq"), col("op"), col("payload"))
    val q = out.writeStream.format("memory").queryName("cdc_spec")
      .outputMode("complete").start()
    try {
      // k=1 upsert then delete → gone; k=2 delete then upsert → alive;
      // k=3 out-of-ORDER arrival: seq 5 payload wins though seq 2 arrives later
      mem.addData((1L, 1L, "U", 10.0), (2L, 1L, "D", 0.0), (3L, 5L, "U", 99.0))
      q.processAllAvailable()
      mem.addData((1L, 2L, "D", 0.0), (2L, 2L, "U", 20.0), (3L, 2L, "U", 11.0))
      q.processAllAvailable()
      val state = spark.table("cdc_spec")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(state === Map(2L -> 20.0, 3L -> 99.0))
    } finally q.stop()
  }

  test("streaming dedup by key within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = mem.toDF().toDF("event_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "click"), (1L, ts(1), "click"), (2L, ts(2), "view"))
      q.processAllAvailable()
      mem.addData((1L, ts(3), "click"), (3L, ts(4), "view"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark re-admits a key after state eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = mem.toDF().toDF("event_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_wm_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "click"), (1L, ts(1), "click"))
      q.processAllAvailable()
      // same key while its state is alive: still suppressed
      mem.addData((1L, ts(3), "click"))
      q.processAllAvailable()
      // advance the watermark far past key 1's state lifetime
      mem.addData((2L, ts(60), "view"))
      q.processAllAvailable()
      // the key returns AFTER eviction: emitted again — the bounded-
      // state semantics plain dropDuplicates (grows forever) lacks
      mem.addData((1L, ts(61), "click"))
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_stream").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids === Seq(1L, 1L, 2L))
    } finally q.stop()
  }

  test("streaming ingest dedups against the lake digest, then within itself") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // the lake already holds "alpha" — its 16-byte digest, not its text
    val lake = Seq("alpha").toDF("text").select(md5(col("text")).as("h"))
    val fresh = StreamingOps.dedupAgainstLake(
        mem.toDF().toDF("doc_id", "text"), lake, col("text"))
      .dropDuplicates("h") // within-stream copies
    val q = fresh.writeStream.format("memory").queryName("lake_dedup")
      .outputMode("append").start()
    try {
      mem.addData((1L, "alpha"), (2L, "beta"), (3L, "beta"))
      q.processAllAvailable()
      // a later batch replays both an in-lake and an already-seen doc
      mem.addData((4L, "alpha"), (5L, "beta"), (6L, "gamma"))
      q.processAllAvailable()
      val got = spark.table("lake_dedup").select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((2L, "beta"), (6L, "gamma")))
    } finally q.stop()
  }

  test("stream-static join enriches a stream from a broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val enriched = StreamingOps.enrichWithStatic(
      mem.toDF().toDF("user_id", "ts", "value"), dim,
      col("user_id"), col("c_custkey"))
    val q = enriched.writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (9L, ts(2), 3.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_stream")
        .select("user_id", "c_mktsegment").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // user 9 has no dimension row → dropped by the inner join
      assert(rows === Set((1L, "BUILDING"), (2L, "MACHINERY")))
    } finally q.stop()
  }

  test("foreachBatch streams micro-batch upserts into a lakehouse table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_fb").toString + "/t"
    // seed the target table
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "attr", "v")
      .write.parquet(dir)
    val mem = MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("id", "attr", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the classic exactly-once-ish sink: MERGE each micro-batch
        // into the table by key (idempotent for replayed batches that
        // carry the same final value per key)
        val target = spark.read.parquet(dir)
        val merged = graft.operators.Lakehouse
          .mergeUpsert(target, batch.dropDuplicates("id"), Seq("id"))
        val tmp = dir + "__stage"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dir))
        ()
      }
      .outputMode("append").start()
    try {
      mem.addData((2L, "b2", 20.0), (3L, "c", 3.0)) // update 2, insert 3
      q.processAllAvailable()
      val rows = spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows === Set((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
    } finally q.stop()
  }

  test("windowed counts with watermark run as a streaming query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedTypeCounts(streamDf, "10 minutes", "10 minutes", "5 minutes")
    val q = agg.writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("update")
      .start()
    try {
      mem.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(12), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      assert(rows.nonEmpty)
      val click = spark.table("win_counts")
        .where(col("event_type") === "click").agg(sum("n_events")).head().getLong(0)
      assert(click === 2L)
    } finally q.stop()
  }
}
