package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (the reference is batch-only —
  * SURVEY §2.10 — so this is engine surface beyond parity, built the
  * Spark-native way: readStream → event-time transforms → writeStream).
  *
  * Both operators also run in batch mode unchanged (Spark executes
  * stateful ops per-group in batch), which is how the deterministic
  * specs exercise them; the streaming specs drive them from a
  * MemoryStream with watermarks.
  */
object StreamingOps {

  /** Event-time sliding-window counts with a watermark for late data.
    * Works on a streaming or batch events frame (ts: timestamp).
    */
  def windowedTypeCounts(events: DataFrame,
                         windowDur: String = "10 minutes",
                         slideDur: String = "5 minutes",
                         watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Stream-stream interval join: click events joined to the same
    * user's purchase events occurring within `withinSeconds` after the
    * click. Both sides carry watermarks so Spark can bound the join
    * state; the time-range predicate is what makes state pruning
    * possible (an unbounded equi-join of streams would grow forever).
    */
  def clicksToPurchases(clicks: DataFrame, purchases: DataFrame,
                        withinSeconds: Int, watermark: String = "30 minutes",
                        joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    // left_outer is streaming-legal precisely BECAUSE of the watermark
    // + time-range pair: a click emits its null row once its join
    // window has fully passed the watermark — without the range bound
    // Spark could never prove a click has no future match.
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $withinSeconds SECONDS"),
      joinType)
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        round(col("purchase_value"), 4).as("purchase_value"))
  }

  /** Stream-static enrichment: attach a dimension row to each event by
    * key. The static side is planned as a broadcast per micro-batch
    * (fresh dimension snapshots are picked up between batches for
    * file-backed dims), and the stream side carries NO state — this is
    * the shape that holds at any stream rate. Inner join: unmatched
    * events drop (use "left" via joinType for keep-and-null).
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
                       streamKey: Column, dimKey: Column,
                       joinType: String = "inner"): DataFrame =
    stream.join(broadcast(dim), streamKey === dimKey, joinType)

  /** Streaming incremental dedup against the lake: drop stream rows
    * whose digest of `content` already exists in `lakeDigest`
    * (single column `h`). A stream-static LEFT ANTI join — stateless
    * on the stream side, re-planned per micro-batch (a refreshed
    * digest snapshot is picked up between batches for file-backed
    * lakes). Within-batch copies survive this check; chain
    * `.dropDuplicates("h")` (or dropDuplicatesWithinWatermark for
    * late replays) behind it when the stream itself can repeat — the
    * batch dedup_incremental query is the backfill twin of this shape.
    */
  def dedupAgainstLake(stream: DataFrame, lakeDigest: DataFrame,
                       content: Column): DataFrame =
    stream.withColumn("h", md5(content))
      .join(lakeDigest, Seq("h"), "left_anti")

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class SessionAgg(startMs: Long, endMs: Long, n: Int, total: Double)
  final case class UserSession(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                               n_events: Int, total_value: Double)

  /** Gap-based sessionization via flatMapGroupsWithState: a session
    * closes when no event arrives within `gapMs` (custom state — the
    * KeyValueGroupedDataset path SURVEY steers streaming state to).
    */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[SessionAgg]): Iterator[UserSession] = {
      val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
      var cur = state.getOption
      val out = Seq.newBuilder[UserSession]
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.endMs <= gapMs =>
            // monotone bounds: a late cross-batch event whose ts falls
            // INSIDE the stored session must widen it, never shrink it
            // (in-order input makes both max/min no-ops)
            cur = Some(s.copy(startMs = math.min(s.startMs, t),
              endMs = math.max(s.endMs, t), n = s.n + 1, total = s.total + e.value))
          case Some(s) =>
            out += UserSession(userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total)
            cur = Some(SessionAgg(t, t, 1, e.value))
          case None =>
            cur = Some(SessionAgg(t, t, 1, e.value))
        }
      }
      // The still-open session stays in state; it is emitted once a
      // later event (possibly a sentinel "flush" event past the gap)
      // closes it. Closed sessions are append-only output.
      cur.foreach(state.update)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }

  /** The SAME gap sessionization on the modern Spark 4 state API:
    * `transformWithState` with a [[StatefulProcessor]] holding a typed
    * [[org.apache.spark.sql.streaming.ValueState]]. This is the API
    * new state logic should target — named state variables (several
    * per processor: value/list/map), per-state TTL, timers — where
    * flatMapGroupsWithState forces one monolithic state object and
    * global timeouts. Kept alongside the fMGWS form so the engine
    * exercises both surfaces; `stream_tws_sessionize` pins them to the
    * identical relation via the shared gaps-and-islands oracle.
    */
  class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserSession] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var session: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionAgg]("session",
        org.apache.spark.sql.Encoders.product[SessionAgg], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[UserSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
      var cur = if (session.exists()) Some(session.get()) else None
      val out = Seq.newBuilder[UserSession]
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.endMs <= gapMs =>
            // monotone bounds (see the fMGWS twin): late cross-batch
            // events widen the stored session, never shrink it
            cur = Some(s.copy(startMs = math.min(s.startMs, t),
              endMs = math.max(s.endMs, t), n = s.n + 1, total = s.total + e.value))
          case Some(s) =>
            out += UserSession(userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total)
            cur = Some(SessionAgg(t, t, 1, e.value))
          case None =>
            cur = Some(SessionAgg(t, t, 1, e.value))
        }
      }
      cur.foreach(session.update)
      out.result().iterator
    }
  }

  /** transformWithState loads a REAL state store even in batch mode,
    * and its executors resolve the driver's StateStoreCoordinator RPC
    * endpoint — which the streaming engine registers lazily on the
    * first streaming-query start. On a session that never ran one,
    * the lookup dies with RpcEndpointNotFoundException; running a
    * one-row AvailableNow MemoryStream query once per SparkContext
    * initializes the coordinator through its supported path.
    */
  private val coordinatorReady =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit =
    if (coordinatorReady.add(spark.sparkContext.applicationId)) {
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
      ms.addData(1)
      val q = ms.toDS().writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

  /** The events table as a REAL file-source stream (same ns→µs ts
    * normalization as the batch reader in [[graft.core.Tables]]).
    * Schema comes from a metadata-only batch probe of the same path.
    */
  def eventsStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val raw = spark.read.option("mergeSchema", "true").parquet(path)
    // the file-stream source needs a directory basePath; the fixture
    // table is a single file, so glob it under its parent
    val df = spark.readStream.schema(raw.schema)
      .option("basePath", dir).parquet(s"$dir/events*.parquet")
    val norm =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else df
    // watermarks require TIMESTAMP (LTZ); NTZ-written corpora (e.g.
    // the synth scaling fixture) cast over, session tz is pinned UTC
    norm.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Watermark-bounded streaming dedup: per-key state lives only
    * until the watermark passes the key's event time — the bounded-
    * memory form an unbounded ingest needs (plain dropDuplicates
    * grows state forever). Eviction/re-admission semantics are pinned
    * in StreamingSpec on a RocksDB-backed stream.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String, delay: String,
                           keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Drain an append-mode streaming DataFrame through an AvailableNow
    * memory sink and return the collected table — the harness that
    * lets streaming-only operators run under the batch correctness
    * gate. Verification surface: the memory sink materializes the
    * result, so callers keep output cardinality bounded (keys,
    * aggregates — never raw events).
    */
  def runAvailableNow(out: DataFrame, prefix: String): DataFrame = {
    val name = prefix + "_" + java.lang.Long.toHexString(System.nanoTime())
    val q = out.writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.awaitTermination()
    out.sparkSession.table(name)
  }

  /** [[runAvailableNow]] for AGGREGATION queries: complete-mode drain
    * — the memory sink holds the final state table after the last
    * batch, which is exactly what a state materializer (CDC apply)
    * wants to expose. Same bounded-output caveat: keys/aggregates
    * only.
    */
  def runAvailableNowComplete(out: DataFrame, prefix: String): DataFrame = {
    val name = prefix + "_" + java.lang.Long.toHexString(System.nanoTime())
    val q = out.writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("complete").start()
    q.awaitTermination()
    out.sparkSession.table(name)
  }

  /** Streaming CDC apply — the last-write-wins upsert/delete
    * materializer that turns a change stream into current table
    * state: per key, keep the change with the highest `seq` (a
    * struct makes the order total); rows whose final op is a delete
    * vanish from the view. One streaming max_by aggregation — state
    * is one row per live key, the minimum any CDC materializer must
    * hold — followed by a stateless delete filter. The batch twin
    * (argmax by the same seq, same filter) is the DuckDB oracle.
    */
  def cdcApply(stream: DataFrame, key: Column, seq: Column,
               op: Column, payload: Column): DataFrame =
    stream.groupBy(key.as("k"))
      .agg(max_by(struct(op.as("op"), payload.as("payload")), seq).as("last"))
      .where(col("last.op") =!= "D")
      .select(col("k"), col("last.payload").as("payload"))

  /** [[sessionize]] on the transformWithState path — identical
    * semantics (sentinel-flushed open sessions, append-only output).
    */
  def sessionizeTws(events: Dataset[Ev], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    ensureStateStoreCoordinator(events.sparkSession)
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }
}
