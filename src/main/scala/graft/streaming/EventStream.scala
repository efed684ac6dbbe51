package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming ports of the batch event analytics. The reference
  * has no streaming runtime (SURVEY §2.11 — kafka topics scan as static
  * tables), so these are net-new capability: the same transforms as
  * `EventQueries`, expressed over an unbounded source with watermarks.
  *
  * Scale notes: state is keyed by (window) or (user_id) — Spark's state
  * store partitions it across executors; the watermark bounds state
  * retention so long-running streams don't accumulate unbounded state.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionUpdate(user_id: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp, expired: Boolean)
  // public: the state encoder's generated code constructs it reflectively
  case class SessionState(n: Long, start: Long, last: Long)

  /** Tumbling-window counts per event type with late-data handling —
    * streaming analog of `evt_time_buckets`.
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("total_value"))

  /** Stateful sessionization (30-min inactivity gap) via
    * flatMapGroupsWithState with EVENT-TIME TIMEOUT — streaming analog of
    * `evt_sessionize`. Per trigger it emits the running session (expired
    * = false); when the watermark passes last-event + gap, the state
    * times out, the CLOSED session is emitted with expired = true and the
    * state is removed — so idle users hold no state and a long-running
    * stream's state store is bounded by the active-user set, not by
    * everyone ever seen. A session closed by a later in-batch event is
    * emitted closed in the same trigger.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, s.n,
              new Timestamp(s.start), new Timestamp(s.last), expired = true))
          } else {
            val batch = it.toList.sortBy(_.ts.getTime)
            val closed = List.newBuilder[SessionState]
            val merged = batch.foldLeft(state.getOption) { (acc, e) =>
              val t = e.ts.getTime
              acc match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  Some(SessionState(s.n + 1, s.start, math.max(s.last, t)))
                case other => // gap exceeded (or first event): new session
                  other.foreach(closed += _)
                  Some(SessionState(1, t, t))
              }
            }.get
            state.update(merged)
            // Clamp above the current watermark: a gap smaller than the
            // watermark delay (or a late-but-admitted event) would otherwise
            // compute a timeout at-or-before the watermark and Spark throws,
            // failing the whole batch.
            state.setTimeoutTimestamp(
              math.max(merged.last + gapSeconds * 1000, state.getCurrentWatermarkMs + 1))
            val closedOut = closed.result().iterator.map(s =>
              SessionUpdate(userId, s.n, new Timestamp(s.start),
                new Timestamp(s.last), expired = true))
            closedOut ++ Iterator.single(SessionUpdate(userId, merged.n,
              new Timestamp(merged.start), new Timestamp(merged.last), expired = false))
          }
      }
  }

  /** Streaming exact dedup — the unbounded-ingest form of `dedup_exact`:
    * documents fingerprinted by normalized content, first arrival wins,
    * later copies dropped. Declarative
    * (`dropDuplicatesWithinWatermark`): Catalyst plans the streaming
    * dedup operator with one state row per distinct fingerprint, and the
    * watermark horizon EVICTS state — on an endless crawl the state
    * store holds only the fingerprints seen within the lateness window,
    * not every document ever ingested. Exactly the semantics a training
    * -data ingest pipeline needs: duplicates cluster in time (re-crawls,
    * mirror bursts), so a bounded horizon catches them without unbounded
    * memory.
    */
  def dedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint",
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stream-stream INTERVAL join: each click pairs with the impression
    * of the same user that happened at most `horizonSeconds` before it.
    * Both sides carry watermarks and the join condition bounds the event
    * -time distance, so Spark can size the join state to the horizon and
    * EVICT rows the watermark has passed — the canonical bounded-state
    * stream-stream join (attribution, funnel stitching). Without the
    * time bound the state store would have to keep every row forever.
    */
  def intervalJoin(impressions: DataFrame, clicks: DataFrame,
      horizonSeconds: Long = 3600, watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .select(col("user_id").as("i_user"), col("ts").as("i_ts"),
        col("event_id").as("impression_id"))
      .withWatermark("i_ts", watermark)
    val clk = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    clk.join(imp,
      col("c_user") === col("i_user") &&
        col("i_ts") <= col("c_ts") &&
        col("i_ts") >= col("c_ts") - expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("c_user").as("user_id"), col("impression_id"),
        col("click_id"), col("i_ts"), col("c_ts"))
  }

  /** Driver row for the streaming aggregation path: the events fixture
    * streamed through `windowedCounts` (real file-source `readStream`,
    * AvailableNow trigger, Complete-mode memory sink) must produce
    * EXACTLY the batch hourly aggregate — the oracle is the plain batch
    * SQL, hash-matched, so the streaming agg operator is value-verified
    * end-to-end, not just spec-asserted. Complete mode keeps every
    * window in the sink table (append mode would hold back windows the
    * watermark hasn't closed), and `window(ts, '1 hour')` aligns to the
    * epoch — the same buckets as `date_trunc('hour', ts)` on both
    * engines.
    *
    * Scale: the memory sink is the harness, not the op — production
    * writes append-mode parquet/kafka via `run()`; the agg state is
    * keyed by (window, event_type) and watermark-evicted.
    */
  /** A real file-source readStream over the events fixture, normalizing
    * the ts encoding exactly like engine.Tables.doLoad (nanos-as-long vs
    * micros-ntz fixture generations). Each call is an independent source.
    * The file source wants a directory to watch; the fixture is one file
    * inside the sf dir — watch the dir, glob-filter to the events table.
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val stream0 = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => stream0.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Drain one streaming query into a memory-sink table and return it. */
  private def drainToTable(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    spark.table(name)
  }

  def windowedAggRow(spark: SparkSession, dir: String): DataFrame =
    drainToTable(spark, windowedCounts(eventsStream(spark, dir)),
      "graft_stream_agg_row", OutputMode.Complete)

  /** Driver row for the stream-stream INTERVAL join: view→click
    * attribution over TWO independent file-source streams of the events
    * fixture. Inner stream-stream joins emit a row as soon as both sides
    * match (the watermark only bounds state retention), so an
    * AvailableNow drain through an append-mode memory sink yields the
    * complete join — hash-matched against the batch self-join oracle.
    */
  def intervalJoinRow(spark: SparkSession, dir: String): DataFrame = {
    val imp = eventsStream(spark, dir).filter(col("event_type") === "view")
    val clk = eventsStream(spark, dir).filter(col("event_type") === "click")
    drainToTable(spark, intervalJoin(imp, clk),
      "graft_stream_ij_row", OutputMode.Append)
  }

  /** End-to-end wiring: file/kafka-shaped source → transform → sink.
    * (`readStream` over a directory of parquet drops mirrors how the
    * reference's kafka connector exposes a topic as an append-only table.)
    */
  def run(spark: SparkSession, sourceDir: String, checkpoint: String,
      outPath: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    windowedCounts(stream).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()
  }
}
