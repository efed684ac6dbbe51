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
    * mapGroupsWithState — streaming analog of `evt_sessionize`. Emits one
    * update per user per trigger. State eviction for idle users (event-time
    * timeout + watermark) is future work; `expired` is reserved for it.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)(
      implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          val batch = it.toList.sortBy(_.ts.getTime)
          val prev = state.getOption
          val merged = batch.foldLeft(prev) { (acc, e) =>
            val t = e.ts.getTime
            acc match {
              case Some(s) if t - s.last <= gapSeconds * 1000 =>
                Some(SessionState(s.n + 1, s.start, math.max(s.last, t)))
              case _ => // gap exceeded (or first event): start new session
                Some(SessionState(1, t, t))
            }
          }.get
          state.update(merged)
          SessionUpdate(userId, merged.n, new Timestamp(merged.start),
            new Timestamp(merged.last), expired = false)
      }
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
