package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Event-log analytics over the `events` table. The reference models logs
  * as scan-able tables (kafka connector, SURVEY §2.11) with no streaming
  * runtime, so these are batch plans; the same transforms port to
  * Structured Streaming (`readStream` + `withWatermark`) unchanged.
  *
  * Scale: sessionization partitions by user_id — the window shuffle is one
  * hash exchange on the session key, which is exactly the partitioning a
  * 1000-executor run needs; no per-user driver loops anywhere.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // tumbling-window counts (batch analog of streaming windowed agg)
    "evt_time_buckets" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
    }),
    // per-user daily activity pivot-style conditional agg
    "evt_user_daily" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          count_if(col("event_type") === "purchase").as("n_purchase"),
          count_if(col("event_type") === "error").as("n_error"),
          max("value").as("max_value"))
        .filter(col("n_events") >= 5)
    }),
    // sessionization: 30-minute inactivity gap → session ids via
    // lag + conditional cumulative sum (all window ops, one shuffle)
    "evt_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sessions = t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      sessions.groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("longest_session_events"))
    }),
    // funnel: users who viewed then purchased (order-sensitive via min-ts)
    "evt_funnel" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val firstView = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min("ts").as("first_view"))
      val firstBuy = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("buyer_id")).agg(min("ts").as("first_buy"))
      firstView.join(firstBuy,
          col("user_id") === col("buyer_id") && col("first_buy") > col("first_view"))
        .agg(count(lit(1)).as("n_converted"))
    }),
    // MATCH_RECOGNIZE subset (graft.operators.MatchRecognize): funnel
    // pattern V C+ P (view, 1+ clicks, purchase) per user, ONE ROW PER
    // MATCH, SKIP PAST LAST ROW — the reference's row-pattern operator
    // re-expressed as groupByKey+flatMapGroups
    "mr_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      import graft.operators.MatchRecognize
      import graft.operators.MatchRecognize.{Plus, Step}
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      val outSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("match_num", LongType),
        StructField("start_ts", TimestampType), StructField("end_ts", TimestampType),
        StructField("n_clicks", LongType)))
      def typeIs(t: String)(r: org.apache.spark.sql.Row) =
        r.getAs[String]("event_type") == t
      MatchRecognize.oneRowPerMatch(
        e,
        partitionKey = r => r.getAs[Long]("user_id"),
        orderKey = { r =>
          val ts = r.getAs[java.sql.Timestamp]("ts")
          ((ts.getTime / 1000) * 1000000000L + ts.getNanos, r.getAs[Long]("event_id"))
        },
        pattern = Seq(Step("V"), Step("C", Plus), Step("P")),
        define = Map("V" -> typeIs("view"), "C" -> typeIs("click"), "P" -> typeIs("purchase")),
        measures = (key, m) => org.apache.spark.sql.Row(
          key, m.matchNumber.toLong,
          m.rows.head.getAs[java.sql.Timestamp]("ts"),
          m.rows.last.getAs[java.sql.Timestamp]("ts"),
          m.rowsOf("C").length.toLong),
        outSchema = outSchema)
    }),

    // JSON property extraction + aggregation (props is a JSON string)
    "evt_json_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(avg("k").as("avg_k"), min("k").as("min_k"), max("k").as("max_k"),
          count_if(col("k").isNull).as("n_null_k"))
    }))

  val oracles: Map[String, String] = Map(
    "evt_time_buckets" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |count(*) AS n, sum(value) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "evt_user_daily" ->
      """SELECT user_id, date_trunc('day', ts)::timestamp AS day, count(*) AS n_events,
        |count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |max(value) AS max_value
        |FROM events GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin,
    "evt_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR floor(epoch(ts))::bigint - floor(epoch(lag(ts) OVER w))::bigint > 1800
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessioned AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM marked),
        |per_session AS (
        |  SELECT user_id, session_seq, count(*) AS n_events
        |  FROM sessioned GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |max(n_events) AS longest_session_events
        |FROM per_session GROUP BY 1""".stripMargin,
    "evt_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT user_id, min(ts) AS first_buy FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT count(*) AS n_converted FROM v JOIN b ON v.user_id = b.user_id
        |WHERE first_buy > first_view""".stripMargin,
    // V C+ P matches are pairwise disjoint (a match interior is all
    // clicks), so SKIP PAST LAST ROW semantics reduce to: every purchase
    // whose nearest preceding non-click is a view with ≥1 click between
    "mr_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |x AS (
        |  SELECT *,
        |    max(CASE WHEN event_type <> 'click' THEN rn END) OVER w1 AS prev_nc_rn,
        |    last_value(CASE WHEN event_type <> 'click' THEN event_type END IGNORE NULLS) OVER w1 AS prev_nc_type,
        |    last_value(CASE WHEN event_type <> 'click' THEN ts END IGNORE NULLS) OVER w1 AS prev_nc_ts
        |  FROM e WINDOW w1 AS (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (
        |  SELECT user_id, prev_nc_ts AS start_ts, ts AS end_ts,
        |    rn - prev_nc_rn - 1 AS n_clicks
        |  FROM x WHERE event_type = 'purchase' AND prev_nc_type = 'view'
        |    AND rn - prev_nc_rn >= 2)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY end_ts) AS match_num,
        |  start_ts, end_ts, n_clicks
        |FROM m""".stripMargin,
    "evt_json_agg" ->
      """SELECT event_type, avg(k) AS avg_k, min(k) AS min_k, max(k) AS max_k,
        |count(*) FILTER (WHERE k IS NULL) AS n_null_k
        |FROM (SELECT event_type, json_extract_string(props, '$.k')::bigint AS k
        |      FROM events) t GROUP BY 1""".stripMargin)
}
