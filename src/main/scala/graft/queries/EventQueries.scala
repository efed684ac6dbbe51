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
    // r7: the streaming aggregation path as a driver row — the events
    // fixture through a REAL file-source readStream (AvailableNow
    // trigger, Complete-mode memory sink) must hash-match the batch
    // hourly aggregate; see EventStream.windowedAggRow
    "stream_windowed_agg" -> ((s, dir) =>
      graft.streaming.EventStream.windowedAggRow(s, dir)),
    // r7: stream-stream interval join (view→click attribution) over two
    // independent file-source readStreams, drained append-mode — must
    // hash-match the batch self-join; see EventStream.intervalJoinRow
    "stream_interval_join" -> ((s, dir) =>
      graft.streaming.EventStream.intervalJoinRow(s, dir)),
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
    // Spark's NATIVE session-window operator (SessionWindow/
    // UpdatingSessionsExec) — same 30-min-gap semantics as the manual
    // gaps-and-islands evt_sessionize, but expressed as one groupBy on
    // session_window(ts): the windows merge at aggregation time, so the
    // plan is a single hash exchange on (user_id) + session merge, no
    // window-function pass. A new session starts when the gap is >= the
    // duration (window extent is [start, last + gap)).
    "evt_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
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
    "mr_funnel" -> ((s, dir) => Tables.sql(s, dir,
      """SELECT user_id, match_num, start_ts, end_ts, n_clicks
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS match_num,
        |           FIRST(ts) AS start_ts,
        |           LAST(ts) AS end_ts,
        |           count(C.*) AS n_clicks
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ P)
        |  DEFINE V AS event_type = 'view',
        |         C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)),

    // MATCH_RECOGNIZE with alternation: V (C|E)+ P — clicks OR errors
    // between view and purchase (pattern parser: grouping + `|`)
    "mr_alternation" -> ((s, dir) => Tables.sql(s, dir,
      """SELECT user_id, match_num, n_mid
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS match_num, count(*) - 2 AS n_mid
        |  ONE ROW PER MATCH
        |  PATTERN (V (C|E)+ P)
        |  DEFINE V AS event_type = 'view',
        |         C AS event_type = 'click',
        |         E AS event_type = 'error',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)),

    // SUBSET union variable + AFTER MATCH SKIP TO LAST <variable>: U
    // unions the interior symbols, the measure counts via the subset, and
    // the skip resumes at U's last row (provably the same match set as
    // SKIP PAST LAST ROW on this pattern — no 'view' can occur inside the
    // resumed span — so the alternation oracle pins the result)
    "mr_subset_skip" -> ((s, dir) => Tables.sql(s, dir,
      """SELECT user_id, match_num, n_mid
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS match_num, count(U.*) AS n_mid
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO LAST U
        |  PATTERN (V (C|E)+ P)
        |  SUBSET U = (C, E)
        |  DEFINE V AS event_type = 'view',
        |         C AS event_type = 'click',
        |         E AS event_type = 'error',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)),

    // ALL ROWS PER MATCH: every matched row with its CLASSIFIER()
    "mr_all_rows" -> ((s, dir) => Tables.sql(s, dir,
      """SELECT user_id, event_id, cls, match_num
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS match_num
        |  ALL ROWS PER MATCH
        |  PATTERN (V C+ P)
        |  DEFINE V AS event_type = 'view',
        |         C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)),

    // PREV navigation in DEFINE: maximal strictly-ascending value runs
    // (R defined as value > PREV(value), physical-row navigation)
    "mr_prev_runs" -> ((s, dir) => Tables.sql(s, dir,
      """SELECT user_id, match_num, n_rows
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS match_num, count(*) AS n_rows
        |  ONE ROW PER MATCH
        |  PATTERN (S R+)
        |  DEFINE R AS value > PREV(value)
        |)""".stripMargin)),

    // AFTER MATCH SKIP TO NEXT ROW: overlapping consecutive click pairs
    "mr_skip_next" -> ((s, dir) => Tables.sql(s, dir,
      """SELECT user_id, start_event
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(event_id) AS start_event
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (C C2)
        |  DEFINE C AS event_type = 'click',
        |         C2 AS event_type = 'click'
        |)""".stripMargin)),

    // bounded quantifier {n,m} (SqlBase.g4 patternQuantifier): 2-3 clicks
    // then a purchase. SKIP TO NEXT ROW makes every start independent, so
    // greedy {2,3} is window-derivable: prefer 3 clicks + P, else 2 + P
    "mr_bounded" -> ((s, dir) => Tables.sql(s, dir,
      """SELECT user_id, match_num, start_event, n_clicks
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS match_num,
        |           FIRST(event_id) AS start_event,
        |           count(C.*) AS n_clicks
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (C{2,3} P)
        |  DEFINE C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)),

    // empty matches (SQL-2016 7.11: ONE ROW PER MATCH summarizes every
    // match, empty ones included): PATTERN (C*) makes each maximal click
    // run one match and every other position an EMPTY match with count 0
    // — match numbering covers both
    "mr_empty" -> ((s, dir) => Tables.sql(s, dir,
      """SELECT user_id, match_num, n_clicks
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS match_num, count(*) AS n_clicks
        |  ONE ROW PER MATCH
        |  PATTERN (C*)
        |  DEFINE C AS event_type = 'click'
        |)""".stripMargin)),

    // JSON property extraction + aggregation (props is a JSON string)
    "evt_json_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(avg("k").as("avg_k"), min("k").as("min_k"), max("k").as("max_k"),
          count_if(col("k").isNull).as("n_null_k"))
    }))

  val oracles: Map[String, String] = Map(
    // the streamed Complete-mode aggregate equals the batch aggregate —
    // window('1 hour') epoch-aligns to date_trunc('hour') buckets
    "stream_windowed_agg" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |count(*) AS n, sum(value) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_interval_join" ->
      """SELECT c.user_id, i.event_id AS impression_id, c.event_id AS click_id,
        |i.ts AS i_ts, c.ts AS c_ts
        |FROM events c JOIN events i ON c.user_id = i.user_id
        |WHERE c.event_type = 'click' AND i.event_type = 'view'
        |AND i.ts <= c.ts AND i.ts >= c.ts - INTERVAL 1 HOUR""".stripMargin,
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
    // gaps-and-islands at MICROSECOND precision with the session-window
    // boundary rule (gap >= duration starts a new session) — exactly the
    // comparison Spark's SessionWindow makes after the nanos->micros
    // truncation both engines apply on read
    "evt_session_window" ->
      """WITH m AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
        |    lag(epoch_ns(ts) // 1000) OVER w AS prev_us
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |marked AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM m),
        |sessioned AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |per_session AS (
        |  SELECT user_id, sid, count(*) AS n_events
        |  FROM sessioned GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS longest_session_events
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
    // same disjointness argument as mr_funnel, interior = click|error
    "mr_alternation" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |x AS (
        |  SELECT *,
        |    max(CASE WHEN event_type NOT IN ('click', 'error') THEN rn END) OVER w1 AS prev_nm_rn,
        |    last_value(CASE WHEN event_type NOT IN ('click', 'error') THEN event_type END IGNORE NULLS) OVER w1 AS prev_nm_type
        |  FROM e WINDOW w1 AS (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (
        |  SELECT user_id, rn, rn - prev_nm_rn - 1 AS n_mid
        |  FROM x WHERE event_type = 'purchase' AND prev_nm_type = 'view'
        |    AND rn - prev_nm_rn >= 2)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY rn) AS match_num, n_mid
        |FROM m""".stripMargin,
    // same derivation as mr_alternation (see query comment for why the
    // subset/skip variant yields the identical match set)
    "mr_subset_skip" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |x AS (
        |  SELECT *,
        |    max(CASE WHEN event_type NOT IN ('click', 'error') THEN rn END) OVER w1 AS prev_nm_rn,
        |    last_value(CASE WHEN event_type NOT IN ('click', 'error') THEN event_type END IGNORE NULLS) OVER w1 AS prev_nm_type
        |  FROM e WINDOW w1 AS (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (
        |  SELECT user_id, rn, rn - prev_nm_rn - 1 AS n_mid
        |  FROM x WHERE event_type = 'purchase' AND prev_nm_type = 'view'
        |    AND rn - prev_nm_rn >= 2)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY rn) AS match_num, n_mid
        |FROM m""".stripMargin,
    // funnel matches expanded to their member rows with classifiers
    "mr_all_rows" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |x AS (
        |  SELECT *,
        |    max(CASE WHEN event_type <> 'click' THEN rn END) OVER w1 AS prev_nc_rn,
        |    last_value(CASE WHEN event_type <> 'click' THEN event_type END IGNORE NULLS) OVER w1 AS prev_nc_type
        |  FROM e WINDOW w1 AS (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (
        |  SELECT user_id, prev_nc_rn AS srn, rn AS ern
        |  FROM x WHERE event_type = 'purchase' AND prev_nc_type = 'view'
        |    AND rn - prev_nc_rn >= 2),
        |mm AS (
        |  SELECT user_id, srn, ern,
        |    row_number() OVER (PARTITION BY user_id ORDER BY srn) AS match_num
        |  FROM m)
        |SELECT mm.user_id, e.event_id,
        |  CASE WHEN e.rn = mm.srn THEN 'V' WHEN e.rn = mm.ern THEN 'P' ELSE 'C' END AS cls,
        |  mm.match_num
        |FROM mm JOIN e ON e.user_id = mm.user_id AND e.rn BETWEEN mm.srn AND mm.ern""".stripMargin,
    // ascending runs via lag + break cumsum ≡ S (R: value > PREV(value))+
    "mr_prev_runs" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER w AS rn,
        |    CASE WHEN lag(value) OVER w IS NULL OR value <= lag(value) OVER w
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT user_id, rn,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS run_id FROM e),
        |runs AS (
        |  SELECT user_id, run_id, count(*) AS n_rows, min(rn) AS srn
        |  FROM r GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY srn) AS match_num, n_rows
        |FROM runs""".stripMargin,
    // SKIP TO NEXT ROW ⇒ starts are independent; greedy C{2,3} P at rn
    // matches 3 clicks + purchase first, else 2 clicks + purchase
    "mr_bounded" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER w AS rn,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2,
        |    lead(event_type, 3) OVER w AS t3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |m AS (
        |  SELECT user_id, rn, event_id AS start_event,
        |    CASE WHEN event_type = 'click' AND t1 = 'click' AND t2 = 'click'
        |           AND t3 = 'purchase' THEN 3::bigint
        |         WHEN event_type = 'click' AND t1 = 'click'
        |           AND t2 = 'purchase' THEN 2::bigint END AS n_clicks
        |  FROM e)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY rn) AS match_num,
        |  start_event, n_clicks
        |FROM m WHERE n_clicks IS NOT NULL""".stripMargin,
    // empty matches: one group per maximal click run (count = length)
    // plus one zero-count group per non-click row, numbered by position
    "mr_empty" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS c,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN c = 0
        |      OR lag(c, 1, 0) OVER (PARTITION BY user_id ORDER BY rn) = 0
        |    THEN 1 ELSE 0 END AS is_start
        |  FROM e),
        |m AS (
        |  SELECT user_id, rn, c,
        |    sum(is_start) OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |  FROM s),
        |agg AS (
        |  SELECT user_id, grp, min(rn) AS start_rn,
        |    CASE WHEN max(c) = 0 THEN 0::bigint ELSE count(*) END AS n_clicks
        |  FROM m GROUP BY user_id, grp)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY start_rn) AS match_num,
        |  n_clicks
        |FROM agg""".stripMargin,
    // overlapping pairs: every click whose successor is also a click
    "mr_skip_next" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events)
        |SELECT user_id, event_id AS start_event
        |FROM e WHERE event_type = 'click' AND nxt = 'click'""".stripMargin,
    "evt_json_agg" ->
      """SELECT event_type, avg(k) AS avg_k, min(k) AS min_k, max(k) AS max_k,
        |count(*) FILTER (WHERE k IS NULL) AS n_null_k
        |FROM (SELECT event_type, json_extract_string(props, '$.k')::bigint AS k
        |      FROM events) t GROUP BY 1""".stripMargin)
}
