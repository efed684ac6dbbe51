package graft

import org.apache.spark.sql.Row
import graft.engine.Tables
import graft.sqlcompat.MatchRecognizeSql

/** SQL-text MATCH_RECOGNIZE (reference grammar `SqlBase.g4:329-331`):
  * the Trino spelling parsed + lowered onto the row-pattern operator,
  * cross-checked against the equivalent direct API calls.
  */
class MatchRecognizeSqlSpec extends GraftSuite {

  private def sql(q: String) = Tables.sql(spark, sfTiny, q)

  test("ONE ROW PER MATCH funnel: SQL spelling matches API result") {
    import org.apache.spark.sql.types._
    import graft.operators.MatchRecognize
    val viaSql = sql(
      """SELECT user_id, match_num, n_clicks
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS match_num, count(C.*) AS n_clicks
        |  ONE ROW PER MATCH
        |  PATTERN (V C+ P)
        |  DEFINE V AS event_type = 'view', C AS event_type = 'click',
        |         P AS event_type = 'purchase')""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val e = Tables.load(spark, sfTiny, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_type"))
    def typeIs(t: String)(c: MatchRecognize.Ctx) = c.row.getAs[String]("event_type") == t
    val viaApi = MatchRecognize.oneRowPerMatch(
      e, Seq("user_id"), Seq("ts", "event_id"), "V C+ P",
      Map("V" -> typeIs("view"), "C" -> typeIs("click"), "P" -> typeIs("purchase")),
      (key, m) => Row(key.getAs[Long]("user_id"), m.matchNumber, m.rowsOf("C").length.toLong),
      StructType(Seq(StructField("user_id", LongType), StructField("match_num", LongType),
        StructField("n_clicks", LongType))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaSql.nonEmpty && viaSql.sameElements(viaApi))
  }

  test("ALL ROWS PER MATCH exposes input columns plus measures") {
    val rows = sql(
      """SELECT user_id, event_id, cls, match_num
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS match_num
        |  ALL ROWS PER MATCH
        |  PATTERN (V P)
        |  DEFINE V AS event_type = 'view', P AS event_type = 'purchase')""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(2)).toSet == Set("V", "P"))
  }

  test("DEFINE with PREV navigation and arithmetic") {
    val runs = sql(
      """SELECT user_id, n_rows
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES count(*) AS n_rows
        |  ONE ROW PER MATCH
        |  PATTERN (S R+)
        |  DEFINE R AS value > PREV(value) + 0.0)""".stripMargin).collect()
    assert(runs.nonEmpty)
    assert(runs.forall(_.getLong(1) >= 2)) // S plus at least one R
  }

  test("subquery input relation and AFTER MATCH SKIP TO NEXT ROW") {
    val rows = sql(
      """SELECT user_id, start_event
        |FROM (SELECT * FROM events WHERE event_type IN ('click', 'view'))
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES FIRST(event_id) AS start_event
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (C C2)
        |  DEFINE C AS event_type = 'click', C2 AS event_type = 'click')""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
  }

  test("outer query can aggregate over the MATCH_RECOGNIZE view") {
    val agg = sql(
      """SELECT count(*) AS n_funnels, max(n_clicks) AS most_clicks
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES count(C.*) AS n_clicks
        |  ONE ROW PER MATCH
        |  PATTERN (V C+ P)
        |  DEFINE V AS event_type = 'view', C AS event_type = 'click',
        |         P AS event_type = 'purchase')""".stripMargin).collect().head
    assert(agg.getLong(0) > 0 && agg.getLong(1) >= 1)
  }

  test("measures: FIRST/LAST values and symbol-qualified column refs") {
    val rows = sql(
      """SELECT user_id, start_ts, end_ts, p_event
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES FIRST(ts) AS start_ts, LAST(ts) AS end_ts,
        |           P.event_id AS p_event
        |  ONE ROW PER MATCH
        |  PATTERN (V P)
        |  DEFINE V AS event_type = 'view', P AS event_type = 'purchase')""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getTimestamp(1).after(r.getTimestamp(2))))
  }

  test("SUBSET union variable drives measures and SKIP TO LAST") {
    val rows = sql(
      """SELECT user_id, n_mid
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES count(U.*) AS n_mid
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO LAST U
        |  PATTERN (V (C|E)+ P)
        |  SUBSET U = (C, E)
        |  DEFINE V AS event_type = 'view', C AS event_type = 'click',
        |         E AS event_type = 'error', P AS event_type = 'purchase')""".stripMargin)
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) >= 1))
  }

  test("SKIP TO LAST finds overlapping matches PAST LAST misses") {
    // x y y: PAST LAST sees only (x y); SKIP TO LAST B resumes AT the
    // first match's y, which can itself start a new (y y) match
    def run(skip: String) = sql(
      s"""SELECT k, mn, n FROM (
         |  SELECT * FROM VALUES (1, 1, 'x'), (1, 2, 'y'), (1, 3, 'y') AS t(k, seq, sym))
         |MATCH_RECOGNIZE (
         |  PARTITION BY k ORDER BY seq
         |  MEASURES MATCH_NUMBER() AS mn, count(*) AS n
         |  ONE ROW PER MATCH
         |  AFTER MATCH $skip
         |  PATTERN (A B)
         |  DEFINE A AS sym IN ('x', 'y'), B AS sym = 'y')""".stripMargin)
      .collect().map(r => r.getLong(2)).sorted.toSeq
    assert(run("SKIP PAST LAST ROW") == Seq(2L)) // one match: (x y)
    assert(run("SKIP TO LAST B") == Seq(2L, 2L)) // overlap: (x y), (y y)
  }

  test("SKIP TO FIRST at the match start raises the loop-protection error") {
    val e = intercept[Exception](sql(
      """SELECT k, n FROM (
        |  SELECT * FROM VALUES (1, 1, 'a'), (1, 2, 'b') AS t(k, seq, sym))
        |MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES count(*) AS n ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO FIRST A
        |  PATTERN (A B) DEFINE A AS sym = 'a', B AS sym = 'b')""".stripMargin).collect())
    assert(e.getMessage != null)
  }

  test("RUNNING vs FINAL measures in ALL ROWS PER MATCH") {
    val rows = sql(
      """SELECT seq, n_run, n_fin FROM (
        |  SELECT * FROM VALUES (1, 1, 'a'), (1, 2, 'a'), (1, 3, 'b') AS t(k, seq, sym))
        |MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES RUNNING count(*) AS n_run, FINAL count(*) AS n_fin
        |  ALL ROWS PER MATCH
        |  PATTERN (A+ B)
        |  DEFINE A AS sym = 'a', B AS sym = 'b')""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // RUNNING counts rows so far (the ALL ROWS default); FINAL sees the whole match
    assert(rows.toSeq == Seq((1, 1L, 3L), (2, 2L, 3L), (3, 3L, 3L)))
  }

  test("bounded quantifier {n,m} via SQL text") {
    val rows = sql(
      """SELECT start_seq, n FROM (
        |  SELECT * FROM VALUES (1, 1, 'b'), (1, 2, 'b'), (1, 3, 'b'), (1, 4, 'b'),
        |    (1, 5, 'c') AS t(k, seq, sym))
        |MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(seq) AS start_seq, count(B.*) AS n
        |  ONE ROW PER MATCH
        |  PATTERN (B{2,3} C)
        |  DEFINE B AS sym = 'b', C AS sym = 'c')""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // greedy: at seq=1 three bs then C fails (seq=4 is b), backtrack — no
    // match until seq=2: b b b c
    assert(rows == Seq((2, 3L)))
  }

  test("exclusion {- -} omits rows from ALL ROWS output via SQL text") {
    val rows = sql(
      """SELECT seq, cls FROM (
        |  SELECT * FROM VALUES (1, 1, 'a'), (1, 2, 'b'), (1, 3, 'b'), (1, 4, 'c')
        |    AS t(k, seq, sym))
        |MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES CLASSIFIER() AS cls
        |  ALL ROWS PER MATCH
        |  PATTERN (A {- B+ -} C)
        |  DEFINE A AS sym = 'a', B AS sym = 'b', C AS sym = 'c')""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1, "A"), (4, "C")))
  }

  test("ALL ROWS PER MATCH WITH UNMATCHED ROWS emits null-measure rows") {
    val rows = sql(
      """SELECT seq, cls, match_num FROM (
        |  SELECT * FROM VALUES (1, 1, 'x'), (1, 2, 'a'), (1, 3, 'b'), (1, 4, 'x')
        |    AS t(k, seq, sym))
        |MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS match_num
        |  ALL ROWS PER MATCH WITH UNMATCHED ROWS
        |  PATTERN (A B)
        |  DEFINE A AS sym = 'a', B AS sym = 'b')""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1, null), (2, "A"), (3, "B"), (4, null)))
  }

  test("anchors ^ $ via SQL text") {
    val rows = sql(
      """SELECT start_seq FROM (
        |  SELECT * FROM VALUES (1, 1, 'a'), (1, 2, 'b'), (1, 3, 'a'), (1, 4, 'b')
        |    AS t(k, seq, sym))
        |MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(seq) AS start_seq
        |  ONE ROW PER MATCH
        |  PATTERN (A B $)
        |  DEFINE A AS sym = 'a', B AS sym = 'b')""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    // only the partition-final A B matches the $-anchored pattern
    assert(rows == Seq(3))
  }

  test("empty matches: ONE ROW PER MATCH summarizes them; count 0, null measures") {
    // PATTERN (A*): greedy runs of 'a' are one match each; every other
    // position is an EMPTY match — numbered, count 0 (SQL-2016 7.11)
    val rows = sql(
      """SELECT match_num, n, first_seq FROM (
        |  SELECT * FROM VALUES (1, 1, 'a'), (1, 2, 'a'), (1, 3, 'x'), (1, 4, 'a'), (1, 5, 'y')
        |    AS t(k, seq, sym))
        |MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES MATCH_NUMBER() AS match_num, count(*) AS n, FIRST(A.seq) AS first_seq
        |  ONE ROW PER MATCH
        |  PATTERN (A*)
        |  DEFINE A AS sym = 'a')""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).sortBy(_._1).toSeq
    // match 1: rows 1-2 (run of a); match 2: empty at row 3;
    // match 3: row 4; match 4: empty at row 5
    assert(rows == Seq((1L, 2L, 1), (2L, 0L, -1), (3L, 1L, 4), (4L, 0L, -1)))
  }

  test("empty matches: ALL ROWS shows them by default, OMIT EMPTY MATCHES drops them") {
    val q = (mode: String) =>
      s"""SELECT seq, match_num, cls FROM (
         |  SELECT * FROM VALUES (1, 1, 'a'), (1, 2, 'x'), (1, 3, 'a')
         |    AS t(k, seq, sym))
         |MATCH_RECOGNIZE (
         |  PARTITION BY k ORDER BY seq
         |  MEASURES MATCH_NUMBER() AS match_num, CLASSIFIER() AS cls
         |  ALL ROWS PER MATCH $mode
         |  PATTERN (A*)
         |  DEFINE A AS sym = 'a')""".stripMargin
    val shown = sql(q("")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    // empty match at seq 2 emits its starting row with null classifier
    assert(shown == Seq((1, 1L, "A"), (2, 2L, null), (3, 3L, "A")))
    // match numbering still counts the omitted empty match (SQL-2016)
    val omitted = sql(q("OMIT EMPTY MATCHES")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(omitted == Seq((1, 1L, "A"), (3, 3L, "A")))
  }

  test("unsupported constructs raise descriptive errors") {
    val e1 = intercept[Exception](sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES count(*) AS n ONE ROW PER MATCH
        |  AFTER MATCH SKIP HALF PAST TEN
        |  PATTERN (C) DEFINE C AS event_type = 'click')""".stripMargin).collect())
    assert(e1.getMessage.contains("not supported"))
    val e2 = intercept[Exception](sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES count(*) AS n ONE ROW PER MATCH
        |  PATTERN (C) DEFINE C AS event_type LIKE 'cli%')""".stripMargin).collect())
    assert(e2.getMessage.contains("supported subset"))
  }
}
