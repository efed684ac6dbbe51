package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.MatchRecognize
import graft.operators.MatchRecognize._

/** Matcher semantics over hand-built sequences (reference analog:
  * `operator/window/matcher/TestMatcher.java`-style NFA unit tests).
  */
class MatchRecognizeSpec extends GraftSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("seq", LongType),
    StructField("sym", StringType)))
  private val outSchema = StructType(Seq(
    StructField("k", LongType), StructField("n", LongType),
    StructField("start_seq", LongType), StructField("len", LongType)))

  private def df(events: Seq[(Long, Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(events.map(e => Row(e._1, e._2, e._3))), schema)

  private val define: Map[String, Ctx => Boolean] = Map(
    "A" -> (c => c.row.getString(2) == "a"),
    "B" -> (c => c.row.getString(2) == "b"),
    "C" -> (c => c.row.getString(2) == "c"))

  private def run(events: Seq[(Long, Long, String)], pattern: String,
      skip: SkipMode = SkipPastLastRow): Seq[Row] =
    MatchRecognize.oneRowPerMatch(
      df(events), Seq("k"), Seq("seq"), pattern, define,
      measures = (key, m) => Row(key.getLong(0), m.matchNumber,
        m.rows.head.getLong(1), m.rows.length.toLong),
      outSchema = outSchema, afterMatchSkip = skip
    ).collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))

  private def ev(k: Long, syms: String*): Seq[(Long, Long, String)] =
    syms.zipWithIndex.map { case (s, i) => (k, i.toLong, s) }

  test("A B+ C: greedy with skip-past-last-row") {
    val out = run(ev(1, "a", "b", "b", "c", "a", "c", "a", "b", "c"), "A B+ C")
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 4L), (6L, 3L)))
  }

  test("optional element matches with and without") {
    val out = run(ev(1, "a", "c", "a", "b", "c"), "A B? C")
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 2L), (2L, 3L)))
  }

  test("star backtracks when the greedy run consumes the closer") {
    val out = run(ev(1, "b", "b", "b", "c"), "B* C")
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 4L)))
  }

  test("alternation (A|B)+ C consumes mixed runs") {
    val out = run(ev(1, "a", "b", "a", "c", "x", "b", "c"), "(A|B)+ C")
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 4L), (5L, 2L)))
  }

  test("grouped alternation with quantifier inside concatenation") {
    // A (B|C)* A: 'a b c b a' and then 'a a' (zero mid elements)
    val out = run(ev(1, "a", "b", "c", "b", "a", "a"), "A (B|C)* A")
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 5L)))
  }

  test("partitions are independent") {
    val out = run(ev(1, "a", "b", "c") ++ ev(2, "a", "b", "c"), "A B+ C")
    assert(out.map(_.getLong(0)) == Seq(1L, 2L))
  }

  test("no match on unsatisfiable pattern") {
    assert(run(ev(1, "b", "b"), "A C").isEmpty)
  }

  test("SKIP TO NEXT ROW yields overlapping matches") {
    // b b b: pairs at 0-1 and 1-2 overlap
    val past = run(ev(1, "b", "b", "b"), "B B", SkipPastLastRow)
    val nxt = run(ev(1, "b", "b", "b"), "B B", SkipToNextRow)
    assert(past.map(_.getLong(2)) == Seq(0L))
    assert(nxt.map(_.getLong(2)) == Seq(0L, 1L))
  }

  test("PREV and NEXT navigate physical rows; edges return null") {
    val defs: Map[String, Ctx => Boolean] = Map(
      // F: first row of partition (no physical predecessor)
      "F" -> (c => c.prev(1) == null),
      // L: sym equals the NEXT row's sym (lookahead)
      "L" -> (c => { val n = c.next(1); n != null && n.getString(2) == c.row.getString(2) }))
    // x x x: F matches row 0 only (no predecessor); L at row 1 needs the
    // NEXT row to carry the same sym (row 2 = x) → single match (0, 1).
    // After skip-past-last, row 2 has a predecessor → F fails → no more.
    val out = MatchRecognize.oneRowPerMatch(
      df(ev(1, "x", "x", "x")), Seq("k"), Seq("seq"), "F L", defs,
      measures = (key, m) => Row(key.getLong(0), m.matchNumber,
        m.rows.head.getLong(1), m.rows.length.toLong),
      outSchema = outSchema).collect().toSeq
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 2L)))
  }

  test("ALL ROWS PER MATCH emits every matched row with its classifier") {
    val allSchema = StructType(Seq(
      StructField("k", LongType), StructField("seq", LongType),
      StructField("cls", StringType), StructField("n", LongType)))
    val out = MatchRecognize.allRowsPerMatch(
      df(ev(1, "a", "b", "b", "c", "x")), Seq("k"), Seq("seq"), "A B+ C", define,
      rowMeasures = (key, m, i) => Row(key.getLong(0), m.rows(i).getLong(1),
        m.classifier(i), m.matchNumber),
      outSchema = allSchema).collect().toSeq.sortBy(_.getLong(1))
    assert(out.map(r => (r.getLong(1), r.getString(2))) ==
      Seq((0L, "A"), (1L, "B"), (2L, "B"), (3L, "C")))
  }

  test("reluctant quantifier stops at the first viable end") {
    // b b b c with B+? C: reluctant consumes ONE b then needs C — fails,
    // backtracks to two, three, then C matches → still finds the match,
    // but B*? C on 'c' alone matches zero-width B
    val out = run(ev(1, "b", "b", "b", "c"), "B+? C")
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 4L)))
    val out2 = run(ev(1, "c", "b", "c"), "B*? C")
    // at 0: zero Bs then C matches (len 1); at 1: b then c (len 2)
    assert(out2.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 1L), (1L, 2L)))
  }

  test("PERMUTE matches any ordering with lexicographic preference") {
    val out = run(ev(1, "b", "a", "c", "x", "a", "b", "c"), "PERMUTE(A, B, C)")
    // b a c matches ordering (B, A, C); a b c matches (A, B, C)
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 3L), (4L, 3L)))
  }

  test("pattern parser round-trips the supported grammar") {
    assert(parsePattern("A B+ C") ==
      Cat(List(Sym("A"), Quant(Sym("B"), 1, None), Sym("C"))))
    assert(parsePattern("(A|B)* C?") ==
      Cat(List(Quant(Alt(List(Sym("A"), Sym("B"))), 0, None),
        Quant(Sym("C"), 0, Some(1)))))
    assert(parsePattern("V (C|E)+ P") ==
      Cat(List(Sym("V"), Quant(Alt(List(Sym("C"), Sym("E"))), 1, None), Sym("P"))))
    // bounded quantifiers (SqlBase.g4 patternQuantifier)
    assert(parsePattern("B{2,4}") == Quant(Sym("B"), 2, Some(4)))
    assert(parsePattern("B{3}") == Quant(Sym("B"), 3, Some(3)))
    assert(parsePattern("B{2,}") == Quant(Sym("B"), 2, None))
    assert(parsePattern("B{,3}") == Quant(Sym("B"), 0, Some(3)))
    assert(parsePattern("B{2,4}?") == Quant(Sym("B"), 2, Some(4), reluctant = true))
    // anchors + exclusion
    assert(parsePattern("^ A $") == Cat(List(AnchorStart, Sym("A"), AnchorEnd)))
    assert(parsePattern("A {- B+ -} C") ==
      Cat(List(Sym("A"), Excl(Quant(Sym("B"), 1, None)), Sym("C"))))
    intercept[IllegalArgumentException](parsePattern("B{4,2}"))
    intercept[IllegalArgumentException](parsePattern("B{}"))
  }

  test("bounded quantifier B{2,3}: greedy within bounds, rejects under-min") {
    // run of 4 bs then c: B{2,3} C needs exactly the last 3 bs + c? No —
    // greedy takes 3 from the start, then C fails on the 4th b, backtrack
    // to 2, C fails again → no match at 0; at 1: b b b c → 3 bs + c ✓
    val out = run(ev(1, "b", "b", "b", "b", "c"), "B{2,3} C")
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((1L, 4L)))
    // a single b cannot satisfy min=2
    assert(run(ev(1, "b", "c"), "B{2,3} C").isEmpty)
    // exact count {2}
    val out2 = run(ev(1, "b", "b", "c"), "B{2} C")
    assert(out2.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 3L)))
  }

  test("anchors: ^ pins to partition start, $ to partition end") {
    val out = run(ev(1, "a", "b", "a", "b"), "^ A B")
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 2L)))
    val out2 = run(ev(1, "a", "b", "a", "b"), "A B $")
    assert(out2.map(r => (r.getLong(2), r.getLong(3))) == Seq((2L, 2L)))
    // both anchors: whole-partition match only
    assert(run(ev(1, "a", "b", "x"), "^ A B $").isEmpty)
    assert(run(ev(1, "a", "b"), "^ A B $").map(r => (r.getLong(2), r.getLong(3))) ==
      Seq((0L, 2L)))
  }

  test("exclusion {- -}: rows matched but omitted from ALL ROWS output") {
    val allSchema = StructType(Seq(
      StructField("k", LongType), StructField("seq", LongType),
      StructField("cls", StringType), StructField("n", LongType)))
    val out = MatchRecognize.allRowsPerMatch(
      df(ev(1, "a", "b", "b", "c")), Seq("k"), Seq("seq"), "A {- B+ -} C", define,
      rowMeasures = (key, m, i) => Row(key.getLong(0), m.rows(i).getLong(1),
        m.classifier(i), m.matchNumber),
      outSchema = allSchema).collect().toSeq.sortBy(_.getLong(1))
    // B rows are matched (match spans 4 rows) but not emitted
    assert(out.map(r => (r.getLong(1), r.getString(2))) == Seq((0L, "A"), (3L, "C")))
    // ONE ROW PER MATCH still sees the full span
    val one = run(ev(1, "a", "b", "b", "c"), "A {- B+ -} C")
    assert(one.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 4L)))
  }

  test("WITH UNMATCHED ROWS emits non-matching rows with null measures") {
    val allSchema = StructType(Seq(
      StructField("k", LongType), StructField("seq", LongType),
      StructField("cls", StringType), StructField("n", LongType)))
    val out = MatchRecognize.allRowsPerMatch(
      df(ev(1, "x", "a", "b", "x", "a", "b")), Seq("k"), Seq("seq"), "A B", define,
      rowMeasures = (key, m, i) => Row(key.getLong(0), m.rows(i).getLong(1),
        m.classifier(i), m.matchNumber),
      outSchema = allSchema,
      unmatched = Some(row => Row(row.getLong(0), row.getLong(1), null, null))
    ).collect().toSeq.sortBy(_.getLong(1))
    assert(out.map(r => (r.getLong(1), r.getString(2))) ==
      Seq((0L, null), (1L, "A"), (2L, "B"), (3L, null), (4L, "A"), (5L, "B")))
  }

  test("PREV beyond the retained tail fails loudly instead of matching wrong") {
    val defs: Map[String, Ctx => Boolean] = Map(
      "D" -> (c => c.prev(20) == null)) // deeper than default prevTail = 8
    val ex = intercept[org.apache.spark.SparkException] {
      MatchRecognize.oneRowPerMatch(
        df((0 until 40).map(i => (1L, i.toLong, "a"))), Seq("k"), Seq("seq"),
        "A D", defs ++ define,
        measures = (key, m) => Row(key.getLong(0), m.matchNumber,
          m.rows.head.getLong(1), m.rows.length.toLong),
        outSchema = outSchema).collect()
    }
    assert(ex.getMessage.contains("prevTail") ||
      Option(ex.getCause).exists(_.getMessage.contains("prevTail")), ex.getMessage)
  }

  test("one hot key with 50k rows streams without whole-group buffering") {
    // alternating a b a b ... : every (a, b) pair matches A B → 12500
    // matches after skip-past-last; the streaming buffer never needs more
    // than the current match span, so this completes in bounded memory
    val n = 50000
    val events = (0 until n).map(i => (7L, i.toLong, if (i % 2 == 0) "a" else "b"))
    val out = run(events, "A B")
    assert(out.length == n / 2)
    assert(out.map(_.getLong(3)).forall(_ == 2L))
  }
}
