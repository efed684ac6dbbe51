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

  private def run(events: Seq[(Long, Long, String)], pattern: Seq[Step]): Seq[Row] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(events.map(e => Row(e._1, e._2, e._3))), schema)
    MatchRecognize.oneRowPerMatch(
      df,
      partitionKey = _.getLong(0),
      orderKey = r => (r.getLong(1), r.getLong(1)),
      pattern = pattern,
      define = Map(
        "A" -> (r => r.getString(2) == "a"),
        "B" -> (r => r.getString(2) == "b"),
        "C" -> (r => r.getString(2) == "c")),
      measures = (k, m) => Row(k, m.matchNumber.toLong,
        m.rows.head.getLong(1), m.rows.length.toLong),
      outSchema = outSchema
    ).collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
  }

  private def ev(k: Long, syms: String*): Seq[(Long, Long, String)] =
    syms.zipWithIndex.map { case (s, i) => (k, i.toLong, s) }

  test("A B+ C: greedy with skip-past-last-row") {
    val out = run(ev(1, "a", "b", "b", "c", "a", "c", "a", "b", "c"),
      Seq(Step("A"), Step("B", Plus), Step("C")))
    // match 1: a b b c (len 4 at 0); "a c" has no click → no match;
    // match 2: a b c (len 3 at 6)
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 4L), (6L, 3L)))
  }

  test("optional element matches with and without") {
    val out = run(ev(1, "a", "c", "a", "b", "c"),
      Seq(Step("A"), Step("B", Opt), Step("C")))
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 2L), (2L, 3L)))
  }

  test("star backtracks when the greedy run consumes the closer") {
    // B* is greedy but C must still match: b b b c with pattern B* C
    val out = run(ev(1, "b", "b", "b", "c"), Seq(Step("B", Star), Step("C")))
    assert(out.map(r => (r.getLong(2), r.getLong(3))) == Seq((0L, 4L)))
  }

  test("partitions are independent") {
    val out = run(ev(1, "a", "b", "c") ++ ev(2, "a", "b", "c"),
      Seq(Step("A"), Step("B", Plus), Step("C")))
    assert(out.map(_.getLong(0)) == Seq(1L, 2L))
  }

  test("no match on unsatisfiable pattern") {
    val out = run(ev(1, "b", "b"), Seq(Step("A"), Step("C")))
    assert(out.isEmpty)
  }
}
