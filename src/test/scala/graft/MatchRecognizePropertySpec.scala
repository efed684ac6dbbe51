package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.MatchRecognize
import graft.operators.MatchRecognize.{Ctx, SkipMode, SkipPastLastRow, SkipToNextRow}

/** Seeded randomized property check for the MATCH_RECOGNIZE matcher:
  * random patterns (concatenation, two-way alternation, greedy and
  * reluctant quantifiers, bounded repetition) over random letter rows,
  * compared against an independent continuation-passing backtracking
  * model of SQL-2016 preferment order (greedy tries longer first,
  * reluctant shorter first, alternation left first, concatenation
  * backtracks), with both AFTER MATCH SKIP modes and empty-match
  * advancement (an empty match consumes no rows and resumes at the next
  * row). Anchors/PERMUTE/exclusion have their own targeted specs; the
  * sweep hammers the quantifier/alternation/skip interplay where
  * preferment bugs live. Quantified atoms are non-nullable by
  * construction so the model's zero-width repetition guard is never the
  * deciding semantics.
  */
class MatchRecognizePropertySpec extends GraftSuite {

  private val rnd = new scala.util.Random(90210L)

  // ----------------------------------------------------- pattern model

  private sealed trait P
  private case class S(c: Char) extends P
  private case class Cat(ps: List[P]) extends P
  private case class Alt(l: P, r: P) extends P
  private case class Q(p: P, min: Int, max: Int, rel: Boolean) extends P // max<0 = ∞

  private def render(p: P): String = p match {
    case S(c) => c.toString
    case Cat(ps) => ps.map(render).mkString(" ")
    case Alt(l, r) => s"(${render(l)} | ${render(r)})"
    case Q(p0, min, max, rel) =>
      val base = p0 match {
        case S(c) => c.toString
        case other => s"(${render(other)})"
      }
      val q = (min, max) match {
        case (0, 1) => "?"
        case (0, -1) => "*"
        case (1, -1) => "+"
        case (a, -1) => s"{$a,}"
        case (a, b) if a == b => s"{$a}"
        case (a, b) => s"{$a,$b}"
      }
      base + q + (if (rel && max != min) "?" else "")
  }

  /** Preferred match end (exclusive) for `p` at `pos`, or None. */
  private def m(p: P, pos: Int, s: String)(k: Int => Option[Int]): Option[Int] = p match {
    case S(c) =>
      if (pos < s.length && s.charAt(pos) == Character.toLowerCase(c)) k(pos + 1) else None
    case Cat(Nil) => k(pos)
    case Cat(h :: t) => m(h, pos, s)(p2 => m(Cat(t), p2, s)(k))
    case Alt(l, r) => m(l, pos, s)(k).orElse(m(r, pos, s)(k))
    case Q(p0, min, max, rel) =>
      def more(cnt: Int, at: Int): Option[Int] = {
        def tryMore: Option[Int] =
          if (max >= 0 && cnt >= max) None
          else m(p0, at, s)(p2 => if (p2 == at) None else more(cnt + 1, p2))
        def tryStop: Option[Int] = if (cnt >= min) k(at) else None
        if (rel) tryStop.orElse(tryMore) else tryMore.orElse(tryStop)
      }
      more(0, pos)
  }

  /** (matchNumber, startIdx or -1 for empty, length) per the skip mode. */
  private def modelMatches(pat: P, s: String, skip: SkipMode): Seq[(Long, Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long, Long)]
    var i = 0
    var n = 0L
    // matches start AT rows — there is no probe past the last row
    while (i < s.length) {
      m(pat, i, s)(Some(_)) match {
        case Some(end) =>
          n += 1
          out += ((n, if (end == i) -1L else i.toLong, (end - i).toLong))
          i = skip match {
            case SkipToNextRow => i + 1
            case _ => if (end > i) end else i + 1 // empty match advances one
          }
        case None => i += 1
      }
    }
    out.result()
  }

  // --------------------------------------------------------- generator

  private def rndSym(): S = S("ABC".charAt(rnd.nextInt(3)))

  private def rndAtom(): P =
    if (rnd.nextInt(4) == 0) Alt(rndSym(), rndSym()) else rndSym()

  private def rndTerm(): P = {
    val a = rndAtom()
    rnd.nextInt(8) match {
      case 0 => Q(a, 0, 1, rel = false) // ?
      case 1 => Q(a, 0, -1, rel = false) // *
      case 2 => Q(a, 1, -1, rel = false) // +
      case 3 => Q(a, 0, -1, rel = true) // *?
      case 4 => Q(a, 1, -1, rel = true) // +?
      case 5 =>
        val lo = rnd.nextInt(3); val hi = lo + rnd.nextInt(3)
        Q(a, lo, hi, rel = rnd.nextBoolean())
      case _ => a
    }
  }

  private def rndPattern(): P = {
    val terms = List.fill(1 + rnd.nextInt(3))(rndTerm())
    // alternation between two sub-sequences at the top sometimes
    if (rnd.nextInt(4) == 0)
      Alt(Cat(terms), Cat(List.fill(1 + rnd.nextInt(2))(rndTerm())))
    else Cat(terms)
  }

  private def rndRows(len: Int): String =
    (0 until len).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString

  // ----------------------------------------------------------- driving

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("seq", LongType),
    StructField("s", StringType)))
  private val outSchema = StructType(Seq(
    StructField("k", LongType), StructField("mn", LongType),
    StructField("start", LongType), StructField("len", LongType)))
  private val define: Map[String, Ctx => Boolean] = Map(
    "A" -> (c => c.row.getString(2) == "a"),
    "B" -> (c => c.row.getString(2) == "b"),
    "C" -> (c => c.row.getString(2) == "c"))

  private def engineMatches(pattern: String, rows: String,
      skip: SkipMode): Seq[(Long, Long, Long)] = {
    val data = rows.zipWithIndex.map { case (ch, i) => Row(0L, i.toLong, ch.toString) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
    MatchRecognize.oneRowPerMatch(
      df, Seq("k"), Seq("seq"), pattern, define,
      measures = (key, mm) => Row(key.getLong(0), mm.matchNumber,
        if (mm.rows.isEmpty) -1L else mm.rows.head.getLong(1), mm.rows.length.toLong),
      outSchema = outSchema, afterMatchSkip = skip)
      .collect().toSeq.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
  }

  test("90 random pattern x rows x skip cases match the backtracking model") {
    (0 until 90).foreach { i =>
      val pat = rndPattern()
      val rows = rndRows(8 + rnd.nextInt(9))
      val skip = if (rnd.nextBoolean()) SkipPastLastRow else SkipToNextRow
      val exp = modelMatches(pat, rows, skip)
      val got = engineMatches(render(pat), rows, skip)
      assert(got === exp,
        s"case $i: pattern `${render(pat)}` rows `$rows` skip $skip\n" +
          s"got=$got\nexp=$exp")
    }
  }
}
