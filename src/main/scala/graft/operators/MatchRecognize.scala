package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import scala.collection.mutable.ArrayBuffer

/** Row-pattern matching — SQL MATCH_RECOGNIZE, the reference's biggest
  * capability Spark lacks (grammar `SqlBase.g4:329-331`, NFA matcher
  * `operator/window/matcher/Matcher.java`, plan node
  * `sql/planner/plan/PatternRecognitionNode.java:51`; SURVEY §2.5/§7).
  *
  * Supported:
  *   - PARTITION BY / ORDER BY (by column name)
  *   - PATTERN: concatenation, grouping, alternation `(A|B)`, greedy +
  *     reluctant quantifiers `? + * {n} {n,} {n,m} {,m}`, PERMUTE,
  *     anchors `^ $`, exclusion `{- X -}` — parsed from the SQL text
  *   - DEFINE: predicates over a navigable [[Ctx]] (current row +
  *     PREV/NEXT physical navigation, like the reference's
  *     `LogicalIndexNavigation`)
  *   - ONE ROW PER MATCH and ALL ROWS PER MATCH [WITH UNMATCHED ROWS]
  *   - AFTER MATCH SKIP PAST LAST ROW / SKIP TO NEXT ROW / TO FIRST/LAST sym
  *
  * Execution model (the 100 TB shape): `repartition(partition cols)` +
  * `sortWithinPartitions(partition ++ order cols)` + `mapPartitions`.
  * The sort is Spark's external (spillable) sort, and the matcher
  * consumes each partition as a STREAM: rows are buffered only from the
  * current match start (plus a small PREV tail) to the probe position,
  * then dropped. Memory is bounded by the longest single match, not by
  * the hottest partition key — the round-1 `flatMapGroups` version
  * buffered whole groups and would OOM on a skewed key.
  */
object MatchRecognize extends Serializable {

  // ---- pattern AST + parser -------------------------------------------

  sealed trait Pat
  final case class Sym(name: String) extends Pat
  final case class Cat(ps: List[Pat]) extends Pat
  final case class Alt(ps: List[Pat]) extends Pat
  /** Quantifier: min occurrences, optional max; `reluctant` flips the
    * preference order (fewest repetitions first — `??`/`+?`/`*?`/`{n,m}?`).
    */
  final case class Quant(p: Pat, min: Int, max: Option[Int], reluctant: Boolean = false) extends Pat
  /** `^` — matches (zero width) only at the partition start. */
  case object AnchorStart extends Pat
  /** `$` — matches (zero width) only at the partition end. */
  case object AnchorEnd extends Pat
  /** `{- X -}` exclusion: X is matched normally but its rows are omitted
    * from ALL ROWS PER MATCH output (SQL-2016; measures still see them).
    */
  final case class Excl(p: Pat) extends Pat

  /** Parse `"V (C|E)+ P?"` into a [[Pat]]. Symbols are identifiers;
    * whitespace separates concatenation; `|` alternates; `()` groups;
    * `PERMUTE(A, B, …)` expands to the alternation of all orderings in
    * lexicographical preference order (reference `SqlBase.g4:330`,
    * bounded to ≤ 6 elements like any sane planner would).
    */
  def parsePattern(s: String): Pat = {
    val toks = ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '{' && i + 1 < s.length && s.charAt(i + 1) == '-') { toks += "{-"; i += 2 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '}') { toks += "-}"; i += 2 }
      else if ("()|?+*{},^$".indexOf(c) >= 0) { toks += c.toString; i += 1 }
      else {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        require(i > start, s"bad pattern char '${s.charAt(i)}' in: $s")
        toks += s.substring(start, i)
      }
    }
    var pos = 0
    def peek: String = if (pos < toks.length) toks(pos) else null
    def next(): String = { val t = toks(pos); pos += 1; t }
    def atom(): Pat = next() match {
      case "(" =>
        val a = alt()
        require(next() == ")", s"missing ) in: $s")
        a
      case "{-" =>
        val a = alt()
        require(next() == "-}", s"missing -} in: $s")
        Excl(a)
      case "^" => AnchorStart
      case "$" => AnchorEnd
      case p if p.equalsIgnoreCase("PERMUTE") =>
        require(next() == "(", s"PERMUTE needs a parenthesized list in: $s")
        val elems = ArrayBuffer[Pat]()
        while (peek != ")") { if (peek == ",") next() else elems += term() }
        next() // ')'
        require(elems.length <= 6, s"PERMUTE limited to 6 elements in: $s")
        Alt(elems.toList.permutations.map(Cat(_)).toList)
      case sym =>
        require(sym.head.isLetter || sym.head == '_', s"bad pattern token '$sym' in: $s")
        Sym(sym)
    }
    def term(): Pat = {
      var a = atom()
      peek match {
        case "?" => next()
          if (peek == "?") { next(); a = Quant(a, 0, Some(1), reluctant = true) }
          else a = Quant(a, 0, Some(1))
        case "+" => next()
          if (peek == "?") { next(); a = Quant(a, 1, None, reluctant = true) }
          else a = Quant(a, 1, None)
        case "*" => next()
          if (peek == "?") { next(); a = Quant(a, 0, None, reluctant = true) }
          else a = Quant(a, 0, None)
        case "{" => next()
          // bounded quantifier (SqlBase.g4 patternQuantifier): {n}, {n,},
          // {n,m}, {,m}; optional trailing ? for reluctant
          def num(): Option[Int] = peek match {
            case t if t != null && t.forall(_.isDigit) => next(); Some(t.toInt)
            case _ => None
          }
          val lo = num()
          val hasComma = peek == ","
          if (hasComma) next()
          val hi = num()
          require(next() == "}", s"missing }} in quantifier in: $s")
          val (mn, mx) =
            if (hasComma) (lo.getOrElse(0), hi)
            else {
              val n = lo.getOrElse(throw new IllegalArgumentException(s"empty {} quantifier in: $s"))
              (n, Some(n))
            }
          require(mx.forall(_ >= mn), s"bad quantifier bounds {$mn,${mx.get}} in: $s")
          if (peek == "?") { next(); a = Quant(a, mn, mx, reluctant = true) }
          else a = Quant(a, mn, mx)
        case _ =>
      }
      a
    }
    def seq(): Pat = {
      val ps = ArrayBuffer[Pat]()
      while (peek != null && peek != ")" && peek != "|" && peek != "-}") ps += term()
      if (ps.length == 1) ps.head else Cat(ps.toList)
    }
    def alt(): Pat = {
      val ps = ArrayBuffer(seq())
      while (peek == "|") { next(); ps += seq() }
      if (ps.length == 1) ps.head else Alt(ps.toList)
    }
    val out = alt()
    require(pos == toks.length, s"trailing pattern tokens in: $s")
    out
  }

  // ---- matcher context -------------------------------------------------

  /** DEFINE evaluation context at one candidate row: PREV/NEXT navigate
    * PHYSICAL rows of the partition (reference semantics). `prev` is
    * limited to the retained tail (`prevTail` rows before the current
    * match start); `next` pulls ahead from the stream on demand. Both
    * return null past the partition edge.
    */
  final class Ctx private[MatchRecognize] (buf: StreamBuf) {
    // One Ctx is REUSED across all predicate calls of a group (the matcher
    // sets `idx` before each call) — valid only for the duration of the
    // DEFINE call, like the reference's evaluation context. Hot-loop
    // allocation profile: zero objects per probed row.
    private[MatchRecognize] var idx: Int = 0
    def row: Row = buf.get(idx)
    def prev(n: Int = 1): Row =
      if (idx - n < 0) null // true partition edge
      else if (idx - n < buf.base)
        throw new IllegalStateException(
          s"PREV($n) reaches behind the retained tail (prevTail too small " +
            s"for this DEFINE's navigation depth — raise the prevTail argument)")
      else buf.get(idx - n)
    def next(n: Int = 1): Row = if (buf.ensure(idx + n)) buf.get(idx + n) else null
  }

  /** A completed match handed to the measures functions. `excluded` holds
    * indices matched inside `{- -}` exclusions: visible to measures
    * (standard semantics) but omitted from ALL ROWS PER MATCH output.
    */
  final case class Match(matchNumber: Long, rows: IndexedSeq[Row], classifier: IndexedSeq[String],
      excluded: Set[Int] = Set.empty) {
    def rowsOf(symbol: String): IndexedSeq[Row] =
      rows.indices.collect { case i if classifier(i) == symbol => rows(i) }
    /** Rows classified to ANY of `symbols` — SUBSET union variables. */
    def rowsMatching(symbols: Set[String]): IndexedSeq[Row] =
      rows.indices.collect { case i if symbols(classifier(i)) => rows(i) }
  }

  sealed trait SkipMode
  case object SkipPastLastRow extends SkipMode
  case object SkipToNextRow extends SkipMode
  /** AFTER MATCH SKIP TO FIRST/LAST `symbol` (SQL-2016; reference
    * `operator/window/matcher/` skip-to handling). `symbols` is the
    * resolved set — a primary pattern variable or a SUBSET's members.
    * Resuming AT the match's first row would loop forever, so that case
    * raises, as does a match with no row mapped to the target — both per
    * the standard.
    */
  final case class SkipToFirst(symbols: Set[String]) extends SkipMode
  final case class SkipToLast(symbols: Set[String]) extends SkipMode

  // ---- streaming row buffer -------------------------------------------

  /** Window over one partition's sorted row stream: absolute indexing,
    * on-demand fill from the iterator, and front-trimming once a match
    * boundary passes. `base` is the absolute index of the first retained
    * row.
    */
  private[operators] final class StreamBuf(it: Iterator[Row]) {
    private val rows = ArrayBuffer[Row]()
    private[operators] var base = 0
    var maxRetained = 0 // observed high-water mark (spec hook)

    /** True iff absolute index `i` exists in the partition. */
    def ensure(i: Int): Boolean = {
      while (base + rows.length <= i && it.hasNext) rows += it.next()
      maxRetained = math.max(maxRetained, rows.length)
      base + rows.length > i
    }
    def get(i: Int): Row = rows(i - base)
    def dropBefore(abs: Int): Unit = {
      val k = abs - base
      if (k > 0) { rows.remove(0, math.min(k, rows.length)); base += k }
    }
    def slice(from: Int, until: Int): IndexedSeq[Row] =
      (from until until).map(get).toIndexedSeq
  }

  // ---- public entry points --------------------------------------------

  def oneRowPerMatch(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[String],
      pattern: String,
      define: Map[String, Ctx => Boolean],
      measures: (Row, Match) => Row,
      outSchema: StructType,
      afterMatchSkip: SkipMode = SkipPastLastRow,
      prevTail: Int = 8): DataFrame =
    // ONE ROW PER MATCH summarizes EVERY match, empty ones included
    // (SQL-2016 7.11; there is no OMIT option in this mode)
    run(df, partitionCols, orderCols, parsePattern(pattern), define,
      (key, m) => Iterator.single(measures(key, m)), outSchema, afterMatchSkip, prevTail,
      emptyMatch = Some((key, m, _) => measures(key, m)))

  /** ALL ROWS PER MATCH: `rowMeasures(key, match, i)` produces the output
    * row for the i-th matched row (the caller appends measures columns to
    * the input row, like the reference's pass-through + measures layout).
    */
  def allRowsPerMatch(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[String],
      pattern: String,
      define: Map[String, Ctx => Boolean],
      rowMeasures: (Row, Match, Int) => Row,
      outSchema: StructType,
      afterMatchSkip: SkipMode = SkipPastLastRow,
      prevTail: Int = 8,
      unmatched: Option[Row => Row] = None,
      emptyMatches: Option[(Row, Match, Row) => Row] = None): DataFrame =
    run(df, partitionCols, orderCols, parsePattern(pattern), define,
      (key, m) => m.rows.indices.iterator.filterNot(m.excluded).map(i => rowMeasures(key, m, i)),
      outSchema, afterMatchSkip, prevTail, unmatched, emptyMatches)

  // ---- core ------------------------------------------------------------

  private def run(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[String],
      pattern: Pat,
      define: Map[String, Ctx => Boolean],
      emit: (Row, Match) => Iterator[Row],
      outSchema: StructType,
      skip: SkipMode,
      prevTail: Int,
      unmatched: Option[Row => Row] = None,
      emptyMatch: Option[(Row, Match, Row) => Row] = None): DataFrame = {

    val sorted = df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ orderCols).map(col): _*)
    val keyIdx = partitionCols.map(sorted.schema.fieldIndex)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)

    sorted.mapPartitions { it =>
      // group-boundary check without per-row Seq allocation
      def sameKey(a: Row, b: Row): Boolean = {
        var j = 0
        while (j < keyIdx.length) {
          val x = a.get(keyIdx(j)); val y = b.get(keyIdx(j))
          if (!(if (x == null) y == null else x.equals(y))) return false
          j += 1
        }
        true
      }

      def matchGroup(keyRow: Row, group: Iterator[Row]): Iterator[Row] = {
        val buf = new StreamBuf(group)
        val ctx = new Ctx(buf) // reused: zero allocations per probe
        val defs = new java.util.HashMap[String, Ctx => Boolean]()
        define.foreach { case (k, v) => defs.put(k, v) }

        def pred(sym: String, i: Int): Boolean = {
          if (!buf.ensure(i)) return false
          val d = defs.get(sym)
          d == null || { ctx.idx = i; d(ctx) }
        }

        // Greedy backtracking matcher in CPS; first success = the
        // leftmost-greedy match (reference NFA preference order).
        def go(p: Pat, pos: Int, acc: List[String],
               k: (Int, List[String]) => Option[(Int, List[String])]): Option[(Int, List[String])] =
          p match {
            case Sym(s) => if (pred(s, pos)) k(pos + 1, s :: acc) else None
            case Cat(Nil) => k(pos, acc)
            case Cat(h :: t) => go(h, pos, acc, (p2, a2) => go(Cat(t), p2, a2, k))
            case Alt(ps) =>
              ps.iterator.map(pp => go(pp, pos, acc, k)).collectFirst { case Some(r) => r }
            case AnchorStart => if (pos == 0) k(pos, acc) else None
            case AnchorEnd => if (!buf.ensure(pos)) k(pos, acc) else None
            case Excl(pp) =>
              // rows matched inside the exclusion get a marker prefix on
              // their classifier entry; Match construction strips it into
              // the excluded-index set
              go(pp, pos, Nil, (p2, sub) =>
                k(p2, sub.map(s => if (s.startsWith("!")) s else "!" + s) ::: acc))
            case Quant(pp, min, max, reluctant) =>
              def rep(cnt: Int, pos2: Int, acc2: List[String]): Option[(Int, List[String])] = {
                def more =
                  if (max.forall(cnt < _))
                    go(pp, pos2, acc2,
                      (p3, a3) => if (p3 == pos2) None else rep(cnt + 1, p3, a3))
                  else None
                def stop = if (cnt >= min) k(pos2, acc2) else None
                if (reluctant) stop.orElse(more) else more.orElse(stop)
              }
              rep(0, pos, acc)
          }

        // LAZY emission: matches are produced as the consumer pulls, so
        // neither the input rows (StreamBuf trims behind the match start)
        // nor the output rows are ever materialized per group — memory is
        // bounded by one match span even under ALL ROWS PER MATCH on a
        // hot key. When this iterator exhausts, buf.ensure has drained
        // the whole group, so the caller can move to the next key.
        new Iterator[Row] {
          private var start = 0
          private var matchNum = 0L
          private var maxMatchedEnd = 0 // rows below this were part of a match
          private var pending: Iterator[Row] = Iterator.empty
          private def advance(): Unit =
            while (!pending.hasNext && buf.ensure(start)) {
              go(pattern, start, Nil, (end, acc) => Some((end, acc))) match {
                case Some((end, accRev)) if end > start =>
                  matchNum += 1
                  val raw = accRev.reverse.toIndexedSeq
                  val excluded = raw.indices.filter(i => raw(i).startsWith("!")).toSet
                  val m = Match(matchNum, buf.slice(start, end),
                    raw.map(_.stripPrefix("!")), excluded)
                  maxMatchedEnd = math.max(maxMatchedEnd, end)
                  pending = emit(keyRow, m)
                  start = skip match {
                    case SkipPastLastRow => end
                    case SkipToNextRow => start + 1
                    case SkipToFirst(syms) =>
                      val i = m.classifier.indexWhere(syms)
                      if (i < 0) throw new IllegalStateException(
                        s"AFTER MATCH SKIP TO FIRST: no row mapped to ${syms.mkString("|")} in match $matchNum")
                      if (i == 0) throw new IllegalStateException(
                        "AFTER MATCH SKIP TO FIRST: target is the first row of the match (infinite loop)")
                      start + i
                    case SkipToLast(syms) =>
                      val i = m.classifier.lastIndexWhere(syms)
                      if (i < 0) throw new IllegalStateException(
                        s"AFTER MATCH SKIP TO LAST: no row mapped to ${syms.mkString("|")} in match $matchNum")
                      if (i == 0) throw new IllegalStateException(
                        "AFTER MATCH SKIP TO LAST: target is the first row of the match (infinite loop)")
                      start + i
                  }
                case Some((_, _)) =>
                  // EMPTY MATCH (pattern matched zero rows at this
                  // position): it gets a match number and — when the
                  // rows-per-match mode shows empty matches — one output
                  // row carrying the starting row / summary with measures
                  // over the empty match. Skip always advances one row
                  // (SQL-2016: empty-match resumption point).
                  matchNum += 1
                  if (emptyMatch.isDefined)
                    pending = Iterator.single(emptyMatch.get(keyRow,
                      Match(matchNum, Vector.empty, Vector.empty), buf.get(start)))
                  start += 1
                case None =>
                  // WITH UNMATCHED ROWS: a row at a failed start that no
                  // earlier match covered is unmatched (overlapping-skip
                  // rescans of matched rows don't re-emit)
                  if (unmatched.isDefined && start >= maxMatchedEnd)
                    pending = Iterator.single(unmatched.get(buf.get(start)))
                  start += 1
              }
              buf.dropBefore(start - prevTail)
            }
          def hasNext: Boolean = { advance(); pending.hasNext }
          def next(): Row = { advance(); pending.next() }
        }
      }

      // group chaining with a one-slot lookahead (explicit pushback;
      // rows are fresh external Rows from the deserializer, safe to hold)
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        private var lookahead: Row = if (it.hasNext) it.next() else null
        private def refill(): Unit =
          while (!out.hasNext && lookahead != null) {
            val keyRow = lookahead
            val group = new Iterator[Row] {
              def hasNext: Boolean = lookahead != null && sameKey(lookahead, keyRow)
              def next(): Row = {
                val r = lookahead
                lookahead = if (it.hasNext) it.next() else null
                r
              }
            }
            // lazy: out consumes `group` on demand; when out exhausts,
            // the matcher's final ensure() has drained the group, so the
            // while-condition's out.hasNext re-check advances correctly
            out = matchGroup(keyRow, group)
          }
        def hasNext: Boolean = { refill(); out.hasNext }
        def next(): Row = { refill(); out.next() }
      }
    }(enc)
  }
}
