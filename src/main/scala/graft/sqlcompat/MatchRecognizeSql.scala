package graft.sqlcompat

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import graft.operators.MatchRecognize
import graft.operators.MatchRecognize.{Ctx, Match}

/** SQL-text MATCH_RECOGNIZE: parses the Trino clause
  * (`core/trino-parser/.../SqlBase.g4:329-331` `patternRecognition`) and
  * lowers it onto [[graft.operators.MatchRecognize]] — the same split the
  * reference makes between `sql/analyzer/PatternRecognitionAnalysis.java`
  * and the runtime matcher (`operator/window/matcher/Matcher.java`).
  *
  * Supported subset (throws a descriptive error otherwise):
  *   - PARTITION BY / ORDER BY column lists
  *   - MEASURES with: column refs (bare = last match row, `A.col` = last
  *     row classified A), FIRST/LAST (optionally symbol-qualified),
  *     PREV/NEXT inside DEFINE, MATCH_NUMBER(), CLASSIFIER(), count(*),
  *     count(A.*), count(col), min/max/sum/avg over match rows,
  *     arithmetic, comparisons, CASE-less boolean logic, IN lists, CAST
  *   - ONE ROW PER MATCH (partition cols + measures) and ALL ROWS PER
  *     MATCH (input cols + measures; RUNNING/FINAL semantics), ALL ROWS
  *     PER MATCH WITH UNMATCHED ROWS (null measures on unmatched rows)
  *   - AFTER MATCH SKIP PAST LAST ROW / SKIP TO NEXT ROW / TO FIRST/LAST
  *   - PATTERN(...) — full pattern grammar of [[MatchRecognize.parsePattern]]
  *     (alternation, grouping, greedy+reluctant ? + * {n,m}, PERMUTE,
  *     anchors ^ $, exclusion {- X -})
  *   - DEFINE over the same expression subset evaluated at the candidate
  *     row, PREV(expr[, n]) / NEXT(expr[, n]) physical navigation
  *
  * Expressions are parsed with Spark's own SQL parser and compiled from
  * the UNRESOLVED Catalyst AST into plain closures over external Rows —
  * no analyzer round-trip, because the navigation scope (match buffer)
  * isn't a Spark plan. The clause's input relation may be a table name or
  * a parenthesized subquery (run through [[Dialect.rewrite]] + spark.sql).
  */
object MatchRecognizeSql {

  private val MrKeyword = """(?i)\bMATCH_RECOGNIZE\s*\(""".r
  private val viewCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Rewrite every `<rel> MATCH_RECOGNIZE (...)` fragment in `sql` into a
    * registered temp view; returns SQL with fragments replaced. No-op if
    * the text has no MATCH_RECOGNIZE.
    */
  def rewrite(spark: SparkSession, sql: String): String = {
    MrKeyword.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val openIdx = sql.lastIndexOf('(', m.end - 1)
        val close = closeParen(sql, openIdx)
        require(close > 0, "unbalanced MATCH_RECOGNIZE clause")
        val body = sql.substring(openIdx + 1, close - 1)
        // the input relation: either a parenthesized subquery or a
        // trailing identifier before the keyword
        val before = sql.substring(0, m.start)
        val trimmed = before.reverse.dropWhile(_.isWhitespace).reverse
        val (relStart, relSql): (Int, String) =
          if (trimmed.endsWith(")")) {
            val closeAt = trimmed.length
            val openAt = openParenBackwards(trimmed, closeAt - 1)
            require(openAt >= 0, "unbalanced subquery before MATCH_RECOGNIZE")
            (openAt, trimmed.substring(openAt + 1, closeAt - 1))
          } else {
            val end = trimmed.length
            var s = end
            while (s > 0 && (trimmed.charAt(s - 1).isLetterOrDigit || "._".contains(trimmed.charAt(s - 1)))) s -= 1
            require(s < end, "no input relation before MATCH_RECOGNIZE")
            (s, trimmed.substring(s, end))
          }
        val input: DataFrame =
          if (relSql.trim.matches("(?s)[A-Za-z_][\\w.]*")) spark.table(relSql.trim)
          else spark.sql(Dialect.rewrite(relSql))
        val out = lower(spark, input, body)
        val view = s"__graft_mr_${viewCounter.incrementAndGet()}"
        out.createOrReplaceTempView(view)
        val newSql = sql.substring(0, relStart) + " " + view + " " + sql.substring(close)
        rewrite(spark, newSql) // handle further MR clauses
    }
  }

  // ---- clause body parsing --------------------------------------------

  private case class Clause(
      partitionBy: Seq[String], orderBy: Seq[String],
      measures: Seq[(Expression, String, Option[Boolean])], allRows: Boolean,
      withUnmatched: Boolean,
      showEmpty: Boolean,
      skip: MatchRecognize.SkipMode, pattern: String,
      define: Map[String, Expression],
      subsets: Map[String, Set[String]])

  /** Lower one MATCH_RECOGNIZE body over `input` to a DataFrame. */
  def lower(spark: SparkSession, input: DataFrame, body: String): DataFrame = {
    val c = parseClause(spark, body)
    val schema = input.schema
    val symbols: Set[String] = patternSymbols(c.pattern) ++ c.subsets.keySet

    val define: Map[String, Ctx => Boolean] = c.define.map { case (sym, e) =>
      val ev = compileDefine(e, schema, symbols)
      sym -> ((ctx: Ctx) => ev(ctx) match { case b: java.lang.Boolean => b.booleanValue(); case null => false
        case other => throw new IllegalStateException(s"DEFINE $sym evaluated to non-boolean $other") })
    }

    val measureEvals: Seq[(String, MC => Any, DataType)] =
      c.measures.map { case (e, name, mode) =>
        val base = compileMeasure(e, schema, symbols, c.subsets)
        // RUNNING evaluates over the match truncated at the current row;
        // in ONE ROW PER MATCH the current row is the last, so the two
        // collapse — only ALL ROWS with RUNNING (the default there, per
        // the standard) needs the truncated view
        val running = mode.getOrElse(c.allRows)
        val ev: MC => Any =
          if (!running) base
          else mc =>
            if (mc.i == mc.m.rows.length - 1) base(mc)
            else base(MC(mc.key,
              Match(mc.m.matchNumber, mc.m.rows.take(mc.i + 1), mc.m.classifier.take(mc.i + 1),
                mc.m.excluded.filter(_ <= mc.i)),
              mc.i))
        (name, ev, measureType(e, schema))
      }

    if (!c.allRows) {
      val keyFields = c.partitionBy.map(p => schema(fieldIdx(schema, p)))
      val outSchema = StructType(
        keyFields.map(f => StructField(f.name, f.dataType, nullable = true)) ++
          measureEvals.map { case (n, _, t) => StructField(n, t, nullable = true) })
      val keyIdxs = c.partitionBy.map(fieldIdx(schema, _))
      MatchRecognize.oneRowPerMatch(
        input, c.partitionBy, c.orderBy, c.pattern, define,
        measures = (key, m) => Row.fromSeq(
          keyIdxs.map(key.get) ++ measureEvals.map(_._2(MC(key, m, m.rows.length - 1)))),
        outSchema = outSchema, afterMatchSkip = c.skip)
    } else {
      val outSchema = StructType(
        schema.fields.map(f => StructField(f.name, f.dataType, nullable = true)) ++
          measureEvals.map { case (n, _, t) => StructField(n, t, nullable = true) })
      val nullMeasures = measureEvals.map(_ => null)
      MatchRecognize.allRowsPerMatch(
        input, c.partitionBy, c.orderBy, c.pattern, define,
        rowMeasures = (key, m, i) => Row.fromSeq(
          m.rows(i).toSeq ++ measureEvals.map(_._2(MC(key, m, i)))),
        outSchema = outSchema, afterMatchSkip = c.skip,
        unmatched =
          if (c.withUnmatched) Some(row => Row.fromSeq(row.toSeq ++ nullMeasures))
          else None,
        emptyMatches =
          // SHOW EMPTY MATCHES (also implied by WITH UNMATCHED ROWS): one
          // output row per empty match — the starting row's input columns
          // with measures evaluated over the zero-row match
          if (c.showEmpty || c.withUnmatched)
            Some((key, m, startRow) => Row.fromSeq(
              startRow.toSeq ++ measureEvals.map(_._2(MC(key, m, -1)))))
          else None)
    }
  }

  private def parseClause(spark: SparkSession, body0: String): Clause = {
    val parser = spark.sessionState.sqlParser
    // section keyword spans at paren depth 0, outside literals
    val sections = Seq(
      "PARTITION BY", "ORDER BY", "MEASURES", "ONE ROW PER MATCH",
      "ALL ROWS PER MATCH", "AFTER MATCH", "PATTERN", "SUBSET", "DEFINE")
    val found = sections.flatMap(k => topLevelIndexOf(body0, k).map(i => (i, k))).sortBy(_._1)
    def sectionText(k: String): Option[String] = {
      val idx = found.indexWhere(_._2 == k)
      if (idx < 0) None
      else {
        val start = found(idx)._1 + k.length
        val end = if (idx + 1 < found.length) found(idx + 1)._1 else body0.length
        Some(body0.substring(start, end).trim)
      }
    }
    val subsets: Map[String, Set[String]] = sectionText("SUBSET").map { txt =>
      splitTopLevel(txt, ',').map { d =>
        val m = """(?is)^\s*([A-Za-z_]\w*)\s*=\s*\(([^)]*)\)\s*$""".r.findFirstMatchIn(d)
          .getOrElse(throw new IllegalArgumentException(s"bad SUBSET entry: $d"))
        m.group(1).toUpperCase -> m.group(2).split(",").map(_.trim.toUpperCase).filter(_.nonEmpty).toSet
      }.toMap
    }.getOrElse(Map.empty)
    val pat = sectionText("PATTERN").getOrElse(
      throw new IllegalArgumentException("MATCH_RECOGNIZE requires PATTERN"))
    require(pat.startsWith("(") && pat.endsWith(")"), s"PATTERN must be parenthesized: $pat")
    val patternText = pat.substring(1, pat.length - 1)

    val defines = sectionText("DEFINE").map { txt =>
      splitTopLevel(txt, ',').map { d =>
        val m = """(?is)^\s*([A-Za-z_]\w*)\s+AS\s+(.+)$""".r.findFirstMatchIn(d)
          .getOrElse(throw new IllegalArgumentException(s"bad DEFINE entry: $d"))
        m.group(1).toUpperCase -> parser.parseExpression(m.group(2))
      }.toMap
    }.getOrElse(Map.empty)

    val measures = sectionText("MEASURES").map { txt =>
      splitTopLevel(txt, ',').map { d =>
        val m = """(?is)^(.*\S)\s+AS\s+([A-Za-z_]\w*)\s*$""".r.findFirstMatchIn(d)
          .getOrElse(throw new IllegalArgumentException(s"MEASURES entries need AS alias: $d"))
        // RUNNING/FINAL semantics prefix (SQL-2016 10.5; Trino rowPatternMeasure):
        // None = the standard default (RUNNING in ALL ROWS, FINAL in ONE ROW)
        val (body, mode) = m.group(1).trim match {
          case b if b.toUpperCase.startsWith("RUNNING ") => (b.substring(8), Some(true))
          case b if b.toUpperCase.startsWith("FINAL ") => (b.substring(6), Some(false))
          case b => (b, None)
        }
        (parser.parseExpression(body), m.group(2), mode)
      }
    }.getOrElse(Seq.empty)

    def resolveSkipTarget(sym: String): Set[String] =
      subsets.getOrElse(sym, Set(sym))
    val SkipToFirstR = """SKIP TO FIRST (\w+)""".r
    val SkipToLastR = """SKIP TO (?:LAST )?(\w+)""".r
    val skip = sectionText("AFTER MATCH").map(_.toUpperCase.replaceAll("\\s+", " ").trim) match {
      case None | Some("SKIP PAST LAST ROW") => MatchRecognize.SkipPastLastRow
      case Some("SKIP TO NEXT ROW") => MatchRecognize.SkipToNextRow
      case Some(SkipToFirstR(sym)) => MatchRecognize.SkipToFirst(resolveSkipTarget(sym))
      case Some(SkipToLastR(sym)) if sym != "NEXT" && sym != "PAST" =>
        MatchRecognize.SkipToLast(resolveSkipTarget(sym))
      case Some(other) => throw new IllegalArgumentException(
        s"AFTER MATCH $other not supported")
    }

    def cols(k: String): Seq[String] = sectionText(k).map(t =>
      splitTopLevel(t, ',').map(_.trim.replaceAll("(?i)\\s+(ASC|DESC)$", ""))).getOrElse(Seq.empty)

    // rows-per-match sub-modes (SqlBase.g4 rowsPerMatch): SHOW EMPTY
    // MATCHES (the SQL-2016 default) emits one row per empty match, OMIT
    // EMPTY MATCHES suppresses them, WITH UNMATCHED ROWS additionally
    // emits non-matching rows with null measures (and shows empty)
    val allRowsText = sectionText("ALL ROWS PER MATCH").map(_.toUpperCase.replaceAll("\\s+", " ").trim)
    Clause(
      partitionBy = cols("PARTITION BY"),
      orderBy = cols("ORDER BY"),
      measures = measures,
      allRows = allRowsText.isDefined,
      withUnmatched = allRowsText.exists(_.startsWith("WITH UNMATCHED ROWS")),
      showEmpty = !allRowsText.exists(_.startsWith("OMIT EMPTY MATCHES")),
      skip = skip,
      pattern = patternText,
      define = defines,
      subsets = subsets)
  }

  private def patternSymbols(pattern: String): Set[String] =
    """[A-Za-z_]\w*""".r.findAllIn(pattern).filterNot(_.equalsIgnoreCase("PERMUTE"))
      .map(_.toUpperCase).toSet

  // ---- expression compilers -------------------------------------------

  /** Case-insensitive field lookup. */
  private def fieldIdx(schema: StructType, name: String): Int = {
    val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    require(i >= 0, s"column $name not in ${schema.fieldNames.mkString(",")}")
    i
  }

  /** DEFINE context: expression over the candidate row with PREV/NEXT. */
  private def compileDefine(e: Expression, schema: StructType, symbols: Set[String]): Ctx => Any = {
    def go(e: Expression): Ctx => Any = e match {
      case l: Literal => val v = litValue(l); _ => v
      case a: UnresolvedAttribute =>
        // `A.col` inside DEFINE refers to the current candidate row
        val colName = if (a.nameParts.length > 1 && symbols.contains(a.nameParts.head.toUpperCase))
          a.nameParts.last else a.nameParts.last
        val i = fieldIdx(schema, colName)
        ctx => ctx.row.get(i)
      case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("prev") ||
          f.nameParts.last.equalsIgnoreCase("next") =>
        val isPrev = f.nameParts.last.equalsIgnoreCase("prev")
        val n = f.arguments match {
          case Seq(_) => 1
          case Seq(_, l: Literal) => litValue(l).asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(s"bad PREV/NEXT arity: ${f.sql}")
        }
        val inner = compileOnRow(f.arguments.head, schema, symbols)
        ctx => { val r = if (isPrev) ctx.prev(n) else ctx.next(n); if (r == null) null else inner(r) }
      case _ => compileGeneric(e, go, s => compileDefine(s, schema, symbols))
    }
    go(e)
  }

  /** Pure row-local expression (inside PREV/NEXT). */
  private def compileOnRow(e: Expression, schema: StructType, symbols: Set[String]): Row => Any = {
    def go(e: Expression): Row => Any = e match {
      case l: Literal => val v = litValue(l); _ => v
      case a: UnresolvedAttribute =>
        val i = fieldIdx(schema, a.nameParts.last); r => r.get(i)
      case _ => compileGeneric(e, go, s => compileOnRow(s, schema, symbols))
    }
    go(e)
  }

  /** MEASURES evaluation context: the completed match (FINAL semantics);
    * `i` is the current row index for ALL ROWS PER MATCH (CLASSIFIER()).
    */
  private final case class MC(key: Row, m: Match, i: Int)

  private def compileMeasure(e: Expression, schema: StructType, symbols: Set[String],
      subsets: Map[String, Set[String]] = Map.empty): MC => Any = {
    type M = MC => Any
    def symRows(m: Match, sym: String): IndexedSeq[Row] =
      subsets.get(sym).map(m.rowsMatching).getOrElse(m.rowsOf(sym))
    def go(e: Expression): M = e match {
      case l: Literal => val v = litValue(l); _ => v
      // Spark's parser eagerly builds AggregateExpressions for known
      // aggregates (first/last/count/min/max/sum/avg) — normalize back to
      // the unresolved spelling and re-dispatch
      case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
        go(unwrapAgg(ae))
      case a: UnresolvedAttribute if a.nameParts.length > 1 && symbols.contains(a.nameParts.head.toUpperCase) =>
        val sym = a.nameParts.head.toUpperCase
        val i = fieldIdx(schema, a.nameParts.last)
        mc => { val rs = symRows(mc.m, sym); if (rs.isEmpty) null else rs.last.get(i) }
      case a: UnresolvedAttribute =>
        val i = fieldIdx(schema, a.nameParts.last)
        mc => if (mc.m.rows.isEmpty) null else mc.m.rows.last.get(i)
      case f: UnresolvedFunction =>
        val name = f.nameParts.last.toLowerCase
        name match {
          case "match_number" => mc => mc.m.matchNumber
          case "classifier" =>
            mc => if (mc.i < 0 || mc.i >= mc.m.classifier.length) null else mc.m.classifier(mc.i)
          case "first" | "last" =>
            val (symOpt, colIdx) = f.arguments.head match {
              case a: UnresolvedAttribute if a.nameParts.length > 1 && symbols.contains(a.nameParts.head.toUpperCase) =>
                (Some(a.nameParts.head.toUpperCase), fieldIdx(schema, a.nameParts.last))
              case a: UnresolvedAttribute => (None, fieldIdx(schema, a.nameParts.last))
              case other => throw new IllegalArgumentException(s"FIRST/LAST needs a column ref, got ${other.sql}")
            }
            val off = f.arguments match {
              case Seq(_) => 0
              case Seq(_, l: Literal) => litValue(l).asInstanceOf[Number].intValue()
              case _ => 0
            }
            mc => {
              val rs = symOpt.map(symRows(mc.m, _)).getOrElse(mc.m.rows)
              val k = if (name == "first") off else rs.length - 1 - off
              if (k < 0 || k >= rs.length) null else rs(k).get(colIdx)
            }
          case "count" =>
            f.arguments.head match {
              case s: UnresolvedStar => s.target match {
                case Some(parts) if parts.nonEmpty =>
                  val sym = parts.head.toUpperCase
                  mc => symRows(mc.m, sym).length.toLong
                case _ => mc => mc.m.rows.length.toLong
              }
              case _: Literal => mc => mc.m.rows.length.toLong
              case a: UnresolvedAttribute if a.nameParts.length > 1 && symbols.contains(a.nameParts.head.toUpperCase) =>
                val sym = a.nameParts.head.toUpperCase
                val i = fieldIdx(schema, a.nameParts.last)
                mc => symRows(mc.m, sym).count(_.get(i) != null).toLong
              case a: UnresolvedAttribute =>
                val i = fieldIdx(schema, a.nameParts.last)
                mc => mc.m.rows.count(_.get(i) != null).toLong
              case other => throw new IllegalArgumentException(s"count(${other.sql}) not supported in MEASURES")
            }
          case "min" | "max" | "sum" | "avg" =>
            val (symOpt, colIdx) = f.arguments.head match {
              case a: UnresolvedAttribute if a.nameParts.length > 1 && symbols.contains(a.nameParts.head.toUpperCase) =>
                (Some(a.nameParts.head.toUpperCase), fieldIdx(schema, a.nameParts.last))
              case a: UnresolvedAttribute => (None, fieldIdx(schema, a.nameParts.last))
              case other => throw new IllegalArgumentException(s"$name(${other.sql}) not supported in MEASURES")
            }
            mc => {
              val rs = symOpt.map(symRows(mc.m, _)).getOrElse(mc.m.rows)
              val vs = rs.iterator.map(_.get(colIdx)).filter(_ != null).toSeq
              if (vs.isEmpty) null
              else name match {
                case "min" => vs.minBy(anyDouble)
                case "max" => vs.maxBy(anyDouble)
                case "sum" =>
                  if (vs.forall(_.isInstanceOf[Number]) && vs.forall(v => !v.isInstanceOf[java.lang.Double] && !v.isInstanceOf[java.lang.Float]))
                    vs.map(_.asInstanceOf[Number].longValue).sum
                  else vs.map(anyDouble).sum
                case "avg" => vs.map(anyDouble).sum / vs.length
              }
            }
          case _ => compileGeneric(e, go, s => compileMeasure(s, schema, symbols, subsets))
        }
      case _ => compileGeneric(e, go, s => compileMeasure(s, schema, symbols, subsets))
    }
    go(e)
  }

  /** Shared structural nodes: comparisons, boolean logic, arithmetic, IN,
    * IS [NOT] NULL, CAST, coalesce — parameterized over the context-
    * specific recursion `go`.
    */
  private def compileGeneric[C](e: Expression, go: Expression => C => Any, rec: Expression => C => Any): C => Any = e match {
    case EqualTo(l, r) => bin(go(l), go(r), (a, b) => eq3(a, b))
    case Not(EqualTo(l, r)) => bin(go(l), go(r), (a, b) => neg(eq3(a, b)))
    case GreaterThan(l, r) => bin(go(l), go(r), (a, b) => cmpB(a, b, _ > 0))
    case GreaterThanOrEqual(l, r) => bin(go(l), go(r), (a, b) => cmpB(a, b, _ >= 0))
    case LessThan(l, r) => bin(go(l), go(r), (a, b) => cmpB(a, b, _ < 0))
    case LessThanOrEqual(l, r) => bin(go(l), go(r), (a, b) => cmpB(a, b, _ <= 0))
    case And(l, r) =>
      val (fl, fr) = (go(l), go(r))
      c => (fl(c), fr(c)) match {
        case (java.lang.Boolean.FALSE, _) | (_, java.lang.Boolean.FALSE) => java.lang.Boolean.FALSE
        case (null, _) | (_, null) => null
        case _ => java.lang.Boolean.TRUE
      }
    case Or(l, r) =>
      val (fl, fr) = (go(l), go(r))
      c => (fl(c), fr(c)) match {
        case (java.lang.Boolean.TRUE, _) | (_, java.lang.Boolean.TRUE) => java.lang.Boolean.TRUE
        case (null, _) | (_, null) => null
        case _ => java.lang.Boolean.FALSE
      }
    case Not(x) => val f = go(x); c => neg(f(c))
    case IsNull(x) => val f = go(x); c => java.lang.Boolean.valueOf(f(c) == null)
    case IsNotNull(x) => val f = go(x); c => java.lang.Boolean.valueOf(f(c) != null)
    case In(v, list) =>
      val fv = go(v); val fs = list.map(go)
      c => {
        val x = fv(c)
        if (x == null) null
        else java.lang.Boolean.valueOf(fs.exists(f => eq3(x, f(c)) == java.lang.Boolean.TRUE))
      }
    case Add(l, r, _) => bin(go(l), go(r), arith(_ + _, _ + _))
    case Subtract(l, r, _) => bin(go(l), go(r), arith(_ - _, _ - _))
    case Multiply(l, r, _) => bin(go(l), go(r), arith(_ * _, _ * _))
    case Divide(l, r, _) => bin(go(l), go(r), (a, b) =>
      if (a == null || b == null) null else java.lang.Double.valueOf(anyDouble(a) / anyDouble(b)))
    case UnaryMinus(x, _) => val f = go(x); c => f(c) match {
      case null => null
      case d: java.lang.Double => java.lang.Double.valueOf(-d)
      case n: Number => java.lang.Long.valueOf(-n.longValue)
    }
    case Cast(x, dt, _, _) =>
      val f = go(x)
      c => castTo(f(c), dt)
    case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("coalesce") =>
      val fs = f.arguments.map(go)
      c => fs.iterator.map(_(c)).find(_ != null).orNull
    case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("abs") =>
      val g = go(f.arguments.head)
      c => g(c) match {
        case null => null
        case d: java.lang.Double => java.lang.Double.valueOf(math.abs(d))
        case n: Number => java.lang.Long.valueOf(math.abs(n.longValue))
      }
    case other => throw new IllegalArgumentException(
      s"MATCH_RECOGNIZE expression not in supported subset: ${other.getClass.getSimpleName} (${other.sql})")
  }

  private def bin[C](fl: C => Any, fr: C => Any, op: (Any, Any) => Any): C => Any =
    c => op(fl(c), fr(c))

  private def arith(li: (Long, Long) => Long, di: (Double, Double) => Double): (Any, Any) => Any =
    (a, b) =>
      if (a == null || b == null) null
      else (a, b) match {
        case (x: java.lang.Double, _) => java.lang.Double.valueOf(di(x, anyDouble(b)))
        case (_, y: java.lang.Double) => java.lang.Double.valueOf(di(anyDouble(a), y))
        case (x: java.lang.Float, _) => java.lang.Double.valueOf(di(x.doubleValue, anyDouble(b)))
        case (_, y: java.lang.Float) => java.lang.Double.valueOf(di(anyDouble(a), y.doubleValue))
        case (x: Number, y: Number) => java.lang.Long.valueOf(li(x.longValue, y.longValue))
        case _ => throw new IllegalArgumentException(s"non-numeric arithmetic: $a, $b")
      }

  private def anyDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue
    case t: java.sql.Timestamp => t.getTime.toDouble
    case _ => throw new IllegalArgumentException(s"not numeric: $v")
  }

  private def eq3(a: Any, b: Any): Any =
    if (a == null || b == null) null
    else (a, b) match {
      case (x: Number, y: Number) => java.lang.Boolean.valueOf(x.doubleValue == y.doubleValue)
      case _ => java.lang.Boolean.valueOf(a == b)
    }

  private def neg(v: Any): Any = v match {
    case null => null
    case b: java.lang.Boolean => java.lang.Boolean.valueOf(!b)
  }

  private def cmpB(a: Any, b: Any, test: Int => Boolean): Any = {
    if (a == null || b == null) return null
    val c = (a, b) match {
      case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue, y.doubleValue)
      case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
      case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
      case (x: String, y: String) => x.compareTo(y)
      case _ => throw new IllegalArgumentException(s"incomparable: $a vs $b")
    }
    java.lang.Boolean.valueOf(test(c))
  }

  private def castTo(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case LongType => java.lang.Long.valueOf(v.asInstanceOf[Number].longValue)
      case IntegerType => java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue)
      case DoubleType => java.lang.Double.valueOf(anyDouble(v))
      case StringType => v.toString
      case _ => throw new IllegalArgumentException(s"CAST to $dt not supported in MATCH_RECOGNIZE")
    }

  /** External-Scala value of a parsed literal (internal reps: UTF8String,
    * Decimal, micros).
    */
  private def litValue(l: Literal): Any = (l.value, l.dataType) match {
    case (null, _) => null
    case (v, StringType) => v.toString
    case (v: org.apache.spark.sql.types.Decimal, _) => java.lang.Double.valueOf(v.toDouble)
    case (v: java.lang.Long, TimestampType) => new java.sql.Timestamp(v / 1000)
    case (v: java.lang.Integer, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.longValue))
    case (v, _) => v
  }

  private def measureType(e: Expression, schema: StructType): DataType = e match {
    case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
      measureType(unwrapAgg(ae), schema)
    case l: Literal => l.dataType match {
      case _: DecimalType => DoubleType
      case dt => dt
    }
    case a: UnresolvedAttribute =>
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(a.nameParts.last))
      if (i >= 0) schema(i).dataType else StringType
    case f: UnresolvedFunction => f.nameParts.last.toLowerCase match {
      case "match_number" | "count" => LongType
      case "classifier" => StringType
      case "first" | "last" | "min" | "max" => measureType(f.arguments.head, schema)
      case "sum" => measureType(f.arguments.head, schema) match {
        case DoubleType | FloatType => DoubleType
        case _ => LongType
      }
      case "avg" => DoubleType
      case "coalesce" => measureType(f.arguments.head, schema)
      case "abs" => measureType(f.arguments.head, schema)
      case _ => throw new IllegalArgumentException(s"cannot type MEASURES fn ${f.nameParts.last}")
    }
    case Add(l, r, _) => numType(measureType(l, schema), measureType(r, schema))
    case Subtract(l, r, _) => numType(measureType(l, schema), measureType(r, schema))
    case Multiply(l, r, _) => numType(measureType(l, schema), measureType(r, schema))
    case Divide(_, _, _) => DoubleType
    case UnaryMinus(x, _) => measureType(x, schema)
    case Cast(_, dt, _, _) => dt
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
        _: LessThanOrEqual | _: And | _: Or | _: Not | _: IsNull | _: IsNotNull | _: In => BooleanType
    case other => throw new IllegalArgumentException(s"cannot type MEASURES expr: ${other.sql}")
  }

  private def numType(a: DataType, b: DataType): DataType =
    if (a == DoubleType || b == DoubleType || a == FloatType || b == FloatType) DoubleType
    else LongType

  /** AggregateExpression -> equivalent UnresolvedFunction for re-dispatch. */
  private def unwrapAgg(ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression): UnresolvedFunction = {
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    ae.aggregateFunction match {
      case f: First => UnresolvedFunction(Seq("first"), Seq(f.child), ae.isDistinct)
      case f: Last => UnresolvedFunction(Seq("last"), Seq(f.child), ae.isDistinct)
      case f: Count => UnresolvedFunction(Seq("count"), f.children, ae.isDistinct)
      case f: Min => UnresolvedFunction(Seq("min"), Seq(f.child), ae.isDistinct)
      case f: Max => UnresolvedFunction(Seq("max"), Seq(f.child), ae.isDistinct)
      case f: Sum => UnresolvedFunction(Seq("sum"), Seq(f.child), ae.isDistinct)
      case f: Average => UnresolvedFunction(Seq("avg"), Seq(f.child), ae.isDistinct)
      case other => throw new IllegalArgumentException(
        s"MEASURES aggregate not supported: ${other.prettyName}")
    }
  }

  // ---- text utilities --------------------------------------------------

  private def closeParen(s: String, open: Int): Int = {
    var depth = 0; var i = open; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Index of the '(' matching the ')' at `close`, scanning backwards
    * (literal-naive: subqueries with unbalanced parens in strings are out
    * of scope for the FROM-relation capture).
    */
  private def openParenBackwards(s: String, close: Int): Int = {
    var depth = 0; var i = close
    while (i >= 0) {
      s.charAt(i) match {
        case ')' => depth += 1
        case '(' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i -= 1
    }
    -1
  }

  /** First index of multi-word keyword `kw` at paren depth 0 outside
    * string literals, with word boundaries; -1 handling via Option.
    */
  private def topLevelIndexOf(s: String, kw: String): Option[Int] = {
    val upper = s.toUpperCase
    val kwU = kw.toUpperCase
    val kwRegex = ("(?s)" + kwU.split("\\s+").map(java.util.regex.Pattern.quote).mkString("\\s+")).r
    var i = 0; var depth = 0; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else c match {
        case '\'' => inStr = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && (i == 0 || !isWordChar(s.charAt(i - 1)))) {
            kwRegex.findPrefixMatchOf(upper.substring(i)) match {
              case Some(m) if m.end >= kwU.replaceAll("\\s+", " ").length &&
                  (i + m.end == s.length || !isWordChar(s.charAt(i + m.end))) =>
                return Some(i)
              case _ =>
            }
          }
          i += 1
      }
    }
    None
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case `sep` if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
