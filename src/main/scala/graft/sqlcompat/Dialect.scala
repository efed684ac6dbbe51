package graft.sqlcompat

/** Trino SQL dialect shims (SURVEY §4.3): text-level rewrites for grammar
  * Spark's parser rejects. Applied by `graft.engine.Tables.sql` before
  * parsing. Everything else in the Trino grammar that the workloads use
  * (lambdas `x -> f(x)`, `||`, INTERVAL literals, VALUES, GROUPING SETS,
  * quantified rewrites) parses natively.
  */
object Dialect {

  /** `... ORDER BY <keys> FETCH FIRST <n> ROWS WITH TIES` →
    * rank-filter rewrite — the same lowering the reference applies in
    * `sql/planner/iterative/rule/ImplementLimitWithTies.java`. The body/
    * keys split anchors on the LAST ORDER BY at paren depth 0 outside
    * string literals: an ORDER BY inside a subquery (depth > 0) or a
    * window spec in the final sort keys (also depth > 0) stays intact.
    */
  private val TiesTail =
    """(?is)\bFETCH\s+FIRST\s+(\d+)\s+ROWS?\s+WITH\s+TIES\s*$""".r

  /** Start index of the last "ORDER BY" at paren depth 0 outside string
    * literals, or -1.
    */
  private def lastTopLevelOrderBy(sql: String): Int = {
    val upper = sql.toUpperCase
    var i = 0; var depth = 0; var inStr = false; var last = -1
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else c match {
        case '\'' => inStr = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && upper.startsWith("ORDER", i) &&
              (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1))) &&
              upper.drop(i + 5).dropWhile(_.isWhitespace).startsWith("BY")) {
            last = i
            i += 5
          } else i += 1
      }
    }
    last
  }

  private def rewriteTies(sql: String): String =
    TiesTail.findFirstMatchIn(sql) match {
      case Some(m) =>
        val head = sql.substring(0, m.start)
        val ob = lastTopLevelOrderBy(head)
        if (ob < 0) sql
        else {
          val body = head.substring(0, ob).trim
          val orderKeys = head.substring(ob)
            .replaceFirst("(?is)^ORDER\\s+BY", "").trim
          s"""SELECT * EXCEPT (__graft_rank) FROM (
             |  SELECT q.*, rank() OVER (ORDER BY $orderKeys) AS __graft_rank
             |  FROM ($body) q
             |) WHERE __graft_rank <= ${m.group(1)}""".stripMargin
        }
      case None => sql
    }

  /** `FETCH FIRST n ROWS ONLY` → LIMIT n (Spark parses LIMIT). */
  private val FetchOnly =
    """(?is)\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+ONLY""".r

  /** `CROSS JOIN UNNEST(expr) [WITH ORDINALITY] AS t(c1[, c2])` → a Spark
    * lateral subquery over explode/posexplode. The same lowering the
    * reference's planner applies to unnest nodes
    * (`sql/planner/.../UnnestNode`-to-`UnnestOperator`); here as a text
    * rewrite because Spark's parser has no UNNEST production. Three
    * single-argument shapes (the dominant Trino idiom):
    *   - 1 output column              → array explode
    *   - 2 output columns             → map explode (key, value)
    *   - WITH ORDINALITY + 2 columns  → posexplode, ordinality = pos + 1
    * `UNNEST(a, b)` zip form is not rewritten (use arrays_zip directly).
    */
  private val UnnestStart = """(?is)\bCROSS\s+JOIN\s+UNNEST\s*\(""".r
  private val UnnestTail =
    """(?is)^\s*(WITH\s+ORDINALITY\s+)?(?:AS\s+)?([A-Za-z_]\w*)\s*\(\s*([A-Za-z_]\w*)\s*(?:,\s*([A-Za-z_]\w*))?\s*\)""".r

  /** Index just past the parenthesis that closes the one opening at
    * `open` (which must point AT the '('), or -1 if unbalanced.
    */
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

  private def rewriteUnnest(sql: String): String =
    UnnestStart.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val openIdx = sql.lastIndexOf('(', m.end - 1)
        val close = closeParen(sql, openIdx)
        if (close < 0) return sql
        val arg = sql.substring(openIdx + 1, close - 1)
        if (topLevelComma(arg)) return sql // zip form: leave as written
        UnnestTail.findFirstMatchIn(sql.substring(close)) match {
          case None => sql
          case Some(t) =>
            val ord = t.group(1) != null
            val alias = t.group(2); val c1 = t.group(3); val c2 = t.group(4)
            val replacement = (ord, c2) match {
              case (true, c2c) if c2c != null =>
                s"CROSS JOIN LATERAL (SELECT col AS $c1, pos + 1 AS $c2c FROM posexplode($arg)) AS $alias"
              case (false, null) =>
                s"CROSS JOIN LATERAL (SELECT col AS $c1 FROM explode($arg)) AS $alias"
              case (false, c2c) =>
                s"CROSS JOIN LATERAL (SELECT key AS $c1, value AS $c2c FROM explode($arg)) AS $alias"
              case _ => return sql
            }
            rewriteUnnest(
              sql.substring(0, m.start) + replacement + sql.substring(close + t.end))
        }
    }

  private def topLevelComma(s: String): Boolean = {
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => return true
        case _ =>
      }
      i += 1
    }
    false
  }

  /** `<operand> AT TIME ZONE '<tz>'` → `from_utc_timestamp(operand, tz)`:
    * the engine pins the session to UTC, so shifting the wall-clock into
    * the target zone reproduces Trino's display semantics. Operand capture
    * is conservative: an identifier, one-level function call, or a
    * TIMESTAMP literal.
    */
  private val AtTimeZone =
    """(?is)\b(TIMESTAMP\s+'[^']+'|[A-Za-z_][\w.]*\s*\([^()]*\)|[A-Za-z_][\w.]*)\s+AT\s+TIME\s+ZONE\s+('[^']+')""".r

  /** Apply `f` only to the segments of `sql` OUTSIDE single-quoted string
    * literals — keeps the regex rewrites from touching literal text
    * (`''`-escaped quotes toggle through an empty outside segment, which
    * is harmless).
    */
  private def outsideLiterals(sql: String)(f: String => String): String = {
    val sb = new StringBuilder
    var i = 0; var start = 0; var inStr = false
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        if (!inStr) { sb.append(f(sql.substring(start, i))); start = i; inStr = true }
        else { sb.append(sql.substring(start, i + 1)); start = i + 1; inStr = false }
      }
      i += 1
    }
    sb.append(if (inStr) sql.substring(start) else f(sql.substring(start)))
    sb.toString
  }

  /** Replace every string literal's CONTENT with an index placeholder
    * (quotes preserved) so regexes never match inside literals; the
    * companion restores them. Placeholders use the \u0001 control character, which cannot
    * occur in valid SQL text.
    */
  private def maskLiterals(sql: String): (String, Vector[String]) = {
    val lits = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0; var inStr = false; var litStart = 0; var n = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr) {
        sb.append(c)
        if (c == '\'') { inStr = true; litStart = i + 1 }
      } else if (c == '\'') {
        lits += sql.substring(litStart, i)
        sb.append('\u0001').append(n).append('\u0001').append('\'')
        n += 1
        inStr = false
      }
      i += 1
    }
    (sb.toString, lits.result())
  }

  private def unmaskLiterals(sql: String, lits: Vector[String]): String =
    """\u0001(\d+)\u0001""".r.replaceAllIn(sql,
      m => java.util.regex.Matcher.quoteReplacement(lits(m.group(1).toInt)))

  /** Text safe for keyword/shape PROBES (not for execution): string
    * literal contents masked and line/block comments removed, so a
    * probe regex can never match inside user data or commentary (r14
    * advice: corrWindowGuard tripped on literals containing
    * "corr(x) over").
    */
  private[graft] def probeText(sql: String): String = {
    val noComments = {
      val sb = new StringBuilder
      var i = 0; var inStr = false
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
        else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
        else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
          while (i < sql.length && sql.charAt(i) != '\n') i += 1
        } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
          val close = sql.indexOf("*/", i + 2)
          i = if (close < 0) sql.length else close + 2
          sb.append(' ') // keep token separation
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    maskLiterals(noComments)._1
  }

  /** Typed literals for the emulated time types (r10 verdict, Missing
    * #2): the reference accepts `TIME '10:30:00[+02:00]'` (zoned -> timetz_parse; plain -> time_parse),
    * `TIMESTAMP '2020-01-01 00:00:00.123456789012'` (picosecond
    * fraction) and `TIMESTAMP '2020-01-01 00:00:00 America/New_York'`
    * (zone-NAME suffix) as literals (`SqlBase.g4` literal rules,
    * `StandardTypes.java:33-36`); Spark parses none of the three. Each
    * lowers to its parse function over the emulation struct
    * ([[graft.functions.TimeTzFunctions]] /
    * [[graft.functions.TimestampFidelity]]), so the type packs are
    * reachable from verbatim SQL text. Literals Spark handles natively
    * (TIMESTAMP with ≤6 fractional digits and no zone suffix) pass
    * through untouched. Runs on MASKED text and inspects the stashed
    * literal content — a string literal containing `TIME '...'` can
    * never match.
    */
  private val TimeLitRe = "(?i)\\bTIME\\s+'\u0001(\\d+)\u0001'".r
  private val TsLitRe = "(?i)\\bTIMESTAMP\\s+'\u0001(\\d+)\u0001'".r
  private val TimeTzContent =
    """\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?[+-]\d{2}(?::\d{2})?""".r
  private val TimePlainContent =
    """\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?""".r
  private val TsPicoContent =
    """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{7,12}""".r
  private val TsZoneContent =
    """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d{1,6})? [A-Za-z][A-Za-z0-9_+\-]*(?:/[A-Za-z0-9_+\-]+)*""".r
  // BOTH a 7-12 digit fraction AND a zone name (r11 verdict, Missing #4:
  // the reference's `timestamp(9..12) with time zone`) — checked before
  // the two single-feature forms, lowers to the combined tspz pack
  private val TsPicoZoneContent =
    """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{7,12} [A-Za-z][A-Za-z0-9_+\-]*(?:/[A-Za-z0-9_+\-]+)*""".r
  private def rewriteTypedTimeLiterals(masked: String, lits: Vector[String]): String = {
    def full(re: scala.util.matching.Regex, s: String) =
      re.pattern.matcher(s).matches()
    val afterTime = TimeLitRe.replaceAllIn(masked, m => {
      val content = lits(m.group(1).toInt)
      val fn =
        if (full(TimeTzContent, content)) Some("timetz_parse")
        else if (full(TimePlainContent, content)) Some("time_parse")
        else None
      java.util.regex.Matcher.quoteReplacement(fn match {
        case Some(f) => s"$f('\u0001${m.group(1)}\u0001')"
        case None => m.matched
      })
    })
    TsLitRe.replaceAllIn(afterTime, m => {
      val content = lits(m.group(1).toInt)
      val fn =
        if (full(TsPicoZoneContent, content)) Some("tspz_parse")
        else if (full(TsPicoContent, content)) Some("tspico_parse")
        else if (full(TsZoneContent, content)) Some("tsz_parse")
        else None
      java.util.regex.Matcher.quoteReplacement(fn match {
        case Some(f) => s"$f('\u0001${m.group(1)}\u0001')"
        case None => m.matched
      })
    })
  }

  /** Trino's typed NUMERIC literals — `DECIMAL '1.5'`, `DOUBLE '2.5'`,
    * `REAL '1'`, `BIGINT '5'`, `INTEGER/INT/SMALLINT/TINYINT '…'`,
    * `BOOLEAN 'true'` (generic `type 'literal'` grammar) — which Spark
    * rejects (UNSUPPORTED_TYPED_LITERAL: only date/time/interval/X).
    * Lowered to `CAST('…' AS t)`; under ANSI the cast throws on
    * malformed content exactly where the reference's literal parser
    * would. DECIMAL infers precision/scale from the literal's digits
    * (the reference's `Decimals.parse` rule: precision = digit count,
    * scale = digits after the point), capped at Spark's 38. Runs on
    * masked text with the stashed literal content, like
    * [[rewriteTypedTimeLiterals]].
    */
  private val NumLitRe =
    ("(?i)\\b(DECIMAL|DOUBLE|REAL|BIGINT|INTEGER|INT|SMALLINT|TINYINT|BOOLEAN)" +
      "\\s+'\u0001(\\d+)\u0001'").r
  private val DecimalContent = """[+-]?(\d+(\.\d*)?|\.\d+)""".r

  private def rewriteTypedNumLiterals(masked: String, lits: Vector[String]): String =
    NumLitRe.replaceAllIn(masked, m => {
      val tpe = m.group(1).toUpperCase
      val content = lits(m.group(2).toInt).trim
      val target: Option[String] = tpe match {
        case "DECIMAL" =>
          if (!DecimalContent.pattern.matcher(content).matches()) None
          else {
            val digits = content.dropWhile(c => c == '+' || c == '-')
            val (ip0, fp) = digits.span(_ != '.')
            val scale = math.max(0, fp.length - 1)
            // the reference's Decimals.parse EXCLUDES leading integral
            // zeros from precision (DECIMAL '0.5' → decimal(1,1)) and
            // REJECTS content needing > 38 digits instead of clamping
            // (createDecimalType throws) — r14 advice
            val ip = ip0.dropWhile(_ == '0')
            val precision = math.max(1, ip.length + scale)
            if (precision > 38) throw new IllegalArgumentException(
              s"DECIMAL literal '$content' needs precision $precision; max is 38")
            Some(s"DECIMAL($precision, $scale)")
          }
        case "DOUBLE" => Some("DOUBLE")
        case "REAL" => Some("FLOAT")
        case "INTEGER" | "INT" => Some("INT")
        case other => Some(other) // BIGINT, SMALLINT, TINYINT, BOOLEAN
      }
      java.util.regex.Matcher.quoteReplacement(target match {
        case Some(t) => s"CAST('\u0001${m.group(2)}\u0001' AS $t)"
        case None => m.matched // malformed DECIMAL: leave for a loud parse error
      })
    })

  /** `CAST(expr AS CHAR(n))` → `rpad(CAST(expr AS STRING), n, ' ')` —
    * the reference's fixed-width char semantics
    * (`core/trino-spi/.../type/CharType.java`: values are space-padded
    * to the declared length; longer inputs truncate). Spark's CHAR(n)
    * padding applies only to table columns, not cast expressions, so
    * the shim lowers the cast to explicit rpad (which pads AND
    * truncates to n — both halves of the CHAR contract). Runs on
    * literal-MASKED text; a balanced-paren scan finds each CAST's
    * close, recursing so nested casts inside the operand rewrite too.
    */
  private val CharTypeTail = """(?is)^(.*)\bAS\s+CHAR\s*\(\s*(\d+)\s*\)\s*$""".r
  /** Bare `CAST(x AS VARCHAR)` / `AS VARBINARY` (no length) — Trino's
    * most common cast spelling; Spark demands a length on VARCHAR
    * (DATATYPE_MISSING_SIZE) and has no VARBINARY. Lowered to STRING /
    * BINARY. The rewrite is CAST/TRY_CAST-scoped (same scanner as
    * [[rewriteCharCast]]) so an alias that happens to be named
    * `varchar` can never match; `VARCHAR(n)` keeps its length and
    * rides Spark natively.
    */
  private val BareTypeTail = java.util.regex.Pattern.compile(
    "(?is)^(.*\\S)\\s+AS\\s+(VARCHAR|VARBINARY)\\s*$")

  private def rewriteBareTypeCast(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    def wordAt(word: String, pos: Int): Boolean =
      sql.regionMatches(true, pos, word, 0, word.length) &&
        (pos == 0 || (!Character.isLetterOrDigit(sql.charAt(pos - 1)) &&
          sql.charAt(pos - 1) != '_'))
    while (i < sql.length) {
      val isTry = wordAt("TRY_CAST", i)
      val isCast = isTry || wordAt("CAST", i)
      var consumed = false
      if (isCast) {
        val kw = sql.substring(i, i + (if (isTry) 8 else 4))
        var j = i + kw.length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          var depth = 0; var k = j; var end = -1
          while (k < sql.length && end < 0) {
            sql.charAt(k) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = k
              case _ => ()
            }
            k += 1
          }
          if (end > 0) {
            val inner = rewriteBareTypeCast(sql.substring(j + 1, end))
            val m = BareTypeTail.matcher(inner)
            if (m.matches()) {
              val spark =
                if (m.group(2).equalsIgnoreCase("VARCHAR")) "STRING" else "BINARY"
              out.append(s"$kw(${m.group(1)} AS $spark)")
            } else out.append(s"$kw($inner)")
            i = end + 1
            consumed = true
          }
        }
      }
      if (!consumed) { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def rewriteCharCast(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    // Case-insensitive keyword match at a word boundary via
    // regionMatches(true, ...) — NOT a parallel toUpperCase copy, whose
    // indices can drift from the original for characters whose uppercase
    // changes string length (e.g. 'ß' → "SS").
    def wordAt(word: String, pos: Int): Boolean =
      sql.regionMatches(true, pos, word, 0, word.length) &&
        (pos == 0 || (!Character.isLetterOrDigit(sql.charAt(pos - 1)) &&
          sql.charAt(pos - 1) != '_'))
    while (i < sql.length) {
      // TRY_CAST first (CAST is its suffix; the '_' boundary check keeps
      // the bare-CAST branch from matching inside it). Trino's TRY_CAST
      // returns NULL on failure and rpad(NULL) stays NULL, so the same
      // pad/truncate lowering applies with try_cast on the inside.
      val isTry = wordAt("TRY_CAST", i)
      val isCast = isTry || wordAt("CAST", i)
      var consumed = false
      if (isCast) {
        // keep the source's own spelling (TRY_CAST vs try_cast) in the output
        val kw = sql.substring(i, i + (if (isTry) 8 else 4))
        var j = i + kw.length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          var depth = 0; var k = j; var end = -1
          while (k < sql.length && end < 0) {
            sql.charAt(k) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = k
              case _ => ()
            }
            k += 1
          }
          if (end > 0) CharTypeTail.findFirstMatchIn(sql.substring(j + 1, end)) match {
            case Some(m) =>
              out.append(
                s"rpad($kw(${rewriteCharCast(m.group(1).trim)} AS STRING), ${m.group(2)}, ' ')")
              i = end + 1
              consumed = true
            case None => ()
          }
        }
      }
      if (!consumed) { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Trino's `LISTAGG(e, sep ON OVERFLOW …)` clause
    * (`SqlBase.g4:439`): Spark 4's native `listagg` takes no overflow
    * behavior because it has no output-length cap, so `ON OVERFLOW
    * ERROR` is stripped — with no cap the error path can never fire,
    * making the engine a documented superset of the reference's 1 MB
    * page-size limit (`ListaggAggregationFunction.java:73`).
    * `ON OVERFLOW TRUNCATE [filler] [WITH/WITHOUT COUNT]` would need
    * that cap to mean anything, so it rejects loudly. Runs on
    * literal-masked text ("ON OVERFLOW" inside a string can't match),
    * and the phrase is valid SQL nowhere else, so a bare word-scan is
    * exact.
    */
  private def rewriteListaggOverflow(masked: String): String = {
    if (java.util.regex.Pattern.compile("(?i)\\bON\\s+OVERFLOW\\s+TRUNCATE\\b")
        .matcher(masked).find())
      throw new IllegalArgumentException(
        "LISTAGG ON OVERFLOW TRUNCATE is not supported: the engine has no " +
          "output-length cap, so truncation semantics are undefined here " +
          "(ON OVERFLOW ERROR is accepted — with no cap it can never fire)")
    masked.replaceAll("(?i)\\s+ON\\s+OVERFLOW\\s+ERROR\\b", "")
  }

  /** Trino's bracketed array constructor `ARRAY[e, …]` (every Trino
    * query writes these; Spark's parser rejects the form outright) →
    * Spark's `array(e, …)`. A single left-to-right scan with a bracket
    * stack: the bracket opened by an ARRAY keyword closes as `)`, every
    * other bracket (subscripts — `a[i]`, allowed inside elements) closes
    * as `]`, so nesting of both kinds composes. Dialect-policy note:
    * this shims a Spark-REJECTED form only; subscript BASE is not
    * touched — `a[i]` is valid Spark SQL (0-based) and stays Spark
    * (Trino reads 1-based there; documented divergence, use
    * `element_at` for 1-based access).
    */
  private def rewriteArrayBracket(masked: String): String = {
    val out = new StringBuilder
    val stack = scala.collection.mutable.Stack[Boolean]() // true = array-literal bracket
    var i = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if ((c == 'A' || c == 'a') &&
          (i == 0 || !Character.isLetterOrDigit(masked.charAt(i - 1)) && masked.charAt(i - 1) != '_') &&
          masked.regionMatches(true, i, "ARRAY", 0, 5) &&
          (i + 5 >= masked.length || (!Character.isLetterOrDigit(masked.charAt(i + 5)) && masked.charAt(i + 5) != '_'))) {
        var j = i + 5
        while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
        if (j < masked.length && masked.charAt(j) == '[') {
          out.append("array(")
          stack.push(true)
          i = j + 1
        } else { out.append(masked.substring(i, i + 5)); i += 5 }
      } else if (c == '[') {
        stack.push(false); out.append('['); i += 1
      } else if (c == ']') {
        val isArray = stack.nonEmpty && stack.pop()
        out.append(if (isArray) ')' else ']'); i += 1
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Trino's row constructor `ROW(e, …)` (Spark: UNRESOLVED_ROUTINE —
    * no such function) → `struct(e, …)`. Fields land as Spark's
    * col1/col2/… names (the reference's anonymous row fields have no
    * SQL-addressable names either — users CAST to a named ROW type to
    * name them). Word-boundary scan: `ROWS BETWEEN`, `CURRENT ROW`,
    * `row_number()` never match (no following paren / different word).
    */
  private def rewriteRowConstructor(masked: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if ((c == 'R' || c == 'r') &&
          (i == 0 || (!Character.isLetterOrDigit(masked.charAt(i - 1)) && masked.charAt(i - 1) != '_')) &&
          masked.regionMatches(true, i, "ROW", 0, 3) &&
          (i + 3 >= masked.length || (!Character.isLetterOrDigit(masked.charAt(i + 3)) && masked.charAt(i + 3) != '_'))) {
        var j = i + 3
        while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
        if (j < masked.length && masked.charAt(j) == '(') {
          // `AS ROW(...)` is a Trino ROW TYPE in a cast position, not
          // the constructor — rewriting it to struct( would surface a
          // confusing Spark parse error; reject loudly instead (r14
          // advice)
          var k = i - 1
          while (k >= 0 && masked.charAt(k).isWhitespace) k -= 1
          val afterAs = k >= 1 &&
            masked.regionMatches(true, k - 1, "AS", 0, 2) &&
            (k - 2 < 0 || (!Character.isLetterOrDigit(masked.charAt(k - 2)) &&
              masked.charAt(k - 2) != '_'))
          if (afterAs) throw new IllegalArgumentException(
            "ROW types are not supported (CAST(... AS ROW(...))): Spark has " +
              "no ROW type — construct with named_struct or cast to struct<...>")
          out.append("struct(")
          i = j + 1
        } else { out.append(masked.substring(i, i + 3)); i += 3 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Trino's two-argument `IF(cond, v)` (NULL when false; Spark demands
    * three arguments — WRONG_NUM_ARGS) → `IF(cond, v, NULL)`. Scoped to
    * `IF(` call sites with exactly two TOP-LEVEL arguments (paren- and
    * case-aware split; runs on masked text so commas in string literals
    * can't split). Three-arg calls and the IGNORE/anything-else word
    * `if` never match.
    */
  private def rewriteTwoArgIf(masked: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if ((c == 'I' || c == 'i') &&
          (i == 0 || (!Character.isLetterOrDigit(masked.charAt(i - 1)) && masked.charAt(i - 1) != '_')) &&
          masked.regionMatches(true, i, "IF", 0, 2) &&
          (i + 2 >= masked.length || (!Character.isLetterOrDigit(masked.charAt(i + 2)) && masked.charAt(i + 2) != '_'))) {
        var j = i + 2
        while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
        var end = -1
        if (j < masked.length && masked.charAt(j) == '(') {
          var depth = 0; var k = j
          while (k < masked.length && end < 0) {
            masked.charAt(k) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = k
              case _ => ()
            }
            k += 1
          }
        }
        if (end > 0) {
          val inner = rewriteTwoArgIf(masked.substring(j + 1, end))
          var depth = 0; var commas = 0
          inner.foreach {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 0 => commas += 1
            case _ => ()
          }
          val kw = masked.substring(i, i + 2)
          if (commas == 1 && inner.trim.nonEmpty) out.append(s"$kw($inner, NULL)")
          else out.append(s"$kw($inner)")
          i = end + 1
        } else { out.append(masked.substring(i, i + 2)); i += 2 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  def rewrite(sql: String): String = {
    val afterTies = rewriteTies(sql)
    val afterFetch = outsideLiterals(afterTies)(
      seg => FetchOnly.replaceAllIn(seg, m => s"LIMIT ${m.group(1)}"))
    // `OFFSET n ROW/ROWS` — the standard's noise word, in the
    // reference's grammar (`SqlBase.g4 queryNoWith`); Spark takes only
    // the bare `OFFSET n`. The reference also orders the clauses
    // OFFSET-then-FETCH while Spark's parser demands LIMIT before
    // OFFSET, so the lowered adjacency swaps (r14).
    val afterOffset = outsideLiterals(afterFetch)(seg =>
      seg.replaceAll("(?i)\\b(OFFSET\\s+\\d+)\\s+ROWS?\\b", "$1")
        .replaceAll("(?i)\\bOFFSET\\s+(\\d+)\\s+LIMIT\\s+(\\d+)\\b",
          "LIMIT $2 OFFSET $1"))
    val afterUnnest = rewriteUnnest(afterOffset)
    // AT TIME ZONE's operand may itself be a TIMESTAMP literal, so the
    // rewrite runs over literal-MASKED text (a literal containing the
    // words "AT TIME ZONE" can no longer corrupt the match) and the
    // literals are restored afterwards
    val (masked0, lits) = maskLiterals(afterUnnest)
    // GROUPS frames / EXCLUDE clauses (SQL-2016 window syntax Spark's
    // parser rejects) lower to the proven dense_rank / two-segment /
    // subtraction recipes — also on masked text
    val masked1 = WindowFrames.rewrite(rewriteListaggOverflow(
      rewriteTwoArgIf(rewriteRowConstructor(rewriteArrayBracket(masked0)))))
    // typed literals for the emulated time types — needs the stashed
    // literal CONTENT to decide, so it runs on masked text with `lits`
    val masked =
      rewriteTypedNumLiterals(rewriteTypedTimeLiterals(masked1, lits), lits)
    val rewritten = AtTimeZone.replaceAllIn(masked,
      m => java.util.regex.Matcher.quoteReplacement(
        s"from_utc_timestamp(${m.group(1)}, ${m.group(2)})"))
    unmaskLiterals(rewriteCharCast(rewriteBareTypeCast(rewritten)), lits)
  }
}
