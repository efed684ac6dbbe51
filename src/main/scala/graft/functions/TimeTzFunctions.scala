package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
import org.apache.spark.sql.catalyst.expressions.Literal

/** TIME(p) WITH TIME ZONE emulation (r9 verdict, Missing #4 — the one
  * §1.3 type-fidelity row with neither an implementation nor a
  * fixture-blocked excuse). Spark has no time-of-day type at all, zoned
  * or not; the reference carries one as a packed value with nanos +
  * zone-offset minutes (`core/trino-spi/.../type/TimeWithTimeZoneType`,
  * `StandardTypes.java:33-36`, offset range ±14:00). The emulation is a
  * STRUCT of (us BIGINT local-time-of-day microseconds, off INT offset
  * minutes east) — microsecond precision, the fixture/oracle ceiling
  * (DuckDB TIMETZ is micros; the reference's picos>6 corner stays a
  * documented known-hard).
  *
  * Each function is a SQL EXPRESSION TEMPLATE parsed once at
  * registration and spliced over its call-site arguments — the whole
  * surface lowers to builtin arithmetic/string expressions, so it stays
  * inside whole-stage codegen with no UDF boundary. (The Column DSL
  * cannot be used for registry builders in Spark 4: it produces
  * ColumnNode wrappers that only the DataFrame API path converts.)
  *
  * Semantics notes, pinned by `fn_timetz`'s oracle:
  *  - extract(hour/minute/second) read the LOCAL clock face (Trino and
  *    DuckDB agree).
  *  - comparison/equality normalize to the UTC instant
  *    (`timetz_to_utc_us`): '12:00+02' = '11:00+01'. DuckDB 1.0 ORDER BY
  *    TIMETZ sorts by LOCAL time instead, so the oracle states the UTC
  *    ordering arithmetically rather than via a bare ORDER BY t.
  *  - AT TIME ZONE (`timetz_at_offset`) preserves the instant and
  *    re-labels the offset.
  *  - `timetz_format` prints DuckDB's canonical spelling (fraction with
  *    trailing zeros trimmed, dropped when zero; offset minutes only
  *    when nonzero) so formatted strings compare byte-equal.
  */
object TimeTzFunctions {

  // 'HH:MM:SS[.ffffff]±HH[:MM]' — SQL-literal spelling (backslashes
  // doubled: Spark's default string literals treat \ as an escape)
  private val Re =
    """'^(\\d{2}):(\\d{2}):(\\d{2})(?:\\.(\\d{1,6}))?([+-])(\\d{2})(?::(\\d{2}))?$'"""

  private def g(i: Int) = s"nullif(regexp_extract(arg0, $Re, $i), '')"

  // 'HH:MM:SS[.ffffff]' — the plain (zoneless) TIME literal spelling
  private val PlainRe =
    """'^(\\d{2}):(\\d{2}):(\\d{2})(?:\\.(\\d{1,6}))?$'"""
  private def pg(i: Int) = s"nullif(regexp_extract(arg0, $PlainRe, $i), '')"

  private val utc0 = "pmod(arg0.us - cast(arg0.off as bigint) * 60000000, 86400000000)"
  private val utc1 = "pmod(arg1.us - cast(arg1.off as bigint) * 60000000, 86400000000)"

  private val offMag =
    s"cast(${g(6)} as bigint) * 60 + coalesce(cast(${g(7)} as bigint), 0)"

  private val templates: Seq[(String, String)] = Seq(
    "timetz" ->
      "named_struct('us', pmod(cast(arg0 as bigint), 86400000000), 'off', cast(arg1 as int))",
    "timetz_parse" -> s"""named_struct(
      'us', pmod((cast(${g(1)} as bigint) * 3600 + cast(${g(2)} as bigint) * 60
          + cast(${g(3)} as bigint)) * 1000000
          + cast(rpad(coalesce(${g(4)}, '0'), 6, '0') as bigint), 86400000000),
      'off', cast(CASE WHEN ${g(5)} = '-' THEN -($offMag) ELSE $offMag END as int))""",
    "timetz_format" -> """concat(
      format_string('%02d:%02d:%02d', arg0.us div 3600000000,
        arg0.us div 60000000 % 60, arg0.us div 1000000 % 60),
      CASE WHEN arg0.us % 1000000 > 0
        THEN concat('.', regexp_replace(format_string('%06d', arg0.us % 1000000), '0+$', ''))
        ELSE '' END,
      CASE WHEN arg0.off < 0 THEN '-' ELSE '+' END,
      format_string('%02d', abs(arg0.off) div 60),
      CASE WHEN abs(arg0.off) % 60 > 0
        THEN concat(':', format_string('%02d', cast(abs(arg0.off) % 60 as bigint)))
        ELSE '' END)""",
    "timetz_hour" -> "arg0.us div 3600000000",
    "timetz_minute" -> "arg0.us div 60000000 % 60",
    "timetz_second" -> "arg0.us div 1000000 % 60",
    "timetz_to_utc_us" -> utc0,
    "timetz_at_offset" -> s"""named_struct(
      'us', pmod($utc0 + cast(arg1 as bigint) * 60000000, 86400000000),
      'off', cast(arg1 as int))""",
    // UTC-instant comparison (Trino TimeWithTimeZoneType.compareTo)
    "timetz_eq" -> s"$utc0 = $utc1",
    "timetz_lt" -> s"$utc0 < $utc1",

    // ---- plain TIME(p≤6), no zone (r11): BIGINT microseconds-of-day.
    // The reference's TimeType.java packs picos-of-day into one long;
    // the micro ceiling is the same fixture/oracle precision as the
    // TIMETZ pack. A bare bigint makes ordering/equality/grouping
    // native — no comparison functions needed — and `TIME 'hh:mm:ss'`
    // literals reach time_parse via the Dialect typed-literal rewrite.
    "time_parse" -> s"""pmod((cast(${pg(1)} as bigint) * 3600
        + cast(${pg(2)} as bigint) * 60
        + cast(${pg(3)} as bigint)) * 1000000
        + cast(rpad(coalesce(${pg(4)}, '0'), 6, '0') as bigint), 86400000000)""",
    // DuckDB's canonical TIME spelling: fraction trimmed of trailing
    // zeros, dropped entirely when zero (same formatter as TIMETZ)
    "time_format" -> """concat(
      format_string('%02d:%02d:%02d', arg0 div 3600000000,
        arg0 div 60000000 % 60, arg0 div 1000000 % 60),
      CASE WHEN arg0 % 1000000 > 0
        THEN concat('.', regexp_replace(format_string('%06d', arg0 % 1000000), '0+$', ''))
        ELSE '' END)""",
    "time_hour" -> "arg0 div 3600000000",
    "time_minute" -> "arg0 div 60000000 % 60",
    "time_second" -> "arg0 div 1000000 % 60",
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    templates.foreach { case (name, template) =>
      val tree = spark.sessionState.sqlParser.parseExpression(template)
      reg.createOrReplaceTempFunction(name, es =>
        tree.transformUp {
          case a: UnresolvedAttribute if a.nameParts.head.matches("arg\\d+") =>
            val base = es(a.nameParts.head.drop(3).toInt)
            a.nameParts.tail.foldLeft(base)((e, f) => UnresolvedExtractValue(e, Literal(f)))
        }, "built-in")
    }
  }
}
