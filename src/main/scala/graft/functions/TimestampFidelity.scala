package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
import org.apache.spark.sql.catalyst.expressions.Literal

/** The two remaining §1.3 type-fidelity corners beyond TIME WITH TIME
  * ZONE ([[TimeTzFunctions]]):
  *
  * 1. TIMESTAMP(p) for p > 6 — picosecond precision
  *    (`core/trino-spi/.../type/LongTimestamp`: epoch micros + picos of
  *    micro, p ∈ 0..12; `StandardTypes.java:33-36`). Spark tops out at
  *    micros, so the emulation mirrors the reference's own layout: a
  *    STRUCT of (us BIGINT epoch micros, ps INT picos-of-microsecond
  *    0..999999). parse/format (canonical 12-digit fraction),
  *    lexicographic (us, ps) comparison, pico arithmetic with carry,
  *    and half-up rounding to any precision 0..12 — the reference's
  *    `round(timestamp(12), p)` contract.
  *
  * 2. TIMESTAMP WITH TIME ZONE preserving the ZONE NAME (the reference
  *    stores a zone KEY, not an offset — `TimeZoneKey.java` — so
  *    formatting after AT TIME ZONE prints `America/New_York`, and DST
  *    rules of the named zone apply at every extract). Emulated as a
  *    STRUCT of (us BIGINT epoch micros, zone STRING IANA name); local
  *    views go through Spark's own from_utc_timestamp/to_utc_timestamp,
  *    which consult the same IANA tzdb DuckDB's `timezone()` does — the
  *    oracle pins DST conversions natively on both sides.
  *
  * Same machinery as [[TimeTzFunctions]]: each function is a SQL
  * expression template parsed once and spliced over its arguments —
  * builtin-only trees, no UDF boundary, whole-stage codegen throughout.
  */
object TimestampFidelity {

  // ---- picosecond timestamps ----

  private val PicoRe =
    """'^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2})(?:\\.(\\d{1,12}))?$'"""

  // 12-digit fraction, right-padded: digits 1-6 are micros, 7-12 picos
  private val frac12 =
    s"rpad(coalesce(nullif(regexp_extract(arg0, $PicoRe, 2), ''), '0'), 12, '0')"

  // the full sub-second fraction as one bigint in [0, 1e12)
  private val fullFrac = "(pmod(arg0.us, 1000000) * 1000000 + cast(arg0.ps as bigint))"

  private val picoTemplates: Seq[(String, String)] = Seq(
    "tspico" ->
      "named_struct('us', cast(arg0 as bigint), 'ps', cast(arg1 as int))",
    "tspico_parse" -> s"""named_struct(
      'us', unix_micros(try_to_timestamp(concat(
          regexp_extract(arg0, $PicoRe, 1), '.', substring($frac12, 1, 6)))),
      'ps', cast(substring($frac12, 7, 6) as int))""",
    "tspico_format" -> """concat(
      date_format(timestamp_micros(arg0.us), 'yyyy-MM-dd HH:mm:ss'),
      '.', format_string('%06d', pmod(arg0.us, 1000000)),
      format_string('%06d', cast(arg0.ps as bigint)))""",
    // half-up rounding at precision arg1 ∈ 0..12 (reference round() on
    // timestamp(12)); the carry may roll all the way into the date
    "tspico_round" -> s"""named_struct(
      'us', arg0.us - pmod(arg0.us, 1000000)
        + (((($fullFrac + cast(power(10, 12 - arg1) as bigint) div 2)
            div cast(power(10, 12 - arg1) as bigint))
            * cast(power(10, 12 - arg1) as bigint)) div 1000000),
      'ps', cast(pmod((($fullFrac + cast(power(10, 12 - arg1) as bigint) div 2)
            div cast(power(10, 12 - arg1) as bigint))
            * cast(power(10, 12 - arg1) as bigint), 1000000) as int))""",
    // signed pico addition with floor-carry into the micros field
    "tspico_add_picos" -> """named_struct(
      'us', arg0.us + (cast(arg0.ps as bigint) + cast(arg1 as bigint)
        - pmod(cast(arg0.ps as bigint) + cast(arg1 as bigint), 1000000)) div 1000000,
      'ps', cast(pmod(cast(arg0.ps as bigint) + cast(arg1 as bigint), 1000000) as int))""",
    "tspico_picos" -> "cast(arg0.ps as bigint)",
    "tspico_eq" -> "arg0.us = arg1.us AND arg0.ps = arg1.ps",
    "tspico_lt" ->
      "arg0.us < arg1.us OR (arg0.us = arg1.us AND arg0.ps < arg1.ps)",
  )

  // ---- zone-name-preserving zoned timestamps ----

  private val TszRe =
    """'^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}(?:\\.\\d{1,6})?) (.+)$'"""

  private val localTs = "from_utc_timestamp(timestamp_micros(arg0.us), arg0.zone)"

  private val tszTemplates: Seq[(String, String)] = Seq(
    "tsz" ->
      "named_struct('us', cast(arg0 as bigint), 'zone', cast(arg1 as string))",
    // 'YYYY-MM-DD HH:MM:SS[.ffffff] <IANA zone>' — the wall clock is
    // LOCAL in the named zone (to_utc_timestamp applies the zone's DST
    // rules for that date)
    "tsz_parse" -> s"""named_struct(
      'us', unix_micros(to_utc_timestamp(
          try_to_timestamp(regexp_extract(arg0, $TszRe, 1)),
          regexp_extract(arg0, $TszRe, 2))),
      'zone', regexp_extract(arg0, $TszRe, 2))""",
    "tsz_format" ->
      s"concat(date_format($localTs, 'yyyy-MM-dd HH:mm:ss.SSSSSS'), ' ', arg0.zone)",
    // AT TIME ZONE: same instant, the NAME travels (offset types lose it)
    "tsz_at_zone" ->
      "named_struct('us', arg0.us, 'zone', cast(arg1 as string))",
    "tsz_hour" -> s"cast(hour($localTs) as bigint)",
    "tsz_minute" -> s"cast(minute($localTs) as bigint)",
    "tsz_utc_us" -> "arg0.us",
    "tsz_eq" -> "arg0.us = arg1.us",
    "tsz_lt" -> "arg0.us < arg1.us",
  )

  // ---- picosecond + zone-name timestamps (r12: the last §1.3 corner) ----
  // The reference's `timestamp(p) with time zone` for p > 6 packs both a
  // LongTimestamp fraction and a TimeZoneKey; the emulation composes the
  // two packs above: (us BIGINT epoch micros, ps INT picos-of-microsecond,
  // zone STRING IANA name). Reached from verbatim SQL by the Dialect
  // typed-literal rewrite for `TIMESTAMP '<date> <time>.<7-12 digits>
  // <ZoneName>'`.

  private val TspzRe =
    """'^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2})(?:\\.(\\d{1,12}))? ([A-Za-z].*)$'"""

  private val tspzFrac12 =
    s"rpad(coalesce(nullif(regexp_extract(arg0, $TspzRe, 2), ''), '0'), 12, '0')"

  private val tspzLocal = "from_utc_timestamp(timestamp_micros(arg0.us), arg0.zone)"

  private val tspzTemplates: Seq[(String, String)] = Seq(
    // 'YYYY-MM-DD HH:MM:SS[.f{1,12}] <IANA zone>' — wall clock LOCAL in
    // the named zone; fraction digits 1-6 are micros, 7-12 picos
    "tspz_parse" -> s"""named_struct(
      'us', unix_micros(to_utc_timestamp(try_to_timestamp(concat(
          regexp_extract(arg0, $TspzRe, 1), '.', substring($tspzFrac12, 1, 6))),
          regexp_extract(arg0, $TspzRe, 3))),
      'ps', cast(substring($tspzFrac12, 7, 6) as int),
      'zone', regexp_extract(arg0, $TspzRe, 3))""",
    // canonical 12-digit fraction in the LOCAL wall clock (zone offsets
    // are whole minutes, so the sub-second fraction is zone-invariant)
    "tspz_format" -> s"""concat(
      date_format($tspzLocal, 'yyyy-MM-dd HH:mm:ss'),
      '.', format_string('%06d', pmod(arg0.us, 1000000)),
      format_string('%06d', cast(arg0.ps as bigint)),
      ' ', arg0.zone)""",
    // AT TIME ZONE: same instant (us, ps), the zone NAME travels
    "tspz_at_zone" ->
      "named_struct('us', arg0.us, 'ps', arg0.ps, 'zone', cast(arg1 as string))",
    "tspz_utc_us" -> "arg0.us",
    "tspz_picos" -> "cast(arg0.ps as bigint)",
    "tspz_eq" -> "arg0.us = arg1.us AND arg0.ps = arg1.ps",
    "tspz_lt" ->
      "arg0.us < arg1.us OR (arg0.us = arg1.us AND arg0.ps < arg1.ps)",
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    (picoTemplates ++ tszTemplates ++ tspzTemplates).foreach { case (name, template) =>
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
