package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Tables

/** Scalar-function surface (SURVEY §2.10) — one query per family, each
  * evaluating a battery of functions over real table rows so results are
  * data-dependent (not constant-folded away). Expressed in SQL to
  * exercise the engine's SQL entry the way the reference is driven.
  */
object FunctionQueries {
  type Q = (SparkSession, String) => DataFrame

  private def q(sql: String): Q = (s, dir) => Tables.sql(s, dir, sql)

  // Spark-side SQL; oracle below states the DuckDB-equivalent spelling.
  private val defs: Map[String, (String, String)] = Map(
    // CHAR(n) cast semantics (reference CharType.java: space-pad to the
    // declared length, truncate beyond it) — the Dialect shim lowers
    // CAST(x AS CHAR(n)) to rpad, closing a documented type-fidelity
    // corner; trailing-space-insensitive comparison is exercised via
    // the padded = rpad equality
    "fn_char_padding" -> (
      """SELECT n_nationkey,
        |CAST(n_name AS CHAR(12)) AS padded,
        |length(CAST(n_name AS CHAR(12))) AS padded_len,
        |CAST(n_name AS CHAR(12)) = rpad(n_name, 12, ' ') AS pad_eq,
        |CAST(n_name AS CHAR(4)) AS truncated,
        |CAST(CAST(n_nationkey AS CHAR(2)) AS CHAR(5)) AS nested
        |FROM nation""".stripMargin,
      """SELECT n_nationkey,
        |rpad(n_name, 12, ' ') AS padded,
        |length(rpad(n_name, 12, ' '))::int AS padded_len,
        |true AS pad_eq,
        |rpad(n_name, 4, ' ') AS truncated,
        |rpad(rpad(n_nationkey::varchar, 2, ' '), 5, ' ') AS nested
        |FROM nation""".stripMargin),
    // TIME(p) WITH TIME ZONE emulation (graft.functions.TimeTzFunctions;
    // reference StandardTypes.java:33-36). 25 deterministic values cover
    // ±14:00 offsets in 15-min steps, zero and trailing-zero fractions.
    // DuckDB-native pins: the VARCHAR cast format (round-tripped through
    // timetz_parse→timetz_format), local-clock extracts, and
    // timezone('Asia/Kolkata', ...) for AT TIME ZONE (+05:30 = the 330
    // the Spark side shifts by; India has no DST so the label is fixed).
    // UTC-instant ordering/equality (Trino TimeWithTimeZoneType
    // semantics) is stated ARITHMETICALLY in the oracle because DuckDB
    // 1.0 orders TIMETZ by local clock, not by instant. The fixed probes
    // are written as typed literals (TIME '12:00:00+02:00') — the r11
    // Dialect rewrite lowers them to timetz_parse, so the emulation is
    // reachable from verbatim Trino SQL (SqlBase.g4 literal rules).
    // plain TIME(p≤6), no zone (r11 — completing the §1.3 time row):
    // BIGINT microseconds-of-day (reference TimeType.java packs
    // picos-of-day into one long; micro is the oracle ceiling), so
    // ordering/equality are native. Typed literals (TIME '10:30:00')
    // reach time_parse via the Dialect rewrite; format matches DuckDB's
    // canonical TIME spelling (fraction trimmed, dropped when zero).
    "fn_time_plain" -> (
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    format_string('%02d:%02d:%02d.%06d',
        |      n_nationkey % 24, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60,
        |      ((n_nationkey * 123457) % 10000) * 100) AS ts
        |  FROM nation),
        |t AS (SELECT id, ts, time_parse(ts) AS tm FROM src)
        |SELECT id, ts,
        |  time_format(tm) AS s,
        |  cast(time_hour(tm) AS bigint) AS h,
        |  cast(time_minute(tm) AS bigint) AS mi,
        |  cast(time_second(tm) AS bigint) AS sec,
        |  tm AS us_of_day,
        |  cast(rank() OVER (ORDER BY tm) AS bigint) AS rk,
        |  TIME '10:30:00' < TIME '10:30:00.000001' AS lt_1us,
        |  time_format(TIME '23:59:59.999999') AS lit_max
        |FROM t""".stripMargin,
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    printf('%02d:%02d:%02d.%06d',
        |      n_nationkey % 24, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60,
        |      ((n_nationkey * 123457) % 10000) * 100) AS ts
        |  FROM nation)
        |SELECT id, ts,
        |  (ts::TIME)::VARCHAR AS s,
        |  extract(hour FROM ts::TIME)::bigint AS h,
        |  extract(minute FROM ts::TIME)::bigint AS mi,
        |  extract(second FROM ts::TIME)::bigint AS sec,
        |  ((id % 24) * 3600 + ((id * 7) % 60) * 60 + (id * 13) % 60)::bigint * 1000000
        |    + ((id * 123457) % 10000) * 100 AS us_of_day,
        |  rank() OVER (ORDER BY ts::TIME) AS rk,
        |  true AS lt_1us,
        |  '23:59:59.999999' AS lit_max
        |FROM src""".stripMargin),
    "fn_timetz" -> (
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    format_string('%02d:%02d:%02d.%06d%s%02d:%02d',
        |      n_nationkey % 24, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60,
        |      ((n_nationkey * 123457) % 10000) * 100,
        |      CASE WHEN (n_nationkey * 11) % 113 - 56 < 0 THEN '-' ELSE '+' END,
        |      abs(((n_nationkey * 11) % 113 - 56) * 15) div 60,
        |      abs(((n_nationkey * 11) % 113 - 56) * 15) % 60) AS ts
        |  FROM nation),
        |t AS (SELECT id, ts, timetz_parse(ts) AS tz FROM src)
        |SELECT id, ts,
        |  timetz_format(tz) AS s,
        |  cast(timetz_hour(tz) AS bigint) AS h,
        |  cast(timetz_minute(tz) AS bigint) AS mi,
        |  cast(timetz_second(tz) AS bigint) AS sec,
        |  timetz_to_utc_us(tz) AS utc_us,
        |  timetz_format(timetz_at_offset(tz, 330)) AS at_kolkata,
        |  timetz_eq(timetz_at_offset(tz, 330), tz) AS instant_preserved,
        |  cast(rank() OVER (ORDER BY timetz_to_utc_us(tz), tz.off) AS bigint) AS utc_rank,
        |  timetz_eq(TIME '12:00:00+02:00', TIME '11:00:00+01:00') AS eq_utc,
        |  timetz_lt(TIME '12:00:00+02:00', TIME '11:30:00+01:00') AS lt_utc
        |FROM t""".stripMargin,
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    printf('%02d:%02d:%02d.%06d%s%02d:%02d',
        |      n_nationkey % 24, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60,
        |      ((n_nationkey * 123457) % 10000) * 100,
        |      CASE WHEN (n_nationkey * 11) % 113 - 56 < 0 THEN '-' ELSE '+' END,
        |      abs(((n_nationkey * 11) % 113 - 56) * 15) // 60,
        |      abs(((n_nationkey * 11) % 113 - 56) * 15) % 60) AS ts,
        |    ((n_nationkey * 11) % 113 - 56) * 15 AS offmin,
        |    ((n_nationkey % 24) * 3600 + ((n_nationkey * 7) % 60) * 60
        |      + (n_nationkey * 13) % 60)::bigint * 1000000
        |      + ((n_nationkey * 123457) % 10000) * 100 AS local_us
        |  FROM nation)
        |SELECT id, ts,
        |  (ts::TIMETZ)::VARCHAR AS s,
        |  extract(hour FROM ts::TIMETZ)::bigint AS h,
        |  extract(minute FROM ts::TIMETZ)::bigint AS mi,
        |  extract(second FROM ts::TIMETZ)::bigint AS sec,
        |  ((local_us - offmin::bigint * 60000000) % 86400000000
        |    + 86400000000) % 86400000000 AS utc_us,
        |  (timezone('Asia/Kolkata', ts::TIMETZ))::VARCHAR AS at_kolkata,
        |  true AS instant_preserved,
        |  rank() OVER (ORDER BY ((local_us - offmin::bigint * 60000000) % 86400000000
        |    + 86400000000) % 86400000000, offmin) AS utc_rank,
        |  true AS eq_utc,
        |  true AS lt_utc
        |FROM src""".stripMargin),
    // TIMESTAMP(12) picosecond emulation (TimestampFidelity; reference
    // LongTimestamp = epoch micros + picos-of-micro). DuckDB has no
    // picosecond type, so the oracle restates the pico arithmetic over
    // its native micro timestamps: the seconds part of every formatted
    // value (incl. the rounding/addition carry) rides DuckDB's real
    // timestamp arithmetic (to_microseconds + strftime); only the
    // final 6 pico digits are printf-appended. Rank over (us, ps) must
    // equal rank over the canonical 12-digit string — lexicographic IS
    // chronological for a fixed-width format. The lit_* probes carry
    // TIMESTAMP '....123456789012' typed literals through the r11
    // Dialect rewrite (→ tspico_parse).
    "fn_timestamp_pico" -> (
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    concat(date_format(date_add(date'2021-03-01', n_nationkey * 73), 'yyyy-MM-dd'),
        |      ' ', format_string('%02d:%02d:%02d',
        |        n_nationkey % 24, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60),
        |      '.', format_string('%06d', (n_nationkey * 123457) % 1000000),
        |      format_string('%06d', (n_nationkey * 999983) % 1000000)) AS ts
        |  FROM nation),
        |t AS (SELECT id, ts, tspico_parse(ts) AS p FROM src)
        |SELECT id, ts,
        |  tspico_format(p) AS s,
        |  tspico_picos(p) AS ps,
        |  cast(pmod(p.us, 1000000) AS bigint) AS micro_frac,
        |  tspico_format(tspico_round(p, 9)) AS r9,
        |  tspico_format(tspico_round(p, 3)) AS r3,
        |  tspico_format(tspico_add_picos(p, 999999999999)) AS plus_big,
        |  cast(rank() OVER (ORDER BY p.us, p.ps) AS bigint) AS rk,
        |  tspico_lt(p, tspico_add_picos(p, 1)) AS lt_1ps,
        |  tspico_eq(tspico_round(p, 12), p) AS round12_id,
        |  tspico_format(TIMESTAMP '2020-01-02 03:04:05.123456789012') AS lit_s,
        |  tspico_lt(TIMESTAMP '2020-01-02 03:04:05.123456789012',
        |            TIMESTAMP '2020-01-02 03:04:05.123456789013') AS lit_lt
        |FROM t""".stripMargin,
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    strftime(date '2021-03-01' + n_nationkey * 73, '%Y-%m-%d')
        |      || ' ' || printf('%02d:%02d:%02d',
        |        n_nationkey % 24, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60)
        |      || '.' || printf('%06d', (n_nationkey * 123457) % 1000000)
        |      || printf('%06d', (n_nationkey * 999983) % 1000000) AS ts,
        |    (strftime(date '2021-03-01' + n_nationkey * 73, '%Y-%m-%d')
        |      || ' ' || printf('%02d:%02d:%02d',
        |        n_nationkey % 24, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60))::TIMESTAMP AS sec_ts,
        |    ((n_nationkey * 123457) % 1000000)::bigint * 1000000
        |      + (n_nationkey * 999983) % 1000000 AS frac12
        |  FROM nation)
        |SELECT id, ts,
        |  ts AS s,
        |  ((id * 999983) % 1000000)::bigint AS ps,
        |  ((id * 123457) % 1000000)::bigint AS micro_frac,
        |  strftime(sec_ts + to_microseconds((((frac12 + 500) // 1000) * 1000) // 1000000),
        |      '%Y-%m-%d %H:%M:%S.%f')
        |    || printf('%06d', (((frac12 + 500) // 1000) * 1000) % 1000000) AS r9,
        |  strftime(sec_ts + to_microseconds((((frac12 + 500000000) // 1000000000) * 1000000000) // 1000000),
        |      '%Y-%m-%d %H:%M:%S.%f')
        |    || printf('%06d', (((frac12 + 500000000) // 1000000000) * 1000000000) % 1000000) AS r3,
        |  strftime(sec_ts + to_microseconds((frac12 + 999999999999) // 1000000),
        |      '%Y-%m-%d %H:%M:%S.%f')
        |    || printf('%06d', (frac12 + 999999999999) % 1000000) AS plus_big,
        |  rank() OVER (ORDER BY ts) AS rk,
        |  true AS lt_1ps,
        |  true AS round12_id,
        |  '2020-01-02 03:04:05.123456789012' AS lit_s,
        |  true AS lit_lt
        |FROM src""".stripMargin),
    // zone-NAME-preserving TIMESTAMP WITH TIME ZONE (TimestampFidelity;
    // reference TimeZoneKey — the zone name, not its current offset,
    // travels with the value, so DST rules apply per date). Both sides
    // consult the IANA tzdb natively: Spark via
    // from_utc/to_utc_timestamp, DuckDB via timezone(zone, ts). The two
    // fixed probes pin a DST flip: 12:00 UTC is 08:00 in New York in
    // July but 07:00 in January — written as zone-NAME typed literals
    // (TIMESTAMP '2024-07-01 12:00:00.000000 UTC'), lowered to tsz_parse
    // by the r11 Dialect rewrite.
    "fn_timestamptz_zone" -> (
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    element_at(array('America/New_York','Asia/Kolkata','Asia/Tokyo',
        |      'Europe/London','UTC'), n_nationkey % 5 + 1) AS zone,
        |    concat(date_format(date_add(date'2024-01-05', n_nationkey * 29), 'yyyy-MM-dd'),
        |      ' ', format_string('%02d:%02d:%02d.%06d',
        |        12 + n_nationkey % 11, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60,
        |        (n_nationkey * 123457) % 1000000)) AS lcl
        |  FROM nation),
        |t AS (SELECT id, zone, lcl, tsz_parse(concat(lcl, ' ', zone)) AS z FROM src)
        |SELECT id, zone, lcl,
        |  tsz_format(z) AS s,
        |  tsz_utc_us(z) AS utc_us,
        |  tsz_hour(z) AS h, tsz_minute(z) AS mi,
        |  tsz_format(tsz_at_zone(z, 'Asia/Tokyo')) AS at_tokyo,
        |  tsz_at_zone(z, 'Asia/Tokyo').zone AS tokyo_zone,
        |  tsz_format(tsz_at_zone(tsz_at_zone(z, 'Asia/Tokyo'), zone)) = tsz_format(z) AS zone_roundtrip,
        |  cast(rank() OVER (ORDER BY tsz_utc_us(z), id) AS bigint) AS rk,
        |  tsz_format(tsz_at_zone(TIMESTAMP '2024-07-01 12:00:00.000000 UTC', 'America/New_York')) AS dst_jul,
        |  tsz_format(tsz_at_zone(TIMESTAMP '2024-01-15 12:00:00.000000 UTC', 'America/New_York')) AS dst_jan
        |FROM t""".stripMargin,
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    ['America/New_York','Asia/Kolkata','Asia/Tokyo',
        |      'Europe/London','UTC'][n_nationkey % 5 + 1] AS zone,
        |    strftime(date '2024-01-05' + n_nationkey * 29, '%Y-%m-%d')
        |      || ' ' || printf('%02d:%02d:%02d.%06d',
        |        12 + n_nationkey % 11, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60,
        |        (n_nationkey * 123457) % 1000000) AS lcl
        |  FROM nation),
        |t AS (SELECT id, zone, lcl, timezone(zone, lcl::TIMESTAMP) AS z FROM src)
        |SELECT id, zone, lcl,
        |  strftime(timezone(zone, z), '%Y-%m-%d %H:%M:%S.%f') || ' ' || zone AS s,
        |  epoch_us(z) AS utc_us,
        |  extract(hour FROM timezone(zone, z))::bigint AS h,
        |  extract(minute FROM timezone(zone, z))::bigint AS mi,
        |  strftime(timezone('Asia/Tokyo', z), '%Y-%m-%d %H:%M:%S.%f') || ' Asia/Tokyo' AS at_tokyo,
        |  'Asia/Tokyo' AS tokyo_zone,
        |  true AS zone_roundtrip,
        |  rank() OVER (ORDER BY epoch_us(z), id) AS rk,
        |  strftime(timezone('America/New_York', timezone('UTC', TIMESTAMP '2024-07-01 12:00:00')),
        |    '%Y-%m-%d %H:%M:%S.%f') || ' America/New_York' AS dst_jul,
        |  strftime(timezone('America/New_York', timezone('UTC', TIMESTAMP '2024-01-15 12:00:00')),
        |    '%Y-%m-%d %H:%M:%S.%f') || ' America/New_York' AS dst_jan
        |FROM t""".stripMargin),
    // picosecond + zone-name TIMESTAMP (r12 — the last §1.3 literal
    // corner): the reference's timestamp(9..12) WITH TIME ZONE carries
    // BOTH a LongTimestamp fraction and a TimeZoneKey. Emulated as
    // (us, ps, zone) — the tspz pack composes the pico and zone packs —
    // and reached from verbatim SQL via the Dialect typed-literal
    // rewrite (a 7-12 digit fraction AND a zone name now dispatch to
    // tspz_parse). DuckDB has neither picoseconds nor a zone-preserving
    // type, so the oracle rides its native timestamptz for the
    // seconds+micros part (timezone(zone, ...) consults the same IANA
    // tzdb) and printf-appends the 6 pico digits, exactly as
    // fn_timestamp_pico does.
    "fn_timestamp_pico_zone" -> (
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    element_at(array('America/New_York','Asia/Kolkata','Asia/Tokyo',
        |      'Europe/London','UTC'), n_nationkey % 5 + 1) AS zone,
        |    concat(date_format(date_add(date'2024-01-05', n_nationkey * 29), 'yyyy-MM-dd'),
        |      ' ', format_string('%02d:%02d:%02d',
        |        12 + n_nationkey % 11, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60),
        |      '.', format_string('%06d', (n_nationkey * 123457) % 1000000),
        |      format_string('%06d', (n_nationkey * 999983) % 1000000)) AS lcl
        |  FROM nation),
        |t AS (SELECT id, zone, lcl, tspz_parse(concat(lcl, ' ', zone)) AS z FROM src)
        |SELECT id, zone, lcl,
        |  tspz_format(z) AS s,
        |  tspz_utc_us(z) AS utc_us,
        |  tspz_picos(z) AS ps,
        |  tspz_format(tspz_at_zone(z, 'Asia/Tokyo')) AS at_tokyo,
        |  cast(rank() OVER (ORDER BY tspz_utc_us(z), tspz_picos(z), id) AS bigint) AS rk,
        |  tspz_format(TIMESTAMP '2024-07-01 12:00:00.123456789012 UTC') AS lit_s,
        |  tspz_lt(TIMESTAMP '2024-07-01 12:00:00.123456789012 America/New_York',
        |          TIMESTAMP '2024-07-01 12:00:00.123456789013 America/New_York') AS lit_lt,
        |  tspz_format(tspz_at_zone(TIMESTAMP '2024-07-01 12:00:00.000000001 UTC',
        |    'America/New_York')) AS dst_jul
        |FROM t""".stripMargin,
      """WITH src AS (
        |  SELECT n_nationkey AS id,
        |    ['America/New_York','Asia/Kolkata','Asia/Tokyo',
        |      'Europe/London','UTC'][n_nationkey % 5 + 1] AS zone,
        |    strftime(date '2024-01-05' + n_nationkey * 29, '%Y-%m-%d')
        |      || ' ' || printf('%02d:%02d:%02d',
        |        12 + n_nationkey % 11, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60)
        |      || '.' || printf('%06d', (n_nationkey * 123457) % 1000000)
        |      || printf('%06d', (n_nationkey * 999983) % 1000000) AS lcl,
        |    strftime(date '2024-01-05' + n_nationkey * 29, '%Y-%m-%d')
        |      || ' ' || printf('%02d:%02d:%02d.%06d',
        |        12 + n_nationkey % 11, (n_nationkey * 7) % 60, (n_nationkey * 13) % 60,
        |        (n_nationkey * 123457) % 1000000) AS lcl6,
        |    ((n_nationkey * 999983) % 1000000)::bigint AS ps
        |  FROM nation),
        |t AS (SELECT id, zone, lcl, ps, timezone(zone, lcl6::TIMESTAMP) AS z FROM src)
        |SELECT id, zone, lcl,
        |  strftime(timezone(zone, z), '%Y-%m-%d %H:%M:%S.%f')
        |    || printf('%06d', ps) || ' ' || zone AS s,
        |  epoch_us(z) AS utc_us,
        |  ps,
        |  strftime(timezone('Asia/Tokyo', z), '%Y-%m-%d %H:%M:%S.%f')
        |    || printf('%06d', ps) || ' Asia/Tokyo' AS at_tokyo,
        |  rank() OVER (ORDER BY epoch_us(z), ps, id) AS rk,
        |  '2024-07-01 12:00:00.123456789012 UTC' AS lit_s,
        |  true AS lit_lt,
        |  strftime(timezone('America/New_York', timezone('UTC', TIMESTAMP '2024-07-01 12:00:00')),
        |    '%Y-%m-%d %H:%M:%S.%f') || '001000' || ' America/New_York' AS dst_jul
        |FROM t""".stripMargin),
    "fn_string" -> (
      """SELECT n_name,
        |length(n_name) AS len, lower(n_name) AS lo, upper(n_name) AS up,
        |substring(n_name, 2, 3) AS sub, reverse(n_name) AS rev,
        |replace(n_name, 'A', '_') AS repl, trim('  x  ') AS trimmed,
        |lpad(n_name, 12, '.') AS padded, rpad(n_name, 12, '.') AS rpadded,
        |concat(n_name, '-', cast(n_nationkey AS string)) AS cat,
        |concat_ws('/', n_name, 'x', 'y') AS catws,
        |split_part(n_name, 'A', 1) AS sp1,
        |instr(n_name, 'AN') AS pos,
        |left(n_name, 3) AS l3, right(n_name, 3) AS r3,
        |repeat(n_name, 2) AS rep2,
        |translate(n_name, 'AEI', 'aei') AS tr,
        |levenshtein(n_name, 'FRANCE') AS lev,
        |ascii(n_name) AS asc_first, chr(65 + n_nationkey) AS chr_k,
        |contains(n_name, 'AN') AS has_an,
        |startswith(n_name, 'A') AS sw, endswith(n_name, 'A') AS ew
        |FROM nation""".stripMargin,
      """SELECT n_name,
        |length(n_name) AS len, lower(n_name) AS lo, upper(n_name) AS up,
        |substring(n_name, 2, 3) AS sub, reverse(n_name) AS rev,
        |replace(n_name, 'A', '_') AS repl, trim('  x  ') AS trimmed,
        |lpad(n_name, 12, '.') AS padded, rpad(n_name, 12, '.') AS rpadded,
        |concat(n_name, '-', cast(n_nationkey AS varchar)) AS cat,
        |concat_ws('/', n_name, 'x', 'y') AS catws,
        |split_part(n_name, 'A', 1) AS sp1,
        |instr(n_name, 'AN') AS pos,
        |left(n_name, 3) AS l3, right(n_name, 3) AS r3,
        |repeat(n_name, 2) AS rep2,
        |translate(n_name, 'AEI', 'aei') AS tr,
        |levenshtein(n_name, 'FRANCE') AS lev,
        |ascii(n_name) AS asc_first, chr(65 + n_nationkey) AS chr_k,
        |contains(n_name, 'AN') AS has_an,
        |starts_with(n_name, 'A') AS sw, ends_with(n_name, 'A') AS ew
        |FROM nation""".stripMargin),
    "fn_regex" -> (
      """SELECT p_partkey, p_name,
        |p_name rlike '^[a-z]+ ' AS starts_word,
        |regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |regexp_replace(p_name, '[aeiou]', '*') AS devowel,
        |size(split(p_name, ' ')) AS n_tokens
        |FROM part WHERE p_partkey <= 200""".stripMargin,
      """SELECT p_partkey, p_name,
        |regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
        |coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word,
        |regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel,
        |len(string_split(p_name, ' ')) AS n_tokens
        |FROM part WHERE p_partkey <= 200""".stripMargin),
    // lambda-replacement regexp_replace (reference
    // JoniRegexpReplaceLambdaFunction.java:40): the lambda sees the
    // capturing groups per match; oracle states the same transforms with
    // DuckDB backreference syntax. (Note: group arrays index 0-based here
    // vs the reference's 1-based ARRAY — documented dialect divergence.)
    "fn_regex_lambda" -> (
      """SELECT p_partkey,
        |regexp_replace(p_name, '([aeiou]+)', g -> concat('<', g[0], '>')) AS vowels_marked,
        |regexp_replace(p_name, '([a-z]+) ([a-z]+)', g -> concat(g[1], ' ', g[0])) AS word_swapped,
        |regexp_replace(p_name, '([a-z])([a-z]*)( ?)', g -> concat(upper(g[0]), g[1], g[2])) AS title_cased
        |FROM part WHERE p_partkey <= 200""".stripMargin,
      """SELECT p_partkey,
        |regexp_replace(p_name, '([aeiou]+)', '<\1>', 'g') AS vowels_marked,
        |regexp_replace(p_name, '([a-z]+) ([a-z]+)', '\2 \1', 'g') AS word_swapped,
        |list_aggregate(list_transform(string_split(p_name, ' '),
        |  w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS title_cased
        |FROM part WHERE p_partkey <= 200""".stripMargin),
    // reduce_agg as a REGISTERED aggregate (reference
    // ReduceAggregationFunction.java) — lambdas chosen so the fold is
    // exactly reproducible (integer-valued doubles; associative ops),
    // letting plain SQL aggregates serve as the oracle
    "agg_reduce_agg" -> (
      """SELECT l_returnflag,
        |reduce_agg(l_quantity, cast(0 AS double), (s, x) -> s + x * x, (a, b) -> a + b) AS sum_sq,
        |reduce_agg(l_quantity, cast(0 AS double), (s, x) -> greatest(s, x), (a, b) -> greatest(a, b)) AS max_q,
        |reduce_agg(cast(l_linenumber AS bigint), cast(0 AS bigint),
        |  (s, x) -> s | shiftleft(1, cast(x AS int)), (a, b) -> a | b) AS line_mask
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |sum(l_quantity * l_quantity) AS sum_sq,
        |max(l_quantity) AS max_q,
        |cast(bit_or((1::bigint << l_linenumber::int)) AS bigint) AS line_mask
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    "fn_math" -> (
      """SELECT l_orderkey, l_linenumber,
        |abs(l_quantity - 25) AS a, cast(ceil(l_discount * 100) AS bigint) AS c,
        |cast(floor(l_extendedprice / 1000) AS bigint) AS f,
        |round(l_extendedprice, 1) AS r1,
        |round(exp(l_discount), 6) AS e, round(ln(l_quantity), 6) AS lnv,
        |round(log10(l_extendedprice), 6) AS lg10, round(log2(l_quantity), 6) AS lg2,
        |round(sqrt(l_quantity), 6) AS sq, round(cbrt(l_quantity), 6) AS cb,
        |power(l_quantity, 2) AS p2, pmod(cast(l_orderkey AS int), 7) AS m7,
        |cast(sign(l_discount - 0.05) AS int) AS sg,
        |greatest(l_quantity, l_discount * 100) AS g,
        |least(l_quantity, l_discount * 100) AS lst,
        |round(sin(l_discount), 6) AS sn, round(cos(l_discount), 6) AS cs,
        |round(atan(l_discount), 6) AS at,
        |round(degrees(l_discount), 6) AS dg, round(radians(l_quantity), 6) AS rd,
        |cast(width_bucket(l_quantity, 0, 50, 10) AS bigint) AS wb
        |FROM lineitem WHERE l_orderkey <= 300""".stripMargin,
      """SELECT l_orderkey, l_linenumber,
        |abs(l_quantity - 25) AS a, cast(ceil(l_discount * 100) AS bigint) AS c,
        |cast(floor(l_extendedprice / 1000) AS bigint) AS f,
        |round(l_extendedprice, 1) AS r1,
        |round(exp(l_discount), 6) AS e, round(ln(l_quantity), 6) AS lnv,
        |round(log10(l_extendedprice), 6) AS lg10, round(log2(l_quantity), 6) AS lg2,
        |round(sqrt(l_quantity), 6) AS sq, round(cbrt(l_quantity), 6) AS cb,
        |power(l_quantity, 2) AS p2, (l_orderkey::int % 7) AS m7,
        |cast(sign(l_discount - 0.05) AS int) AS sg,
        |greatest(l_quantity, l_discount * 100) AS g,
        |least(l_quantity, l_discount * 100) AS lst,
        |round(sin(l_discount), 6) AS sn, round(cos(l_discount), 6) AS cs,
        |round(atan(l_discount), 6) AS at,
        |round(degrees(l_discount), 6) AS dg, round(radians(l_quantity), 6) AS rd,
        |cast(least(greatest(floor((l_quantity - 0) / 5.0)::bigint + 1, 0), 11) AS bigint) AS wb
        |FROM lineitem WHERE l_orderkey <= 300""".stripMargin),
    "fn_datetime" -> (
      """SELECT o_orderkey,
        |year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |month(o_orderdate) AS mo, day(o_orderdate) AS d,
        |dayofweek(o_orderdate) AS dow, dayofyear(o_orderdate) AS doy,
        |weekofyear(o_orderdate) AS wk,
        |date_trunc('month', o_orderdate) AS mstart,
        |date_trunc('quarter', o_orderdate) AS qstart,
        |o_orderdate + INTERVAL '30' DAY AS plus30,
        |datediff(timestamp '2000-01-01', o_orderdate) AS days_to_2k,
        |last_day(o_orderdate) AS eom,
        |date_format(o_orderdate, 'yyyy-MM-dd') AS iso,
        |unix_timestamp(o_orderdate) AS epoch_s
        |FROM orders WHERE o_orderkey <= 500""".stripMargin,
      """SELECT o_orderkey,
        |year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |month(o_orderdate) AS mo, day(o_orderdate) AS d,
        |dayofweek(o_orderdate) + 1 AS dow, dayofyear(o_orderdate) AS doy,
        |weekofyear(o_orderdate) AS wk,
        |date_trunc('month', o_orderdate)::timestamp AS mstart,
        |date_trunc('quarter', o_orderdate)::timestamp AS qstart,
        |o_orderdate + INTERVAL 30 DAY AS plus30,
        |date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_2k,
        |last_day(o_orderdate::date) AS eom,
        |strftime(o_orderdate, '%Y-%m-%d') AS iso,
        |epoch(o_orderdate)::bigint AS epoch_s
        |FROM orders WHERE o_orderkey <= 500""".stripMargin),
    "fn_conditional" -> (
      """SELECT c_custkey,
        |CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
        |coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |if(c_acctbal > 0, 'pos', 'nonpos') AS sign_tag,
        |nvl2(nullif(c_nationkey, 0), 'has_nation', 'zero') AS nv,
        |try_divide(c_acctbal, c_nationkey) AS safe_div,
        |ifnull(nullif(c_nationkey, 1), -1) AS nk_or_neg1
        |FROM customer WHERE c_custkey <= 500""".stripMargin,
      """SELECT c_custkey,
        |CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
        |coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS sign_tag,
        |CASE WHEN nullif(c_nationkey, 0) IS NOT NULL THEN 'has_nation' ELSE 'zero' END AS nv,
        |CASE WHEN c_nationkey = 0 THEN NULL ELSE c_acctbal / c_nationkey END AS safe_div,
        |coalesce(nullif(c_nationkey, 1), -1) AS nk_or_neg1
        |FROM customer WHERE c_custkey <= 500""".stripMargin),
    // Array outputs are rendered as joined strings: the driver's pandas
    // comparator cannot sort raw array columns (round-1 ERR), and the
    // joined form is engine-neutral while still exercising each function.
    // The reference's full pagination spelling (r14): OFFSET n ROWS +
    // FETCH FIRST k ROWS ONLY — the noise word drops, FETCH lowers to
    // LIMIT.
    "limit_offset_rows" -> (
      """SELECT o_orderkey FROM orders ORDER BY o_orderkey
        |OFFSET 10 ROWS FETCH FIRST 5 ROWS ONLY""".stripMargin,
      """SELECT o_orderkey FROM orders ORDER BY o_orderkey
        |LIMIT 5 OFFSET 10""".stripMargin),
    // Trino's two-argument IF (r14): IF(cond, v) -> IF(cond, v, NULL).
    "fn_if_two_arg" -> (
      """SELECT n_nationkey,
        |  IF(n_regionkey > 2, n_name) AS maybe_name,
        |  IF(n_regionkey = 0, n_nationkey * 10) AS maybe_val
        |FROM nation ORDER BY n_nationkey""".stripMargin,
      """SELECT n_nationkey,
        |  CASE WHEN n_regionkey > 2 THEN n_name END AS maybe_name,
        |  CASE WHEN n_regionkey = 0 THEN n_nationkey * 10 END AS maybe_val
        |FROM nation ORDER BY n_nationkey""".stripMargin),
    // Trino's ROW(...) constructor (r14): lowers to struct(...); fields
    // follow Spark's struct naming (source column names for plain
    // columns, col1/col2 for expressions — the reference's anonymous
    // row fields are not SQL-addressable either). The row pins real
    // struct construction by reading the fields back.
    "fn_row_constructor" -> (
      """SELECT n_nationkey,
        |  ROW(n_nationkey * 2, upper(n_name)).col1 AS f1,
        |  ROW(n_nationkey * 2, upper(n_name)).col2 AS f2,
        |  ROW(n_regionkey, n_name).n_regionkey AS f3
        |FROM nation ORDER BY n_nationkey""".stripMargin,
      """SELECT n_nationkey, n_nationkey * 2 AS f1, upper(n_name) AS f2,
        |  n_regionkey AS f3
        |FROM nation ORDER BY n_nationkey""".stripMargin),
    // Trino typed numeric literals (r14): DECIMAL/DOUBLE/BIGINT '…'
    // lower to casts with the literal-inferred decimal shape; the
    // oracle states the same values as plain literals (DuckDB has no
    // generic typed-literal grammar).
    "fn_typed_literals" -> (
      """SELECT n_nationkey,
        |  cast(n_regionkey + DECIMAL '0.5' AS double) AS shifted,
        |  n_nationkey * DOUBLE '2.5' AS scaled,
        |  BIGINT '1000000000000' + n_nationkey AS big
        |FROM nation ORDER BY n_nationkey""".stripMargin,
      """SELECT n_nationkey,
        |  cast(n_regionkey + 0.5 AS double) AS shifted,
        |  n_nationkey * 2.5 AS scaled,
        |  1000000000000 + n_nationkey AS big
        |FROM nation ORDER BY n_nationkey""".stripMargin),
    // Bare VARCHAR casts in the reference's spelling (r14): the dialect
    // shim lowers CAST(x AS VARCHAR) to STRING (Spark demands a length
    // on VARCHAR); TRY_CAST keeps null-on-failure. DuckDB runs the
    // original spelling natively.
    "fn_cast_varchar" -> (
      """SELECT n_nationkey,
        |  CAST(n_regionkey AS VARCHAR) AS r_str,
        |  length(CAST(n_name AS VARCHAR)) AS name_len,
        |  TRY_CAST(n_name AS VARCHAR) AS name_str
        |FROM nation ORDER BY n_nationkey""".stripMargin,
      """SELECT n_nationkey,
        |  CAST(n_regionkey AS VARCHAR) AS r_str,
        |  length(CAST(n_name AS VARCHAR)) AS name_len,
        |  TRY_CAST(n_name AS VARCHAR) AS name_str
        |FROM nation ORDER BY n_nationkey""".stripMargin),
    // Trino's bracketed array constructor (r14): the dialect shim
    // rewrites ARRAY[…] (Spark's parser rejects it) to array(…);
    // 1-based access spelled via element_at on both engines (bracket
    // subscripts stay Spark 0-based — documented divergence).
    "fn_array_literal" -> (
      """SELECT n_nationkey,
        |  element_at(ARRAY[n_nationkey, n_regionkey, 7], 1) AS first_el,
        |  size(ARRAY[ARRAY[n_nationkey], ARRAY[n_regionkey]]) AS outer_len,
        |  array_join(ARRAY['r', cast(n_regionkey AS string)], '-') AS tag
        |FROM nation ORDER BY n_nationkey""".stripMargin,
      """SELECT n_nationkey,
        |  list_extract(ARRAY[n_nationkey, n_regionkey, 7], 1) AS first_el,
        |  len(ARRAY[ARRAY[n_nationkey], ARRAY[n_regionkey]]) AS outer_len,
        |  array_to_string(ARRAY['r', cast(n_regionkey AS varchar)], '-') AS tag
        |FROM nation ORDER BY n_nationkey""".stripMargin),
    "fn_array" -> (
      """SELECT n_nationkey,
        |array_join(transform(array(n_nationkey, n_regionkey), x -> cast(x AS string)), ',') AS pair,
        |array_join(transform(sequence(1, 5), x -> cast(x AS string)), ',') AS seq5,
        |size(sequence(1, n_nationkey + 1)) AS seq_n,
        |array_contains(sequence(0, 10, 2), n_nationkey) AS in_evens,
        |array_position(sequence(0, 24), n_nationkey) AS posn,
        |array_max(array(n_nationkey, n_regionkey, 7)) AS mx,
        |array_min(array(n_nationkey, n_regionkey, 7)) AS mn,
        |array_join(transform(sort_array(array_distinct(array(n_regionkey, n_regionkey, 1))), x -> cast(x AS string)), ',') AS dedup,
        |array_join(transform(sort_array(array(3, n_nationkey, 1)), x -> cast(x AS string)), ',') AS sorted,
        |array_join(transform(sequence(1, 3), x -> cast(x * n_regionkey AS string)), ';') AS joined,
        |aggregate(sequence(1, n_nationkey + 1), 0L, (acc, x) -> acc + x) AS tri,
        |exists(sequence(1, 6), x -> x = n_regionkey) AS has_rk,
        |forall(sequence(1, 6), x -> x < 99) AS all_small,
        |array_join(transform(filter(sequence(1, 10), x -> x % (n_regionkey + 2) = 0), x -> cast(x AS string)), ',') AS multiples,
        |array_join(transform(slice(sequence(10, 20), 2, 3), x -> cast(x AS string)), ',') AS sl,
        |array_join(transform(flatten(array(sequence(1, 2), sequence(3, 4))), x -> cast(x AS string)), ',') AS flat,
        |array_join(transform(zip_with(sequence(1, 3), sequence(4, 6), (a, b) -> a * b), x -> cast(x AS string)), ',') AS zw,
        |array_join(transform(array_repeat(n_regionkey, 2), x -> cast(x AS string)), ',') AS rep
        |FROM nation""".stripMargin,
      """SELECT n_nationkey,
        |array_to_string(list_transform([n_nationkey, n_regionkey], x -> x::varchar), ',') AS pair,
        |array_to_string(list_transform(range(1, 6), x -> x::varchar), ',') AS seq5,
        |len(range(1, n_nationkey + 2)) AS seq_n,
        |list_contains(range(0, 11, 2), n_nationkey) AS in_evens,
        |coalesce(list_position(range(0, 25), n_nationkey), 0) AS posn,
        |list_max([n_nationkey, n_regionkey, 7]) AS mx,
        |list_min([n_nationkey, n_regionkey, 7]) AS mn,
        |array_to_string(list_transform(list_sort(list_distinct([n_regionkey, n_regionkey, 1])), x -> x::varchar), ',') AS dedup,
        |array_to_string(list_transform(list_sort([3, n_nationkey, 1]), x -> x::varchar), ',') AS sorted,
        |array_to_string(list_transform(range(1, 4), x -> (x * n_regionkey)::varchar), ';') AS joined,
        |list_sum(range(1, n_nationkey + 2))::bigint AS tri,
        |len(list_filter(range(1, 7), x -> x = n_regionkey)) > 0 AS has_rk,
        |len(list_filter(range(1, 7), x -> x < 99)) = 6 AS all_small,
        |array_to_string(list_transform(list_filter(range(1, 11), x -> x % (n_regionkey + 2) = 0), x -> x::varchar), ',') AS multiples,
        |array_to_string(list_transform(range(10, 21)[2:4], x -> x::varchar), ',') AS sl,
        |array_to_string(list_transform(flatten([range(1, 3), range(3, 5)]), x -> x::varchar), ',') AS flat,
        |array_to_string(list_transform([x * (x + 3) FOR x IN range(1, 4)], x -> x::varchar), ',') AS zw,
        |array_to_string(list_transform([n_regionkey, n_regionkey], x -> x::varchar), ',') AS rep
        |FROM nation""".stripMargin),
    "fn_json" -> (
      """SELECT event_id,
        |get_json_object(props, '$.k') AS k_str,
        |cast(get_json_object(props, '$.k') AS bigint) AS k_num,
        |get_json_object(props, '$.missing') AS missing
        |FROM events WHERE event_id <= 500""".stripMargin,
      """SELECT event_id,
        |json_extract_string(props, '$.k') AS k_str,
        |json_extract_string(props, '$.k')::bigint AS k_num,
        |json_extract_string(props, '$.missing') AS missing
        |FROM events WHERE event_id <= 500""".stripMargin),
    "fn_hash_binary" -> (
      """SELECT c_custkey,
        |md5(c_name) AS h_md5,
        |sha2(c_name, 256) AS h_sha256,
        |hex(encode(c_name, 'UTF-8')) AS hx,
        |base64(encode(c_name, 'UTF-8')) AS b64,
        |length(encode(c_name, 'UTF-8')) AS n_bytes
        |FROM customer WHERE c_custkey <= 300""".stripMargin,
      """SELECT c_custkey,
        |md5(c_name) AS h_md5,
        |sha256(c_name) AS h_sha256,
        |upper(hex(c_name::blob)) AS hx,
        |to_base64(c_name::blob) AS b64,
        |octet_length(c_name::blob) AS n_bytes
        |FROM customer WHERE c_custkey <= 300""".stripMargin),
    // Trino-compat pack (GraftFunctions): URL family + math CDFs + luhn.
    // Oracle states expected values computed independently in DuckDB SQL.
    "fn_url" -> (
      """SELECT
        |url_extract_protocol(u) AS proto, url_extract_host(u) AS host,
        |url_extract_port(u) AS port, url_extract_path(u) AS path,
        |url_extract_query(u) AS query, url_extract_parameter(u, 'b') AS param_b
        |FROM (SELECT 'https://example.com:8443/docs/index.html?a=1&b=two#frag' AS u)""".stripMargin,
      """SELECT 'https' AS proto, 'example.com' AS host, 8443::bigint AS port,
        |'/docs/index.html' AS path, 'a=1&b=two' AS query, 'two' AS param_b""".stripMargin),
    // Trino spellings end-to-end through the SQL entry: name aliases
    // (strpos/to_hex/to_utf8/format_datetime), the JSON family under
    // Trino names, split_to_map/multimap, hmac, array stragglers, and
    // the AT TIME ZONE dialect rewrite. Oracle restates expected values
    // in DuckDB-computable form.
    "fn_trino_names" -> (
      """SELECT n_name,
        |strpos(n_name, 'AN') AS pos,
        |to_hex(to_utf8(n_name)) AS hx,
        |format_datetime(TIMESTAMP '2024-03-05 07:08:09', 'yyyy-MM-dd HH:mm') AS fdt,
        |TIMESTAMP '2024-01-15 12:00:00' AT TIME ZONE 'America/New_York' AS attz,
        |element_at(split_to_map('a=1;b=2', ';', '='), 'b') AS stm_b,
        |array_join(element_at(split_to_multimap('k=1;k=2;j=9', ';', '='), 'k'), ',') AS stmm_k,
        |hmac_sha256('message', 'key') AS hm256,
        |hmac_md5('message', 'key') AS hmmd5,
        |contains_sequence(array('a', 'b', 'c', 'd'), array('b', 'c')) AS cseq,
        |contains_sequence(array('a', 'b', 'c', 'd'), array('b', 'd')) AS cseq_no,
        |size(ngrams(array('w', 'x', 'y', 'z'), 2)) AS n_ngrams,
        |size(combinations(array('a', 'b', 'c', 'd'), 2)) AS n_comb,
        |array_join(regexp_extract_all(lower(n_name), '[aeiou]+', 0), '') AS vowels
        |FROM nation""".stripMargin,
      """SELECT n_name,
        |CASE WHEN position('AN' IN n_name) IS NULL THEN 0
        |     ELSE position('AN' IN n_name) END AS pos,
        |upper(hex(n_name::blob)) AS hx,
        |'2024-03-05 07:08' AS fdt,
        |TIMESTAMP '2024-01-15 07:00:00' AS attz,
        |'2' AS stm_b, '1,2' AS stmm_k,
        |'6e9ef29b75fffc5b7abae527d58fdadb2fe42e7219011976917343065f58ed4a' AS hm256,
        |'4e4748e62b463521f6775fbf921234b5' AS hmmd5,
        |true AS cseq, false AS cseq_no,
        |3::int AS n_ngrams, 6::int AS n_comb,
        |array_to_string(regexp_extract_all(lower(n_name), '[aeiou]+'), '') AS vowels
        |FROM nation""".stripMargin),
    // JSON family under Trino names (JsonFunctions.java) over real rows
    "fn_json_trino" -> (
      """SELECT event_id,
        |json_extract_scalar(props, '$.k') AS k_scalar,
        |json_extract(props, '$.k') AS k_json,
        |json_size(props, '$') AS root_size,
        |json_parse(props) AS canon,
        |json_array_length('[1,2,3,4]') AS jal,
        |json_array_contains('[1,2,3]', '2') AS jac,
        |json_array_get('[10,20,30]', -1) AS jag
        |FROM events WHERE event_id <= 500""".stripMargin,
      """SELECT event_id,
        |json_extract_string(props, '$.k') AS k_scalar,
        |json_extract(props, '$.k')::varchar AS k_json,
        |len(json_keys(props)) AS root_size,
        |json_extract(props, '$')::varchar AS canon,
        |4::int AS jal, true AS jac, '30' AS jag
        |FROM events WHERE event_id <= 500""".stripMargin),
    // second misc pack: unicode normalize, ISO-8601 conversions,
    // parse_duration, teradata index/char2hexint, Trino's sparse-map
    // cosine_similarity signature
    "fn_misc2" -> (
      s"""SELECT
        |length(normalize_unicode('é', 'NFC')) AS nfc_len,
        |to_iso8601(TIMESTAMP '2024-03-05 07:08:09') AS iso,
        |cast(from_iso8601_timestamp('2024-03-05T07:08:09.500Z') AS string) AS from_iso,
        |parse_duration('3.2m') AS dur_m,
        |parse_duration('150ms') AS dur_ms,
        |index('FRANCE', 'AN') AS idx,
        |char2hexint('AB') AS hexint,
        |round(cosine_similarity_sparse(map('a', 1.0d, 'b', 2.0d),
        |  map('b', 2.0d, 'c', 1.0d)), 6) AS cos_sparse""".stripMargin,
      """SELECT 1 AS nfc_len,
        |'2024-03-05T07:08:09.000Z' AS iso,
        |'2024-03-05 07:08:09.5' AS from_iso,
        |192.0::double AS dur_m, 0.15::double AS dur_ms,
        |position('AN' IN 'FRANCE') AS idx,
        |'00410042' AS hexint,
        |0.8::double AS cos_sparse""".stripMargin),
    // ml-plugin analog: the aggregate accumulates normal equations, so
    // the learned single-feature model must agree with the closed-form
    // regr_slope/regr_intercept the oracle computes
    "ml_linear_regression" -> (
      """SELECT l_linestatus,
        |round(element_at(m, 1), 4) AS slope,
        |round(element_at(m, 2), 4) AS intercept,
        |round(regress(array(10.0d), m), 4) AS pred_at_10
        |FROM (SELECT l_linestatus,
        |      learn_linear_regressor(array(l_quantity), l_extendedprice) AS m
        |      FROM lineitem GROUP BY l_linestatus)""".stripMargin,
      """SELECT l_linestatus,
        |round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |round(regr_slope(l_extendedprice, l_quantity) * 10 +
        |      regr_intercept(l_extendedprice, l_quantity), 4) AS pred_at_10
        |FROM lineitem GROUP BY l_linestatus""".stripMargin),
    // nearest-centroid classifier: training = per-class means (order-
    // independent sums → deterministic model), classify = argmin
    // euclidean; the oracle recomputes centroids per dimension and takes
    // min_by over list_distance
    "ml_classifier" -> (
      """WITH model AS (
        |  SELECT learn_classifier(transform(embedding, x -> cast(x AS double)),
        |    cast(label AS string)) AS m
        |  FROM embeddings)
        |SELECT e.vec_id,
        |  classify(transform(e.embedding, x -> cast(x AS double)), model.m) AS pred
        |FROM embeddings e CROSS JOIN model""".stripMargin,
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> x::double) AS emb FROM embeddings),
        |dims AS (
        |  SELECT label, i AS dim, avg(emb[i]) AS m
        |  FROM e, LATERAL (SELECT unnest(range(1, 65)) AS i) g
        |  GROUP BY 1, 2),
        |cent AS (SELECT label, list(m ORDER BY dim) AS cvec FROM dims GROUP BY label)
        |SELECT e.vec_id, min_by(c.label, list_distance(e.emb, c.cvec))::varchar AS pred
        |FROM e CROSS JOIN cent c GROUP BY e.vec_id""".stripMargin),
    // third misc pack: url_encode/decode, big-endian + base64url
    // varbinary helpers, is_json_scalar, trim_array, beta CDFs (checked
    // against their closed forms: I_x(1,b) = 1-(1-x)^b, I_x(a,1) = x^a)
    "fn_misc3" -> (
      """SELECT
        |url_encode('a b/c') AS enc,
        |url_decode('a%20b%2Fc') AS dec,
        |from_big_endian_64(to_big_endian_64(123456789L)) AS be64_rt,
        |hex(to_big_endian_64(1L)) AS be64_hex,
        |from_big_endian_32(to_big_endian_32(-5)) AS be32_rt,
        |to_base64url(to_utf8('ab?cd~')) AS b64url,
        |cast(from_utf8(from_base64url('YWI_Y2R-')) AS string) AS b64url_rt,
        |is_json_scalar('123') AS js_scalar,
        |is_json_scalar('[1, 2]') AS js_arr,
        |array_join(trim_array(array('a', 'b', 'c'), 1), ',') AS trimmed,
        |round(beta_cdf(1.0d, 3.0d, 0.25d), 6) AS beta1,
        |round(beta_cdf(2.0d, 1.0d, 0.5d), 6) AS beta2,
        |round(inverse_beta_cdf(1.0d, 3.0d, 0.578125d), 6) AS ibeta""".stripMargin,
      """SELECT
        |'a%20b%2Fc' AS enc, 'a b/c' AS dec,
        |123456789::bigint AS be64_rt,
        |'0000000000000001' AS be64_hex,
        |-5::int AS be32_rt,
        |'YWI_Y2R-' AS b64url, 'ab?cd~' AS b64url_rt,
        |true AS js_scalar, false AS js_arr,
        |'a,b' AS trimmed,
        |round(1 - 0.75 * 0.75 * 0.75, 6)::double AS beta1,
        |0.25::double AS beta2, 0.25::double AS ibeta""".stripMargin),
    // typed edge cases (FIXTURES.md §B: nulls, NaN, empty collections,
    // multibyte unicode, extreme integers, pre-epoch/leap timestamps) —
    // the semantics where engines habitually disagree, pinned to the
    // spellings where they provably agree
    "fn_edge_cases" -> (
      """SELECT
        |cast(NULL AS int) IS NULL AS null_is_null,
        |coalesce(concat('a', cast(NULL AS string)), '<null>') AS concat_null,
        |isnan(cast('NaN' AS double)) AS nan_detected,
        |greatest(cast('NaN' AS double), 1.0d) AS g_nan,
        |size(filter(array(1), x -> false)) AS empty_size,
        |length('héllo wörld') AS ulen,
        |reverse('héllo') AS urev,
        |upper('héllo') AS uupper,
        |9223372036854775807 AS max_long,
        |-7 % 3 AS neg_mod,
        |substring('hello', -3, 2) AS sub_neg,
        |nullif('', '') IS NULL AS empty_nullif,
        |year(TIMESTAMP '1960-05-04 10:00:00') AS pre_epoch_year,
        |unix_timestamp(TIMESTAMP '1960-05-04 10:00:00') AS pre_epoch_secs,
        |date_format(TIMESTAMP '1960-02-29 00:00:00', 'yyyy-MM-dd') AS leap_day,
        |coalesce(cast(try_element_at(map('k', 1), 'missing') AS string), '<null>') AS missing_key""".stripMargin,
      """SELECT
        |cast(NULL AS int) IS NULL AS null_is_null,
        |coalesce('a' || NULL::varchar, '<null>') AS concat_null,
        |isnan('NaN'::double) AS nan_detected,
        |greatest('NaN'::double, 1.0) AS g_nan,
        |len([]::int[]) AS empty_size,
        |length('héllo wörld') AS ulen,
        |reverse('héllo') AS urev,
        |upper('héllo') AS uupper,
        |9223372036854775807 AS max_long,
        |-7 % 3 AS neg_mod,
        |substr('hello', -3, 2) AS sub_neg,
        |nullif('', '') IS NULL AS empty_nullif,
        |year(TIMESTAMP '1960-05-04 10:00:00') AS pre_epoch_year,
        |epoch(TIMESTAMP '1960-05-04 10:00:00')::bigint AS pre_epoch_secs,
        |strftime(TIMESTAMP '1960-02-29 00:00:00', '%Y-%m-%d') AS leap_day,
        |'<null>' AS missing_key""".stripMargin),
    // bounded top-n aggregates — reference min(x, n)/max(x, n) overloads
    // (MinMaxNAggregations); ties make the int-rendered result exact
    "agg_min_max_n" -> (
      """SELECT l_returnflag,
        |array_join(transform(min_n(l_quantity, 5), x -> cast(cast(x AS int) AS string)), ',') AS min5,
        |array_join(transform(max_n(l_quantity, 5), x -> cast(cast(x AS int) AS string)), ',') AS max5
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |array_to_string(list_transform((list_sort(list(l_quantity)))[1:5], x -> (x::int)::varchar), ',') AS min5,
        |array_to_string(list_transform((list_reverse_sort(list(l_quantity)))[1:5], x -> (x::int)::varchar), ',') AS max5
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    // aggregate-name aliases: approx_distinct (exact at this cardinality),
    // arbitrary (constant within group), bitwise_and/or_agg, map_union
    "agg_trino_extras" -> (
      """SELECT n_regionkey, nd, arb, band, bor,
        |element_at(mu, first_name) AS mu_first FROM (
        |  SELECT n_regionkey,
        |    approx_distinct(n_name) AS nd,
        |    arbitrary(n_regionkey + 100) AS arb,
        |    bitwise_and_agg(n_nationkey) AS band,
        |    bitwise_or_agg(n_nationkey) AS bor,
        |    map_union(map(n_name, cast(n_nationkey AS string))) AS mu,
        |    min(n_name) AS first_name
        |  FROM nation GROUP BY n_regionkey)""".stripMargin,
      """SELECT n_regionkey, count(DISTINCT n_name) AS nd,
        |min(n_regionkey + 100) AS arb,
        |bit_and(n_nationkey) AS band, bit_or(n_nationkey) AS bor,
        |arg_min(n_nationkey, n_name)::varchar AS mu_first
        |FROM nation GROUP BY n_regionkey""".stripMargin),
    "fn_stats_cdf" -> (
      """SELECT round(normal_cdf(0.0, 1.0, 1.96), 6) AS p_gauss,
        |round(inverse_normal_cdf(0.0, 1.0, 0.975), 4) AS z_975,
        |round(wilson_interval_lower(80, 100, 1.96), 6) AS wil_lo,
        |round(wilson_interval_upper(80, 100, 1.96), 6) AS wil_hi,
        |luhn_check('79927398713') AS luhn_ok,
        |luhn_check('79927398710') AS luhn_bad,
        |to_base(255, 16) AS ff, from_base('ff', 16) AS n255""".stripMargin,
      """SELECT 0.975002::double AS p_gauss, 1.96::double AS z_975,
        |0.711169::double AS wil_lo, 0.866634::double AS wil_hi,
        |true AS luhn_ok, false AS luhn_bad,
        |'ff' AS ff, 255::bigint AS n255""".stripMargin),
    // r15 scalar tail (closing the r14 verdict's reference-name diff):
    // parse_datetime (Joda parse), regexp_split, regexp_position
    // (2/3/4-arity, codepoint-based), infinity/is_finite/is_infinite,
    // and the reference's own sparse-map cosine_similarity signature —
    // all data-dependent over part/orders rows. regexp_position's oracle
    // is stated via split_part arithmetic (p_name is words joined by
    // single spaces, so the n-th space position is closed-form).
    "fn_scalar_tail" -> (
      """SELECT p.p_partkey,
        |cast(parse_datetime(cast(cast(o.o_orderdate AS date) AS string), 'yyyy-MM-dd') AS string) AS parsed_day,
        |cast(parse_datetime(concat(cast(cast(o.o_orderdate AS date) AS string), ' 07:08:09 +02:00'),
        |  'yyyy-MM-dd HH:mm:ss ZZ') AS string) AS parsed_offset,
        |array_join(regexp_split(p.p_name, '\\s+'), '|') AS name_tokens,
        |regexp_position(p.p_name, '\\s') AS sp1,
        |regexp_position(p.p_name, '[a-z]+', 1, 2) AS word2_at,
        |regexp_position(p.p_name, '[0-9]') AS no_digit,
        |is_finite(cast(p.p_retailprice AS double)) AS fin,
        |is_infinite(infinity() + cast(p.p_partkey AS double)) AS inf_shift,
        |is_finite(infinity() - infinity()) AS nan_fin,
        |round(cosine_similarity(
        |  map('len', cast(length(p.p_name) AS double), 'key', 1.0d),
        |  map('len', 1.0d, 'other', 2.0d)), 6) AS cos_sparse
        |FROM part p JOIN orders o ON o.o_orderkey = p.p_partkey
        |WHERE p.p_partkey <= 200""".stripMargin,
      """SELECT p.p_partkey,
        |strftime(o.o_orderdate::timestamp, '%Y-%m-%d %H:%M:%S') AS parsed_day,
        |strftime(o.o_orderdate::timestamp + INTERVAL 5 HOURS + INTERVAL 8 MINUTES
        |  + INTERVAL 9 SECONDS, '%Y-%m-%d %H:%M:%S') AS parsed_offset,
        |array_to_string(string_split_regex(p.p_name, '\s+'), '|') AS name_tokens,
        |(length(split_part(p.p_name, ' ', 1)) + 1)::int AS sp1,
        |(length(split_part(p.p_name, ' ', 1)) + 2)::int AS word2_at,
        |-1::int AS no_digit,
        |true AS fin, true AS inf_shift, false AS nan_fin,
        |round(length(p.p_name) / (sqrt(length(p.p_name)::double * length(p.p_name) + 1.0)
        |  * sqrt(5.0)), 6) AS cos_sparse
        |FROM part p JOIN orders o ON o.o_orderkey = p.p_partkey
        |WHERE p.p_partkey <= 200""".stripMargin),
    // r15 hash tail: murmur3 + SpookyHash V2 — parity pinned by the
    // reference's own vectors (TestVarbinaryFunctions.java:327-344,
    // stated as oracle literals), plus a data-dependent injectivity
    // check over customer names (distinct-hash count = distinct-name
    // count, which DuckDB can state without the hash)
    "fn_hash_tail" -> (
      """SELECT
        |hex(murmur3(to_utf8('hashme'))) AS m_hashme,
        |hex(murmur3(to_utf8(''))) AS m_empty,
        |hex(spooky_hash_v2_32(to_utf8('hello'))) AS s32_hello,
        |hex(spooky_hash_v2_64(to_utf8('hello'))) AS s64_hello,
        |hex(spooky_hash_v2_64(to_utf8(''))) AS s64_empty,
        |(SELECT count(DISTINCT hex(murmur3(to_utf8(c_name)))) FROM customer) AS m_distinct,
        |(SELECT count(DISTINCT hex(spooky_hash_v2_64(to_utf8(c_name)))) FROM customer) AS s_distinct
        |""".stripMargin,
      """SELECT
        |'93192FE805BE23041C8318F67EC4F2BC' AS m_hashme,
        |'00000000000000000000000000000000' AS m_empty,
        |'D382E6CA' AS s32_hello,
        |'3768826AD382E6CA' AS s64_hello,
        |'232706FC6BF50919' AS s64_empty,
        |(SELECT count(DISTINCT c_name) FROM customer) AS m_distinct,
        |(SELECT count(DISTINCT c_name) FROM customer) AS s_distinct""".stripMargin))

  val queries: Map[String, Q] = defs.map { case (k, (sparkSql, _)) => k -> q(sparkSql) }
  val oracles: Map[String, String] = defs.map { case (k, (_, duck)) => k -> duck }
}
