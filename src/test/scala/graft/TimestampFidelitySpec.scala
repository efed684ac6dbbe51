package graft

/** Unit corners for the picosecond / zone-name timestamp emulations
  * (graft.functions.TimestampFidelity). The fn_timestamp_pico and
  * fn_timestamptz_zone driver rows sweep 25 deterministic values against
  * DuckDB; this spec pins the carry/rounding/DST edges directly.
  */
class TimestampFidelitySpec extends GraftSuite {

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)

  test("pico parse/format round-trips and pads to 12 fraction digits") {
    assert(one("tspico_format(tspico_parse('2024-02-29 23:59:59.123456789012'))")
      == "2024-02-29 23:59:59.123456789012")
    assert(one("tspico_format(tspico_parse('2024-01-01 00:00:00.5'))")
      == "2024-01-01 00:00:00.500000000000")
    assert(one("tspico_format(tspico_parse('2024-01-01 00:00:00'))")
      == "2024-01-01 00:00:00.000000000000")
  }

  test("pico addition carries through micros, seconds, and the date") {
    assert(one("tspico_format(tspico_add_picos(tspico_parse('2024-12-31 23:59:59.999999999999'), 1))")
      == "2025-01-01 00:00:00.000000000000")
    assert(one("tspico_format(tspico_add_picos(tspico_parse('2024-01-01 00:00:00.000000000000'), -1))")
      == "2023-12-31 23:59:59.999999999999")
  }

  test("pico rounding is half-up at every precision, with carry") {
    assert(one("tspico_format(tspico_round(tspico_parse('2024-01-01 00:00:00.123456789012'), 9))")
      == "2024-01-01 00:00:00.123456789000")
    assert(one("tspico_format(tspico_round(tspico_parse('2024-01-01 00:00:00.123456500000'), 6))")
      == "2024-01-01 00:00:00.123457000000")
    assert(one("tspico_format(tspico_round(tspico_parse('2024-01-01 00:00:00.999999999999'), 3))")
      == "2024-01-01 00:00:01.000000000000")
    assert(one("tspico_eq(tspico_round(tspico_parse('2024-01-01 00:00:00.123456789012'), 12), " +
      "tspico_parse('2024-01-01 00:00:00.123456789012'))") == true)
  }

  test("pico comparison is lexicographic on (us, ps)") {
    assert(one("tspico_lt(tspico_parse('2024-01-01 00:00:00.000000000001'), " +
      "tspico_parse('2024-01-01 00:00:00.000000000002'))") == true)
    assert(one("tspico_lt(tspico_parse('2024-01-01 00:00:00.000001000000'), " +
      "tspico_parse('2024-01-01 00:00:00.000000999999'))") == false)
  }

  test("zone name survives AT TIME ZONE and DST rules apply per date") {
    // 12:00 UTC: New York is UTC-4 in July (EDT), UTC-5 in January (EST)
    assert(one("tsz_format(tsz_at_zone(tsz_parse('2024-07-01 12:00:00.000000 UTC'), 'America/New_York'))")
      == "2024-07-01 08:00:00.000000 America/New_York")
    assert(one("tsz_format(tsz_at_zone(tsz_parse('2024-01-15 12:00:00.000000 UTC'), 'America/New_York'))")
      == "2024-01-15 07:00:00.000000 America/New_York")
    // the zone NAME (not an offset) travels; round-trip restores the value
    assert(one("tsz_at_zone(tsz_parse('2024-07-01 12:00:00.000000 UTC'), 'Asia/Kolkata').zone")
      == "Asia/Kolkata")
    assert(one("tsz_format(tsz_at_zone(tsz_at_zone(" +
      "tsz_parse('2024-03-09 18:30:00.000000 America/New_York'), 'Asia/Tokyo'), 'America/New_York'))")
      == "2024-03-09 18:30:00.000000 America/New_York")
  }

  test("zoned parse interprets the wall clock in the named zone") {
    // 18:30 IST = 13:00 UTC (fixed +05:30, no DST); 2024-07-01T13:00Z
    // = 1719792000 + 13*3600 seconds
    assert(one("tsz_utc_us(tsz_parse('2024-07-01 18:30:00.000000 Asia/Kolkata'))")
      == 1719838800000000L)
    assert(one("tsz_eq(tsz_parse('2024-07-01 18:30:00.000000 Asia/Kolkata'), " +
      "tsz_parse('2024-07-01 13:00:00.000000 UTC'))") == true)
    assert(one("tsz_hour(tsz_parse('2024-07-01 18:30:00.000000 Asia/Kolkata'))") == 18L)
  }

  test("pico+zone pack: parse/format round-trip, zone travel, ps ordering (r12)") {
    // wall clock is LOCAL in the named zone; canonical 12-digit fraction
    assert(one("tspz_format(tspz_parse('2024-07-01 12:00:00.123456789012 America/New_York'))")
      == "2024-07-01 12:00:00.123456789012 America/New_York")
    // fraction pads right; bare seconds parse too
    assert(one("tspz_format(tspz_parse('2024-01-01 00:00:00.5 UTC'))")
      == "2024-01-01 00:00:00.500000000000 UTC")
    // AT TIME ZONE keeps the instant AND the picos, moves the name (NY
    // July = UTC-4, so 12:00 NY is 16:00 UTC)
    assert(one("tspz_format(tspz_at_zone(tspz_parse('2024-07-01 12:00:00.000000000007 America/New_York'), 'UTC'))")
      == "2024-07-01 16:00:00.000000000007 UTC")
    // ordering is lexicographic on (us, ps): equal micros, picos decide
    assert(one("tspz_lt(tspz_parse('2024-07-01 12:00:00.123456000001 UTC'), " +
      "tspz_parse('2024-07-01 12:00:00.123456000002 UTC'))") == true)
    assert(one("tspz_eq(tspz_parse('2024-07-01 12:00:00.000000000001 UTC'), " +
      "tspz_parse('2024-07-01 08:00:00.000000000001 America/New_York'))") == true)
    assert(one("tspz_picos(tspz_parse('2024-07-01 12:00:00.000000999999 UTC'))") == 999999L)
  }
}
