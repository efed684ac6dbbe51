package graft

/** TIME WITH TIME ZONE emulation unit cases (graft.functions
  * .TimeTzFunctions). The fn_timetz driver row pins the surface against
  * DuckDB's native TIMETZ; this spec covers the corners a 25-row fixture
  * sweep can miss: midnight wrap in both directions, the ±14:00 offset
  * extremes, offset-without-minutes input spelling, unparseable input,
  * and the UTC-instant comparison identities.
  */
class TimeTzSpec extends GraftSuite {

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)

  test("parse/format round-trips the canonical spellings") {
    for (s <- Seq("00:00:00+00", "23:59:59.999999-14", "12:34:56.12-09:45",
        "01:02:03+14", "06:30:00+05:30")) {
      assert(one(s"timetz_format(timetz_parse('$s'))") == s, s)
    }
    // non-canonical inputs normalize: trailing fraction zeros trimmed,
    // zero fraction dropped, zero offset minutes dropped
    assert(one("timetz_format(timetz_parse('01:02:03.000000+02:00'))") == "01:02:03+02")
    assert(one("timetz_format(timetz_parse('01:02:03.100000+02:00'))") == "01:02:03.1+02")
  }

  test("unparseable input yields NULL fields, never a throw (ANSI on)") {
    assert(one("timetz_parse('not a time').us") == null)
    assert(one("timetz_parse('25:0:0+02').us") == null)
  }

  test("UTC normalization wraps across midnight in both directions") {
    // 00:30+02 is 22:30 UTC the previous day
    assert(one("timetz_to_utc_us(timetz_parse('00:30:00+02'))") == 81000000000L)
    // 23:30-02 is 01:30 UTC the next day
    assert(one("timetz_to_utc_us(timetz_parse('23:30:00-02'))") == 5400000000L)
  }

  test("comparison and equality are on the UTC instant (Trino semantics)") {
    assert(one("timetz_eq(timetz_parse('12:00:00+02'), timetz_parse('11:00:00+01'))") == true)
    assert(one("timetz_eq(timetz_parse('12:00:00+02'), timetz_parse('12:00:00+03'))") == false)
    // 12:00+02 = UTC 10:00 < 11:30+01 = UTC 10:30, although local 12:00 > 11:30
    assert(one("timetz_lt(timetz_parse('12:00:00+02'), timetz_parse('11:30:00+01'))") == true)
  }

  test("AT TIME ZONE preserves the instant and relabels the offset") {
    assert(one("timetz_format(timetz_at_offset(timetz_parse('22:19:56.12-09:45'), 330))")
      == "13:34:56.12+05:30")
    assert(one("timetz_eq(timetz_at_offset(timetz_parse('05:00:00-14'), 840), " +
      "timetz_parse('05:00:00-14'))") == true)
    assert(one("timetz_at_offset(timetz_parse('05:00:00-14'), 840).off") == 840)
  }

  test("the surface is builtin-composed: fn_timetz plans with no UDF") {
    val df = SparkEntry.queries("fn_timetz")(spark, sfTiny)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    assert(df.count() == 25)
  }

  test("plain TIME (r11): parse/format/extract over micros-of-day, typed literal") {
    assert(one("time_parse('10:30:00.5')") == 37800500000L)
    assert(one("time_format(time_parse('10:30:00.500000'))") == "10:30:00.5")
    assert(one("time_format(time_parse('23:59:59'))") == "23:59:59")
    assert(one("time_hour(time_parse('10:30:59.999999'))") == 10L)
    assert(one("time_minute(time_parse('10:30:59'))") == 30L)
    assert(one("time_second(time_parse('10:30:59'))") == 59L)
    // typed literal through the Dialect rewrite; bigint ordering is native
    val r = spark.sql(graft.sqlcompat.Dialect.rewrite(
      "SELECT TIME '10:30:00' < TIME '10:30:00.000001' AS lt")).collect().head
    assert(r.getBoolean(0))
  }
}
