package graft

/** Core-scalar completion pack (functions.TrinoCompat2): the members the
  * driver query can't pin (session-zone views, intervals, error raise,
  * qdigest plural reads) plus reference example values.
  */
class TrinoCompat2Spec extends GraftSuite {

  private def one(q: String) = spark.sql(s"SELECT $q AS v").collect()(0)

  test("timezone family evaluates against the session zone (UTC here)") {
    assert(one("current_timezone()").getString(0) == "UTC" ||
      one("current_timezone()").getString(0) == "Etc/UTC")
    assert(one("timezone_hour(TIMESTAMP '2024-06-01 12:00:00')").getInt(0) === 0)
    assert(one("timezone_minute(TIMESTAMP '2024-06-01 12:00:00')").getInt(0) === 0)
    // at_timezone: instant viewed through an explicit zone (wall clock)
    assert(one("cast(at_timezone(TIMESTAMP '2024-01-01 12:00:00', 'America/New_York') AS string)")
      .getString(0) === "2024-01-01 07:00:00")
    // with_timezone: wall clock bound to a zone, read back as an instant
    assert(one("cast(with_timezone(TIMESTAMP_NTZ '2024-01-01 07:00:00', 'America/New_York') AS string)")
      .getString(0) === "2024-01-01 12:00:00")
  }

  test("nanos timestamps, unix time, interval milliseconds") {
    assert(one("cast(from_iso8601_timestamp_nanos('2024-01-01T00:00:00.123456789Z') AS string)")
      .getString(0) === "2024-01-01 00:00:00.123456") // sub-micro truncates
    assert(one("to_unixtime(TIMESTAMP '1970-01-01 00:00:01.5')").getDouble(0) === 1.5)
    assert(one("to_milliseconds(INTERVAL '2' SECOND)").getLong(0) === 2000L)
    assert(one("to_milliseconds(INTERVAL '1 02:00:00' DAY TO SECOND)").getLong(0) ===
      (24 + 2) * 3600 * 1000L)
  }

  test("fail raises, current_groups is empty, multimap groups in order") {
    val e = intercept[Exception](spark.sql("SELECT fail('boom')").collect())
    assert(e.getMessage.contains("boom") || e.getCause.getMessage.contains("boom"))
    assert(one("current_groups()").getSeq[String](0) === Seq.empty)
    val r = spark.sql(
      """SELECT multimap_from_entries(
        |  array(struct('a', '1'), struct('b', '2'), struct('a', '3'))) AS m""".stripMargin)
      .collect()(0).getMap[String, Seq[String]](0)
    assert(r("a") === Seq("1", "3") && r("b") === Seq("2"))
  }

  test("values_at_quantiles reads the qdigest at several ranks at once") {
    val row = spark.sql(
      """SELECT values_at_quantiles(qdigest_agg(c), array(0.1d, 0.5d, 0.9d)) AS vs
        |FROM (SELECT id AS c FROM range(1, 1001))""".stripMargin).collect()(0)
    val vs = row.getSeq[Double](0)
    assert(vs.length === 3)
    // q-digest guarantees rank error <= eps*n (eps = 0.01 -> 10 ranks)
    assert(math.abs(vs(0) - 100) <= 15 && math.abs(vs(1) - 500) <= 15 &&
      math.abs(vs(2) - 900) <= 15)
    assert(vs(0) < vs(1) && vs(1) < vs(2))
  }

  test("features builds the trino-ml index->double vector at any arity") {
    val m2 = one("features(1, 2.5)").getMap[Int, Double](0)
    assert(m2 === Map(0 -> 1.0, 1 -> 2.5))
    val m4 = one("features(0.1, 0.2, 0.3, 0.4)").getMap[Int, Double](0)
    assert(m4.keySet === Set(0, 1, 2, 3) && m4(3) === 0.4)
  }

  test("ISO week-year and day-of-week reference values") {
    // 2021-01-01 is a Friday in ISO week 53 of week-year 2020
    assert(one("year_of_week(DATE '2021-01-01')").getInt(0) === 2020)
    assert(one("day_of_week(DATE '2021-01-01')").getInt(0) === 5)
    assert(one("day_of_week(DATE '2024-03-03')").getInt(0) === 7) // Sunday
  }
}
