package graft

/** Seeded randomized round-trip/ordering/arithmetic sweep for the
  * emulated time packs (timetz, plain TIME, tspico, tsz), against
  * Scala/java.time models: canonical format∘parse idempotence with
  * fraction trimming and offset-minute dropping, UTC normalization and
  * cross-offset ordering for timetz, pico carry arithmetic and half-up
  * rounding at every precision for tspico, and zone round-trips away
  * from DST transitions for tsz (the transition corners have their own
  * targeted spec rows). All N cases per pack run as ONE batched query.
  */
class TimePackPropertySpec extends GraftSuite {

  private val rnd = new scala.util.Random(60601L)
  private val N = 80

  private def fmtHms(us: Long): String = {
    val s = us / 1000000L
    f"${s / 3600}%02d:${(s / 60) % 60}%02d:${s % 60}%02d"
  }
  private def frac6(us: Long): String = f".${us % 1000000L}%06d"
  private def trimFrac(s: String): String = {
    if (!s.contains('.')) s
    else {
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.endsWith(".")) t.dropRight(1) else t
    }
  }
  private def fmtOff(off: Int): String = {
    val sign = if (off < 0) "-" else "+"
    val a = math.abs(off)
    f"$sign${a / 60}%02d" + (if (a % 60 == 0) "" else f":${a % 60}%02d")
  }

  test("plain TIME: parse/format/extract round-trips on random micros-of-day") {
    import spark.implicits._
    val cases = (0 until N).map(_ => math.abs(rnd.nextLong()) % 86400000000L)
    val df = cases.map(us => (us, fmtHms(us) + frac6(us))).toDF("us", "s")
    df.createOrReplaceTempView("tpp_time")
    val got = spark.sql(
      """SELECT us, time_parse(s) AS p, time_format(time_parse(s)) AS f,
        |  time_hour(time_parse(s)) AS h, time_minute(time_parse(s)) AS m,
        |  time_second(time_parse(s)) AS sec
        |FROM tpp_time""".stripMargin).collect()
    got.foreach { r =>
      val us = r.getLong(0)
      assert(r.getLong(1) === us, s"parse at $us")
      assert(r.getString(2) === trimFrac(fmtHms(us) + frac6(us)), s"format at $us")
      assert(r.getLong(3) === us / 3600000000L && r.getLong(4) === (us / 60000000L) % 60 &&
        r.getLong(5) === (us / 1000000L) % 60, s"extract at $us")
    }
  }

  test("timetz: UTC normalization, cross-offset ordering, canonical format") {
    import spark.implicits._
    val cases = (0 until N).map { _ =>
      (math.abs(rnd.nextLong()) % 86400000000L, rnd.nextInt(1681) - 840,
        math.abs(rnd.nextLong()) % 86400000000L, rnd.nextInt(1681) - 840)
    }
    cases.map { case (u1, o1, u2, o2) =>
      (u1, o1, u2, o2,
        fmtHms(u1) + frac6(u1) + fmtOff(o1), fmtHms(u2) + frac6(u2) + fmtOff(o2))
    }.toDF("u1", "o1", "u2", "o2", "s1", "s2").createOrReplaceTempView("tpp_tz")
    val got = spark.sql(
      """SELECT u1, o1, u2, o2,
        |  timetz_to_utc_us(timetz_parse(s1)) AS utc1,
        |  timetz_format(timetz_parse(s1)) AS f1,
        |  timetz_lt(timetz_parse(s1), timetz_parse(s2)) AS lt,
        |  timetz_eq(timetz_parse(s1), timetz_parse(s2)) AS eq
        |FROM tpp_tz""".stripMargin).collect()
    def utc(us: Long, off: Int): Long =
      Math.floorMod(us - off * 60000000L, 86400000000L)
    got.foreach { r =>
      val (u1, o1, u2, o2) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))
      assert(r.getLong(4) === utc(u1, o1), s"utc at $u1/$o1")
      assert(r.getString(5) === trimFrac(fmtHms(u1) + frac6(u1)) + fmtOff(o1),
        s"format at $u1/$o1")
      assert(r.getBoolean(6) === (utc(u1, o1) < utc(u2, o2)), s"lt at $u1/$o1 vs $u2/$o2")
      assert(r.getBoolean(7) === (utc(u1, o1) == utc(u2, o2)), s"eq")
    }
  }

  test("tspico: ordering, signed pico-carry addition, half-up rounding at every precision") {
    import spark.implicits._
    val cases = (0 until N).map { _ =>
      (rnd.nextLong() % 100000000000000L, rnd.nextInt(1000000),
        rnd.nextLong() % 100000000000000L, rnd.nextInt(1000000),
        rnd.nextLong() % 5000000000000L, rnd.nextInt(13))
    }
    cases.toDF("u1", "p1", "u2", "p2", "d", "prec").createOrReplaceTempView("tpp_pico")
    val got = spark.sql(
      """SELECT u1, p1, u2, p2, d, prec,
        |  tspico_lt(tspico(u1, p1), tspico(u2, p2)) AS lt,
        |  tspico_eq(tspico(u1, p1), tspico(u2, p2)) AS eq,
        |  tspico_add_picos(tspico(u1, p1), d).us AS au,
        |  tspico_add_picos(tspico(u1, p1), d).ps AS ap,
        |  tspico_round(tspico(u1, p1), prec).us AS ru,
        |  tspico_round(tspico(u1, p1), prec).ps AS rp
        |FROM tpp_pico""".stripMargin).collect()
    got.foreach { r =>
      val (u1, p1, u2, p2) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))
      val d = r.getLong(4); val prec = r.getInt(5)
      assert(r.getBoolean(6) === (u1 < u2 || (u1 == u2 && p1 < p2)), "lt")
      assert(r.getBoolean(7) === (u1 == u2 && p1 == p2), "eq")
      val total = p1.toLong + d
      assert(r.getLong(8) === u1 + Math.floorDiv(total, 1000000L) &&
        r.getInt(9).toLong === Math.floorMod(total, 1000000L), s"add at $u1/$p1 + $d")
      // half-up rounding of the 12-digit fraction, carry into micros
      val f = Math.floorMod(u1, 1000000L) * 1000000L + p1
      val step = math.pow(10, 12 - prec).toLong
      val rr = ((f + step / 2) / step) * step
      val eu = u1 - Math.floorMod(u1, 1000000L) + rr / 1000000L
      val ep = rr % 1000000L
      assert(r.getLong(10) === eu && r.getInt(11).toLong === ep,
        s"round at $u1/$p1 prec $prec: got ${r.getLong(10)}/${r.getInt(11)} exp $eu/$ep")
    }
  }

  test("tsz: zone round-trips hold away from DST transitions") {
    import spark.implicits._
    val zones = Seq("UTC", "Europe/Paris", "America/New_York", "Asia/Kolkata")
    // random instants inside Jan and Jul 2021 (no transitions in these
    // zones in those months)
    val jan = java.time.Instant.parse("2021-01-02T00:00:00Z").toEpochMilli * 1000L
    val jul = java.time.Instant.parse("2021-07-02T00:00:00Z").toEpochMilli * 1000L
    val span = 25L * 86400000000L
    val cases = (0 until N).map { _ =>
      val base = if (rnd.nextBoolean()) jan else jul
      (base + math.abs(rnd.nextLong()) % span, zones(rnd.nextInt(zones.length)))
    }
    cases.toDF("us", "zone").createOrReplaceTempView("tpp_tsz")
    val got = spark.sql(
      """SELECT us, zone,
        |  tsz_format(tsz(us, zone)) AS f1,
        |  tsz_format(tsz_parse(tsz_format(tsz(us, zone)))) AS f2,
        |  tsz_utc_us(tsz_parse(tsz_format(tsz(us, zone)))) AS rt
        |FROM tpp_tsz""".stripMargin).collect()
    got.foreach { r =>
      assert(r.getString(2) === r.getString(3),
        s"format idempotence at ${r.getLong(0)} ${r.getString(1)}")
      assert(r.getLong(4) === r.getLong(0),
        s"instant round-trip at ${r.getLong(0)} ${r.getString(1)}")
    }
  }
}
