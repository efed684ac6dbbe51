package graft

import org.apache.spark.sql.Row

/** Unit specs for the Trino-compat function pack (reference analog:
  * per-function operator tests under
  * `core/trino-main/src/test/java/io/trino/operator/scalar/`).
  */
class FunctionsSpec extends GraftSuite {

  private def one(sql: String): Row = spark.sql(sql).collect().head

  test("cosine_similarity UDF: identical, orthogonal, null") {
    val r = one(
      """SELECT
        |cosine_similarity(array(1d, 2d, 3d), array(1d, 2d, 3d)) AS same,
        |cosine_similarity(array(1d, 0d), array(0d, 1d)) AS ortho,
        |cosine_similarity(cast(null AS array<double>), array(1d)) AS n""".stripMargin)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(r.isNullAt(2))
  }

  test("native cosine expression matches UDF and handles mismatched lengths") {
    val r = one(
      """SELECT
        |cosine_sim_native(array(float(1), float(2)), array(float(2), float(4))) AS collinear,
        |cosine_sim_native(array(float(1)), array(float(1), float(2))) AS mismatch""".stripMargin)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(r.isNullAt(1))
  }

  test("simhash64 is deterministic and near-identical for similar token sets") {
    val r = one(
      """SELECT
        |simhash64(array('a', 'b', 'c', 'd', 'e', 'f')) AS h1,
        |simhash64(array('a', 'b', 'c', 'd', 'e', 'f')) AS h1b,
        |simhash64(array('a', 'b', 'c', 'd', 'e', 'zz')) AS h2,
        |simhash64(array('q', 'w', 'x', 'y', 'z', 'v')) AS far""".stripMargin)
    assert(r.getLong(0) == r.getLong(1))
    val near = java.lang.Long.bitCount(r.getLong(0) ^ r.getLong(2))
    val far = java.lang.Long.bitCount(r.getLong(0) ^ r.getLong(3))
    assert(near < far, s"near=$near should be < far=$far")
  }

  test("minhash: k values, deterministic, monotone under set overlap") {
    val r = one(
      """SELECT
        |minhash(array(1L, 2L, 3L, 4L, 5L), 8) AS a,
        |minhash(array(1L, 2L, 3L, 4L, 5L), 8) AS a2,
        |minhash(array(1L, 2L, 3L, 4L, 6L), 8) AS near,
        |minhash(array(9L, 10L, 11L, 12L, 13L), 8) AS far""".stripMargin)
    val a = r.getSeq[Long](0); val a2 = r.getSeq[Long](1)
    val near = r.getSeq[Long](2); val far = r.getSeq[Long](3)
    assert(a.length == 8 && a == a2)
    val nearMatch = a.zip(near).count { case (x, y) => x == y }
    val farMatch = a.zip(far).count { case (x, y) => x == y }
    assert(nearMatch > farMatch, s"near=$nearMatch far=$farMatch")
  }

  test("simhash64_native is bit-identical to the split+UDF path") {
    val r = one(
      """SELECT
        |simhash64_native('the quick brown fox') AS n1,
        |simhash64(split('the quick brown fox', ' ')) AS u1,
        |simhash64_native('héllo wörld ünïcode') AS n2,
        |simhash64(split('héllo wörld ünïcode', ' ')) AS u2,
        |simhash64_native('') AS n3,
        |simhash64(split('', ' ')) AS u3""".stripMargin)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(2) == r.getLong(3))
    assert(r.getLong(4) == r.getLong(5))
  }

  test("url family parses every component") {
    val r = one(
      """SELECT url_extract_protocol(u) p, url_extract_host(u) h,
        |url_extract_port(u) pt, url_extract_path(u) pa,
        |url_extract_parameter(u, 'x') x
        |FROM (SELECT 'http://h.example:81/a/b?x=1&y=2#z' AS u)""".stripMargin)
    assert(r.getString(0) == "http" && r.getString(1) == "h.example")
    assert(r.getLong(2) == 81 && r.getString(3) == "/a/b" && r.getString(4) == "1")
  }

  test("luhn_check validates known card checksums") {
    val r = one("SELECT luhn_check('4532015112830366') ok, luhn_check('4532015112830367') bad")
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("normal_cdf / inverse round-trip within approximation error") {
    val r = one(
      """SELECT normal_cdf(0d, 1d, 1.6448536d) p95,
        |inverse_normal_cdf(0d, 1d, 0.95d) z95""".stripMargin)
    assert(math.abs(r.getDouble(0) - 0.95) < 1e-4)
    assert(math.abs(r.getDouble(1) - 1.6448536) < 1e-4)
  }

  test("hll sketch cardinality within 5% on 10k distinct values") {
    val r = one(
      """SELECT hll_cardinality(approx_set_agg(cast(id AS string))) AS est
        |FROM range(10000)""".stripMargin)
    val est = r.getLong(0)
    assert(math.abs(est - 10000) < 500, s"est=$est")
  }

  test("hll merge of disjoint sketches approximates union") {
    val r = one(
      """SELECT hll_cardinality(merge_hll(s)) AS est FROM (
        |  SELECT approx_set_agg(cast(id AS string)) AS s FROM range(0, 5000)
        |  UNION ALL
        |  SELECT approx_set_agg(cast(id AS string)) FROM range(5000, 10000))""".stripMargin)
    assert(math.abs(r.getLong(0) - 10000) < 500)
  }

  test("typed-long hll path matches string path within 5% on 10k distinct") {
    val r = one(
      """SELECT hll_cardinality(approx_set_agg_long(id)) AS est FROM range(10000)""")
    val est = r.getLong(0)
    assert(math.abs(est - 10000) < 500, s"est=$est")
  }

  test("approx_most_frequent honors the per-call k parameter") {
    // 10 distinct keys, k=4 buckets: result is capped at 4 entries and the
    // heavy key (id % 10 = 0 boosted via skew) survives
    val rows = spark.sql(
      """SELECT t.item, t.cnt FROM (
        |  SELECT approx_most_frequent(cast(CASE WHEN id % 2 = 0 THEN 0 ELSE id % 10 END AS string), 4) AS m
        |  FROM range(1000)
        |) LATERAL VIEW explode(m) t AS item, cnt""".stripMargin).collect()
    assert(rows.length <= 4)
    val top = rows.maxBy(_.getLong(1))
    assert(top.getString(0) == "0", s"expected heavy key 0, got ${top.getString(0)}")
  }

  test("approx_top_k is exact when capacity exceeds distinct count") {
    val rows = spark.sql(
      """SELECT t.item, t.cnt FROM (
        |  SELECT approx_top_k(cast(id % 3 AS string)) AS m FROM range(9)
        |) LATERAL VIEW explode(m) t AS item, cnt""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("0" -> 3L, "1" -> 3L, "2" -> 3L))
  }

  test("learn_linear_regressor recovers exact synthetic weights") {
    // y = 2*x1 - 3*x2 + 7, no noise → solution is exact up to fp
    val r = spark.sql(
      """SELECT learn_linear_regressor(array(x1, x2), 2*x1 - 3*x2 + 7) AS m
        |FROM (SELECT cast(id % 13 AS double) AS x1,
        |             cast((id * 7) % 11 AS double) AS x2
        |      FROM range(0, 500))""".stripMargin).collect().head
    val w = r.getSeq[Double](0)
    assert(math.abs(w(0) - 2.0) < 1e-8 && math.abs(w(1) + 3.0) < 1e-8 &&
      math.abs(w(2) - 7.0) < 1e-8, w)
  }

  test("word_stem strips common suffixes") {
    val r = one("SELECT word_stem('running') a, word_stem('tables') b, word_stem('cat') c")
    assert(r.getString(0) == "runn" && r.getString(1) == "table" && r.getString(2) == "cat")
  }

  test("hamming_distance on equal-length strings; error on mismatch") {
    val r = one("SELECT hamming_distance('karolin', 'kathrin') d")
    assert(r.getLong(0) == 3L)
  }

  test("PII patterns redact synthetic email/ip/phone and leave clean text alone") {
    import graft.queries.PipelineQueries.PiiPatterns._
    import org.apache.spark.sql.functions.{col, regexp_replace}
    import spark.implicits._
    // the spec drives the SAME patterns the query uses, via the same
    // Column API (the fixture has no PII, so the oracle row only pins
    // the no-op path)
    val dirty = "mail bob.smith+x@corp.example.org from 10.0.255.3 or call 415-555-0199 now"
    val clean = "no personal data here, just 3 numbers: 1 2 42"
    val out = Seq(dirty, clean).toDF("text")
      .select(regexp_replace(regexp_replace(regexp_replace(col("text"),
        email, "<EMAIL>"), ipv4, "<IP>"), phone, "<PHONE>").as("red"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail <EMAIL> from <IP> or call <PHONE> now", out(0))
    assert(out(0) == dirty.replaceAll(email, "<EMAIL>")
      .replaceAll(ipv4, "<IP>").replaceAll(phone, "<PHONE>"))
    assert(out(1) == clean, out(1))
  }

  test("sorted_dot: sorted-merge sparse dot matches map-based reference (100 random cases)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 100) {
      def vec(): Map[Long, Double] =
        List.fill(rnd.nextInt(12))(
          rnd.nextInt(20).toLong -> (rnd.nextDouble() * 4 - 2)).toMap
      val (a, b) = (vec(), vec())
      val expected = a.keySet.intersect(b.keySet).toSeq.map(k => a(k) * b(k)).sum
      def lits(v: Map[Long, Double]): (String, String) = {
        val sorted = v.toSeq.sortBy(_._1)
        if (sorted.isEmpty)
          ("cast(array() as array<bigint>)", "cast(array() as array<double>)")
        else
          (sorted.map(_._1 + "L").mkString("array(", ",", ")"),
            sorted.map(x => s"cast(${x._2} as double)").mkString("array(", ",", ")"))
      }
      val (ka, wa) = lits(a); val (kb, wb) = lits(b)
      val got = one(s"SELECT sorted_dot($ka, $wa, $kb, $wb) d").getDouble(0)
      assert(math.abs(got - expected) < 1e-9, s"a=$a b=$b got=$got want=$expected")
    }
  }

  test("r15 scalar tail: murmur3 and spooky hashes match the reference vectors") {
    // vectors from the reference's own TestVarbinaryFunctions.java:327-344
    val r = one(
      """SELECT
        |hex(murmur3(to_utf8(''))) AS m_empty,
        |hex(murmur3(to_utf8('hashme'))) AS m_hashme,
        |hex(spooky_hash_v2_32(to_utf8(''))) AS s32_empty,
        |hex(spooky_hash_v2_32(to_utf8('hello'))) AS s32_hello,
        |hex(spooky_hash_v2_64(to_utf8(''))) AS s64_empty,
        |hex(spooky_hash_v2_64(to_utf8('hello'))) AS s64_hello,
        |murmur3(cast(null AS binary)) AS m_null""".stripMargin)
    assert(r.getString(0) == "00000000000000000000000000000000")
    assert(r.getString(1) == "93192FE805BE23041C8318F67EC4F2BC")
    assert(r.getString(2) == "6BF50919")
    assert(r.getString(3) == "D382E6CA")
    assert(r.getString(4) == "232706FC6BF50919")
    assert(r.getString(5) == "3768826AD382E6CA")
    assert(r.isNullAt(6))
  }

  test("r15 scalar tail: spooky hash exercises every path length class") {
    // short tail (<16), short-mix (16..191 over each mod-32 class), and
    // the long path (>=192, incl. an exact block multiple)
    val lens = Seq(0, 1, 3, 7, 12, 15, 16, 31, 32, 33, 63, 95, 96, 100,
      191, 192, 200, 288, 500)
    val exprs = lens.zipWithIndex.map { case (n, i) =>
      s"hex(spooky_hash_v2_64(to_utf8(repeat('ab', 250)))) AS full_$i, " +
        s"hex(spooky_hash_v2_64(to_utf8(substring(repeat('abcdefgh', 80), 1, $n)))) AS h_$i"
    }
    val row = one("SELECT " + exprs.mkString(", "))
    // determinism + distinctness across length classes (no path collapses)
    val hashes = lens.indices.map(i => row.getString(2 * i + 1))
    assert(hashes.distinct.size == hashes.size)
    // the duplicated full_ column is bit-identical every time
    val fulls = lens.indices.map(i => row.getString(2 * i))
    assert(fulls.distinct.size == 1)
  }

  test("r15 scalar tail: infinity / is_finite / is_infinite") {
    val r = one(
      """SELECT infinity() AS inf, is_finite(1.5d) AS f1,
        |is_finite(infinity()) AS f2, is_finite(nan()) AS f3,
        |is_infinite(-infinity()) AS i1, is_infinite(2.0d) AS i2,
        |is_infinite(nan()) AS i3,
        |is_finite(cast(null AS double)) AS fn""".stripMargin)
    assert(r.getDouble(0).isPosInfinity)
    assert(r.getBoolean(1)); assert(!r.getBoolean(2)); assert(!r.getBoolean(3))
    assert(r.getBoolean(4)); assert(!r.getBoolean(5)); assert(!r.getBoolean(6))
    assert(r.isNullAt(7))
  }

  test("r15 scalar tail: regexp_split and regexp_position semantics") {
    val r = one(
      """SELECT
        |regexp_split('one12two34three', '[0-9]+') AS parts,
        |regexp_split('a,b,,', ',') AS trailing,
        |regexp_position('9102, say good bye', '\\s*[a-z]+\\s*') AS p1,
        |regexp_position('natasha, 9102, miss you', '[a-z]+', 10) AS p2,
        |regexp_position('natasha, 9102, miss you', '[a-z]+', 4, 2) AS p3,
        |regexp_position('no digits here', '[0-9]') AS none,
        |regexp_position('abc', 'b', 99) AS past_end""".stripMargin)
    assert(r.getSeq[String](0) == Seq("one", "two", "three"))
    assert(r.getSeq[String](1) == Seq("a", "b", "", ""))
    // vectors from the reference TestJoniRegexpFunctions semantics
    assert(r.getInt(2) == 6)
    assert(r.getInt(3) == 16)
    assert(r.getInt(4) == 16)
    assert(r.getInt(5) == -1)
    assert(r.getInt(6) == -1)
  }

  test("r15 scalar tail: regexp_position rejects bad start/occurrence loudly") {
    intercept[Exception](one("SELECT regexp_position('abc', 'b', 0)"))
    intercept[Exception](one("SELECT regexp_position('abc', 'b', 1, 0)"))
  }

  test("r15 scalar tail: parse_datetime Joda patterns") {
    val r = one(
      """SELECT
        |cast(parse_datetime('2024-03-05 07:08:09', 'yyyy-MM-dd HH:mm:ss') AS string) AS plain,
        |cast(parse_datetime('1960/01/22 03:04', 'yyyy/MM/dd HH:mm') AS string) AS pre_epoch,
        |cast(parse_datetime('2020-02-29T10:15:30.123', "yyyy-MM-dd'T'HH:mm:ss.SSS") AS string) AS millis,
        |cast(parse_datetime('2024-03-05 07:08:09 +02:00', 'yyyy-MM-dd HH:mm:ss ZZ') AS string) AS offset,
        |parse_datetime(NULL, 'yyyy') AS n""".stripMargin)
    // session zone is UTC, so the rendered wall clock IS the instant
    assert(r.getString(0) == "2024-03-05 07:08:09")
    assert(r.getString(1) == "1960-01-22 03:04:00")
    assert(r.getString(2) == "2020-02-29 10:15:30.123")
    assert(r.getString(3) == "2024-03-05 05:08:09")
    assert(r.isNullAt(4))
  }

  test("r15 scalar tail: cosine_similarity sparse map overload (reference signature)") {
    val r = one(
      """SELECT
        |cosine_similarity(map('a', 1.0d, 'b', 2.0d), map('a', 3.0d, 'c', 4.0d)) AS partial,
        |cosine_similarity(map('x', 2.0d), map('x', 5.0d)) AS colinear,
        |cosine_similarity(map('a', 1.0d), map('b', 1.0d)) AS disjoint,
        |cosine_similarity(cast(null AS map<string,double>), map('a', 1.0d)) AS n,
        |cosine_similarity(array(1d, 2d), array(2d, 4d)) AS dense_still""".stripMargin)
    assert(math.abs(r.getDouble(0) - 3.0 / (math.sqrt(5.0) * 5.0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2)) < 1e-12)
    assert(r.isNullAt(3))
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }
}
