package graft

import graft.sqlcompat.Dialect

/** Dialect shim specs: Trino grammar forms Spark's parser rejects. */
class DialectSpec extends GraftSuite {

  test("FETCH FIRST n ROWS WITH TIES rewrites to a rank filter") {
    val out = Dialect.rewrite(
      "SELECT a, b FROM t ORDER BY b DESC FETCH FIRST 3 ROWS WITH TIES")
    assert(out.contains("rank() OVER (ORDER BY b DESC)"))
    assert(out.contains("__graft_rank <= 3"))
  }

  test("FETCH FIRST n ROWS ONLY rewrites to LIMIT") {
    assert(Dialect.rewrite("SELECT a FROM t ORDER BY a FETCH FIRST 7 ROWS ONLY")
      .endsWith("LIMIT 7"))
  }

  test("LISTAGG ON OVERFLOW ERROR strips; TRUNCATE rejects loudly (r14)") {
    // the engine has no output cap, so the ERROR path can never fire —
    // stripping is a documented superset of the reference's 1 MB limit
    val out = Dialect.rewrite(
      "SELECT listagg(x, ',' ON OVERFLOW ERROR) WITHIN GROUP (ORDER BY x) FROM t")
    assert(out == "SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) FROM t")
    val e = intercept[IllegalArgumentException](Dialect.rewrite(
      "SELECT listagg(x, ',' ON OVERFLOW TRUNCATE '...' WITH COUNT) " +
        "WITHIN GROUP (ORDER BY x) FROM t"))
    assert(e.getMessage.contains("TRUNCATE"))
    // inside a string literal the phrase is untouched (masked text)
    val lit = "SELECT 'keep ON OVERFLOW ERROR text' AS s FROM t"
    assert(Dialect.rewrite(lit) == lit)
  }

  test("ARRAY[...] constructors rewrite to array(...), subscripts and types untouched (r14)") {
    assert(Dialect.rewrite("SELECT ARRAY[1, 2, 3] FROM t")
      == "SELECT array(1, 2, 3) FROM t")
    // nested literals and subscripts inside elements compose
    assert(Dialect.rewrite("SELECT ARRAY[ARRAY[a], ARRAY[b[1]]] FROM t")
      == "SELECT array(array(a), array(b[1])) FROM t")
    // a subscript ON the literal keeps Spark's bracket (documented
    // 0-based divergence; element_at is the 1-based spelling)
    assert(Dialect.rewrite("SELECT ARRAY[1,2][1] FROM t")
      == "SELECT array(1,2)[1] FROM t")
    // Spark's ARRAY<INT> cast type and plain identifiers are untouched
    val cast = "SELECT CAST(a AS ARRAY<INT>) FROM t"
    assert(Dialect.rewrite(cast) == cast)
    val lit = "SELECT 'ARRAY[1]' AS s FROM t"
    assert(Dialect.rewrite(lit) == lit)
  }

  test("bare CAST(x AS VARCHAR)/VARBINARY lowers to STRING/BINARY; lengths keep Spark (r14)") {
    assert(Dialect.rewrite("SELECT CAST(a AS VARCHAR) FROM t")
      == "SELECT CAST(a AS STRING) FROM t")
    assert(Dialect.rewrite("SELECT TRY_CAST(a AS varbinary) FROM t")
      == "SELECT TRY_CAST(a AS BINARY) FROM t")
    // nested casts rewrite inside-out
    assert(Dialect.rewrite("SELECT CAST(CAST(a AS VARCHAR) AS VARCHAR) FROM t")
      == "SELECT CAST(CAST(a AS STRING) AS STRING) FROM t")
    // VARCHAR(n) keeps its length (valid Spark)
    val sized = "SELECT CAST(a AS VARCHAR(10)) FROM t"
    assert(Dialect.rewrite(sized) == sized)
    // an alias named varchar outside a cast never matches
    val alias = "SELECT a AS VARCHAR FROM t"
    assert(Dialect.rewrite(alias) == alias)
  }

  test("typed numeric literals lower to casts with inferred decimal shape (r14)") {
    assert(Dialect.rewrite("SELECT DECIMAL '1.5' AS d")
      == "SELECT CAST('1.5' AS DECIMAL(2, 1)) AS d")
    assert(Dialect.rewrite("SELECT DECIMAL '-123.45' AS d")
      == "SELECT CAST('-123.45' AS DECIMAL(5, 2)) AS d")
    assert(Dialect.rewrite("SELECT DOUBLE '2.5', REAL '1', BIGINT '5', BOOLEAN 'true'")
      == "SELECT CAST('2.5' AS DOUBLE), CAST('1' AS FLOAT), " +
        "CAST('5' AS BIGINT), CAST('true' AS BOOLEAN)")
    // malformed DECIMAL content stays for a loud parse error
    val bad = "SELECT DECIMAL '1.2e3' AS d"
    assert(Dialect.rewrite(bad) == bad)
    // the type words NOT followed by a string literal are untouched
    val cast = "SELECT CAST(a AS DECIMAL(10, 2)), int_col FROM t"
    assert(Dialect.rewrite(cast) == cast)
    // end-to-end: values and types land
    val r = spark.sql(Dialect.rewrite(
      "SELECT DECIMAL '12.345' AS d, DOUBLE '2.5' AS x, BIGINT '7' AS b")).head()
    assert(r.getDecimal(0).toPlainString == "12.345")
    assert(r.getDouble(1) === 2.5)
    assert(r.getLong(2) === 7L)
  }

  test("DECIMAL literal precision excludes leading zeros; >38 digits rejects (r15 advice)") {
    // the reference's Decimals.parse drops leading integral zeros from
    // precision: DECIMAL '0.5' is decimal(1,1), not decimal(2,1)
    assert(Dialect.rewrite("SELECT DECIMAL '0.5' AS d")
      == "SELECT CAST('0.5' AS DECIMAL(1, 1)) AS d")
    assert(Dialect.rewrite("SELECT DECIMAL '007.25' AS d")
      == "SELECT CAST('007.25' AS DECIMAL(3, 2)) AS d")
    assert(Dialect.rewrite("SELECT DECIMAL '0' AS d")
      == "SELECT CAST('0' AS DECIMAL(1, 0)) AS d")
    assert(Dialect.rewrite("SELECT DECIMAL '-0.50' AS d")
      == "SELECT CAST('-0.50' AS DECIMAL(2, 2)) AS d")
    // content needing >38 digits fails loudly instead of clamping to
    // DECIMAL(38,38) (which would overflow any nonzero integral part)
    val e = intercept[IllegalArgumentException](Dialect.rewrite(
      "SELECT DECIMAL '1." + "2" * 39 + "' AS d"))
    assert(e.getMessage.contains("38"))
  }

  test("CAST(... AS ROW(...)) rejects loudly as an unsupported ROW type (r15 advice)") {
    val e = intercept[IllegalArgumentException](Dialect.rewrite(
      "SELECT CAST(x AS ROW(a INT, b VARCHAR)) FROM t"))
    assert(e.getMessage.contains("ROW types"))
    // constructor right after a non-type AS (alias) is unaffected: an
    // alias cannot syntactically precede ROW(, so only real casts hit
    assert(Dialect.rewrite("SELECT ROW(1, 2) AS r FROM t")
      == "SELECT struct(1, 2) AS r FROM t")
  }

  test("probeText masks literals and strips comments for shape probes (r15 advice)") {
    val p = Dialect.probeText(
      "SELECT 'corr(x) over w' AS s -- order by trailing\nFROM t /* order by block */")
    assert(!p.toLowerCase.contains("corr("))
    assert(!p.toLowerCase.contains("order"))
    assert(p.toLowerCase.contains("from t"))
  }

  test("hasTopLevelOrderBy ignores comments, literals and nesting (r15 advice)") {
    assert(Verify.hasTopLevelOrderBy("SELECT a FROM t ORDER BY a"))
    assert(!Verify.hasTopLevelOrderBy(
      "SELECT a FROM (SELECT a FROM t ORDER BY a LIMIT 3) s"))
    assert(!Verify.hasTopLevelOrderBy("SELECT 'order by' AS s FROM t"))
    assert(!Verify.hasTopLevelOrderBy("SELECT a FROM t -- order by a\n"))
    assert(!Verify.hasTopLevelOrderBy("SELECT a FROM t /* order by a */"))
    assert(Verify.hasTopLevelOrderBy(
      "SELECT a FROM t /* c */ ORDER BY a -- tail"))
  }

  test("ROW(...) constructors rewrite to struct(...); ROWS/CURRENT ROW/row_number untouched (r14)") {
    assert(Dialect.rewrite("SELECT ROW(1, 'a') FROM t")
      == "SELECT struct(1, 'a') FROM t")
    assert(Dialect.rewrite("SELECT ROW(a, ROW(b, c)) FROM t")
      == "SELECT struct(a, struct(b, c)) FROM t")
    val frame = "SELECT sum(v) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t"
    assert(Dialect.rewrite(frame) == frame)
    val rn = "SELECT row_number() OVER (ORDER BY k) FROM t"
    assert(Dialect.rewrite(rn) == rn)
  }

  test("two-argument IF gains the NULL default; three-arg IF untouched (r14)") {
    assert(Dialect.rewrite("SELECT IF(a > 1, b) FROM t")
      == "SELECT IF(a > 1, b, NULL) FROM t")
    // nested calls count only top-level commas
    assert(Dialect.rewrite("SELECT IF(f(a, b) > 1, g(c, d)) FROM t")
      == "SELECT IF(f(a, b) > 1, g(c, d), NULL) FROM t")
    val three = "SELECT IF(a, b, c) FROM t"
    assert(Dialect.rewrite(three) == three)
    // a comma inside a string literal never splits (masked text)
    assert(Dialect.rewrite("SELECT IF(a, 'x,y') FROM t")
      == "SELECT IF(a, 'x,y', NULL) FROM t")
  }

  test("OFFSET n ROWS drops the noise word; composes with FETCH FIRST (r14)") {
    assert(Dialect.rewrite("SELECT a FROM t ORDER BY a OFFSET 10 ROWS")
      == "SELECT a FROM t ORDER BY a OFFSET 10")
    assert(Dialect.rewrite("SELECT a FROM t ORDER BY a OFFSET 1 ROW")
      == "SELECT a FROM t ORDER BY a OFFSET 1")
    // the full reference spelling: OFFSET … FETCH FIRST … ROWS ONLY —
    // the FETCH lowers to LIMIT and swaps in front (Spark demands
    // LIMIT before OFFSET)
    assert(Dialect.rewrite(
      "SELECT a FROM t ORDER BY a OFFSET 10 ROWS FETCH FIRST 5 ROWS ONLY")
      == "SELECT a FROM t ORDER BY a LIMIT 5 OFFSET 10")
    // window frames never match (no OFFSET prefix)
    val frame = "SELECT sum(v) OVER (ORDER BY k ROWS 2 PRECEDING) FROM t"
    assert(Dialect.rewrite(frame) == frame)
  }

  test("plain SQL passes through untouched") {
    val sql = "SELECT a FROM t WHERE b LIKE '%fetch first%'"
    assert(Dialect.rewrite(sql) == sql)
  }

  test("CAST AS CHAR(n) lowers to rpad (pad + truncate semantics)") {
    assert(Dialect.rewrite("SELECT CAST(x AS CHAR(5)) FROM t") ==
      "SELECT rpad(CAST(x AS STRING), 5, ' ') FROM t")
    // operand with its own parens + nested char cast
    assert(Dialect.rewrite("SELECT CAST(CAST(f(a, b) AS CHAR(2)) AS CHAR(7)) FROM t") ==
      "SELECT rpad(CAST(rpad(CAST(f(a, b) AS STRING), 2, ' ') AS STRING), 7, ' ') FROM t")
    // non-char casts untouched
    assert(Dialect.rewrite("SELECT CAST(x AS INT), CAST(y AS VARCHAR(5)) FROM t") ==
      "SELECT CAST(x AS INT), CAST(y AS VARCHAR(5)) FROM t")
  }

  test("TRY_CAST AS CHAR(n) lowers too, keeping null-on-failure semantics (r8 advisory)") {
    // Trino's TRY_CAST returns NULL on failure; rpad(NULL) stays NULL,
    // so padding composes with the try semantics
    assert(Dialect.rewrite("SELECT TRY_CAST(x AS CHAR(5)) FROM t") ==
      "SELECT rpad(TRY_CAST(x AS STRING), 5, ' ') FROM t")
    // lowercase + mixed
    assert(Dialect.rewrite("SELECT try_cast(x AS char(4)) FROM t") ==
      "SELECT rpad(try_cast(x AS STRING), 4, ' ') FROM t")
    // a bare CAST nested inside a TRY_CAST operand still rewrites
    assert(Dialect.rewrite("SELECT TRY_CAST(CAST(a AS CHAR(2)) AS CHAR(7)) FROM t") ==
      "SELECT rpad(TRY_CAST(rpad(CAST(a AS STRING), 2, ' ') AS STRING), 7, ' ')" +
        " FROM t")
  }

  test("CAST AS CHAR inside a string literal is not rewritten") {
    val sql = "SELECT 'CAST(x AS CHAR(5))' AS s, CAST(a AS CHAR(3)) FROM t"
    val out = Dialect.rewrite(sql)
    assert(out.contains("'CAST(x AS CHAR(5))'"))
    assert(out.contains("rpad(CAST(a AS STRING), 3, ' ')"))
  }

  test("FETCH phrase inside a string literal is not rewritten") {
    val sql = "SELECT 'fetch first 5 rows only' AS s FROM t FETCH FIRST 2 ROWS ONLY"
    val out = Dialect.rewrite(sql)
    assert(out.contains("'fetch first 5 rows only'"))
    assert(out.endsWith("LIMIT 2"))
  }

  test("WITH TIES end-to-end keeps all tied rows") {
    val df = spark.sql(Dialect.rewrite(
      """SELECT * FROM VALUES (1, 'x'), (2, 'x'), (3, 'y'), (4, 'z') AS t(id, grp)
        |ORDER BY grp FETCH FIRST 1 ROWS WITH TIES""".stripMargin))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("UNNEST WITH ORDINALITY rewrites to a lateral posexplode (1-based)") {
    val df = spark.sql(Dialect.rewrite(
      """SELECT id, tok, ord
        |FROM (SELECT 1 AS id, array('a', 'b') AS arr)
        |CROSS JOIN UNNEST(arr) WITH ORDINALITY AS t(tok, ord)""".stripMargin))
    assert(df.collect().map(r => (r.getString(1), r.getInt(2))).sorted.toSeq ==
      Seq(("a", 1), ("b", 2)))
  }

  test("UNNEST of a map yields key/value columns") {
    val df = spark.sql(Dialect.rewrite(
      """SELECT k, v FROM (SELECT map('x', 1, 'y', 2) AS m)
        |CROSS JOIN UNNEST(m) AS t(k, v)""".stripMargin))
    assert(df.collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq ==
      Seq(("x", 1), ("y", 2)))
  }

  test("UNNEST single-column array form explodes without ordinality") {
    val df = spark.sql(Dialect.rewrite(
      "SELECT v FROM (SELECT array(7, 8) AS a) CROSS JOIN UNNEST(a) AS t(v)"))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8))
  }

  test("zip-form UNNEST(a, b) is left untouched") {
    val sql = "SELECT * FROM t CROSS JOIN UNNEST(a, b) AS z(x, y)"
    assert(Dialect.rewrite(sql) == sql)
  }

  test("WITH TIES anchors past a window ORDER BY in the final sort keys") {
    val out = Dialect.rewrite(
      """SELECT * FROM VALUES (1, 'x'), (2, 'x'), (3, 'y') AS t(id, grp)
        |ORDER BY max(id) OVER (PARTITION BY grp ORDER BY id) DESC
        |FETCH FIRST 1 ROWS WITH TIES""".stripMargin)
    // the body/keys split must sit at the OUTER order by, keeping the
    // window spec intact inside the rank() keys
    assert(out.contains("rank() OVER (ORDER BY max(id) OVER (PARTITION BY grp ORDER BY id) DESC)"), out)
  }

  test("AT TIME ZONE text inside a string literal is untouched") {
    val sql = "SELECT 'shifted AT TIME ZONE maybe' AS note FROM t"
    assert(Dialect.rewrite(sql) == sql)
  }

  test("AT TIME ZONE rewrites to from_utc_timestamp") {
    val r = spark.sql(Dialect.rewrite(
      "SELECT TIMESTAMP '2024-01-15 12:00:00' AT TIME ZONE 'America/New_York' AS x"))
      .collect().head
    assert(r.getTimestamp(0).toString.startsWith("2024-01-15 07:00:00"))
  }

  test("TRY yields NULL on ANSI errors and passes values through") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT try(cast('zz' AS int)) a, try(1 div 0) b, try(40 + 2) c").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getInt(2) == 42)
  }

  test("typed TIME literal with offset lowers to timetz_parse") {
    val out = Dialect.rewrite("SELECT TIME '10:30:00+02:00' AS t")
    assert(out.contains("timetz_parse('10:30:00+02:00')"), out)
  }

  test("typed TIMESTAMP literal with >6 fraction digits lowers to tspico_parse") {
    val out = Dialect.rewrite("SELECT TIMESTAMP '2020-01-01 00:00:00.123456789012' AS t")
    assert(out.contains("tspico_parse('2020-01-01 00:00:00.123456789012')"), out)
  }

  test("typed TIMESTAMP literal with a zone NAME lowers to tsz_parse") {
    val out = Dialect.rewrite("SELECT TIMESTAMP '2024-07-01 12:00:00 America/New_York' AS t")
    assert(out.contains("tsz_parse('2024-07-01 12:00:00 America/New_York')"), out)
    val out2 = Dialect.rewrite("SELECT TIMESTAMP '2024-07-01 12:00:00.000001 UTC' AS t")
    assert(out2.contains("tsz_parse("), out2)
  }

  test("typed TIMESTAMP literal with BOTH a pico fraction and a zone name lowers to tspz_parse") {
    val out = Dialect.rewrite(
      "SELECT TIMESTAMP '2024-07-01 12:00:00.123456789012 America/New_York' AS t")
    assert(out.contains("tspz_parse('2024-07-01 12:00:00.123456789012 America/New_York')"), out)
    // the two single-feature forms still dispatch to their own packs
    val pico = Dialect.rewrite("SELECT TIMESTAMP '2024-07-01 12:00:00.1234567' AS t")
    assert(pico.contains("tspico_parse("), pico)
    val zone = Dialect.rewrite("SELECT TIMESTAMP '2024-07-01 12:00:00.123456 UTC' AS t")
    assert(zone.contains("tsz_parse("), zone)
  }

  test("plain TIMESTAMP/TIME literals Spark parses natively pass through") {
    val sql = "SELECT TIMESTAMP '2024-01-15 12:00:00.123456' AS a FROM t"
    assert(Dialect.rewrite(sql) == sql)
    val inStr = "SELECT 'the words TIME \'10:30:00+02:00\' in a string' AS note FROM t"
    // a quote-escaped literal toggles segments; the point is no parse-call appears
    assert(!Dialect.rewrite(inStr).contains("timetz_parse"))
  }
}
