package graft

/** The corr override (GraftExtensions): Spark's native Corr is the one
  * statistical aggregate that throws ANSI DIVIDE_BY_ZERO on degenerate
  * groups; the engine re-registers it as an ANSI-safe composition with
  * the reference's NULL semantics. covar/regr/skew/kurt guard natively —
  * pinned here so a Spark upgrade that breaks another one is caught.
  */
class AnsiSafeCorrSpec extends GraftSuite {

  private def fixture(): Unit = {
    import spark.implicits._
    Seq((1, Some(1.0), Some(2.0)), (2, Some(3.0), Some(4.0)), (2, Some(5.0), Some(7.0)),
      (3, Some(2.0), Some(2.0)), (3, Some(9.0), Some(2.0)),
      (4, None: Option[Double], Some(1.0)), (4, Some(4.0), None: Option[Double]))
      .toDF("k", "y", "x").createOrReplaceTempView("asc_fixture")
  }

  test("corr returns NULL (not an ANSI error) on degenerate groups") {
    fixture()
    val got = spark.sql(
      "SELECT k, corr(y, x) AS c FROM asc_fixture GROUP BY k ORDER BY k")
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1) === None) // single pair: zero variance both sides
    assert(got(2).exists(c => math.abs(c - 1.0) < 1e-12)) // two collinear pairs
    assert(got(3) === None) // zero x-variance
    assert(got(4) === None) // no complete pair at all
  }

  test("corr values match the two-pass formula on healthy groups") {
    fixture()
    import spark.implicits._
    val ys = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 31.0)
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0)
    ys.zip(xs).toDF("y", "x").createOrReplaceTempView("asc_healthy")
    val got = spark.sql("SELECT corr(y, x) FROM asc_healthy").head().getDouble(0)
    val n = ys.length
    val my = ys.sum / n; val mx = xs.sum / n
    val cyx = ys.zip(xs).map { case (a, b) => (a - my) * (b - mx) }.sum
    val m2y = ys.map(a => (a - my) * (a - my)).sum
    val m2x = xs.map(b => (b - mx) * (b - mx)).sum
    val exp = cyx / math.sqrt(m2y * m2x)
    assert(math.abs(got - exp) < 1e-12, s"$got vs $exp")
  }

  // r13 (advice): the override is a REAL AggregateFunction now, so the
  // forms the analyzer can only hang off a true aggregate — FILTER,
  // DISTINCT, window attachment outside the SQL-text lowering — must all
  // resolve AND stay ANSI-safe on degenerate inputs.
  test("corr(y, x) FILTER (WHERE …) resolves and matches the two-pass formula") {
    fixture()
    import spark.implicits._
    val rows = Seq((1.0, 3.0, true), (2.0, 1.0, true), (4.0, 4.0, true),
      (8.0, 1.0, true), (16.0, 5.0, false), (31.0, 9.0, false))
    rows.toDF("y", "x", "keep").createOrReplaceTempView("asc_filter")
    val got = spark.sql(
      "SELECT corr(y, x) FILTER (WHERE keep) AS c FROM asc_filter").head().getDouble(0)
    val kept = rows.filter(_._3)
    val n = kept.length
    val my = kept.map(_._1).sum / n; val mx = kept.map(_._2).sum / n
    val cyx = kept.map { case (a, b, _) => (a - my) * (b - mx) }.sum
    val m2y = kept.map(r => (r._1 - my) * (r._1 - my)).sum
    val m2x = kept.map(r => (r._2 - mx) * (r._2 - mx)).sum
    assert(math.abs(got - cyx / math.sqrt(m2y * m2x)) < 1e-12)
    // FILTER leaving a degenerate group: NULL, not an ANSI throw
    val deg = spark.sql(
      "SELECT corr(y, x) FILTER (WHERE y = 1.0) AS c FROM asc_filter").head()
    assert(deg.isNullAt(0))
  }

  test("corr(DISTINCT y, x) resolves and deduplicates pairs") {
    import spark.implicits._
    Seq((1.0, 2.0), (1.0, 2.0), (1.0, 2.0), (3.0, 4.0), (5.0, 7.0), (5.0, 7.0))
      .toDF("y", "x").createOrReplaceTempView("asc_distinct")
    val got = spark.sql("SELECT corr(DISTINCT y, x) AS c FROM asc_distinct").head().getDouble(0)
    val exp = spark.sql(
      "SELECT corr(y, x) AS c FROM (SELECT DISTINCT y, x FROM asc_distinct)").head().getDouble(0)
    assert(math.abs(got - exp) < 1e-12, s"$got vs $exp")
  }

  test("corr attaches to a window through the DataFrame API, ANSI-safe") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val df = Seq((1, 1.0, 2.0), (1, 3.0, 5.0), (1, 4.0, 7.0),
      (2, 6.0, 6.0), (2, 8.0, 6.0)) // k=2: zero x-variance — native corr throws here
      .toDF("k", "y", "x")
    val w = Window.partitionBy($"k")
    val out = df.withColumn("c", expr("corr(y, x)").over(w))
      .select($"k", $"c").distinct().collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1).exists(c => c > 0.99 && c <= 1.0 + 1e-12))
    assert(out(2) === None) // degenerate frame: NULL, not DIVIDE_BY_ZERO
  }

  // r13: plain covar/regr/percentile windows run NATIVE (the lowering
  // intercepts them only under GROUPS/EXCLUDE or a FILTER clause), so
  // this pins their guarded evaluation on every degenerate frame shape —
  // empty at the partition head, single pair, zero variance on either or
  // both sides, sliding RANGE — against a Spark upgrade regression. corr
  // is covered by the AnsiSafeCorr tests above; median MUST keep
  // rejecting ordered windows (the lowering exists for it).
  test("native window covar/regr/percentile guard every degenerate frame shape") {
    import spark.implicits._
    Seq((1, 1.0, 2.0), (2, 3.0, 4.0), (3, 5.0, 5.0), (4, 5.0, 6.0))
      .toDF("k", "y", "x").createOrReplaceTempView("asc_win")
    val shapes = Seq(
      "covar_pop(y, x)", "covar_samp(y, x)", "regr_slope(y, x)",
      "regr_intercept(y, x)", "regr_r2(y, x)", "regr_sxx(y, x)",
      "regr_sxy(y, x)", "regr_syy(y, x)", "regr_avgx(y, x)",
      "regr_avgy(y, x)", "regr_count(y, x)",
      "regr_slope(y, 1.0)", "regr_r2(1.0, x)", "regr_intercept(y, 1.0)",
      "covar_samp(1.0, 1.0)", "percentile(y, 0.5)")
    shapes.foreach { f =>
      // pure-preceding: EMPTY for the first row, a single pair next —
      // the exact shapes that made native corr throw under ANSI
      spark.sql(s"SELECT k, $f OVER (ORDER BY k ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND 1 PRECEDING) AS v FROM asc_win").collect()
      spark.sql(s"SELECT k, $f OVER (ORDER BY k RANGE BETWEEN " +
        "1 PRECEDING AND 1 FOLLOWING) AS v FROM asc_win").collect()
    }
    // the zero-variance y special case keeps the reference value
    val r2 = spark.sql("SELECT regr_r2(1.0, x) OVER (ORDER BY k ROWS BETWEEN " +
      "1 PRECEDING AND CURRENT ROW) AS v FROM asc_win WHERE k > 1").collect()
    // head frame is a single row: zero x-variance → NULL (guarded);
    // every 2-row frame: zero y-variance, nonzero x-variance → 1.0
    assert(r2.head.isNullAt(0))
    assert(r2.drop(1).forall(r => r.getDouble(0) == 1.0))
    // median still rejects ordered/framed windows — the lowering covers it
    val e = intercept[Exception](
      spark.sql("SELECT median(y) OVER (ORDER BY k) FROM asc_win").collect())
    assert(e.getMessage.contains("INVALID_WINDOW_SPEC") ||
      e.getMessage.toLowerCase.contains("window"))
  }

  test("the other statistical aggregates guard degenerate groups natively") {
    fixture()
    val row = spark.sql(
      """SELECT covar_samp(y, x), regr_slope(y, x), regr_r2(y, x),
        |  skewness(y), kurtosis(y), var_samp(y)
        |FROM asc_fixture WHERE k = 1""".stripMargin).head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
    // skew/kurt on a single value: Spark yields NULL or NaN, never a throw
    assert(row.isNullAt(3) || row.getDouble(3).isNaN)
    assert(row.isNullAt(4) || row.getDouble(4).isNaN)
    assert(row.isNullAt(5))
  }
}
