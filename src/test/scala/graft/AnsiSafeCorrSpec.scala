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

  test("corr returns NULL on NaN/Infinity inputs, matching the reference's isFinite gate (r13 advice)") {
    // NaN or Infinity inputs poison the co-moments; the <=0 degenerate
    // guards evaluate false on NaN, so without the non-finite gate the
    // result would be NaN where the reference emits NULL
    // (DoubleCorrelationAggregation.java:52 Double.isFinite)
    import spark.implicits._
    Seq((1, Double.NaN, 2.0), (1, 3.0, 4.0), (1, 5.0, 7.0),
      (2, Double.PositiveInfinity, 1.0), (2, 3.0, 4.0), (2, 5.0, 7.0),
      (3, 1.0, Double.NegativeInfinity), (3, 3.0, 4.0), (3, 5.0, 7.0),
      (4, 1.0, 2.0), (4, 3.0, 4.0), (4, 5.0, 7.0))
      .toDF("k", "y", "x").createOrReplaceTempView("asc_nonfinite")
    val got = spark.sql(
      "SELECT k, corr(y, x) AS c FROM asc_nonfinite GROUP BY k ORDER BY k")
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1) === None, s"NaN input: ${got(1)}")
    assert(got(2) === None, s"+Inf input: ${got(2)}")
    assert(got(3) === None, s"-Inf input: ${got(3)}")
    assert(got(4).exists(c => c > 0.9 && c <= 1.0), s"healthy group: ${got(4)}")
  }

  test("the SQL path fails loudly when a corr window runs without the AnsiSafeCorr registration (r13 advice)") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    // extended session: guard passes silently
    graft.engine.Tables.corrWindowGuard(spark,
      "SELECT corr(y, x) OVER (ORDER BY k) FROM t")
    // doctored session without the override: loud IllegalStateException
    // instead of a runtime ANSI DIVIDE_BY_ZERO on degenerate frames
    val bare = spark.newSession()
    bare.sessionState.functionRegistry.dropFunction(FunctionIdentifier("corr"))
    val e = intercept[IllegalStateException](graft.engine.Tables.corrWindowGuard(
      bare, "SELECT corr(y, x) OVER (ORDER BY k) FROM t"))
    assert(e.getMessage.contains("GraftExtensions"))
    // non-window corr (batch aggregate) is out of the guard's scope —
    // batch corr on a vanilla session is Spark-native behavior
    graft.engine.Tables.corrWindowGuard(bare, "SELECT corr(y, x) FROM t")
    // nested call arguments still probe through to the OVER
    val e2 = intercept[IllegalStateException](graft.engine.Tables.corrWindowGuard(
      bare, "SELECT corr(abs(y), x + 1) OVER (PARTITION BY p ORDER BY k) FROM t"))
    assert(e2.getMessage.contains("GraftExtensions"))
    // the probe runs on literal-masked, comment-stripped text: string
    // data or commentary containing "corr(x) over" never trips it
    // (r15 advice)
    graft.engine.Tables.corrWindowGuard(bare,
      "SELECT 'corr(x) over w' AS s FROM t")
    graft.engine.Tables.corrWindowGuard(bare,
      "SELECT y FROM t -- corr(x) over (order by k)\n")
  }

  test("skewness_ref/kurtosis_ref carry the reference's guards and bias-corrected kurtosis (r13 verdict #6)") {
    import spark.implicits._
    // group sizes 2 / 3 / 6: n=2 → both NULL; n=3 → skewness live
    // (population g1 per the reference formula), kurtosis still NULL;
    // n=6 → both live, kurtosis bias-corrected
    val data = Seq((2, 1.0), (2, 4.0),
      (3, 1.0), (3, 2.0), (3, 7.0),
      (6, 1.0), (6, 2.0), (6, 4.0), (6, 8.0), (6, 16.0), (6, 31.0))
    data.toDF("k", "v").createOrReplaceTempView("ref_moments")
    val got = spark.sql(
      "SELECT k, skewness_ref(v) AS sk, kurtosis_ref(v) AS ku " +
        "FROM ref_moments GROUP BY k ORDER BY k").collect()
      .map(r => r.getInt(0) -> ((if (r.isNullAt(1)) None else Some(r.getDouble(1))),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    def moments(vs: Seq[Double]): (Int, Double, Double, Double) = {
      val n = vs.length; val mu = vs.sum / n
      (n, vs.map(x => math.pow(x - mu, 2)).sum,
        vs.map(x => math.pow(x - mu, 3)).sum,
        vs.map(x => math.pow(x - mu, 4)).sum)
    }
    def refSk(vs: Seq[Double]): Double = {
      val (n, m2, m3, _) = moments(vs)
      math.sqrt(n.toDouble) * m3 / math.pow(m2, 1.5)
    }
    def refKu(vs: Seq[Double]): Double = {
      val (ni, m2, _, m4) = moments(vs); val n = ni.toDouble
      (n - 1) * n * (n + 1) / ((n - 2) * (n - 3)) * m4 / (m2 * m2) -
        3 * (n - 1) * (n - 1) / ((n - 2) * (n - 3))
    }
    assert(got(2) === ((None, None)))
    val g3 = data.filter(_._1 == 3).map(_._2)
    assert(got(3)._1.exists(s => math.abs(s - refSk(g3)) < 1e-12), s"n=3 sk ${got(3)}")
    assert(got(3)._2 === None, "n=3 kurtosis must be NULL")
    val g6 = data.filter(_._1 == 6).map(_._2)
    assert(got(6)._1.exists(s => math.abs(s - refSk(g6)) < 1e-12), s"n=6 sk ${got(6)}")
    assert(got(6)._2.exists(k => math.abs(k - refKu(g6)) < 1e-12), s"n=6 ku ${got(6)}")
    // real AggregateFunctions: FILTER and window attachment resolve
    val f = spark.sql(
      "SELECT skewness_ref(v) FILTER (WHERE k = 6) AS s, " +
        "kurtosis_ref(v) FILTER (WHERE k = 6) AS u FROM ref_moments").head()
    assert(math.abs(f.getDouble(0) - refSk(g6)) < 1e-12)
    assert(math.abs(f.getDouble(1) - refKu(g6)) < 1e-12)
    val w = spark.sql(
      "SELECT k, skewness_ref(v) OVER (PARTITION BY k) AS s FROM ref_moments " +
        "WHERE k = 6 LIMIT 1").head()
    assert(math.abs(w.getDouble(1) - refSk(g6)) < 1e-12)
    // constant input past the n-guard: the reference's Java arithmetic
    // yields 0/0 = NaN and writes it (no isFinite gate on these two);
    // Spark's LEGACY divide would NULL the zero denominator, so the NaN
    // is emitted explicitly — pinned here
    Seq((1, 5.0), (1, 5.0), (1, 5.0), (1, 5.0))
      .toDF("k", "v").createOrReplaceTempView("ref_const")
    val c = spark.sql(
      "SELECT skewness_ref(v) AS s, kurtosis_ref(v) AS u FROM ref_const").head()
    assert(c.getDouble(0).isNaN, s"constant skewness_ref: $c")
    assert(c.getDouble(1).isNaN, s"constant kurtosis_ref: $c")
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
