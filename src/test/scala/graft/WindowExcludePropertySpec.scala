package graft

import graft.sqlcompat.Dialect

/** Seeded randomized property check for the window-exclusion lowering:
  * random (aggregate × frame type × exclusion mode) combinations run
  * through the SQL entry and compare against an independent Scala model
  * of SQL-standard removal-only frame exclusion. Two generators:
  *
  *  - UNIQUE order keys (peer group = the row): every aggregate class,
  *    per-row exact identity, results keyed by the order key.
  *  - TIE-heavy order keys: aggregate arguments are functions of the
  *    ORDER key, so each output is position-determined and the multiset
  *    of (partition, key, result) is tie-order-invariant (the suite's
  *    established discipline for positional frames under ties).
  *
  * Cases are BATCHED ~12 window columns per query so the sweep stays
  * fast. The model mirrors the engine's documented corners: NULL (not
  * NaN) on zero-variance ratios, pair masking for the corr family,
  * linear-interpolated quantiles, removal-only exclusion (a frame not
  * containing the current row never has peers removed for RANGE/GROUPS;
  * for ROWS the peer run is clamped into the frame).
  */
class WindowExcludePropertySpec extends GraftSuite {

  private val rnd = new scala.util.Random(41212L)

  // ------------------------------------------------------------ fixture

  // two partitions; ku unique within partition; kt = ku/3 gives runs of
  // ties; x is the value column with a deterministic NULL mask
  private case class Row(p: Int, ku: Int, kt: Int, x: Option[Long])
  private val data: Seq[Row] = (0 until 44).map { i =>
    val p = i % 2
    val ku = i / 2
    val x = if ((i * 7 + 3) % 5 == 0) None
      else Some(((i * 131) % 37 - 11).toLong)
    Row(p, ku, ku / 3, x)
  }

  private def fixture(): Unit = {
    import spark.implicits._
    data.map(r => (r.p, r.ku, r.kt, r.x.map(java.lang.Long.valueOf).orNull))
      .toDF("p", "ku", "kt", "x")
      .createOrReplaceTempView("wep_fixture")
  }

  // ------------------------------------------------------------- model

  /** One partition's rows in order; `ord` keys the frames, `arg` the
    * aggregated value (None = SQL NULL).
    */
  private case class MRow(ord: Long, arg: Option[Double])

  private def framesOf(rows: Vector[MRow], i: Int, mode: String,
      lo: Long, hi: Long): Vector[Int] = mode match {
    case "rows" =>
      val l = if (lo == Long.MinValue) 0 else math.max(0, i + lo.toInt)
      val h = if (hi == Long.MaxValue) rows.length - 1
        else math.min(rows.length - 1, i + hi.toInt)
      if (l > h) Vector.empty else (l to h).toVector
    case "range" =>
      val v = rows(i).ord
      rows.indices.filter { j =>
        val o = rows(j).ord
        (lo == Long.MinValue || o >= v + lo) && (hi == Long.MaxValue || o <= v + hi)
      }.toVector
    case "groups" =>
      val keys = rows.map(_.ord).distinct.sorted
      val gi = keys.indexOf(rows(i).ord)
      val keep = keys.zipWithIndex.collect {
        case (k, gj) if (lo == Long.MinValue || gj >= gi + lo) &&
          (hi == Long.MaxValue || gj <= gi + hi) => k
      }.toSet
      rows.indices.filter(j => keep(rows(j).ord)).toVector
  }

  /** Removal-only exclusion: the kept index sequence in frame order. */
  private def keptOf(rows: Vector[MRow], i: Int, frame: Vector[Int],
      exclude: String): Vector[Int] = exclude match {
    case "" | "no others" => frame
    case "current row" => frame.filter(_ != i)
    case "group" => frame.filter(j => rows(j).ord != rows(i).ord)
    case "ties" => frame.filter(j => rows(j).ord != rows(i).ord || j == i)
  }

  private def quant(vs: Seq[Double], p: Double): Option[Double] = {
    val xs = vs.sorted
    if (xs.isEmpty) None
    else {
      val pos = p * (xs.length - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      Some(xs(lo) + (pos - lo) * (xs(hi) - xs(lo)))
    }
  }

  private def moments(vs: Seq[Double]): (Int, Double, Double, Double, Double) = {
    val n = vs.length
    if (n == 0) return (0, 0, 0, 0, 0)
    val mu = vs.sum / n
    (n, mu, vs.map(v => math.pow(v - mu, 2)).sum,
      vs.map(v => math.pow(v - mu, 3)).sum, vs.map(v => math.pow(v - mu, 4)).sum)
  }

  /** (sql text of the call, model over the kept rows). Aggregates take
    * `a` (the value expression text) whose model values arrive via
    * MRow.arg; the pair family derives its second side from `a2`/f2.
    */
  private case class Agg(sql: String => String,
      model: (Vector[MRow], Vector[Int], Int) => Option[Any])

  private def vals(rows: Vector[MRow], kept: Vector[Int]): Seq[Double] =
    kept.flatMap(j => rows(j).arg)

  // second side for the pair family: a deterministic function of the arg
  private def x2(d: Double): Double = (d * d) % 13

  private val aggs: Seq[(String, Agg)] = Seq(
    "sum" -> Agg(a => s"sum($a)", (r, k, _) => {
      val v = vals(r, k); if (v.isEmpty) None else Some(v.sum) }),
    "count" -> Agg(a => s"count($a)", (r, k, _) => Some(vals(r, k).length.toLong)),
    "avg" -> Agg(a => s"avg($a)", (r, k, _) => {
      val v = vals(r, k); if (v.isEmpty) None else Some(v.sum / v.length) }),
    "min" -> Agg(a => s"min($a)", (r, k, _) => vals(r, k).minOption),
    "max" -> Agg(a => s"max($a)", (r, k, _) => vals(r, k).maxOption),
    "count_if" -> Agg(a => s"count_if(($a) > 0)",
      (r, k, _) => Some(vals(r, k).count(_ > 0).toLong)),
    "bit_xor" -> Agg(a => s"bit_xor(CAST(($a) AS BIGINT))", (r, k, _) => {
      val v = vals(r, k).map(_.toLong)
      if (v.isEmpty) None else Some(v.reduce(_ ^ _)) }),
    "stddev_samp" -> Agg(a => s"stddev($a)", (r, k, _) => {
      val (n, _, m2, _, _) = moments(vals(r, k))
      if (n < 2) None else Some(math.sqrt(m2 / (n - 1))) }),
    "var_pop" -> Agg(a => s"var_pop($a)", (r, k, _) => {
      val (n, _, m2, _, _) = moments(vals(r, k))
      if (n < 1) None else Some(m2 / n) }),
    "skewness" -> Agg(a => s"skewness($a)", (r, k, _) => {
      val (n, _, m2, m3, _) = moments(vals(r, k))
      if (n < 1 || m2 == 0) None else Some(math.sqrt(n.toDouble) * m3 / math.pow(m2, 1.5)) }),
    "kurtosis" -> Agg(a => s"kurtosis($a)", (r, k, _) => {
      val (n, _, m2, _, m4) = moments(vals(r, k))
      if (n < 1 || m2 == 0) None else Some(n * m4 / (m2 * m2) - 3.0) }),
    "median" -> Agg(a => s"median($a)", (r, k, _) => quant(vals(r, k), 0.5)),
    "percentile" -> Agg(a => s"percentile($a, 0.3)", (r, k, _) => quant(vals(r, k), 0.3)),
    "first_value" -> Agg(a => s"first_value($a)",
      (r, k, _) => k.headOption.map(j => r(j).arg)),
    "last_value" -> Agg(a => s"last_value($a)",
      (r, k, _) => k.lastOption.map(j => r(j).arg)),
    "nth_value" -> Agg(a => s"nth_value($a, 2)",
      (r, k, _) => if (k.length < 2) Some(None) else Some(r(k(1)).arg)),
    "corr" -> Agg(a => s"corr($a, ($a)*($a) % 13)", (r, k, _) => {
      val ps = vals(r, k).map(d => (d, x2(d)))
      val n = ps.length
      if (n < 1) None else {
        val my = ps.map(_._1).sum / n; val mx = ps.map(_._2).sum / n
        val m2y = ps.map(q => (q._1 - my) * (q._1 - my)).sum
        val m2x = ps.map(q => (q._2 - mx) * (q._2 - mx)).sum
        val c = ps.map(q => (q._1 - my) * (q._2 - mx)).sum
        if (m2y * m2x == 0) None else Some(c / math.sqrt(m2y * m2x))
      } }),
    "covar_samp" -> Agg(a => s"covar_samp($a, ($a)*($a) % 13)", (r, k, _) => {
      val ps = vals(r, k).map(d => (d, x2(d)))
      val n = ps.length
      if (n < 2) None else {
        val my = ps.map(_._1).sum / n; val mx = ps.map(_._2).sum / n
        Some(ps.map(q => (q._1 - my) * (q._2 - mx)).sum / (n - 1))
      } }),
    "regr_slope" -> Agg(a => s"regr_slope($a, ($a)*($a) % 13)", (r, k, _) => {
      val ps = vals(r, k).map(d => (d, x2(d)))
      val n = ps.length
      if (n < 1) None else {
        val mx = ps.map(_._2).sum / n
        val m2x = ps.map(q => (q._2 - mx) * (q._2 - mx)).sum
        val my = ps.map(_._1).sum / n
        val c = ps.map(q => (q._1 - my) * (q._2 - mx)).sum
        if (m2x == 0) None else Some(c / m2x)
      } }),
    "regr_count" -> Agg(a => s"regr_count($a, ($a)*($a) % 13)",
      (r, k, _) => Some(vals(r, k).length.toLong)),
    "count_distinct" -> Agg(a => s"count(DISTINCT $a)",
      (r, k, _) => Some(vals(r, k).distinct.length.toLong)),
    "sum_distinct" -> Agg(a => s"sum(DISTINCT $a)", (r, k, _) => {
      val v = vals(r, k).distinct; if (v.isEmpty) None else Some(v.sum) }),
    "stddev_distinct" -> Agg(a => s"stddev(DISTINCT $a)", (r, k, _) => {
      val (n, _, m2, _, _) = moments(vals(r, k).distinct)
      if (n < 2) None else Some(math.sqrt(m2 / (n - 1))) }))

  private val frames: Seq[(String, String)] = Seq(
    ("rows", "ROWS"), ("range", "RANGE"), ("groups", "GROUPS"))
  private val modes: Seq[(String, String)] = Seq(
    ("group", "EXCLUDE GROUP"), ("ties", "EXCLUDE TIES"),
    ("current row", "EXCLUDE CURRENT ROW"), ("no others", "EXCLUDE NO OTHERS"))

  private def bound(n: Long): String =
    if (n == Long.MinValue) "UNBOUNDED PRECEDING"
    else if (n == Long.MaxValue) "UNBOUNDED FOLLOWING"
    else if (n < 0) s"${-n} PRECEDING" else if (n == 0) "CURRENT ROW"
    else s"$n FOLLOWING"

  private def randBounds(): (Long, Long) = {
    def b(): Long = rnd.nextInt(7) match {
      case 0 => Long.MinValue
      case 6 => Long.MaxValue
      case v => v.toLong - 3 // -3..2
    }
    val (l, h) = (b(), b())
    if (l == Long.MaxValue || h == Long.MinValue || (l != Long.MinValue && h != Long.MaxValue && l > h))
      randBounds()
    else (l, h)
  }

  private def close(a: Option[Any], b: Option[Any], tag: String): Unit = (a, b) match {
    case (None, None) => ()
    case (Some(x: Double), Some(y: Double)) =>
      assert(math.abs(x - y) < 1e-6 * math.max(1.0, math.abs(y)), s"$tag: $x vs $y")
    case (Some(x), Some(y)) => assert(x == y, s"$tag: $x vs $y")
    case _ => fail(s"$tag: $a vs $b")
  }

  /** Flatten engine cell values to the model's Option[Any] shape. */
  private def cell(r: org.apache.spark.sql.Row, i: Int): Option[Any] =
    if (r.isNullAt(i)) None
    else r.get(i) match {
      case d: java.lang.Double => Some(d.doubleValue)
      case l: java.lang.Long => Some(l.longValue)
      case i2: java.lang.Integer => Some(i2.longValue)
      case v => Some(v)
    }

  private case class Case(name: String, call: String,
      model: (Vector[MRow], Vector[Int], Int) => Option[Any],
      frameKind: String, lo: Long, hi: Long, exclude: String)

  private def runBatch(cases: Seq[Case], orderCol: String,
      argOf: Row => Option[Double]): Unit = {
    val cols = cases.zipWithIndex.map { case (c, i) =>
      val f = frames.find(_._1 == c.frameKind).get._2
      val ex = modes.find(_._1 == c.exclude).get._2
      s"${c.call} OVER (PARTITION BY p ORDER BY $orderCol " +
        s"$f BETWEEN ${bound(c.lo)} AND ${bound(c.hi)} $ex) AS c$i"
    }
    val sql = s"SELECT p, $orderCol AS o, ${cols.mkString(", ")} FROM wep_fixture"
    val got = spark.sql(Dialect.rewrite(sql)).collect()
    // model rows per partition, ordered like the engine's sort
    val parts: Map[Int, Vector[MRow]] = data.groupBy(_.p).map { case (p, rs) =>
      p -> rs.sortBy(r => (if (orderCol == "ku") r.ku else r.kt, r.ku))
        .map(r => MRow(if (orderCol == "ku") r.ku else r.kt, argOf(r))).toVector
    }
    cases.zipWithIndex.foreach { case (c, ci) =>
      val expected: Seq[(Int, Long, Option[Any])] = parts.toSeq.flatMap { case (p, rows) =>
        rows.indices.map { i =>
          val frame = framesOf(rows, i, c.frameKind, c.lo, c.hi)
          val kept =
            if (c.exclude == "no others") frame
            else keptOf(rows, i, frame, c.exclude)
          val m = c.model(rows, kept, i) match {
            case Some(o: Option[_]) => o // first/last/nth wrap their cell
            case other => other
          }
          (p, rows(i).ord, m)
        }
      }
      val actual: Seq[(Int, Long, Option[Any])] = got.toSeq.map { r =>
        (r.getInt(0), r.getInt(1).toLong, cell(r, 2 + ci))
      }
      if (orderCol == "ku") {
        val em = expected.map(t => (t._1, t._2) -> t._3).toMap
        actual.foreach { case (p, o, a) =>
          close(a, em((p, o)), s"${c.name} ${c.frameKind} [${c.lo},${c.hi}] " +
            s"${c.exclude} at p=$p o=$o") }
      } else {
        // tie order: compare multisets of rendered values
        def render(t: (Int, Long, Option[Any])): String = t match {
          case (p, o, Some(d: Double)) => s"$p|$o|${math.round(d * 1e6)}"
          case (p, o, v) => s"$p|$o|$v"
        }
        assert(actual.map(render).sorted == expected.map(render).sorted,
          s"${c.name} ${c.frameKind} [${c.lo},${c.hi}] ${c.exclude}: multiset diff\n" +
            s"actual=${actual.map(render).sorted.take(8)}\n" +
            s"expected=${expected.map(render).sorted.take(8)}")
      }
    }
  }

  private def randomCases(n: Int): Seq[Case] = (0 until n).map { _ =>
    val (name, agg) = aggs(rnd.nextInt(aggs.length))
    val (fk, _) = frames(rnd.nextInt(frames.length))
    val (ex, _) = modes(rnd.nextInt(modes.length))
    val (lo, hi) = randBounds()
    Case(name, agg.sql("xv"), agg.model, fk, lo, hi, ex)
  }

  test("120 random (aggregate x frame x mode) cases, unique order keys") {
    fixture()
    // xv = the x column (nullable); model arg mirrors it exactly
    spark.sql("SELECT p, ku, kt, CAST(x AS DOUBLE) AS xv FROM wep_fixture")
      .createOrReplaceTempView("wep_fixture")
    val cs = randomCases(120)
    cs.grouped(12).foreach(b =>
      runBatch(b, "ku", r => r.x.map(_.toDouble)))
  }

  test("48 random FILTER / IGNORE NULLS cases, unique order keys") {
    fixture()
    spark.sql("SELECT p, ku, kt, CAST(x AS DOUBLE) AS xv FROM wep_fixture")
      .createOrReplaceTempView("wep_fixture")
    // FILTER masks the aggregated multiset (per-argument for the pair
    // family); IGNORE NULLS applies to the positional family. The model
    // composes the same masks over the kept rows.
    val pred = "xv > 0"
    def masked(r: MRow): Option[Double] = r.arg.filter(_ > 0)
    val fAggs: Seq[(String, Agg)] = Seq(
      "sum_f" -> Agg(a => s"sum($a) FILTER (WHERE $pred)", (r, k, _) => {
        val v = k.flatMap(j => masked(r(j))); if (v.isEmpty) None else Some(v.sum) }),
      "count_f" -> Agg(a => s"count($a) FILTER (WHERE $pred)",
        (r, k, _) => Some(k.flatMap(j => masked(r(j))).length.toLong)),
      "stddev_f" -> Agg(a => s"stddev($a) FILTER (WHERE $pred)", (r, k, _) => {
        val (n, _, m2, _, _) = moments(k.flatMap(j => masked(r(j))))
        if (n < 2) None else Some(math.sqrt(m2 / (n - 1))) }),
      "covar_pop_f" -> Agg(a => s"covar_pop($a, ($a)*($a) % 13) FILTER (WHERE $pred)",
        (r, k, _) => {
          val ps = k.flatMap(j => masked(r(j))).map(d => (d, x2(d)))
          val n = ps.length
          if (n < 1) None else {
            val my = ps.map(_._1).sum / n; val mx = ps.map(_._2).sum / n
            Some(ps.map(q => (q._1 - my) * (q._2 - mx)).sum / n)
          } }),
      "first_in" -> Agg(a => s"first_value($a) IGNORE NULLS",
        (r, k, _) => Some(k.flatMap(j => r(j).arg).headOption)),
      "last_in" -> Agg(a => s"last_value($a) IGNORE NULLS",
        (r, k, _) => Some(k.flatMap(j => r(j).arg).lastOption)),
      "nth_in" -> Agg(a => s"nth_value($a, 2) IGNORE NULLS", (r, k, _) => {
        val nn = k.flatMap(j => r(j).arg); Some(nn.lift(1)) }))
    val cs = (0 until 48).map { _ =>
      val (name, agg) = fAggs(rnd.nextInt(fAggs.length))
      val (fk, _) = frames(rnd.nextInt(frames.length))
      val (ex, _) = modes(rnd.nextInt(modes.length))
      val (lo, hi) = randBounds()
      Case(name, agg.sql("xv"), agg.model, fk, lo, hi, ex)
    }
    cs.grouped(12).foreach(b => runBatch(b, "ku", r => r.x.map(_.toDouble)))
  }

  test("36 random ORDER BY-position window cases (r13 lift) match the model ordering") {
    fixture()
    spark.sql("SELECT p, ku, kt, CAST(x AS DOUBLE) AS xv FROM wep_fixture")
      .createOrReplaceTempView("wep_fixture")
    // exact-valued aggregates only (integer sums/counts/min/max and the
    // single-division avg are bit-identical between engine and model),
    // so the ORDER is fully determined and LIMIT picks a closed-form
    // row set; ASC NULLS FIRST pins the null placement; (p, ku) breaks
    // every remaining tie
    val exact = aggs.filter { case (n, _) => Set("sum", "count", "min", "max", "avg")(n) }
    val parts: Map[Int, Vector[MRow]] = data.groupBy(_.p).map { case (p, rs) =>
      p -> rs.sortBy(_.ku).map(r => MRow(r.ku, r.x.map(_.toDouble))).toVector
    }
    (0 until 36).foreach { _ =>
      val (name, agg) = exact(rnd.nextInt(exact.length))
      val (fk, fTxt) = frames(rnd.nextInt(frames.length))
      val (ex, eTxt) = modes(rnd.nextInt(modes.length))
      val (lo, hi) = randBounds()
      val sql =
        s"SELECT p, ku FROM wep_fixture ORDER BY ${agg.sql("xv")} OVER " +
          s"(PARTITION BY p ORDER BY ku $fTxt BETWEEN ${bound(lo)} AND ${bound(hi)} $eTxt) " +
          "ASC NULLS FIRST, p, ku LIMIT 9"
      val got = spark.sql(Dialect.rewrite(sql)).collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      val keyed = parts.toSeq.flatMap { case (p, rows) =>
        rows.indices.map { i =>
          val frame = framesOf(rows, i, fk, lo, hi)
          val kept = if (ex == "no others") frame else keptOf(rows, i, frame, ex)
          val m = agg.model(rows, kept, i) match {
            case Some(o: Option[_]) => o
            case other => other
          }
          val key: Option[Double] = m.map {
            case d: Double => d
            case l: Long => l.toDouble
            case v => v.toString.toDouble
          }
          (key, p, rows(i).ord.toInt)
        }
      }
      val exp = keyed.sortBy { case (k, p, ku) => (k.isDefined, k.getOrElse(0.0), p, ku) }
        .take(9).map(t => (t._2, t._3))
      assert(got === exp,
        s"orderby-lift $name $fk [$lo,$hi] $ex:\n got=$got\n exp=$exp")
    }
  }

  test("96 random cases over tie-heavy order keys (multiset, args on the order key)") {
    fixture()
    // args are a function of the TIE order key so positional frames stay
    // tie-order-safe; NULL on every 4th group exercises the masks
    spark.sql("SELECT p, ku, kt, CASE WHEN kt % 4 = 3 THEN NULL " +
      "ELSE CAST((kt * 131) % 37 - 11 AS DOUBLE) END AS xv FROM wep_fixture")
      .createOrReplaceTempView("wep_fixture")
    def argOf(r: Row): Option[Double] =
      if (r.kt % 4 == 3) None else Some(((r.kt * 131) % 37 - 11).toDouble)
    // positional EXCLUDE results under ties are position-assigned; the
    // multiset render keys by the ORDER value, which is safe because
    // every argument is a function of the order key
    randomCases(96).grouped(12).foreach(b => runBatch(b, "kt", argOf))
  }
}
