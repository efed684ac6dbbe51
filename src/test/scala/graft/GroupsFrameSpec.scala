package graft

/** Envelope of the GROUPS-frame lowering (reference
  * `core/trino-main/src/main/java/io/trino/operator/window/GroupsFraming.java`;
  * neither Spark nor DuckDB implements GROUPS natively). The lowering:
  * "GROUPS n PRECEDING/FOLLOWING" ≡ "RANGE n PRECEDING/FOLLOWING over
  * g = dense_rank() of the ORDER BY key" — dense_rank enumerates peer
  * groups, so a RANGE offset over g counts whole peer groups, which is
  * the defining GROUPS semantics.
  *
  * `win_groups_frame` pins the basic 1-PRECEDING case under the oracle;
  * these specs pin the rest of the envelope against hand-computed
  * expectations on a fixture with REAL TIES (multi-row peer groups of
  * varying size — where GROUPS, RANGE and ROWS all disagree):
  *  - ties: every row of a peer group sees the same frame, and frame
  *    size counts ROWS of the included groups, not groups;
  *  - mixed UNBOUNDED PRECEDING .. k FOLLOWING;
  *  - CURRENT ROW .. UNBOUNDED FOLLOWING (suffix frames);
  *  - GROUPS vs ROWS divergence on the same data.
  *
  * EXCLUDE clause: SQL-2016 frame exclusion (EXCLUDE CURRENT ROW /
  * GROUP / TIES) composes with GROUPS in the reference's framing but
  * has no Spark clause. For INVERTIBLE (sum-class) aggregates all
  * three modes are subtraction-emulable — GROUP = frame − peer-group,
  * TIES = frame − peer-group + current value, CURRENT ROW = frame −
  * current value — and the driver row `win_groups_exclude` pins all
  * three against DuckDB's NATIVE EXCLUDE clauses. Precondition: the
  * peer group must be wholly contained in the frame (holds for RANGE
  * frames bounded at CURRENT ROW or later; NOT for ROWS frames).
  * NON-INVERTIBLE aggregates (min/max) use the TWO-SEGMENT recompute
  * instead (r9; reference GroupsFraming.java recomputes the frame
  * after exclusion): the excluded current group splits the frame into
  * a before-segment and an after-segment, each a rank-framed window,
  * recombined with least/greatest; EXCLUDE CURRENT ROW additionally
  * splits the current GROUP around the row by a deterministic
  * within-group order. Driver row `win_groups_exclude_minmax` pins all
  * three modes × {min, max} against DuckDB's native EXCLUDE; the spec
  * below pins them against a row-level reference model on tied data.
  */
class GroupsFrameSpec extends GraftSuite {

  // (k, v): keys form peer groups of size 3, 1, 2, 4 — ties everywhere
  private val rows: Seq[(Int, Int)] = Seq(
    (10, 1), (10, 2), (10, 3),
    (20, 4),
    (30, 5), (30, 6),
    (40, 7), (40, 8), (40, 9), (40, 10))

  /** Reference model: per row, sum of v over the rows of peer groups in
    * [gi - before, gi + after] (group indices), unbounded via Int.Max.
    */
  private def expected(before: Int, after: Int): Map[Int, Long] = {
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1).zipWithIndex
      .map { case ((k, rs), gi) => (k, gi, rs.map(_._2.toLong).sum) }
    rows.map { case (k, v) =>
      val gi = groups.find(_._1 == k).get._2
      val s = groups.collect {
        // Long arithmetic: gi + Int.MaxValue must not wrap
        case (_, g, sum)
          if g.toLong >= gi.toLong - before && g.toLong <= gi.toLong + after => sum
      }.sum
      v -> s
    }.toMap
  }

  private def lowered(frame: String): Map[Int, Long] = {
    import spark.implicits._
    rows.toDF("k", "v").createOrReplaceTempView("groups_fixture")
    spark.sql(
      s"""SELECT v, sum(v) OVER (ORDER BY g RANGE $frame) AS s FROM (
         |  SELECT k, v, dense_rank() OVER (ORDER BY k) AS g
         |  FROM groups_fixture)""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  test("GROUPS 1 PRECEDING..CURRENT ROW with ties: whole peer groups, row-weighted") {
    assert(lowered("BETWEEN 1 PRECEDING AND CURRENT ROW") === expected(1, 0))
  }

  test("GROUPS UNBOUNDED PRECEDING..1 FOLLOWING (mixed frame)") {
    assert(lowered("BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING") ===
      expected(Int.MaxValue, 1))
  }

  test("GROUPS CURRENT ROW..UNBOUNDED FOLLOWING (suffix frame)") {
    assert(lowered("BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING") ===
      expected(0, Int.MaxValue))
  }

  test("GROUPS 1 PRECEDING..1 FOLLOWING centered frame") {
    assert(lowered("BETWEEN 1 PRECEDING AND 1 FOLLOWING") === expected(1, 1))
  }

  test("GROUPS differs from ROWS on tied data (the semantics being emulated)") {
    import spark.implicits._
    rows.toDF("k", "v").createOrReplaceTempView("groups_fixture")
    val rowsFrame = spark.sql(
      """SELECT v, sum(v) OVER (ORDER BY k, v
        |  ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM groups_fixture""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowsFrame !== expected(1, 0),
      "fixture must make ROWS and GROUPS disagree, or the tie tests prove nothing")
  }

  test("EXCLUDE GROUP emulation: frame sum minus peer-group sum") {
    import spark.implicits._
    rows.toDF("k", "v").createOrReplaceTempView("groups_fixture")
    val got = spark.sql(
      """SELECT v, s_frame - s_peer AS s FROM (
        |  SELECT v,
        |    sum(v) OVER (ORDER BY g RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s_frame,
        |    sum(v) OVER (PARTITION BY g) AS s_peer
        |  FROM (SELECT k, v, dense_rank() OVER (ORDER BY k) AS g
        |        FROM groups_fixture))""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val peerSum = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2.toLong).sum }
    val exp = rows.map { case (k, v) => v -> (expected(1, 0)(v) - peerSum(k)) }.toMap
    assert(got === exp)
  }

  test("EXCLUDE for min (non-invertible): two-segment recompute matches the row-level model") {
    import spark.implicits._
    rows.toDF("k", "v").createOrReplaceTempView("groups_fixture")
    // frame = GROUPS 1 PRECEDING..1 FOLLOWING; segments: all of group
    // g−1, all of group g+1, and (for EXCLUDE CURRENT ROW) the current
    // group split around the row by within-group order on v
    val got = spark.sql(
      """SELECT v,
        |  least(m_prev, m_next) AS mg,
        |  least(m_prev, m_next, v) AS mt,
        |  least(m_prev, m_next, m_lo, m_hi) AS mc
        |FROM (
        |  SELECT v,
        |    min(v) OVER (ORDER BY g RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS m_prev,
        |    min(v) OVER (ORDER BY g RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS m_next,
        |    min(v) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_lo,
        |    min(v) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS m_hi
        |  FROM (SELECT k, v, dense_rank() OVER (ORDER BY k) AS g
        |        FROM groups_fixture))""".stripMargin)
      .collect()
      .map(r => r.getInt(0) -> (
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    // row-level reference model over the fixture
    val keys = rows.map(_._1).distinct.sorted
    val gIdx = keys.zipWithIndex.toMap
    def minOpt(s: Seq[Int]): Option[Int] = if (s.isEmpty) None else Some(s.min)
    val exp = rows.map { case (k, v) =>
      val gi = gIdx(k)
      val frame = rows.filter { case (k2, _) => math.abs(gIdx(k2) - gi) <= 1 }
      val exclGroup = minOpt(frame.collect { case (k2, v2) if k2 != k => v2 })
      val exclTies = minOpt(frame.collect { case (k2, v2) if k2 != k || v2 == v => v2 })
      val exclCur = minOpt(frame.collect { case (_, v2) if v2 != v => v2 })
      v -> (exclGroup, exclTies, exclCur)
    }.toMap
    assert(got === exp)
  }
}
