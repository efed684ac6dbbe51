package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — the scale-safe lowering for joins whose only key
  * is a 1-D range predicate. Spark plans a bare `p BETWEEN s AND e` or
  * `|a − b| ≤ δ` join as BroadcastNestedLoop (or worse, a cartesian),
  * which is O(n·m) and a non-starter at 100 TB. Discretizing the value
  * axis into width-`w` bands turns both shapes into plain shuffle
  * EQUI-joins on the band id with the original predicate as residual —
  * the same rewrite the reference's planner needs a join-index or
  * spatial partitioning for (SpatialJoinOperator territory,
  * `core/trino-main/.../operator/SpatialIndexBuilderOperator.java`), and
  * the same banding trick the dedup pipeline uses for length blocking.
  *
  * Result-preserving by construction: an interval [s, e] overlaps every
  * band it spans (its row is emitted into each), a point lands in exactly
  * one band, so every qualifying (point, interval) pair shares ≥ 1 band;
  * the residual BETWEEN keeps false candidates out. Shuffle volume =
  * points + Σ interval spans/w; pick `w` ≈ the typical interval length so
  * intervals emit O(1) bands and band buckets stay balanced.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `points(pCol)` ∈
    * [`intervals(sCol)`, `intervals(eCol)`] — equi-join on band +
    * residual. Output: all columns of both inputs.
    */
  def pointInInterval(
      points: DataFrame, pCol: String,
      intervals: DataFrame, sCol: String, eCol: String,
      bandWidth: Double): DataFrame = {
    val p = points.withColumn("__band", floor(col(pCol) / bandWidth))
    val i = intervals.withColumn("__band",
      explode(expr(s"sequence(cast(floor($sCol / $bandWidth) AS bigint), " +
        s"cast(floor($eCol / $bandWidth) AS bigint))")))
    p.as("p").join(i.as("i"),
        col("p.__band") === col("i.__band") &&
        col(s"p.$pCol") >= col(s"i.$sCol") && col(s"p.$pCol") <= col(s"i.$eCol"))
      .drop("__band")
  }

  /** Symmetric distance join: pairs (a, b) with |aCol − bCol| ≤ delta.
    * Both sides emit probes {band, band+1} (the dedup-banding pattern):
    * any pair within `delta ≤ bandWidth` differs by ≤ 1 band, so it
    * shares a probe; pairs sharing two probes are deduplicated by the
    * `distinct` on the caller's keys. Requires bandWidth ≥ delta.
    */
  def within(
      left: DataFrame, aCol: String,
      right: DataFrame, bCol: String,
      delta: Double, bandWidth: Double,
      leftKey: String, rightKey: String): DataFrame = {
    require(bandWidth >= delta, "bandWidth must be >= delta for {b, b+1} probes to cover")
    val a = left.withColumn("__probe",
      explode(array(floor(col(aCol) / bandWidth), floor(col(aCol) / bandWidth) + 1)))
    val b = right.withColumn("__probe",
      explode(array(floor(col(bCol) / bandWidth), floor(col(bCol) / bandWidth) + 1)))
    a.as("a").join(b.as("b"),
        col("a.__probe") === col("b.__probe") &&
        abs(col(s"a.$aCol") - col(s"b.$bCol")) <= delta)
      .drop("__probe")
      .dropDuplicates(leftKey, rightKey)
  }
}
