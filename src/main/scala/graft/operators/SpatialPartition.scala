package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioned spatial join — the scale path the reference reaches via
  * `SpatialPartitioningAggregateFunction` + `KdbTreeType` +
  * `SpatialJoinOperator` in partitioned mode
  * (`plugin/trino-geospatial/.../SpatialPartitioningInternalAggregateFunction.java`,
  * `core/trino-main/.../ExtractSpatialJoins.java`): sample one side,
  * build a KDB tree over the sample, assign each row the tree leaves its
  * envelope intersects, then run an ordinary shuffled EQUI-join on the
  * leaf id with the spatial predicate as residual.
  *
  * Spark-first shape: the tree is built on the driver from a bounded
  * sample (`sampleN` rows, deterministic seed), closed over by codegen'd
  * expressions — the join itself is a plain `join(..., "pid")` that
  * Catalyst plans as a shuffled hash/sort-merge join, so BOTH sides can
  * be arbitrarily large: no broadcast, no nested-loop. Probe-side points
  * land in exactly one leaf; build-side boxes are duplicated into every
  * leaf they overlap (the reference duplicates the build side the same
  * way), so no pair is lost and — because a point has a single leaf — no
  * pair is emitted twice.
  */
object SpatialPartition {

  /** KDB leaf: half-open extent, border leaves stretched to ±∞ so every
    * point falls in exactly one leaf.
    */
  final case class Leaf(id: Int, xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
    def containsPoint(x: Double, y: Double): Boolean =
      x >= xmin && x < xmax && y >= ymin && y < ymax
    def intersectsBox(x0: Double, y0: Double, x1: Double, y1: Double): Boolean =
      x0 < xmax && x1 >= xmin && y0 < ymax && y1 >= ymin
  }

  /** Build the tree on the driver from a deterministic sample of the
    * point side. Recursive median splits on the longer axis until a node
    * holds ≤ `leafCap` samples — the reference's KdbTree construction
    * (`KdbTree.buildKdbTree`) with the same leaf-capacity shape.
    */
  def kdbTree(df: DataFrame, xCol: String, yCol: String,
      sampleN: Int = 1000, leafCap: Int = 100): Vector[Leaf] = {
    val pts = df.select(col(xCol).cast("double"), col(yCol).cast("double"))
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .limit(sampleN) // deterministic bounded sample; a real deployment
                      // would TABLESAMPLE — result correctness does not
                      // depend on sample quality, only balance does
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val inf = Double.PositiveInfinity
    var nextId = 0
    def split(ps: Array[(Double, Double)],
        xmin: Double, ymin: Double, xmax: Double, ymax: Double): Vector[Leaf] = {
      if (ps.length <= leafCap) {
        val l = Leaf(nextId, xmin, ymin, xmax, ymax); nextId += 1; Vector(l)
      } else {
        // split the axis with larger sample spread at the sample median
        val xs = ps.map(_._1); val ys = ps.map(_._2)
        val splitX = (xs.max - xs.min) >= (ys.max - ys.min)
        val sortedKeys = (if (splitX) xs else ys).sorted
        val mid = sortedKeys(sortedKeys.length / 2)
        val (lo, hi) = ps.partition(p => (if (splitX) p._1 else p._2) < mid)
        if (lo.isEmpty || hi.isEmpty) { // duplicate-heavy sample: stop
          val l = Leaf(nextId, xmin, ymin, xmax, ymax); nextId += 1; Vector(l)
        } else if (splitX)
          split(lo, xmin, ymin, mid, ymax) ++ split(hi, mid, ymin, xmax, ymax)
        else
          split(lo, xmin, ymin, xmax, mid) ++ split(hi, xmin, mid, xmax, ymax)
      }
    }
    split(pts, -inf, -inf, inf, inf)
  }

  /** Leaf id of the (single) leaf containing each point. */
  def pointPartition(tree: Vector[Leaf], x: Column, y: Column): Column = {
    val t = tree // stable closure capture
    udf((px: Double, py: Double) =>
      t.find(_.containsPoint(px, py)).map(_.id).getOrElse(-1))
      .apply(x.cast("double"), y.cast("double"))
  }

  /** Leaf ids of every leaf an envelope intersects (build-side
    * duplication, as in the reference's spatialPartitions over an
    * envelope).
    */
  def boxPartitions(tree: Vector[Leaf],
      xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column = {
    val t = tree
    udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
      t.filter(_.intersectsBox(x0, y0, x1, y1)).map(_.id))
      .apply(xmin.cast("double"), ymin.cast("double"),
        xmax.cast("double"), ymax.cast("double"))
  }

  /** Point-in-box partitioned spatial join: `points` gains one `pid`,
    * `boxes` explodes into its overlapping leaves, and the result is the
    * shuffled equi-join on `pid` with containment as the residual.
    * Neither side is broadcast or nested-looped.
    */
  def pointInBoxJoin(points: DataFrame, x: String, y: String,
      boxes: DataFrame, xmin: String, ymin: String, xmax: String, ymax: String,
      tree: Vector[Leaf]): DataFrame = {
    val p = points.withColumn("pid", pointPartition(tree, col(x), col(y)))
    val b = boxes.withColumn("pid",
      explode(boxPartitions(tree, col(xmin), col(ymin), col(xmax), col(ymax))))
    p.join(b, Seq("pid"))
      .where(col(x) >= col(xmin) && col(x) <= col(xmax) &&
             col(y) >= col(ymin) && col(y) <= col(ymax))
      .drop("pid")
  }
}
