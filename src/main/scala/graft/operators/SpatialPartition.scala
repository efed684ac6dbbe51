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
  * Spark-first shape: the tree is built on the driver from a one-pass
  * distributed reservoir sample (the reference samples the same way,
  * inside its partitioning aggregate), then lowered into plain Catalyst
  * `when/otherwise` expressions that DESCEND the tree — O(depth)
  * comparisons per row, fully inside whole-stage codegen, no UDF
  * boundary. The join itself is a plain `join(..., "pid")` that Catalyst
  * plans as a shuffled hash/sort-merge join, so BOTH sides can be
  * arbitrarily large: no broadcast, no nested-loop. Probe-side points
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

  /** KDB node: internal splits carry the axis and the split coordinate;
    * the structure is what the per-row expressions descend.
    */
  sealed trait Node
  final case class Split(splitX: Boolean, mid: Double, lo: Node, hi: Node) extends Node
  final case class LeafNode(leaf: Leaf) extends Node

  /** Driver-held tree: the root for O(depth) descent plus the flat leaf
    * list for diagnostics and the tiling invariants the spec checks.
    */
  final case class Tree(root: Node, leaves: Vector[Leaf])

  /** One-pass distributed sample of the point side: a per-partition
    * reservoir (bounded memory per task) merged on the driver with
    * partition-count weighting. Unlike `limit(n)` — which takes the FIRST
    * rows of the first partitions and can concentrate the whole sample in
    * one corner of the plane — every row has near-uniform inclusion odds,
    * so the tree stays balanced on sorted/clustered inputs. Deterministic
    * for a fixed seed and input partitioning.
    */
  def samplePoints(df: DataFrame, xCol: String, yCol: String,
      sampleN: Int, seed: Long = 42L): Array[(Double, Double)] = {
    val rows = df.select(col(xCol).cast("double"), col(yCol).cast("double"))
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
    val perPart = rows.rdd.mapPartitionsWithIndex { (pi, it) =>
      val rnd = new java.util.Random(seed ^ (pi * 0x9E3779B97F4A7C15L))
      val buf = new Array[(Double, Double)](sampleN)
      var seen = 0L
      it.foreach { r =>
        val p = (r.getDouble(0), r.getDouble(1))
        if (seen < sampleN) buf(seen.toInt) = p
        else {
          val j = (rnd.nextDouble() * (seen + 1)).toLong
          if (j < sampleN) buf(j.toInt) = p
        }
        seen += 1
      }
      if (seen == 0) Iterator.empty
      else Iterator.single((buf.take(math.min(seen, sampleN.toLong).toInt), seen))
    }.collect()
    val total = perPart.map(_._2).sum
    if (total <= sampleN) perPart.flatMap(_._1)
    else {
      // draw sampleN times: partition ∝ row count, then uniform in its
      // reservoir — balance-grade uniformity in one pass over the data
      val rnd = new java.util.Random(seed)
      Array.fill(sampleN) {
        var t = (rnd.nextDouble() * total).toLong
        var pi = 0
        while (pi < perPart.length - 1 && t >= perPart(pi)._2) {
          t -= perPart(pi)._2; pi += 1
        }
        val s = perPart(pi)._1
        s(rnd.nextInt(s.length))
      }
    }
  }

  /** Build the tree on the driver from a one-pass sample of the point
    * side. Recursive median splits on the longer axis until a node holds
    * ≤ `leafCap` samples — the reference's KdbTree construction
    * (`KdbTree.buildKdbTree`) with the same leaf-capacity shape. Result
    * correctness never depends on sample quality, only balance does.
    */
  def kdbTree(df: DataFrame, xCol: String, yCol: String,
      sampleN: Int = 1000, leafCap: Int = 100): Tree = {
    val pts = samplePoints(df, xCol, yCol, sampleN)
    val inf = Double.PositiveInfinity
    val leaves = Vector.newBuilder[Leaf]
    var nextId = 0
    def split(ps: Array[(Double, Double)],
        xmin: Double, ymin: Double, xmax: Double, ymax: Double): Node = {
      def leaf(): Node = {
        val l = Leaf(nextId, xmin, ymin, xmax, ymax)
        nextId += 1; leaves += l; LeafNode(l)
      }
      if (ps.length <= leafCap) leaf()
      else {
        // split the axis with larger sample spread at the sample median
        val xs = ps.map(_._1); val ys = ps.map(_._2)
        val splitX = (xs.max - xs.min) >= (ys.max - ys.min)
        val sortedKeys = (if (splitX) xs else ys).sorted
        val mid = sortedKeys(sortedKeys.length / 2)
        val (lo, hi) = ps.partition(p => (if (splitX) p._1 else p._2) < mid)
        if (lo.isEmpty || hi.isEmpty) leaf() // duplicate-heavy sample: stop
        else if (splitX)
          Split(splitX = true, mid,
            split(lo, xmin, ymin, mid, ymax), split(hi, mid, ymin, xmax, ymax))
        else
          Split(splitX = false, mid,
            split(lo, xmin, ymin, xmax, mid), split(hi, xmin, mid, xmax, ymax))
      }
    }
    val root = split(pts, -inf, -inf, inf, inf)
    Tree(root, leaves.result())
  }

  /** Leaf id of the (single) leaf containing each point: a nested
    * `when/otherwise` descent of the KDB tree — O(depth) codegen'd
    * comparisons per row, no UDF. NULL coordinates yield pid −1, which no
    * build-side row carries, so such rows drop from the inner join (the
    * same outcome the old null-skipped UDF produced).
    */
  def pointPartition(tree: Tree, x: Column, y: Column): Column = {
    val px = x.cast("double"); val py = y.cast("double")
    def descend(n: Node): Column = n match {
      case LeafNode(l) => lit(l.id)
      case Split(sx, mid, lo, hi) =>
        when((if (sx) px else py) < mid, descend(lo)).otherwise(descend(hi))
    }
    when(px.isNull || py.isNull, lit(-1)).otherwise(descend(tree.root))
  }

  /** Leaf ids of every leaf an envelope intersects (build-side
    * duplication, as in the reference's spatialPartitions over an
    * envelope): the same tree descent, following BOTH children where the
    * box straddles the split. Each branch is guarded, so a row's cost is
    * O(depth + leaves actually hit), all inside codegen.
    */
  def boxPartitions(tree: Tree,
      xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column = {
    val x0 = xmin.cast("double"); val y0 = ymin.cast("double")
    val x1 = xmax.cast("double"); val y1 = ymax.cast("double")
    val none = array().cast("array<int>")
    def descend(n: Node): Column = n match {
      case LeafNode(l) => array(lit(l.id))
      case Split(sx, mid, lo, hi) =>
        concat(
          when((if (sx) x0 else y0) < mid, descend(lo)).otherwise(none),
          when((if (sx) x1 else y1) >= mid, descend(hi)).otherwise(none))
    }
    descend(tree.root)
  }

  /** Point-in-box partitioned spatial join: `points` gains one `pid`,
    * `boxes` explodes into its overlapping leaves, and the result is the
    * shuffled equi-join on `pid` with containment as the residual.
    * Neither side is broadcast or nested-looped.
    */
  def pointInBoxJoin(points: DataFrame, x: String, y: String,
      boxes: DataFrame, xmin: String, ymin: String, xmax: String, ymax: String,
      tree: Tree): DataFrame = {
    val p = points.withColumn("pid", pointPartition(tree, col(x), col(y)))
    val b = boxes.withColumn("pid",
      explode(boxPartitions(tree, col(xmin), col(ymin), col(xmax), col(ymax))))
    p.join(b, Seq("pid"))
      .where(col(x) >= col(xmin) && col(x) <= col(xmax) &&
             col(y) >= col(ymin) && col(y) <= col(ymax))
      .drop("pid")
  }
}
