package graft

import org.apache.spark.sql.functions._
import graft.operators.SpatialPartition

/** KDB-tree spatial partitioning: leaves tile the plane disjointly, the
  * partitioned join equals the brute-force join, and the physical plan
  * is a shuffled equi-join — no broadcast nested loop.
  */
class SpatialPartitionSpec extends GraftSuite {

  private def pointsDf = {
    import spark.implicits._
    (0 until 400).map(i => (i.toLong, (i % 23) * 0.7, (i % 17) * 1.3)).toDF("id", "x", "y")
  }

  private def boxesDf = {
    import spark.implicits._
    (0 until 60).map { i =>
      val x0 = (i % 9) * 1.5 - 1.0; val y0 = (i % 7) * 2.0
      (i.toLong, x0, y0, x0 + 2.5, y0 + 3.5)
    }.toDF("bid", "bxmin", "bymin", "bxmax", "bymax")
  }

  test("leaves tile the plane: disjoint, complete, every point in exactly one") {
    val tree = SpatialPartition.kdbTree(pointsDf, "x", "y", sampleN = 400, leafCap = 40)
    val leaves = tree.leaves
    assert(leaves.length > 1) // 400 samples / cap 40 must split
    assert(leaves.map(_.id).distinct.length == leaves.length)
    // probe a grid incl. points far outside the sampled extent
    for (i <- 0 to 15; j <- 0 to 16) {
      val px = -5.0 + i * 1.7; val py = -5.0 + j * 1.9
      val owners = leaves.filter(_.containsPoint(px, py))
      assert(owners.length == 1, s"point ($px,$py) in ${owners.length} leaves")
    }
    ()
  }

  test("leaf assignment is a codegen'd tree descent — no UDF in the plan") {
    val tree = SpatialPartition.kdbTree(pointsDf, "x", "y", sampleN = 400, leafCap = 40)
    val joined = SpatialPartition
      .pointInBoxJoin(pointsDf, "x", "y", boxesDf, "bxmin", "bymin", "bxmax", "bymax", tree)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"leaf assignment fell back to a UDF:\n$plan")
    // the descent agrees with the flat leaf scan on every point
    import spark.implicits._
    val assigned = pointsDf
      .withColumn("pid", SpatialPartition.pointPartition(tree, col("x"), col("y")))
      .select($"x", $"y", $"pid").collect()
    assigned.foreach { r =>
      val want = tree.leaves.find(_.containsPoint(r.getDouble(0), r.getDouble(1))).get.id
      assert(r.getInt(2) == want)
    }
    // and the box expansion agrees with the flat intersection scan
    val expanded = boxesDf
      .withColumn("pids", SpatialPartition.boxPartitions(
        tree, col("bxmin"), col("bymin"), col("bxmax"), col("bymax")))
      .select($"bxmin", $"bymin", $"bxmax", $"bymax", $"pids").collect()
    expanded.foreach { r =>
      val want = tree.leaves.filter(_.intersectsBox(
        r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).map(_.id).sorted
      assert(r.getSeq[Int](4).sorted == want)
    }
  }

  test("descent equals the flat leaf scan on random points (5 seeds × 100 probes)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val r = new scala.util.Random(seed)
      val pts = Seq.fill(300)((r.nextLong(), r.nextDouble() * 40 - 20, r.nextDouble() * 40 - 20))
      val tree = SpatialPartition.kdbTree(
        pts.toDF("id", "x", "y"), "x", "y", sampleN = 300, leafCap = 25)
      // probes beyond the sampled extent too: border leaves stretch to ±∞
      val probes = Seq.fill(100)((r.nextLong(), r.nextDouble() * 60 - 30, r.nextDouble() * 60 - 30))
      val assigned = probes.toDF("id", "x", "y")
        .withColumn("pid", SpatialPartition.pointPartition(tree, col("x"), col("y")))
        .collect()
      assigned.foreach { row =>
        val owners = tree.leaves.filter(_.containsPoint(row.getDouble(1), row.getDouble(2)))
        assert(owners.length == 1)
        assert(row.getInt(3) == owners.head.id)
      }
    }
  }

  test("partitioned join result equals brute force; no pair lost or duplicated") {
    val tree = SpatialPartition.kdbTree(pointsDf, "x", "y", sampleN = 400, leafCap = 40)
    val got = SpatialPartition
      .pointInBoxJoin(pointsDf, "x", "y", boxesDf, "bxmin", "bymin", "bxmax", "bymax", tree)
      .select("id", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = pointsDf.crossJoin(boxesDf)
      .where(col("x") >= col("bxmin") && col("x") <= col("bxmax") &&
             col("y") >= col("bymin") && col("y") <= col("bymax"))
      .select("id", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("plan is an equi-join on the partition id; shuffled when broadcast is off") {
    val tree = SpatialPartition.kdbTree(pointsDf, "x", "y", sampleN = 400, leafCap = 40)
    def plan(): String = SpatialPartition
      .pointInBoxJoin(pointsDf, "x", "y", boxesDf, "bxmin", "bymin", "bxmax", "bymax", tree)
      .queryExecution.executedPlan.toString
    // with defaults the tiny side broadcasts — still an equi hash join
    val p1 = plan()
    assert(!p1.contains("BroadcastNestedLoopJoin") && !p1.contains("CartesianProduct"),
      s"spatial join fell back to a product plan:\n$p1")
    assert(p1.contains("Join [pid"), s"join key is not pid:\n$p1")
    // at scale neither side fits a broadcast: the same operator must plan
    // as a pid-SHUFFLED join, never a nested loop
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p2 = plan()
      assert(!p2.contains("BroadcastNestedLoopJoin") && !p2.contains("CartesianProduct"))
      assert(p2.contains("hashpartitioning(pid"), s"join is not pid-partitioned:\n$p2")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
