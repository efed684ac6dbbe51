package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-
  * resolution stage of a near-duplicate pipeline: pairwise matches
  * (jaccard / minhash / simhash / embedding) in, one canonical
  * representative per duplicate cluster out.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log n) rounds on any graph — unlike naive min-label
  * propagation whose round count is the graph diameter (duplicate chains
  * a→b→c→… are common in crawl corpora, so diameter is not bounded by a
  * small constant at 100 TB).
  *
  * Scale design:
  * - Each round is two self-contained shuffle stages keyed on the node id
  *   (a groupBy-min and an equi-join) — no driver-side state, no collect.
  * - `localCheckpoint` after every round truncates the lineage: without
  *   it the plan doubles per iteration and Catalyst analysis time blows
  *   up long before the data does.
  * - Large-star splits high-degree stars across their neighbors, so a
  *   mega-cluster (e.g. boilerplate pages matching each other) does not
  *   serialize into one task: per-node state is one (min) aggregate, and
  *   the emitted edges re-key BY NEIGHBOR.
  * - Convergence is detected from a (count, hash-sum) signature of the
  *   canonicalized edge set — two scalar aggregates, no edge-set
  *   materialization on the driver and no extra `except` shuffle.
  */
object ConnectedComponents {

  /** Resolve components.
    *
    * @param edges    two-column DataFrame of undirected edges (any
    *                 integral type; self-loops and duplicates tolerated)
    * @param vertices one-column DataFrame of ALL node ids (isolated
    *                 nodes become singleton components)
    * @return (id, component) — component = smallest node id in the
    *         connected component, so `id === component` marks one
    *         canonical representative per cluster.
    */
  def resolve(edges: DataFrame, vertices: DataFrame, maxIter: Int = 25): DataFrame = {
    val vcol = vertices.columns.head
    val Seq(ec1, ec2) = edges.columns.toSeq.take(2)

    // canonical orientation: u > v, self-loops dropped, duplicates merged
    def canon(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()

    // For each u: m = min(Γ(u) ∪ {u}); attach strictly-greater neighbors
    // to m. Works on the symmetric closure so both endpoints see the edge.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }

    // Oriented u > v: point every smaller neighbor (and u itself) at the
    // minimum neighbor.
    def smallStar(e: DataFrame): DataFrame = {
      val o = canon(e)
      val mins = o.groupBy("u").agg(min("v").as("m"))
      o.join(mins, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .distinct()
    }

    // (count, xor-of-hashes) signature — equality ⇒ converged (edges are
    // distinct so xor-cancellation needs a hash collision, odds ~2⁻⁶⁴ per
    // check; overflow-free under ANSI mode, unlike a hash SUM). If the
    // loop exits before the fixpoint (maxIter exhausted or a ~2⁻⁶⁴
    // false stop), a node can still hold several out-edges; the final
    // join aggregates min(v) per node so each vertex gets exactly one
    // label — a refinement of the true components (a component may split,
    // never merge wrongly), and the non-convergence is logged loudly.
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var e = canon(
      edges.select(col(ec1).cast("long").as("u"), col(ec2).cast("long").as("v"))
    ).localCheckpoint()
    var last = sig(e)
    var converged = last._1 == 0L
    var i = 0
    while (!converged && i < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val s = sig(e)
      converged = s == last
      last = s
      i += 1
    }

    if (!converged)
      System.err.println(
        s"[graft] ConnectedComponents: star fixpoint NOT reached after $i rounds " +
          s"(maxIter=$maxIter) — labels are a refinement (components may be split); " +
          "raise maxIter.")

    // At the fixpoint every edge is (member → component-min); roots and
    // isolated vertices label themselves. min(comp) per id guards the
    // non-converged case where a node still holds multiple out-edges.
    vertices.select(col(vcol).cast("long").as("id"))
      .join(
        e.groupBy(col("u").as("id")).agg(min(col("v")).as("comp")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component"))
  }
}
