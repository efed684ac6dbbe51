package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends GraftSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Long] =
    ConnectedComponents.resolve(edges.toDF("a", "b"), vertices.toDF("id"))
      .as[(Long, Long)].collect().toMap

  /** In-test oracle: path-compressing union-find with min-id roots. */
  private def unionFind(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    vertices.map(v => v -> find(v)).toMap
  }

  test("chain, star, cycle, isolated nodes all resolve to min-id components") {
    val vertices = (1L to 20L).toSeq
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),        // 5-chain (diameter > 1 round)
      (10L, 11L), (10L, 12L), (10L, 13L),            // star around a non-min hub
      (9L, 10L),                                     // attach min to the hub leaf-side
      (15L, 16L), (16L, 17L), (17L, 15L),            // cycle
      (18L, 18L)                                     // self-loop
    )
    assert(run(edges, vertices) === unionFind(edges, vertices))
  }

  test("duplicate and reversed edges are tolerated") {
    val vertices = (1L to 6L).toSeq
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (5L, 6L), (6L, 5L))
    assert(run(edges, vertices) === unionFind(edges, vertices))
  }

  test("empty edge set yields all-singleton components") {
    val got = run(Seq.empty, Seq(3L, 7L, 9L))
    assert(got === Map(3L -> 3L, 7L -> 7L, 9L -> 9L))
  }

  test("randomized graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val vertices = (0L until n.toLong).toSeq
      val edges = Seq.fill(50 + trial * 20)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(run(edges, vertices) === unionFind(edges, vertices), s"trial $trial")
    }
  }

  test("dedup_components query: members fold onto jaccard-pair clusters") {
    val df = queries.PipelineQueries.queries("dedup_components")(spark, sfTiny)
    val rows = df.collect()
    assert(rows.length > 0)
    // every component id must itself be a kept doc
    val comps = rows.map(_.getLong(1)).toSet
    val kept = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(comps.subsetOf(kept))
  }
}
