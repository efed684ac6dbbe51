package graft

/** dedup_embedding scale shape: the LSH-bucketed variant must (a) be an
  * equi-join on (label, tbl, bucket) with ONE reused exchange, and (b)
  * recover EXACTLY the exact variant's pair set at the fixture threshold
  * (the parameter calculus in PipelineQueries makes per-pair miss ≤ 1.4e-5;
  * these fixtures are asserted at recall 1.0, which keeps the exact DuckDB
  * oracle green for the driver).
  */
class EmbeddingDedupSpec extends GraftSuite {

  private def pairs(name: String, dir: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH variant recall 1.0 vs exact variant at sf0.001") {
    val exact = pairs("dedup_embedding", sfTiny)
    val lsh = pairs("dedup_embedding_lsh", sfTiny)
    assert(lsh == exact, s"missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("LSH variant recall 1.0 vs exact variant at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val exact = pairs("dedup_embedding", dir)
    val lsh = pairs("dedup_embedding_lsh", dir)
    assert(exact.nonEmpty && lsh == exact, s"missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("LSH variant plans one reused exchange and no cartesian product") {
    val df = SparkEntry.queries("dedup_embedding_lsh")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }
}
