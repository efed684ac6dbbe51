package graft

/** The LSH self-join must reuse the banded-side shuffle exchange — a
  * broadcast build side silently recomputes the whole shingle+minhash
  * stage (observed 1.8× slowdown at sf0.1).
  */
class LshPlanCheck extends GraftSuite {
  private def assertReused(name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
  }

  test("dedup_minhash_lsh computes the banded base once (ReusedExchange)") {
    assertReused("dedup_minhash_lsh")
  }
  test("dedup_jaccard computes the shingle stage once (ReusedExchange)") {
    assertReused("dedup_jaccard")
  }
  test("dedup_simhash computes the signature stage once (ReusedExchange)") {
    assertReused("dedup_simhash")
  }
  test("dedup_jaccard_ppjoin computes the prefix stage once (ReusedExchange)") {
    assertReused("dedup_jaccard_ppjoin")
  }
  test("sim_tfidf_pairs computes the unit-weight stage once (ReusedExchange)") {
    assertReused("sim_tfidf_pairs")
  }

  private def assertSingleLineitemScan(name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.collect()
    // AQE plan strings repeat the tree under "== Initial Plan ==" —
    // count scans in the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"$name: expected 1 lineitem scan, found $scans:\n$plan")
  }

  test("tpch_q9 scans lineitem exactly once (window form, no ps self-join)") {
    assertSingleLineitemScan("tpch_q9")
  }
  test("tpch_q21 scans lineitem exactly once (aggregate form, no EXISTS rescan)") {
    assertSingleLineitemScan("tpch_q21")
  }
}
