package graft

/** The LSH self-join must reuse the banded-side shuffle exchange — a
  * broadcast build side silently recomputes the whole shingle+minhash
  * stage (observed 1.8× slowdown at sf0.1).
  */
class LshPlanCheck extends GraftSuite {
  test("dedup_minhash_lsh computes the banded base once (ReusedExchange)") {
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
  }
}
