package graft

/** Streaming ingestion against the persisted index
  * (graft.streaming.IndexedDedupStream): micro-batches through
  * foreachBatch must sum to EXACTLY the one-shot batch consume — the
  * additivity claim (micro-batches partition the increment; pairs are
  * increment×corpus only) made executable.
  */
class IndexedDedupStreamSpec extends GraftSuite {
  import graft.queries.PipelineQueries._

  test("streamed micro-batch consume sums to the one-shot batch consume") {
    try {
      incrementalIndexBuild(spark, sfTiny, 5, heldOut = Seq(4))
      val oneShot = incrementalIndexConsume(spark, sfTiny, 5, selMod = 4)
        .collect().head
      val streamed = graft.streaming.IndexedDedupStream
        .streamedConsumeRow(spark, sfTiny).collect().head
      assert(streamed.getLong(0) == oneShot.getLong(0), "n_new")
      assert(streamed.getLong(1) == oneShot.getLong(1), "n_exact_dup")
      assert(streamed.getLong(2) == oneShot.getLong(2), "n_near_dup")
      // the stream really split — a single batch would prove nothing
      assert(streamed.getLong(3) > 1, s"batches: ${streamed.getLong(3)}")
      assert(streamed.getBoolean(4))
    } finally {
      Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
