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

  test("merge-behind stream finds AT LEAST the consume-only totals and merges really ran") {
    try {
      incrementalIndexBuild(spark, sfTiny, 5, heldOut = Seq(4))
      val consumeOnly = incrementalIndexConsume(spark, sfTiny, 5, selMod = 4)
        .collect().head
      // fresh store for the merge-behind run (the consume above read it)
      incrementalIndexBuild(spark, sfTiny, 5, heldOut = Seq(4))
      val merged = graft.streaming.IndexedDedupStream
        .streamedMergeBehindRow(spark, sfTiny).collect().head
      assert(merged.getLong(0) == consumeOnly.getLong(0), "n_new")
      // folding earlier batches in can only ADD cross-batch hits
      assert(merged.getLong(1) >= consumeOnly.getLong(1), "n_exact_dup monotone")
      assert(merged.getLong(2) >= consumeOnly.getLong(2), "n_near_dup monotone")
      assert(merged.getLong(3) > 1, s"batches: ${merged.getLong(3)}")
      assert(merged.getLong(4) == merged.getLong(3) / 2,
        s"merges: ${merged.getLong(4)} of ${merged.getLong(3)} batches")
      // merge-behind appended to the store: the delta log exists
      assert(spark.catalog.tableExists("graft_idx_df_delta"))
    } finally {
      Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("maintenance trigger flips at the delta-fraction threshold") {
    try {
      incrementalIndexBuild(spark, sfTiny, 5, heldOut = Seq(3, 4))
      incrementalIndexMerge(spark, sfTiny, 5, mergeMod = 3, stats = false).collect()
      val frac = indexDeltaFraction(spark)
      assert(frac > 0.1 && frac < 0.9, s"fixture fraction: $frac")
      assert(indexMaintain(spark, sfTiny, threshold = 0.9, heldOut = Seq(4)) == "merge_only")
      assert(spark.catalog.tableExists("graft_idx_df_delta"), "delta log kept")
      assert(indexMaintain(spark, sfTiny, threshold = 0.1, heldOut = Seq(4)) == "rebuild")
      assert(!spark.catalog.tableExists("graft_idx_df_delta"), "delta log reset")
      assert(indexDeltaFraction(spark) == 0.0)
    } finally {
      Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
