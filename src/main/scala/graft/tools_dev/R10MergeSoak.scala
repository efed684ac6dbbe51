package graft.tools_dev

import SoakHarness._

/** The index-maintenance cost model at 100× (r9 verdict, Missing #3
  * closure): BEFORE this round each crawl slice paid a FULL index
  * rebuild (`R9INDEX_SOAK` build: 43–58 s at 500k docs); the claim
  * "build amortizes over many increments" is only true if increments
  * don't each pay it. `incrementalIndexMerge` appends one slice — prefix
  * rows under the frozen df order, novel fingerprints, df delta log —
  * with cost ∝ the slice. This soak puts the two numbers side by side
  * at the 1% increment (the production crawl-slice ratio):
  *
  *  - rebuild arm: full `incrementalIndexBuild` over the 99% corpus,
  *    3 prewarms + median of 3 (the today-cost of absorbing a slice).
  *  - merge arm: SUCCESSIVE DISTINCT 1% slices merged into one store
  *    (slots 90–95 of doc_id % 100: 3 prewarm slices, 3 measured) —
  *    repeated merges of one slice would time appends into an
  *    ever-larger store of its own copies; distinct slices are the
  *    production sequence and symmetric in cost.
  *  - consume-after-merges: the steady-state query against the
  *    5-times-merged store, pinning that appends don't degrade consume
  *    (multi-file buckets cost a re-sort, not an exchange).
  *
  * Cleanup runs between iterations OUTSIDE the timed wall
  * ([[SoakHarness.timedWith]] discipline; merge/build are their own
  * actions so there is nothing to clean between runs here, but consume
  * uses it). Corpus: /tmp/sfdocs100 (`runMain graft.tools.ScaleSoak100`).
  */
object R10MergeSoak {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sfdocs100"
    require(new java.io.File(s"$dir/documents.parquet").exists,
      s"$dir missing - run graft.tools.ScaleSoak100 first")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val P = graft.queries.PipelineQueries

    // rebuild arm: what a slice costs today (full build over 99%).
    // gcDrain between runs: without it, prior runs' shuffle files stay
    // pinned by uncollected RDDs and evict the corpus from page cache
    // (the r10 q67 finding — see SoakHarness.gcDrain)
    val rebuild = timedWith() {
      P.incrementalIndexBuild(spark, dir, 100, heldOut = Seq(99))
    } { gcDrain() }
    println(f"[r10merge] rebuild median ${rebuild.median}%.2f s " +
      s"(runs ${rebuild.runs.map(r => f"$r%.2f").mkString("/")})")

    // merge arm: base over held-out slots 90..99, then merge 90..95 in
    // sequence — first 3 walls are prewarm, last 3 the measured set
    P.incrementalIndexBuild(spark, dir, 100, heldOut = (90 to 99))
    val mergeWalls = (90 to 95).map { slot =>
      val t0 = System.nanoTime()
      P.incrementalIndexMerge(spark, dir, 100, mergeMod = slot).collect()
      val w = (System.nanoTime() - t0) / 1e9
      gcDrain()
      w
    }
    val measured = mergeWalls.drop(3)
    val mergeMedian = measured.sorted.apply(measured.length / 2)
    println("[r10merge] merge walls (time order): " +
      s"${mergeWalls.map(w => f"$w%.2f").mkString("/")} — median of last 3 " +
      f"$mergeMedian%.2f s")

    // steady-state consume against the 5-times-merged store
    val consume = timedWith() {
      P.incrementalIndexConsume(spark, dir, 100, selMod = 99)
        .write.format("noop").mode("overwrite").save()
    } {
      graft.engine.CachedPlans.releaseAll()
      gcDrain()
    }
    println(f"[r10merge] consume-after-merges median ${consume.median}%.2f s")

    writeArtifact("/root/repo/R10MERGE_SOAK_r10.json",
      s"""{"soak":"r10_index_merge_vs_rebuild","corpus":"$dir (500k docs)","increment":"1pct",""" +
        s""""protocol":"rebuild: 3 prewarms + median of 3; merge: slots 90-95 merged in sequence into one store, median of last 3 (distinct slices, symmetric cost); cleanup + gc drain between runs outside timed walls (SoakHarness.gcDrain - shuffle retention otherwise contaminates later runs)",""" +
        f""""rebuild_s":${rebuild.median}%.2f,"rebuild_runs":[${rebuild.runs.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""merge_s":$mergeMedian%.2f,"merge_walls_time_order":[${mergeWalls.map(w => f"$w%.2f").mkString(",")}],""" +
        f""""merge_vs_rebuild":${mergeMedian / rebuild.median}%.3f,""" +
        f""""consume_after_merges_s":${consume.median}%.2f,"consume_runs":[${consume.runs.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        f""""heap_gb":$heapGb%.1f,"load_end":${load1}%.2f}""")

    Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
