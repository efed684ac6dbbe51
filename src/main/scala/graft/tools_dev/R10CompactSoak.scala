package graft.tools_dev

import SoakHarness._

/** The compaction leg of the index cost model, completing the LSM
  * triple measured this round (`R10MERGE_SOAK_r10.json` covered
  * merge-vs-rebuild): appends forfeit the stored-sort guarantee, so the
  * consume-side pair join re-sorts the stored side on every query.
  *
  * MEASURED OUTCOME (kept because it refuted the setup's hypothesis —
  * see the artifact's `conclusion`): (1) with gc-drain hygiene a
  * fanout-7 store consumes only ~14% slower than a compacted one
  * (13.32 vs 11.44 s) — the 16.8-vs-9.1 gap the non-gc merge soak
  * suggested was mostly delayed-GC shuffle retention, not fanout;
  * (2) minor compaction is NOT cheap here: the prefix rows carry the
  * full shingle-hash arrays, so rewriting them costs about what the
  * rebuild costs (the rebuild's window/join compute is small next to
  * the same array movement). Production policy for THIS store: merge
  * append-only, skip minor compaction, rebuild on the df-delta
  * threshold (the major compaction also refreshes the frozen ranking).
  * `compactBucketed` remains correct and driver-verified for stores
  * where rows are narrow and I/O genuinely undercuts recompute.
  *
  * Protocol:
  *  - base build over held-out slots 90–99, then 6 merges (slots 90–95)
  *    fan the store — the merged state the merge soak measured.
  *  - consume_merged: timedWith 3/3 against the fanned store.
  *  - compact walls: 3 × (merge one more slot untimed → compact timed)
  *    — each compact run collapses a freshly-fanned store, the
  *    production cadence (compact after every k merges).
  *  - consume_compacted: timedWith 3/3 against the compacted store.
  *
  * Corpus: /tmp/sfdocs100 (500k docs), same as the merge soak.
  */
object R10CompactSoak {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sfdocs100"
    require(new java.io.File(s"$dir/documents.parquet").exists,
      s"$dir missing - run graft.tools.ScaleSoak100 first")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val P = graft.queries.PipelineQueries
    val W = graft.engine.Writer

    P.incrementalIndexBuild(spark, dir, 100, heldOut = (90 to 99))
    (90 to 95).foreach { slot =>
      P.incrementalIndexMerge(spark, dir, 100, mergeMod = slot).collect()
      gcDrain() // shuffle retention from the prep must not taint the timing
    }
    val fanMerged = W.bucketFileFanout(spark, "graft_idx_prefix")

    val consumeMerged = timedWith() {
      P.incrementalIndexConsume(spark, dir, 100, selMod = 99)
        .write.format("noop").mode("overwrite").save()
    } {
      graft.engine.CachedPlans.releaseAll()
      gcDrain()
    }
    println(f"[r10compact] consume over fanned store (fanout $fanMerged): " +
      f"median ${consumeMerged.median}%.2f s")

    // compact walls: merge-then-compact, three cycles (merge untimed)
    val compactWalls = (96 to 98).map { slot =>
      P.incrementalIndexMerge(spark, dir, 100, mergeMod = slot).collect()
      gcDrain()
      val t0 = System.nanoTime()
      P.incrementalIndexCompact(spark).collect()
      val w = (System.nanoTime() - t0) / 1e9
      gcDrain()
      w
    }
    val compactMedian = compactWalls.sorted.apply(compactWalls.length / 2)
    println("[r10compact] compact walls (time order): " +
      s"${compactWalls.map(w => f"$w%.2f").mkString("/")} — median " +
      f"$compactMedian%.2f s")
    val fanAfter = W.bucketFileFanout(spark, "graft_idx_prefix")

    val consumeCompacted = timedWith() {
      P.incrementalIndexConsume(spark, dir, 100, selMod = 99)
        .write.format("noop").mode("overwrite").save()
    } {
      graft.engine.CachedPlans.releaseAll()
      gcDrain()
    }
    println(f"[r10compact] consume over compacted store (fanout $fanAfter): " +
      f"median ${consumeCompacted.median}%.2f s")

    writeArtifact("/root/repo/R10COMPACT_SOAK_r10.json",
      s"""{"soak":"r10_index_compact","corpus":"$dir (500k docs)","increment":"1pct",""" +
        s""""protocol":"base build over slots 90-99 held out; 6 merges (90-95) fan the store; consume timedWith 3/3 each side; compact walls are 3 x (merge one slot untimed, compact timed); cleanup + gc drain between runs outside timed walls (SoakHarness.gcDrain)",""" +
        s""""fanout_merged":$fanMerged,"fanout_compacted":$fanAfter,""" +
        f""""consume_merged_s":${consumeMerged.median}%.2f,"consume_merged_runs":[${consumeMerged.runs.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""compact_s":$compactMedian%.2f,"compact_walls_time_order":[${compactWalls.map(w => f"$w%.2f").mkString(",")}],""" +
        f""""consume_compacted_s":${consumeCompacted.median}%.2f,"consume_compacted_runs":[${consumeCompacted.runs.map(r => f"$r%.2f").mkString(",")}],""" +
        s""""rebuild_reference_s":38.65,"rebuild_reference":"R10MERGE_SOAK_r10.json",""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        f""""heap_gb":$heapGb%.1f,"load_end":${load1}%.2f}""")

    Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
