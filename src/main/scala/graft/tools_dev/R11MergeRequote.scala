package graft.tools_dev

import SoakHarness._

/** Requote of `R10MERGE_SOAK_r10.json` (r10 verdict, What's-wrong #2):
  * the committed rebuild median (52.79 s) sat on a mid-session load
  * spike — the artifact's own history notes the quiet floor is
  * ~36-39 s — so the headline merge_vs_rebuild ratio (0.168) overstated
  * the merge advantage ~1.4×. This tool re-runs BOTH arms with two
  * protocol improvements over r10:
  *
  *  - the rebuild arm re-quoted in a quiet window, with the soak
  *    repeated until the 3 measured runs land FLAT (max/min ≤ 1.5 —
  *    the r10 shared-host discipline: keep noisy sessions as evidence,
  *    quote the flat one);
  *  - the merge arm timed with `stats = false` (r10 advice: the r10
  *    walls included before/after full-store count() scans, so the
  *    quoted merge_s conservatively overstated the
  *    increment-proportional cost).
  *
  * Writes `R11MERGE_SOAK_r11.json` and stamps the r10 artifact with
  * `superseded_by` so the spiked ratio cannot be quoted by accident.
  */
object R11MergeRequote {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sfdocs100"
    require(new java.io.File(s"$dir/documents.parquet").exists,
      s"$dir missing - run graft.tools.ScaleSoak100 first")
    // arm selector: "rebuild" | "merge" | "both" (default). The shared
    // host's load bursts today run ~10 min — a single-arm session has a
    // much shorter exposure window, so per-arm flat sessions are
    // obtainable where a both-arms one keeps getting clipped.
    val arm = args.headOption.getOrElse("both")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val P = graft.queries.PipelineQueries

    // rebuild arm (same shape as R10MergeSoak): full build over the 99%
    val rebuildOpt = if (arm == "merge") None else Some {
      val r = timedWith() {
        P.incrementalIndexBuild(spark, dir, 100, heldOut = Seq(99))
      } { gcDrain() }
      val flat = r.runs.max / r.runs.min <= 1.5
      println(f"[r11merge] rebuild median ${r.median}%.2f s " +
        s"(runs ${r.runs.map(x => f"$x%.2f").mkString("/")}, flat=$flat)")
      (r, flat)
    }

    // merge arm: slots 90-95 in sequence, stats-free walls
    val mergeOpt = if (arm == "rebuild") None else Some {
      P.incrementalIndexBuild(spark, dir, 100, heldOut = (90 to 99))
      val mergeWalls = (90 to 95).map { slot =>
        val t0 = System.nanoTime()
        P.incrementalIndexMerge(spark, dir, 100, mergeMod = slot, stats = false)
          .collect()
        val w = (System.nanoTime() - t0) / 1e9
        gcDrain()
        w
      }
      val measured = mergeWalls.drop(3)
      val mergeMedian = measured.sorted.apply(measured.length / 2)
      println("[r11merge] merge walls (time order): " +
        s"${mergeWalls.map(w => f"$w%.2f").mkString("/")} — median of last 3 " +
        f"$mergeMedian%.2f s")
      (mergeWalls, mergeMedian)
    }
    if (arm != "both") {
      Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.stop()
      return
    }
    val (rebuild, flat) = rebuildOpt.get
    val (mergeWalls, mergeMedian) = mergeOpt.get

    writeArtifact("/root/repo/R11MERGE_SOAK_r11.json",
      s"""{"soak":"r11_merge_vs_rebuild_requote","corpus":"$dir (500k docs)","increment":"1pct",""" +
        s""""protocol":"requote of R10MERGE_SOAK with (a) rebuild arm quoted from a FLAT quiet-window session (max/min <= 1.5 across the 3 measured runs, else rerun) and (b) merge walls timed with stats=false so the O(store) count() scans the r10 protocol included are out of the wall; 3 prewarms + median of 3 rebuilds, slots 90-95 merged in sequence with median of the last 3; gc drain between runs outside timed walls",""" +
        f""""rebuild_s":${rebuild.median}%.2f,"rebuild_runs":[${rebuild.runs.map(r => f"$r%.2f").mkString(",")}],"rebuild_flat":$flat,""" +
        f""""merge_s":$mergeMedian%.2f,"merge_walls_time_order":[${mergeWalls.map(w => f"$w%.2f").mkString(",")}],""" +
        f""""merge_vs_rebuild":${mergeMedian / rebuild.median}%.3f,""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        f""""heap_gb":$heapGb%.1f,"load_end":${load1}%.2f,""" +
        s""""supersedes":"R10MERGE_SOAK_r10.json"}""")

    Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
