package graft.tools_dev

import SoakHarness._

/** Quiet-box re-quote of the TPC-DS slice + the sharded posting index
  * (r8 verdict #6: the first seven TPC-DS soak points and the
  * sharded-index numbers in `R8OPS_SOAK_r08.json` were measured at load
  * 8.7–31.8), plus the r9-new points:
  *
  *   - q95/q11/q38/q72 after CteMaterialize (multiply-referenced WITH
  *     definitions now execute once — the q95 "at or below 9.6 s with
  *     one self-join execution" gate from the r8 verdict).
  *   - q77 channel-P&L report and q10 EXISTS-OR probe (r9-new shapes).
  *
  * Corpora: /tmp/sftpch100 for the TPC-DS queries, /tmp/sfdocs100 for
  * the sharded posting lists. 3 prewarms + median of 3, quiet-window
  * wait in-band.
  */
object R9TpcdsSoak {
  def main(args: Array[String]): Unit = {
    val tpch = "/tmp/sftpch100"
    val docs = "/tmp/sfdocs100"
    require(new java.io.File(s"$tpch/lineitem.parquet").exists, s"$tpch missing")
    require(new java.io.File(s"$docs/documents.parquet").exists, s"$docs missing")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val rows = new StringBuilder
    var first = true
    def run(name: String, dir: String, label: String): Unit = {
      val fn = graft.SparkEntry.queries(name)
      // cleanup between runs OUTSIDE the timed wall (r9 advisory: the
      // committed R9TPCDS_SOAK_r09 artifact predates this fix and charged
      // unpersist/temp-dir deletion to every measured run)
      val t = timedWith() {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      } {
        graft.engine.CachedPlans.releaseAll()
        graft.engine.TempArtifacts.cleanupAll(spark)
      }
      if (!first) rows.append(",")
      first = false
      rows.append(f"""{"query":"$name","sf":"$label","wall_s":${t.median}%.2f,""" +
        f""""runs":[${t.runs.map(r => f"$r%.2f").mkString(",")}],"load":${load1}%.2f}""")
      println(f"[r9ds] $name $label median ${t.median}%.2f s " +
        s"(runs ${t.runs.map(r => f"$r%.2f").mkString("/")})")
    }
    // re-quotes (loaded in R8OPS_SOAK) + the CTE-materialization movers
    Seq("tpcds_q3_star", "tpcds_q5_channel_rollup", "tpcds_q34_having_star",
      "tpcds_q38_intersect", "tpcds_q51_cume_fulljoin", "tpcds_q67_rollup_rank",
      "tpcds_q95_multi_cte", "tpcds_q11_yoy", "tpcds_q72_multijoin",
      // r9-new shapes
      "tpcds_q77_channel_report", "tpcds_q10_exists_or")
      .foreach(run(_, tpch, "100x tpch"))
    // sharded posting lists re-quote (loaded in R8OPS_SOAK)
    run("pipeline_inverted_index_sharded", docs, "100x docs")
    writeArtifact("/root/repo/R9TPCDS_SOAK_r09.json",
      s"""{"soak":"r9_tpcds_quiet_requote",""" +
        s""""why":"r8 early TPC-DS points + sharded-index numbers were measured under load 8.7-31.8; q95/q11/q38/q72 now run under CteMaterialize (multiply-referenced CTEs execute once)",""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        s""""rows":[${rows.toString}],""" +
        f""""load_end":${load1}%.2f}""")
    spark.stop()
  }
}
