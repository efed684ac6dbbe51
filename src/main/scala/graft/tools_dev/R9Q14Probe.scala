package graft.tools_dev

import SoakHarness._

/** q14 plan A/B at the 100× corpus: the shape-faithful 3-scan INTERSECT
  * chain (`tpcds_q14_cross_items`) vs the one-scan grouped
  * channel-presence variant (`tpcds_q14_one_scan`). Result-identical
  * (both driver rows share the oracle semantics); this measures what
  * the one-scan rewrite is worth at scale. Interleaved, fresh session,
  * quiet box.
  */
object R9Q14Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sftpch100"
    require(new java.io.File(s"$dir/lineitem.parquet").exists, s"$dir missing")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val rows = new StringBuilder
    var first = true
    def arm(name: String): Unit = {
      // cleanup between runs outside the timed wall (r9 advisory; the
      // committed R9Q14_AB_r09 artifact predates this fix)
      val t = timedWith() {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      } {
        graft.engine.CachedPlans.releaseAll()
        graft.engine.TempArtifacts.cleanupAll(spark)
      }
      if (!first) rows.append(",")
      first = false
      rows.append(f"""{"query":"$name","wall_s":${t.median}%.2f,""" +
        f""""runs":[${t.runs.map(r => f"$r%.2f").mkString(",")}],"load":${load1}%.2f}""")
      println(f"[r9q14] $name median ${t.median}%.2f s " +
        s"(runs ${t.runs.map(r => f"$r%.2f").mkString("/")})")
    }
    arm("tpcds_q14_cross_items")
    arm("tpcds_q14_one_scan")
    arm("tpcds_q14_cross_items") // second quote guards against drift
    arm("tpcds_q14_one_scan")
    writeArtifact("/root/repo/R9Q14_AB_r09.json",
      s"""{"ab":"r9_q14_one_scan_vs_intersect",""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        s""""rows":[${rows.toString}],"load_end":${load1}}""")
    spark.stop()
  }
}
