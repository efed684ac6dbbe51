package graft.tools_dev

import SoakHarness._

/** Isolated A/B of CTE materialization at the 100× corpus: the combined
  * 12-query session (`R9TpcdsSoak`) shows run-over-run degradation
  * (q67's three runs span 10.9–34.4 s in-session vs 7.7–10.3 isolated in
  * r8), so the materialization decision is measured HERE, one query per
  * comparison, interleaved in one fresh session on a quiet box:
  *
  *   inline        — the raw SQL through Tables.sql (Spark inlines the
  *                   CTE into every reference; q95's self-join runs 2×)
  *   materialized  — the same text through CteMaterialize (definition
  *                   executes once into a tracked cache)
  *
  * q67 (no multiply-referenced CTE — identical plan both paths) runs as
  * the session-health control: if its two "arms" differ, the session is
  * degrading and the artifact says so.
  */
object R9CteProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sftpch100"
    require(new java.io.File(s"$dir/lineitem.parquet").exists, s"$dir missing")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    // cleanup between runs moved OUTSIDE the timed wall via timedWith
    // (r9 advisory; the committed R9CTE_AB_r09 artifact predates the fix
    // — both its arms included cleanup, so the A/B itself stayed fair)
    def cleanup(): Unit = {
      graft.engine.CachedPlans.releaseAll()
      graft.engine.TempArtifacts.cleanupAll(spark)
    }
    def inline(name: String): Timed = timedWith() {
      graft.engine.Tables.sql(spark, dir, graft.queries.TpcdsQueries.sparkSqlFor(name))
        .write.format("noop").mode("overwrite").save()
    }(cleanup())
    def mat(name: String): Timed = timedWith() {
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }(cleanup())
    val rows = new StringBuilder
    var first = true
    def row(name: String, arm: String, t: Timed): Unit = {
      if (!first) rows.append(",")
      first = false
      rows.append(f"""{"query":"$name","arm":"$arm","wall_s":${t.median}%.2f,""" +
        f""""runs":[${t.runs.map(r => f"$r%.2f").mkString(",")}],"load":${load1}%.2f}""")
      println(f"[r9cte] $name/$arm median ${t.median}%.2f s " +
        s"(runs ${t.runs.map(r => f"$r%.2f").mkString("/")})")
    }
    for (q <- Seq("tpcds_q95_multi_cte", "tpcds_q11_yoy", "tpcds_q38_intersect")) {
      row(q, "inline", inline(q))
      row(q, "materialized", mat(q))
    }
    // control: identical plan both paths; a gap = session degradation
    row("tpcds_q67_rollup_rank", "control_a", mat("tpcds_q67_rollup_rank"))
    row("tpcds_q67_rollup_rank", "control_b", mat("tpcds_q67_rollup_rank"))
    writeArtifact("/root/repo/R9CTE_AB_r09.json",
      s"""{"ab":"r9_cte_materialization",""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        s""""rows":[${rows.toString}],""" +
        f""""load_end":${load1}%.2f}""")
    spark.stop()
  }
}
