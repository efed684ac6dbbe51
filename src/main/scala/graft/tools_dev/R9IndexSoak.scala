package graft.tools_dev

import SoakHarness._

/** The persisted-index cost model, measured properly (r8 advisory,
  * medium): the r8 artifact's "consume beats recompute 2×" rested on a
  * single timed(1,1) recompute on a non-quiet box. This soak measures
  * ALL THREE stages — build, consume, recompute — with the same
  * 3-prewarm / median-of-3 protocol on a verified-quiet box, at TWO
  * increment ratios:
  *
  *   - 20% (doc_id % 5 == 4): the r8 shape, re-stated honestly.
  *   - 1%  (doc_id % 100 == 99): the steady-state production ratio
  *     (r8 verdict, Missing #4) — the index's claim is that consume
  *     scales with the INCREMENT while recompute stays corpus-bound,
  *     so the 1% point is where the separation must open up.
  *
  * Corpus: /tmp/sfdocs100 (500k docs — regenerate with
  * `runMain graft.tools.ScaleSoak100`). The artifact is emitted by THIS
  * tool verbatim (r8 advisory, low: the committed artifact must be
  * reproducible by the committed generator).
  */
object R9IndexSoak {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sfdocs100"
    require(new java.io.File(s"$dir/documents.parquet").exists,
      s"$dir missing - run graft.tools.ScaleSoak100 first")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val rows = new StringBuilder
    var first = true
    def row(incLabel: String, stage: String, t: Timed): Unit = {
      if (!first) rows.append(",")
      first = false
      rows.append(f"""{"increment":"$incLabel","stage":"$stage",""" +
        f""""wall_s":${t.median}%.2f,"runs":[${t.runs.map(r => f"$r%.2f").mkString(",")}],""" +
        f""""load":${load1}%.2f}""")
      println(f"[r9idx] $incLabel $stage median ${t.median}%.2f s " +
        s"(runs ${t.runs.map(r => f"$r%.2f").mkString("/")})")
    }
    for ((incMod, label) <- Seq(5 -> "20pct", 100 -> "1pct")) {
      val build = timed() {
        graft.queries.PipelineQueries.incrementalIndexBuild(spark, dir, incMod)
      }
      row(label, "build", build)
      val consume = timed() {
        graft.queries.PipelineQueries.incrementalIndexConsume(spark, dir, incMod)
          .write.format("noop").mode("overwrite").save()
      }
      row(label, "consume", consume)
      val recompute = timed() {
        graft.queries.PipelineQueries.incrementalRecompute(spark, dir, incMod)
          .write.format("noop").mode("overwrite").save()
      }
      row(label, "recompute", recompute)
    }
    writeArtifact("/root/repo/R9INDEX_SOAK_r09.json",
      s"""{"soak":"r9_index_steady_state","corpus":"$dir (500k docs)",""" +
        s""""protocol":"3 prewarms + median of 3 for EVERY stage (r8 advisory: recompute was timed(1,1))",""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        f""""heap_gb":$heapGb%.1f,"rows":[${rows.toString}],""" +
        f""""load_end":${load1}%.2f}""")
    spark.stop()
  }
}
