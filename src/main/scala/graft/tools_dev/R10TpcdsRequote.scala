package graft.tools_dev

import SoakHarness._

/** Fresh-session requote of the TPC-DS 100× rows the r9 soak quoted from
  * degraded late slots (r9 verdict, What's wrong #1: `R9TPCDS_SOAK_r09`
  * ran 12 queries × 6 runs in ONE session; q67's quoted median of 28.4 s
  * is 2–3× its fresh-session steady state of 7–10.7 s, ditto q11/q95 —
  * an in-session degradation the r9 degrade probe couldn't reproduce).
  *
  * This round REPRODUCED it and isolated the mechanism. Two passes over
  * q67, one JVM each, cleanup between runs outside the timed wall:
  * 3-prewarm/3-measured ran 91/17/16 s; 6-prewarm/5-measured ran
  * 85/81/57/22/37 s — MORE same-query runs in one JVM = DEEPER
  * degradation, with bounce-backs (the 22 s run), which rules out
  * C2 warm-up (monotone) and points at delayed-GC shuffle retention: a
  * 48 GB heap almost never collects, so every run's multi-GB shuffle
  * files are pinned by unreferenced-but-uncollected RDDs and
  * ContextCleaner cannot delete them — tens of GB accumulate, evicting
  * the 100× corpus from page cache; a run that happens to follow a full
  * GC (cleaner just drained) snaps back to steady state. The `gc` arm
  * pins this: System.gc() between runs (OUTSIDE the timed wall — a
  * production service GCs continuously; a measurement loop on an
  * oversized idle heap does not) lets the cleaner drain each run's
  * shuffle before the next.
  *
  * Protocol: ONE QUERY PER JVM (launch once per query via
  * `scripts/run_tool.sh`), cleanup + optional gc BETWEEN runs outside
  * the timed wall ([[SoakHarness.timedWith]]). Each invocation appends
  * one JSON row; `R10TPCDS_REQUOTE_r10.json` is assembled from the rows.
  *
  * Usage: scripts/run_tool.sh graft.tools_dev.R10TpcdsRequote \
  *          <query> <rowsFile> [dir] [prewarms] [measured] [gc|nogc]
  */
object R10TpcdsRequote {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val rowsFile = args(1)
    val dir = args.lift(2).getOrElse("/tmp/sftpch100")
    val prewarms = args.lift(3).map(_.toInt).getOrElse(3)
    val measured = args.lift(4).map(_.toInt).getOrElse(3)
    val gcBetween = args.lift(5).forall(_ != "nogc")
    require(new java.io.File(s"$dir/lineitem.parquet").exists, s"$dir missing")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val fn = graft.SparkEntry.queries(name)
    val t = timedWith(prewarms = prewarms, measured = measured) {
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    } {
      graft.engine.CachedPlans.releaseAll()
      graft.engine.TempArtifacts.cleanupAll(spark)
      if (gcBetween) gcDrain()
    }
    val row = f"""{"query":"$name","sf":"100x tpch","wall_s":${t.median}%.2f,""" +
      f""""runs":[${t.runs.map(r => f"$r%.2f").mkString(",")}],""" +
      s""""prewarms":$prewarms,"gc_between":$gcBetween,""" +
      f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
      f""""load_end":${load1}%.2f}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(rowsFile), row + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    println(s"[r10requote] $row")
    spark.stop()
  }
}
