package graft.tools_dev

import SoakHarness._

/** Long-session degradation reproducer (r9 finding): in the 12-query
  * 100× TPC-DS session, late-slot queries ran 2–3× their isolated walls
  * with run-over-run growth (q67: 10.9 → 34.4 s in-session vs 6.4–8.3 s
  * isolated). Hypothesis under test: JIT code-cache exhaustion — every
  * query × run × (for the CTE-materialized ones) fresh InMemoryRelation
  * compiles new generated classes; when the JVM's reserved code cache
  * fills, the compiler shuts off and hot kernels run interpreted
  * (the 12× task-CPU pathology documented in SessionDefaults).
  *
  * Protocol: warm the session with a fixed multi-query prelude
  * (q34/q38/q51 × 6 each — the slots that preceded q67 in the degraded
  * soak), then run q67 six times and print every wall IN TIME ORDER
  * (not sorted — the degradation is the sequence). Launch this main
  * twice via plain java: once with the JDK default ReservedCodeCacheSize
  * (240 MB) and once with 512 MB; if the 512 MB arm holds steady where
  * the default arm degrades, the cause is the code cache and the fix is
  * a JVM flag, not a plan change.
  */
object R9DegradeProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sftpch100"
    require(new java.io.File(s"$dir/lineitem.parquet").exists, s"$dir missing")
    val (loadStart, _, _) = waitForQuiet()
    val spark = session()
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      graft.engine.CachedPlans.releaseAll()
      graft.engine.TempArtifacts.cleanupAll(spark)
      t
    }
    val codeCacheMb = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .stream().filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Code Cache"))
      .mapToLong(_.getUsage.getMax).sum / (1024 * 1024)
    println(s"[degrade] code-cache reserve ${codeCacheMb} MB, load_start $loadStart")
    for (q <- Seq("tpcds_q34_having_star", "tpcds_q38_intersect", "tpcds_q51_cume_fulljoin")) {
      val walls = (1 to 6).map(_ => run(q))
      println(f"[degrade] prelude $q: ${walls.map(w => f"$w%.1f").mkString("/")}")
    }
    val q67 = (1 to 6).map(_ => run("tpcds_q67_rollup_rank"))
    println(f"[degrade] q67 in time order: ${q67.map(w => f"$w%.2f").mkString("/")}")
    println(f"[degrade] q67 first=${q67.head}%.2f last=${q67.last}%.2f " +
      f"ratio=${q67.last / q67.head}%.2f")
    spark.stop()
  }
}
