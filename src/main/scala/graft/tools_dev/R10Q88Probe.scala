package graft.tools_dev

import SoakHarness._

/** Interleaved A/B of the q88 pair at 100× — the q14 precedent
  * (`tpcds_q14_one_scan` was A/B'd against the INTERSECT shape the same
  * way in r9): the eight-subquery report shape vs its one-scan
  * conditional-count rewrite, ALTERNATED in one session (3 pairs after
  * a warm-up pair) so shared-host noise hits both arms equally and the
  * RATIO carries even in a dirty window. gc drain between runs
  * (`SoakHarness.gcDrain`).
  */
object R10Q88Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sftpch100")
    require(new java.io.File(s"$dir/lineitem.parquet").exists, s"$dir missing")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val eight = graft.SparkEntry.queries("tpcds_q88_time_slots")
    val one = graft.SparkEntry.queries("tpcds_q88_one_scan")
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      graft.engine.CachedPlans.releaseAll()
      graft.engine.TempArtifacts.cleanupAll(spark)
      gcDrain()
      w
    }
    run(eight); run(one) // warm-up pair, unrecorded
    val pairs = (1 to 3).map(_ => (run(eight), run(one)))
    val e = pairs.map(_._1).sorted.apply(1)
    val o = pairs.map(_._2).sorted.apply(1)
    println(f"[q88ab] eight-scan medians ${pairs.map(_._1).map(w => f"$w%.2f").mkString("/")} → $e%.2f s")
    println(f"[q88ab] one-scan   medians ${pairs.map(_._2).map(w => f"$w%.2f").mkString("/")} → $o%.2f s")
    writeArtifact("/root/repo/R10Q88_AB_r10.json",
      s"""{"probe":"r10_q88_shape_vs_onescan","sf":"100x tpch",""" +
        s""""protocol":"interleaved pairs in one session, 1 warm-up pair + 3 measured pairs, medians; cleanup + gc drain between runs outside timed walls",""" +
        f""""eight_scan_s":$e%.2f,"eight_scan_walls":[${pairs.map(_._1).map(w => f"$w%.2f").mkString(",")}],""" +
        f""""one_scan_s":$o%.2f,"one_scan_walls":[${pairs.map(_._2).map(w => f"$w%.2f").mkString(",")}],""" +
        f""""ratio":${o / e}%.3f,""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,"load_end":${load1}%.2f}""")
    spark.stop()
  }
}
