package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the product): time EVERY declared query once
  * warm (2 runs, quote the second) through the noop sink — the
  * optimization round's triage pass, finding expensive non-headline
  * paths worth a real measurement. Not a gate artifact: single warm run,
  * no set adjudication. Output: one JSON line per query to stdout and
  * the full map to the file given by SPARK_GRAFT_TRIAGE_OUT.
  * Usage: scripts/run_tool.sh graft.tools_dev.R15OptTriage [nameFilter]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object R15OptTriage {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val filter = args.headOption
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(n.contains))
    val out = new StringBuilder("{")
    var first = true
    names.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } finally {
          graft.engine.CachedPlans.releaseAll()
          graft.engine.TempArtifacts.cleanupAll(spark)
        }
      }
      val (cold, warm) =
        try { val c = once(); val w = once(); (c, w) }
        catch { case e: Throwable =>
          System.err.println(s"[triage] $name FAILED: ${e.getMessage}")
          (-1.0, -1.0)
        }
      println(f"[triage] $name%-40s cold=$cold%8.3f warm=$warm%8.3f")
      if (!first) out.append(",")
      out.append(s""""$name":[${f"$cold%.4f"},${f"$warm%.4f"}]""")
      first = false
    }
    out.append("}")
    sys.env.get("SPARK_GRAFT_TRIAGE_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        out.toString + "\n")
    }
    spark.stop()
  }
}
