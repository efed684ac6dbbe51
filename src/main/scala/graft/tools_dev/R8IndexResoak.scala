package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Targeted re-soak after the bucket-count fix: the first r8 soak
  * (`R8OPS_SOAK_r08.json`) caught the persisted index's fixed 8 buckets
  * capping the 100× steady-state pair join at 8-way parallelism —
  * consume 326 s vs the 120 s full recompute, inverting the index's
  * point. The fix sizes buckets to the corpus at build time (~2k
  * docs/bucket, here 250 at 500k docs) and the consumer discovers the
  * count from catalog metadata. This re-run measures only the affected
  * block at the 100× corpus.
  *
  * SUPERSEDED by [[R9IndexSoak]] (r8 advisory): this tool's recompute
  * was timed(1,1) — no prewarm, single run — and the committed r8
  * artifact was hand-annotated post-run (now noted in its `provenance`
  * field). R9IndexSoak measures every stage 3-prewarm/median-of-3 on a
  * quiet box and emits its artifact verbatim.
  */
object R8IndexResoak {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def load1: Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val dir = "/tmp/sfdocs100"
    val out = new StringBuilder(
      s"""{"soak":"r8_index_resoak","load_start":$load1,"fix":"buckets sized to corpus (max(8, min(512, n/2000))), consume reads bucket count from catalog","rows":[""")
    def timed(prewarms: Int, measured: Int)(body: => Unit): Seq[Double] = {
      (1 to prewarms).foreach(_ => body)
      (1 to measured).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
    }
    val build = timed(0, 1) {
      graft.queries.PipelineQueries.incrementalIndexBuild(spark, dir)
    }
    println(f"[resoak] build ${build.head}%.2f s")
    val consume = timed(3, 3) {
      graft.queries.PipelineQueries.incrementalIndexConsume(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[resoak] consume median ${consume(1)}%.2f s (runs ${consume.map(r => f"$r%.2f").mkString("/")})")
    val recompute = timed(1, 1) {
      graft.SparkEntry.queries("dedup_incremental")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[resoak] recompute ${recompute.head}%.2f s")
    out.append(f"""{"stage":"build","wall_s":${build.head}%.2f},""")
    out.append(f"""{"stage":"consume","wall_s":${consume(1)}%.2f,"runs":[${consume.map(r => f"$r%.2f").mkString(",")}]},""")
    out.append(f"""{"stage":"recompute_reference","wall_s":${recompute.head}%.2f}""")
    out.append(s"""],"load_end":$load1}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/R8INDEX_RESOAK_r08.json"), out.toString)
    spark.stop()
  }
}
