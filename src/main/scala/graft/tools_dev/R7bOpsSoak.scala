import org.apache.spark.sql.SparkSession

/** Scale soak for the round-7 second-wave ops (BM25 retrieval, inverted
  * index, UniMax, BPE apply, corpus stats): sf0.1 vs the 100× permuted
  * corpus (/tmp/sfdocs100, built by graft.tools.ScaleSoak100). All five
  * are corpus-linear by design — the soak pins the constant.
  */
object R7bOpsSoak {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new StringBuilder("{\"soak\":\"r7b_new_ops\",\"rows\":[")
    var first = true
    def run(name: String, dir: String, label: String): Unit = {
      val fn = graft.SparkEntry.queries(name)
      // 3 prewarms (the bench lesson: one leaves the JVM mid-C2-compile
      // — the first soak run of inverted_index read 12 s against a
      // 0.7 s steady state), then median of 3 measured runs
      (1 to 3).foreach(_ => fn(spark, dir).write.format("noop").mode("overwrite").save())
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val s = runs(1)
      println(f"[r7b] $name $label $s%.2f s (runs ${runs.map(r => f"$r%.2f").mkString("/")})")
      if (!first) out.append(",")
      first = false
      out.append(f"""{"query":"$name","sf":"$label","wall_s":$s%.2f,""" +
        f""""runs":[${runs.map(r => f"$r%.2f").mkString(",")}]}""")
    }
    val names = Seq("sim_bm25_topk", "pipeline_inverted_index",
      "pipeline_unimax_mixture", "pipeline_bpe_apply", "pipeline_corpus_stats")
    names.foreach(run(_, "/root/testdata/sf0.1", "sf0.1"))
    names.foreach(run(_, "/tmp/sfdocs100", "100x (500k docs, permuted copies)"))
    out.append("]}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/NEWOPS2_SOAK_r07.json"), out.toString)
    spark.stop()
  }
}
