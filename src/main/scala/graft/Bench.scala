package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness following the reference's benchto methodology
  * (`testing/trino-benchto-benchmarks/.../tpch.yaml`: prewarm runs +
  * fixed measured runs, concurrency 1, CBO/AQE on): each headline query
  * gets 1 prewarm + 3 measured runs, median reported. Results are fully
  * materialized through the noop sink (not count(), which lets Spark
  * prune the plan).
  */
object Bench {
  // Headline set: one representative per heavy operator family —
  // wide agg, join+topk, star join, pushdown scan, having+join, profit
  // rollup (q9), EXISTS/NOT EXISTS decorrelation (q21), window topN,
  // sessionization, LSH dedup, ANN, explode+agg, distinct agg,
  // abscap TF-IDF pair join, df-ordered PPJoin exact dedup (the scale
  // path for exact near-dup). Every slot is a scale-path plan: the
  // measured-quadratic variants (size-band dedup_jaccard, relative-cap
  // sim_tfidf_pairs) stay oracle-verified correctness rows but are NOT
  // benched as headline — a documented-quadratic plan has no place in
  // the set a 2×-gate is judged on (r5 verdict).
  private val headline = Seq(
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9", "tpch_q18",
    "tpch_q21", "agg_multi_distinct", "win_topn_per_group", "evt_sessionize",
    "dedup_minhash_lsh", "dedup_jaccard_ppjoin",
    "sim_topk_brute",
    "text_token_stats", "mr_funnel", "sketch_hll_merge",
    "sim_tfidf_pairs_abscap")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev override: comma-separated subset + run count, e.g. for profiling
    val queryList = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").toSeq).getOrElse(headline)
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = queryList.filter(SparkEntry.queries.contains).map { name =>
      try {
        run(name) // prewarm (plan + code caches warm, JIT primed)
        val times = (1 to nRuns).map(_ => run(name)).sorted
        name -> times(times.length / 2) // median
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
