package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness following the reference's benchto methodology
  * (`testing/trino-benchto-benchmarks/.../tpch.yaml`: prewarm runs +
  * fixed measured runs, concurrency 1, CBO/AQE on): each headline query
  * gets 3+ prewarm + 5 measured runs, median reported. Results are fully
  * materialized through the noop sink (not count(), which lets Spark
  * prune the plan).
  *
  * Why THREE prewarms: the r6→r7 "ppjoin 2.3× regression" investigation
  * showed a single prewarm leaves the JVM mid-C2-compile on queries whose
  * generated kernels (sorted-merge intersect, shingle hashing) dominate:
  * isolated 1-prewarm medians read 2–3× the steady state, and BENCH_r05's
  * 1.81 s for `dedup_jaccard_ppjoin` was an artifact of `dedup_jaccard`
  * (same kernels) running immediately before it in the r5 headline. Three
  * prewarms reach steady state for every headline query; per-run times are
  * recorded in the artifact so any residual warm-up decay is visible
  * rather than silently folded into the median.
  *
  * Artifact hygiene (r6 lesson — BENCH_r06 was taken under external box
  * load and unusable as a gate): the output JSON records /proc/loadavg at
  * start and end, the JVM max heap, and core count, and carries
  * `"load_warning":true` when the 1-minute load exceeds
  * SPARK_GRAFT_BENCH_MAX_LOAD (default 4.0) at start — a dirty artifact
  * now says so in-band instead of requiring forensics.
  */
object Bench {
  // Headline set: one representative per heavy operator family —
  // wide agg, join+topk, star join, pushdown scan, having+join, profit
  // rollup (q9), EXISTS/NOT EXISTS decorrelation (q21), window topN,
  // sessionization, LSH dedup, ANN, BM25 lexical retrieval, explode+agg,
  // distinct agg,
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
    "sim_topk_brute", "sim_bm25_topk",
    "text_token_stats", "mr_funnel", "sketch_hll_merge",
    "sim_tfidf_pairs_abscap",
    // r8: the TPC-DS family gets a headline slot — q67's wide ROLLUP
    // into a rank() window is the heaviest plan shape the slice adds
    "tpcds_q67_rollup_rank",
    // r9: q95 joins — the twice-referenced CTE now executes once via
    // CteMaterialize (8.07 s vs 10.39 s inline at 100×, R9CTE_AB_r09);
    // a headline slot keeps the materialization path's cost visible
    "tpcds_q95_multi_cte")

  private def loadAvg(): (Double, Double, Double) =
    try {
      val parts = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+")
      (parts(0).toDouble, parts(1).toDouble, parts(2).toDouble)
    } catch { case _: Throwable => (-1.0, -1.0, -1.0) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev override: comma-separated subset + run count, e.g. for profiling
    val queryList = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").toSeq).getOrElse(headline)
    // 5 measured runs: the JIT-storm outliers (see SessionDefaults) are
    // rare but heavy (2 s query → 9 s run); a 5-run median absorbs one
    // where a 3-run median can be dragged by it
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val nWarm = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREWARMS", "3").toInt
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "4.0").toDouble

    // Quiet-window retry (r7 verdict): a gate artifact that flags itself
    // dirty should be the exception — when the box is loaded at start,
    // wait for a quiet window (bounded: up to 5 × 60 s) before measuring
    // instead of measuring anyway. Attempts are recorded in the artifact;
    // load_warning remains true only if every retry found the box busy.
    val maxWaits = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_RETRIES", "5").toInt
    var loadStart = loadAvg()
    var loadWaits = 0
    while (loadStart._1 > maxLoad && loadWaits < maxWaits) {
      System.err.println(
        s"[bench] 1-min load ${loadStart._1} > $maxLoad — waiting 60 s for a " +
          s"quiet window (attempt ${loadWaits + 1}/$maxWaits)")
      Thread.sleep(60000)
      loadWaits += 1
      loadStart = loadAvg()
    }
    val loadWarning = loadStart._1 > maxLoad
    if (loadWarning)
      System.err.println(
        s"[bench] WARNING: 1-min load ${loadStart._1} > $maxLoad after " +
          s"$loadWaits waits — artifact flagged load_warning; medians are " +
          "NOT trustworthy as a gate")

    // shuffle partitions default to the core count (right for the sf0.1
    // gate); scale soaks size them to the DATA via the env override —
    // at the 100× corpus 256 partitions alone recovered q5 12.8→3.7 s
    val shuffleParts =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", shuffleParts)
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      val elapsed =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } finally {
          // release plans the query body persisted (pagerank edge list) so a
          // cached entry can't occupy executor memory across the whole bench
          // — OUTSIDE the timed region (r8 verdict: the unpersist RPC was
          // being charged to every query's measurement)
          graft.engine.CachedPlans.releaseAll()
          graft.engine.TempArtifacts.cleanupAll(spark)
        }
      elapsed
    }

    // GC drain placement (r12 adjudication of the r11 gate drift): the r11
    // harness drained INSIDE run()'s finally — a System.gc() on the gate's
    // ~90 GB mostly-idle heap immediately before every measured run. The
    // single-variable drain A/B (drain_ab in BENCH_AB_r12.json: same tree,
    // alternating fresh JVMs, drain on vs off) showed that placement taxes
    // the measured medians ~6–10%: the explicit full GC shrinks/uncommits
    // G1 regions and the next timed run pays the re-expansion. The r10
    // pathology the drain exists for (uncollected RDD refs pinning every
    // run's shuffle files until tens of GB evict the corpus from page
    // cache, R10TPCDS_REQUOTE_r10) accumulates across a SESSION, not
    // within one query's ~8 sf0.1 runs — so drain once per query, BEFORE
    // its prewarms: the ≥3 prewarms that follow absorb the re-expansion
    // and the measured runs never see a fresh full-GC. Escape hatch for
    // harness A/Bs: SPARK_GRAFT_BENCH_NO_DRAIN=1 disables it entirely.
    val noDrain = sys.env.contains("SPARK_GRAFT_BENCH_NO_DRAIN")
    def drainBeforeQuery(): Unit =
      if (!noDrain) graft.tools_dev.SoakHarness.gcDrain()

    // Adaptive prewarm: at least nWarm runs, then keep prewarming while
    // the latest run is still >1.3× the best seen (C2 still compiling or a
    // GC/compile-thread storm in flight), capped at 8. Measured runs then
    // start at steady state regardless of where this query sits in the
    // list — the r5/r6 ppjoin lesson was that a FIXED prewarm count makes
    // the median depend on which queries ran before.
    def prewarm(name: String): Int = {
      var times = (1 to nWarm).map(_ => run(name))
      while (times.length < 8 && times.last > times.min * 1.3)
        times = times :+ run(name)
      times.length
    }
    // Mid-run load guard (r11 verdict, What's-wrong #1): waitForQuiet
    // only gates the START of the bench, but the shared host runs
    // ~10-minute load bursts — BENCH_r11's 1-min load rose 2.45→5.64
    // DURING the run and every query inflated 28-86% while the clean-box
    // check stayed flat. So each query's measured set samples the load
    // before and after; a set whose window overlapped a spike is
    // RE-MEASURED after waiting for quiet (bounded), the spiked runs
    // kept in the artifact as evidence but not quoted. A query is
    // flagged dirty only if every retry found the box busy.
    val maxRequotes =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MID_RUN_RETRIES", "2").toInt
    def measureSet(name: String): (Seq[Double], Double, Double) = {
      val before = loadAvg()._1
      val times = (1 to nRuns).map(_ => run(name))
      (times, before, loadAvg()._1)
    }
    // name -> (median, quoted runs, prewarms, all sets with loads,
    //          quoted set index, dirty)
    final case class QRes(name: String, median: Double, runs: Seq[Double],
      warms: Int, sets: Seq[(Seq[Double], Double, Double)], quotedSet: Int,
      dirty: Boolean)
    def setMed(s: (Seq[Double], Double, Double)): Double = {
      val t = s._1.sorted; t(t.length / 2)
    }
    val results: Seq[QRes] =
      queryList.filter(SparkEntry.queries.contains).map { name =>
        try {
          drainBeforeQuery()
          val warms = prewarm(name)
          var sets = Seq(measureSet(name))
          def spiked(s: (Seq[Double], Double, Double)) =
            s._2 > maxLoad || s._3 > maxLoad
          var waits = 0
          while (spiked(sets.last) && sets.length <= maxRequotes && waits < 3) {
            System.err.println(s"[bench] $name measured under load " +
              s"(${sets.last._2} -> ${sets.last._3}) — waiting for quiet, re-measuring")
            while (loadAvg()._1 > maxLoad && waits < 3) { Thread.sleep(60000); waits += 1 }
            sets = sets :+ measureSet(name)
          }
          // Flat-set adjudication (r14 verdict #4): the load samples
          // bracket a set but can miss a burst inside it — BENCH_r14
          // read 1.30× of its own clean-box check with dirty_queries=0.
          // So the gate now embeds the check's best-of-sets protocol:
          // always measure a second set, keep adding (≤2 extra) while
          // the two smallest medians still disagree by >1.25× (a burst
          // only ever inflates), and quote the minimum-median set. All
          // sets stay in the artifact as evidence.
          sets = sets :+ measureSet(name)
          var extra = 0
          while (extra < 2 && {
            val ms = sets.map(setMed).sorted
            ms(1) > ms(0) * 1.25
          }) {
            System.err.println(s"[bench] $name set medians " +
              s"${sets.map(setMed).map(m => f"$m%.3f").mkString(",")} spread >1.25× — extra set")
            sets = sets :+ measureSet(name); extra += 1
          }
          val quoted = sets.minBy(setMed)
          QRes(name, setMed(quoted), quoted._1, warms,
            sets, sets.indexOf(quoted), spiked(quoted))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            QRes(name, -1.0, Seq.empty, 0, Seq.empty, 0, dirty = false)
        }
      }
    def fmt(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val qs = results.map { r => "\"" + r.name + "\":" + r.median }
      .mkString("{", ",", "}")
    val runsJson = results.map { r =>
      val setsJson = r.sets.map { case (ts, lb, la) =>
        "{\"runs\":[" + ts.map(fmt).mkString(",") + s"],\"load\":[$lb,$la]}"
      }.mkString("[", ",", "]")
      "\"" + r.name + "\":{\"prewarms\":" + r.warms + ",\"runs\":[" +
        r.runs.map(fmt).mkString(",") + s"],\"sets\":$setsJson" +
        s",\"quoted_set\":${r.quotedSet},\"dirty\":${r.dirty}}"
    }.mkString("{", ",", "}")
    val total = results.collect { case r if r.median >= 0 => r.median }.sum
    val loadEnd = loadAvg()
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val dirtyCount = results.count(_.dirty)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""runs":$runsJson,"min_prewarms":$nWarm,""" +
      s""""load_start":[${loadStart._1},${loadStart._2},${loadStart._3}],""" +
      s""""load_end":[${loadEnd._1},${loadEnd._2},${loadEnd._3}],""" +
      s""""load_warning":$loadWarning,"load_wait_attempts":$loadWaits,""" +
      s""""gc_drain_between_runs":false,""" +
      s""""gc_drain_per_query":${!noDrain},"mid_run_load_guard":true,""" +
      s""""flat_set_adjudication":true,""" +
      s""""dirty_queries":$dirtyCount,""" +
      s""""heap_gb":${fmt(heapGb)},"cpus":$cpus,""" +
      s""""sf":"$sfDir"}"""
    println(json)
    // The driver's gate artifact (BENCH_r{N}.json) stores only a
    // 2,000-char TAIL of the run's output, so per-query data was lost
    // each round (r12 verdict #8: only 8 of 20 queries recoverable).
    // Also write the full JSON to a stable path inside the repo so the
    // round harness — and the next round's analysis — can read every
    // query's runs/sets/loads.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_raw/BENCH_FULL_latest.json")),
      json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] full-JSON write failed (non-fatal): ${e.getMessage}")
    }
    spark.stop()
  }
}
