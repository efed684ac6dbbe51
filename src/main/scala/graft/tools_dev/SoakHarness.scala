package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shared soak discipline (r8 verdict #6: the bench got a quiet-window
  * retry in r7; soaks kept measuring on loaded boxes — R8OPS_SOAK was
  * taken at load 8.7). Every r9+ soak artifact goes through this object:
  *
  *  - [[waitForQuiet]]: bounded wait for 1-min load below a threshold
  *    before measuring (same protocol as `graft.Bench`), recorded
  *    in-band so a dirty artifact says so.
  *  - [[timed]]: ≥3 prewarms + median of ≥3 measured runs — the
  *    JVM-warm-up discipline (a single prewarm leaves kernels
  *    mid-C2-compile; first measures read 3–18× steady state).
  *  - [[SpillStats]]: per-window shuffle/aggregation spill bytes from a
  *    stage-completion listener, for the forced-spill soak (reference
  *    analog: `TestDistributedSpilledQueries` runs every blocking
  *    operator under spill and checks answers stay green).
  */
object SoakHarness {

  def load1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Wait (up to `retries` × 60 s) for the 1-min load to drop below
    * `maxLoad`. Returns (load at measurement start, waits used, warning).
    */
  def waitForQuiet(maxLoad: Double = 4.0, retries: Int = 5): (Double, Int, Boolean) = {
    var l = load1
    var waits = 0
    while (l > maxLoad && waits < retries) {
      System.err.println(f"[soak] 1-min load $l%.2f > $maxLoad — waiting 60 s " +
        s"(attempt ${waits + 1}/$retries)")
      Thread.sleep(60000)
      waits += 1
      l = load1
    }
    if (l > maxLoad)
      System.err.println(f"[soak] WARNING: load $l%.2f still > $maxLoad after " +
        s"$waits waits — artifact will carry load_warning")
    (l, waits, l > maxLoad)
  }

  def session(shuffleParts: String = "256", cores: String = "32"): SparkSession = {
    val s = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", shuffleParts)))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  final case class Timed(median: Double, runs: Seq[Double])

  /** ≥3 prewarms then median of ≥3 measured runs. `runs` is kept in
    * EXECUTION order (r9 finding: within-session degradation shows up as
    * drift across the sequence — sorting before storing destroyed the
    * signal); the median is taken from a sorted copy. The body must be
    * the FULL action (construction + materialization).
    */
  def timed(prewarms: Int = 3, measured: Int = 3)(body: => Unit): Timed = {
    (1 to prewarms).foreach(_ => body)
    val runs = (1 to measured).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val sorted = runs.sorted
    Timed(sorted(sorted.length / 2), runs)
  }

  /** [[timed]] with an UNTIMED `between` hook after every iteration —
    * for bodies that need per-run cleanup (unpersist RPCs, temp-dir
    * deletion) whose cost must not be charged to the measured wall
    * (r9 advisory: the r9 soak tools ran cleanup inside the timed body,
    * the exact accounting bug Bench.scala had already fixed). Cleanup
    * still runs BETWEEN iterations, not after the batch: without it a
    * CTE-materializing query would hit its own still-cached plan on the
    * next run and measure a cache read instead of the query.
    */
  def timedWith(prewarms: Int = 3, measured: Int = 3)(body: => Unit)(between: => Unit): Timed = {
    (1 to prewarms).foreach { _ => body; between }
    val runs = (1 to measured).map { _ =>
      val t0 = System.nanoTime(); body
      val t = (System.nanoTime() - t0) / 1e9
      between; t
    }
    val sorted = runs.sorted
    Timed(sorted(sorted.length / 2), runs)
  }

  /** Force a collection and give ContextCleaner a beat to drain — the
    * between-runs hygiene the r10 q67 A/B isolated: on an oversized
    * mostly-idle measurement heap (48 GB for one query) the JVM almost
    * never collects, so each run's multi-GB shuffle files stay pinned by
    * unreferenced-but-uncollected RDDs, ContextCleaner cannot delete
    * them, tens of GB accumulate and evict the corpus from page cache —
    * q67 at 100× degraded 85/81/57/22/37 s across one session without
    * this, and held 9–16 s with it (`R10TPCDS_REQUOTE_r10.json`). A
    * production service GCs continuously under allocation pressure; a
    * measurement loop does not, so the drain belongs BETWEEN runs,
    * outside the timed wall.
    */
  def gcDrain(): Unit = { System.gc(); Thread.sleep(1500) }

  /** Cumulative spill counters from completed stages. Spark's listener
    * bus is async: [[snapshot]] sleeps briefly so trailing stage events
    * drain — the numbers gate on nonzero/rough-magnitude, not exactness.
    */
  final class SpillStats extends SparkListener {
    @volatile var memorySpilled = 0L
    @volatile var diskSpilled = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) synchronized {
        memorySpilled += m.memoryBytesSpilled
        diskSpilled += m.diskBytesSpilled
      }
    }
    def reset(): Unit = synchronized { memorySpilled = 0L; diskSpilled = 0L }
    def snapshot(): (Long, Long) = { Thread.sleep(500); (memorySpilled, diskSpilled) }
  }

  def attachSpillStats(spark: SparkSession): SpillStats = {
    val l = new SpillStats
    spark.sparkContext.addSparkListener(l)
    l
  }

  def writeArtifact(path: String, json: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    println(s"[soak] wrote $path")
  }
}
