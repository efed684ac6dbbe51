package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Dev-only probe for the ppjoin variance investigation (r7): runs
  * `dedup_jaccard_ppjoin` repeatedly under a configurable session and
  * prints per-run wall time plus aggregate task metrics (spill, GC, peak
  * execution memory, max single-task time) so a 30 s outlier can be
  * attributed to spill vs GC vs skew vs JIT rather than guessed at.
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = sys.env.getOrElse("PROBE_AQE", "true")
    val query = sys.env.getOrElse("PROBE_QUERY", "dedup_jaccard_ppjoin")
    val n = sys.env.getOrElse("PROBE_RUNS", "8").toInt
    var builder = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.adaptive.enabled", aqe))
    // extra session conf, e.g. PROBE_CONF="spark.sql.adaptive.coalescePartitions.enabled=false"
    sys.env.get("PROBE_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder = builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val spill = new LongAdder; val gc = new LongAdder
    val tasks = new LongAdder; val maxTask = new AtomicLong
    val cpuNs = new LongAdder; val runNs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
          gc.add(m.jvmGCTime)
          cpuNs.add(m.executorCpuTime)
          runNs.add(m.executorRunTime * 1000000L)
          tasks.increment()
          maxTask.accumulateAndGet(m.executorRunTime, math.max)
        }
      }
    })

    // optional in-process stack sampler (PROBE_SAMPLE=true): histograms
    // the top frames of executor task threads every 10 ms — crude
    // attach-free profiling for the per-task fixed-cost investigation
    val sampleTop = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    if (sys.env.get("PROBE_SAMPLE").contains("true")) {
      val t = new Thread(() => {
        while (true) {
          val all = Thread.getAllStackTraces
          all.forEach { (th, frames) =>
            if (th.getName.startsWith("Executor task launch") && frames.nonEmpty) {
              val sig = frames.take(3).map(f => f.getClassName + "." + f.getMethodName).mkString(" <- ")
              sampleTop.merge(sig, 1L, (a, b) => a + b)
            }
          }
          Thread.sleep(10)
        }
      })
      t.setDaemon(true); t.start()
    }

    for (i <- 1 to n) {
      spill.reset(); gc.reset(); tasks.reset(); maxTask.set(0)
      cpuNs.reset(); runNs.reset()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener is async; give it a beat to drain
      Thread.sleep(300)
      println(f"run $i%2d wall=$wall%7.2fs tasks=${tasks.sum}%5d " +
        f"spill=${spill.sum / 1048576}%6dMB gc=${gc.sum / 1000.0}%6.2fs " +
        f"taskRun=${runNs.sum / 1e9}%8.2fs taskCpu=${cpuNs.sum / 1e9}%8.2fs " +
        f"maxTask=${maxTask.get / 1000.0}%7.2fs")
    }
    if (!sampleTop.isEmpty) {
      import scala.jdk.CollectionConverters._
      println("=== stack sample histogram (top frames of executor threads)")
      sampleTop.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) =>
        println(f"$v%6d  $k")
      }
    }
    spark.stop()
  }
}
