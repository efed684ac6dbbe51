package graft.tools_dev

import SoakHarness._

/** Merge-behind aging soak (r10 verdict, Missing #3 "done" criterion):
  * consume latency must stay FLAT as the stream ages — i.e. as
  * merge-behind keeps folding processed micro-batches into the
  * persisted store, the per-batch consume cost must not grow with the
  * number of merges absorbed.
  *
  * Protocol: build the store over the 100× corpus with slots 90-99 held
  * out, then alternate [measure consume of slot 99] / [merge-behind two
  * more slots] — ages 0, 2, 4, 6 merges. The measured body is
  * `indexConsumeDocs`, which IS the per-batch call
  * `IndexedDedupStream` runs inside foreachBatch (the streaming wrapper
  * adds MemoryStream plumbing, not plan shape), and the merges run
  * `indexMergeDocs(stats = false)` — the same call the stream's
  * merge-behind hook makes. Each age point: 3 prewarms + median of 3,
  * cleanup + gc drain between runs outside the timed wall.
  *
  * Expectation from r10: append fanout costs ~9% at 6 merges
  * (`R10MERGE_SOAK_r10.json` consume-after-merges 9.9 s vs the 9.1 s
  * fresh-store steady state) — flat means within session noise of that.
  */
object R11StreamSoak {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sfdocs100"
    require(new java.io.File(s"$dir/documents.parquet").exists,
      s"$dir missing - run graft.tools.ScaleSoak100 first")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session()
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val P = graft.queries.PipelineQueries

    P.incrementalIndexBuild(spark, dir, 100, heldOut = (90 to 99))

    def consumePoint(): Timed = timedWith() {
      P.incrementalIndexConsume(spark, dir, 100, selMod = 99)
        .write.format("noop").mode("overwrite").save()
    } {
      graft.engine.CachedPlans.releaseAll()
      gcDrain()
    }

    val points = scala.collection.mutable.ArrayBuffer[(Int, Timed)]()
    points += ((0, consumePoint()))
    Seq(Seq(90, 91), Seq(92, 93), Seq(94, 95)).zipWithIndex.foreach {
      case (slots, i) =>
        slots.foreach { slot =>
          P.incrementalIndexMerge(spark, dir, 100, mergeMod = slot,
            stats = false).collect()
          gcDrain()
        }
        points += (((i + 1) * 2, consumePoint()))
    }
    points.foreach { case (age, t) =>
      println(f"[r11stream] consume after $age merges: median ${t.median}%.2f s " +
        s"(runs ${t.runs.map(r => f"$r%.2f").mkString("/")})")
    }
    val medians = points.map(_._2.median)
    val growth = medians.last / medians.head

    writeArtifact("/root/repo/R11STREAM_SOAK_r11.json",
      s"""{"soak":"r11_merge_behind_aging","corpus":"$dir (500k docs)","increment":"1pct per slot",""" +
        s""""protocol":"store built with slots 90-99 held out; alternate [consume slot 99: 3 prewarms + median of 3] / [merge-behind 2 more slots via indexMergeDocs(stats=false), the streaming hook's exact call]; ages 0/2/4/6 merges; cleanup + gc drain between runs outside timed walls",""" +
        s""""consume_by_age":{${points.map { case (a, t) =>
          f""""$a":{"median_s":${t.median}%.2f,"runs":[${t.runs.map(r => f"$r%.2f").mkString(",")}]}"""
        }.mkString(",")}},""" +
        f""""age6_vs_age0":$growth%.3f,""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        f""""heap_gb":$heapGb%.1f,"load_end":${load1}%.2f}""")

    Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
