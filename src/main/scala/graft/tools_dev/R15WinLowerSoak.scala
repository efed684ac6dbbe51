package graft.tools_dev

import org.apache.spark.sql.SparkSession
import SoakHarness._

/** 100× scale quote for the WindowFrames lowering (r14 verdict #5):
  * `win_sql_ignore_nulls` (4 lowered IGNORE-NULLS / GROUPS / EXCLUDE
  * windows + total-order ORDER BY) and `win_sql_exclude_stddev`
  * (variance family under GROUPS EXCLUDE) over the 15M-row 100× orders
  * table — the first scale quote of the lowering path (every prior 100×
  * quote was a pipeline query). Partition cardinality is o_orderstatus
  * (3), so partitions are ~5M rows: exactly the shape that exposes a
  * cliff if the lowering's per-frame recompute holds more than a
  * partition's frame state. One prewarm + 3 measured per session; run
  * several fresh-JVM sessions and quote the flattest per the repo's
  * burst discipline.
  */
object R15WinLowerSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sftpch100")
    val session2 = args.lift(1).getOrElse("s1")
    val (loadStart, _, warn) = waitForQuiet()
    val spark = session(shuffleParts = "64")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      graft.engine.CachedPlans.releaseAll()
      graft.engine.TempArtifacts.cleanupAll(spark)
      w
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    for (name <- Seq("win_sql_ignore_nulls", "win_sql_exclude_stddev")) {
      gcDrain()
      val pre = run(name)
      // drain BETWEEN runs, outside the timed wall (r10 soak discipline:
      // each 15M-row run pins its shuffle files until a GC collects the
      // RDD refs; without the drain the walls grow within the session)
      val runs = (1 to 3).map { _ => gcDrain(); run(name) }
      println(f"[r15winlower] $session2 $name prewarm=$pre%.2f runs=${runs.map(r => f"$r%.2f").mkString(",")} load=$load1%.1f")
      out += s""""$name":{"prewarm":${f"$pre%.3f"},"runs":[${runs.map(r => f"$r%.3f").mkString(",")}]}"""
    }
    println(s"""[r15winlower-json] {"session":"$session2",${out.mkString(",")},"load_start":${f"$loadStart%.2f"},"load_end":${f"$load1%.2f"},"load_warning":$warn,"dir":"$dir"}""")
    spark.stop()
  }
}
