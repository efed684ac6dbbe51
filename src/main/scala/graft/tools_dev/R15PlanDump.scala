package graft.tools_dev

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the product): dump `.explain("formatted")` for a
  * list of declared queries to `plans/r15/<query>_<tag>.txt` — the
  * optimization round's evidence files. Usage:
  *   scripts/run_tool.sh graft.tools_dev.R15PlanDump <tag> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object R15PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r15"))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"plans/r15/${name}_$tag.txt"), plan)
        // summary line: exchange count + join strategies, for quick triage
        val ex = "Exchange".r.findAllIn(plan).length
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin", "CartesianProduct")
          .map(j => s"$j=${j.r.findAllIn(plan).length}")
          .filterNot(_.endsWith("=0")).mkString(" ")
        println(s"[plandump] $name exchanges=$ex $joins")
        graft.engine.CachedPlans.releaseAll()
        graft.engine.TempArtifacts.cleanupAll(spark)
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
