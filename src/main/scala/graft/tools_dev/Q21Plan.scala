package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev-only: print tpch_q21's AQE-final plan under a given coalescing
  * setting (r7 bench investigation). */
object Q21Plan {
  def main(args: Array[String]): Unit = {
    val coalesce = sys.env.getOrElse("PROBE_COALESCE", "false")
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.enabled", coalesce))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("tpch_q21")(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    println("=== PLAN coalesce=" + coalesce)
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
