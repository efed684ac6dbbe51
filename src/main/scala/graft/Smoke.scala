package graft

import org.apache.spark.sql.SparkSession

/** Smoke entry mirroring the driver's t1 check: run SparkEntry.entry on
  * sf0.001 and report the row count (must be > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=${df.count()}")
    spark.stop()
  }
}
