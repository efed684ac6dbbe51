package graft.tools_dev
import org.apache.spark.sql.SparkSession
/** Dev scratch probe for round-15 queries (not part of the product). */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = graft.queries.FunctionQueries.queries(args(0))(spark, "/root/testdata/sf0.01")
      df.show(3, false)
    } catch { case e: Throwable =>
      var t: Throwable = e
      while (t != null) { println("CAUSE: " + t.getClass.getName + ": " + String.valueOf(t.getMessage).take(800)); t = t.getCause }
    }
    spark.stop()
  }
}
