package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Dev utility: isolate where sketch_hll_merge / register-based queries
  * spend time — catalog registration vs scan vs the UDAF bridge.
  */
object ProfileHll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hll] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("Tables.register cold")(Tables.register(spark, sfDir))
    time("Tables.register warm")(Tables.register(spark, sfDir))
    time("Tables.register warm2")(Tables.register(spark, sfDir))

    val scan = Tables.load(spark, sfDir, "lineitem").select("l_returnflag", "l_partkey")
    time("scan only prewarm")(noop(scan))
    time("scan only")(noop(scan))

    val builtin = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(approx_count_distinct(col("l_partkey")))
    time("builtin approx_count_distinct prewarm")(noop(builtin))
    time("builtin approx_count_distinct")(noop(builtin))

    def q = spark.sql(
      """SELECT hll_cardinality(merge_hll(sketch)) AS nd_merged
        |FROM (SELECT l_returnflag, approx_set_agg_long(l_partkey) AS sketch
        |      FROM lineitem GROUP BY l_returnflag)""".stripMargin)
    time("udaf hll prewarm")(noop(q))
    time("udaf hll run1")(noop(q))
    time("udaf hll run2")(noop(q))
    time("udaf hll run3")(noop(q))

    // the full query as the bench sees it (register + sql each time)
    def full = { Tables.register(spark, sfDir); spark.sql(
      """SELECT hll_cardinality(merge_hll(sketch)) AS nd_merged
        |FROM (SELECT l_returnflag, approx_set_agg_long(l_partkey) AS sketch
        |      FROM lineitem GROUP BY l_returnflag)""".stripMargin) }
    time("full query run1")(noop(full))
    time("full query run2")(noop(full))
    spark.stop()
  }
}
