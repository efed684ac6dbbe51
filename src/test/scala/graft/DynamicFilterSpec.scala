package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Dynamic filtering + statistics — the reference's DynamicFilterSource
  * (`core/trino-main/.../operator/DynamicFilterSourceOperator.java`) and
  * StatisticsWriter (ANALYZE) analogs, which in this engine are Spark's
  * dynamic partition pruning, runtime bloom-filter join pushdown, and
  * ANALYZE TABLE feeding the CBO. The r2 verdict flagged both rows
  * "untested explicitly" — these specs pin that the engine configuration
  * actually engages them.
  */
class DynamicFilterSpec extends GraftSuite {

  test("dynamic partition pruning fires on a partitioned fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.load(spark, sfTiny, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("orders_part")
    Tables.register(spark, sfTiny)
    val df = spark.sql(
      """SELECT count(*) AS n FROM orders_part o
        |JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders WHERE o_orderkey < 100) d
        |  ON o.o_orderstatus = d.st""".stripMargin)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected DynamicPruning in:\n$plan")
  }

  test("runtime bloom filter is injected into a selective shuffle join") {
    val prev = spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val li = Tables.load(spark, sfTiny, "lineitem")
      val ords = Tables.load(spark, sfTiny, "orders").filter(col("o_totalprice") > 300000.0)
      val df = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter"),
        s"expected a runtime bloom filter in:\n$optimized")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      prev.foreach(spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", _))
    }
  }

  test("ANALYZE TABLE computes stats the CBO can read") {
    val loc = java.nio.file.Files.createTempDirectory("graft_stats").toString
    spark.sql("DROP TABLE IF EXISTS graft_stats_t")
    Tables.register(spark, sfTiny)
    spark.sql(
      s"CREATE TABLE graft_stats_t USING parquet LOCATION '$loc/t' AS " +
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders")
    spark.sql("ANALYZE TABLE graft_stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.conf.set("spark.sql.cbo.enabled", "true") // rowCount surfaces only under CBO
    val stats = spark.table("graft_stats_t").queryExecution.optimizedPlan.stats
    assert(stats.rowCount.isDefined && stats.rowCount.get.toLong > 0, stats.toString)
    val desc = spark.sql("DESCRIBE EXTENDED graft_stats_t o_orderkey")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("distinct_count").exists(_.toLong > 0), desc.toString)
    spark.sql("DROP TABLE graft_stats_t")
  }
}
