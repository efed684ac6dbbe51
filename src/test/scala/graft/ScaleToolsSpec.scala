package graft

import org.apache.spark.sql.functions._
import graft.engine.{Skew, Tables, Writer}

/** Skew + writer utilities: results must equal their unsalted/unbucketed
  * equivalents, and written layouts must prune correctly.
  */
class ScaleToolsSpec extends GraftSuite {

  test("saltedAggregate equals plain aggregation") {
    val li = Tables.load(spark, sfTiny, "lineitem")
    val plain = li.groupBy(col("l_returnflag")).agg(
      sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(li, col("l_returnflag"), salts = 8,
      partialAggs = Seq(sum("l_quantity").as("pq"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("pq").as("q"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted.map(t => (t._1, math.round(t._2), t._3)) ==
      plain.map(t => (t._1, math.round(t._2), t._3)))
  }

  test("saltedJoin equals plain join") {
    val orders = Tables.load(spark, sfTiny, "orders").limit(2000)
    val customer = Tables.load(spark, sfTiny, "customer")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .count()
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey", salts = 4)
      .count()
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("partitioned write lays out hive partitions and prunes on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_w").toString
    val orders = Tables.load(spark, sfTiny, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    Writer.writePartitioned(orders, s"$dir/orders_p", Seq("o_year"))
    val back = spark.read.parquet(s"$dir/orders_p")
    assert(back.count() == orders.count())
    val pruned = back.filter(col("o_year") === 1997)
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan (PartitionFilters, not a post-filter)
    assert(scan.contains("PartitionFilters") || scan.contains("o_year"), scan)
    assert(pruned.count() == orders.filter(col("o_year") === 1997).count())
  }
}
