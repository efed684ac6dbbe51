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

  test("z-order write tightens per-file envelopes in BOTH dimensions") {
    import graft.engine.Writer
    val li = Tables.load(spark, sfTiny, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder")
    val zPath = s"$base/z"; val plainPath = s"$base/plain"
    Writer.writeZOrdered(li, zPath, "l_orderkey", "l_partkey", files = 8)
    li.repartition(8).write.mode("overwrite").parquet(plainPath) // round-robin baseline

    def avgRange(path: String, colName: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      val global = li.agg(org.apache.spark.sql.functions.max(colName)
          .cast("double").minus(org.apache.spark.sql.functions.min(colName).cast("double")))
        .collect().head.getDouble(0)
      val spans = files.map { f =>
        val r = spark.read.parquet(f).agg(
          org.apache.spark.sql.functions.min(colName).cast("double"),
          org.apache.spark.sql.functions.max(colName).cast("double")).collect().head
        (r.getDouble(1) - r.getDouble(0)) / global
      }
      spans.sum / spans.length
    }
    // z-ordered files cover a fraction of each dimension; round-robin
    // files span essentially the whole domain in both
    val zOrder1 = avgRange(zPath, "l_orderkey"); val zOrder2 = avgRange(zPath, "l_partkey")
    val plain1 = avgRange(plainPath, "l_orderkey")
    assert(zOrder1 < 0.6, s"orderkey avg file span $zOrder1")
    assert(zOrder2 < 0.8, s"partkey avg file span $zOrder2")
    assert(plain1 > 0.9, s"baseline should span the domain, got $plain1")
    // rows preserved
    assert(spark.read.parquet(zPath).count() == li.count())
  }
}
