package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TDigest

/** t-digest accuracy + merge behavior (reference
  * `TestTDigestAggregationFunction` territory): the point of tdigest over
  * an equi-width histogram is TAIL accuracy, so the bounds tighten at p99.
  */
class TDigestSpec extends GraftSuite {

  private def prices(dir: String): Array[Double] = {
    Tables.load(spark, dir, "lineitem")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
  }

  private def rankError(sorted: Array[Double], est: Double, q: Double): Double = {
    val below = sorted.count(_ <= est)
    math.abs(below.toDouble / sorted.length - q)
  }

  test("quantile rank error: <= 1% mid-range, <= 0.5% at the p99 tail") {
    val dir = "/root/testdata/sf0.01"
    val sorted = prices(dir)
    val digest = Tables.load(spark, dir, "lineitem")
      .agg(expr("tdigest_agg(l_extendedprice)").as("d"))
      .collect().head.getAs[Array[Byte]]("d")
    for (q <- Seq(0.25, 0.5, 0.75))
      assert(rankError(sorted, TDigest.valueAtQuantile(digest, q), q) <= 0.01,
        s"q=$q err=${rankError(sorted, TDigest.valueAtQuantile(digest, q), q)}")
    for (q <- Seq(0.99, 0.999))
      assert(rankError(sorted, TDigest.valueAtQuantile(digest, q), q) <= 0.005,
        s"tail q=$q err=${rankError(sorted, TDigest.valueAtQuantile(digest, q), q)}")
  }

  test("merged per-group digests match a whole-table digest's quantiles") {
    val dir = "/root/testdata/sf0.01"
    val sorted = prices(dir)
    val merged = Tables.register(spark, dir) match {
      case _ => spark.sql(
        """SELECT merge_tdigest(sk) AS m FROM (
          |  SELECT l_returnflag, tdigest_agg(l_extendedprice) AS sk
          |  FROM lineitem GROUP BY l_returnflag)""".stripMargin)
        .collect().head.getAs[Array[Byte]]("m")
    }
    for (q <- Seq(0.5, 0.95, 0.99))
      assert(rankError(sorted, TDigest.valueAtQuantile(merged, q), q) <= 0.015,
        s"merged q=$q")
  }

  test("digest state stays bounded (<= 2*compression centroids)") {
    val b = new TDigest.Builder(TDigest.Compression)
    (1 to 100000).foreach(i => b.add((i * 2654435761L % 100000).toDouble))
    val (means, _) = TDigest.parse(b.result())
    assert(means.length <= 2 * TDigest.Compression.toInt, s"${means.length} centroids")
    assert(means.sameElements(means.sorted))
  }

  test("reduce_agg folds and combines through a shuffle") {
    Tables.register(spark, sfTiny)
    val rows = spark.sql(
      """SELECT l_returnflag,
        |  reduce_agg(l_quantity, cast(0 AS double), (s, x) -> s + x * x, (a, b) -> a + b) AS sum_sq,
        |  sum(l_quantity * l_quantity) AS direct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) == r.getDouble(2), r.toString))
  }

  test("reduce_agg ignores null inputs and yields null on empty groups") {
    val rows = spark.sql(
      """SELECT reduce_agg(x, 100, (s, x) -> s + x, (a, b) -> a + b) AS total
        |FROM VALUES (cast(null AS int)), (cast(null AS int)) AS t(x)""".stripMargin).collect()
    assert(rows.head.isNullAt(0))
    val rows2 = spark.sql(
      """SELECT reduce_agg(x, 100, (s, x) -> s + x, (a, b) -> a + b) AS total
        |FROM VALUES (1), (cast(null AS int)), (2) AS t(x)""".stripMargin).collect()
    // initial state applies once per partial state; nulls skipped
    assert(!rows2.head.isNullAt(0))
  }
}
