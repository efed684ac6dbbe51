package graft

/** The reference's aggregate SQL names (org.apache.spark.sql.graft.
  * MapAggs): histogram / map_agg / multimap_agg / merge /
  * numeric_histogram / checksum / geometric_mean / approx_set — all as
  * registered functions resolving from plain SQL, distributing over
  * repartitioned input.
  */
class MapAggsSpec extends GraftSuite {

  test("histogram counts per value, distributed") {
    import spark.implicits._
    (1 to 100).map(i => ("k" + (i % 3)).toString).toDF("v").repartition(4)
      .createOrReplaceTempView("hist_in")
    val m = spark.sql("SELECT histogram(v) AS h FROM hist_in")
      .collect()(0).getMap[String, Long](0)
    assert(m("k0") === 33L && m("k1") === 34L && m("k2") === 33L)
  }

  test("map_agg keeps one value per key; multimap_agg keeps all") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (1, "c"), (3, "d"), (1, "e"))
      .toDF("k", "v").repartition(3).createOrReplaceTempView("kv_in")
    val kv = spark.sql("SELECT map_agg(k, v) AS m FROM kv_in")
      .collect()(0).getMap[Int, String](0)
    assert(kv.keySet === Set(1, 2, 3))
    assert(Set("a", "c", "e").contains(kv(1)) && kv(2) === "b" && kv(3) === "d")
    val mm = spark.sql(
      "SELECT transform_values(multimap_agg(k, v), (k, v) -> array_sort(v)) AS m FROM kv_in")
      .collect()(0).getMap[Int, Seq[String]](0)
    assert(mm(1) === Seq("a", "c", "e") && mm(2) === Seq("b") && mm(3) === Seq("d"))
  }

  test("merge dispatches on the sketch type: HLL binary and qdigest array") {
    import spark.implicits._
    (1 to 2000).map(i => (i % 4, i.toLong)).toDF("g", "v").repartition(4)
      .createOrReplaceTempView("merge_in")
    // merge over per-group HLLs must equal one flat sketch's estimate
    val viaMerge = spark.sql(
      """SELECT hll_cardinality(merge(s)) FROM
        |  (SELECT g, approx_set(v) AS s FROM merge_in GROUP BY g)""".stripMargin)
      .collect()(0).getLong(0)
    val flat = spark.sql("SELECT hll_cardinality(approx_set(v)) FROM merge_in")
      .collect()(0).getLong(0)
    assert(viaMerge === flat)
    assert(math.abs(viaMerge - 2000) <= 100) // 5% band
    // qdigest: merged median within the deterministic eps*n rank bound
    val q = spark.sql(
      """SELECT value_at_quantile(merge(s), 0.5d) FROM
        |  (SELECT g, qdigest_agg(v) AS s FROM merge_in GROUP BY g)""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(q - 1000) <= 40)
  }

  test("checksum is order-independent and equals the xor-of-xxhash composition") {
    graft.engine.Tables.register(spark, sfTiny)
    val av = spark.sql("SELECT checksum(o_orderkey) FROM orders").collect()(0).getLong(0)
    val bv = spark.sql("SELECT bit_xor(xxhash64(o_orderkey)) FROM orders").collect()(0).getLong(0)
    assert(av === bv)
    val shuffled = spark.sql(
      "SELECT checksum(o_orderkey) FROM (SELECT * FROM orders ORDER BY o_totalprice)")
      .collect()(0).getLong(0)
    assert(shuffled === av)
  }

  test("numeric_histogram is exact below capacity and bounded above it") {
    import spark.implicits._
    (1 to 1000).map(_.toDouble).toDF("v").repartition(4)
      .createOrReplaceTempView("nh_in")
    val m = spark.sql("SELECT numeric_histogram(10, v) AS h FROM nh_in")
      .collect()(0).getMap[Double, Double](0)
    assert(m.size === 10)
    assert(math.abs(m.values.sum - 1000.0) < 1e-6) // total weight preserved
    val centroidMean = m.map { case (x, w) => x * w }.sum / m.values.sum
    assert(math.abs(centroidMean - 500.5) < 1.0) // weighted mean preserved
  }
}
