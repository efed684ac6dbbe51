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

  test("checksum is order-independent, additive, and duplicate-sensitive") {
    graft.engine.Tables.register(spark, sfTiny)
    // reference semantics (ChecksumAggregationFunction): wrapping SUM of
    // xxhash64(x)*PRIME64, so the value equals the composed spelling...
    val Prime64 = 0x9E3779B185EBCA87L
    val av = spark.sql("SELECT checksum(o_orderkey) FROM orders").collect()(0).getLong(0)
    val hashes = spark.sql("SELECT xxhash64(o_orderkey) FROM orders")
      .collect().map(_.getLong(0))
    assert(av === hashes.map(_ * Prime64).sum) // Scala Long ops wrap too
    // ...is insensitive to row order...
    val shuffled = spark.sql(
      "SELECT checksum(o_orderkey) FROM (SELECT * FROM orders ORDER BY o_totalprice)")
      .collect()(0).getLong(0)
    assert(shuffled === av)
    // ...but NOT to duplicated rows (xor would cancel the pair — the bug
    // this aggregate exists to catch)
    val doubled = spark.sql(
      "SELECT checksum(o_orderkey) FROM (SELECT o_orderkey FROM orders UNION ALL SELECT o_orderkey FROM orders)")
      .collect()(0).getLong(0)
    assert(doubled !== av)
    assert(doubled === av * 2)
    // NULL rows contribute +PRIME64 each, not a constant collapse
    import spark.implicits._
    Seq[Option[Long]](None, None).toDF("v").createOrReplaceTempView("cknulls")
    val nv = spark.sql("SELECT checksum(v) FROM cknulls").collect()(0).getLong(0)
    assert(nv === Prime64 * 2)
  }

  test("geometric_mean poisons to NaN on non-positive inputs") {
    import spark.implicits._
    Seq(1.0, 2.0, 4.0).toDF("v").createOrReplaceTempView("gm_pos")
    val pos = spark.sql("SELECT geometric_mean(v) FROM gm_pos").collect()(0).getDouble(0)
    assert(math.abs(pos - 2.0) < 1e-9)
    // the reference's GeometricMeanAggregations includes x <= 0 (ln -> NaN);
    // Spark's ln would return NULL and avg would silently skip the row
    Seq(1.0, -2.0, 4.0).toDF("v").createOrReplaceTempView("gm_neg")
    assert(spark.sql("SELECT geometric_mean(v) FROM gm_neg").collect()(0).getDouble(0).isNaN)
    Seq(1.0, 0.0, 4.0).toDF("v").createOrReplaceTempView("gm_zero")
    assert(spark.sql("SELECT geometric_mean(v) FROM gm_zero").collect()(0).getDouble(0).isNaN)
    // NULLs are still skipped, not poisoned
    Seq(Some(1.0), None, Some(4.0)).toDF("v").createOrReplaceTempView("gm_null")
    assert(math.abs(spark.sql("SELECT geometric_mean(v) FROM gm_null")
      .collect()(0).getDouble(0) - 2.0) < 1e-9)
  }

  test("merge raises a clear error on a malformed HLL sketch") {
    import spark.implicits._
    Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6)).toDF("s")
      .createOrReplaceTempView("badhll")
    val e = intercept[Exception] {
      spark.sql("SELECT hll_cardinality(merge(s)) FROM badhll").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("malformed HLL sketch")))
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
