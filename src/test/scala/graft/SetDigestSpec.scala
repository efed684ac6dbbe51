package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.SetDigest

/** SetDigest accuracy + merge laws (reference
  * `core/trino-main/.../type/setdigest/TestSetDigest.java` territory).
  */
class SetDigestSpec extends GraftSuite {

  private def tokensByLang = {
    Tables.register(spark, sfTiny)
    spark.sql(
      """SELECT lang, explode(split(trim(regexp_replace(lower(text), '\s+', ' ')), ' ')) AS token
        |FROM documents""".stripMargin)
  }

  test("jaccard_index estimate tracks exact Jaccard between languages") {
    val digests = tokensByLang.groupBy("lang")
      .agg(expr("make_set_digest(token)").as("d"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("d")).toMap
    val exactSets = tokensByLang.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val langs = digests.keys.toSeq.sorted
    for (a <- langs; b <- langs if a < b) {
      val exact = {
        val (sa, sb) = (exactSets(a), exactSets(b))
        sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      }
      val est = SetDigest.jaccard(digests(a), digests(b))
      // bottom-k (k=512) standard error ~ 1/sqrt(k) ~ 0.044; allow 4 sigma
      assert(math.abs(est - exact) < 0.18, s"jaccard($a,$b): est=$est exact=$exact")
    }
  }

  test("set_digest_cardinality within HLL error of the true distinct count") {
    val row = tokensByLang.agg(
      expr("make_set_digest(token)").as("d"),
      countDistinct(col("token")).as("nd")).collect().head
    val est = SetDigest.cardinality(row.getAs[Array[Byte]]("d"))
    val truth = row.getLong(1)
    assert(math.abs(est - truth).toDouble / truth < 0.05, s"est=$est truth=$truth")
  }

  test("merge of disjoint-part digests equals the digest of the union (byte-exact)") {
    val whole = tokensByLang.agg(expr("make_set_digest(token)").as("d"))
      .collect().head.getAs[Array[Byte]]("d")
    val parts = tokensByLang.groupBy("lang")
      .agg(expr("make_set_digest(token)").as("d"))
      .collect().map(_.getAs[Array[Byte]]("d"))
    val merged = parts.reduce(SetDigest.merge)
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("merge_set_digest aggregate reproduces the scalar merge") {
    Tables.register(spark, sfTiny)
    val viaAgg = spark.sql(
      """SELECT merge_set_digest(d) AS m FROM (
        |  SELECT lang, make_set_digest(split(trim(regexp_replace(lower(text), '\s+', ' ')), ' ')[0]) AS d
        |  FROM documents GROUP BY lang)""".stripMargin)
      .collect().head.getAs[Array[Byte]]("m")
    assert(SetDigest.cardinality(viaAgg) >= 1)
  }

  test("intersection_cardinality: jaccard times union cardinality") {
    val b1 = new SetDigest.Builder(SetDigest.K)
    val b2 = new SetDigest.Builder(SetDigest.K)
    (1 to 300).foreach(i => b1.add(SetDigest.hashString(s"x$i")))
    (151 to 450).foreach(i => b2.add(SetDigest.hashString(s"x$i")))
    val (d1, d2) = (b1.result(), b2.result())
    val est = SetDigest.intersectionCardinality(d1, d2)
    // true intersection 150, union 450
    assert(math.abs(est - 150) < 40, s"est=$est")
  }
}
