package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.RangeJoin

/** Banded range join: result parity with the nested-loop spelling, and
  * the plan property that justifies it — no NL/cartesian join at any SF.
  */
class RangeJoinSpec extends GraftSuite {

  test("pointInInterval matches the nested-loop BETWEEN join") {
    val ints = Tables.load(spark, sfTiny, "orders").filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"), (col("o_totalprice") * 0.1).as("lo"),
        (col("o_totalprice") * 0.1 + 500.0).as("hi"))
    val pts = Tables.load(spark, sfTiny, "lineitem")
      .select(col("l_linenumber"), col("l_orderkey"), col("l_extendedprice"))
    val banded = RangeJoin.pointInInterval(pts, "l_extendedprice", ints, "lo", "hi", 500.0)
      .select("o_orderkey", "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val nl = pts.join(ints,
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") <= col("hi"))
      .select("o_orderkey", "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded.nonEmpty && banded == nl)
  }

  test("banded plan contains no nested-loop or cartesian join") {
    val df = SparkEntry.queries("join_range_banded")(spark, sfTiny)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }

  test("within finds exactly the |a-b| <= delta pairs, each once") {
    val a = Tables.load(spark, sfTiny, "nation")
      .select(col("n_nationkey").as("ka"), (col("n_nationkey") * 7.0).as("va"))
    val b = Tables.load(spark, sfTiny, "nation")
      .select(col("n_nationkey").as("kb"), (col("n_nationkey") * 11.0 + 3.0).as("vb"))
    val got = RangeJoin.within(a, "va", b, "vb", delta = 10.0, bandWidth = 10.0, "ka", "kb")
      .select("ka", "kb").collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue, r.get(1).asInstanceOf[Number].longValue))
    val expected = for {
      i <- 0L until 25L; j <- 0L until 25L
      if math.abs(i * 7.0 - (j * 11.0 + 3.0)) <= 10.0
    } yield (i, j)
    assert(got.length == got.distinct.length, "duplicate pairs emitted")
    assert(got.toSet == expected.toSet)
  }
}
