package graft

import org.apache.spark.sql.execution.columnar.InMemoryRelation
import graft.sqlcompat.CteMaterialize

/** Single execution for multiply-referenced CTEs (r8 verdict, Missing #1;
  * reference analog: RelationPlanner plans each WITH definition once per
  * reference class). Parser unit tests + the q95 plan pin + result
  * equivalence between the materialized and inline paths.
  */
class CteMaterializeSpec extends GraftSuite {

  test("parser splits a multi-definition WITH and leaves the main query intact") {
    val Some((defs, rest)) = CteMaterialize.parse(
      "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a WHERE x > (1+0)) SELECT * FROM b, a"): @unchecked
    assert(defs.map(_.name) == Seq("a", "b"))
    assert(defs(1).body == "SELECT x FROM a WHERE x > (1+0)")
    assert(rest == "SELECT * FROM b, a")
  }

  test("parser skips parens inside string literals") {
    val Some((defs, rest)) = CteMaterialize.parse(
      "WITH a AS (SELECT '(((' AS s) SELECT s FROM a"): @unchecked
    assert(defs.head.body == "SELECT '(((' AS s")
    assert(rest == "SELECT s FROM a")
  }

  test("parser refuses what it does not understand (fallback, never corruption)") {
    assert(CteMaterialize.parse("SELECT 1").isEmpty)
    assert(CteMaterialize.parse("WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r").isEmpty)
    assert(CteMaterialize.parse("WITH a (c1) AS (SELECT 1) SELECT * FROM a").isEmpty)
  }

  test("refCount is word-boundary and case-insensitive") {
    assert(CteMaterialize.refCount("base", Seq("FROM base JOIN rebase ON base.x = basex.y")) == 2)
    assert(CteMaterialize.refCount("yt", Seq("FROM YT s1 JOIN yt s2", "yt")) == 3)
  }

  test("tpcds_q95: multi_supp executes ONCE — both references share one cached plan") {
    val df = SparkEntry.queries("tpcds_q95_multi_cte")(spark, sfTiny)
    val optimized = df.queryExecution.optimizedPlan
    val caches = optimized.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(caches.size == 2,
      s"expected both multi_supp references to resolve to the cache, got ${caches.size}:\n$optimized")
    assert(caches.distinct.size == 1,
      "the two references must share ONE cached plan (single execution)")
    // outside the cache, lineitem is scanned exactly once (the
    // returnflag='R' probe); the self-join's two scans live inside the
    // single cached plan. InMemoryRelation is a leaf here, so collect
    // does not descend into it.
    val liScans = optimized.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
        if l.output.exists(_.name == "l_orderkey") => l
    }
    assert(liScans.size == 1,
      s"expected exactly one non-cached lineitem scan, got ${liScans.size}:\n$optimized")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
  }

  test("tpcds_q11: the 4-way self-joined year-totals CTE resolves to ONE cached plan") {
    val df = SparkEntry.queries("tpcds_q11_yoy")(spark, sfTiny)
    val caches = df.queryExecution.optimizedPlan.collect {
      case r: InMemoryRelation => r.cacheBuilder
    }
    assert(caches.size == 4, s"expected 4 cache reads (s1/s2/w1/w2), got ${caches.size}")
    assert(caches.distinct.size == 1, "all four references must share one cached plan")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
  }

  test("materialized CTE path returns the same rows as the inline path") {
    // q95 (2 refs), q11 (4 refs), q38 (3 refs), q72 (date_dim 2 refs):
    // the rewrite must be invisible in the results
    for (name <- Seq("tpcds_q95_multi_cte", "tpcds_q11_yoy",
        "tpcds_q38_intersect", "tpcds_q72_multijoin")) {
      val viaCache = SparkEntry.queries(name)(spark, sfTiny)
        .collect().map(_.toString).sorted
      graft.engine.CachedPlans.releaseAll()
      graft.engine.TempArtifacts.cleanupAll(spark)
      val sparkSql = graft.queries.TpcdsQueries.sparkSqlFor(name)
      val inline = graft.engine.Tables.sql(spark, sfTiny, sparkSql)
        .collect().map(_.toString).sorted
      assert(viaCache.toSeq == inline.toSeq, s"$name diverged under materialization")
    }
  }
}
