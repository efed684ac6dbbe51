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
    // comments could flip the in-string state mid-scan: bail to the plain
    // path instead of risking a corrupted split (r9 advice)
    assert(CteMaterialize.parse(
      "WITH a AS (SELECT 1 -- a comment with a quote '\n) SELECT * FROM a, a b").isEmpty)
    assert(CteMaterialize.parse(
      "WITH a AS (SELECT 1 /* ' */) SELECT * FROM a, a b").isEmpty)
  }

  test("parser handles backslash-escaped quotes inside string literals") {
    val Some((defs, rest)) = CteMaterialize.parse(
      """WITH a AS (SELECT 'it\'s (' AS s) SELECT s FROM a"""): @unchecked
    assert(defs.head.body == """SELECT 'it\'s (' AS s""")
    assert(rest == "SELECT s FROM a")
  }

  test("refCount counts RELATION positions only (case-insensitive)") {
    // qualifier (base.x) and near-miss identifiers do not count
    assert(CteMaterialize.refCount("base", Seq("FROM base JOIN rebase ON base.x = basex.y")) == 1)
    // FROM / JOIN positions count; a bare mention outside a FROM list does not
    assert(CteMaterialize.refCount("yt", Seq("FROM YT s1 JOIN yt s2", "yt")) == 2)
    // comma-position in a FROM list counts (the q95 second-reference shape)
    assert(CteMaterialize.refCount("m",
      Seq("SELECT l.x FROM lineitem l, m WHERE l.x = m.y")) == 1)
    // an output column sharing the CTE's name does not count (the q77
    // `sales` shape that over-materialized under word-boundary counting)
    assert(CteMaterialize.refCount("sales",
      Seq("SELECT sum(sales) AS sales FROM (SELECT s.sales FROM sales s) x GROUP BY 1")) == 1)
    // select-list commas are not FROM-list commas
    assert(CteMaterialize.refCount("sales",
      Seq("SELECT a, sales, b FROM t")) == 0)
    // a call with the same name is not a relation reference
    assert(CteMaterialize.refCount("f", Seq("SELECT f(x) FROM t JOIN f ON 1=1")) == 1)
    // references never count inside string literals
    assert(CteMaterialize.refCount("a", Seq("SELECT 'FROM a' FROM b")) == 0)
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
    // returnflag='R' probe); the CTE's own scan (the min/max-per-order
    // aggregate since r15-opt) lives inside the single cached plan.
    // InMemoryRelation is a leaf here, so collect does not descend into it.
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

  test("r15 tranche: q31's channel CTEs, q39's flagged set and q64's cross-sales CTE materialize once each") {
    val q31 = SparkEntry.queries("tpcds_q31_ratio_periods")(spark, sfTiny)
    val c31 = q31.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(c31.size == 6, s"expected 6 cache reads (ss x3 + ws x3), got ${c31.size}")
    assert(c31.distinct.size == 2, "ss and ws must each share ONE cached plan")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
    val q39 = SparkEntry.queries("tpcds_q39_cov_selfjoin")(spark, sfTiny)
    val c39 = q39.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(c39.size == 2 && c39.distinct.size == 1,
      s"flagged must execute once for both month sides, got ${c39.size}/${c39.distinct.size}")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
    // q38's 3-ref `base` depends on a RETAINED date_dim: before the r15
    // lazy-view fix its persisted WithCTE plan never matched the cache
    // manager's canonicalized lookup (CTE ref ids are not normalized)
    // and the 4-way join silently executed three times
    val q38 = SparkEntry.queries("tpcds_q38_intersect")(spark, sfTiny)
    val c38 = q38.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(c38.size == 3 && c38.distinct.size == 1,
      s"base must execute once for the three channels, got ${c38.size}/${c38.distinct.size}")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
    val q64 = SparkEntry.queries("tpcds_q64_wide_chain")(spark, sfTiny)
    val c64 = q64.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(c64.size == 2 && c64.distinct.size == 1,
      s"the nine-relation cs chain must execute once, got ${c64.size}/${c64.distinct.size}")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
  }

  test("r15 tranche 4: q2's weekly pivot and q78's returns set materialize once each") {
    val q2 = SparkEntry.queries("tpcds_q2_week_pivot")(spark, sfTiny)
    val c2 = q2.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(c2.size == 2 && c2.distinct.size == 1,
      s"wk must execute once for both year sides, got ${c2.size}/${c2.distinct.size}")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
    // q78's ret is referenced from inside TWO later CTE definitions —
    // the relation-position count must see through the nested bodies
    val q78 = SparkEntry.queries("tpcds_q78_unreturned_ratio")(spark, sfTiny)
    val c78 = q78.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(c78.size == 2 && c78.distinct.size == 1,
      s"ret must execute once for both channels, got ${c78.size}/${c78.distinct.size}")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
    // q49's shared returns CTE feeds all three UNION branches — the
    // single fact scan must execute once, not three times
    val q49 = SparkEntry.queries("tpcds_q49_ranked_union")(spark, sfTiny)
    val c49 = q49.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(c49.size == 3 && c49.distinct.size == 1,
      s"ch must execute once for the three ranked branches, got ${c49.size}/${c49.distinct.size}")
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
  }

  test("materialized CTE path returns the same rows as the inline path") {
    // q95 (2 refs), q11 (4 refs), q38 (3 refs), q72 (date_dim 2 refs),
    // r15 tranche: q23 (scalar-threshold chain), q31 (6 self-join refs),
    // q39 (flagged 2 refs), q64 (cs 2 refs); tranche 4: q1 (ctr read
    // from two CORRELATED scalar subqueries + the main FROM), q2
    // (pivot 2 refs), q78 (ret 2 refs from nested CTE bodies):
    // the rewrite must be invisible in the results
    for (name <- Seq("tpcds_q95_multi_cte", "tpcds_q11_yoy",
        "tpcds_q38_intersect", "tpcds_q72_multijoin",
        "tpcds_q23_cte_scalar", "tpcds_q31_ratio_periods",
        "tpcds_q39_cov_selfjoin", "tpcds_q64_wide_chain",
        "tpcds_q1_correlated_ret", "tpcds_q2_week_pivot",
        "tpcds_q78_unreturned_ratio", "tpcds_q49_ranked_union",
        "tpcds_q54_scalar_between")) {
      val viaCache = SparkEntry.queries(name)(spark, sfTiny)
        .collect().map(_.toString).sorted
      graft.engine.CachedPlans.releaseAll()
      graft.engine.TempArtifacts.cleanupAll(spark)
      val sparkSql = graft.queries.TpcdsQueries.sparkSqlFor(name)
      // Tables.sql now routes through CteMaterialize itself, so the
      // inline arm must use the plain (non-materializing) entry
      val inline = graft.engine.Tables.sqlPlain(spark, sfTiny, sparkSql)
        .collect().map(_.toString).sorted
      assert(viaCache.toSeq == inline.toSeq, s"$name diverged under materialization")
    }
  }

  test("single-relation-reference CTEs stay inline: q14's ch and q77's sales (r9 advice)") {
    for (name <- Seq("tpcds_q14_cross_items", "tpcds_q77_channel_report",
        "tpcds_q17_chain_stats")) {
      val df = SparkEntry.queries(name)(spark, sfTiny)
      val caches = df.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r }
      assert(caches.isEmpty,
        s"$name: expected NO materialized CTEs (each is referenced once as a relation), " +
          s"got ${caches.size}")
      graft.engine.CachedPlans.releaseAll()
      graft.engine.TempArtifacts.cleanupAll(spark)
    }
  }

  test("a CTE shadowing a base table name is retained inline, and the table survives") {
    // WITH lineitem AS (...) referenced twice would previously register a
    // temp view named `lineitem`, shadowing the base table for the rest
    // of the session once cleanupAll dropped it (r9 verdict, Wrong #2)
    val q =
      """WITH lineitem AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 64)
        |SELECT cast(count(*) AS bigint) AS c FROM lineitem a JOIN lineitem b ON a.k = b.k""".stripMargin
    val viaEngine = graft.engine.Tables.sql(spark, sfTiny, q)
    val caches = viaEngine.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r }
    assert(caches.isEmpty, "base-table-named CTE must not materialize as a temp view")
    val expect = graft.engine.Tables.sqlPlain(spark, sfTiny, q).collect().map(_.toString)
    assert(viaEngine.collect().map(_.toString).toSeq == expect.toSeq)
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
    // the REAL lineitem table is still queryable afterwards
    val n = graft.engine.Tables.sql(spark, sfTiny,
      "SELECT count(*) AS c FROM lineitem").collect()(0).getLong(0)
    assert(n > 0, "base lineitem table lost after CTE cleanup")
  }

  test("WITH RECURSIVE passes through the entry and executes natively") {
    // the parser bails on RECURSIVE (asserted above); this pins the whole
    // path: entry text → dialect shims untouched → Spark's native
    // recursive execution. nation is fixed at 25 rows / 5 regions at
    // every SF, so each region's chain walks ALL its nations.
    val df = SparkEntry.queries("sql_recursive_cte")(spark, sfTiny)
    val rows = df.collect()
    assert(rows.length == 5, s"one chain end per region, got ${rows.length}")
    val perRegion = spark.read.parquet(s"$sfTiny/nation.parquet")
      .groupBy("n_regionkey").count().collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    rows.foreach { r =>
      val rk = r.get(0).toString.toLong
      val depth = r.get(1).toString.toLong
      val path = r.getString(2)
      assert(depth == perRegion(rk), s"region $rk depth $depth != ${perRegion(rk)}")
      assert(path.split(">").length.toLong == depth, s"path $path depth $depth")
    }
  }

  test("engine SQL entry applies CTE materialization to arbitrary text (not just the slice)") {
    // a user-shaped WITH through Tables.sql: the CTE referenced twice
    // resolves to one cached plan
    val q =
      """WITH hot AS (
        |  SELECT o_custkey AS cust, sum(o_totalprice) AS tp
        |  FROM orders GROUP BY o_custkey)
        |SELECT cast(count(*) AS bigint) AS c
        |FROM hot a JOIN hot b ON a.cust = b.cust AND a.tp = b.tp""".stripMargin
    val df = graft.engine.Tables.sql(spark, sfTiny, q)
    val caches = df.queryExecution.optimizedPlan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(caches.size == 2, s"expected both hot references cached, got ${caches.size}")
    assert(caches.distinct.size == 1, "both references must share one cached plan")
    val viaPlain = graft.engine.Tables.sqlPlain(spark, sfTiny, q).collect().map(_.toString)
    assert(df.collect().map(_.toString).toSeq == viaPlain.toSeq)
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
  }
}
