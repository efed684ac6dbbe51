package graft

import graft.engine.Tables

/** Seeded randomized NON-INTERFERENCE sweep of the SQL-entry text
  * machinery: for generated queries Spark can execute natively — plain
  * selects, joins, aggregates, subqueries, and WITH chains with
  * multiply-referenced definitions (which force CteMaterialize to
  * split, refcount, and materialize) — `Tables.sql` must return exactly
  * what a raw `spark.sql` returns over the same views. Anything the
  * dialect shims, the window probes, or the materializer touch when
  * they should not shows up as a row diff here.
  */
class EntryNonInterferenceSpec extends GraftSuite {

  private val rnd = new scala.util.Random(77001L)
  private val dir = sfTiny

  private def rndFilter(): String = rnd.nextInt(4) match {
    case 0 => "n_nationkey % 2 = 0"
    case 1 => "n_regionkey >= 1"
    case 2 => "n_name > 'E'"
    case _ => "n_nationkey < 20"
  }

  private def rndAgg(): String = rnd.nextInt(5) match {
    case 0 => "count(*) AS c"
    case 1 => "sum(n_nationkey) AS c"
    case 2 => "max(n_name) AS c"
    case 3 => "avg(n_nationkey) AS c"
    case _ => "count(DISTINCT n_regionkey) AS c"
  }

  private def rndBase(): String = rnd.nextInt(5) match {
    case 0 => s"SELECT n_nationkey, n_regionkey, n_name FROM nation WHERE ${rndFilter()}"
    case 1 => "SELECT n.n_nationkey, n.n_name, r.r_name FROM nation n " +
      "JOIN region r ON n.n_regionkey = r.r_regionkey"
    case 2 => s"SELECT n_regionkey, ${rndAgg()} FROM nation GROUP BY n_regionkey"
    case 3 => s"SELECT n_nationkey, n_regionkey, n_name FROM nation " +
      s"WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_regionkey <= 2)"
    case _ => "SELECT n_nationkey, n_name, " +
      "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn FROM nation"
  }

  private def rndQuery(): String = rnd.nextInt(6) match {
    case 0 => rndBase()
    case 1 => // single-ref WITH (materializer must leave it inline or be equivalent)
      s"WITH b AS (${rndBase()}) SELECT * FROM b WHERE 1 = 1"
    case 2 => // MULTI-ref WITH: forces the once-per-definition materialization
      s"WITH b AS (${rndBase()}) " +
        "SELECT x.cnt + y.cnt AS t FROM (SELECT count(*) AS cnt FROM b) x " +
        "CROSS JOIN (SELECT count(*) AS cnt FROM b) y"
    case 3 => // chained WITH where the second definition reads the first, twice
      s"WITH a AS (${rndBase()}), b AS (SELECT * FROM a), " +
        "c AS (SELECT * FROM a) " +
        "SELECT (SELECT count(*) FROM b) + (SELECT count(*) FROM c) AS t"
    case 4 => // two select-list windows + a plain final ORDER BY: 'ORDER'
      // appears inside the first OVER clause BEFORE the second OVER, so
      // the r13 loose ORDER..OVER probe fires on a fully native query —
      // the per-block machinery must pass it through untouched
      "SELECT n_nationkey, " +
        "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn, " +
        "sum(n_nationkey) OVER (ORDER BY n_nationkey " +
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s " +
        s"FROM nation WHERE ${rndFilter()} ORDER BY n_nationkey LIMIT 15"
    case _ => // native window + ORDER BY over a plain select alias
      "SELECT n_nationkey, n_name, " +
        "rank() OVER (PARTITION BY n_regionkey ORDER BY n_name) AS rk " +
        "FROM nation ORDER BY rk, n_nationkey"
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("60 random native-executable queries: Tables.sql == raw spark.sql") {
    Tables.register(spark, dir)
    try {
      (0 until 60).foreach { i =>
        val q = rndQuery()
        val viaEntry = rows(Tables.sql(spark, dir, q))
        val native = rows(spark.sql(q))
        assert(viaEntry === native, s"case $i interfered:\n$q")
      }
    } finally {
      // CteMaterialize caches multiply-referenced definition plans; the
      // session is SHARED across suites and Spark's cache manager
      // substitutes InMemoryRelation into any later matching plan
      // fragment (it broke the EXPLAIN specs' operator assertions), so
      // drop them the way the Verify harness does after every query
      graft.engine.CachedPlans.releaseAll()
    }
  }
}
