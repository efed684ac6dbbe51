package graft

import graft.sqlcompat.Dialect

/** Dialect shim specs: Trino grammar forms Spark's parser rejects. */
class DialectSpec extends GraftSuite {

  test("FETCH FIRST n ROWS WITH TIES rewrites to a rank filter") {
    val out = Dialect.rewrite(
      "SELECT a, b FROM t ORDER BY b DESC FETCH FIRST 3 ROWS WITH TIES")
    assert(out.contains("rank() OVER (ORDER BY b DESC)"))
    assert(out.contains("__graft_rank <= 3"))
  }

  test("FETCH FIRST n ROWS ONLY rewrites to LIMIT") {
    assert(Dialect.rewrite("SELECT a FROM t ORDER BY a FETCH FIRST 7 ROWS ONLY")
      .endsWith("LIMIT 7"))
  }

  test("plain SQL passes through untouched") {
    val sql = "SELECT a FROM t WHERE b LIKE '%fetch first%'"
    assert(Dialect.rewrite(sql) == sql)
  }

  test("WITH TIES end-to-end keeps all tied rows") {
    val df = spark.sql(Dialect.rewrite(
      """SELECT * FROM VALUES (1, 'x'), (2, 'x'), (3, 'y'), (4, 'z') AS t(id, grp)
        |ORDER BY grp FETCH FIRST 1 ROWS WITH TIES""".stripMargin))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("TRY yields NULL on ANSI errors and passes values through") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT try(cast('zz' AS int)) a, try(1 div 0) b, try(40 + 2) c").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getInt(2) == 42)
  }
}
