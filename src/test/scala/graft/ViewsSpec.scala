package graft

import graft.engine.Views

/** View / materialized-view emulation semantics (reference analog:
  * `TestMaterializedViews`-style product tests).
  */
class ViewsSpec extends GraftSuite {

  private val mvQuery =
    "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey"

  test("logical view re-expands the plan on every use") {
    Views.createView(spark, sfTiny, "v_nations", mvQuery)
    val direct = graft.engine.Tables.sql(spark, sfTiny, mvQuery)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val viaView = spark.sql("SELECT * FROM v_nations")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(viaView == direct && direct.nonEmpty)
  }

  test("materialized view persists results and survives refresh") {
    val storage = java.nio.file.Files.createTempDirectory("graft-mv").toString
    Views.createMaterializedView(spark, sfTiny, "mv_nations", mvQuery, storage)
    val direct = graft.engine.Tables.sql(spark, sfTiny, mvQuery)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val mv1 = spark.sql("SELECT * FROM mv_nations")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(mv1 == direct)
    // the MV reads files, not the plan: its physical plan is a scan
    val plan = spark.sql("SELECT * FROM mv_nations").queryExecution.executedPlan.toString
    assert(plan.contains("FileScan") || plan.contains("Scan parquet"), plan)
    Views.refreshMaterializedView(spark, sfTiny, "mv_nations", mvQuery, storage)
    val mv2 = spark.sql("SELECT * FROM mv_nations")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(mv2 == direct)
  }

  test("partition-scoped refresh touches only the selected partition dirs") {
    val storage = java.nio.file.Files.createTempDirectory("graft-mv-inc").toString
    val q = "SELECT n_regionkey, n_nationkey, n_name FROM nation"
    Views.createMaterializedView(spark, sfTiny, "mv_inc", q, storage,
      partitionBy = Seq("n_regionkey"))
    def stamps(): Map[String, Map[String, Long]] = {
      val root = new java.io.File(s"$storage/mv_inc")
      root.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified()).toMap).toMap
    }
    val before = stamps()
    assert(before.size == 5)
    Thread.sleep(1100) // mtime granularity
    val touched = Views.refreshMaterializedViewPartitions(
      spark, sfTiny, "mv_inc", q, storage, "n_regionkey = 3")
    assert(touched == 1L)
    val after = stamps()
    for (p <- before.keys if p != "n_regionkey=3")
      assert(after(p) == before(p), s"partition $p was rewritten")
    assert(after("n_regionkey=3") != before("n_regionkey=3"))
    // the registered view still answers the full, correct result
    assert(spark.sql("SELECT count(*) FROM mv_inc").collect()(0).getLong(0) == 25)
    assert(spark.sql("SELECT count(*) FROM mv_inc WHERE n_regionkey = 3")
      .collect()(0).getLong(0) == 5)
  }

  test("partition-scoped refresh rejects predicates on data columns") {
    val storage = java.nio.file.Files.createTempDirectory("graft-mv-guard").toString
    val q = "SELECT n_regionkey, n_nationkey, n_name FROM nation"
    Views.createMaterializedView(spark, sfTiny, "mv_guard", q, storage,
      partitionBy = Seq("n_regionkey"))
    // a data-column predicate would rewrite touched partitions with only
    // the matching rows, silently dropping the rest — must fail fast
    val e = intercept[IllegalArgumentException](
      Views.refreshMaterializedViewPartitions(
        spark, sfTiny, "mv_guard", q, storage, "n_name = 'NATION_3'"))
    assert(e.getMessage.contains("partition columns"))
    // the MV is untouched
    assert(spark.sql("SELECT count(*) FROM mv_guard").collect()(0).getLong(0) == 25)
  }
}
