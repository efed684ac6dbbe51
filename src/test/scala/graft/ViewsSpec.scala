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
}
