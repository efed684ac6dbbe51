package graft

import graft.engine.TempArtifacts

/** The runner-driven cleanup contract (r8 verdict #3): query bodies
  * register temp dirs / views / tables; runners clean up after each
  * action; cleanup is idempotent and never throws.
  */
class TempArtifactsSpec extends GraftSuite {

  test("dirs are deleted and views dropped by cleanupAll; tables only on opt-in") {
    val d = TempArtifacts.dir("graft-spec")
    assert(new java.io.File(d).isDirectory)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "x.txt"), "payload")
    import spark.implicits._
    Seq(1, 2).toDF("v").createOrReplaceTempView(TempArtifacts.view("graft_spec_view"))
    assert(spark.catalog.tableExists("graft_spec_view"))
    spark.sql("DROP TABLE IF EXISTS graft_spec_tbl")
    Seq(3).toDF("v").write.saveAsTable(TempArtifacts.table("graft_spec_tbl"))

    TempArtifacts.cleanupAll(spark) // default: dirs + views, NOT tables
    assert(!new java.io.File(d).exists, "temp dir must be deleted recursively")
    assert(!spark.catalog.tableExists("graft_spec_view"), "temp view must be dropped")
    assert(spark.catalog.tableExists("graft_spec_tbl"),
      "catalog tables survive per-query cleanup (a later invocation may read the store)")

    TempArtifacts.cleanupAll(spark, dropTables = true)
    assert(!spark.catalog.tableExists("graft_spec_tbl"),
      "end-of-session cleanup drops tracked tables")
    // idempotent, nothing registered — must not throw
    TempArtifacts.cleanupAll(spark, dropTables = true)
  }
}
