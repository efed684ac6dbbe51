package graft

import graft.engine.Dml

/** Copy-on-write DELETE/UPDATE semantics over a scratch parquet table
  * (reference analog: `TestDeleteAndInsert`-style connector tests).
  */
class DmlSpec extends GraftSuite {

  private def scratchTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dml").toString + "/nation"
    graft.engine.Tables.load(spark, sfTiny, "nation")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("DELETE removes matching rows and reports the count") {
    val t = scratchTable()
    val before = spark.read.parquet(t).count()
    val expect = spark.read.parquet(t).filter("n_regionkey = 2").count()
    val deleted = Dml.delete(spark, t, "n_regionkey = 2")
    assert(deleted == expect && expect > 0)
    val after = spark.read.parquet(t)
    assert(after.count() == before - deleted)
    assert(after.filter("n_regionkey = 2").count() == 0)
  }

  test("UPDATE right-hand sides see pre-update values even when the predicate column is assigned") {
    val t = scratchTable()
    // n_regionkey is both in the predicate and assigned; n_name's RHS
    // must still be applied for matched rows (a sequential fold would
    // re-evaluate the predicate against the already-updated n_regionkey)
    val updated = Dml.update(spark, t, "n_regionkey = 2",
      Map("n_regionkey" -> "n_regionkey + 100", "n_name" -> "concat(n_name, '_Y')"))
    val after = spark.read.parquet(t)
    val moved = after.filter("n_regionkey = 102").collect()
    assert(moved.length == updated && updated > 0)
    assert(moved.forall(_.getAs[String]("n_name").endsWith("_Y")))
  }

  test("UPDATE rewrites matching rows with old-row right-hand sides") {
    val t = scratchTable()
    val updated = Dml.update(spark, t, "n_regionkey = 1",
      Map("n_name" -> "concat(n_name, '_X')", "n_regionkey" -> "n_regionkey + 10"))
    assert(updated > 0)
    val after = spark.read.parquet(t)
    // all moved to region 11, names suffixed; RHS saw the OLD n_regionkey
    assert(after.filter("n_regionkey = 1").count() == 0)
    val moved = after.filter("n_regionkey = 11").collect()
    assert(moved.length == updated)
    assert(moved.forall(_.getAs[String]("n_name").endsWith("_X")))
    // untouched rows unchanged
    assert(after.filter("n_regionkey = 0 AND n_name LIKE '%_X'").count() == 0)
  }

  test("MERGE: update + conditional delete + insert in one statement") {
    import spark.implicits._
    val t = scratchTable()
    // source: keys 0..4 exist (matched), 100/101 do not (insert);
    // key 3 routed to the DELETE branch by its extra condition
    val source = Seq((0, "ZERO"), (1, "ONE"), (3, "THREE"),
      (100, "NEW_A"), (101, "NEW_B")).toDF("k", "newname")
    val (updated, deleted, inserted) = Dml.merge(spark, t, source,
      onCond = "n_nationkey = s.k",
      whenMatched = Seq(
        Dml.WhenMatched(Some("s.k = 3"), None), // DELETE
        Dml.WhenMatched(None, Some(Map("n_name" -> "s.newname")))),
      whenNotMatchedInsert = Some(Map(
        "n_nationkey" -> "s.k", "n_name" -> "s.newname", "n_regionkey" -> "0")))
    assert((updated, deleted, inserted) === (2L, 1L, 2L))
    val after = spark.read.parquet(t)
    assert(after.count() === 25 - 1 + 2)
    assert(after.filter("n_nationkey = 0").collect()(0).getAs[String]("n_name") === "ZERO")
    assert(after.filter("n_nationkey = 1").collect()(0).getAs[String]("n_name") === "ONE")
    assert(after.filter("n_nationkey = 3").count() === 0)
    assert(after.filter("n_name = 'NEW_A' AND n_regionkey = 0").count() === 1)
    // unmatched target rows untouched
    assert(after.filter("n_nationkey = 5 AND n_name LIKE 'NATION%'").count() === 1)
  }

  test("MERGE raises when one target row matches multiple source rows") {
    import spark.implicits._
    val t = scratchTable()
    val dupSource = Seq((1, "A"), (1, "B")).toDF("k", "v")
    val e = intercept[IllegalStateException](
      Dml.merge(spark, t, dupSource, "n_nationkey = s.k",
        Seq(Dml.WhenMatched(None, Some(Map("n_name" -> "s.v")))), None))
    assert(e.getMessage.contains("more than one source row"))
  }
}
