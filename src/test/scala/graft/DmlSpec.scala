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

  private def partitionedScratch(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dml-part").toString + "/nation"
    graft.engine.Tables.load(spark, sfTiny, "nation")
      .write.partitionBy("n_regionkey").mode("overwrite").parquet(dir)
    dir
  }

  /** (path → mtime) for every data file under each partition dir. */
  private def fileStamps(table: String): Map[String, Map[String, Long]] = {
    val root = new java.io.File(table)
    root.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified()).toMap
      }.toMap
  }

  test("partitioned DELETE rewrites only the touched partitions") {
    val t = partitionedScratch()
    val before = fileStamps(t)
    assert(before.size == 5) // one dir per region
    val expect = spark.read.parquet(t).filter("n_regionkey = 2").count()
    Thread.sleep(1100) // mtime granularity
    val deleted = Dml.delete(spark, t, "n_regionkey = 2")
    assert(deleted == expect && expect > 0)
    val after = fileStamps(t)
    // untouched partitions: identical file paths AND identical mtimes
    for (p <- before.keys if p != "n_regionkey=2")
      assert(after(p) == before(p), s"partition $p was rewritten")
    assert(spark.read.parquet(t).filter("n_regionkey = 2").count() == 0)
    assert(spark.read.parquet(t).count() == 25 - expect)
  }

  test("partitioned UPDATE with a data predicate touches only matching partitions") {
    val t = partitionedScratch()
    val before = fileStamps(t)
    // NATION_7 lives in exactly one region partition (7 % 5 = 2); the
    // predicate is on a DATA column, so pruning must come from the
    // distinct scan, not the directory values
    Thread.sleep(1100)
    val updated = Dml.update(spark, t, "n_name = 'NATION_7'",
      Map("n_name" -> "'REWRITTEN'"))
    assert(updated == 1)
    val after = fileStamps(t)
    val touched = before.keys.filter(p => after(p) != before(p)).toSet
    assert(touched == Set("n_regionkey=2"), s"touched=$touched")
    assert(spark.read.parquet(t)
      .filter("n_name = 'REWRITTEN'").count() == 1)
    assert(spark.read.parquet(t).count() == 25)
  }

  test("MERGE on a partitioned table preserves the Hive layout") {
    import spark.implicits._
    val t = partitionedScratch()
    val source = Seq((7, "SRCNAME"), (77, "NEWROW")).toDF("k", "newname")
    val (updated, _, inserted) = Dml.merge(spark, t, source,
      "n_nationkey = s.k AND n_regionkey = 2",
      Seq(Dml.WhenMatched(None, Some(Map("n_name" -> "s.newname")))),
      Some(Map("n_nationkey" -> "s.k", "n_name" -> "s.newname",
        "n_regionkey" -> "s.k % 5")))
    assert(updated == 1 && inserted == 1)
    // the table is still partition-discovered with the same column
    val dirs = new java.io.File(t).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("n_regionkey=")), dirs.mkString(","))
    val df = spark.read.parquet(t)
    assert(df.count() == 26)
    assert(df.filter("n_name = 'SRCNAME'").count() == 1)
    assert(df.filter("n_name = 'NEWROW' AND n_regionkey = 2").count() == 1)
  }

  test("data-predicate pruning matches partitions whose dir rendering differs from the typed value") {
    import spark.implicits._
    // zero-padded string partition values: dirs are month=01/02/03 but
    // Spark's read-back infers month as INT (1/2/3) — string equality
    // between String.valueOf(1) and "01" would silently prune everything
    val dir = java.nio.file.Files.createTempDirectory("graft-dml-pad").toString + "/t"
    Seq(("a", "01"), ("b", "01"), ("c", "02"), ("d", "03"))
      .toDF("name", "month").write.partitionBy("month").parquet(dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("month=01", "month=02", "month=03"), dirs.mkString(","))
    // data-column predicate → the distinct-scan branch decides partitions
    val deleted = Dml.delete(spark, dir, "name = 'a'")
    assert(deleted == 1, s"typed pruning missed the zero-padded partition (deleted=$deleted)")
    val after = spark.read.parquet(dir)
    assert(after.count() == 3 && after.filter("name = 'a'").count() == 0)
    // sibling rows in the same partition survive
    assert(after.filter("name = 'b'").count() == 1)
  }

  test("data-predicate pruning handles timestamp-typed partition values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dml-ts").toString + "/t"
    Seq(("x", "2024-01-01 00:00:00"), ("y", "2024-02-01 00:00:00"))
      .toDF("name", "ts_s")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts_s"))).drop("ts_s")
      .write.partitionBy("ts").parquet(dir)
    val updated = Dml.update(spark, dir, "name = 'x'", Map("name" -> "'X2'"))
    assert(updated == 1, s"typed pruning missed the timestamp partition (updated=$updated)")
    val after = spark.read.parquet(dir)
    assert(after.filter("name = 'X2'").count() == 1 && after.count() == 2)
  }

  test("DELETE reaches rows in the null (__HIVE_DEFAULT_PARTITION__) partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dml-null").toString + "/t"
    Seq(("a", Some(1)), ("b", None), ("c", None))
      .toDF("name", "k").write.partitionBy("k").parquet(dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("k=__HIVE_DEFAULT_PARTITION__"), dirs.mkString(","))
    val deleted = Dml.delete(spark, dir, "name = 'b'")
    assert(deleted == 1, s"null partition unreachable (deleted=$deleted)")
    val after = spark.read.parquet(dir)
    assert(after.count() == 2 && after.filter("name = 'b'").count() == 0)
    assert(after.filter("k IS NULL").count() == 1) // 'c' survives in place
  }

  test("DELETE and UPDATE report counts without extra scan jobs") {
    val t = scratchTable()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    def settle(): Unit = { Thread.sleep(300) } // let queued listener events drain
    try {
      val deleted = Dml.delete(spark, t, "n_regionkey = 2")
      settle()
      assert(deleted == 5)
      // one write job (+ at most one parquet schema-inference read);
      // the r4 shape was three full scans per statement
      assert(jobs.get() <= 2, s"DELETE ran ${jobs.get()} jobs")
      jobs.set(0)
      val updated = Dml.update(spark, t, "n_regionkey = 1",
        Map("n_comment" -> "'x'"))
      settle()
      assert(updated == 5)
      assert(jobs.get() <= 2, s"UPDATE ran ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
