package graft

import graft.engine.Tables

/** SET SESSION / PREPARE / EXECUTE / DEALLOCATE / DESCRIBE statements
  * (reference grammar SqlBase.g4:153-157).
  */
class StatementsSpec extends GraftSuite {

  private def sql(q: String) = Tables.sql(spark, sfTiny, q)

  test("SET SESSION lands in the Spark session conf and echoes the pair") {
    val r = sql("SET SESSION graft.join_distribution_type = 'PARTITIONED'").collect().head
    assert(r.getString(0) == "graft.join_distribution_type")
    assert(spark.conf.get("graft.join_distribution_type") == "PARTITIONED")
  }

  test("PREPARE / EXECUTE with positional parameters") {
    sql("PREPARE stmt1 FROM SELECT n_nationkey FROM nation WHERE n_nationkey < ? ORDER BY n_nationkey")
    val rows = sql("EXECUTE stmt1 USING 3").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    // re-execute with a different binding
    assert(sql("EXECUTE stmt1 USING 1").collect().length == 1)
  }

  test("EXECUTE a statement with a string parameter containing a comma") {
    sql("PREPARE stmt2 FROM SELECT count(*) AS n FROM nation WHERE n_name = ? OR n_name = ?")
    val n = sql("EXECUTE stmt2 USING 'no,such', 'NATION_1'").collect().head.getLong(0)
    assert(n == 1)
  }

  test("DEALLOCATE removes the statement") {
    sql("PREPARE stmt3 FROM SELECT 1 AS one")
    sql("DEALLOCATE PREPARE stmt3")
    val e = intercept[Exception](sql("EXECUTE stmt3").collect())
    assert(e.getMessage.contains("not found"))
  }

  test("DESCRIBE OUTPUT reports the prepared statement's schema") {
    sql("PREPARE stmt4 FROM SELECT n_name, n_nationkey + ? AS shifted FROM nation")
    val cols = sql("DESCRIBE OUTPUT stmt4").collect().map(r => (r.getString(0), r.getString(1)))
    assert(cols.map(_._1).toSeq == Seq("n_name", "shifted"))
  }

  test("plain DESCRIBE of a registered table works through the native path") {
    val cols = sql("DESCRIBE nation").collect().map(_.getString(0))
    assert(cols.contains("n_nationkey") && cols.contains("n_name"))
  }

  test("EXECUTE with a string parameter containing '?' does not mis-substitute") {
    sql("PREPARE stmt5 FROM SELECT ? AS a, '?' AS lit, ? AS b")
    val r = sql("EXECUTE stmt5 USING 'x?y', 7").collect().head
    // the ? inside the bound string and the ? inside the body literal must
    // both survive; only the two positional markers bind
    assert(r.getString(0) == "x?y")
    assert(r.getString(1) == "?")
    assert(r.getInt(2) == 7)
  }

  test("DESCRIBE INPUT infers parameter types from adjacent columns") {
    sql("PREPARE stmt6 FROM SELECT n_name FROM nation WHERE n_nationkey < ? AND n_name LIKE ? AND ? = n_regionkey AND substr(n_name, ?) IS NOT NULL")
    val rows = sql("DESCRIBE INPUT stmt6").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((0, "int"), (1, "string"), (2, "int"), (3, "unknown")))
  }

  test("transaction statements are acknowledged no-ops") {
    assert(sql("START TRANSACTION").collect().head.getString(0) == "START TRANSACTION")
    assert(sql("START TRANSACTION ISOLATION LEVEL READ COMMITTED").collect().nonEmpty)
    assert(sql("COMMIT").collect().head.getString(0) == "COMMIT")
    assert(sql("COMMIT WORK").collect().nonEmpty)
    assert(sql("ROLLBACK").collect().head.getString(0) == "ROLLBACK")
    // statements in between still run normally
    sql("BEGIN")
    assert(sql("SELECT count(*) AS n FROM nation").collect().head.getLong(0) == 25)
    sql("ROLLBACK")
  }

  test("EXECUTE of a prepared MATCH_RECOGNIZE query goes through the full dialect") {
    sql("""PREPARE mrq FROM SELECT user_id, n_rows FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  MEASURES count(*) AS n_rows ONE ROW PER MATCH
          |  PATTERN (S R+) DEFINE R AS value > PREV(value))""".stripMargin)
    assert(sql("EXECUTE mrq").collect().nonEmpty)
  }

  test("EXPLAIN ANALYZE runs the query and reports per-operator rows and metrics") {
    val rows = sql(
      "EXPLAIN ANALYZE SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
      .collect()
    val ops = rows.map(_.getString(1))
    info(rows.map(r => s"${r.getInt(0)} ${r.getString(1)} rows=${if (r.isNullAt(2)) "-" else r.getLong(2)} [${r.getString(3)}]").mkString("\n"))
    assert(ops.exists(_.contains("HashAggregate")))
    assert(ops.exists(_.contains("Scan")) || ops.exists(_.contains("FileScan")))
    // runtime metrics populated: the scan actually saw the 25 nations and
    // the final aggregate emitted one row per region
    val scanRows = rows.filter(r => r.getString(1).contains("Scan")).flatMap(r =>
      if (r.isNullAt(2)) None else Some(r.getLong(2)))
    assert(scanRows.exists(_ == 25L))
    val aggRows = rows.filter(_.getString(1).contains("HashAggregate")).map(_.getLong(2))
    assert(aggRows.contains(5L))
    // the rendered metric map exposes more than the row count
    assert(rows.exists(_.getString(3).contains("numOutputRows=")))
  }

  test("CREATE TABLE AS / INSERT INTO / DROP TABLE over the managed store") {
    val created = sql(
      "CREATE TABLE ct1 AS SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0")
      .collect()(0).getLong(0)
    assert(created == 5)
    assert(sql("SELECT count(*) FROM ct1").collect()(0).getLong(0) == 5)
    val inserted = sql("INSERT INTO ct1 SELECT 100 AS n_nationkey, 'X' AS n_name")
      .collect()(0).getLong(0)
    assert(inserted == 1)
    assert(sql("SELECT count(*) FROM ct1").collect()(0).getLong(0) == 6)
    // fixture tables are not managed: INSERT must refuse, not corrupt
    val e = intercept[IllegalArgumentException](
      sql("INSERT INTO nation SELECT * FROM nation"))
    assert(e.getMessage.contains("not a managed table"))
    sql("DROP TABLE ct1")
    assert(!spark.catalog.tableExists("ct1"))
  }

  test("CREATE TABLE IF NOT EXISTS is a no-op on an existing table") {
    sql("CREATE TABLE ctne AS SELECT n_nationkey FROM nation WHERE n_regionkey = 0")
    assert(sql("SELECT count(*) FROM ctne").collect()(0).getLong(0) == 5)
    // the clause's contract: existing data must NOT be overwritten
    val rows = sql("CREATE TABLE IF NOT EXISTS ctne AS SELECT 1 AS n_nationkey")
      .collect()(0).getLong(0)
    assert(rows == 0)
    assert(sql("SELECT count(*) FROM ctne").collect()(0).getLong(0) == 5)
    // without the clause, CTAS still replaces
    assert(sql("CREATE TABLE ctne AS SELECT 1 AS n_nationkey").collect()(0).getLong(0) == 1)
    assert(sql("SELECT count(*) FROM ctne").collect()(0).getLong(0) == 1)
    sql("DROP TABLE ctne")
  }

  test("SQL DELETE / UPDATE / MERGE INTO on managed tables") {
    sql("CREATE TABLE mdml AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
    val del = sql("DELETE FROM mdml WHERE n_regionkey = 4").collect()(0).getLong(0)
    assert(del == 5)
    val upd = sql("UPDATE mdml SET n_name = concat(n_name, '_u') WHERE n_regionkey = 0")
      .collect()(0).getLong(0)
    assert(upd == 5)
    assert(sql("SELECT count(*) FROM mdml WHERE n_name LIKE '%_u'")
      .collect()(0).getLong(0) == 5)
    val m = sql(
      """MERGE INTO mdml USING (SELECT 1 AS k, 'ONE' AS v UNION ALL SELECT 55, 'NEW') s
        |ON n_nationkey = s.k
        |WHEN MATCHED THEN UPDATE SET n_name = s.v
        |WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey) VALUES (s.k, s.v, 9)""".stripMargin)
      .collect()(0)
    assert((m.getLong(0), m.getLong(1), m.getLong(2)) == ((1L, 0L, 1L)))
    assert(sql("SELECT n_name FROM mdml WHERE n_nationkey = 1")
      .collect()(0).getString(0) == "ONE")
    assert(sql("SELECT n_regionkey FROM mdml WHERE n_nationkey = 55")
      .collect()(0).getInt(0) == 9)
    assert(sql("SELECT count(*) FROM mdml").collect()(0).getLong(0) == 21)
    sql("DROP TABLE mdml")
  }

  test("EXPLAIN (TYPE LOGICAL | DISTRIBUTED | VALIDATE | IO)") {
    val q = "SELECT n_regionkey, count(*) FROM nation GROUP BY n_regionkey"
    val logical = sql(s"EXPLAIN (TYPE LOGICAL) $q").collect()(0).getString(0)
    assert(logical.contains("Aggregate") && !logical.contains("Exchange"))
    val dist = sql(s"EXPLAIN (TYPE DISTRIBUTED) $q").collect()(0).getString(0)
    assert(dist.contains("HashAggregate") && dist.contains("Exchange"))
    assert(sql(s"EXPLAIN (TYPE VALIDATE) $q").collect()(0).getBoolean(0))
    val io = sql(s"EXPLAIN (TYPE IO) $q").collect().map(_.getString(0))
    assert(io.length == 1 && io.head.contains("nation.parquet"), io.mkString)
  }

  test("SHOW SCHEMAS / TABLES / COLUMNS / FUNCTIONS / STATS") {
    val schemas = sql("SHOW SCHEMAS").collect().map(_.getString(0))
    assert(schemas.contains("default") && schemas.contains("information_schema"))
    val tables = sql("SHOW TABLES").collect().map(_.getString(0))
    assert(Set("nation", "region", "orders").subsetOf(tables.toSet))
    val filtered = sql("SHOW TABLES LIKE 'nat%'").collect().map(_.getString(0))
    assert(filtered.toSeq == Seq("nation"))
    val cols = sql("SHOW COLUMNS FROM nation").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(cols.toSeq == Seq(("n_nationkey", "int"), ("n_name", "string"),
      ("n_regionkey", "int")))
    val fns = sql("SHOW FUNCTIONS").collect().map(_.getString(0)).toSet
    assert(Set("approx_set", "st_contains", "checksum", "minhash").subsetOf(fns))
    val stats = sql("SHOW STATS FOR region").collect()
    val byCol = stats.filter(!_.isNullAt(0)).map(r => r.getString(0) -> r).toMap
    assert(byCol("r_regionkey").getLong(1) == 5) // exact ndv
    assert(byCol("r_name").getString(5) == "MIDDLE EAST") // high_value
    val summary = stats.filter(_.isNullAt(0))
    assert(summary.length == 1 && summary.head.getLong(3) == 5) // row_count
  }

  test("SHOW CATALOGS lists the catalog; SHOW SESSION lists SET SESSION properties") {
    val cats = sql("SHOW CATALOGS").collect().map(_.getString(0))
    assert(cats.contains("spark_catalog"))
    sql("SET SESSION graft.test_prop = 'hello'")
    val props = sql("SHOW SESSION").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("graft.test_prop").contains("hello"))
  }
}
