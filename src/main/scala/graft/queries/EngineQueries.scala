package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Dml, Tables, Views, Writer}

/** Round-trip queries that put the ENGINE capabilities (DML, MV refresh,
  * layout-controlled writes) under the oracle, not just ScalaTest: each
  * copies fixture data to a scratch directory, applies the operation
  * through the real engine path (copy-on-write staging swaps, partition
  * pruning, observed counts), and returns the resulting table — which
  * DuckDB reproduces from the fixture with plain SQL. A failing rewrite,
  * a lost partition, or a wrong count surfaces as a row/hash mismatch.
  */
object EngineQueries {

  type Q = (SparkSession, String) => DataFrame

  private def scratch(prefix: String): String =
    graft.engine.TempArtifacts.dir(s"graft-$prefix") + "/t"

  val queries: Map[String, Q] = Map(
    // DELETE through the copy-on-write path (partitioned layout, so the
    // partition-pruned branch executes); result = surviving rows + the
    // observed delete count as a column
    "dml_delete_roundtrip" -> ((s, dir) => {
      val t = scratch("del")
      Tables.load(s, dir, "nation")
        .write.partitionBy("n_regionkey").parquet(t)
      val n = Dml.delete(s, t, "n_regionkey = 2 AND n_nationkey > 5")
      s.read.parquet(t)
        .select(col("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .withColumn("n_deleted", lit(n))
    }),
    // UPDATE with pre-update right-hand sides through the same path
    "dml_update_roundtrip" -> ((s, dir) => {
      val t = scratch("upd")
      Tables.load(s, dir, "nation")
        .write.partitionBy("n_regionkey").parquet(t)
      val n = Dml.update(s, t, "n_regionkey = 1",
        Map("n_name" -> "concat(n_name, '_U')"))
      s.read.parquet(t)
        .select(col("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .withColumn("n_updated", lit(n))
    }),
    // MERGE: ordered WHEN MATCHED update + NOT MATCHED insert, counts
    // observed in the single staged write
    "dml_merge_roundtrip" -> ((s, dir) => {
      val t = scratch("mrg")
      Tables.load(s, dir, "nation").write.parquet(t)
      val source = Tables.load(s, dir, "region")
        .select((col("r_regionkey") * 10).as("k"), col("r_name").as("v"))
      val (u, d, i) = Dml.merge(s, t, source, "n_nationkey = s.k",
        Seq(Dml.WhenMatched(None, Some(Map("n_name" -> "concat('M_', n_name)")))),
        Some(Map("n_nationkey" -> "s.k", "n_name" -> "concat('NEW_', s.v)",
          "n_regionkey" -> "cast(s.k % 5 AS int)")))
      s.read.parquet(t)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .withColumn("n_updated", lit(u))
        .withColumn("n_deleted", lit(d))
        .withColumn("n_inserted", lit(i))
    }),
    // materialized view: create partitioned, refresh ONE partition
    // incrementally, read the registered view back
    "mv_refresh_roundtrip" -> ((s, dir) => {
      val storage = graft.engine.TempArtifacts.dir("graft-mvq")
      val q = "SELECT n_regionkey, n_nationkey, n_name FROM nation"
      Views.createMaterializedView(s, dir, "mv_rt", q, storage,
        partitionBy = Seq("n_regionkey"))
      val touched = Views.refreshMaterializedViewPartitions(
        s, dir, "mv_rt", q, storage, "n_regionkey = 3")
      s.table("mv_rt")
        .select(col("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .withColumn("n_touched", lit(touched))
    }),
    // aggregate pushdown INTO the parquet scan (reference: connector
    // applyAggregation — a count/min/max answered from footer
    // statistics without reading data pages). Spark's V2 parquet path
    // does this under spark.sql.parquet.aggregatePushdown; the row
    // executes eagerly under that conf (restored after), and carries a
    // plan-derived agg_pushed flag the oracle pins TRUE — at 100 TB
    // this answers metadata queries from ~KB of footers instead of a
    // full corpus scan.
    "scan_agg_pushdown" -> ((s, dir) => {
      import s.implicits._
      // conf-scoped read runs in an ISOLATED session (shared context,
      // private SQLConf) so disabling the V1 source list for the V2
      // pushdown path can never affect queries planning concurrently on
      // the shared session (r7 advice — the old try/finally restore was
      // safe only under a sequential runner). One bounded 1-row collect.
      val iso = s.newSession()
      iso.conf.set("spark.sql.sources.useV1SourceList", "")
      iso.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      val df = iso.read.parquet(s"$dir/orders.parquet")
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
      val row = df.collect().head
      val pushed = df.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [COUNT(*)")
      Seq((row.getLong(0), row.getLong(1), row.getLong(2), pushed))
        .toDF("n_orders", "min_key", "max_key", "agg_pushed")
    }),

    // bucketed CO-LOCATED join (the reference's fixed bucket-partition-
    // function): both sides bucketed on the join key at WRITE time, so
    // the join reads co-located buckets and plans with ZERO
    // hash-partitioned exchanges on the join key — at 100 TB this is
    // the difference between shuffling both fact tables and shuffling
    // nothing. The row carries the plan-derived join-exchange count
    // (oracle pins 0) next to the join's own aggregate; the merge hints
    // keep the tiny test tables off the broadcast path so the property
    // being asserted is bucketing, not broadcast.
    "sink_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      Writer.writeBucketed(Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
        "bkt_orders", "o_orderkey", 8)
      Writer.writeBucketed(Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("qty")),
        "bkt_litem", "l_orderkey", 8)
      val joined = s.table("bkt_orders").hint("merge")
        .join(s.table("bkt_litem").hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), sum(col("qty")).as("total_qty"))
      val rows = joined.collect()
      // only the priority re-agg may shuffle; a hash exchange keyed on
      // the join key means bucketing failed to co-locate
      val planStr = joined.queryExecution.executedPlan.toString
      val joinKeyExchanges =
        "hashpartitioning\\((?:o_orderkey|l_orderkey)".r.findAllIn(planStr).length
      rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          joinKeyExchanges.toLong))
        .toDF("o_orderpriority", "n_orders", "total_qty", "join_key_exchanges")
    }),

    // layout-controlled sink: partitioned write (bounded files per
    // partition) read back through partition discovery; the aggregate
    // would be wrong if any partition were lost, duplicated, or mis-keyed
    "sink_partitioned_roundtrip" -> ((s, dir) => {
      val t = scratch("sink")
      Writer.writePartitioned(Tables.load(s, dir, "orders"), t,
        Seq("o_orderpriority"))
      s.read.parquet(t).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    }))

  val oracles: Map[String, String] = Map(
    "dml_delete_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  (SELECT count(*) FROM nation WHERE n_regionkey = 2 AND n_nationkey > 5)::bigint AS n_deleted
        |FROM nation WHERE NOT (n_regionkey = 2 AND n_nationkey > 5)""".stripMargin,
    "dml_update_roundtrip" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_regionkey = 1 THEN n_name || '_U' ELSE n_name END AS n_name,
        |  n_regionkey,
        |  (SELECT count(*) FROM nation WHERE n_regionkey = 1)::bigint AS n_updated
        |FROM nation""".stripMargin,
    "dml_merge_roundtrip" ->
      """WITH src AS (SELECT r_regionkey * 10 AS k, r_name AS v FROM region),
        |merged AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey IN (SELECT k FROM src) THEN 'M_' || n_name
        |         ELSE n_name END AS n_name,
        |    n_regionkey
        |  FROM nation
        |  UNION ALL
        |  SELECT k, 'NEW_' || v, (k % 5)::int FROM src
        |  WHERE k NOT IN (SELECT n_nationkey FROM nation))
        |SELECT n_nationkey, n_name, n_regionkey,
        |  (SELECT count(*) FROM src WHERE k IN (SELECT n_nationkey FROM nation))::bigint AS n_updated,
        |  0::bigint AS n_deleted,
        |  (SELECT count(*) FROM src WHERE k NOT IN (SELECT n_nationkey FROM nation))::bigint AS n_inserted
        |FROM merged""".stripMargin,
    "mv_refresh_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey, 1::bigint AS n_touched
        |FROM nation""".stripMargin,
    "sink_partitioned_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "scan_agg_pushdown" ->
      """SELECT count(*)::bigint AS n_orders, min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key, true AS agg_pushed
        |FROM orders""".stripMargin,
    "sink_bucketed_join" ->
      """WITH li AS (SELECT l_orderkey, sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderpriority, count(*)::bigint AS n_orders,
        |  sum(qty) AS total_qty, 0::bigint AS join_key_exchanges
        |FROM orders JOIN li ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin)
}
