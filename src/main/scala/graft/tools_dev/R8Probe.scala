package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r8 rows: (1) why the incremental-index pair join
  * still shows two ptok exchanges; (2) whether tdigest bytes survive a
  * parquet round-trip bit-identically.
  */
object R8Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val s = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(s, dir)

    // ---- probe 2: tdigest byte stability through parquet ----
    val out = java.nio.file.Files.createTempDirectory("probe-sk").toString
    val perGroup =
      """SELECT l_returnflag, qdigest_agg(l_extendedprice) AS qd,
        |  tdigest_agg(l_extendedprice) AS td
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    s.sql(perGroup).write.mode("overwrite").parquet(out)
    s.read.parquet(out).createOrReplaceTempView("store1")
    s.sql(perGroup).createOrReplaceTempView("direct")
    println("== per-group byte equality store-vs-rebuild ==")
    s.sql(
      """SELECT a.l_returnflag, a.td = b.td AS td_bytes_eq, a.qd = b.qd AS qd_bytes_eq,
        |  tdigest_value_at_quantile(a.td, 0.5) AS td_store_p50,
        |  tdigest_value_at_quantile(b.td, 0.5) AS td_direct_p50
        |FROM store1 a JOIN direct b USING (l_returnflag)""".stripMargin)
      .collect().foreach(println)
    // double roundtrip: store1 -> parquet -> store2, byte equality
    val out2 = java.nio.file.Files.createTempDirectory("probe-sk2").toString
    s.read.parquet(out).write.mode("overwrite").parquet(out2)
    s.read.parquet(out2).createOrReplaceTempView("store2")
    println("== store1 vs store2 (pure roundtrip) ==")
    s.sql(
      """SELECT a.l_returnflag, a.td = b.td AS td_eq, a.qd = b.qd AS qd_eq
        |FROM store1 a JOIN store2 b USING (l_returnflag)""".stripMargin)
      .collect().foreach(println)

    // ---- probe 1: pair-join plan against the bucketed prefix store ----
    val res = graft.queries.PipelineQueries.queries("dedup_incremental_indexed")(s, dir)
    println("== incremental_indexed result ==")
    res.collect().foreach(println)

    // minimal analog: increment-ish side repartitioned to bucket layout,
    // joined to the store on ptok — what does EnsureRequirements do?
    val stored = s.table("graft_idx_prefix")
    val inc = stored.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("ptok"), col("n_sh"))
      .repartition(8, col("ptok"))
    val j = inc.hint("merge").as("x").join(stored.hint("merge").as("y"),
      col("x.ptok") === col("y.ptok") && col("x.doc_id") =!= col("y.doc_id"))
    val n = j.count()
    println(s"== minimal join rows=$n plan ==")
    println(j.queryExecution.executedPlan.toString.take(6000))
    s.stop()
  }
}
