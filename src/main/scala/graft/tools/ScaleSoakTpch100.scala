package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× relational soak (≈ TPC-H sf10 on this fixture: 60M lineitem
  * rows): key-shifted replication exactly as `ScaleSoak`, so referential
  * integrity AND key cardinality scale with the data, dimensions
  * (region/nation) fixed like TPC-H itself. documents/embeddings are
  * shifted verbatim (no perturbation): this corpus feeds the SCAN-shaped
  * text/vector queries (token stats, brute-force ANN); the dedup pair
  * operators have their own isomorphic 100× corpus (`ScaleSoak100`) —
  * verbatim clones would make every pair operator quadratic by synthesis.
  *
  * Usage: runMain graft.tools.ScaleSoakTpch100 [outDir] (default /tmp/sftpch100)
  * then:  SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_BENCH_RUNS=1 runMain graft.Bench
  */
object ScaleSoakTpch100 {
  val Copies = 100

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sftpch100")
    val src = "/root/testdata/sf0.1"
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, shiftCols: Seq[String]): DataFrame = {
      val maxes = shiftCols.map(c => c -> (df.agg(max(col(c))).head().getLong(0) + 1L)).toMap
      (0 until Copies).map { i =>
        shiftCols.foldLeft(df) { (d, c) => d.withColumn(c, col(c) + lit(i * maxes(c))) }
      }.reduce(_ unionAll _)
    }

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[tpch100] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val t = (n: String) => graft.engine.Tables.load(spark, src, n)
    write("region", t("region"))
    write("nation", t("nation"))
    write("customer", replicate(t("customer"), Seq("c_custkey")))
    write("supplier", replicate(t("supplier"), Seq("s_suppkey")))
    write("part", replicate(t("part"), Seq("p_partkey")))
    write("orders", replicate(t("orders"), Seq("o_orderkey", "o_custkey")))
    write("lineitem",
      replicate(t("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey"))
        .repartition(64))
    write("events", replicate(t("events"), Seq("event_id", "user_id"))
      .withColumn("ts", expr("unix_micros(ts) * 1000L")))
    val docs = t("documents")
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    write("documents", (0 until Copies)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * maxDoc)))
      .reduce(_ unionAll _))
    val embs = t("embeddings")
    val maxVec = embs.agg(max(col("vec_id"))).head().getLong(0) + 1L
    write("embeddings", (0 until Copies)
      .map(i => embs.withColumn("vec_id", col("vec_id") + lit(i * maxVec)))
      .reduce(_ unionAll _))
    spark.stop()
  }
}
