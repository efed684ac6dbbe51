package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the round-8 ops.
  *
  * 1. Incremental dedup against the PERSISTED index: time the
  *    once-per-refresh index build separately from the steady-state
  *    consume, and compare the consume against `dedup_incremental`'s
  *    full recompute — the claim under test is that at steady state
  *    index-consume beats recompute (the build amortizes over many
  *    increments).
  * 2. df-capped sharded inverted index on the 100× corpus (a genuinely
  *    skewed token distribution — stop words at df≈500k): wall time vs
  *    the unsharded build plus the max posting-group size both ways,
  *    the skew bound the sharding exists to enforce.
  * 3. The TPC-DS slice at sf0.1 and the 100× TPC-H corpus
  *    (/tmp/sftpch100, built by graft.tools.ScaleSoakTpch100).
  *
  * Soak discipline (r6/r7 lessons): ≥3 prewarms, median of 3; shuffle
  * partitions sized to the data via SPARK_GRAFT_SHUFFLE_PARTITIONS;
  * /proc/loadavg recorded in-band.
  */
object R8OpsSoak {
  def main(args: Array[String]): Unit = {
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def load1: Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val out = new StringBuilder(
      s"""{"soak":"r8_ops","load_start":$load1,"shuffle_partitions":$shufflePartitions,"rows":[""")
    var first = true
    def emit(json: String): Unit = {
      if (!first) out.append(",")
      first = false
      out.append(json)
    }
    def timed(prewarms: Int, measured: Int)(body: => Unit): Seq[Double] = {
      (1 to prewarms).foreach(_ => body)
      (1 to measured).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
    }
    def median(runs: Seq[Double]): Double = runs(runs.length / 2)
    def runQuery(name: String, dir: String, label: String,
        prewarms: Int = 3, measured: Int = 3): Unit = {
      val fn = graft.SparkEntry.queries(name)
      val runs = timed(prewarms, measured) {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        graft.engine.CachedPlans.releaseAll()
      }
      val m = median(runs)
      println(f"[r8] $name $label $m%.2f s (runs ${runs.map(r => f"$r%.2f").mkString("/")})")
      emit(f"""{"query":"$name","sf":"$label","wall_s":$m%.2f,""" +
        f""""runs":[${runs.map(r => f"$r%.2f").mkString(",")}]}""")
    }

    for ((dir, label) <- Seq(
        ("/root/testdata/sf0.1", "sf0.1"),
        ("/tmp/sfdocs100", "100x docs"))) {
      // -- 1: index build / steady-state consume / full recompute --
      val buildRuns = timed(1, 1) {
        graft.queries.PipelineQueries.incrementalIndexBuild(spark, dir)
      }
      emit(f"""{"query":"incremental_index_build","sf":"$label","wall_s":${median(buildRuns)}%.2f}""")
      println(f"[r8] index build $label ${median(buildRuns)}%.2f s")
      val consumeRuns = timed(3, 3) {
        graft.queries.PipelineQueries.incrementalIndexConsume(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      emit(f"""{"query":"incremental_index_consume","sf":"$label","wall_s":${median(consumeRuns)}%.2f,""" +
        f""""runs":[${consumeRuns.map(r => f"$r%.2f").mkString(",")}]}""")
      println(f"[r8] index consume $label ${median(consumeRuns)}%.2f s")
      runQuery("dedup_incremental", dir, label)

      // -- 2: sharded vs unsharded inverted index + skew bound --
      runQuery("pipeline_inverted_index", dir, label)
      runQuery("pipeline_inverted_index_sharded", dir, label)
      val skew = graft.SparkEntry.queries("pipeline_inverted_index_sharded")(spark, dir)
        .agg(max(col("chunk_df")).as("max_chunk"), max(col("df")).as("max_df"))
        .collect().head
      emit(s"""{"stat":"shard_skew","sf":"$label","max_chunk_df":${skew.getLong(0)},"max_df":${skew.getLong(1)}}""")
      println(s"[r8] shard skew $label max_chunk_df=${skew.getLong(0)} max_df=${skew.getLong(1)}")
    }

    // -- 3: TPC-DS slice at sf0.1 + 100x relational corpus --
    val tpcds = Seq("tpcds_q3_star", "tpcds_q5_channel_rollup",
      "tpcds_q34_having_star", "tpcds_q38_intersect",
      "tpcds_q51_cume_fulljoin", "tpcds_q67_rollup_rank",
      "tpcds_q72_multijoin", "tpcds_q95_multi_cte")
    tpcds.foreach(runQuery(_, "/root/testdata/sf0.1", "sf0.1"))
    if (new java.io.File("/tmp/sftpch100/lineitem.parquet").exists)
      tpcds.foreach(runQuery(_, "/tmp/sftpch100", "100x tpch"))

    out.append(s"""],"load_end":$load1}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/R8OPS_SOAK_r08.json"), out.toString)
    spark.stop()
  }
}
