package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew soak: does the dedup blocking hold when the blocking key is
  * zipf-skewed? The dedup band joins key on (lang, band); this tool
  * rewrites sf0.1 documents so ~75% of the corpus lands in ONE language
  * (a zipf head far beyond the fixture's uniform mix), then runs the two
  * dedup headliners with AQE skew-join splitting enabled and reports
  * wall time plus the per-task duration spread of each run — the number
  * that blows up if a single (lang, band) bucket were to concentrate
  * the join.
  *
  * Usage: runMain graft.tools.SkewSoak [workDir]   (default /tmp/skew)
  * Emits one JSON line: {"skew_lang_share":0.75,"queries":{name:
  * {"sec":…,"tasks":…,"task_p50_ms":…,"task_max_ms":…}}}
  */
object SkewSoak {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/skew")
    val src = "/root/testdata/sf0.1"
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        // aggressive split thresholds so AQE treats sf0.1-sized skew the
        // way default thresholds treat production-sized skew
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // zipf head: 75% of docs re-labelled into one language
    graft.engine.Tables.load(spark, src, "documents")
      .withColumn("lang",
        when(pmod(xxhash64(col("doc_id")), lit(100)) < 75, lit("zz"))
          .otherwise(col("lang")))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val share = spark.read.parquet(s"$out/documents.parquet")
      .agg(avg(when(col("lang") === "zz", 1.0).otherwise(0.0))).head().getDouble(0)

    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) durations.add(te.taskInfo.duration)
    })

    def run(name: String): (Double, Seq[Long]) = {
      // prewarm once, then measure one run's tasks
      graft.SparkEntry.queries(name)(spark, out)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(500); durations.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, out)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain listener bus
      import scala.jdk.CollectionConverters._
      (sec, durations.asScala.toSeq.sorted)
    }

    val entries = Seq("dedup_jaccard", "dedup_minhash_lsh").map { name =>
      val (sec, ds) = run(name)
      val p50 = if (ds.isEmpty) 0L else ds(ds.length / 2)
      val max = if (ds.isEmpty) 0L else ds.last
      f""""$name":{"sec":$sec%.3f,"tasks":${ds.length},"task_p50_ms":$p50,"task_max_ms":$max}"""
    }
    println(s"""{"skew_lang_share":$share,"queries":{${entries.mkString(",")}}}""")
    spark.stop()
  }
}
