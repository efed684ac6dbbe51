import org.apache.spark.sql.SparkSession
object NewOpsSoak {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, dir: String): Unit = {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[newops] $name $dir ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    run("dedup_incremental", "/root/testdata/sf0.1"); run("dedup_incremental", "/tmp/sfdocs100")
    run("pipeline_stratified_sample", "/root/testdata/sf0.1"); run("pipeline_stratified_sample", "/tmp/sftpch100")
    run("pipeline_seq_pack", "/root/testdata/sf0.1"); run("pipeline_seq_pack", "/tmp/sfdocs100")
    run("dedup_keep_best", "/root/testdata/sf0.1")
    run("mm_dedup_ahash", "/root/testdata/sf0.1")
    spark.stop()
  }
}
