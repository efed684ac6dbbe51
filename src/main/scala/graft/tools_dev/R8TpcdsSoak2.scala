package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Scale points for the TPC-DS queries added after the main r8 soak
  * (q57 deviation windows, q14 cross-channel items, q72 many-way star):
  * sf0.1 and the 100× TPC-H corpus, 3 prewarms + median of 3.
  */
object R8TpcdsSoak2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def load1: Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val out = new StringBuilder(
      s"""{"soak":"r8_tpcds_late","load_start":$load1,"rows":[""")
    var first = true
    def run(name: String, dir: String, label: String): Unit = {
      val fn = graft.SparkEntry.queries(name)
      (1 to 3).foreach(_ => fn(spark, dir).write.format("noop").mode("overwrite").save())
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[r8b] $name $label ${runs(1)}%.2f s (runs ${runs.map(r => f"$r%.2f").mkString("/")})")
      if (!first) out.append(",")
      first = false
      out.append(f"""{"query":"$name","sf":"$label","wall_s":${runs(1)}%.2f,""" +
        f""""runs":[${runs.map(r => f"$r%.2f").mkString(",")}]}""")
    }
    val qs = Seq("tpcds_q57_deviation", "tpcds_q14_cross_items",
      "tpcds_q72_multijoin", "tpcds_q11_yoy")
    qs.foreach(run(_, "/root/testdata/sf0.1", "sf0.1"))
    if (new java.io.File("/tmp/sftpch100/lineitem.parquet").exists)
      qs.foreach(run(_, "/tmp/sftpch100", "100x tpch"))
    out.append(s"""],"load_end":$load1}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/R8TPCDS2_SOAK_r08.json"), out.toString)
    spark.stop()
  }
}
