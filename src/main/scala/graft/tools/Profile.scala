package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Dev utility: stage-by-stage timing of the set-similarity pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val shingleExpr =
      "array_distinct(transform(sequence(1, greatest(length(norm) - 2, 1)), i -> substring(norm, i, 3)))"
    val base = Tables.load(spark, sfDir, "documents")
      .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("shingles", expr(shingleExpr))
      .withColumn("hsh", expr("array_sort(transform(shingles, sh -> xxhash64(sh)))"))
      .withColumn("n_sh", size(col("shingles")))
      .withColumn("band", floor(log(1.25, col("n_sh"))))
      .select(col("doc_id"), col("lang"), col("hsh"), col("n_sh"), col("band"))

    time("base materialize")(base.write.format("noop").mode("overwrite").save())
    val a = base.select(col("doc_id").as("doc_a"), col("lang"),
      col("hsh").as("h_a"), col("n_sh").as("n_a"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("probe_band"))
    val b = base.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("hsh").as("h_b"), col("n_sh").as("n_b"), col("band").as("band_b"))
    val joinBase = a.join(b,
      col("lang") === col("lang_b") && col("probe_band") === col("band_b") &&
      col("doc_a") < col("doc_b") &&
      least(col("n_a"), col("n_b")) * 5 >= greatest(col("n_a"), col("n_b")) * 4)
    val nPairs = time("pair join, cheap condition only")(joinBase.count())
    println(s"[profile] candidate pairs: $nPairs")
    val withJac = time("pair join + intersect in condition")(
      joinBase.filter(
        expr("cast(sorted_intersect_count(h_a, h_b) as double) / cast(n_a + n_b - sorted_intersect_count(h_a, h_b) as double) >= 0.8")).count())
    println(s"[profile] matched pairs: $withJac")
    joinBase.explain("formatted")
    spark.stop()
  }
}
