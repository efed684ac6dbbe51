package graft.tools_dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r7 soak for SemDeDup's k ∝ N scaling (r6 verdict missing #4): builds a
  * 100× embeddings corpus (sf0.1 unioned 100 times, each copy
  * deterministically perturbed so copies don't collapse into identical
  * points), runs the clustering+pair pipeline with the DEFAULT k rule
  * (k = semdedupK(200k) = 100 vs the fixture's 8), and reports wall
  * time, the cluster-size distribution (max/mean — the quantity k ∝ N is
  * supposed to bound), and the pair count. Writes SEMDEDUP_SOAK_r07.json.
  */
object SemDedupSoak {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(mult: Int): DataFrame = {
      val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      (0 until mult).map { c =>
        // per-copy deterministic perturbation: dimension d of copy c
        // shifts by ((c*31 + d) % 7 - 3) * 0.08 — LARGE relative to the
        // fixture's cluster spread, so the 100 copies form ~100 genuine
        // modes (the scenario k ∝ N is sized for) rather than 8 denser
        // ones
        e.select(
          (col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
          expr(s"transform(embedding, (x, d) -> cast(x + (($c * 31 + d) % 7 - 3) * 0.08 AS float))")
            .as("embedding"))
      }.reduce(_.unionAll(_))
    }

    def measure(label: String, mult: Int): String = {
      val e = corpus(mult)
      val n = e.count()
      val k = graft.queries.PipelineQueries.semdedupK(n)
      val t0 = System.nanoTime()
      val (assigned, _) = graft.queries.PipelineQueries.kmeansQuantizedOn(e, k, iters = 3)
      val sizes = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("mx"), avg(col("n")).as("mean"),
          count(lit(1)).as("nonempty")).collect()(0)
      val pairs = graft.queries.PipelineQueries
        .semanticPairsOn(e.select(col("vec_id"), col("embedding")), k)
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      val row = f"""{"label":"$label","n_vectors":$n,"k":$k,""" +
        f""""max_cluster":${sizes.getLong(0)},"mean_cluster":${sizes.getDouble(1)}%.1f,""" +
        f""""nonempty_clusters":${sizes.getLong(2)},"n_pairs":$pairs,"wall_s":$wall%.1f}"""
      println(s"[semdedup] $row")
      row
    }

    val rows = Seq(measure("sf0.1_1x", 1), measure("sf0.1_100x", 100))
    val json = "{\"soak\":\"semdedup_k_scaling\",\"rows\":[" + rows.mkString(",") + "]}"
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/SEMDEDUP_SOAK_r07.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
