package graft.tools_dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SoakHarness._

/** Single-variable A/B for the r15 ANN assign-stage de-windowing (r14
  * verdict "What's wrong" #1): the SAME nearest-centroid assignment of
  * the sf0.1 embeddings corpus against the SAME 16 seed centroids,
  * spelled (W) as the old cross-join + row_number() window argmax vs
  * (A) as the new zero-shuffle broadcast-array argmax
  * ([[graft.queries.PipelineQueries.nearestCentroid]]), plus the same
  * pair for the PQ per-subspace encode. One session, alternating arms,
  * 4 rounds each after 2 prewarms; identical checksums assert result
  * equivalence.
  */
object R15AnnAssignAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (loadStart, _, warn) = waitForQuiet()
    val spark = session(shuffleParts = "32")
    val w = org.apache.spark.sql.expressions.Window

    val e = graft.engine.Tables.load(spark, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 5)
    val seeds = corpus.orderBy(col("vec_id")).limit(16)
      .select(row_number().over(w.orderBy(col("vec_id"))).as("cid"),
        col("embedding").as("cent"))

    // --- IVF assign arms ---
    def ivfWindow(): DataFrame = corpus.crossJoin(broadcast(seeds))
      .withColumn("cos_c", expr("cosine_sim_native(embedding, cent)"))
      .withColumn("rk", row_number().over(
        w.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cid"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cid"))
    def ivfArgmax(): DataFrame =
      graft.queries.PipelineQueries.nearestCentroid(corpus, seeds)
        .select(col("vec_id"), col("cid"))

    // --- PQ encode arms (M=8 subspaces, 16 codes each) ---
    val subL2 =
      "aggregate(zip_with(sv, scent, (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v)"
    def subRows(df: DataFrame) = df
      .withColumn("nrm", expr(
        "sqrt(aggregate(embedding, 0D, (a, x) -> a + cast(x AS double) * cast(x AS double)))"))
      .withColumn("nemb", expr("transform(embedding, x -> cast(x AS double) / nrm)"))
      .select(col("vec_id"), explode(expr(
        "transform(sequence(0, 7), m -> struct(m AS m, slice(nemb, m * 8 + 1, 8) AS sv))")).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))
    val csub = subRows(corpus)
    val pqSeeds = csub
      .withColumn("rk", dense_rank().over(w.partitionBy(col("m")).orderBy(col("vec_id"))))
      .filter(col("rk") <= 16)
      .select(col("m"), col("rk").as("scid"), col("sv").as("scent"))
    def pqWindow(): DataFrame = csub.join(broadcast(pqSeeds), "m")
      .withColumn("d", expr(subL2))
      .withColumn("rk", row_number().over(
        w.partitionBy(col("vec_id"), col("m")).orderBy(col("d"), col("scid"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("m"), col("scid"))
    def pqArgmax(): DataFrame =
      graft.queries.PipelineQueries.nearestSubCode(csub, pqSeeds)
        .select(col("vec_id"), col("m"), col("scid"))

    def consume(df: DataFrame): (Long, Long) = {
      val h = df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      val r = h.agg(count(lit(1)).as("n"), bit_xor(col("h")).as("ck")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "ivf_window" -> (() => ivfWindow()), "ivf_argmax" -> (() => ivfArgmax()),
      "pq_window" -> (() => pqWindow()), "pq_argmax" -> (() => pqArgmax()))
    gcDrain()
    val cks = arms.map { case (n, q) => n -> consume(q()) }.toMap // prewarm 1
    arms.foreach { case (_, q) => consume(q()) } // prewarm 2
    val eq = cks("ivf_window") == cks("ivf_argmax") && cks("pq_window") == cks("pq_argmax")
    println(s"[r15annab] checksums: $cks equal=$eq")
    val runs = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    for (round <- 1 to 4) {
      // position-balance: swap arm order on alternate rounds
      val order = if (round % 2 == 1) arms else Seq(arms(1), arms(0), arms(3), arms(2))
      for ((name, q) <- order) {
        val t0 = System.nanoTime(); consume(q())
        val wall = (System.nanoTime() - t0) / 1e9
        runs(name) = runs(name) :+ wall
        println(f"[r15annab] round $round $name $wall%.2f s load=$load1%.1f")
      }
    }
    def med(v: Vector[Double]) = { val s = v.sorted; s(s.length / 2) }
    def rl(n: String) = s""""${n}_runs":[${runs(n).map(r => f"$r%.3f").mkString(",")}]"""
    val json =
      f"""{"ivf_window_median_s":${med(runs("ivf_window"))}%.3f,"ivf_argmax_median_s":${med(runs("ivf_argmax"))}%.3f,""" +
      f""""ivf_argmax_vs_window":${med(runs("ivf_argmax")) / med(runs("ivf_window"))}%.3f,""" +
      f""""pq_window_median_s":${med(runs("pq_window"))}%.3f,"pq_argmax_median_s":${med(runs("pq_argmax"))}%.3f,""" +
      f""""pq_argmax_vs_window":${med(runs("pq_argmax")) / med(runs("pq_window"))}%.3f,""" +
      s"""${rl("ivf_window")},${rl("ivf_argmax")},${rl("pq_window")},${rl("pq_argmax")},""" +
      f""""checksums_equal":$eq,"sf_dir":"$dir","load_start":$loadStart%.2f,"load_end":$load1%.2f,"load_warning":$warn}"""
    println(s"[r15annab-json] $json")
    writeArtifact("R15ANNAB_r15.json", json)
    spark.stop()
  }
}
