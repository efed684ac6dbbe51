package graft.tools_dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not part of the product): interleaved same-session A/B of
  * the r15-opt reshaped queries against their pre-opt shapes (old shape
  * reproduced inline here, new shape read from the product map). ABBA
  * ordering, fresh noop action per run, gcDrain between arms — medians
  * compare plan shapes without cross-session box noise (the r10/r11
  * lesson). Usage: scripts/run_tool.sh graft.tools_dev.R15OptAb <arm>
  * where arm ∈ {bm25, tfidf, q21, all}.
  */
object R15OptAb {
  private def normText(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))

  def bm25Old(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.engine.Tables.load(s, dir, "documents")
      .withColumn("words", split(normText(col("text")), " "))
      .withColumn("dl", size(col("words")).cast("long"))
    val toks = docs.select(col("doc_id"), col("dl"),
      posexplode(col("words")).as(Seq("pos", "tok")))
    val postings = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfTbl = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
    val qterms = toks.filter(col("doc_id") < 5)
      .groupBy(col("doc_id").as("query_id"), col("tok"))
      .agg(min(col("pos")).as("first_pos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("first_pos"))))
      .filter(col("rk") <= 5).select(col("query_id"), col("tok"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    postings.join(broadcast(qterms), "tok")
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(dfTbl), "tok")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(idf * tfNorm), 6).as("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  def tfidfOld(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.engine.Tables.load(s, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val dfx = tf.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val cap = lit(500.0)
    val wn = tf.join(dfx, "token")
      .crossJoin(broadcast(nDocs))
      .where(col("df") <= cap)
      .withColumn("w", col("tf") * log(col("n_docs") * 1.0 / col("df")))
      .withColumn("wn", col("w") / sqrt(sum(col("w") * col("w")).over(byDoc)))
      .select(col("doc_id"), xxhash64(col("token")).as("thash"),
        col("wn"), col("df"))
    val W = org.apache.spark.sql.expressions.Window
    val suffixNorm = sqrt(sum(col("wn") * col("wn")).over(
      W.partitionBy(col("doc_id")).orderBy(col("df"), col("thash"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)))
    val fullVec = sort_array(collect_list(struct(col("thash"), col("wn"))).over(
      W.partitionBy(col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    val pref = wn
      .withColumn("s", suffixNorm)
      .withColumn("v", fullVec)
      .filter(col("s") >= 0.6)
      .select(col("doc_id"), col("thash").as("ptok"), col("s"),
        expr("transform(v, x -> x.thash)").as("vt"),
        expr("transform(v, x -> x.wn)").as("vw"))
    pref.hint("merge").as("a")
      .join(pref.hint("merge").as("b"),
        col("a.ptok") === col("b.ptok") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.s") * col("b.s") >= 0.6 &&
        expr("sorted_dot(a.vt, a.vw, b.vt, b.vw)") >= 0.6)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(expr("sorted_dot(a.vt, a.vw, b.vt, b.vw)"), 6).as("cos_sim"))
      .dropDuplicates("doc_a", "doc_b")
  }

  def q21Old(s: SparkSession, dir: String): DataFrame =
    graft.engine.Tables.sql(s, dir,
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL '60' DAY THEN 1 ELSE 0 END AS is_late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_supp AS (
        |  SELECT l_orderkey, l_suppkey, sum(is_late) AS my_late
        |  FROM lo GROUP BY l_orderkey, l_suppkey),
        |flagged AS (
        |  SELECT l_orderkey, l_suppkey, my_late,
        |    count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        |    sum(CASE WHEN my_late > 0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY l_orderkey) AS n_late_supp
        |  FROM per_supp)
        |SELECT s_name, sum(my_late) AS numwait
        |FROM flagged
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE my_late > 0 AND n_supp >= 2 AND n_late_supp = 1
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)

  def main(args: Array[String]): Unit = {
    val arm = args.headOption.getOrElse("all")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pairs: Seq[(String, (SparkSession, String) => DataFrame, (SparkSession, String) => DataFrame)] = Seq(
      ("bm25", bm25Old _, graft.SparkEntry.queries("sim_bm25_topk")),
      ("tfidf", tfidfOld _, graft.SparkEntry.queries("sim_tfidf_pairs_abscap")),
      ("q21", q21Old _, graft.SparkEntry.queries("tpch_q21")))
      .filter(p => arm == "all" || arm == p._1)

    def run(f: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        f(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally {
        graft.engine.CachedPlans.releaseAll()
        graft.engine.TempArtifacts.cleanupAll(spark)
      }
    }
    pairs.foreach { case (name, oldQ, newQ) =>
      // prewarm both arms to steady state
      (1 to 3).foreach { _ => run(oldQ); run(newQ) }
      val olds = scala.collection.mutable.ArrayBuffer[Double]()
      val news = scala.collection.mutable.ArrayBuffer[Double]()
      // ABBA x 3 = 6 runs per arm, position-balanced
      (1 to 3).foreach { _ =>
        olds += run(oldQ); news += run(newQ)
        news += run(newQ); olds += run(oldQ)
      }
      def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.length / 2) }
      println(f"[ab] $name old=${med(olds.toSeq)}%.3f new=${med(news.toSeq)}%.3f " +
        f"ratio=${med(news.toSeq) / med(olds.toSeq)}%.3f " +
        s"olds=${olds.map(x => f"$x%.3f").mkString(",")} news=${news.map(x => f"$x%.3f").mkString(",")}")
      SoakHarness.gcDrain()
    }
    spark.stop()
  }
}
