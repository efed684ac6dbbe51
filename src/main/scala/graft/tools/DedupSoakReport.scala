package graft.tools

import org.apache.spark.sql.SparkSession

/** Dedup-family scale soak report: wall time AND result-pair counts for
  * the three near-dup variants at sf0.1 vs the 10× soak corpus
  * (`ScaleSoak` output: per-copy alphabet-rotated documents, so clones
  * are NOT near-duplicates and the true pair set scales linearly).
  * The pair counts are the point: linear pair growth with linear-or-
  * better wall growth = the operator scales; pair growth ≈ copies² would
  * mean the corpus, not the operator, was being measured.
  *
  * Usage: runMain graft.tools.DedupSoakReport [sf1Dir]  (default /tmp/sf1)
  * Emits one JSON line.
  */
object DedupSoakReport {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val sf01 = "/root/testdata/sf0.1"
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def one(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val entries = Seq("dedup_minhash_lsh", "dedup_jaccard_ppjoin", "dedup_jaccard")
      .map { name =>
        val (tSmall, nSmall) = one(name, sf01)
        val (tBig, nBig) = one(name, sf1)
        f""""$name":{"sf01_sec":$tSmall%.2f,"sf1_sec":$tBig%.2f,"wall_ratio":${tBig / tSmall}%.2f,"sf01_pairs":$nSmall,"sf1_pairs":$nBig,"pair_ratio":${nBig.toDouble / math.max(1, nSmall)}%.2f}"""
      }
    println(s"""{"data_ratio":10,"queries":{${entries.mkString(",")}}}""")
    spark.stop()
  }
}
