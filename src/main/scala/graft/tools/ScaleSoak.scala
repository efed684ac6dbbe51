package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak: synthesize an sf1-equivalent dataset (10× sf0.1) by
  * key-shifted replication — every replica offsets its join keys by
  * i·(max+1) so referential integrity AND key cardinality scale with the
  * data (a naive union would multiply group sizes instead of group
  * counts) — then run the headline queries against it via graft.Bench.
  * Dimensions (region/nation) stay fixed, like TPC-H itself.
  *
  * Usage: runMain graft.tools.ScaleSoak [outDir]  (default /tmp/sf1)
  * then:  SPARK_GRAFT_SF_DIR=<outDir> runMain graft.Bench
  */
object ScaleSoak {
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf1")
    val src = "/root/testdata/sf0.1"
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Replicate with bigint key columns shifted per copy. */
    def replicate(df: DataFrame, shiftCols: Seq[String]): DataFrame = {
      val maxes = shiftCols.map(c => c -> (df.agg(max(col(c))).head().getLong(0) + 1L)).toMap
      (0 until Copies).map { i =>
        shiftCols.foldLeft(df) { (d, c) => d.withColumn(c, col(c) + lit(i * maxes(c))) }
      }.reduce(_ unionAll _)
    }

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[soak] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val t = (n: String) => graft.engine.Tables.load(spark, src, n)
    write("region", t("region"))
    write("nation", t("nation"))
    write("customer", replicate(t("customer"), Seq("c_custkey")))
    write("supplier", replicate(t("supplier"), Seq("s_suppkey")))
    write("part", replicate(t("part"), Seq("p_partkey")))
    write("orders", replicate(t("orders"), Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicate(t("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey")))
    // events: ts back to raw nanos (bigint) so Tables.load's nanos shim
    // reads the soak copy the same way it reads the driver's parquet
    write("events", replicate(t("events"), Seq("event_id", "user_id"))
      .withColumn("ts", expr("unix_micros(ts) * 1000L")))
    // documents: replica i applies a per-copy ALPHABET ROTATION
    // (translate by i·2+1 letters), making each copy an exactly
    // isomorphic image of the original corpus: word lengths, vocabulary
    // richness, and the fixture's own near-duplicate clusters are all
    // preserved within a copy (the char map is injective, so shingle
    // sets map injectively), while ACROSS copies a rotated trigram never
    // equals its source, so clones share ~zero shingles and the true
    // pair set grows LINEARLY in the copy count. Two rejected designs,
    // measured: a token-order shuffle keeps word-interior shingles, so
    // every replica family collides in every MinHash band (quadratic
    // candidates, bench >10 min); hash-renaming words collapses the
    // corpus trigram alphabet to {w,0-9}, which makes ALL documents
    // similar (ppjoin 37× at 10× data). Copy 0 is verbatim.
    val docs = t("documents")
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val perturbedDocs = (0 until Copies).map { i =>
      val shifted = docs.withColumn("doc_id", col("doc_id") + lit(i * maxDoc))
      if (i == 0) shifted
      else {
        val k = (i * 2 + 1) % 26
        val rot = lower.drop(k) + lower.take(k) + upper.drop(k) + upper.take(k)
        shifted.withColumn("text",
          translate(col("text"), lower + upper, rot))
      }
    }.reduce(_ unionAll _)
    write("documents", perturbedDocs)
    // embeddings replicated as-is (ids shifted) — the ANN soak is NOT
    // meaningful on them (clones are exact duplicates in embedding space
    // and would quadratically inflate the neighbor set), so the soak
    // bench keeps skipping the sim_* queries
    write("embeddings", replicate(t("embeddings"), Seq("vec_id")))
    spark.stop()
  }
}
