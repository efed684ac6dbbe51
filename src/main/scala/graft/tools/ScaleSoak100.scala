package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× documents soak for the content-addressed dedup family — the
  * order-of-magnitude step past `ScaleSoak`'s 10×. Replica i applies a
  * PER-COPY RANDOM LETTER PERMUTATION (Fisher–Yates seeded by i, copy 0
  * verbatim): each copy is an exactly isomorphic image of the corpus
  * (injective char map ⇒ injective trigram-shingle map, so within-copy
  * near-dup structure is preserved bit-for-bit), while two different
  * permutations send the same source trigram to the same image only with
  * probability ~26⁻³, so cross-copy Jaccard ≈ 0 and the TRUE pair set
  * scales linearly in the copy count. The 10× soak's alphabet ROTATION
  * cannot reach 100 copies — only 13 distinct odd rotations exist, so
  * copies would start sharing a rotation and collapse into verbatim
  * cross-copy duplicates (quadratic pair growth = measuring the
  * synthesis, not the operator). A 26!-sized permutation family has no
  * such collision at any copy count.
  *
  * Only `documents.parquet` is written: the dedup queries read nothing
  * else.
  *
  * Usage: runMain graft.tools.ScaleSoak100 [outDir] [copies]
  * (defaults /tmp/sfdocs100, 100 — the permutation family supports any
  * copy count, so the same tool generates the 1000× corpus)
  * then:  runMain graft.tools.DedupSoakReport100 [outDir]
  */
object ScaleSoak100 {
  val Copies = 100

  /** Deterministic letter permutation for copy i (identity for i == 0). */
  def perm(i: Int): (String, String) = {
    val lower = "abcdefghijklmnopqrstuvwxyz".toCharArray
    if (i > 0) {
      val rnd = new java.util.Random(i.toLong * 0x9e3779b97f4a7c15L)
      var k = lower.length - 1
      while (k > 0) {
        val j = rnd.nextInt(k + 1)
        val t = lower(k); lower(k) = lower(j); lower(j) = t
        k -= 1
      }
    }
    (new String(lower), new String(lower).toUpperCase)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sfdocs100")
    val copies = args.lift(1).map(_.toInt).getOrElse(Copies)
    val src = "/root/testdata/sf0.1"
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val docs = graft.engine.Tables.load(spark, src, "documents")
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val replicated = (0 until copies).map { i =>
      val shifted = docs.withColumn("doc_id", col("doc_id") + lit(i * maxDoc))
      if (i == 0) shifted
      else {
        val (pl, pu) = perm(i)
        shifted.withColumn("text", translate(col("text"), lower + upper, pl + pu))
      }
    }.reduce(_ unionAll _)
    replicated.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    println(s"[soak100] documents: " +
      s"${spark.read.parquet(s"$out/documents.parquet").count()} rows")
    spark.stop()
  }
}

/** Wall time + pair counts for the content-addressed dedup variants at
  * sf0.1 vs the 100× corpus. The banded `dedup_jaccard` is excluded by
  * design: the 10× soak already showed size-band blocking is the
  * small-corpus plan (56× wall at 10×); at 100× it would only time out.
  */
object DedupSoakReport100 {
  def main(args: Array[String]): Unit = {
    val big = args.headOption.getOrElse("/tmp/sfdocs100")
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
    val entries = Seq("dedup_minhash_lsh", "dedup_jaccard_ppjoin",
      "dedup_simhash", "sim_tfidf_pairs_abscap", "text_decontaminate").map { name =>
      one(name, sf01) // prewarm: plan + codegen + JIT, so the measured
      one(name, sf01) // sf0.1 run is warm like the x100 run effectively is
      val (tSmall, nSmall) = one(name, sf01)
      val (tBig, nBig) = one(name, big)
      f""""$name":{"sf01_sec":$tSmall%.2f,"x100_sec":$tBig%.2f,"wall_ratio":${tBig / tSmall}%.2f,"sf01_pairs":$nSmall,"x100_pairs":$nBig,"pair_ratio":${nBig.toDouble / math.max(1, nSmall)}%.2f}"""
    }
    println(s"""{"data_ratio":100,"queries":{${entries.mkString(",")}}}""")
    spark.stop()
  }
}

/** Dev probe: candidate-pair volume of the ppjoin prefix blocking (the
  * stage between blocking and verification) at a given dir. */
object PpjoinCandidateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfdocs100")
    val spark = graft.engine.SessionDefaults(
      org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val base = graft.engine.Tables.load(spark, dir, "documents")
      .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("hsh", expr("shingle_hashes(norm, 3)"))
      .withColumn("n_sh", size(col("hsh")))
    val toks = base.select(col("doc_id"), col("lang"), col("n_sh"),
      explode(col("hsh")).as("tok"))
    val dfreq = toks.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("df"))
    val prefIds = toks.join(dfreq, Seq("lang", "tok"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
      .filter(col("rk") <=
        greatest(col("n_sh") - floor(lit(0.8) * col("n_sh")).cast("int") + 1, lit(1)))
      .select(col("doc_id"), col("lang"), col("n_sh"), col("rk"), col("tok").as("ptok"))
    val nPref = prefIds.count()
    val cand = prefIds.hint("merge").as("x").join(prefIds.hint("merge").as("y"),
      col("x.lang") === col("y.lang") && col("x.ptok") === col("y.ptok") &&
      col("x.doc_id") < col("y.doc_id") &&
      least(col("x.n_sh"), col("y.n_sh")) * 5 >= greatest(col("x.n_sh"), col("y.n_sh")) * 4)
      .count()
    val candPos = prefIds.hint("merge").as("x").join(prefIds.hint("merge").as("y"),
      col("x.lang") === col("y.lang") && col("x.ptok") === col("y.ptok") &&
      col("x.doc_id") < col("y.doc_id") &&
      least(col("x.n_sh"), col("y.n_sh")) * 5 >= greatest(col("x.n_sh"), col("y.n_sh")) * 4 &&
      (lit(1) + least(col("x.n_sh") - col("x.rk"), col("y.n_sh") - col("y.rk"))) * 9 >=
        (col("x.n_sh") + col("y.n_sh")) * 4)
      .count()
    println(s"[probe] dir=$dir prefix_rows=$nPref candidate_rows=$cand positional_survivors=$candPos")
    spark.stop()
  }
}

/** Dev probe: TF-IDF all-pairs prefix blocking stats (no arrays). */
object TfidfPrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfdocs100")
    val spark = graft.engine.SessionDefaults(
      org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.engine.Tables.load(spark, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val dfx = tf.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val wn = tf.join(dfx, "token")
      .crossJoin(broadcast(nDocs))
      .where(col("df") <= col("n_docs") * 0.1)
      .withColumn("w", col("tf") * log(col("n_docs") * 1.0 / col("df")))
      .withColumn("wn", col("w") / sqrt(sum(col("w") * col("w")).over(byDoc)))
      .select(col("doc_id"), xxhash64(col("token")).as("thash"), col("wn"), col("df"))
    val W = org.apache.spark.sql.expressions.Window
    val pref = wn
      .withColumn("s", sqrt(sum(col("wn") * col("wn")).over(
        W.partitionBy(col("doc_id")).orderBy(col("df"), col("thash"))
          .rowsBetween(W.currentRow, W.unboundedFollowing))))
      .filter(col("s") >= 0.6)
      .select(col("doc_id"), col("thash").as("ptok"), col("s"))
    pref.persist()
    val nPref = pref.count()
    val buckets = pref.groupBy(col("ptok")).agg(count(lit(1)).as("n"))
    val topBuckets = buckets.orderBy(col("n").desc).limit(5).collect()
      .map(r => r.getLong(1)).mkString(",")
    val cand = pref.as("x").join(pref.as("y"),
      col("x.ptok") === col("y.ptok") && col("x.doc_id") < col("y.doc_id") &&
      col("x.s") * col("y.s") >= 0.6).count()
    println(s"[tfprobe] dir=$dir prefix_rows=$nPref top_buckets=$topBuckets candidates=$cand")
    pref.unpersist()
    spark.stop()
  }
}
