package graft

import org.apache.spark.sql.functions._

/** Incremental index MERGE (r9 verdict, Missing #3) — the maintenance
  * path of the persisted dedup index. The corpus is CONSTRUCTED so the
  * merge is observable: slice-4 docs whose only exact/near duplicates
  * live in slice 3 are invisible to a consume against the base-only
  * store and visible after the merge — nothing else could make them
  * visible, so the assertions isolate exactly the appended rows.
  *
  * doc_id % 5 layout: build indexes mod ∉ {3,4}; merge mod 3; consume
  * mod 4. Pairs planted:
  *  - doc 9 (slice 4) near-dups ONLY doc 3 (slice 3)  → found post-merge
  *  - doc 14 (slice 4) near-dups doc 2 (base)          → found pre-merge
  *  - doc 19 (slice 4) exact-dups doc 7 (base)         → found pre-merge
  *  - doc 4 (slice 4) exact-dups doc 13 (slice 3)      → found post-merge
  *    (exercises the novel-fingerprint append: doc 13's fp is not in the
  *    base store, so only the merge can put it there)
  */
class IndexMergeSpec extends GraftSuite {
  import graft.queries.PipelineQueries._

  private val base =
    "the quick brown fox jumps over the lazy dog while counting stars at midnight in summer"
  private val pair23 =
    "a completely different sentence about database engines merging bucketed index stores nightly"
  private val dup = "this exact text appears twice in the corpus verbatim with no change at all"
  private val dup2 = "another exact duplicate pair planted across the increment boundary here"

  // hand-written so no two fillers share 80% of their 3-gram shingles
  // (a template with substituted ids gets dangerously close to the
  // threshold: ~0.7 measured — one unlucky pair would shift the counts)
  private val fillers = Vector(
    "zebras gallop across frozen tundra chasing auroras borealis every solstice evening",
    "quantum harpsichords resonate beneath volcanic observatories during meteor showers",
    "marmalade sandwiches fuel the lighthouse keeper through foggy atlantic winters",
    "cryptographic wombats encode secret burrows with elliptic curve signatures",
    "turquoise submarines navigate coral labyrinths seeking bioluminescent jellyfish",
    "paprika windmills grind celestial wheat for interstellar bakeries on mars",
    "velvet accordions serenade nocturnal hedgehogs under bavarian chestnut trees",
    "magnetic typewriters compose sonnets about rusty telescopes and comet tails",
    "emerald locomotives traverse himalayan viaducts carrying cargoes of saffron",
    "bamboo xylophones echo through misty fjords where puffins debate philosophy",
    "copper kaleidoscopes refract moonbeams onto sleeping walrus colonies nightly",
    "origami thunderclouds drizzle confetti over patagonian glacier orchestras")

  // the 12 non-planted doc_ids, each mapped to a DISTINCT filler (a
  // modulo here would alias doc 18 — slice 3 — onto base doc 6's text,
  // silently turning a planted-novel fingerprint into a duplicate)
  private val fillerIds = Vector(0, 1, 5, 6, 8, 10, 11, 12, 15, 16, 17, 18)
  private def fill(i: Int): String = fillers(fillerIds.indexOf(i))

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("idxmerge").toString
    val texts = (0 until 20).map {
      case 3  => base                 // slice 3: near-dup source
      case 9  => base + " ok"         // slice 4: near-dups ONLY doc 3
      case 2  => pair23               // base: near-dup source
      case 14 => pair23 + " yes"      // slice 4: near-dups doc 2 (pre-merge)
      case 7  => dup                  // base
      case 19 => dup                  // slice 4: exact-dups doc 7 (pre-merge)
      case 13 => dup2                 // slice 3: novel fingerprint
      case 4  => dup2                 // slice 4: exact-dups doc 13 (post-merge only)
      case i  => fill(i)
    }
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def counts(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = df.collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def prefixStoreFiles(): Set[String] = {
    val loc = new java.io.File(
      new java.net.URI(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("graft_idx_prefix"))
        .location.toString))
    loc.listFiles().filter(_.getName.startsWith("part-")).map(_.getName).toSet
  }

  test("merge appends exactly the increment; consume sees merged docs; clean files untouched") {
    try {
      incrementalIndexBuild(spark, dir, 5, heldOut = Seq(3, 4))
      val filesBefore = prefixStoreFiles()

      // pre-merge consume: base-only store — slice-3-dependent dups invisible
      val (n0, e0, nd0) = counts(incrementalIndexConsume(spark, dir, 5, selMod = 4))
      assert(n0 == 4L)                       // docs 4, 9, 14, 19
      assert(e0 == 1L, s"pre-merge exact: $e0")   // only doc 19 (dup of base doc 7)
      // near-dups: doc 14 (pair of base doc 2) + doc 19 (an exact dup is
      // also a jaccard-1.0 near-dup)
      assert(nd0 == 2L, s"pre-merge near: $nd0")

      val m = incrementalIndexMerge(spark, dir, 5, mergeMod = 3).collect().head

      // closed-form append pins, computed independently from the docs
      val sh = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 5 === 3)
        .withColumn("norm", expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"))
        .withColumn("n_sh", expr("size(shingle_hashes(norm, 3))"))
      val expectedPrefix = sh.agg(sum(greatest(
        col("n_sh") - floor(lit(0.8) * col("n_sh")).cast("int") + 1, lit(1)))).head.getLong(0)
      assert(m.getLong(0) == expectedPrefix, s"prefix appended ${m.getLong(0)} != $expectedPrefix")
      assert(m.getLong(1) == 4L, s"fp appended ${m.getLong(1)}")  // docs 3,8,13,18: all novel fps
      val expectedVocab = sh.select(explode(expr("shingle_hashes(norm, 3)"))).distinct().count()
      assert(m.getLong(2) == expectedVocab, s"df delta ${m.getLong(2)} != $expectedVocab")

      // append-only: every pre-merge file survives verbatim
      val filesAfter = prefixStoreFiles()
      assert(filesBefore.subsetOf(filesAfter),
        s"merge rewrote store files: ${filesBefore.diff(filesAfter)}")
      assert(filesAfter.size > filesBefore.size)

      // post-merge consume: slice-3 partners now reachable
      val (n1, e1, nd1) = counts(incrementalIndexConsume(spark, dir, 5, selMod = 4))
      assert(n1 == 4L)
      assert(e1 == 2L, s"post-merge exact: $e1")   // doc 19 + doc 4 (fp merged from doc 13)
      // + doc 9 (prefixes merged from doc 3) and doc 4 (jaccard-1.0 with
      // merged doc 13) on top of the two pre-merge near-dups
      assert(nd1 == 4L, s"post-merge near: $nd1")

      // current-df view folds the delta log over the frozen base
      val curTotal = indexCurrentDf(spark).agg(sum("df")).head.getLong(0)
      val allToks = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 5 =!= 4)
        .withColumn("norm", expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"))
        .select(explode(expr("shingle_hashes(norm, 3)"))).count()
      assert(curTotal == allToks, s"current df total $curTotal != $allToks")

      // a second merge of the same slice must not be double-counted by
      // ranking (frozen order unchanged) — but SHOULD append again: the
      // caller owns idempotency, the store is an append log
      val m2 = incrementalIndexMerge(spark, dir, 5, mergeMod = 3).collect().head
      assert(m2.getLong(0) == expectedPrefix)
      assert(m2.getLong(1) == 0L, "re-merged fps must anti-join away")
    } finally {
      Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("minor compaction collapses buckets to one sorted file and changes no row") {
    try {
      incrementalIndexBuild(spark, dir, 5, heldOut = Seq(3, 4))
      incrementalIndexMerge(spark, dir, 5, mergeMod = 3).collect()

      // the merge fanned at least one bucket (appendBucketed adds files)
      val preFan = graft.engine.Writer.bucketFileFanout(spark, "graft_idx_prefix")
      assert(preFan > 1, s"merge left fanout $preFan — nothing to compact")
      val preRows = spark.table("graft_idx_prefix").count()
      val preFp = spark.table("graft_idx_fp").count()
      val preConsume = counts(incrementalIndexConsume(spark, dir, 5, selMod = 4))
      val preDf = indexCurrentDf(spark).agg(sum("df")).head.getLong(0)

      val fan = incrementalIndexCompact(spark).collect().head.getLong(0)
      assert(fan == 1L, s"post-compact fanout $fan")

      // bytes moved, rows did not: identical row counts, identical
      // consume answer, delta log still folds over the frozen base
      assert(spark.table("graft_idx_prefix").count() == preRows)
      assert(spark.table("graft_idx_fp").count() == preFp)
      assert(counts(incrementalIndexConsume(spark, dir, 5, selMod = 4)) == preConsume)
      assert(indexCurrentDf(spark).agg(sum("df")).head.getLong(0) == preDf)

      // the compacted store is still a live append target: a further
      // merge appends (fanout grows again), and compaction is idempotent
      incrementalIndexMerge(spark, dir, 5, mergeMod = 3).collect()
      assert(graft.engine.Writer.bucketFileFanout(spark, "graft_idx_prefix") > 1)
      incrementalIndexCompact(spark).collect()
      assert(graft.engine.Writer.bucketFileFanout(spark, "graft_idx_prefix") == 1)
    } finally {
      Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("merged consume equals the one-shot recompute on the real fixture") {
    try {
      // same split over sf0.001: build ∉ {3,4}, merge 3, consume 4 must
      // equal the direct recompute of slice 4 vs everything else
      incrementalIndexBuild(spark, sfTiny, 5, heldOut = Seq(3, 4))
      incrementalIndexMerge(spark, sfTiny, 5, mergeMod = 3).collect()
      val got = counts(incrementalIndexConsume(spark, sfTiny, 5, selMod = 4))
      val want = counts(incrementalRecompute(spark, sfTiny, 5))
      assert(got == want, s"merged consume $got != recompute $want")
    } finally {
      Seq("graft_idx_prefix", "graft_idx_df", "graft_idx_fp", "graft_idx_df_delta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
