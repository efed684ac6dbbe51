package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingestion against the PERSISTED dedup index: a crawl
  * stream deduped per micro-batch against the bucketed store — the
  * production shape for continuous corpus ingestion (build the index
  * once per refresh, then every arriving slice pays only its own cost,
  * the same economics `dedup_incremental_indexed` proves for batch).
  *
  * Mechanics: `foreachBatch` hands each micro-batch to the SAME consume
  * core the batch path runs ([[graft.queries.PipelineQueries
  * .indexConsumeDocs]] — fingerprint semi-join + one-sided PPJoin
  * against the stored prefix/df/fingerprint tables, store side
  * co-located on its bucket key). foreachBatch is the correct tool, not
  * a fallback: the prefix ranking is a per-doc window over the batch,
  * which continuous mode cannot express, and each micro-batch is
  * exactly the "increment" the index contract wants. Totals are
  * additive across batches because micro-batches partition the
  * increment and the pair set is increment×corpus (no intra-increment
  * pairs on either path).
  *
  * The driver row feeds the fixture's slice-4 docs through a
  * MemoryStream in `batches` forced micro-batches and returns the
  * summed counts + the batch count — the dedup totals equal
  * `dedup_incremental`'s closed-form oracle, and `n_batches` pins that
  * the stream really split (a single-batch run would prove nothing).
  */
object IndexedDedupStream {

  def streamedConsumeRow(spark: SparkSession, dir: String,
      incMod: Int = 5, selMod: Int = 4, batches: Int = 5): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val P = graft.queries.PipelineQueries

    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % incMod === selMod)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    // per-batch (n_new, n_exact, n_near), appended by the sink closure;
    // foreachBatch runs on the driver, so a local buffer is sound
    val perBatch = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val r = P.indexConsumeDocs(spark, batch).collect().head
          perBatch.synchronized {
            perBatch += ((r.getLong(0), r.getLong(1), r.getLong(2)))
          }
          ()
        }
      }
      .start()
    try {
      // one addData + processAllAvailable per slice = one forced
      // micro-batch each — the arrival pattern of a crawl feed. Split by
      // POSITION, not doc_id arithmetic: the increment's ids are all
      // ≡ selMod (mod incMod), so any id-modulo with a common factor
      // would collapse the slices into one batch
      (0 until batches).foreach { b =>
        val slice = docs.zipWithIndex
          .collect { case (d, i) if i % batches == b => d }
        if (slice.nonEmpty) {
          input.addData(slice.toIndexedSeq: _*)
          q.processAllAvailable()
        }
      }
    } finally q.stop()

    val rows = perBatch.synchronized { perBatch.toVector }
    Seq((rows.map(_._1).sum, rows.map(_._2).sum, rows.map(_._3).sum,
      rows.length.toLong, rows.length > 1))
      .toDF("n_new", "n_exact_dup", "n_near_dup", "n_batches", "multi_batch")
  }

  /** Streaming ingestion WITH merge-behind (r10 verdict, Missing #3):
    * every `mergeEvery` processed micro-batches, the batches since the
    * last merge are folded into the persisted store via the SAME merge
    * core the batch path runs ([[graft.queries.PipelineQueries
    * .indexMergeDocs]] — append-only prefix/fingerprint rows under the
    * frozen df order + the additive delta log). A long-running crawl
    * stream therefore dedups against everything it has already ingested,
    * not just the build-time corpus — the store no longer drifts stale
    * as the stream ages.
    *
    * Order inside each batch: consume FIRST, then (maybe) merge — a
    * batch never pairs against itself, so the pair set for batch b is
    * b × (corpus ∪ batches merged before b) = b × (corpus ∪ batches
    * [0, ⌊b/k⌋·k)). That boundary is deterministic because the driver
    * row assigns docs to batches by RANK (sorted by doc_id, position
    * mod `batches`), so the DuckDB oracle states the exact totals in
    * closed form — including cross-batch near-dups that only exist
    * because the merge happened.
    *
    * The pending batches are staged as collected rows on the driver —
    * fixture-scale plumbing for the MemoryStream harness, same as
    * [[streamedConsumeRow]]'s input feed; a production stream would
    * hand each micro-batch DataFrame (or a staged parquet path) to
    * indexMergeDocs directly.
    */
  def streamedMergeBehindRow(spark: SparkSession, dir: String,
      incMod: Int = 5, selMod: Int = 4, batches: Int = 5,
      mergeEvery: Int = 2): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val P = graft.queries.PipelineQueries

    // RANK-deterministic batch assignment (sorted by doc_id) — the
    // oracle's row_number() restates it exactly
    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % incMod === selMod)
      .select(col("doc_id"), col("text")).sort(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val perBatch = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val pending = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var nMerges = 0L
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val r = P.indexConsumeDocs(spark, batch).collect().head
          perBatch.synchronized {
            perBatch += ((r.getLong(0), r.getLong(1), r.getLong(2)))
            pending ++= batch.select(col("doc_id"), col("text")).collect()
              .map(x => (x.getLong(0), x.getString(1)))
            if (perBatch.length % mergeEvery == 0) {
              P.indexMergeDocs(spark,
                pending.toSeq.toDF("doc_id", "text"), stats = false).collect()
              nMerges += 1
              pending.clear()
            }
          }
          ()
        }
      }
      .start()
    try {
      (0 until batches).foreach { b =>
        val slice = docs.zipWithIndex
          .collect { case (d, i) if i % batches == b => d }
        if (slice.nonEmpty) {
          input.addData(slice.toIndexedSeq: _*)
          q.processAllAvailable()
        }
      }
    } finally q.stop()

    val rows = perBatch.synchronized { perBatch.toVector }
    Seq((rows.map(_._1).sum, rows.map(_._2).sum, rows.map(_._3).sum,
      rows.length.toLong, nMerges, rows.length > 1))
      .toDF("n_new", "n_exact_dup", "n_near_dup", "n_batches", "n_merges",
        "multi_batch")
  }
}
