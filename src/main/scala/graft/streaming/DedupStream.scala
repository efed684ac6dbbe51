package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming MinHash/LSH near-duplicate detection — the unbounded-ingest
  * analog of the batch `dedup_minhash_lsh` query. The batch form buckets
  * documents by (band_idx, band_hash) and pair-joins inside buckets; here
  * the bucket IS the state key: each (band_idx, band_hash) group holds the
  * documents seen in that bucket within the watermark horizon, and every
  * arriving document is verified (exact Jaccard over its shingle hashes)
  * against just its bucket peers. A duplicate arriving within the
  * watermark delay of its original is guaranteed to be paired — the same
  * horizon contract as `dropDuplicatesWithinWatermark`, which matches how
  * duplicates actually arrive on a crawl (re-crawls and mirror bursts
  * cluster in time).
  *
  * Scale design:
  * - State is partitioned by bucket hash across executors; a bucket holds
  *   only in-horizon docs, so state size is bounded by (ingest rate ×
  *   watermark delay), never by corpus size.
  * - Signatures (shingle set, minhash, band hashes) are computed by the
  *   same codegen'd scan-stage expressions as the batch path — the
  *   stateful operator only ever sees pre-hashed arrays.
  * - A pair colliding in several bands would be emitted once per band;
  *   emission is made exactly-once WITHOUT a second stateful operator by
  *   carrying each doc's full band-hash vector and emitting only from the
  *   LOWEST colliding band (any bucket task can check all bands locally).
  */
object DedupStream {

  /** Post-explode per-bucket row: one doc in one band bucket. */
  case class BandedDoc(band_idx: Int, band_hash: Long, doc_id: Long,
      ts: Timestamp, hsh: Array[Long], band_hashes: Array[Long])
  /** One retained doc in a bucket's state. */
  case class BucketDoc(docId: Long, tsMs: Long, hsh: Array[Long],
      bandHashes: Array[Long])
  case class BucketState(docs: List[BucketDoc])
  /** A verified near-duplicate pair (doc_a < doc_b), stamped with the
    * later arrival's event time. */
  case class NearDup(doc_a: Long, doc_b: Long, jac: Double, ts: Timestamp)

  /** Count of common elements of two sorted-distinct hash arrays (the
    * shingle sets are emitted sorted by `shingle_hashes`). */
  private def sortedIntersect(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  /** docs: streaming DataFrame with (doc_id bigint, ts timestamp,
    * text string). Emits each verified pair exactly once, in the trigger
    * where the later document arrives.
    */
  def nearDedupStream(docs: DataFrame, watermark: String = "10 minutes",
      threshold: Double = 0.8, nHashes: Int = 16, nBands: Int = 4)(
      implicit spark: SparkSession): Dataset[NearDup] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rowsPerBand = nHashes / nBands
    val banded = docs
      .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("hsh", expr("shingle_hashes(norm, 3)"))
      .withColumn("mh", expr(s"minhash(hsh, $nHashes)"))
      .withColumn("band_hashes", expr(
        s"transform(sequence(0, ${nBands - 1}), b -> xxhash64(slice(mh, b * $rowsPerBand + 1, $rowsPerBand)))"))
      .withWatermark("ts", watermark)
      .select(posexplode(col("band_hashes")).as(Seq("band_idx", "band_hash")),
        col("doc_id"), col("ts"), col("hsh"), col("band_hashes"))
      .as[BandedDoc]

    banded.groupByKey(d => (d.band_idx, d.band_hash))
      .flatMapGroupsWithState[BucketState, NearDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((bandIdx, _), it, state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs
          val kept = state.getOption.map(_.docs).getOrElse(Nil)
            .filter(_.tsMs >= wm) // horizon eviction, as in dropDuplicatesWithinWatermark
          if (state.hasTimedOut) {
            if (kept.isEmpty) state.remove()
            else {
              state.update(BucketState(kept))
              state.setTimeoutTimestamp(math.max(kept.map(_.tsMs).max, wm + 1))
            }
            Iterator.empty
          } else {
            val out = List.newBuilder[NearDup]
            val acc = it.toList.sortBy(_.ts.getTime).foldLeft(kept) { (seen, d) =>
              if (seen.exists(_.docId == d.doc_id)) seen // re-delivery: ignore
              else {
              val nd = BucketDoc(d.doc_id, d.ts.getTime, d.hsh, d.band_hashes)
              for (p <- seen) {
                // exactly-once: only the lowest band where the pair
                // collides emits it
                val lowest = (0 until bandIdx).forall(b =>
                  p.bandHashes(b) != nd.bandHashes(b))
                if (lowest) {
                  val c = sortedIntersect(p.hsh, nd.hsh)
                  val jac = c.toDouble / (p.hsh.length + nd.hsh.length - c)
                  if (jac >= threshold)
                    out += NearDup(math.min(p.docId, nd.docId),
                      math.max(p.docId, nd.docId),
                      math.rint(jac * 1e6) / 1e6,
                      new Timestamp(math.max(p.tsMs, nd.tsMs)))
                }
              }
              nd :: seen
              }
            }
            state.update(BucketState(acc))
            state.setTimeoutTimestamp(math.max(acc.map(_.tsMs).max, wm + 1))
            out.result().iterator
          }
      }
  }

  /** Driver row (r7): the StreamingDedupSpec batch-equality property as
    * an oracle-checkable query — the fixture corpus is fed through the
    * streaming path in one MemoryStream batch and its verified pair set
    * compared (both directions) to the batch `dedup_minhash_lsh` pair
    * set. Band hash functions differ between the two paths (hash vs
    * xxhash64), but both verify candidates with exact Jaccard, so the
    * VERIFIED sets must be equal — the row reduces to two booleans the
    * oracle states as constants, the same contract as the recall rows.
    */
  def batchEquivalenceRow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchPairs = graft.queries.PipelineQueries.queries("dedup_minhash_lsh")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), t0, r.getString(1)))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp, String)]
    val q = nearDedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), watermark = "1 hour")
      .writeStream.format("memory").queryName("graft_stream_nd_row")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamPairs = spark.table("graft_stream_nd_row")
      .select(col("doc_a"), col("doc_b"))
    val onlyStream = streamPairs.exceptAll(batchPairs).count()
    val onlyBatch = batchPairs.exceptAll(streamPairs).count()
    val nBatch = batchPairs.count()
    Seq((nBatch > 0, onlyStream == 0 && onlyBatch == 0))
      .toDF("pairs_nonempty", "stream_eq_batch")
  }
}
