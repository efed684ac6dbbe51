package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp
import graft.streaming.DedupStream

/** Streaming MinHash/LSH near-dup detection over MemoryStream batches. */
class StreamingDedupSpec extends GraftSuite {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val baseText =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
    "from the window and the birds sing in the morning light of spring"
  private val nearText = baseText.replace("morning", "evening")
  private val otherText =
    "completely different content about databases query planning and " +
    "distributed execution engines running on large clusters of machines"

  test("identical docs across batches pair exactly once despite colliding in every band") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = DedupStream.nearDedupStream(input.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("nd1")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Doc(1, ts(0), baseText), Doc(9, ts(0), otherText))
      q.processAllAvailable()
      input.addData(Doc(2, ts(5), baseText))
      q.processAllAvailable()
      val rows = spark.table("nd1").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // identical text ⇒ jaccard 1.0 and ALL four bands collide — the
      // lowest-colliding-band rule must still emit the pair exactly once
      assert(rows.toSeq == Seq((1L, 2L, 1.0)))
    } finally q.stop()
  }

  test("near-duplicate in the same batch is verified and paired; unrelated doc is not") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = DedupStream.nearDedupStream(input.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("nd2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Doc(1, ts(0), baseText), Doc(2, ts(1), nearText),
        Doc(9, ts(1), otherText))
      q.processAllAvailable()
      val rows = spark.table("nd2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.length == 1)
      val (a, b, jac) = rows.head
      assert(a == 1L && b == 2L && jac >= 0.8 && jac < 1.0)
    } finally q.stop()
  }

  test("bucket state is bounded by the horizon, not by documents ever seen") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = DedupStream.nearDedupStream(input.toDF(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("nd4")
      .outputMode(OutputMode.Append).start()
    try {
      // 12 batches of unique docs, event time advancing 10 min per batch —
      // far past the 5-min horizon, so earlier batches' buckets must be
      // evicted as the watermark passes them
      def tsAt(minutesTotal: Int): Timestamp =
        Timestamp.valueOf(f"2024-01-01 ${10 + minutesTotal / 60}%02d:${minutesTotal % 60}%02d:00")
      var stateRows = List.empty[Long]
      for (b <- 0 until 12) {
        input.addData((0 until 40).map(i =>
          Doc(b * 100L + i, tsAt(b * 10),
            s"unique document number ${b * 100 + i} " + otherText + s" tail $i")): _*)
        q.processAllAvailable()
        stateRows ::= q.lastProgress.stateOperators
          .map(_.numRowsTotal).sum
      }
      val counts = stateRows.reverse
      // state grows for the first horizon's worth of batches, then the
      // watermark holds it flat — the last batches must not exceed the
      // high-water mark set once eviction kicks in
      assert(counts.last <= counts.max,
        s"state rows never evicted: $counts")
      assert(counts.last < counts.sum,
        s"state accumulated monotonically: $counts")
      // 40 docs/batch × 4 bands = 160 banded rows per batch; a bounded
      // state holds ~one horizon (≤ 2 batches in flight) + current batch,
      // with margin for watermark lag — NOT all 12 batches (1920 rows)
      assert(counts.last <= 800,
        s"state rows ${counts.last} suggests no horizon eviction: $counts")
    } finally q.stop()
  }

  test("streaming pairs equal the batch dedup_minhash_lsh pair set on the fixture corpus") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val batchPairs = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), ts(0), r.getString(1)))
    val input = MemoryStream[Doc]
    // same signatures, same verification threshold; band hash functions
    // differ (hash vs xxhash64) but bucketing by hash equality is
    // collision-verified either way, so the VERIFIED pair sets must agree
    val q = DedupStream.nearDedupStream(input.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("nd5")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamPairs = spark.table("nd5").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamPairs == batchPairs,
        s"stream-only: ${streamPairs -- batchPairs}; batch-only: ${batchPairs -- streamPairs}")
    } finally q.stop()
  }

  test("watermark evicts bucket state: a duplicate past the horizon is not paired") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = DedupStream.nearDedupStream(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("nd3")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Doc(1, ts(0), baseText))
      q.processAllAvailable()
      // advance the watermark far past doc 1 (10:50 − 10 min ≫ 10:00)
      input.addData(Doc(9, ts(50), otherText))
      q.processAllAvailable()
      input.addData(Doc(2, ts(55), baseText))
      q.processAllAvailable()
      assert(spark.table("nd3").collect().isEmpty)
    } finally q.stop()
  }
}
