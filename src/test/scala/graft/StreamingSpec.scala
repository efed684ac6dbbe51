package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured-Streaming specs over MemoryStream micro-batches. */
class StreamingSpec extends GraftSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedCounts aggregates tumbling windows with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(5), 1, "view", 1.0),
      Event(2, ts(15), 1, "view", 2.0),
      Event(3, ts(25), 2, "click", 3.0))
    val q = EventStream.windowedCounts(input.toDF(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      val views = rows.find(_.getString(1) == "view").get
      assert(views.getLong(2) == 2 && views.getDouble(3) == 3.0)
      assert(rows.find(_.getString(1) == "click").get.getLong(2) == 1)
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with in-horizon impressions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val impressions = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    impressions.addData(
      Event(100, ts(0), 1, "imp", 0.0),   // clicked 10 min later → pair
      Event(101, ts(1), 2, "imp", 0.0),   // never clicked
      Event(102, ts(40), 1, "imp", 0.0))  // after the click → no pair
    clicks.addData(
      Event(200, ts(10), 1, "click", 0.0),
      Event(201, ts(30), 3, "click", 0.0)) // user 3 has no impression
    val joined = EventStream.intervalJoin(
      impressions.toDF(), clicks.toDF(),
      horizonSeconds = 1800, watermark = "5 minutes")
    // the physical plan is the bounded-state streaming join operator
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ij").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSet == Set((1L, 100L, 200L)))
    } finally q.stop()
  }

  test("stateful sessionize tracks per-user session state across batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Update).start()
    try {
      input.addData(Event(1, ts(0), 7, "view", 1.0), Event(2, ts(10), 7, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(20), 7, "purchase", 1.0))
      q.processAllAvailable()
      val last = spark.table("sess").collect()
        .filter(_.getLong(0) == 7).maxBy(_.getLong(1))
      assert(last.getLong(1) == 3) // one session, three events, state carried
    } finally q.stop()
  }

  test("sessionize closes a session in-batch when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sess2").outputMode(OutputMode.Update).start()
    try {
      // 10:00 and 10:30 with a 10-minute gap → first session closes with
      // n=1 in the same trigger, second opens
      input.addData(Event(1, ts(0), 9, "view", 1.0), Event(2, ts(30), 9, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess2").collect().filter(_.getLong(0) == 9)
      val closed = rows.filter(_.getBoolean(4))
      val open = rows.filter(!_.getBoolean(4))
      assert(closed.length == 1 && closed.head.getLong(1) == 1)
      assert(open.length == 1 && open.head.getLong(1) == 1)
    } finally q.stop()
  }

  test("run(): file-drop source to parquet sink end-to-end (append mode)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/out")
    // first drop: events spanning 3 hours — the 10-minute watermark will
    // pass the first windows' end, so append mode can finalize them
    Seq(
      Event(1, ts(5), 1, "view", 1.0), Event(2, ts(10), 1, "view", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 11:30:00"), 2, "click", 3.0),
      Event(4, Timestamp.valueOf("2024-01-01 13:30:00"), 2, "view", 4.0)
    ).toDF().write.mode("append").parquet(src)
    val q = EventStream.run(spark, src, ckpt, out)
    try {
      q.processAllAvailable()
      // second drop advances the watermark further and triggers emission
      Seq(Event(5, Timestamp.valueOf("2024-01-01 15:00:00"), 3, "view", 5.0))
        .toDF().write.mode("append").parquet(src)
      q.processAllAvailable()
      val rows = spark.read.parquet(out).collect()
      val hour10 = rows.filter(_.getTimestamp(0).toString.startsWith("2024-01-01 10:00"))
      assert(hour10.length == 1 && hour10.head.getLong(2) == 2,
        rows.mkString("; "))
    } finally q.stop()
  }

  test("sessionize evicts idle state via event-time timeout (expired row)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 600, watermark = "1 minutes")
      .writeStream.format("memory").queryName("sess3").outputMode(OutputMode.Update).start()
    try {
      input.addData(Event(1, ts(0), 7, "view", 1.0))
      q.processAllAvailable()
      // another user far in the future advances the watermark past
      // user 7's (last + gap) → 7's state times out and is evicted
      input.addData(Event(2, ts(45), 8, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(50), 8, "click", 1.0))
      q.processAllAvailable()
      val expired7 = spark.table("sess3").collect()
        .filter(r => r.getLong(0) == 7 && r.getBoolean(4))
      assert(expired7.length == 1, spark.table("sess3").collect().mkString("; "))
      assert(expired7.head.getLong(1) == 1)
    } finally q.stop()
  }

  test("dedupStream keeps the first copy of a fingerprint across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.dedupStream(
        input.toDF().toDF("doc_id", "ts", "text"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_s").outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts(0), "the quick fox"), (2L, ts(1), "another doc"))
      q.processAllAvailable()
      // same content (normalization collapses case/whitespace) arriving
      // later within the watermark horizon → dropped
      input.addData((3L, ts(2), "  THE   quick FOX "), (4L, ts(3), "a third doc"))
      q.processAllAvailable()
      val ids = spark.table("dedup_s").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L), s"got $ids")
    } finally q.stop()
  }
}
