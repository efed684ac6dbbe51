package graft.tools_dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** r7 soak for the gram-join key change (r6 verdict #5): measures wall
  * time and TOTAL SHUFFLE WRITE BYTES for the exact-substring gram join
  * with the old raw 8-word-string key vs the shipped xxhash64 key, at
  * sf0.1 and at 10× (sf0.1 unioned 10 times with doc_id offsets, so
  * duplication density is preserved). Writes GRAMKEY_SOAK_r07.json.
  */
object GramKeySoak {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleW = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleW.add(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    def docs(mult: Int): DataFrame = {
      val d = graft.engine.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      (0 until mult).map(k =>
        d.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"), col("text")))
        .reduce(_.unionAll(_))
    }

    // the gram self-join pair count, keyed either by the raw 8-word gram
    // string or by xxhash64 of it — identical result set, different
    // shuffle payload
    def gramJoin(d: DataFrame, hashed: Boolean): DataFrame = {
      val key = if (hashed)
        "array_distinct(transform(sequence(0, size(ws) - 8), " +
          "i -> xxhash64(array_join(slice(ws, i + 1, 8), ' '))))"
      else
        "array_distinct(transform(sequence(0, size(ws) - 8), " +
          "i -> array_join(slice(ws, i + 1, 8), ' ')))"
      val grams = d
        .withColumn("ws", split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " "))
        .filter(size(col("ws")) >= 8)
        .select(col("doc_id"), explode(expr(key)).as("gh"))
      grams.hint("merge").as("x").join(grams.hint("merge").as("y"),
          col("x.gh") === col("y.gh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared_grams"))
    }

    def measure(label: String, mult: Int, hashed: Boolean): String = {
      val d = docs(mult)
      gramJoin(d, hashed).write.format("noop").mode("overwrite").save() // warm
      shuffleW.reset()
      val t0 = System.nanoTime()
      gramJoin(d, hashed).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      val mb = shuffleW.sum / 1048576.0
      println(f"[gramkey] $label wall=$wall%.2fs shuffleWrite=$mb%.1fMB")
      f"""{"label":"$label","wall_s":$wall%.3f,"shuffle_write_mb":$mb%.1f}"""
    }

    val rows = Seq(
      measure("string_1x", 1, hashed = false),
      measure("xxhash64_1x", 1, hashed = true),
      measure("string_10x", 10, hashed = false),
      measure("xxhash64_10x", 10, hashed = true))
    val json = "{\"soak\":\"gram_join_key\",\"rows\":[" + rows.mkString(",") + "]}"
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/GRAMKEY_SOAK_r07.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
